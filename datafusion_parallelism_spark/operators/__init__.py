from .joins import equi_join, JOIN_TYPES

__all__ = ["equi_join", "JOIN_TYPES"]
