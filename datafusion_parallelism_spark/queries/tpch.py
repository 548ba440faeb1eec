"""TPC-H-class corpus (filled in incrementally)."""
