"""Query corpus: every operator from SURVEY.md §2, as (Spark fn, oracle SQL) pairs.

Modules self-register into :data:`REGISTRY` at import time via the
:func:`query` decorator.  ``__spark_entry__.queries()`` / ``oracle_sql()``
read the registry.
"""

from __future__ import annotations

from .registry import REGISTRY, QuerySpec, query

# Import for side effects: each module registers its queries.
from . import joins  # noqa: E402,F401
from . import tpch  # noqa: E402,F401
from . import analytics  # noqa: E402,F401
from . import llm  # noqa: E402,F401
from . import multimodal  # noqa: E402,F401
from . import streaming  # noqa: E402,F401
from . import io_roundtrip  # noqa: E402,F401
from . import graph  # noqa: E402,F401

__all__ = ["REGISTRY", "QuerySpec", "query"]
