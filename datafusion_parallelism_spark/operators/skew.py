"""Manual skew mitigation: salted join.

The reference fixes skew with a work-stealing repartitioner
(work_stealing_repartition_exec.rs:50-91).  Spark's first-line answer is
AQE's skew-join split (tests/test_skew_handling.py); this module is the
second line — explicit SALTING for when a single key is so hot that even
a split partition's build side is a problem, or when AQE is unavailable
(streaming joins).

Technique: the skewed (big) side gets a deterministic salt in [0, n) from
a hash of its whole row; the small side is EXPLODED n× (one copy per salt
value).  Joining on (key, salt) spreads each hot key over n partitions.
Row multiplication only happens on the small side, so total work grows by
|small| × (n-1) — negligible when small is dimension-sized — and results
are exactly those of the unsalted join.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SALT = "__salt"


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: Sequence[tuple[str, str]],
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi join of a skewed ``big`` side against a ``small`` side, salted
    ``n_salts`` ways.  ``on`` is (big_col, small_col) pairs.  Output columns
    = big's columns followed by small's (salt column dropped)."""
    if n_salts < 1:
        raise ValueError("n_salts must be >= 1")
    if how not in ("inner", "left", "leftouter", "left_outer"):
        # right/full would emit each unmatched small-side row once PER SALT
        # COPY; semi/anti have no small-side columns to select.  Only the
        # big-side-preserving types are salt-correct.
        raise ValueError(f"salted_join supports how='inner'/'left', got {how!r}")
    # Salt from a hash of the big side's full row: uniform, deterministic,
    # and independent of the (constant) hot key.
    big_s = big.withColumn(
        _SALT, F.pmod(F.hash(*[F.col(c) for c in big.columns]), F.lit(n_salts))
    )
    small_s = small.withColumn(
        _SALT, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    cond = F.col(f"b.{_SALT}") == F.col(f"s.{_SALT}")
    for bcol, scol in on:
        cond = cond & (F.col(f"b.{bcol}") == F.col(f"s.{scol}"))
    joined = big_s.alias("b").join(small_s.alias("s"), cond, how)
    return joined.select(
        *[F.col(f"b.{c}") for c in big.columns],
        *[F.col(f"s.{c}") for c in small.columns],
    )
