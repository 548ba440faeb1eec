"""As-of (point-in-time) join — a custom operator Spark SQL lacks.

For each left row, attach the most recent right row with the same key and
``right_ts <= left_ts``.  The naive formulation is a range join (equi key +
inequality) whose hash join degenerates to per-key cross products; the
scalable formulation used here is UNION + WINDOW:

1. tag both inputs and union them on (key, ts);
2. one window per key ordered by (ts, side-tag) propagates the last seen
   right row forward as a STRUCT (``last(..., ignorenulls)`` — the struct
   keeps the matched row atomic even when right columns contain NULLs);
3. keep the left rows, now carrying the as-of matched right columns.

Cost: ONE shuffle of left+right on the key (same as any shuffled join) and
a per-key sort — no pairwise expansion anywhere, so the plan survives any
key cardinality / time density at 100 TB.  Ties (right_ts == left_ts) match,
and the right row with the latest ts wins, matching DuckDB's native
``ASOF JOIN`` semantics (the test oracle).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    left_ts: str,
    right_ts: str,
    right_cols: Sequence[str] | None = None,
    how: str = "left",
    direction: str = "backward",
    tolerance: str | None = None,
) -> DataFrame:
    """As-of join: nearest right row per key on one side of left_ts.

    ``on`` — equi key column name(s) shared by both inputs;
    ``right_cols`` — right columns to attach (default: all non-key,
    non-timestamp columns);
    ``how`` — 'left' keeps unmatched left rows (right columns null),
    'inner' drops them;
    ``direction`` — 'backward' (latest right with right_ts <= left_ts,
    DuckDB ``ON l.ts >= r.ts``) or 'forward' (earliest right with
    right_ts >= left_ts, DuckDB ``ON l.ts <= r.ts``).  Ties match in
    both directions.
    ``tolerance`` — optional SQL interval literal (e.g. ``'1 HOUR'``):
    a match older (backward) / later (forward) than left_ts ± tolerance
    is discarded, matching pandas ``merge_asof(tolerance=...)``.  Applied
    AFTER the window fill as a per-row predicate, so the one-shuffle
    union+window plan is unchanged.
    """
    keys = [on] if isinstance(on, str) else list(on)
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in keys and c != right_ts]
    if how not in ("left", "inner"):
        raise ValueError(f"how must be 'left' or 'inner', got {how!r}")
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be 'backward' or 'forward', got {direction!r}")

    left_cols = [c for c in left.columns if c not in keys and c != left_ts]
    # The matched right row's own timestamp rides along in the struct so a
    # tolerance bound can be checked after the fill.
    r_struct = F.struct(
        *[F.col(c) for c in right_cols], F.col(right_ts).alias("__rts")
    )

    # Side tag orders equal timestamps so a right row at ts == left ts is
    # visible to that left row (right sorts first on ties).
    l_tagged = left.select(
        *keys,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        *[F.col(c) for c in left_cols],
        F.lit(None)
        .cast(right.select(r_struct.alias("s")).schema["s"].dataType)
        .alias("__r"),
    )
    r_tagged = right.select(
        *keys,
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in left_cols
        ],
        r_struct.alias("__r"),
    )
    unioned = l_tagged.unionByName(r_tagged)

    if direction == "backward":
        # Right rows sort BEFORE left rows on tied ts (side 0 < 1), so a
        # right row at ts == left ts is inside the preceding frame.
        w = (
            Window.partitionBy(*keys)
            .orderBy("__ts", "__side")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        filled = unioned.withColumn("__m", F.last("__r", ignorenulls=True).over(w))
    else:
        # Forward: left rows sort BEFORE right rows on tied ts (side desc),
        # so a right row at ts == left ts is inside the following frame.
        w = (
            Window.partitionBy(*keys)
            .orderBy(F.col("__ts").asc(), F.col("__side").desc())
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        filled = unioned.withColumn("__m", F.first("__r", ignorenulls=True).over(w))
    if tolerance is not None:
        bound = F.expr(f"INTERVAL {tolerance}")
        if direction == "backward":
            ok = F.col("__m.__rts") >= F.col("__ts") - bound
        else:
            ok = F.col("__m.__rts") <= F.col("__ts") + bound
        filled = filled.withColumn("__m", F.when(ok, F.col("__m")))
    keep = F.col("__side") == 1
    if how == "inner":
        keep = keep & F.col("__m").isNotNull()
    return filled.filter(keep).select(
        *keys,
        F.col("__ts").alias(left_ts),
        *left_cols,
        *[F.col(f"__m.{c}").alias(c) for c in right_cols],
    )
