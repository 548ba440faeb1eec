"""MERGE / upsert — incremental corpus refresh without a table format.

Open-source Spark without Delta/Iceberg has no MERGE INTO; the equivalent
relational form is a FULL OUTER join of target and source on the key with
source-wins column resolution:

* matched keys       → source values overwrite (UPDATE),
* source-only keys   → source row appears       (INSERT),
* target-only keys   → target row kept          (no-op).

One shuffle on the merge key (or zero with bucketed target+source).  The
result is a complete new snapshot — at 100 TB you write it partition-wise
next to the old one and swap pointers, which is exactly what table formats
do underneath.  Delete support: pass a ``delete`` predicate evaluated on
source rows (anti-semantics applied before the join).
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def merge_upsert(
    target: DataFrame,
    source: DataFrame,
    on: str | Sequence[str],
    delete: Optional[Column] = None,
) -> DataFrame:
    """Upsert ``source`` into ``target`` on key column(s) ``on``.

    Both inputs must share a schema.  Returns the merged snapshot with
    target's column order.  Rows of ``source`` matching ``delete`` remove
    the key from the result entirely (MERGE ... WHEN MATCHED DELETE).
    """
    keys = [on] if isinstance(on, str) else list(on)
    cols = target.columns
    if source.columns != cols:
        raise ValueError(f"schema mismatch: target={cols} source={source.columns}")

    # NULL merge keys never match in the join and would surface as bogus
    # all-NULL rows (and never-applied deletes).  Fail loud — silently
    # dropping them would hide upstream CDC corruption.
    null_key = None
    for k in keys:
        c = F.col(k).isNull()
        null_key = c if null_key is None else (null_key | c)
    n_bad = source.filter(null_key).count()
    if n_bad:
        raise ValueError(
            f"merge_upsert: {n_bad} source row(s) have NULL in merge key {keys}"
        )

    deletes = None
    if delete is not None:
        deletes = source.filter(delete).select(*keys).distinct()
        source = source.filter(~delete)

    t = target.alias("t")
    # Dedicated presence flag (not key-isNotNull): robust even if key
    # semantics change, and lets a source row legitimately set NULLs.
    s = source.withColumn("__present", F.lit(True)).alias("s")
    cond = None
    for k in keys:
        c = F.col(f"t.{k}") == F.col(f"s.{k}")
        cond = c if cond is None else (cond & c)
    # F.when treats a NULL condition as false, so the bare flag suffices.
    present = F.col("s.__present")
    merged = t.join(s, cond, "full").select(
        *[
            F.when(present, F.col(f"s.{c}")).otherwise(F.col(f"t.{c}")).alias(c)
            for c in cols
        ]
    )
    if deletes is not None:
        merged = merged.join(deletes, keys, "left_anti")
    return merged
