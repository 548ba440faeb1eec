#!/usr/bin/env python
"""Microbench: winnowing fingerprint-selection formulations at a replica.

Round-10 question: the HOF (shuffle-free) fingerprint selection doubled
the x256 fingerprinting stage's CPU vs the r5 explode+WindowExec
formulation (5.2M vs ~2.5M cpu-ms) — is the overhead the interpreted
md5-in-lambda, the array_min(slice(...)) allocations, or array_distinct?
Run each variant in THIS process (one session), force-execute a count()
over the fingerprint table, report wall + total executor cpu_ms from the
stage counters.  Variants:

  hof        — shipped HOF selection (winnow_fingerprints)
  window     — the r5 explode + chunk-routed WindowExec formulation
  hashes     — HOF gram hashing only (transform + md5), no window minima:
               isolates interpreted-md5 cost from the sliding-min cost

Usage: python scripts/winnow_fp_bench.py SF_DIR [variant ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

from datafusion_parallelism_spark.queries.llm import (
    WINNOW_CHUNK,
    WINNOW_K,
    WINNOW_W,
    _docs_spread,
    _phash,
    winnow_fingerprints,
)


def window_fingerprints(
    d: DataFrame, k: int = WINNOW_K, w: int = WINNOW_W, chunk: int = WINNOW_CHUNK
) -> DataFrame:
    """The r5 formulation (verbatim shape): explode grams, route to
    chunks, WindowExec min — exchanges + sorts the whole gram table."""
    grams = (
        d.filter(F.length("text") >= k)
        .select(
            "doc_id",
            F.explode(F.sequence(F.lit(1), F.length("text") - F.lit(k - 1))).alias(
                "pos"
            ),
            "text",
        )
        .select(
            "doc_id",
            "pos",
            _phash(F.expr(f"substring(text, pos, {k})")).alias("h"),
        )
    )
    owned = F.floor((F.col("pos") - 1) / chunk)
    lo = F.greatest(F.lit(0), F.floor((F.col("pos") - w) / chunk))
    routed = grams.select(
        "doc_id", "pos", "h", F.explode(F.sequence(lo, owned)).alias("chk")
    )
    win = Window.partitionBy("doc_id", "chk").orderBy("pos").rowsBetween(0, w - 1)
    return (
        routed.withColumn("wmin", F.min("h").over(win))
        .filter(owned == F.col("chk"))
        .select("doc_id", F.col("wmin").alias("h"))
        .distinct()
    )


def hof_hashes_only(
    d: DataFrame, k: int = WINNOW_K, w: int = WINNOW_W, chunk: int = WINNOW_CHUNK
) -> DataFrame:
    """Gram hashing via the HOF transform, but NO sliding minima — emits
    per-chunk min of the raw hash array so volume stays tiny while every
    md5 still evaluates."""
    k1 = k - 1
    sub_len = chunk + w + k - 2
    hashes = (
        f"transform(sequence(1, length(e.sub) - {k1}), "
        f"p -> cast(conv(substring(md5(substring(e.sub, p, {k})), 1, 15), 16, 10) as bigint))"
    )
    subs = (
        f"transform(sequence(0, cast(ceil((length(text) - {k1}) / {chunk}.0) as int) - 1), "
        f"c -> struct(substring(text, c * {chunk} + 1, {sub_len}) as sub, "
        f"least({chunk}, length(text) - {k1} - c * {chunk}) as owned))"
    )
    return (
        d.filter(F.length("text") >= k)
        .select("doc_id", F.explode(F.expr(subs)).alias("e"))
        .select("doc_id", F.expr(f"array_min({hashes})").alias("h"))
    )


VARIANTS = {
    "hof": winnow_fingerprints,
    "window": window_fingerprints,
    "hashes": hof_hashes_only,
}


def main() -> int:
    sf_dir = sys.argv[1]
    names = sys.argv[2:] or list(VARIANTS)
    from datafusion_parallelism_spark.metrics import stage_metrics, totals
    from datafusion_parallelism_spark.session import benchmark_session

    spark = benchmark_session(
        sf_dir, app_name="winnow_fp_bench", extra_conf={"spark.ui.enabled": "true"}
    )
    seen: set[int] = set()
    for name in names:
        d = _docs_spread(spark, sf_dir)
        t0 = time.perf_counter()
        n = VARIANTS[name](d).count()
        wall = round(time.perf_counter() - t0, 3)
        stages = stage_metrics(spark)
        mine = {k: v for k, v in stages.items() if k not in seen}
        seen.update(stages)
        t = totals(mine)
        print(
            json.dumps(
                {
                    "variant": name,
                    "sf_dir": sf_dir,
                    "rows": n,
                    "wall_s": wall,
                    "cpu_ms": round(t["cpu_ms"]),
                    "gc_ms": t["gc_ms"],
                    "spill_mem_mb": round(t["spill_mem_mb"], 1),
                    "shuffle_write_mb": round(t["shuffle_write_mb"], 1),
                }
            ),
            flush=True,
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
