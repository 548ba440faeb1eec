#!/usr/bin/env python
"""Stage decomposition of a dedup pipeline at a replica scale.

Noop-writes each cumulative PREFIX of the pipeline in one fresh
benchmark_session (the r7 winnow-decomp protocol: stage N's wall includes
stages 1..N, so stage cost = wall[N] − wall[N−1] up to re-run noise;
localCheckpoint blocks are released between stages off the clock).  Prints
one JSON line per stage.

Round-8 subject (VERDICT r7 item 3): dedup_ngram_jaccard at x256 is the
biggest non-graph line (127 s cold, scale_sweep_r7.jsonl) and has never had
a stage decomposition.

Usage: python scripts/decomp.py SF_DIR {jaccard|winnow} [FACTOR_LABEL]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

PROTOCOL = "decomp-v1"


def jaccard_stages(spark, sf_dir):
    """Cumulative prefixes of dedup_ngram_jaccard (queries/llm.py)."""
    from datafusion_parallelism_spark.queries.llm import (
        JACCARD_THRESHOLD,
        _blocked_shingle_index,
        _doc_shingles,
        _docs_spread,
        _shingle_table,
    )

    d = _docs_spread(spark, sf_dir)
    n_part = spark.sparkContext.defaultParallelism

    def pairs_counted():
        sh = _blocked_shingle_index(d, n_part)
        a, b = sh.alias("a"), sh.alias("b")
        return (
            a.join(
                b,
                (F.col("a.s") == F.col("b.s"))
                & (F.col("a.doc_id") < F.col("b.doc_id")),
            )
            .select(
                F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
            )
            .groupBy("doc_a", "doc_b")
            .agg(F.count(F.lit(1)).alias("c"))
        )

    def scored():
        shared = pairs_counted()
        cnt = _doc_shingles(d).select("doc_id", "n")
        jac = F.round(
            F.col("c") / (F.col("ca.n") + F.col("cb.n") - F.col("c")), 4
        )
        return (
            shared.join(cnt.alias("ca"), F.col("ca.doc_id") == F.col("doc_a"))
            .join(cnt.alias("cb"), F.col("cb.doc_id") == F.col("doc_b"))
            .select("doc_a", "doc_b", jac.alias("jaccard"))
            .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
        )

    return [
        # scan + split + shingle arrays (pure map over text)
        ("shingle_arrays", lambda: _doc_shingles(d)),
        # + explode to the inverted-index row shape
        ("exploded", lambda: _shingle_table(d)),
        # + repartition by shingle + window df + stop-shingle filter
        ("indexed", lambda: _blocked_shingle_index(d, n_part)),
        # + blocked self-join + map-side-combined pair counts
        ("pairs_counted", pairs_counted),
        # + per-doc |set| joins + Jaccard scoring (the full query)
        ("scored", scored),
    ]


def winnow_stages(spark, sf_dir):
    from datafusion_parallelism_spark.queries.llm import (
        WINNOW_T,
        _docs_spread,
        winnow_fingerprints,
        winnow_pair_counts,
    )

    d = _docs_spread(spark, sf_dir)
    n_part = spark.sparkContext.defaultParallelism
    return [
        ("fingerprints", lambda: winnow_fingerprints(d)),
        ("pairs_counted", lambda: winnow_pair_counts(winnow_fingerprints(d), n_part)),
        (
            "scored",
            lambda: winnow_pair_counts(winnow_fingerprints(d), n_part).filter(
                F.col("shared_fps") >= WINNOW_T
            ),
        ),
    ]


PIPELINES = {"jaccard": jaccard_stages, "winnow": winnow_stages}


def main() -> int:
    sf_dir, pipeline = sys.argv[1], sys.argv[2]
    from datafusion_parallelism_spark.session import (
        benchmark_session,
        force_execute,
        persistent_rdd_ids,
        release_persisted,
    )

    spark = benchmark_session(sf_dir, app_name=f"decomp-{pipeline}")
    keep_ids = frozenset(persistent_rdd_ids(spark))
    for stage, build in PIPELINES[pipeline](spark, sf_dir):
        t0 = time.perf_counter()
        force_execute(build())
        wall = round(time.perf_counter() - t0, 3)
        print(
            json.dumps(
                {
                    "protocol": PROTOCOL,
                    "pipeline": pipeline,
                    "sf_dir": sf_dir,
                    "stage": stage,
                    "wall_s": wall,
                }
            ),
            flush=True,
        )
        release_persisted(spark, keep_ids)
    return 0


if __name__ == "__main__":
    sys.exit(main())
