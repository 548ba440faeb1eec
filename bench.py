#!/usr/bin/env python
"""Benchmark harness (driver contract: one JSON line to stdout).

Runs the headline query set at ``$SPARK_GRAFT_SF_DIR`` (default
``/root/testdata/sf0.1``) on ``local[$SPARK_GRAFT_CPUS]`` and prints
``{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}``.

Analog of the reference's TPC-H harness (``tpc/src/main.rs:143-288``): it
times each query's full execution (plan + all stages), not just plan
construction.  Results are forced with the ``noop`` sink so the measurement
includes every operator but excludes driver-side materialization — the same
posture as the reference's ``collect`` into a discarded Vec.

The headline list is a FIXED set so per-round BENCH_r{N}.json values stay
comparable as the corpus grows; entries are skipped silently if a query is
not (yet) registered.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from datafusion_parallelism_spark.queries import REGISTRY  # noqa: E402
from datafusion_parallelism_spark.session import (  # noqa: E402
    benchmark_session,
    force_execute as _force,
)

#: Fixed headline set: the reference's own subject (multi-join TPC-H) plus
#: one representative per capability family (window, sessionize, dedup, ANN).
HEADLINE = [
    "tpch_q1",
    "tpch_q3",
    "tpch_q5",
    "tpch_q9",
    "tpch_q18",
    "tpch_q21",
    "join_inner_chain",
    "join_full_residual",
    "window_rank_orders",
    "events_sessionize",
    "agg_count_distinct",
    "text_stats",
    "dedup_exact",
    "dedup_minhash_lsh",
    "ann_bruteforce_topk",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    try:
        sf_val = float(sf)
    except ValueError:
        sf_val = sf
    spark = benchmark_session(sf_dir, app_name="bench")

    names = [n for n in HEADLINE if n in REGISTRY]
    # Warm-up pass over the WHOLE headline set: the reference's protocol is
    # steady-state (criterion warms 30 s, tpc harness reports means over
    # up to 100 iterations) — first executions here pay JVM JIT + codegen
    # compilation that no steady-state number should include (measured
    # ~0.3-1.0 s extra per query on the first pass at sf0.1).
    for name in names:
        _force(REGISTRY[name].fn(spark, sf_dir))
    # Take the post-warm-up collection hit outside the measured window.
    spark._jvm.System.gc()

    # Measurement protocol parity with the reference: it warms up 30 s and
    # reports steady-state over many iterations (benches/my_benchmark.rs:30-37,
    # tpc --iterations 100).  Three ROUND-ROBIN passes over the query list,
    # per-query min across passes — min is the noise-robust steady-state
    # estimator on a shared machine, and round-robin spreads a transient
    # stall (GC pause, co-tenant load spike) across different queries in
    # different passes instead of poisoning every iteration of one query.
    times: dict[str, float] = {name: float("inf") for name in names}
    for _ in range(3):
        for name in names:
            t0 = time.perf_counter()
            _force(REGISTRY[name].fn(spark, sf_dir))
            times[name] = min(times[name], time.perf_counter() - t0)
    times = {name: round(t, 3) for name, t in times.items()}

    total = round(sum(times.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_corpus_wall",
                "value": total,
                "unit": "sec",
                "queries": times,
                "sf": sf_val,
            }
        )
    )


if __name__ == "__main__":
    main()
