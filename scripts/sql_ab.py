#!/usr/bin/env python
"""DataFrame-API vs single-spark.sql-text A/B for the TPC-H headline shapes.

VERDICT r5 item 6: the core15 floor decomposition attributes the sf0.1 gap
to per-query job scheduling (broadcast-collect jobs dominate).  One
proposed lever was building each plan through ONE ``spark.sql(text)`` call
instead of the chained DataFrame builder (fewer py4j round-trips at
plan-build time, and a chance the SQL binder plans differently).  This
harness measures both entry points under the bench protocol — fresh plan
per pass, force_execute timed, plan-build OFF the clock like bench.py —
and counts jobs per execution via setJobGroup + statusTracker.

Expectation either way is recorded in BASELINE.md: if walls and job
counts are identical, the floor is plan-independent scheduling quantum
and the lever is exhausted; if SQL wins, bench adopts it.

Usage: python scripts/sql_ab.py [sf_dir]   (default /root/testdata/sf0.1)
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from datafusion_parallelism_spark.queries import REGISTRY  # noqa: E402
from datafusion_parallelism_spark.session import (  # noqa: E402
    benchmark_session,
    force_execute,
    register_tables,
)

#: TPC-H headline shapes; oracle text must also parse as Spark SQL
#: (tests/test_entrypoint_parity.py proves q1/q3/q5/q18; q9/q21 are
#: attempted and skipped with a note if the dialect diverges).
QUERIES = ["tpch_q1", "tpch_q3", "tpch_q5", "tpch_q9", "tpch_q18", "tpch_q21"]
PASSES = 5


def _measure(spark, build, n_passes=PASSES):
    sc = spark.sparkContext
    tracker = sc.statusTracker()
    # warm-up (codegen + broadcast caches); fresh plan per pass after
    force_execute(build())
    walls, jobs = [], []
    for i in range(n_passes):
        df = build()  # plan build OFF the clock (bench.py protocol)
        group = f"sqlab-{time.monotonic_ns()}"
        sc.setJobGroup(group, "sql_ab pass")
        t0 = time.perf_counter()
        force_execute(df)
        walls.append(time.perf_counter() - t0)
        sc.setJobGroup(None, None)
        jobs.append(len(tracker.getJobIdsForGroup(group)))
    return round(statistics.mean(walls), 3), jobs[0]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = benchmark_session(sf_dir, app_name="sql-ab")
    register_tables(spark, sf_dir)
    for name in QUERIES:
        spec = REGISTRY[name]
        df_wall, df_jobs = _measure(spark, lambda: spec.fn(spark, sf_dir))
        try:
            spark.sql(spec.oracle).schema  # parse/analyze check
        except Exception as exc:  # noqa: BLE001
            print(
                json.dumps(
                    {
                        "query": name,
                        "df_wall_s": df_wall,
                        "df_jobs": df_jobs,
                        "sql": f"not Spark-parsable: {type(exc).__name__}",
                    }
                ),
                flush=True,
            )
            continue
        sql_wall, sql_jobs = _measure(spark, lambda: spark.sql(spec.oracle))
        print(
            json.dumps(
                {
                    "query": name,
                    "df_wall_s": df_wall,
                    "df_jobs": df_jobs,
                    "sql_wall_s": sql_wall,
                    "sql_jobs": sql_jobs,
                }
            ),
            flush=True,
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
