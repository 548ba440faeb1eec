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


def _job_high_water(tracker) -> int:
    """Highest job id the tracker has seen (-1 before any job runs).

    ``getJobIdsForGroup(None)`` returns the ids of all jobs not associated
    with a job group; this harness never sets one, so that is every job in
    the session (validated at startup by ``main``)."""
    return max(tracker.getJobIdsForGroup(None) or [], default=-1)


def _measure(spark, build, n_passes=PASSES):
    sc = spark.sparkContext
    tracker = sc.statusTracker()
    # warm-up (codegen + broadcast caches); fresh plan per pass after
    force_execute(build())
    # Jobs counted by diffing the statusTracker job-id high-water mark
    # before/after the pass, NOT setJobGroup attribution: broadcast-
    # exchange jobs run on a cached JVM thread pool whose local properties
    # were captured at thread creation (during the ungrouped warm-up), so
    # group attribution undercounts exactly the broadcast jobs this A/B
    # exists to attribute the floor to.  Job ids are monotonically
    # assigned and this harness is the only submitter in the session, so
    # the id delta is the pass's complete job count.
    walls, jobs = [], []
    for i in range(n_passes):
        df = build()  # plan build OFF the clock (bench.py protocol)
        before = _job_high_water(tracker)
        t0 = time.perf_counter()
        force_execute(df)
        walls.append(time.perf_counter() - t0)
        jobs.append(_job_high_water(tracker) - before)
    return round(statistics.mean(walls), 3), jobs[0]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = benchmark_session(sf_dir, app_name="sql-ab")
    register_tables(spark, sf_dir)
    # Sanity-check the job-counting mechanism: an ungrouped action must be
    # visible to getJobIdsForGroup(None), else every count below is 0.
    tracker = spark.sparkContext.statusTracker()
    before = _job_high_water(tracker)
    spark.range(10).count()
    assert _job_high_water(tracker) > before, (
        "statusTracker job-id diffing sees no jobs; counting is broken"
    )
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
