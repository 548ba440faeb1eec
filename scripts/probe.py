#!/usr/bin/env python
"""Isolated single-query probe at any replica scale, with conf overrides.

Runs each named query in THIS process (one fresh benchmark_session), one
cold pass + optional warm passes, releasing localCheckpoint blocks between
queries off the clock (the consistent-harness protocol of
docs/scale_sweep_r5.jsonl's revalidation-v2 rows).  Each pass's wall is
plan-build + execution, bench.py's headline protocol, with the
plan/exec split reported alongside.  Prints one JSON line per query.

Usage:
  python scripts/probe.py SF_DIR QUERY [QUERY ...]
Env:
  PROBE_PASSES  measured passes after the cold one (default 0 = cold only)
  PROBE_CONF    JSON dict of extra Spark confs for the session
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from datafusion_parallelism_spark.queries import REGISTRY  # noqa: E402
from datafusion_parallelism_spark.session import (  # noqa: E402
    benchmark_session,
    force_execute,
    persistent_rdd_ids,
    release_persisted,
)


def main() -> int:
    sf_dir = sys.argv[1]
    names = sys.argv[2:]
    extra_conf = json.loads(os.environ.get("PROBE_CONF", "{}"))
    warm_passes = int(os.environ.get("PROBE_PASSES", "0"))
    spark = benchmark_session(sf_dir, app_name="probe", extra_conf=extra_conf)
    keep_ids = frozenset(persistent_rdd_ids(spark))
    for name in names:
        # Every pass times plan-build AND execution together (bench.py's
        # headline protocol, so rows are comparable with the scale-sweep
        # records), with the split reported separately.  The split is NOT
        # "py4j vs compute": under AQE, a lazy localCheckpoint's toRdd
        # materializes every upstream query stage inside fn(), so for
        # checkpoint-bearing queries at GB factors most of the work lands
        # in the build half — only the combined wall is protocol-stable.
        def one_pass():
            t0 = time.perf_counter()
            df = REGISTRY[name].fn(spark, sf_dir)
            t1 = time.perf_counter()
            force_execute(df)
            t2 = time.perf_counter()
            return round(t2 - t0, 3), round(t1 - t0, 3), round(t2 - t1, 3)

        cold_wall, cold_plan, cold_exec = one_pass()
        warms = []
        for _ in range(warm_passes):
            release_persisted(spark, keep_ids)
            warms.append(one_pass())
        print(
            json.dumps(
                {
                    "query": name,
                    "sf_dir": sf_dir,
                    "cold_s": cold_wall,
                    "cold_split_s": {"plan": cold_plan, "exec": cold_exec},
                    "warm_s": [w[0] for w in warms],
                    "warm_split_s": [{"plan": w[1], "exec": w[2]} for w in warms],
                    "conf": extra_conf,
                }
            ),
            flush=True,
        )
        release_persisted(spark, keep_ids)
    return 0


if __name__ == "__main__":
    sys.exit(main())
