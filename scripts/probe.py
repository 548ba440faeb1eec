#!/usr/bin/env python
"""Isolated single-query probe at any replica scale, with conf overrides.

Runs each named query in THIS process (one fresh benchmark_session), one
cold pass + optional warm passes, releasing localCheckpoint blocks between
queries off the clock (the consistent-harness protocol of
docs/scale_sweep_r5.jsonl's revalidation-v2 rows).  Prints one JSON line
per query.

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
        t0 = time.perf_counter()
        df = REGISTRY[name].fn(spark, sf_dir)
        force_execute(df)
        cold = time.perf_counter() - t0
        warms = []
        for _ in range(warm_passes):
            release_persisted(spark, keep_ids)
            df = REGISTRY[name].fn(spark, sf_dir)
            t0 = time.perf_counter()
            force_execute(df)
            warms.append(round(time.perf_counter() - t0, 3))
        print(
            json.dumps(
                {
                    "query": name,
                    "sf_dir": sf_dir,
                    "cold_s": round(cold, 3),
                    "warm_s": warms,
                    "conf": extra_conf,
                }
            ),
            flush=True,
        )
        release_persisted(spark, keep_ids)
    return 0


if __name__ == "__main__":
    sys.exit(main())
