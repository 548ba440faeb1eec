#!/usr/bin/env python
"""Full local replica of the driver's correctness gate.

Runs EVERY registered query at sf0.01 and compares against its DuckDB
oracle (testing.compare_to_oracle — same contract as CORRECTNESS_r{N}).
Queries without an oracle get a rows-only smoke (runs, returns >= 0 rows).

Usage: python scripts/oracle_sweep.py [name-substring ...]
Exit 0 iff everything matches.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry  # noqa: E402
from datafusion_parallelism_spark.session import get_spark  # noqa: E402
from datafusion_parallelism_spark.testing import compare_to_oracle  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")


def main() -> int:
    filters = sys.argv[1:]
    queries = entry.queries()
    oracles = entry.oracle_sql()
    spark = get_spark(app_name="oracle-sweep")
    spark.sparkContext.setLogLevel("ERROR")

    names = sorted(queries)
    if filters:
        names = [n for n in names if any(f in n for f in filters)]

    failed: list[str] = []
    for name in names:
        t0 = time.perf_counter()
        try:
            df = queries[name](spark, SF_DIR)
            if name in oracles:
                ok, detail = compare_to_oracle(spark, df, oracles[name], SF_DIR)
            else:
                n = df.count()
                ok, detail = n >= 0, f"rows-only ({n} rows, no oracle)"
        except Exception as exc:  # noqa: BLE001
            ok, detail = False, f"EXCEPTION: {type(exc).__name__}: {exc}"
        dt = time.perf_counter() - t0
        status = "PASS" if ok else "FAIL"
        print(f"{status} {name:32s} {dt:6.2f}s  {detail}", flush=True)
        if not ok:
            failed.append(name)

    print(f"\n{len(names) - len(failed)}/{len(names)} passed")
    if failed:
        print("FAILED:", " ".join(failed))
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
