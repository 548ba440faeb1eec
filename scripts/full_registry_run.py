#!/usr/bin/env python
"""Full-registry scale run: execute EVERY registered query once at a given
data dir (default: the x64 replica of sf0.1, ~1.15 GB) and record one JSONL
row per query to stdout + a file.

Purpose (VERDICT r3 item 4): the headline sweep proves the 15-query set
sub-linear, but GB-scale cliffs live in the long tail (gram explosions,
quadratic edge derivations, Σdf² blocking).  One recorded full-registry run
at x64 surfaces any query whose wall is wildly out of family so it can be
fixed, not discovered by a user at 100 TB.

Method: one pass per query (build + execute via the noop sink, plan
included — cliffs at this scale dwarf per-pass noise), results flushed line
by line so a hung query is visible in the partial file.  Pair with a lower
factor run (e.g. x16) to compute per-query scaling ratios.

Usage:
    python scripts/scale_sweep.py --generate-only 64   # make the replica
    python scripts/full_registry_run.py /tmp/spark_graft_scale/x64 \
        docs/full_registry_x64.jsonl
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
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_scale/x64"
    out_path = sys.argv[2] if len(sys.argv) > 2 else None
    only = sys.argv[3:]
    spark = benchmark_session(sf_dir, app_name="full-registry-run")
    # Snapshot deliberately-cached tables (from_memory-style sessions) so
    # the between-query release below never unpersists them (mirrors
    # bench.py's keep_ids protocol).
    keep_ids = frozenset(persistent_rdd_ids(spark))

    # Protocol (round 6): FIXED alphabetical order, so each query's
    # position — and therefore its exposure to any residual cross-query
    # session state — is comparable round-over-round without isolated
    # re-measure appendices (cf. docs/full_registry_x64_r5_notes.md).
    names = sorted(REGISTRY)
    if only:
        names = [n for n in names if any(f in n for f in only)]
    out_f = open(out_path, "a") if out_path else None
    failed = []
    for i, name in enumerate(names):
        t0 = time.perf_counter()
        try:
            force_execute(REGISTRY[name].fn(spark, sf_dir))
            row = {"query": name, "sec": round(time.perf_counter() - t0, 2)}
        except Exception as exc:  # noqa: BLE001
            row = {
                "query": name,
                "sec": round(time.perf_counter() - t0, 2),
                "error": f"{type(exc).__name__}: {exc}"[:300],
            }
            failed.append(name)
        line = json.dumps(row)
        print(f"[{i + 1}/{len(names)}] {line}", flush=True)
        if out_f:
            out_f.write(line + "\n")
            out_f.flush()
        # Off the clock: drop the finished query's localCheckpoint blocks so
        # late-position queries don't run under block-manager eviction churn
        # (the cross-query inflation documented in bench.py's docstring).
        release_persisted(spark, keep_ids)
    if out_f:
        out_f.close()
    print(f"done: {len(names) - len(failed)}/{len(names)} ok", flush=True)
    if failed:
        print("FAILED:", " ".join(failed))
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
