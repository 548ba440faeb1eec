"""A/B harness for per-query fixed-floor experiments at sf0.1.

Each config runs in a FRESH subprocess (JVM confs are immutable per
session): build the plan once, one warm-up, then mean of N passes —
the bench.py protocol in miniature.  Prints one JSON line per config.

Usage: python scripts/perf_ab.py            # all configs
       SPARK_GRAFT_SF_DIR=... python ...    # other scale

Findings (2026-08-14, quiet window, sf0.1): every knob below is within
±5% of baseline — Kryo, shuffle compression off, locality.wait=0, and
their combination.  A separate experiment raised the STATIC
autoBroadcastJoinThreshold to the 64 MB AQE allowance (so orders/
customer broadcast instead of shuffling): total went 3.82 → 3.98 s —
single-threaded broadcast hash-table builds cost more than the tiny
shuffles they replace at this scale.  Conclusion: the remaining
~0.1-0.7 s/query floor is stage-scheduling latency inherent to the JVM
task model at MB-scale inputs, not a plan or conf defect; the scale
sweeps (docs/scale_sweep_r3.jsonl) show it amortized away by ~300 MB.
"""

import json
import os
import statistics
import subprocess
import sys

QUERIES = ["tpch_q3", "join_inner_chain", "agg_count_distinct", "window_rank_orders"]

CONFIGS: dict[str, dict[str, str]] = {
    "baseline": {},
    "kryo": {"spark.serializer": "org.apache.spark.serializer.KryoSerializer"},
    "no_shuffle_compress": {
        "spark.shuffle.compress": "false",
        "spark.shuffle.spill.compress": "false",
    },
    "locality0": {"spark.locality.wait": "0s"},
    "all": {
        "spark.serializer": "org.apache.spark.serializer.KryoSerializer",
        "spark.shuffle.compress": "false",
        "spark.shuffle.spill.compress": "false",
        "spark.locality.wait": "0s",
    },
}

CHILD = r"""
import json, statistics, sys, time
sys.path.insert(0, "/root/repo")
conf = json.loads(sys.argv[1])
queries = json.loads(sys.argv[2])
sf_dir = sys.argv[3]
from datafusion_parallelism_spark.session import benchmark_session, force_execute
from datafusion_parallelism_spark.queries import REGISTRY
spark = benchmark_session(sf_dir, app_name="perf-ab", extra_conf=conf)
dfs = {n: REGISTRY[n].fn(spark, sf_dir) for n in queries}
for df in dfs.values():
    force_execute(df)  # warm-up
out = {}
for n, df in dfs.items():
    ts = []
    for _ in range(4):
        t0 = time.perf_counter()
        force_execute(df)
        ts.append(time.perf_counter() - t0)
    out[n] = round(statistics.mean(ts), 3)
print("RESULT " + json.dumps(out))
"""


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = sys.argv[1:] or list(CONFIGS)
    for cname in names:
        conf = CONFIGS[cname]
        proc = subprocess.run(
            [sys.executable, "-c", CHILD, json.dumps(conf), json.dumps(QUERIES), sf_dir],
            capture_output=True,
            text=True,
            cwd="/root/repo",
        )
        res = None
        for line in proc.stdout.splitlines():
            if line.startswith("RESULT "):
                res = json.loads(line[len("RESULT "):])
        if res is None:
            print(json.dumps({"config": cname, "error": proc.stderr[-500:]}))
            continue
        print(json.dumps({"config": cname, "total": round(sum(res.values()), 3), **res}), flush=True)


if __name__ == "__main__":
    main()
