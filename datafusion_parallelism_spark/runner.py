"""Benchmark runner CLI — analog of the reference's TPC-H harness binary.

Parity target: ``tpc/src/main.rs:143-288`` — args for data path / query /
iterations / from-memory, per-iteration wall-clock timing, the first
iteration's result written to ``<query>.csv``, the plan dumped to
``<query>_plan.txt``, and a JSON timings file (``:271-287, 349-377``).

Usage::

    python -m datafusion_parallelism_spark.runner \
        --data-path /root/testdata/sf0.01 --query tpch_q1 --query tpch_q3 \
        --iterations 3 --from-memory --output-dir results/

``--query all`` (default) runs every registered query with an oracle.
Timing includes full plan execution via the noop sink (every operator runs,
nothing materializes on the driver), matching the reference's collect into
a discarded Vec.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import time

from .plans.shaping import explain_str
from .queries import REGISTRY
from .session import benchmark_session
from .session import force_execute as _force
from .sinks import write_csv
from .sources.memory import materialize_tables


def run(argv: list[str] | None = None) -> dict:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--data-path", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--query", action="append", default=None,
                    help="query name from the registry; repeatable; default: all")
    ap.add_argument("--iterations", type=int, default=1)
    ap.add_argument("--from-memory", action="store_true",
                    help="cache all tables in executor memory first (StaticTable mode)")
    ap.add_argument("--output-dir", default=None,
                    help="write <q>.csv, <q>_plan.txt and timings.json here")
    args = ap.parse_args(argv)
    if args.iterations < 1:
        ap.error("--iterations must be >= 1")

    names = args.query or ["all"]
    if "all" in names:
        names = sorted(REGISTRY)
    unknown = [n for n in names if n not in REGISTRY]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}; known: {sorted(REGISTRY)}")

    spark = benchmark_session(args.data_path, app_name="tpch-runner")

    cached = materialize_tables(spark, args.data_path) if args.from_memory else None
    if args.output_dir:
        os.makedirs(args.output_dir, exist_ok=True)

    report: dict = {
        "data_path": args.data_path,
        "iterations": args.iterations,
        "from_memory": bool(args.from_memory),
        "queries": {},
    }
    for name in names:
        fn = REGISTRY[name].fn
        timings = []
        for it in range(args.iterations):
            df = fn(spark, args.data_path)
            t0 = time.perf_counter()
            _force(df)
            timings.append(round(time.perf_counter() - t0, 4))
            if it == 0 and args.output_dir:
                write_csv(df, os.path.join(args.output_dir, f"{name}.csv"), single_file=True)
                with open(os.path.join(args.output_dir, f"{name}_plan.txt"), "w") as fh:
                    fh.write(explain_str(df))
        report["queries"][name] = {
            "times_sec": timings,
            "best": min(timings),
            "mean": round(statistics.mean(timings), 4),
        }

    if args.output_dir:
        with open(os.path.join(args.output_dir, "timings.json"), "w") as fh:
            json.dump(report, fh, indent=2)
    if cached:
        from .sources.memory import release_tables

        release_tables(cached)
    return report


def main() -> None:
    report = run()
    print(json.dumps(report))


if __name__ == "__main__":
    main()
