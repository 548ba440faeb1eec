#!/usr/bin/env python
"""Resume a scale-sweep factor whose Spark phase is durably recorded but
whose DuckDB phase died (e.g. kernel-OOM-killed at x128): re-run ONLY the
DuckDB oracles (isolated per-oracle subprocesses) and append the complete
factor row to SWEEP_OUT.

Usage: SWEEP_OUT=... SWEEP_DUCKDB_SKIP=... python scripts/sweep_resume_duck.py <factor>
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))

from scale_sweep import OUT_ROOT, duckdb_wall_isolated  # noqa: E402


def main() -> None:
    factor = int(sys.argv[1])
    out = os.environ["SWEEP_OUT"]
    spark_row = None
    for line in open(out):
        r = json.loads(line)
        if r.get("factor") == factor and r.get("phase") == "spark-only":
            spark_row = r  # last spark-only row for the factor wins
    if spark_row is None:
        raise SystemExit(f"no spark-only row for factor {factor} in {out}")
    sf_dir = os.path.join(OUT_ROOT, f"x{factor}")
    from bench import HEADLINE

    duck = duckdb_wall_isolated(sf_dir, HEADLINE)
    row = {
        "factor": factor,
        "input_mb": spark_row["input_mb"],
        "spark_wall_s": spark_row["spark_wall_s"],
        "duckdb_wall_s": round(
            sum(v for v in duck.values() if isinstance(v, (int, float))), 3
        ),
        "spark_queries": spark_row["spark_queries"],
        "duckdb_queries": duck,
    }
    print(json.dumps(row), flush=True)
    with open(out, "a") as fh:
        fh.write(json.dumps(row) + "\n")


if __name__ == "__main__":
    main()
