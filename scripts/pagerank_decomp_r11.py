#!/usr/bin/env python
"""Per-phase decomposition of graph_pagerank at a given SF dir (round 11).

Times, in one fresh benchmark_session:
  * edge derivation + normalize + pinned checkpoint (setup)
  * node table checkpoint (setup)
  * each of the 10 power iterations (one job each), individually
  * the final lazy ranks projection (noop)

Prints one JSON line with the split plus (optionally, PROBE_METRICS=1)
per-Spark-stage counters for the iteration jobs.

Usage: python scripts/pagerank_decomp_r11.py [SF_DIR]
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Observation  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from datafusion_parallelism_spark.operators.graph import (  # noqa: E402
    _ckpt_pinned,
    _presorted,
    _sized,
    _state_parts,
)
from datafusion_parallelism_spark.session import (  # noqa: E402
    benchmark_session,
    force_execute,
    load,
)

DAMPING = 0.85
ITERS = 10


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    extra = {}
    if os.environ.get("PROBE_METRICS") == "1":
        extra["spark.ui.enabled"] = "true"
    spark = benchmark_session(sf_dir, app_name="pagerank-decomp", extra_conf=extra)
    conf_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    out: dict = {"sf_dir": sf_dir, "conf_parts": conf_parts}

    t0 = time.perf_counter()
    orders = load(spark, sf_dir, "orders")
    lineitem = load(spark, sf_dir, "lineitem")
    pairs = (
        orders.join(lineitem, orders["o_orderkey"] == lineitem["l_orderkey"])
        .select(
            (F.col("o_custkey") * 2).alias("u"),
            (F.col("l_suppkey") * 2 + 1).alias("v"),
        )
        .distinct()
    )
    edges = pairs.select(
        F.explode(
            F.array(
                F.struct(F.col("u"), F.col("v")),
                F.struct(F.col("v").alias("u"), F.col("u").alias("v")),
            )
        ).alias("e")
    ).select("e.u", "e.v")
    e = edges.select(F.col("u").alias("src"), F.col("v").alias("dst"))
    e2 = e.repartition(F.col("src"))
    outdeg = e2.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    e_norm = e2.join(outdeg, "src").select(
        "src", "dst", (F.lit(1.0) / F.col("outdeg")).alias("w")
    )
    obs_m = Observation()
    e_norm = _ckpt_pinned(
        e_norm.observe(obs_m, F.count(F.lit(1)).alias("m")).transform(
            _presorted, "src"
        )
    )
    m = obs_m.get["m"]
    t1 = time.perf_counter()
    out["setup_edges_s"] = round(t1 - t0, 3)
    out["m_edges"] = m

    parts = _state_parts(m, conf_parts)
    out["state_parts"] = parts
    if parts < conf_parts:
        e_norm = _ckpt_pinned(
            e_norm.repartition(parts, "src").transform(_presorted, "src")
        )
    t2 = time.perf_counter()
    out["setup_repin_s"] = round(t2 - t1, 3)

    nodes = (
        _sized(
            e_norm.select(F.col("src").alias("node")).union(
                e_norm.select(F.col("dst").alias("node"))
            ),
            parts,
            conf_parts,
            "node",
        ).distinct()
    )
    obs_n = Observation()
    nodes = _ckpt_pinned(
        nodes.observe(obs_n, F.count(F.lit(1)).alias("n")).transform(
            _presorted, "node"
        )
    )
    n = obs_n.get["n"]
    t3 = time.perf_counter()
    out["setup_nodes_s"] = round(t3 - t2, 3)
    out["n_nodes"] = n

    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    iter_walls = []
    for _ in range(ITERS):
        ti = time.perf_counter()
        contrib = (
            _sized(
                e_norm.join(ranks, e_norm["src"] == ranks["node"]).select(
                    "dst", (F.col("rank") * F.col("w")).alias("c")
                ),
                parts,
                conf_parts,
                "dst",
            )
            .groupBy("dst")
            .agg(F.sum("c").alias("contrib"))
        )
        obs = Observation()
        contrib = contrib.observe(
            obs, F.coalesce(F.sum("contrib"), F.lit(0.0)).alias("s")
        ).localCheckpoint(eager=True)
        dm = F.lit(1.0 - obs.get["s"])
        new_ranks = nodes.join(contrib, nodes["node"] == contrib["dst"], "left")
        ranks = new_ranks.select(
            "node",
            (
                F.lit((1.0 - DAMPING) / n)
                + F.lit(DAMPING)
                * (F.coalesce(F.col("contrib"), F.lit(0.0)) + dm / F.lit(float(n)))
            ).alias("rank"),
        )
        iter_walls.append(round(time.perf_counter() - ti, 3))
    out["iter_walls_s"] = iter_walls
    out["iters_total_s"] = round(sum(iter_walls), 3)

    t4 = time.perf_counter()
    final = ranks.select(
        F.when(F.col("node") % 2 == 0, F.lit("customer"))
        .otherwise(F.lit("supplier"))
        .alias("kind"),
        ((F.col("node") - F.col("node") % 2) / 2).cast("long").alias("key"),
        F.round("rank", 7).alias("rank_r7"),
    )
    force_execute(final)
    out["final_noop_s"] = round(time.perf_counter() - t4, 3)
    out["total_s"] = round(time.perf_counter() - t0, 3)

    if os.environ.get("PROBE_METRICS") == "1":
        from datafusion_parallelism_spark.metrics import stage_metrics

        out["stages"] = {
            str(k): v for k, v in sorted(stage_metrics(spark).items())
        }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
