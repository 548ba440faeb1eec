"""Iterative graph operators on DataFrames (dedup clusters, PageRank).

Near-dup detection emits PAIRS; a dedup pipeline must resolve them into
clusters and pick one canonical doc per cluster.  That is connected
components — an inherently iterative algorithm the reference's SQL surface
cannot express (and the class of computation its bounded-execution model
never covers).

Implementation: minimum-label propagation with POINTER JUMPING.  Each
node starts labeled with itself; every iteration (a) takes the min of its
own label and its neighbors' labels (one-hop propagation), then (b) twice
replaces its label with its label's label (path compression, the pointer-
doubling trick from PRAM connectivity / Kiveris et al.'s "Connected
Components in MapReduce and Beyond").  Labels only decrease, so the
global label sum decreases monotonically and equality == fixpoint.  At a
fixpoint every edge has equal endpoint labels (both orientations are
present, so propagation enforces l(u) <= l(v) and l(v) <= l(u)) and the
component minimum m keeps l(m) = m, hence every label equals its
component minimum — same contract as plain propagation.

Plain propagation needs diameter iterations — fine for LSH near-dup
cliques, fatal for adversarial chain-shaped dup graphs (A~B~C~...) whose
diameter at 100 TB can be thousands.  Jumping compresses label chains
geometrically: a 1000-node path converges in <= 8 iterations (pinned in
tests/test_graph_operators.py) instead of 999.

Scale posture: each iteration is one shuffled join edges⋈labels + one
aggregation — all distributed; the driver only compares two scalar sums
per iteration.  Lineage is truncated with localCheckpoint every iteration
so plans stay O(1) deep regardless of iteration count (the standard Spark
iterative-algorithm hygiene).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    max_iter: int = 20,
    checkpoint: bool = True,
    stats: dict | None = None,
) -> DataFrame:
    """Connected components of an undirected graph.

    ``edges``: DataFrame with two columns (u, v) — one row per edge (either
    orientation).  Returns DataFrame (node, cluster) where cluster is the
    minimum node id in the component.  Nodes appear iff they occur in an
    edge (callers union isolated nodes if needed).

    ``stats``: optional dict; on return ``stats["iterations"]`` holds the
    number of label-update iterations executed (convergence-detection
    iteration excluded) — observability for the log-diameter guarantee.
    """
    u, v = edges.columns[:2]
    spark = edges.sparkSession
    und = edges.select(F.col(u).alias("src"), F.col(v).alias("dst")).union(
        edges.select(F.col(v).alias("src"), F.col(u).alias("dst"))
    ).distinct()
    if checkpoint:
        # The edge list is re-joined every iteration; without truncating its
        # lineage here, the WHOLE upstream pipeline that produced the edges
        # (e.g. MinHash-LSH candidate generation) re-executes per iteration.
        und = und.localCheckpoint(eager=True)

    # Iteration-state partition sizing (same rationale as pagerank): the
    # label table is O(nodes) rows; running every per-iteration stage at
    # the input-tuned shuffle width burns scheduling overhead on empty
    # tasks when the dup graph is small.  One partition per ~50k edge
    # rows, floor 4, ceiling the session conf (no-op at real scale).
    m = und.count()
    conf_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    parts = max(4, min(conf_parts, -(-m // 50_000)))
    prev_conf = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(parts))
    try:
        if checkpoint:
            und = und.repartition(parts, "dst").localCheckpoint(eager=True)

        labels = und.select(F.col("src").alias("node")).distinct().withColumn(
            "cluster", F.col("node")
        )
        if checkpoint:
            labels = labels.repartition(parts, "node").localCheckpoint(eager=True)
        prev_sum = labels.agg(F.sum("cluster")).collect()[0][0]

        converged = False
        iterations = 0
        # max_iter + 1: detecting convergence costs one extra (no-change)
        # iteration, so the usable propagation budget stays a full max_iter.
        for _ in range(max_iter + 1):
            neighbor_min = (
                und.join(labels, und["dst"] == labels["node"])
                .groupBy("src")
                .agg(F.min("cluster").alias("nmin"))
            )
            new_labels = (
                labels.join(neighbor_min, labels["node"] == neighbor_min["src"], "left")
                .select(
                    "node",
                    F.least(
                        F.col("cluster"), F.coalesce(F.col("nmin"), F.col("cluster"))
                    ).alias("cluster"),
                )
            )
            # Pointer jumping ×2: cluster <- cluster's cluster.  Every label
            # IS a node id of the same component (initial l(x)=x; propagation
            # and jumping both pick labels of component members), so the
            # self-join always finds the row; coalesce guards the left join
            # anyway.  l(l(u)) <= l(u) because l is monotone (<= identity),
            # so the sum still decreases monotonically and equality remains a
            # fixpoint test.  Two jumps per round ~4x chain compression at
            # the cost of two cheap co-partitioned joins.
            for _ in range(2):
                parents = new_labels.select(
                    F.col("node").alias("p_node"), F.col("cluster").alias("p_cluster")
                )
                new_labels = (
                    new_labels.join(
                        parents, new_labels["cluster"] == parents["p_node"], "left"
                    )
                    .select(
                        "node",
                        F.coalesce(F.col("p_cluster"), F.col("cluster")).alias("cluster"),
                    )
                )
            if checkpoint:
                new_labels = new_labels.localCheckpoint(eager=True)
            new_sum = new_labels.agg(F.sum("cluster")).collect()[0][0]
            labels = new_labels
            if new_sum == prev_sum:
                converged = True
                break
            iterations += 1
            prev_sum = new_sum
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_conf)
    if stats is not None:
        stats["iterations"] = iterations
    if not converged:
        # Silent wrong labels are worse than failing: min-label propagation
        # moves the minimum one hop per iteration, so a component with
        # diameter > max_iter would return non-minimal cluster ids.
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} iterations "
            "(component diameter exceeds max_iter); raise max_iter"
        )
    return labels


def pagerank(
    edges: DataFrame,
    damping: float = 0.85,
    iterations: int = 10,
    checkpoint: bool = True,
) -> DataFrame:
    """PageRank with uniform teleport and dangling-mass redistribution.

    Web-scale corpus curation weights documents by the link authority of
    their source (the CommonCrawl-style quality signal); this is the
    distributed power iteration that computes it.  Fixed ``iterations``
    (no convergence test) keeps the result a deterministic function of the
    graph — the property that lets an unrolled-CTE SQL oracle reproduce it
    bit-for-bit up to summation order.

    ``edges``: DataFrame whose first two columns are (src, dst); duplicate
    edges are collapsed (unweighted graph).  Nodes appear iff they occur in
    an edge.  Returns (node, rank) with sum(rank) == 1: per iteration,

        rank'(v) = (1-d)/N + d * (sum_{u->v} rank(u)/outdeg(u) + D/N)

    where D is the total rank mass sitting on dangling nodes (outdeg 0),
    redistributed uniformly — the standard strongly-preferential handling,
    which preserves the probability-distribution invariant.  D is computed
    by MASS CONSERVATION, not a second pass over ranks: every node with
    out-edges distributes exactly its rank (Σ_v contrib(v) = Σ_{outdeg>0}
    rank(u)) and Σ rank = 1 is invariant, so D = 1 - Σ_v contrib(v) — an
    O(N)-row re-aggregation of the already-materialized contribution
    table instead of an anti-join over the rank vector (fp drift vs the
    direct sum is ~1e-15/iteration, far under the 1e-7 oracle rounding).

    Scale posture: edges are normalized ONCE into (src, dst, 1/outdeg),
    REPARTITIONED BY src and lineage-truncated — localCheckpoint preserves
    the hash partitioning in its LogicalRDD, so the per-iteration join
    edges⋈ranks never re-exchanges the (large) edge side.  nodes is
    likewise pinned on node, and every rank/contrib table in the loop
    inherits node-partitioning from it, which leaves exactly ONE exchange
    per iteration: the map-side-combined contribution SUM moving mass from
    src- to dst-partitioning (information-theoretically required).  The
    dangling mass stays in a 1-row DataFrame cross-broadcast onto the
    update — no per-iteration driver collect; the only driver scalar is N
    (one count).
    """
    u, v = edges.columns[:2]
    spark = edges.sparkSession
    e = edges.select(F.col(u).alias("src"), F.col(v).alias("dst")).distinct()
    if checkpoint:
        e = e.localCheckpoint(eager=True)
    m = e.count()
    # Iteration-state partition sizing: the rank/contribution tables are
    # O(nodes) rows, often orders of magnitude smaller than the session's
    # shuffle-partition conf is tuned for (which follows the INPUT size).
    # Running every per-iteration stage at conf width means
    # iterations x conf near-empty tasks of pure scheduling overhead —
    # measured 2x the whole query wall at sf0.1 (32 -> 4 partitions took
    # 8.1 s to 3.9 s).  One partition per ~50k state rows, floor 4,
    # ceiling at the session conf (at real scale this is a no-op).
    conf_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    parts = max(4, min(conf_parts, -(-m // 50_000)))
    prev_conf = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(parts))
    try:
        nodes = (
            e.select(F.col("src").alias("node"))
            .union(e.select(F.col("dst").alias("node")))
            .distinct()
        )
        if checkpoint:
            nodes = nodes.repartition(parts, "node").localCheckpoint(eager=True)
        n = nodes.count()
        outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
        # Pre-normalized edge weights: contribution of u to v is rank(u)
        # * w with w = 1/outdeg(u).  1/k is the same IEEE double in any
        # engine, so cross-engine drift reduces to SUM order alone.
        e_norm = e.join(outdeg, "src").select(
            "src", "dst", (F.lit(1.0) / F.col("outdeg")).alias("w")
        )
        if checkpoint:
            e_norm = e_norm.repartition(parts, "src").localCheckpoint(eager=True)

        # Loop shape: the ONLY materialization per iteration is the
        # contribution table (eager checkpoint = one job).  The rank
        # vector itself stays a SHALLOW LAZY view over the materialized
        # contribs (nodes ⋈ contrib + broadcast dangling mass): it is
        # consumed exactly once (next iteration's contribution join), and
        # because contrib_i is an RDD both of its consumers (the dm
        # re-aggregation and the join) read the materialized rows —
        # nothing in the loop is ever computed twice, and plans stay O(1)
        # deep without checkpointing ranks at all.  With nodes/e_norm
        # pinned on (node)/(src) at `parts` width, the only exchange per
        # iteration is the contribution sum moving mass from src- to
        # dst-partitioning.
        ranks = nodes.withColumn("rank", F.lit(1.0 / n))
        for _ in range(iterations):
            contrib = (
                e_norm.join(ranks, e_norm["src"] == ranks["node"])
                .select("dst", (F.col("rank") * F.col("w")).alias("c"))
                .groupBy("dst")
                .agg(F.sum("c").alias("contrib"))
            )
            if checkpoint:
                contrib = contrib.localCheckpoint(eager=True)
            dangling = contrib.agg(
                (F.lit(1.0) - F.coalesce(F.sum("contrib"), F.lit(0.0))).alias("dm")
            )
            ranks = (
                nodes.join(contrib, nodes["node"] == contrib["dst"], "left")
                .crossJoin(F.broadcast(dangling))
                .select(
                    "node",
                    (
                        F.lit((1.0 - damping) / n)
                        + F.lit(damping)
                        * (
                            F.coalesce(F.col("contrib"), F.lit(0.0))
                            + F.col("dm") / F.lit(float(n))
                        )
                    ).alias("rank"),
                )
            )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_conf)
    return ranks


def triangle_counts(edges: DataFrame) -> DataFrame:
    """Per-node triangle counts for an UNDIRECTED simple graph given as a
    (u, v) edge DataFrame with u < v, no duplicates.

    Compact-forward orientation: each edge is re-pointed from its
    lower-(degree, id) endpoint to the higher one, so every triangle has
    exactly one "apex" node whose two out-edges form the wedge — each
    triangle is generated once, and wedge fan-out is bounded by
    Σ outdeg(v)² with max outdeg O(√m) on ANY degree distribution (the
    hub-skew guard: a star graph's center gets outdeg 0, not n).  The
    closing edge is checked with a LEFT SEMI join (existence, no
    multiplication).  Two hash shuffles total (wedge key src, probe key
    (dst, dst)); nothing graph-sized is broadcast or collected.

    Reference analog: none (the reference has no graph surface); this is
    the standard distributed formulation (cf. Suri & Vassilvitskii,
    WWW'11 "Counting Triangles and the Curse of the Last Reducer")."""
    deg = (
        edges.select(F.col("u").alias("n"))
        .union(edges.select("v"))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    du, dv = deg.alias("du"), deg.alias("dv")
    keyed = (
        edges.join(du, F.col("du.n") == F.col("u"))
        .join(dv, F.col("dv.n") == F.col("v"))
        .select(
            "u",
            "v",
            F.struct(F.col("du.d").alias("d"), F.col("u").alias("n")).alias("ku"),
            F.struct(F.col("dv.d").alias("d"), F.col("v").alias("n")).alias("kv"),
        )
    )
    # kdst rides along: wedge out-edges must be ordered by the SAME
    # (degree, id) total order the orientation uses — ordering them by raw
    # node id lets the closing edge point the "wrong way" whenever degree
    # order disagrees with id order (caught by the hypothesis test on
    # edges [(0,1),(0,2),(0,3),(1,2)]).
    o = keyed.select(
        F.when(F.col("ku") < F.col("kv"), F.col("u")).otherwise(F.col("v")).alias("src"),
        F.when(F.col("ku") < F.col("kv"), F.col("v")).otherwise(F.col("u")).alias("dst"),
        F.when(F.col("ku") < F.col("kv"), F.col("kv")).otherwise(F.col("ku")).alias("kdst"),
    ).localCheckpoint(eager=False)
    e1, e2, e3 = o.alias("e1"), o.alias("e2"), o.alias("e3")
    tri = (
        e1.join(
            e2,
            (F.col("e1.src") == F.col("e2.src"))
            & (F.col("e1.kdst") < F.col("e2.kdst")),
        )
        .select(
            F.col("e1.src").alias("ta"),
            F.col("e1.dst").alias("tb"),
            F.col("e2.dst").alias("tc"),
        )
        .join(
            e3,
            (F.col("e3.src") == F.col("tb")) & (F.col("e3.dst") == F.col("tc")),
            "left_semi",
        )
    )
    corners = (
        tri.select(F.col("ta").alias("node"))
        .union(tri.select("tb"))
        .union(tri.select("tc"))
    )
    return corners.groupBy("node").agg(F.count(F.lit(1)).alias("triangles"))
