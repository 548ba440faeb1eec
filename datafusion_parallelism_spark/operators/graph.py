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

Scale posture: every per-iteration stage is distributed (shuffled joins +
aggregations); the driver only sees one SCALAR per iteration (the label
sum / the dangling mass), and since round 5 that scalar rides the
iteration's single materialization job via ``DataFrame.observe`` — each
iteration is exactly ONE Spark job, no separate collect/broadcast jobs.
Lineage is truncated with localCheckpoint every iteration so plans stay
O(1) deep regardless of iteration count (the standard Spark iterative-
algorithm hygiene).

Iteration-state width (round 5, replacing the round-4 session-conf flip):
the loop-state tables are O(nodes) rows, often far smaller than the
session's shuffle width is tuned for (which follows the INPUT size), and
the bench session disables AQE coalescing below 256 MB — so without
sizing, every iteration schedules conf-width near-empty tasks (measured
2x the whole pagerank wall at sf0.1).  Instead of mutating the session-
global ``spark.sql.shuffle.partitions`` (unsafe under concurrency: any
query planned on the shared session inside the window inherits the
narrowed width — and the final lazy ``ranks`` plan used to execute AFTER
the conf was restored, defeating the sizing), every state-side shuffle
point is now explicitly ``repartition(parts, key)``.  The pre-shuffle
repartition bypasses map-side partial aggregation, so it is applied ONLY
in the small-state regime (``parts < conf``) where scheduling overhead
dominates and combine volume is irrelevant; in the big regime
(``parts == conf``, i.e. real scale) the planner's own conf-width
exchange with map-side combine is kept.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

#: One shuffle partition per this many iteration-state rows (floor 4,
#: ceiling the session conf) — the same sizing rule the round-4 conf flip
#: used, now applied per-shuffle-point.
_STATE_ROWS_PER_PARTITION = 50_000

#: Edge-count ceiling for the single-task PageRank kernel (round 11).
#: Below it, the whole power iteration runs inside ONE ``mapInArrow``
#: task over the materialized edge table instead of 10 distributed
#: join+aggregate rounds.  Rationale (guide §1.3 napkin math): a
#: distributed iteration moves ~|E| rows through an exchange per
#: iteration (10·|E| total) plus pays ~2 stage walls + a checkpoint per
#: round — measured 0.26–0.29 s/iteration of almost pure scheduling
#: overhead at sf0.1 (1.17M edges, ~80 ms of task time per round;
#: docs/pagerank_decomp_r11.json) — while the kernel moves the edges
#: ONCE and runs the 10 gather/scatter passes in vectorized NumPy
#: (~20 ms each).  4M edges ≈ 24 B/edge ≈ 100 MB of task arrays, well
#: inside one task's memory share on any sane executor; above the
#: ceiling the distributed loop (the 100 TB path) is unchanged.
#: Kill-switch: spark.graft.pagerank_local_max_edges=0.
_PAGERANK_KERNEL_MAX_EDGES = 4_000_000


def _state_parts(m: int, conf_parts: int) -> int:
    return max(4, min(conf_parts, -(-m // _STATE_ROWS_PER_PARTITION)))


def _presorted(df: DataFrame, *keys: str) -> DataFrame:
    """Sort a loop-invariant table by its loop join key before its
    checkpoint so iteration-time SortMergeJoins can skip re-sorting it.
    Only effective through :func:`_ckpt_pinned` — a plain localCheckpoint
    under AQE erases the stored ordering (and partitioning), which is
    exactly why the r9 presort left pagerank's 13 GB/iteration sort spill
    unchanged at x256: the per-iteration SMJ re-sorted (and re-exchanged)
    the edge table anyway.  Mechanism, evidence and kill-switch
    (spark.graft.presort=false): plans/shaping.presorted."""
    from ..plans.shaping import presorted

    return presorted(df, *keys)


def _ckpt_pinned(df: DataFrame) -> DataFrame:
    """Eager localCheckpoint that keeps partitioning/ordering metadata
    under AQE (plans/shaping.checkpoint_pinned) — the property every
    loop-invariant table here depends on.  Kill-switch
    spark.graft.pin=false."""
    from ..plans.shaping import checkpoint_pinned

    return checkpoint_pinned(df)


def _sized(df: DataFrame, parts: int, conf_parts: int, *keys: str) -> DataFrame:
    """Pre-size the NEXT shuffle of ``df`` on ``keys``.

    parts < conf (small-state regime): explicit ``repartition(parts,
    keys)`` — the downstream groupBy/join sees its clustering requirement
    already satisfied and inserts no further exchange, so the whole stage
    runs at ``parts`` width instead of session width.  parts == conf (real
    scale): no-op — the planner's own exchange is the same width AND keeps
    map-side partial aggregation, which the explicit repartition would
    bypass.
    """
    if parts < conf_parts:
        return df.repartition(parts, *keys)
    return df


def _pagerank_arrow(
    edges: DataFrame,
    damping: float,
    iterations: int,
    normalized: bool,
    single_partition: bool = False,
    dedup: bool = False,
) -> DataFrame:
    """Single-task PageRank over a small edge table.

    ``edges``: (src, dst, w) with w = 1/outdeg(src) when ``normalized``,
    else (src, dst) — the kernel then computes 1/outdeg itself with the
    identical IEEE division.  Duplicates must already be collapsed.  All
    ``iterations`` power-iteration steps run inside one ``mapInArrow``
    task: contributions via ``np.bincount`` (the exact rank·w products
    the distributed plan computes, summed per dst in index order — a
    reordering of the same IEEE doubles, the tolerance every oracle
    already grants the distributed SUM), dangling mass by the same
    conservation identity D = 1 − Σ contrib the observe-based loop uses.

    ``single_partition=False`` (post-materialization callers): the edges
    are an already-checkpointed table, fetched into the one task by a
    narrow ``coalesce(1)``.  ``single_partition=True`` (bounded-ahead
    callers): the derivation has NOT been materialized, so a narrow
    coalesce would collapse its upstream stages to one task too — a
    keyless ``repartition(1)`` keeps the derivation parallel and moves
    only the final |E| rows to the kernel task."""
    node_t = edges.schema["src"].dataType.simpleString()
    cols = ["src", "dst", "w"] if normalized else ["src", "dst"]

    def kernel(batches):
        import numpy as np
        import pyarrow as pa

        parts: list = [[] for _ in cols]
        for b in batches:
            for i in range(len(cols)):
                parts[i].append(b.column(i).to_numpy(zero_copy_only=False))
        if not parts[0]:
            return
        src = np.concatenate(parts[0])
        dst = np.concatenate(parts[1])
        nodes, idx = np.unique(np.concatenate([src, dst]), return_inverse=True)
        n = int(len(nodes))
        if n == 0:
            return
        si = idx[: len(src)]
        di = idx[len(src):]
        if dedup:
            # In-kernel edge dedup (duplicates collapse, unweighted
            # graph): unique on the packed (si, di) index pair — saves
            # the caller a distributed distinct exchange when the kernel
            # consumes every edge anyway.  si, di < n and n·n fits int64
            # under the kernel's edge ceiling.
            packed = np.unique(si.astype(np.int64) * n + di)
            si = packed // n
            di = packed % n
        if normalized:
            w = np.concatenate(parts[2])
        else:
            outdeg = np.bincount(si, minlength=n).astype(np.float64)
            with np.errstate(divide="ignore"):
                winv = 1.0 / outdeg  # dangling nodes have no src rows
            w = winv[si]
        rank = np.full(n, 1.0 / n)
        for _ in range(iterations):
            contrib = np.bincount(di, weights=rank[si] * w, minlength=n)
            dm = 1.0 - contrib.sum()
            rank = (1.0 - damping) / n + damping * (contrib + dm / n)
        yield pa.RecordBatch.from_arrays(
            [pa.array(nodes), pa.array(rank, type=pa.float64())],
            names=["node", "rank"],
        )

    one = (
        edges.select(*cols).repartition(1)
        if single_partition
        else edges.select(*cols).coalesce(1)
    )
    return one.mapInArrow(kernel, schema=f"node {node_t}, rank double")


def _cc_arrow(und: DataFrame, max_iter: int) -> DataFrame:
    """Single-task connected components over a small symmetrized distinct
    edge table: the EXACT distributed schedule (one-hop neighbor minimum +
    two pointer jumps per iteration, stop on unchanged labels, raise past
    ``max_iter``) run in NumPy inside one ``mapInArrow`` task.  Pure
    integer math — iterates, iteration counts and the non-convergence
    contract are identical to the distributed loop by construction.
    Emits (node, cluster, iters); iters is constant (observability for
    the stats dict)."""
    node_t = und.schema["src"].dataType.simpleString()

    def kernel(batches):
        import numpy as np
        import pyarrow as pa

        srcs, dsts = [], []
        for b in batches:
            srcs.append(b.column(0).to_numpy(zero_copy_only=False))
            dsts.append(b.column(1).to_numpy(zero_copy_only=False))
        if not srcs:
            return
        src = np.concatenate(srcs)
        dst = np.concatenate(dsts)
        nodes = np.unique(np.concatenate([src, dst]))
        n = len(nodes)
        if n == 0:
            return
        si = np.searchsorted(nodes, src)
        di = np.searchsorted(nodes, dst)
        # Labels as indices into the sorted node array: index order ==
        # id order, so index minima are id minima.
        label = np.arange(n, dtype=np.int64)
        converged = False
        iterations = 0
        for _ in range(max_iter + 1):
            new = label.copy()
            np.minimum.at(new, si, label[di])  # one-hop neighbor min
            new = new[new]  # pointer jump 1
            new = new[new]  # pointer jump 2
            if np.array_equal(new, label):
                converged = True
                break
            label = new
            iterations += 1
        if not converged:
            raise RuntimeError(
                f"connected_components did not converge in {max_iter} "
                "iterations (component diameter exceeds max_iter); raise "
                "max_iter"
            )
        yield pa.RecordBatch.from_arrays(
            [
                pa.array(nodes),
                pa.array(nodes[label]),
                pa.array(np.full(n, iterations, dtype=np.int32)),
            ],
            names=["node", "cluster", "iters"],
        )

    return und.coalesce(1).mapInArrow(
        kernel, schema=f"node {node_t}, cluster {node_t}, iters int"
    )


#: Edge-count ceiling for the single-task connected-components kernel —
#: same arithmetic and rationale as _PAGERANK_KERNEL_MAX_EDGES (the CC
#: loop additionally runs a VARIABLE number of driver-synced iterations,
#: up to max_iter + 1 jobs).  Kill-switch: spark.graft.cc_local_max_edges=0.
_CC_KERNEL_MAX_EDGES = 4_000_000


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

    Job budget (checkpoint=True): setup = 2 jobs (edge checkpoint+count,
    label checkpoint), then exactly 1 job per iteration — the label
    checkpoint, whose ``observe`` carries the convergence sum.
    """
    u, v = edges.columns[:2]
    spark = edges.sparkSession
    conf_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    # Symmetrize with ONE generator pass, not union-of-projections: union
    # would inline the caller's edge-producing subtree twice, and unless
    # its top happens to be a reusable exchange, both copies execute
    # (e.g. dedup_near_clusters feeds the MinHash verify join here — its
    # shingle HOF stage ran twice before this).  explode touches the
    # subtree once by construction.
    und = (
        edges.select(
            F.explode(
                F.array(
                    F.struct(F.col(u).alias("src"), F.col(v).alias("dst")),
                    F.struct(F.col(v).alias("src"), F.col(u).alias("dst")),
                )
            ).alias("e")
        )
        .select("e.src", "e.dst")
        .distinct()
    )
    if checkpoint:
        # The edge list is re-joined every iteration; without truncating its
        # lineage here, the WHOLE upstream pipeline that produced the edges
        # (e.g. MinHash-LSH candidate generation) re-executes per iteration.
        und = und.localCheckpoint(eager=True)
    m = und.count()
    # Small-graph fast path (round 11, mirroring pagerank's): below the
    # kernel ceiling the whole label-propagation loop (up to max_iter + 1
    # driver-synced jobs of pure scheduling floor on a near-dup candidate
    # graph) runs inside ONE Arrow task with the identical integer
    # schedule, including the non-convergence raise — surfaced here
    # driver-side via an eager materialization so the contract (raise
    # from THIS call, not a later action) is preserved.  Kill-switch:
    # spark.graft.cc_local_max_edges=0.
    cc_kernel_max = int(
        spark.conf.get(
            "spark.graft.cc_local_max_edges", str(_CC_KERNEL_MAX_EDGES)
        )
    )
    if checkpoint and m <= cc_kernel_max:
        labeled = _cc_arrow(und, max_iter)
        try:
            labeled = labeled.localCheckpoint(eager=True)
        except Exception as exc:  # noqa: BLE001 — re-raise unless ours
            # The kernel's raise surfaces wrapped (PythonException /
            # Py4JJavaError depending on path); restore the operator's
            # driver-side RuntimeError contract.
            if "did not converge" not in str(exc):
                raise
            raise RuntimeError(
                f"connected_components did not converge in {max_iter} "
                "iterations (component diameter exceeds max_iter); "
                "raise max_iter"
            ) from None
        if stats is not None:
            row = labeled.select("iters").first()
            stats["iterations"] = 0 if row is None else int(row[0])
        return labeled.select("node", "cluster")
    parts = _state_parts(m, conf_parts)
    if checkpoint:
        # Pin the (large) edge side on dst at state width once; the per-
        # iteration join und⋈labels is then co-partitioned and exchange-free
        # and pre-SORTED on dst so the per-iteration SortMergeJoin skips
        # re-sorting the loop-invariant edge side too.  _ckpt_pinned is
        # what makes both properties real at scale: a plain
        # localCheckpoint under AQE stores Unknown/Nil and every iteration
        # re-exchanges AND re-sorts the |E|-row side (round-10 finding).
        und = _ckpt_pinned(
            und.repartition(parts, "dst").transform(_presorted, "dst")
        )

    labels = (
        _sized(und.select(F.col("src").alias("node")), parts, conf_parts, "node")
        .distinct()
        .withColumn("cluster", F.col("node"))
    )
    if checkpoint:
        obs0 = Observation()
        labels = _ckpt_pinned(labels.observe(obs0, F.sum("cluster").alias("s")))
        prev_sum = obs0.get["s"]
    else:
        prev_sum = labels.agg(F.sum("cluster")).collect()[0][0]

    converged = False
    iterations = 0
    # max_iter + 1: detecting convergence costs one extra (no-change)
    # iteration, so the usable propagation budget stays a full max_iter.
    for _ in range(max_iter + 1):
        neighbor_min = (
            _sized(
                und.join(labels, und["dst"] == labels["node"]).select(
                    "src", "cluster"
                ),
                parts,
                conf_parts,
                "src",
            )
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
        # the cost of two cheap state-width joins — the jumps are LAZY
        # plan nodes inside the iteration's single job, not extra jobs.
        for j in range(2):
            # Jump 1's parents side inherits node-partitioning from the
            # labels⋈nmin left join — repartitioning it again would be a
            # redundant exchange; jump 2's input comes out of the previous
            # jump join partitioned on the (consumed) cluster key, so its
            # parents side genuinely needs the node re-pin.
            p_src = new_labels if j == 0 else _sized(
                new_labels, parts, conf_parts, "node"
            )
            parents = p_src.select(
                F.col("node").alias("p_node"), F.col("cluster").alias("p_cluster")
            )
            new_labels = (
                _sized(new_labels, parts, conf_parts, "cluster")
                .join(parents, F.col("cluster") == parents["p_node"], "left")
                .select(
                    "node",
                    F.coalesce(F.col("p_cluster"), F.col("cluster")).alias("cluster"),
                )
            )
        if checkpoint:
            obs = Observation()
            new_labels = new_labels.observe(
                obs, F.sum("cluster").alias("s")
            ).localCheckpoint(eager=True)
            new_sum = obs.get["s"]
        else:
            new_sum = new_labels.agg(F.sum("cluster")).collect()[0][0]
        labels = new_labels
        if new_sum == prev_sum:
            converged = True
            break
        iterations += 1
        prev_sum = new_sum
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
    assume_distinct: bool = False,
    approx_edge_bound: int | None = None,
) -> DataFrame:
    """PageRank with uniform teleport and dangling-mass redistribution.

    Web-scale corpus curation weights documents by the link authority of
    their source (the CommonCrawl-style quality signal); this is the
    distributed power iteration that computes it.  Fixed ``iterations``
    (no convergence test) keeps the result a deterministic function of the
    graph — the property that lets an unrolled-CTE SQL oracle reproduce it
    bit-for-bit up to summation order.

    ``edges``: DataFrame whose first two columns are (src, dst); duplicate
    edges are collapsed (unweighted graph) unless the caller guarantees
    distinctness with ``assume_distinct=True``, which skips a full edge-
    sized dedup exchange (graph_pagerank's pairs are distinct-then-
    symmetrized over a disjoint odd/even node encoding, so its union can
    never introduce duplicates).  Nodes appear iff they occur in an edge.
    Returns (node, rank) with sum(rank) == 1: per iteration,

        rank'(v) = (1-d)/N + d * (sum_{u->v} rank(u)/outdeg(u) + D/N)

    where D is the total rank mass sitting on dangling nodes (outdeg 0),
    redistributed uniformly — the standard strongly-preferential handling,
    which preserves the probability-distribution invariant.  D is computed
    by MASS CONSERVATION, not a second pass over ranks: every node with
    out-edges distributes exactly its rank (Σ_v contrib(v) = Σ_{outdeg>0}
    rank(u)) and Σ rank = 1 is invariant, so D = 1 - Σ_v contrib(v) — and
    since round 5 that sum rides the contribution table's checkpoint job
    as an ``observe`` metric, so D costs NO extra job, aggregation pass,
    or broadcast (fp value is the identical IEEE double either way; drift
    vs the direct sum is ~1e-15/iteration, far under the 1e-7 oracle
    rounding).

    Scale posture: edges are normalized ONCE into (src, dst, 1/outdeg),
    REPARTITIONED BY src, pre-sorted and lineage-truncated with
    _ckpt_pinned — the checkpoint that actually KEEPS the hash
    partitioning and sort order in its LogicalRDD under AQE (a plain
    localCheckpoint stores Unknown/Nil there, and at x256 that cost a
    full |E| re-exchange + re-sort every iteration: 139 GB of sort spill,
    the round-9 verdict's top item).  With the pin, the per-iteration
    join edges⋈ranks re-exchanges and re-sorts NEITHER side (ranks
    arrives node-partitioned and node-sorted out of its own SMJ), leaving
    exactly ONE large exchange per iteration: the contribution SUM moving
    mass from src- to dst-partitioning (information-theoretically
    required), plus a |V|-sized contrib re-exchange in the lazy ranks
    view (the contrib checkpoint deliberately stays un-pinned so the
    heavy aggregation job keeps AQE's advisory-size coalescing).  Job budget
    (checkpoint=True): 2 setup jobs at real scale (normalized-edge and
    node checkpoints, with the edge/node counts riding them as observe
    metrics; +1 cheap state-width re-pin job in the small regime), then
    exactly 1 job per iteration.  The only driver state is three scalars
    (m, n, and D per iteration).
    """
    u, v = edges.columns[:2]
    spark = edges.sparkSession
    conf_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    e = edges.select(F.col(u).alias("src"), F.col(v).alias("dst"))
    kernel_max = int(
        spark.conf.get(
            "spark.graft.pagerank_local_max_edges",
            str(_PAGERANK_KERNEL_MAX_EDGES),
        )
    )
    # Bounded-ahead kernel path (round 11): when the caller can bound the
    # edge count from metadata (an UPPER bound, so the "small" decision is
    # never wrong on a big graph), skip the distributed loop's whole setup
    # — src-repartition, outdeg normalization join, presort, node
    # checkpoint — and run the entire power iteration as ONE job: the
    # derivation's stages feed a keyless single-partition exchange into
    # the Arrow kernel, which computes 1/outdeg itself (the identical
    # IEEE division).  See _PAGERANK_KERNEL_MAX_EDGES for the sizing
    # argument; spark.graft.pagerank_local_max_edges=0 disables.
    if approx_edge_bound is not None and approx_edge_bound <= kernel_max:
        # Duplicate edges (if any) collapse INSIDE the kernel — a NumPy
        # unique on index pairs instead of a distributed distinct
        # exchange the kernel would make redundant.
        return _pagerank_arrow(
            e,
            damping,
            iterations,
            normalized=False,
            single_partition=True,
            dedup=not assume_distinct,
        )
    if not assume_distinct:
        e = e.distinct()
    # Pre-normalized edge weights: contribution of u to v is rank(u) * w
    # with w = 1/outdeg(u).  1/k is the same IEEE double in any engine, so
    # cross-engine drift reduces to SUM order alone.
    #
    # Loop-table layout (round 11): the loop-invariant edge table is
    # GROUPED PER SOURCE — (src, dsts: array<dst>, w = 1/|dsts|) — instead
    # of one row per edge.  The per-iteration SortMergeJoin then merges
    # |V| rows instead of |E| (~outdeg× fewer comparisons), the cached
    # table the loop re-reads every iteration shrinks from |E|·~94 B rows
    # to |E|·8 B of array payload + |V| row overheads (the r10 x256
    # ledger's 19 GB/iteration re-read was the evidenced floor of the
    # row-per-edge form), and setup drops the outdeg self-join (w is
    # 1/size(dsts), the identical IEEE division).  The explode back to
    # (dst, c) rows is a narrow generator feeding the same partial
    # aggregate, so shuffle volume and the contribution SUM are
    # unchanged; per-dst sum ORDER changes with row order, which the
    # oracle's 1e-7 rounding has always absorbed (same tolerance class as
    # DuckDB's own order).  Kill-switch: spark.graft.pagerank_grouped=
    # false restores the row-per-edge loop.
    grouped = (
        spark.conf.get("spark.graft.pagerank_grouped", "true") != "false"
    )
    e2 = e.repartition(F.col("src"))
    if grouped:
        e_loop = (
            e2.groupBy("src")
            .agg(F.collect_list("dst").alias("dsts"))
            .select(
                "src", "dsts", (F.lit(1.0) / F.size("dsts")).alias("w")
            )
        )
        m_expr = F.coalesce(F.sum(F.size("dsts")), F.lit(0)).alias("m")
    else:
        outdeg = e2.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
        e_loop = e2.join(outdeg, "src").select(
            "src", "dst", (F.lit(1.0) / F.col("outdeg")).alias("w")
        )
        m_expr = F.count(F.lit(1)).alias("m")
    if checkpoint:
        obs_m = Observation()
        e_loop = _ckpt_pinned(
            e_loop.observe(obs_m, m_expr).transform(_presorted, "src")
        )
        m = obs_m.get["m"]
    else:
        m = e_loop.agg(m_expr).collect()[0][0]
    # Small-graph fast path (round 11): once the edge count is measured
    # (it rides the checkpoint job either way), a graph under the kernel
    # ceiling runs every iteration inside one Arrow task — no node
    # checkpoint, no per-iteration jobs, identical math (see
    # _pagerank_arrow).  The distributed loop below stays the at-scale
    # path; spark.graft.pagerank_local_max_edges=0 disables the kernel
    # for paired A/Bs.
    if m <= kernel_max:
        rows = (
            e_loop.select("src", F.explode("dsts").alias("dst"), "w")
            if grouped
            else e_loop
        )
        return _pagerank_arrow(rows, damping, iterations, normalized=True)
    # Iteration-state width: see module docstring (_sized) — one partition
    # per ~50k state rows, floor 4, ceiling the session conf (no-op at real
    # scale), applied per shuffle point instead of the r4 session-conf flip.
    parts = _state_parts(m, conf_parts)
    if checkpoint and parts < conf_parts:
        # Small-state regime: re-pin the (small) normalized edges at state
        # width so every loop stage runs at `parts`; at real scale the
        # join output is already hashpartitioning(src, conf-width) from
        # the materialized exchange — nothing to re-pin.
        e_loop = _ckpt_pinned(
            e_loop.repartition(parts, "src").transform(_presorted, "src")
        )

    dst_nodes = (
        e_loop.select(F.explode("dsts").alias("node"))
        if grouped
        else e_loop.select(F.col("dst").alias("node"))
    )
    nodes = (
        _sized(
            e_loop.select(F.col("src").alias("node")).union(dst_nodes),
            parts,
            conf_parts,
            "node",
        )
        .distinct()
    )
    if checkpoint:
        obs_n = Observation()
        nodes = _ckpt_pinned(
            nodes.observe(obs_n, F.count(F.lit(1)).alias("n"))
            .transform(_presorted, "node")
        )
        n = obs_n.get["n"]
    else:
        n = nodes.count()

    # Loop shape: the ONLY materialization per iteration is the
    # contribution table (eager checkpoint = one job), whose observe
    # metric delivers the dangling mass to the driver as a scalar.  The
    # rank vector itself stays a SHALLOW LAZY view over the materialized
    # contribs (nodes ⋈ contrib, both checkpoint-partitioned at state
    # width → co-partitioned, exchange-free; D enters as a literal): it
    # is consumed exactly once (next iteration's contribution join), so
    # nothing in the loop is ever computed twice and plans stay O(1)
    # deep without checkpointing ranks at all.
    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    for _ in range(iterations):
        joined = e_loop.join(ranks, e_loop["src"] == ranks["node"])
        if grouped:
            rows = joined.select(
                F.explode("dsts").alias("dst"),
                (F.col("rank") * F.col("w")).alias("c"),
            )
        else:
            rows = joined.select(
                "dst", (F.col("rank") * F.col("w")).alias("c")
            )
        contrib = (
            _sized(rows, parts, conf_parts, "dst")
            .groupBy("dst")
            .agg(F.sum("c").alias("contrib"))
        )
        if checkpoint:
            obs = Observation()
            contrib = contrib.observe(
                obs, F.coalesce(F.sum("contrib"), F.lit(0.0)).alias("s")
            ).localCheckpoint(eager=True)
            dm = F.lit(1.0 - obs.get["s"])
        else:
            # Lazy path: the dangling mass stays a 1-row DataFrame cross-
            # broadcast onto the update (no materialization to observe).
            dangling = contrib.agg(
                (F.lit(1.0) - F.coalesce(F.sum("contrib"), F.lit(0.0))).alias("dm")
            )
        new_ranks = nodes.join(contrib, nodes["node"] == contrib["dst"], "left")
        if not checkpoint:
            new_ranks = new_ranks.crossJoin(F.broadcast(dangling))
            dm = F.col("dm")
        ranks = new_ranks.select(
            "node",
            (
                F.lit((1.0 - damping) / n)
                + F.lit(damping)
                * (F.coalesce(F.col("contrib"), F.lit(0.0)) + dm / F.lit(float(n)))
            ).alias("rank"),
        )
    return ranks


#: Edge-count ceiling for the single-task triangle kernel.  Wedge volume
#: is Σ outdeg² ≤ m^1.5 under the compact-forward orientation; the kernel
#: streams wedges in O(m) memory per gap step, so the ceiling only bounds
#: TIME (~m^1.5 vectorized ops).  Kill-switch: spark.graft.tri_local_max_edges=0.
_TRI_KERNEL_MAX_EDGES = 200_000


def _tri_arrow(edges: DataFrame) -> DataFrame:
    """Single-task per-node triangle counts over a small (u < v, distinct)
    edge table: the same compact-forward algorithm as the distributed plan
    — orient by (degree, id), enumerate each apex's out-edge pairs once,
    check the closing edge undirected — in vectorized NumPy.  Pure integer
    math, so counts are exactly the distributed result.  Wedges are
    generated per GAP (pairs of positions g apart inside each apex's
    dst-sorted out-edge block), keeping memory O(m) regardless of wedge
    volume."""
    node_t = edges.schema["u"].dataType.simpleString()

    def kernel(batches):
        import numpy as np
        import pyarrow as pa

        us, vs = [], []
        for b in batches:
            us.append(b.column(0).to_numpy(zero_copy_only=False))
            vs.append(b.column(1).to_numpy(zero_copy_only=False))
        if not us:
            return
        u = np.concatenate(us)
        v = np.concatenate(vs)
        m = len(u)
        if m == 0:
            return
        nodes = np.unique(np.concatenate([u, v]))
        n = int(len(nodes))
        ui = np.searchsorted(nodes, u)
        vi = np.searchsorted(nodes, v)
        deg = np.bincount(np.concatenate([ui, vi]), minlength=n)
        # (degree, id) lexicographic key packed into one int64.
        ku = deg[ui].astype(np.int64) * n + ui
        kv = deg[vi].astype(np.int64) * n + vi
        fwd = ku < kv
        src = np.where(fwd, ui, vi)
        dst = np.where(fwd, vi, ui)
        order = np.lexsort((dst, src))
        src, dst = src[order], dst[order]
        c = np.bincount(src, minlength=n)  # outdeg
        starts = np.zeros(n, dtype=np.int64)
        np.cumsum(c[:-1], out=starts[1:])
        within = np.arange(m) - starts[src]
        cbl = c[src]
        eset = np.sort(ui.astype(np.int64) * n + vi)  # id-normalized edges
        tri = np.zeros(n, dtype=np.int64)
        cmax = int(c.max()) if n else 0
        for g in range(1, cmax):
            sel = within + g < cbl
            p = np.nonzero(sel)[0]
            if len(p) == 0:
                break
            ta, tb, tc = src[p], dst[p], dst[p + g]
            packed = tb.astype(np.int64) * n + tc
            pos = np.searchsorted(eset, packed)
            ok = pos < len(eset)
            ok[ok] = eset[pos[ok]] == packed[ok]
            if ok.any():
                tri += np.bincount(ta[ok], minlength=n)
                tri += np.bincount(tb[ok], minlength=n)
                tri += np.bincount(tc[ok], minlength=n)
        nz = tri > 0
        yield pa.RecordBatch.from_arrays(
            [pa.array(nodes[nz]), pa.array(tri[nz])],
            names=["node", "triangles"],
        )

    return edges.coalesce(1).mapInArrow(
        kernel, schema=f"node {node_t}, triangles long"
    )


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
    WWW'11 "Counting Triangles and the Curse of the Last Reducer").

    Join strategy (round 10): both the wedge join and the closing-edge
    semi join build their hash table from an EDGE-sized side while the
    potentially much larger wedge table streams, so they are forced to
    shuffled-hash with hints — under SortMergeJoin the closing-edge probe
    SORTED the whole Σ outdeg² wedge table (the r9 ledger's 29 GB x256
    memory spill).  An SHJ build partition holds |E|/width rows, which
    AQE's advisory sizing keeps bounded at any corpus size; the wedge
    side is never sorted anywhere in the plan.  Kill-switch for paired
    A/Bs: spark.graft.tri_shj=false (SMJ planner default).

    Edge materialization + small-graph kernel (round 11): the edge list
    has THREE consumers below (two degree projections + the orientation
    join), and Spark's ReuseExchange only shares the exchange WRITE — the
    x256 counters showed the pair-count reduce above it executing three
    times (its 1.49 GB exchange read 3×).  An eager observe-counted
    checkpoint runs the (expensive) edge derivation exactly once, and the
    measured count gates the single-task NumPy kernel (_tri_arrow) for
    small graphs — same algorithm, exact integer counts, one task instead
    of ~6 stages.  Kill-switch: spark.graft.tri_local_max_edges=0
    restores the round-10 shape byte-for-byte."""
    spark = edges.sparkSession
    tri_max = int(
        spark.conf.get(
            "spark.graft.tri_local_max_edges", str(_TRI_KERNEL_MAX_EDGES)
        )
    )
    if tri_max > 0:
        obs = Observation()
        edges = edges.observe(
            obs, F.count(F.lit(1)).alias("m")
        ).localCheckpoint(eager=True)
        if obs.get["m"] <= tri_max:
            return _tri_arrow(edges)
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
    # Round 11: the oriented table carries ONLY (src, dst) — r10's kdst
    # struct (the dst endpoint's (degree, id) key) rode along solely so
    # the closing-edge probe could be DIRECTIONAL in orientation order.
    # Ordering the wedge pair by plain dst id still generates each
    # out-edge pair exactly once (any antisymmetric order on distinct
    # ids does), and the closing edge is then checked UNDIRECTED: probe
    # (tb, tc) with tb < tc by id against the id-normalized edge set
    # (least/greatest over the cached o — the original u < v edge list
    # by construction).  Orientation by (degree, id) is still what
    # bounds wedge fan-out; it just no longer needs to be carried.
    # Effect: the wedge exchange and the o cache drop the 16-byte-struct
    # column (~2.5× narrower wedge shuffle rows).
    o = keyed.select(
        F.when(F.col("ku") < F.col("kv"), F.col("u")).otherwise(F.col("v")).alias("src"),
        F.when(F.col("ku") < F.col("kv"), F.col("v")).otherwise(F.col("u")).alias("dst"),
    ).localCheckpoint(eager=False)
    shj = (
        edges.sparkSession.conf.get("spark.graft.tri_shj", "true") != "false"
    )
    e1, e2 = o.alias("e1"), o.alias("e2")
    closing = o.select(
        F.least("src", "dst").alias("cu"), F.greatest("src", "dst").alias("cv")
    )
    if shj:
        e2, closing = e2.hint("shuffle_hash"), closing.hint("shuffle_hash")
    tri = (
        e1.join(
            e2,
            (F.col("e1.src") == F.col("e2.src"))
            & (F.col("e1.dst") < F.col("e2.dst")),
        )
        .select(
            F.col("e1.src").alias("ta"),
            F.col("e1.dst").alias("tb"),
            F.col("e2.dst").alias("tc"),
        )
        .join(
            closing,
            (F.col("cu") == F.col("tb")) & (F.col("cv") == F.col("tc")),
            "left_semi",
        )
    )
    # One generator pass, NOT a 3-way union of projections: union would
    # inline the wedge-join subtree three times — ReusedExchange dedupes
    # the shuffle WRITES but each copy still re-reads and re-joins
    # (measured: 3x the join work, 22-exchange plan vs 5).
    corners = tri.select(
        F.explode(F.array("ta", "tb", "tc")).alias("node")
    )
    return corners.groupBy("node").agg(F.count(F.lit(1)).alias("triangles"))
