"""Plan-shape assertions — the Spark analog of the reference's physical-plan
downcast checks (src/lib.rs:728-753 and the asserts it powers).

Each test pins an optimizer behavior the engine depends on at 100 TB:
decorrelation, outer-join elimination, join-strategy selection, predicate
pushdown, column pruning, whole-stage codegen.
"""

import pytest
from pyspark.sql import functions as F

from datafusion_parallelism_spark.operators.joins import equi_join
from datafusion_parallelism_spark.plans import (
    explain_str,
    forced_join_strategy,
    join_kinds,
    physical_plan_str,
    pushed_filters,
    read_schemas,
)
from datafusion_parallelism_spark.queries import REGISTRY
from datafusion_parallelism_spark.session import load, register_tables


def test_exists_decorrelates_to_left_semi(spark, sf_dir):
    """EXISTS → LeftSemi (reference assert: src/lib.rs:357-358)."""
    kinds = join_kinds(REGISTRY["tpch_q4"].fn(spark, sf_dir))
    assert any(t == "LeftSemi" for _, t in kinds), kinds


def test_not_exists_decorrelates_to_left_anti(spark, sf_dir):
    """NOT EXISTS → LeftAnti (reference assert: src/lib.rs:422-423)."""
    register_tables(spark, sf_dir)
    df = spark.sql(
        "SELECT c_custkey FROM customer WHERE NOT EXISTS "
        "(SELECT 1 FROM orders WHERE o_custkey = c_custkey)"
    )
    kinds = join_kinds(df)
    assert any(t == "LeftAnti" for _, t in kinds), kinds


def test_full_outer_isnotnull_eliminates_outer(spark, sf_dir):
    """FULL OUTER + WHERE side IS NOT NULL loses FullOuter (reference
    assert: planned as a Right join, src/lib.rs:475-487)."""
    kinds = join_kinds(REGISTRY["join_full_isnotnull"].fn(spark, sf_dir))
    assert kinds and all(t != "FullOuter" for _, t in kinds), kinds


def test_small_dimension_join_broadcasts(spark, sf_dir):
    """nation (25 rows) must broadcast, not shuffle the fact side."""
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    df = equi_join(c, n, [("c_nationkey", "n_nationkey")])
    with forced_join_strategy(spark, "broadcast"):
        kinds = join_kinds(df)
    assert ("BroadcastHashJoin", "Inner") in kinds, kinds


def test_forced_shuffled_hash_join(spark, sf_dir):
    """The shuffle_hash hint forces ShuffledHashJoin — the reference's
    PartitionMode::Partitioned subject (use_parallel_hash_join_rule.rs:80-86),
    with the hint playing the role of replacement_required."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    kinds = join_kinds(equi_join(o, c.hint("shuffle_hash"), [("o_custkey", "c_custkey")]))
    assert ("ShuffledHashJoin", "Inner") in kinds, kinds


def test_forced_sort_merge_join(spark, sf_dir):
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    with forced_join_strategy(spark, "sort_merge"):
        kinds = join_kinds(equi_join(o, c, [("o_custkey", "c_custkey")]))
    assert ("SortMergeJoin", "Inner") in kinds, kinds


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    df = load(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 40).select(
        "l_orderkey"
    )
    pf = pushed_filters(df)
    assert any("GreaterThan(l_quantity" in f for f in pf), pf


def test_column_pruning_reaches_scan(spark, sf_dir):
    df = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    schemas = read_schemas(df)
    assert schemas, "no ReadSchema in explain"
    assert schemas[0] == "struct<l_orderkey:bigint,l_quantity:double>", schemas


def test_partition_pruning_like_filter_on_timestamp(spark, sf_dir):
    """Timestamp filters must be pushed (min/max row-group pruning at
    scale)."""
    df = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") < F.lit("1996-01-01").cast("timestamp")
    )
    pf = pushed_filters(df)
    assert any("LessThan(l_shipdate" in f for f in pf), pf


def test_q1_runs_in_whole_stage_codegen(spark, sf_dir):
    """The scan→filter→partial-agg pipeline of q1 must run inside
    WholeStageCodegen spans (the Tungsten fast path).  AQE only reveals
    codegen in the FINAL plan, so execute first, then inspect."""
    df = REGISTRY["tpch_q1"].fn(spark, sf_dir)
    df.collect()
    plan = physical_plan_str(df)
    assert "HashAggregate" in plan
    import re

    # `*(n)` node prefixes mark whole-stage-codegen spans in plan strings.
    assert re.search(r"\*\(\d+\)", plan), plan


def test_aggregation_is_partial_then_final(spark, sf_dir):
    """groupBy must plan partial (map-side) + final HashAggregate around
    one exchange — the shape that keeps the q1 shuffle at 6 rows/task."""
    plan = physical_plan_str(REGISTRY["tpch_q1"].fn(spark, sf_dir))
    assert plan.count("HashAggregate") >= 2, plan
    assert "Exchange hashpartitioning" in plan, plan


def test_broadcast_join_has_no_shuffle_of_fact_side(spark, sf_dir):
    """Broadcast join must not exchange the big side at all."""
    l = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    df = l.join(F.broadcast(p), l.l_partkey == p.p_partkey).select("l_orderkey", "p_brand")
    plan = physical_plan_str(df)
    assert "BroadcastHashJoin" in plan
    assert "Exchange hashpartitioning" not in plan, plan


def test_three_part_catalog_naming(spark, sf_dir):
    """3-part table naming (reference: my_catalog.my_schema.table via
    MemoryCatalogProvider, src/lib.rs:822-828) — Spark's
    spark_catalog.<db>.<table> equivalent."""
    spark.sql("CREATE DATABASE IF NOT EXISTS eng_schema")
    load(spark, sf_dir, "nation").write.mode("overwrite").saveAsTable(
        "eng_schema.nation_tbl"
    )
    try:
        n = spark.sql(
            "SELECT COUNT(*) AS n FROM spark_catalog.eng_schema.nation_tbl"
        ).collect()[0].n
        assert n == 25
        assert spark.catalog.tableExists("eng_schema.nation_tbl")
    finally:
        spark.sql("DROP TABLE IF EXISTS eng_schema.nation_tbl")
        spark.sql("DROP DATABASE IF EXISTS eng_schema")


def test_topk_per_group_uses_window_group_limit(spark, sf_dir):
    """rank<=k filters push a per-partition group limit into the window
    sort (WindowGroupLimit) — each task keeps k rows per key instead of
    sorting whole groups."""
    plan = physical_plan_str(REGISTRY["window_topk_per_group"].fn(spark, sf_dir))
    assert "WindowGroupLimit" in plan, plan


def test_global_topk_uses_take_ordered(spark, sf_dir):
    """ORDER BY + LIMIT plans as TakeOrderedAndProject (per-partition
    partial top-k + merge), never a global sort."""
    plan = physical_plan_str(REGISTRY["text_vocab_topk"].fn(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan, plan
    assert "Sort [n" not in plan, plan


def test_cross_join_is_broadcast_nested_loop(spark, sf_dir):
    """Explicit cross join of two broadcast-small dims must plan as
    BroadcastNestedLoopJoin — no shuffle exchange at all."""
    plan = physical_plan_str(REGISTRY["join_cross"].fn(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" in plan, plan
    assert "Exchange hashpartitioning" not in plan, plan


def test_nullsafe_join_is_hash_join_not_cartesian(spark, sf_dir):
    """<=> is a valid hash-join key (the NULL bucket hashes like a value):
    the plan must use a hash-based equi join, not fall back to
    nested-loop/cartesian."""
    plan = physical_plan_str(REGISTRY["join_nullsafe"].fn(spark, sf_dir))
    assert "CartesianProduct" not in plan, plan
    assert "HashJoin" in plan, plan


def test_block_cosine_has_no_cartesian(spark, sf_dir):
    """The block-matrix all-pairs cosine fans out via broadcast block-pair
    joins + one FlatMapGroupsInPandas tile product — never a row-level
    cartesian join."""
    plan = physical_plan_str(REGISTRY["dedup_embedding_cosine"].fn(spark, sf_dir))
    assert "FlatMapGroupsInPandas" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_ann_bruteforce_is_blocked_pandas_topk(spark, sf_dir):
    """Brute-force ANN scores query×block tiles in one vectorized
    FlatMapGroupsInPandas — never a row-level cartesian/HOF pair scan."""
    plan = physical_plan_str(REGISTRY["ann_bruteforce_topk"].fn(spark, sf_dir))
    assert "FlatMapGroupsInPandas" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_ann_filtered_broadcasts_query_side(spark, sf_dir):
    """Filtered vector search joins corpus→queries on the label: the tiny
    query side broadcasts; the corpus never shuffles."""
    plan = physical_plan_str(REGISTRY["ann_filtered_topk"].fn(spark, sf_dir))
    assert "BroadcastHashJoin" in plan, plan


def test_anomaly_zscore_broadcasts_stats(spark, sf_dir):
    """The per-type mean/stddev aggregate (handful of rows) is broadcast
    back against events — the fact table must not hash-shuffle for the
    join itself."""
    plan = physical_plan_str(REGISTRY["events_anomaly_zscore"].fn(spark, sf_dir))
    assert "BroadcastHashJoin" in plan, plan


def test_decontaminate_broadcasts_benchmark_set(spark, sf_dir):
    """The benchmark shingle set must broadcast (eval suites are tiny vs
    a training corpus); the training side then never shuffles for the
    membership test."""
    plan = physical_plan_str(REGISTRY["corpus_decontaminate"].fn(spark, sf_dir))
    assert "BroadcastHashJoin" in plan, plan


def test_runtime_bloom_filter_injected_for_selective_shuffle_join(spark, sf_dir):
    """Runtime row-level filtering: when a selective dimension side feeds a
    shuffle join, the optimizer can inject a bloom filter built from the
    dimension keys into the fact scan — at 100 TB this prunes the shuffled
    fact rows BEFORE the exchange (the runtime complement of static
    predicate pushdown).  Thresholds are forced down here because the
    injection is size-gated for real workloads."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").filter(F.col("p_partkey") % 100 == 0)
    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        df = li.join(p, li.l_partkey == p.p_partkey).groupBy("l_returnflag").count()
        plan = df._jdf.queryExecution().optimizedPlan().toString()
        assert "bloom_filter" in plan or "BloomFilter" in plan, plan[:2000]
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_exists_in_disjunction_plans_existence_join(spark, sf_dir):
    """EXISTS under OR cannot filter via semi join — Catalyst must attach
    a boolean mark (ExistenceJoin), the capability the reference's
    operator rejects (probe_lookup_implementation.rs:32-75)."""
    df = REGISTRY["join_existence_mark"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "ExistenceJoin" in plan, plan[:1500]


def test_pq_codebook_broadcasts_and_scan_prunes(spark, sf_dir):
    """vec_pq_codes: the codebook must reach the corpus without ever
    exchanging the vector side before the per-vector aggregation — since
    round 11 via the task-closure Arrow kernel (MapInArrow, codebook in
    the closure, no join at all); under spark.graft.pq_arrow=false via
    broadcast.  The embeddings scan must read only the two used columns
    (asserted on the pre-checkpoint subvector plan, where the file scan
    is still visible)."""
    plan = physical_plan_str(REGISTRY["vec_pq_codes"].fn(spark, sf_dir))
    assert "MapInArrow" in plan, plan
    assert "SortMergeJoin" not in plan, plan
    with _with_conf(spark, {"spark.graft.pq_arrow": "false"}):
        plan = physical_plan_str(REGISTRY["vec_pq_codes"].fn(spark, sf_dir))
        assert "BroadcastExchange" in plan
    from datafusion_parallelism_spark.queries.llm import _pq_subv
    from datafusion_parallelism_spark.session import load

    subv = _pq_subv(load(spark, sf_dir, "embeddings"), spark, checkpoint=False)
    schemas = read_schemas(subv)
    assert any("vec_id" in s and "embedding" in s for s in schemas), schemas


def test_pq_adc_topk_uses_window_group_limit(spark, sf_dir):
    """ann_pq_topk's exact top-k must plan with the partial
    WindowGroupLimit (map-side k-row bound before the final window's
    exchange) and join the LUT by broadcast — no corpus-side shuffle for
    the lookup."""
    plan = physical_plan_str(REGISTRY["ann_pq_topk"].fn(spark, sf_dir))
    assert "WindowGroupLimit" in plan
    assert "BroadcastHashJoin" in plan


def test_pii_redact_is_single_aggregation_no_python(spark, sf_dir):
    """corpus_pii_redact: pure JVM regex kernels + ONE hash-partitioned
    exchange (the per-source aggregate) — no Python evaluation anywhere
    in the plan."""
    plan = physical_plan_str(REGISTRY["corpus_pii_redact"].fn(spark, sf_dir))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_corpus_profile_single_expand_single_exchange(spark, sf_dir):
    """The per-column profiler must stay ONE aggregation pass: the
    multi-column COUNT(DISTINCT) set plans as a single Expand feeding one
    shuffle — per-column scans or extra exchanges would turn a metadata
    query into column-count full passes at 100 TB."""
    plan = physical_plan_str(REGISTRY["corpus_profile"].fn(spark, sf_dir))
    assert plan.count("Expand") >= 1, plan
    assert plan.count("Scan parquet") == 1, plan
    assert plan.count("Exchange") <= 2, plan


def test_agg_count_distinct_split_no_expand(spark, sf_dir):
    """agg_count_distinct must plan as per-column distinct→count branches
    joined by broadcast, NOT the Expand-based multi-distinct: Expand
    triples the fact scan and merges both key domains into one partial
    aggregate whose per-task hash table spills at GB factors (x256 A/B:
    21.5–30.6 s Expand vs 14.8 s split; BASELINE.md §Round 5).  Contrast
    corpus_profile, where one Expand pass over MANY low-churn columns is
    the right trade — see its test above."""
    plan = physical_plan_str(REGISTRY["agg_count_distinct"].fn(spark, sf_dir))
    assert "Expand" not in plan, plan
    assert plan.count("BroadcastHashJoin") == 2, plan
    assert plan.count("Scan parquet") == 3, plan
    # Each distinct branch dedups map-side BEFORE its exchange (partial
    # aggregation keeps the shuffle at one row per distinct key).
    assert plan.count("HashAggregate") >= 8, plan


def test_pagerank_iteration_plan_is_truncated(spark):
    """localCheckpoint must keep each iteration's plan O(1) deep: the
    final rank DataFrame's physical plan may reference checkpointed RDDs
    but not re-derive the full 10-iteration join chain."""
    from datafusion_parallelism_spark.operators.graph import pagerank

    edges = spark.createDataFrame(
        [(i, (i + 1) % 6) for i in range(6)], schema="u long, v long"
    )
    # Kill the r11 small-graph Arrow kernel so this keeps pinning the
    # DISTRIBUTED loop's plan shape (the kernel path has no joins at all).
    with _with_conf(spark, {"spark.graft.pagerank_local_max_edges": "0"}):
        plan = physical_plan_str(pagerank(edges, iterations=4))
    assert "Scan ExistingRDD" in plan, plan
    # One iteration = one edges-ranks join; a non-truncated plan would
    # contain 4+ joins.
    assert plan.count("Join") <= 2, plan


def test_triangle_corners_single_generator_pass(spark, sf_dir):
    """The per-corner count must come from ONE explode over the triangle
    list, not a 3-way union of projections — union would inline the
    wedge-join subtree three times (ReusedExchange dedupes the shuffle
    writes but each copy re-reads and re-joins; measured 22-exchange plan
    vs 10).  Pin: exactly one LeftSemi (the closing-edge check), exactly
    one Generate (the corner explode), no BroadcastNestedLoop/cartesian."""
    with _with_conf(spark, {"spark.graft.tri_local_max_edges": "0"}):
        plan = physical_plan_str(
            REGISTRY["graph_triangle_counts"].fn(spark, sf_dir)
        )
    assert plan.count("LeftSemi") == 1, plan
    assert plan.count("Generate") == 1, plan
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan
    assert plan.count("Exchange") <= 12, plan
    # Default (r11): a small measured edge count routes the whole count
    # into the single-task NumPy kernel — no joins at all.
    plan = physical_plan_str(REGISTRY["graph_triangle_counts"].fn(spark, sf_dir))
    assert "MapInArrow" in plan, plan
    assert "Join" not in plan, plan


def test_triangle_wedge_table_never_sorted(spark):
    """Round-10 contract: the Σ outdeg² wedge table streams through a
    ShuffledHashJoin for the closing-edge semi probe (build = edge-sized
    side) and the wedge join itself is also SHJ — under the SMJ planner
    default the semi join SORTED the whole wedge table (29 GB of x256
    memory spill, r9 ledger item #3).  Pins: both joins shuffled-hash, no
    Sort anywhere in the plan; kill-switch spark.graft.tri_shj=false
    restores the planner default (SMJ at non-broadcast sizes)."""
    from datafusion_parallelism_spark.operators.graph import triangle_counts

    edges = spark.createDataFrame(
        [(i, j) for i in range(12) for j in range(i + 1, 12) if (i + j) % 3],
        schema="u long, v long",
    )
    with _with_conf(
        spark,
        {
            "spark.sql.autoBroadcastJoinThreshold": "-1",
            "spark.sql.adaptive.enabled": "true",
            "spark.graft.tri_local_max_edges": "0",
        },
    ):
        plan = physical_plan_str(triangle_counts(edges)).split(
            "== Initial Plan =="
        )[0]
        assert plan.count("ShuffledHashJoin") == 2, plan
        assert "SortMergeJoin" not in plan, plan
        assert "Sort " not in plan, plan
        with _with_conf(spark, {"spark.graft.tri_shj": "false"}):
            plan = physical_plan_str(triangle_counts(edges)).split(
                "== Initial Plan =="
            )[0]
            assert "SortMergeJoin" in plan, plan


def test_pagerank_final_plan_is_copartitioned_no_exchange(spark):
    """The returned ranks view (nodes ⋈ final contribs, both checkpoint-
    partitioned at state width) must plan exchange-free: losing the
    src/node partitioning reuse would show up here as a new Exchange."""
    from datafusion_parallelism_spark.operators.graph import pagerank

    edges = spark.createDataFrame(
        [(i, (i + 1) % 8) for i in range(8)] + [(0, 4), (2, 6)],
        schema="u long, v long",
    )
    # Benchmark-session posture below the AQE byte gate (session.py): with
    # AQE on, the checkpoint materializes under AdaptiveSparkPlan and its
    # LogicalRDD reports UnknownPartitioning, so the final join re-plans
    # exchanges it doesn't need — the co-partitioning contract this test
    # pins is the AQE-off small-input regime (and at real scale AQE's
    # runtime reuse makes its own call).
    prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        with _with_conf(spark, {"spark.graft.pagerank_local_max_edges": "0"}):
            plan = physical_plan_str(pagerank(edges, iterations=3))
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev)
    assert "Exchange" not in plan, plan


def test_winnow_fingerprints_selection_is_shuffle_free(spark):
    """Round-10 contract: winnowing fingerprint SELECTION (gram hashing +
    sliding window minima) runs as higher-order functions inside the
    narrow scan stage — no WindowExec, no Sort, and the plan's ONLY
    exchange is the final fingerprint distinct.  The r5 formulation
    exchanged + sorted the whole O(total_chars) gram table (91 GB of
    x256 sort spill, ledger item #2); a regression to any window/sort
    based selection re-introduces that linear-in-corpus sort."""
    from datafusion_parallelism_spark.queries.llm import winnow_fingerprints

    d = spark.createDataFrame(
        [(1, "x" * 200), (2, "y" * 500)], "doc_id long, text string"
    )
    plan = physical_plan_str(winnow_fingerprints(d))
    assert "Window" not in plan, plan
    assert "Sort" not in plan, plan
    assert plan.count("Exchange") == 1, plan


def test_winnow_capped_fingerprints_df_window_rides_join_partitioning(spark):
    """The stop-fingerprint cap (round 6) must cost ZERO exchanges beyond
    what the uncapped pipeline already shuffles: the df-count window runs
    over the same hashpartitioning(h) the pair self-join consumes.  The
    executed query plan truncates at the localCheckpoint, so this pins the
    pre-checkpoint subtree directly — exactly two exchanges total since
    the round-10 shuffle-free fingerprint selection: (doc_id, h) for the
    fingerprint distinct, and h for the repartition the df window and
    join both ride."""
    from datafusion_parallelism_spark.queries.llm import (
        winnow_capped_fingerprints,
        winnow_fingerprints,
    )

    d = spark.createDataFrame(
        [(1, "x" * 200), (2, "y" * 500), (3, "x" * 150)], "doc_id long, text string"
    )
    plan = physical_plan_str(winnow_capped_fingerprints(winnow_fingerprints(d), 32))
    assert plan.count("Exchange") == 2, plan
    # The df window itself partitions on h and sits above the h-repartition.
    assert "windowspecdefinition(h#" in plan or "windowspecdefinition(h " in plan, plan


def test_kmeans_final_plan_broadcast_assign_two_exchanges(spark, sf_dir):
    """vec_kmeans_clusters' final assignment must never shuffle the
    corpus side: since round 11 the centroids ride the Arrow kernel's
    task closure (MapInArrow over the checkpointed dims — zero joins,
    zero exchanges); under spark.graft.km_arrow=false they broadcast
    onto the vector table, with only the count aggregation's exchanges."""
    plan = physical_plan_str(REGISTRY["vec_kmeans_clusters"].fn(spark, sf_dir))
    assert "MapInArrow" in plan, plan
    assert "Exchange" not in plan, plan
    assert "Join" not in plan, plan
    with _with_conf(spark, {"spark.graft.km_arrow": "false"}):
        plan = physical_plan_str(
            REGISTRY["vec_kmeans_clusters"].fn(spark, sf_dir)
        )
        assert (
            "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
        ), plan
        assert plan.count("Exchange") <= 3, plan
        assert "SortMergeJoin" not in plan, plan


def _with_conf(spark, pairs):
    """Context manager: set confs, restore on exit."""
    from contextlib import contextmanager

    @contextmanager
    def cm():
        saved = {k: spark.conf.get(k, None) for k in pairs}
        try:
            for k, v in pairs.items():
                spark.conf.set(k, v)
            yield
        finally:
            for k, v in saved.items():
                if v is None:
                    spark.conf.unset(k)
                else:
                    spark.conf.set(k, v)

    return cm()


def test_checkpoint_pinned_preserves_metadata_under_aqe(spark):
    """The round-10 load-bearing fact: an eager localCheckpoint planned
    under AQE stores UnknownPartitioning/Nil ordering in its LogicalRDD,
    so consumers re-exchange AND re-sort the checkpointed table every
    time it is joined — checkpoint_pinned (scoped AQE-off around the
    checkpoint job) keeps both, and an AQE-ON consumer honors them.
    Pins: pinned side contributes NO Exchange and NO Sort to a forced
    SMJ; the spark.graft.pin=false kill-switch restores both."""
    import re

    from datafusion_parallelism_spark.plans import checkpoint_pinned

    df = spark.range(20000).select(
        (F.col("id") % 500).alias("k"), F.col("id").alias("x")
    )
    other = spark.range(10000).select(
        (F.col("id") % 500).alias("k"), F.col("id").alias("y")
    )

    def smj_counts(ck):
        j = ck.join(other.repartition(8, "k"), ck["k"] == other["k"])
        txt = physical_plan_str(j).split("== Initial Plan ==")[0]
        return (
            len(re.findall(r"Exchange hashpartitioning\(k#", txt)),
            len(re.findall(r"Sort \[k#", txt)),
        )

    with _with_conf(
        spark,
        {
            "spark.sql.adaptive.enabled": "true",
            "spark.sql.autoBroadcastJoinThreshold": "-1",
            "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        },
    ):
        base = df.repartition(8, "k").sortWithinPartitions("k")
        exch, sorts = smj_counts(checkpoint_pinned(base))
        # exactly the OTHER side's exchange+sort; pinned side contributes none
        assert (exch, sorts) == (1, 1), (exch, sorts)
        # AQE must be restored after the pin (scoped flip)
        assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
        with _with_conf(spark, {"spark.graft.pin": "false"}):
            base2 = df.repartition(8, "k").sortWithinPartitions("k")
            exch, sorts = smj_counts(checkpoint_pinned(base2))
        assert (exch, sorts) == (2, 2), (exch, sorts)


def test_pq_training_iteration_streams_without_sort_or_exchange(spark, sf_dir):
    """VERDICT r9 item 3, upgraded by the round-10 finding: the PQ
    training iteration must aggregate the checkpointed subvector table
    with NO Sort and NO Exchange — under AQE-ON (the at-scale posture),
    not just the AQE-off session where r9 originally verified it.  The
    subvector checkpoint is pinned (vec_id partitioning + (vec_id, j)
    ordering), so the per-iteration SortAggregate streams.  Kill-switch
    check: spark.graft.pin=false restores the Sort."""
    import re

    from datafusion_parallelism_spark.queries.llm import _pq_subv

    def train_iter_plan(subv):
        anch_rows = subv.limit(4).select(
            "j",
            F.col("vec_id").alias("aid"),
            F.col("e1").alias("a1"),
            F.col("e2").alias("a2"),
        ).collect()
        anch = spark.createDataFrame(
            anch_rows, schema="j int, aid long, a1 double, a2 double"
        )
        d2 = (F.col("e1") - F.col("a1")) * (F.col("e1") - F.col("a1")) + (
            F.col("e2") - F.col("a2")
        ) * (F.col("e2") - F.col("a2"))
        assign = (
            subv.join(F.broadcast(anch), "j")
            .select("vec_id", "j", "aid", d2.alias("d2"), "e1", "e2")
            .groupBy("vec_id", "j")
            .agg(F.min(F.struct("d2", "aid", "e1", "e2")).alias("s"))
        )
        return physical_plan_str(assign).split("== Initial Plan ==")[0]

    with _with_conf(spark, {"spark.sql.adaptive.enabled": "true"}):
        vecs = load(spark, sf_dir, "embeddings")
        txt = train_iter_plan(_pq_subv(vecs, spark))
        assert not re.search(r"Sort \[vec_id#", txt), txt
        assert not re.search(r"Exchange hashpartitioning\(vec_id#", txt), txt
        with _with_conf(spark, {"spark.graft.pin": "false"}):
            txt = train_iter_plan(_pq_subv(vecs, spark))
            assert re.search(r"Sort \[vec_id#", txt) or re.search(
                r"Exchange hashpartitioning\(vec_id#", txt
            ), txt


def test_pagerank_pinned_nodes_side_no_exchange_under_aqe(spark):
    """The pagerank loop's exchange-free contract now holds under AQE-ON
    (round 10; previously only pinned AQE-off): the returned ranks view
    joins pinned nodes with the (deliberately un-pinned) contrib
    checkpoint — the nodes/ExistingRDD side must plan with no Exchange
    and no Sort; contrib's small dst-side re-exchange is the only one."""
    import re

    from datafusion_parallelism_spark.operators.graph import pagerank

    edges = spark.createDataFrame(
        [(i, (i + 1) % 8) for i in range(8)] + [(0, 4), (2, 6)],
        schema="u long, v long",
    )
    with _with_conf(
        spark,
        {
            "spark.sql.adaptive.enabled": "true",
            "spark.graft.pagerank_local_max_edges": "0",
        },
    ):
        plan = physical_plan_str(pagerank(edges, iterations=3)).split(
            "== Initial Plan =="
        )[0]
    assert not re.search(r"Exchange hashpartitioning\(node#", plan), plan
    assert not re.search(r"Sort \[node#", plan), plan
    # contrib side: at most one exchange (+sort) on dst
    assert len(re.findall(r"Exchange hashpartitioning\(dst#", plan)) <= 1, plan
