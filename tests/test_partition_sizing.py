"""Pin the shuffle-partition sizing rule (session.auto_shuffle_partitions).

The rule must hold across five orders of magnitude: tiny correctness runs
stay at the minimum (scheduling cost dominates), mid-range inputs keep
every core busy (the measured 2-4x mid-scale cliff when 73 MB got 3
reducers on 32 cores), and huge inputs hit the 4x-cores cap that bounds
task-scheduling overhead at cluster scale."""

import os

from datafusion_parallelism_spark.session import auto_shuffle_partitions

MB = 1024 * 1024


def _dir_of_size(tmp_path, n_bytes):
    p = tmp_path / "data.parquet"
    with open(p, "wb") as f:
        f.truncate(n_bytes)
    return str(tmp_path)


def test_tiny_input_stays_at_minimum(tmp_path):
    assert auto_shuffle_partitions(_dir_of_size(tmp_path, 2 * MB), cpus=32) == 4


def test_midrange_input_keeps_cores_busy(tmp_path):
    # 73 MB on 32 cores: bytes rule alone would give 3; occupancy floor
    # (4 MB/core) must lift it to 19.
    assert auto_shuffle_partitions(_dir_of_size(tmp_path, 73 * MB), cpus=32) == 19


def test_full_occupancy_above_128mb(tmp_path):
    assert auto_shuffle_partitions(_dir_of_size(tmp_path, 150 * MB), cpus=32) == 32


def test_bytes_rule_takes_over_at_scale(tmp_path):
    # 3 GB / 32 MB = 96 partitions: above the occupancy floor and cores,
    # below the 4x-cores cap.
    assert auto_shuffle_partitions(_dir_of_size(tmp_path, 3072 * MB), cpus=32) == 96


def test_capped_at_4x_cores(tmp_path):
    assert auto_shuffle_partitions(_dir_of_size(tmp_path, 100 * 1024 * MB), cpus=32) == 128


def test_empty_dir_falls_back_to_cores(tmp_path):
    assert auto_shuffle_partitions(str(tmp_path), cpus=32) == 32


def _parquet_with_row_groups(tmp_path, n_rows, rows_per_group, pad=2000):
    import pyarrow as pa
    import pyarrow.parquet as pq

    # Incompressible payload so the file is big enough for the byte-based
    # split estimate to exceed the row-group count.
    import random

    rng = random.Random(0)
    tbl = pa.table(
        {
            "doc_id": list(range(n_rows)),
            "text": [
                "".join(chr(rng.randrange(33, 127)) for _ in range(pad))
                for _ in range(n_rows)
            ],
        }
    )
    path = str(tmp_path / "docs.parquet")
    pq.write_table(tbl, path, row_group_size=rows_per_group)
    return path


def test_parquet_scan_tasks_capped_by_row_groups(tmp_path):
    """Round-7 x256 cliff: byte-range splits beyond the row-group count are
    EMPTY tasks — the effective-parallelism estimate must not count them,
    else spread_for_compute skips the repartition exactly when a
    big-row-group text corpus needs it (gram explode on 11 of 32 cores)."""
    from datafusion_parallelism_spark.session import (
        est_scan_partitions,
        parquet_scan_tasks,
        path_size,
    )

    path = _parquet_with_row_groups(
        tmp_path, n_rows=3000, rows_per_group=1000, pad=6000
    )
    byte_est = est_scan_partitions(path_size(path), parallelism=32)
    assert byte_est > 3  # ~18 MB incompressible -> bytes rule says > 3 splits
    assert parquet_scan_tasks(path, parallelism=32) == 3  # but 3 row groups


def test_parquet_scan_tasks_bytes_rule_when_groups_plentiful(tmp_path):
    """Many small row groups: the byte estimate is the binding constraint
    (row groups don't LIFT parallelism above the split count)."""
    from datafusion_parallelism_spark.session import parquet_scan_tasks

    path = _parquet_with_row_groups(
        tmp_path, n_rows=3000, rows_per_group=10, pad=100
    )
    # 300 row groups but a sub-4MB file: bytes rule gives 1.
    assert parquet_scan_tasks(path, parallelism=32) == 1


def test_spread_for_compute_repartitions_on_row_group_bound_file(tmp_path, spark):
    """End-to-end x256-cliff shape: byte estimate >= target > row groups.

    The pre-fix code (bytes-only estimate) sees current >= target and SKIPS
    the repartition — exactly the r7 cliff — so this test fails without the
    row-group cap.  The ~18 MB file yields 5 byte-splits on 32-way
    parallelism; target 4 sits strictly between the byte estimate and the
    3 row groups, reproducing the cliff ordering without a >=128 MB fixture
    (ADVICE r7: the earlier target=32 version passed pre-fix too, because
    2 byte-splits were already < 32)."""
    from datafusion_parallelism_spark.session import (
        est_scan_partitions,
        parquet_scan_tasks,
        path_size,
        spread_for_compute,
    )

    path = _parquet_with_row_groups(
        tmp_path, n_rows=3000, rows_per_group=1000, pad=6000
    )
    target = 4
    byte_est = est_scan_partitions(path_size(path), parallelism=32)
    assert byte_est >= target > 3  # the cliff ordering this test exists for
    assert parquet_scan_tasks(path, parallelism=32) == 3
    df = spark.read.parquet(path)
    out = spread_for_compute(df, target=target, input_path=path)
    assert "RoundRobinPartitioning" in out._jdf.queryExecution().executedPlan().toString()


def test_parquet_scan_tasks_sums_row_groups_across_directory(tmp_path):
    """A directory of part files (the register_tables layout, and the
    round-8 multi-file scale replicas) must keep the row-group cap by
    summing footers across members — previously a directory raised inside
    pyarrow and the bytes-only estimate silently returned, re-opening the
    r7 empty-split cliff on partitioned corpora (ADVICE r7)."""
    from datafusion_parallelism_spark.session import (
        est_scan_partitions,
        parquet_scan_tasks,
        path_size,
    )

    table_dir = tmp_path / "docs.parquet"
    table_dir.mkdir()
    for i in range(2):
        _parquet_with_row_groups(
            table_dir, n_rows=3000, rows_per_group=1000, pad=6000
        )
        (table_dir / "docs.parquet").rename(table_dir / f"part-{i}.parquet")
    path = str(table_dir)
    byte_est = est_scan_partitions(path_size(path), parallelism=32)
    assert byte_est > 6  # bytes rule alone over-counts (~36 MB -> 9 splits)
    assert parquet_scan_tasks(path, parallelism=32) == 6  # 3 groups x 2 files


def test_parquet_scan_tasks_empty_directory_falls_back_to_bytes(tmp_path):
    from datafusion_parallelism_spark.session import parquet_scan_tasks

    d = tmp_path / "empty.parquet"
    d.mkdir()
    assert parquet_scan_tasks(str(d), parallelism=32) == 1


def test_aqe_coalesce_respects_advisory_size(spark):
    """Pin the r9 spill-cliff fix AND its r10 correction.  A 64 MB (default)
    advisory lets coalescing merge every exchange into one wave of
    maximum-size sorts, whose per-task state grows linearly with data
    volume — at the x256 replica that crossed the execution-memory pool and
    spilled 5.4 GB where x128 spilled zero (BASELINE.md §Round 9,
    docs/decomp_chain_r9.jsonl).  The 16 MB advisory bounds per-task sort
    state so data growth adds task waves instead.

    parallelismFirst must stay TRUE (Spark's default): the fix first
    shipped with false, which sets coalesce minNumPartitions to 1 so every
    sub-512 MB exchange collapsed below one task per core — small/mid
    queries ran 1.4–2.8× slower at x64 (r10 registry audit).  With true the
    target is max(min(total/parallelism, advisory), 1MB), so the 16 MB sort
    bound is strictly preserved for big exchanges while small ones keep
    full parallelism (BASELINE.md §Round 10,
    docs/full_registry_x64_r10_notes.md)."""
    assert (
        spark.conf.get("spark.sql.adaptive.coalescePartitions.parallelismFirst")
        == "true"
    )
    assert (
        spark.conf.get("spark.sql.adaptive.advisoryPartitionSizeInBytes")
        == "16MB"
    )


def test_fanout_join_probe_side_is_spread(spark, sf_dir):
    """Pin the r10 fan-out-probe fix (BASELINE.md §Round 10 item 5): the
    null-key joins probe a broadcast supplier hash with the full customer
    table on a 25-value key domain, so output is ~2,500x input — but a
    broadcast join adds no exchange, leaving output parallelism equal to
    the probe-side scan's INPUT-byte-sized splits (3 tasks at the x64
    replica; 161 s -> 27 s once spread).  The queries must keep the
    probe-side round-robin spread to session width whenever the scan is
    narrower than the core count.  Pinned via the plan shape (a
    RoundRobinPartitioning exchange at session width below the join) —
    the RUNTIME partition count is AQE's to coalesce at tiny scale, and
    that adaptivity is desired, not a regression."""
    from datafusion_parallelism_spark.queries import REGISTRY

    target = spark.sparkContext.defaultParallelism
    for name in ("join_nullsafe", "join_inner_null_keys"):
        df = REGISTRY[name].fn(spark, sf_dir)
        plan = df._jdf.queryExecution().sparkPlan().toString()
        assert f"RoundRobinPartitioning({target})" in plan, (name, plan)


def test_pair_exchange_width_is_data_ahead_4x(spark, sf_dir):
    """Pin the Σdf² pair-width contract (VERDICT r10 item 7, settled as a
    HARD BOUND rather than a derived estimate): the candidate-pair
    exchange starts 4× the session width — one decade of pair-volume
    headroom over the input-sized session conf, measured spill-free
    through x256 — because AQE can coalesce an oversized exchange but can
    never split an undersized one.  A derived Σdf² width was considered
    and rejected twice (r10, r11): the estimate needs an eager
    materialization of the lazy shingle explode inside every query path.
    If a deployment outgrows the decade, raise
    spark.graft.pair_width_factor — this test documents that contract."""
    from pyspark.sql import functions as F

    from datafusion_parallelism_spark.queries.llm import (
        _pair_parallelism,
        _stream_pairs,
    )

    pairs = spark.range(100).select(
        F.col("id").alias("doc_a"), (F.col("id") + 1).alias("doc_b")
    )
    width = 4 * _pair_parallelism(spark)
    plan = _stream_pairs(pairs)._jdf.queryExecution().sparkPlan().toString()
    assert f"hashpartitioning(doc_a#" in plan and f", {width})" in plan, plan
