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
