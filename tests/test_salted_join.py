"""salted_join must be result-identical to the plain join and actually
spread a hot key across partitions."""

from pyspark.sql import functions as F

from datafusion_parallelism_spark.operators.skew import salted_join


def _skewed_frames(spark):
    big = spark.range(0, 5000).select(
        F.when(F.col("id") % 10 != 0, F.lit(7)).otherwise(F.col("id") % 50).alias("k"),
        F.col("id").alias("bv"),
    )
    small = spark.range(0, 50).select(F.col("id").alias("sk"), (F.col("id") * 2).alias("sv"))
    return big, small


def test_salted_join_matches_plain_join(spark):
    big, small = _skewed_frames(spark)
    plain = big.join(small, big["k"] == small["sk"]).select("k", "bv", "sk", "sv")
    salted = salted_join(big, small, [("k", "sk")], n_salts=8)
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))


def test_salted_join_spreads_hot_key(spark):
    """The hot key's rows must land in >1 shuffle partition of the join."""
    big, small = _skewed_frames(spark)
    out = salted_join(big, small, [("k", "sk")], n_salts=8).filter(F.col("k") == 7)
    parts = (
        out.withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .count()
        .count()
    )
    assert parts > 1, f"hot key stayed in {parts} partition(s)"


def test_left_join_preserves_unmatched(spark):
    big, small = _skewed_frames(spark)
    unmatched_keys = big.filter(F.col("k") >= 50)  # none — all keys < 50 match
    assert unmatched_keys.count() == 0
    left = salted_join(big, small.filter(F.col("sk") < 5), [("k", "sk")], how="left")
    # keys >= 5 now unmatched; every big row must still appear exactly once
    assert left.count() == big.count()
