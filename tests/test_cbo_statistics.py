"""Statistics-driven planning — the Spark analog of the reference's
injectable table statistics (StaticTable::new_with_fixed_statistics,
src/utils/static_table.rs:39-222; stats-forced plan shape src/lib.rs:526-547).

Spark's form: ANALYZE TABLE computes exact row/size/column stats into the
catalog; CBO + join selection read them.  The test pins that the stats
actually reach the optimizer (rowCount visible on the analyzed relation)."""

from datafusion_parallelism_spark.session import load


def test_analyze_table_feeds_optimizer_statistics(spark, sf_dir):
    load(spark, sf_dir, "nation").write.mode("overwrite").saveAsTable("stats_nation")
    try:
        spark.sql("ANALYZE TABLE stats_nation COMPUTE STATISTICS FOR ALL COLUMNS")
        desc = {
            r.col_name: r.data_type
            for r in spark.sql("DESCRIBE TABLE EXTENDED stats_nation").collect()
        }
        assert "25 rows" in desc.get("Statistics", ""), desc.get("Statistics")

        prev = spark.conf.get("spark.sql.cbo.enabled")
        spark.conf.set("spark.sql.cbo.enabled", "true")
        try:
            df = spark.table("stats_nation")
            stats = (
                df._jdf.queryExecution().optimizedPlan().stats().simpleString()
            )
            assert "rowCount=25" in stats, stats
        finally:
            spark.conf.set("spark.sql.cbo.enabled", prev)
    finally:
        spark.sql("DROP TABLE IF EXISTS stats_nation")
