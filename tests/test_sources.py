"""Catalog discovery, profiling, JDBC reader construction, watermark scan."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from spaceparts_data_pipeline_spark.sources import catalog, jdbc, parquet


class TestCatalog:
    def test_discovery_denylist_and_order(self, spark):
        spark.sql("CREATE DATABASE IF NOT EXISTS cat_db")
        spark.catalog.setCurrentDatabase("cat_db")
        try:
            for t in ["bronze_b", "bronze_a", "bronze_x_execution_log",
                      "bronze_y_incremental_control", "silver_a"]:
                spark.range(1).write.mode("overwrite").saveAsTable(t)
            assert catalog.discover_tables(spark, "bronze_*") == ["bronze_a", "bronze_b"]
            assert catalog.discover_tables(spark, "silver_*") == ["silver_a"]
        finally:
            spark.catalog.setCurrentDatabase("default")
            spark.sql("DROP DATABASE cat_db CASCADE")

    def test_profile_stats(self, spark, sf_small):
        c = spark.read.parquet(f"{sf_small}/customer.parquet")
        prof = {r["column_name"]: r for r in catalog.profile(c, ["c_mktsegment", "c_custkey"]).collect()}
        assert prof["c_mktsegment"]["rows"] == 150
        assert prof["c_mktsegment"]["approx_distinct"] == 5
        assert prof["c_custkey"]["min_value"] == "0"

    def test_column_metadata(self, spark):
        spark.range(3).selectExpr("id", "cast(id as string) s").createOrReplaceTempView("meta_v")
        cols = catalog.column_metadata(spark, "meta_v")
        assert [c["name"] for c in cols] == ["id", "s"]
        assert cols[1]["type"] == "string"


class TestJdbc:
    def test_reader_options(self, spark):
        r = jdbc.jdbc_reader(spark, "jdbc:sqlserver://h:1433;db=x", table="dim.products",
                             partition_column="id", lower_bound=0, upper_bound=1000, num_partitions=8)
        # options are buried in the reader; building without error is the contract here
        assert r is not None

    def test_query_xor_table(self, spark):
        with pytest.raises(ValueError):
            jdbc.jdbc_reader(spark, "jdbc:x", query="SELECT 1", table="t")
        with pytest.raises(ValueError):
            jdbc.jdbc_reader(spark, "jdbc:x")

    def test_partitioned_requires_table(self, spark):
        with pytest.raises(ValueError):
            jdbc.jdbc_reader(spark, "jdbc:x", query="SELECT 1", partition_column="id",
                             lower_bound=0, upper_bound=10)

    def test_discovery_query_shape(self):
        q = jdbc.discovery_query()
        assert "INFORMATION_SCHEMA.TABLES" in q and "'dim', 'fact'" in q and "ORDER BY" in q


class TestWatermarkScan:
    def test_overlap_and_full_fallback(self, spark):
        rows = [(i, dt.datetime(2024, 1, 1) + dt.timedelta(hours=i)) for i in range(10)]
        df = spark.createDataFrame(rows, "id long, ts timestamp")
        assert parquet.watermark_scan(df, "ts", None).count() == 10  # first run: full
        # watermark 05:00 − 1h overlap → strictly after 04:00 → hours 5..9
        assert parquet.watermark_scan(df, "ts", dt.datetime(2024, 1, 1, 5)).count() == 5


class TestProfiling:
    def test_type_hints(self, spark):
        import datetime as dt
        from spaceparts_data_pipeline_spark.operators.profiling import type_hints
        ns = int(dt.datetime(2025, 4, 1, tzinfo=dt.timezone.utc).timestamp()) * 10**9
        df = spark.createDataFrame(
            [(ns + i * 10**9, "A" if i % 2 else "B", str(i) + ".5", f"unique prose number {i} here")
             for i in range(8)],
            "billing_date long, seg string, amount string, note string",
        )
        h = type_hints(df)
        assert h["billing_date"]["epoch_unit"] == "ns"
        assert h["seg"]["category"] is True
        assert h["amount"]["numeric_string"] is True
        assert "note" not in h or "numeric_string" not in h.get("note", {})
