"""Small-file compaction (operators/maintenance.py) — the OPTIMIZE
analog — and the sorted-write data-skipping property of silver writes."""

from __future__ import annotations

import datetime as dt
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType, StringType, StructField, StructType, TimestampType,
)

from spaceparts_data_pipeline_spark.operators.maintenance import (
    compact_table, file_stats, table_location,
)
from spaceparts_data_pipeline_spark.plans import bronze, silver

SCHEMA = StructType([
    StructField("order_number", StringType()),
    StructField("amount", DoubleType()),
    StructField("dwcreateddate", TimestampType()),
])

T0 = dt.datetime(2025, 1, 1, 10, 0)


@pytest.fixture()
def maint_db(spark):
    spark.sql("CREATE DATABASE IF NOT EXISTS maint_db")
    spark.catalog.setCurrentDatabase("maint_db")
    yield
    spark.catalog.setCurrentDatabase("default")
    spark.sql("DROP DATABASE maint_db CASCADE")


def test_compaction_after_incremental_appends(spark, maint_db):
    """N watermarked appends accumulate files; compaction collapses them
    without changing the data."""
    for i in range(5):
        ts = T0 + dt.timedelta(hours=2 * i)
        src = spark.createDataFrame(
            [(f"o{i}-{j}", float(j), ts) for j in range(20)], SCHEMA)
        bronze.run_incremental(spark, src, "fact_c", overlap=dt.timedelta(0))
    before = file_stats(spark, "bronze_fact_c")
    assert before["n_files"] >= 5
    rows_before = {r["order_number"] for r in spark.table("bronze_fact_c").collect()}

    out = compact_table(spark, "bronze_fact_c")
    assert out["n_files_after"] < before["n_files"]
    assert out["n_files_after"] == 1          # 100 tiny rows → one file
    rows_after = {r["order_number"] for r in spark.table("bronze_fact_c").collect()}
    assert rows_after == rows_before
    # table remains appendable after the staging swap
    src = spark.createDataFrame([("post", 1.0, T0 + dt.timedelta(days=1))], SCHEMA)
    bronze.run_incremental(spark, src, "fact_c", overlap=dt.timedelta(0))
    assert spark.table("bronze_fact_c").filter(F.col("order_number") == "post").count() == 1


def test_partition_scoped_compaction(spark, maint_db):
    """Compacting a listed partition leaves other partitions' bytes
    untouched on disk."""
    for batch in range(3):
        df = spark.range(batch * 10, batch * 10 + 10).select(
            F.col("id").alias("k"),
            F.lit("a").alias("part"),
            (F.col("id") * 1.0).alias("v"),
        ).union(spark.range(2).select(
            (F.col("id") + 100 * batch).alias("k"), F.lit("b").alias("part"),
            F.lit(0.0).alias("v")))
        mode = "overwrite" if batch == 0 else "append"
        df.write.mode(mode).partitionBy("part").saveAsTable("part_c")
    loc = table_location(spark, "part_c")

    def files_of(part):
        out = {}
        for root, _d, fs in os.walk(os.path.join(loc, f"part={part}")):
            for f in fs:
                if f.endswith(".parquet"):
                    p = os.path.join(root, f)
                    out[p] = os.path.getmtime(p)
        return out

    a_before, b_before = files_of("a"), files_of("b")
    assert len(a_before) >= 3
    n = spark.table("part_c").count()

    compact_table(spark, "part_c", partition_values=["a"])
    a_after, b_after = files_of("a"), files_of("b")
    assert len(a_after) == 1
    assert b_after == b_before                 # partition b untouched
    assert spark.table("part_c").count() == n


def test_staged_overwrite_swaps_and_cleans_up(spark, maint_db):
    """Full-load writes go through <table>__staging + rename: the final
    catalog has the live table only, with the new data, even when the
    new data is derived from the table being replaced."""
    from spaceparts_data_pipeline_spark.operators.maintenance import overwrite_via_staging

    spark.range(10).write.mode("overwrite").saveAsTable("swap_t")
    # overwrite with a plan READING the table being replaced (doubled)
    doubled = spark.table("swap_t").withColumn("id", F.col("id") * 2)
    overwrite_via_staging(spark, "swap_t", doubled)
    vals = sorted(r["id"] for r in spark.table("swap_t").collect())
    assert vals == [i * 2 for i in range(10)]
    assert not spark.catalog.tableExists("swap_t__staging")


def test_silver_write_is_sorted_for_data_skipping(spark, maint_db):
    """Silver writes sort rows by the inferred keys inside each file so
    parquet row-group min/max statistics can prune key lookups."""
    import pyarrow.parquet as pq

    rows = [(f"o{i:04d}", float(i), T0) for i in range(2000)]
    bronze.run_full(spark, spark.createDataFrame(rows, SCHEMA), "fact_s")
    silver.run_full(spark, "fact_s")
    loc = table_location(spark, "silver_fact_s")
    checked = 0
    for root, _d, fs in os.walk(loc):
        for f in fs:
            if not f.endswith(".parquet"):
                continue
            pf = pq.ParquetFile(os.path.join(root, f))
            idx = pf.schema_arrow.get_field_index("order_number")
            # min/max statistics present for the sort key
            st = pf.metadata.row_group(0).column(idx).statistics
            assert st is not None and st.min is not None
            # rows inside the file are sorted on the key
            vals = pf.read(columns=["order_number"]).column(0).to_pylist()
            assert vals == sorted(vals)
            checked += 1
    assert checked >= 1
