"""Silver layer: the schema-generic cleaning pipeline per table
(SURVEY.md §3.2 step 3; reference Silver_full_load cell 8).

Per table: standardize types (name/dtype dispatch) → keep-latest dedup
(inferred keys) → all-null drop → quarantine split (side sink) → silver
metadata → write. Incremental mode implements the silver upsert flavor:
union existing+incoming then keep-latest overwrite (U1 + W1/W2).

No blind repartition (the reference's `optimize_partitioning` heuristic
is replaced by AQE coalescing, SURVEY.md §4) and no persist-around-count
(we count the written table instead of computing the plan twice).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spaceparts_data_pipeline_spark.operators.dedup import dedup_latest, infer_keys
from spaceparts_data_pipeline_spark.operators.merge import upsert_union_dedup
from spaceparts_data_pipeline_spark.operators.quality import drop_all_null, quarantine_split
from spaceparts_data_pipeline_spark.operators.standardize import standardize_types
from spaceparts_data_pipeline_spark.plans import logs


def transform(
    df: DataFrame,
    table: str,
    execution_id: str,
    order_col: str = "dwcreateddate",
    horizon=None,
) -> tuple[DataFrame, DataFrame]:
    """(clean, quarantined) silver DataFrames for one bronze table."""
    std = standardize_types(df)
    deduped = dedup_latest(std, order_col=order_col) if order_col in std.columns else std
    non_null = drop_all_null(deduped)
    clean, quarantined = quarantine_split(non_null, source_table=table, horizon=horizon)
    clean = clean.withColumn("silver_created_date", F.current_timestamp()).withColumn(
        "silver_execution_id", F.lit(execution_id)
    )
    return clean, quarantined


def run_full(
    spark: SparkSession,
    table: str,
    execution_id: str | None = None,
    source_table: str | None = None,
    log_table: str = "silver_execution_log",
    horizon=None,
    sort_by: list[str] | None = None,
) -> dict:
    """``sort_by``: optionally sort within partitions before the write so
    parquet row-group min/max statistics prune downstream key lookups
    (the Parquet analog of the reference's dataSkippingNumIndexedCols +
    OPTIMIZE clustering, SURVEY.md §4)."""
    execution_id = execution_id or logs.new_execution_id()
    src = spark.table(source_table or f"bronze_{table}")
    clean, quarantined = transform(src, table, execution_id, horizon=horizon)
    n_quarantined = quarantined.count()
    if n_quarantined:
        quarantined.write.mode("append").option("mergeSchema", "true").saveAsTable(
            f"silver_quarantine_{table}"
        )
    if sort_by:
        clean = clean.sortWithinPartitions(*sort_by)
    clean.write.mode("overwrite").saveAsTable(f"silver_{table}")
    n = spark.table(f"silver_{table}").count()
    logs.append_log(spark, log_table, "silver", table, execution_id, "success", n)
    return {"table": table, "status": "success", "records": n, "quarantined": n_quarantined}


def run_incremental(
    spark: SparkSession,
    table: str,
    incoming: DataFrame,
    order_col: str = "dwcreateddate",
    execution_id: str | None = None,
    control_table: str = "silver_incremental_control",
    log_table: str = "silver_execution_log",
    horizon=None,
) -> dict:
    """Silver upsert: clean the incoming slice, union with the existing
    silver table, keep-latest per inferred key, overwrite (U1+W1/W2 —
    the reference's silver merge strategy)."""
    execution_id = execution_id or logs.new_execution_id()
    clean, quarantined = transform(incoming, table, execution_id, order_col=order_col, horizon=horizon)
    target = f"silver_{table}"
    if spark.catalog.tableExists(target):
        existing = spark.table(target)
        keys = infer_keys(existing.columns, order_col)
        merged = upsert_union_dedup(existing, clean, keys=keys, order_col=order_col)
        # Materialize before overwriting the table we read from.
        merged.localCheckpoint(eager=True).write.mode("overwrite").saveAsTable(target)
    else:
        clean.write.mode("overwrite").saveAsTable(target)
    if quarantined.isEmpty() is False:
        quarantined.write.mode("append").option("mergeSchema", "true").saveAsTable(
            f"silver_quarantine_{table}"
        )
    n = spark.table(target).count()
    wm = incoming.agg(F.max(order_col)).collect()[0][0] if order_col in incoming.columns else None
    logs.append_control(spark, control_table, table, execution_id, wm, "success", n)
    logs.append_log(spark, log_table, "silver", table, execution_id, "success", n)
    return {"table": table, "status": "success", "records": n}
