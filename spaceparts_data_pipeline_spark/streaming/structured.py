"""Structured Streaming re-expression of the incremental layer
(SURVEY.md §2.11 notes this is optional for parity; we provide it as
the engine's native streaming path for event-style sources).

- ``stream_events``: file-source stream over a directory of parquet.
- ``windowed_counts``: event-time windowed aggregation with a real
  ``withWatermark`` (the principled replacement for the reference's
  fixed 1-hour overlap: late rows beyond the watermark are dropped
  instead of double-processed).
- ``stream_upsert``: foreachBatch MERGE into a target table — the
  streaming twin of the gold K3 upsert; each micro-batch runs the same
  null-safe anti-join+union merge.

All tested with ``availableNow`` triggers (bounded drain) so the same
code serves batch backfill and continuous ingest — Spark's unified
model.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from spaceparts_data_pipeline_spark.operators.merge import merge_upsert


def stream_events(spark: SparkSession, path: str, schema: StructType) -> DataFrame:
    """File-source stream (one file per micro-batch by default)."""
    return spark.readStream.schema(schema).parquet(path)


def windowed_counts(
    stream: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    window: str = "1 hour",
    watermark: str = "1 hour",
) -> DataFrame:
    """Event-time windowed counts with late-data watermarking."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("win"), F.col(key_col))
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total_value"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            key_col, "n", "total_value",
        )
    )


def stream_upsert(
    spark: SparkSession,
    stream: DataFrame,
    target_table: str,
    keys: list[str],
    order_col: str,
    checkpoint_dir: str,
):
    """writeStream.foreachBatch MERGE: each micro-batch upserts into
    ``target_table`` with the engine's keyed merge (dedup-latest source,
    null-safe match). Returns the StreamingQuery (availableNow)."""

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        if not spark.catalog.tableExists(target_table):
            batch_df.write.mode("overwrite").saveAsTable(target_table)
            return
        target = spark.table(target_table)
        merged = merge_upsert(target, batch_df.select(*target.columns), keys, order_col=order_col)
        merged.localCheckpoint(eager=True).write.mode("overwrite").saveAsTable(target_table)

    return (
        stream.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
