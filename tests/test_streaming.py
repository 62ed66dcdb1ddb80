"""Structured Streaming tests: file-source windowed aggregation with
watermark, and foreachBatch MERGE upsert — drained with availableNow."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType, LongType, StringType, StructField, StructType, TimestampType,
)

from spaceparts_data_pipeline_spark.streaming import structured

SCHEMA = StructType([
    StructField("event_id", LongType()),
    StructField("ts", TimestampType()),
    StructField("event_type", StringType()),
    StructField("value", DoubleType()),
])


def _write_batch(spark, path, rows):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("append").parquet(path)


def test_windowed_counts_with_watermark(spark, tmp_path):
    src = str(tmp_path / "stream_src")
    t = dt.datetime(2024, 1, 1, 10, 15)
    _write_batch(spark, src, [
        (1, t, "click", 1.0),
        (2, t + dt.timedelta(minutes=10), "click", 2.0),
        (3, t + dt.timedelta(hours=2), "view", 3.0),
    ])
    stream = structured.stream_events(spark, src, SCHEMA)
    assert stream.isStreaming
    agg = structured.windowed_counts(stream, window="1 hour", watermark="1 hour")
    q = (
        agg.writeStream.format("memory").queryName("win_counts")
        .outputMode("append").trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt1")).start()
    )
    q.awaitTermination(120)
    out = {(r["window_start"], r["event_type"]): (r["n"], r["total_value"])
           for r in spark.table("win_counts").collect()}
    # the 10:00 click window is closed by the watermark advancing past 11:00
    assert out[(dt.datetime(2024, 1, 1, 10, 0), "click")] == (2, 3.0)


def test_stream_upsert_foreachbatch(spark, tmp_path):
    spark.sql("CREATE DATABASE IF NOT EXISTS stream_db")
    spark.catalog.setCurrentDatabase("stream_db")
    try:
        src = str(tmp_path / "upsert_src")
        t0, t1 = dt.datetime(2024, 1, 1), dt.datetime(2024, 1, 2)
        _write_batch(spark, src, [(1, t0, "click", 1.0), (2, t0, "view", 2.0)])
        stream = structured.stream_events(spark, src, SCHEMA)
        q = structured.stream_upsert(spark, stream, "events_current", ["event_id"], "ts",
                                     str(tmp_path / "ckpt2"))
        q.awaitTermination(120)
        assert {r["event_id"]: r["value"] for r in spark.table("events_current").collect()} \
            == {1: 1.0, 2: 2.0}
        # second micro-batch: update event 1, insert event 3
        _write_batch(spark, src, [(1, t1, "click", 9.0), (3, t0, "buy", 3.0)])
        stream2 = structured.stream_events(spark, src, SCHEMA)
        q2 = structured.stream_upsert(spark, stream2, "events_current", ["event_id"], "ts",
                                      str(tmp_path / "ckpt2"))
        q2.awaitTermination(120)
        out = {r["event_id"]: r["value"] for r in spark.table("events_current").collect()}
        assert out == {1: 9.0, 2: 2.0, 3: 3.0}
    finally:
        spark.catalog.setCurrentDatabase("default")
        spark.sql("DROP DATABASE stream_db CASCADE")
