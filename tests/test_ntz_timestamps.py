"""TIMESTAMP_NTZ regression coverage.

The driver's session reads the tz-less testdata parquet with
``spark.sql.timestampType=TIMESTAMP_NTZ``, so every timestamp column
arrives as TIMESTAMP_NTZ — where ``unix_micros`` (and friends) raise
AnalysisException (observed: CORRECTNESS_r04 x28_range_pairs).  These
tests flip the same runtime conf on the shared session and pin that

- the whole batch registry still *analyzes* (catches any remaining
  LTZ-only expression at plan time), and
- the epoch-arithmetic queries (x28/x01/x14) return bit-identical rows
  under both timestamp flavors (UTC session, so the stored micros agree).
"""

from __future__ import annotations

import pytest

from spaceparts_data_pipeline_spark.queries import all_queries


@pytest.fixture()
def ntz(spark):
    prev = spark.conf.get("spark.sql.timestampType")
    spark.conf.set("spark.sql.timestampType", "TIMESTAMP_NTZ")
    try:
        yield spark
    finally:
        spark.conf.set("spark.sql.timestampType", prev)


def test_events_ts_reads_as_ntz(ntz, sf_small):
    e = ntz.read.parquet(f"{sf_small}/events.parquet")
    assert dict(e.dtypes)["ts"] == "timestamp_ntz"


@pytest.mark.parametrize(
    "name", ["x28_range_pairs", "x01_event_sessions", "x14_range_window"]
)
def test_epoch_queries_ntz_matches_ltz(spark, ntz, sf_small, name):
    fn = all_queries()[name]
    # Same session object; the conf only matters at read/analysis time,
    # so build the LTZ plan first, then flip (the fixture already set NTZ
    # before this body runs — reset, build, restore).
    ntz.conf.set("spark.sql.timestampType", "TIMESTAMP_LTZ")
    ltz_rows = sorted(map(tuple, fn(spark, sf_small).collect()))
    ntz.conf.set("spark.sql.timestampType", "TIMESTAMP_NTZ")
    ntz_rows = sorted(map(tuple, fn(ntz, sf_small).collect()))
    assert ltz_rows == ntz_rows
    assert len(ntz_rows) > 0


def test_batch_registry_analyzes_under_ntz(ntz, sf_small):
    """Every non-streaming registered query must at least pass analysis
    with NTZ timestamps (the streaming pair is exercised by the driver
    itself and needs a real sink, so it is out of scope here)."""
    streaming = {"s01_stream_windowed_counts", "s02_stream_stateful_profile"}
    failures = {}
    for name, fn in all_queries().items():
        if name in streaming:
            continue
        try:
            df = fn(ntz, sf_small)
            _ = df.schema
        except Exception as exc:  # noqa: BLE001 — collecting a report
            failures[name] = str(exc).split("\n", 1)[0][:160]
    assert not failures, f"queries failing analysis under NTZ: {failures}"
