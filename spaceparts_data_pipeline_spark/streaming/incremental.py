"""Batch-incremental orchestration (SURVEY.md §2.11, §3.3).

The reference's incrementality is watermark-batch, with a different
upsert flavor per layer:

  bronze  — watermark scan + APPEND        (plans.bronze.run_incremental)
  silver  — union + window dedup + OVERWRITE (plans.silver.run_incremental)
  gold    — changed-keys + keyed MERGE     (plans.gold.run_incremental)

This module adds the cross-layer driver: compute the effective
watermark (`now − lookback_days`, overridable; `force_full_refresh`
flag) and run the three layers' incremental paths in order.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, SparkSession

from spaceparts_data_pipeline_spark.plans import bronze, gold, logs, silver
from spaceparts_data_pipeline_spark.sources.parquet import watermark_scan

DEFAULT_LOOKBACK_DAYS = 7


def effective_watermark(
    lookback_days: int = DEFAULT_LOOKBACK_DAYS,
    now: dt.datetime | None = None,
) -> dt.datetime:
    """Gold watermark: now − lookback_days (Gold_incremental_load cell 8)."""
    now = now or dt.datetime.now(dt.timezone.utc).replace(tzinfo=None)
    return now - dt.timedelta(days=lookback_days)


def run_incremental_pipeline(
    spark: SparkSession,
    sources: dict[str, DataFrame],
    ts_col: str = "dwcreateddate",
    lookback_days: int = DEFAULT_LOOKBACK_DAYS,
    now: dt.datetime | None = None,
    force_full_refresh: bool = False,
    skip_gold: bool = False,
) -> dict:
    # ONE execution id for the whole run, threaded through every
    # layer's success/control/failure rows: the run's log rows correlate
    # across the three logs, and the alert chain can scope its lookup to
    # THIS run (plans/notify.py execution_id) so stale failures from an
    # earlier run can never re-alert
    execution_id = logs.new_execution_id()
    results: dict = {"bronze": {}, "silver": {}, "gold": {},
                     "execution_id": execution_id}
    # per-table isolation, like runner.py's full-mode layers: one bad
    # table must not halt the layer, and its failure must land as a
    # 'failed' execution-log row — that row is what the orchestration
    # alert chain (the reference's Lookup_Error_* →
    # Email_Notificacion_Error_*) looks up. Success LOG rows batch into
    # one append per layer (the r15 silver profile: ~0.4 s fixed job
    # latency per 1-row append); CONTROL rows stay per-table — they
    # carry the watermark the next run scans from.
    log_buf = logs.LogBuffer(spark, "bronze_execution_log")
    try:
        for table in sorted(sources):
            try:
                results["bronze"][table] = bronze.run_incremental(
                    spark, sources[table], table, ts_col=ts_col,
                    execution_id=execution_id, log_buffer=log_buf)
            except Exception as exc:  # noqa: BLE001 - per-table isolation
                log_buf.add("bronze", table, execution_id, "failed", None,
                            str(exc)[:500])
                results["bronze"][table] = {"table": table, "status": "failed",
                                            "error": str(exc)}
    finally:
        flush_err = log_buf.flush_safe()
    if flush_err:
        results.setdefault("log_flush_errors", {})["bronze"] = flush_err
    log_buf = logs.LogBuffer(spark, "silver_execution_log")
    try:
        for table in sorted(sources):
            if results["bronze"].get(table, {}).get("status") == "failed":
                # no fresh bronze slice to feed silver; skip, don't crash
                results["silver"][table] = {"table": table, "status": "skipped",
                                            "reason": "bronze failed this run"}
                continue
            # Feed silver only the bronze slice above its own last control
            # watermark (minus the standard overlap), not the full history:
            # keeps the silver stage O(increment) and stops the quarantine
            # side-sink from re-deriving (and re-appending) old bad rows
            # every run. First run: no watermark → full scan.
            try:
                wm = logs.last_watermark(spark, "silver_incremental_control", table)
                incoming = watermark_scan(spark.table(f"bronze_{table}"), ts_col, wm)
                results["silver"][table] = silver.run_incremental(
                    spark, table, incoming, order_col=ts_col,
                    execution_id=execution_id, log_buffer=log_buf)
            except Exception as exc:  # noqa: BLE001 - per-table isolation
                log_buf.add("silver", table, execution_id, "failed", None,
                            str(exc)[:500])
                results["silver"][table] = {"table": table, "status": "failed",
                                            "error": str(exc)}
    finally:
        flush_err = log_buf.flush_safe()
    if flush_err:
        results.setdefault("log_flush_errors", {})["silver"] = flush_err
    if not skip_gold:
        wm = effective_watermark(lookback_days, now)
        results["gold"] = gold.run_incremental(
            spark, wm, execution_id=execution_id,
            force_full_refresh=force_full_refresh)
    return results
