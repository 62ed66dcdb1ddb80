"""Table maintenance: small-file compaction (the plain-Parquet analog of
the reference's Delta ``OPTIMIZE`` / ``optimizeWrite`` / ``autoCompact``
— Silver_full_load.ipynb:1 cells 6 and 16).

Append-flavored incremental layers (bronze K2, quarantine side-sinks)
add a few files per run; after N runs a scan pays N file-open costs and
the small row groups defeat min/max skipping. ``compact_table`` rewrites
the table (or just the listed partitions) into ~``target_file_mb``
files:

- unpartitioned tables: stage-write to ``<table>__compact`` then swap
  via catalog rename — no O(table) executor-memory checkpoint, and a
  crash mid-write leaves the original table intact (the staging table
  is simply re-created next run).
- partitioned tables with an explicit ``partition_values`` list:
  dynamic-partition-overwrite of only those partitions (bounded
  checkpoint) — the incremental-friendly form: compact the partitions
  this run's delta touched.
"""

from __future__ import annotations

import math
import os

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from spaceparts_data_pipeline_spark.operators.merge import physical_partition_cols

DEFAULT_TARGET_FILE_MB = 128


def table_location(spark: SparkSession, table: str) -> str | None:
    try:
        rows = spark.sql(f"DESCRIBE FORMATTED {table}").collect()
    except Exception:
        return None
    for r in rows:
        if r.col_name.strip() == "Location":
            return r.data_type.replace("file:", "")
    return None


def file_stats(spark: SparkSession, table: str) -> dict:
    """(n_files, total_bytes) for a managed parquet table — the signal
    deciding whether compaction is worth a rewrite."""
    loc = table_location(spark, table)
    n, total = 0, 0
    if loc and os.path.isdir(loc):
        for root, _dirs, files in os.walk(loc):
            for f in files:
                if f.endswith(".parquet"):
                    n += 1
                    total += os.path.getsize(os.path.join(root, f))
    return {"n_files": n, "total_bytes": total}


def overwrite_via_staging(
    spark: SparkSession,
    table: str,
    df,
    partition_by: str | list[str] | None = None,
) -> None:
    """Crash-safe full overwrite: materialize ``<table>__staging``
    completely, then swap it in with a catalog drop+rename.

    A plain ``mode("overwrite").saveAsTable`` drops the live table before
    writing — a mid-write crash loses it. Here a crash during the staging
    write leaves the live table untouched (the orphan staging table is
    simply re-created next run), shrinking the unprotected window to the
    metadata-only drop+rename. This is the plain-Parquet stand-in for the
    reference's Delta transaction log; it also removes the need to
    localCheckpoint plans that read the table they replace — the staging
    write IS the materialization.
    """
    staging = f"{table}__staging"
    pcols = [partition_by] if isinstance(partition_by, str) else list(partition_by or [])
    spark.sql(f"DROP TABLE IF EXISTS {staging}")
    w = df.write.mode("overwrite")
    if pcols:
        w = w.partitionBy(*pcols)
    w.saveAsTable(staging)
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    spark.sql(f"ALTER TABLE {staging} RENAME TO {table}")
    if pcols:
        # the rename moves the data directory but the catalog's partition
        # entries keep their pre-rename locations — re-register them, else
        # the table reads empty
        spark.sql(f"MSCK REPAIR TABLE {table}")


def compact_table(
    spark: SparkSession,
    table: str,
    target_file_mb: int = DEFAULT_TARGET_FILE_MB,
    partition_values: list | None = None,
) -> dict:
    """Rewrite ``table`` into ~``target_file_mb``-sized files.

    Returns {"n_files_before", "n_files_after", "total_bytes"}. No-op
    (beyond a stats probe) when the table already has ≤ the target file
    count.
    """
    stats = file_stats(spark, table)
    target_files = max(1, math.ceil(stats["total_bytes"] / (target_file_mb * 1024 * 1024)))
    pcols = physical_partition_cols(spark, table)
    df = spark.table(table)

    if pcols and partition_values is not None:
        # partition-scoped: rewrite only the listed partitions
        pcol = pcols[0]
        sub = df.filter(F.col(pcol).isin(partition_values))
        # one shuffle keyed by partition value → one writer task per
        # value → one file per compacted partition (AQE coalesces)
        out = sub.repartition(F.col(pcol)).localCheckpoint(eager=True)
        prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            out.write.mode("overwrite").insertInto(table)
        finally:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    elif stats["n_files"] > target_files:
        if pcols:
            overwrite_via_staging(
                spark, table, df.repartition(*[F.col(c) for c in pcols]),
                partition_by=pcols)
        else:
            overwrite_via_staging(spark, table, df.repartition(target_files))

    after = file_stats(spark, table)
    return {
        "n_files_before": stats["n_files"],
        "n_files_after": after["n_files"],
        "total_bytes": after["total_bytes"],
    }
