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


def table_location(spark: SparkSession, table: str, raw: bool = False) -> str | None:
    """The table's storage location. ``raw=True`` keeps the URI scheme
    (for the Hadoop FileSystem API); default strips ``file:`` for
    local-path consumers."""
    try:
        rows = spark.sql(f"DESCRIBE FORMATTED {table}").collect()
    except Exception:
        return None
    for r in rows:
        if r.col_name.strip() == "Location":
            return r.data_type if raw else r.data_type.replace("file:", "")
    return None


def file_stats(spark: SparkSession, table: str) -> dict:
    """(n_files, total_bytes) for a managed parquet table — the signal
    deciding whether compaction is worth a rewrite. Listing goes through
    the Hadoop FileSystem API so it works on any URI scheme (s3a://,
    abfss://, hdfs://, file:), not just the local filesystem."""
    loc = table_location(spark, table, raw=True)
    n, total = 0, 0
    if loc:
        try:
            jvm = spark._jvm
            path = jvm.org.apache.hadoop.fs.Path(loc)
            fs = path.getFileSystem(spark._jsc.hadoopConfiguration())
            if fs.exists(path):
                it = fs.listFiles(path, True)
                while it.hasNext():
                    f = it.next()
                    if f.getPath().getName().endswith(".parquet"):
                        n += 1
                        total += f.getLen()
        except Exception:
            # fallback: plain local walk (e.g. a mocked session)
            local = loc.replace("file:", "")
            if os.path.isdir(local):
                for root, _dirs, files in os.walk(local):
                    for f in files:
                        if f.endswith(".parquet"):
                            n += 1
                            total += os.path.getsize(os.path.join(root, f))
    return {"n_files": n, "total_bytes": total}


def recover_staged_swap(spark: SparkSession, table: str) -> str | None:
    """Repair any crash state a previous :func:`overwrite_via_staging`
    left behind, restoring the invariant "``table`` exists and is
    complete". Returns a short action tag (or None if nothing to do).

    Possible crash states, by where the swap died:

    - staging exists, live exists → crash during/after the staging write
      but before the live table moved aside: the live table is current;
      drop the (possibly incomplete) staging.
    - staging exists, live missing → crash after ``live → __old``: the
      staging write had completed (it only renames after), so FINISH the
      swap: promote staging, repair partitions, drop ``__old``.
    - only ``__old`` exists, live missing → cannot happen in order (the
      promote precedes the drop of old), but restore old defensively.
    - ``__old`` exists, live exists → crash before the final drop: the
      promote (and any MSCK) may or may not have completed — MSCK is
      idempotent, so repair partitions and drop old.
    """
    staging, old = f"{table}__staging", f"{table}__old"
    has = spark.catalog.tableExists

    def _msck(t):
        # Also REQUIRED before dropping a renamed partitioned table: a
        # rename moves the data directory but partition entries keep
        # their pre-rename locations, so an un-repaired DROP would
        # delete directories that now belong to the promoted table.
        if physical_partition_cols(spark, t):
            spark.sql(f"MSCK REPAIR TABLE {t}")

    def _drop_old():
        if has(old):
            _msck(old)
            spark.sql(f"DROP TABLE {old}")

    if has(staging):
        if has(table):
            spark.sql(f"DROP TABLE IF EXISTS {staging}")
            return "dropped_incomplete_staging"
        spark.sql(f"ALTER TABLE {staging} RENAME TO {table}")
        _msck(table)
        _drop_old()
        return "promoted_staging"
    if has(old):
        if has(table):
            _msck(table)
            _drop_old()
            return "dropped_old"
        spark.sql(f"ALTER TABLE {old} RENAME TO {table}")
        _msck(table)
        return "restored_old"
    return None


def overwrite_via_staging(
    spark: SparkSession,
    table: str,
    df,
    partition_by: str | list[str] | None = None,
) -> None:
    """Crash-safe full overwrite: materialize ``<table>__staging``
    completely, then swap it in with rename ordering that leaves a
    recoverable state at EVERY step:

    1. recover any prior crash state (:func:`recover_staged_swap`);
    2. write ``<table>__staging`` fully (crash → live table untouched);
    3. rename live → ``<table>__old`` + MSCK it (crash → staging
       complete, recovery promotes it);
    4. rename staging → live (+ MSCK for partitioned tables — the rename
       moves the data directory but the catalog's partition entries keep
       their pre-rename locations; the same applies to ``__old`` in
       step 3, and matters there because dropping a table whose entries
       still point into the live directory would DELETE live data);
    5. drop ``<table>__old`` (crash → recovery just drops it).

    Unlike the previous drop+rename pair, no step ever leaves ZERO
    complete copies of the data: a crash anywhere is repaired by
    :func:`recover_staged_swap` on the next run. This is the
    plain-Parquet stand-in for the reference's Delta transaction log; it
    also removes the need to localCheckpoint plans that read the table
    they replace — the staging write IS the materialization.
    """
    staging, old = f"{table}__staging", f"{table}__old"
    pcols = [partition_by] if isinstance(partition_by, str) else list(partition_by or [])
    recover_staged_swap(spark, table)
    spark.sql(f"DROP TABLE IF EXISTS {staging}")
    w = df.write.mode("overwrite")
    if pcols:
        w = w.partitionBy(*pcols)
    w.saveAsTable(staging)
    if spark.catalog.tableExists(table):
        was_partitioned = bool(physical_partition_cols(spark, table))
        spark.sql(f"ALTER TABLE {table} RENAME TO {old}")
        if was_partitioned:
            spark.sql(f"MSCK REPAIR TABLE {old}")
    spark.sql(f"ALTER TABLE {staging} RENAME TO {table}")
    if pcols:
        spark.sql(f"MSCK REPAIR TABLE {table}")
    spark.sql(f"DROP TABLE IF EXISTS {old}")


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

    if partition_values is not None and not pcols:
        raise ValueError(
            f"partition_values passed but table {table!r} is not partitioned —"
            " a partition-scoped compaction cannot apply; call without"
            " partition_values for a full-table rewrite"
        )
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
