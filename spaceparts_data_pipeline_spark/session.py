"""SparkSession factory with the engine's standard configuration.

Mirrors the reference's Spark conf choices (AQE, partition coalescing,
skew-join handling — see /root/reference Silver_full_load.ipynb:1 cell 6
and Gold_incremental_load.ipynb:1 cell 6) and adds Arrow transfer for the
Pandas-UDF paths. Designed so the same code runs on local[N] and on a
multi-executor cluster: nothing here assumes single-JVM execution.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

#: Confs that are safe (and desirable) to apply to an externally provided
#: session at runtime — all of these are runtime-mutable SQL confs.
RUNTIME_CONFS: dict[str, str] = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Runtime row-level filtering for large shuffle joins: inject a
    # bloom filter built from the creation side into the application
    # side's scan (cuts shuffled bytes on selective joins — e.g. the
    # changed-keys semi join and the fingerprint-store screens — with
    # zero plan changes; a no-op below the size thresholds, so local
    # tests and plan pins are unaffected).
    "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
    "spark.sql.session.timeZone": "UTC",
    # Arrow for any toPandas / pandas-UDF boundary crossing.
    "spark.sql.execution.arrow.pyspark.enabled": "true",
}


def get_spark(
    app_name: str = "spaceparts-engine",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    persistent_warehouse: str | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with the engine defaults.

    On a real cluster, ``master`` comes from the environment / launcher;
    locally we default to ``local[$SPARK_GRAFT_CPUS]``.

    ``persistent_warehouse``: directory for a Hive/Derby-backed catalog
    so ``saveAsTable`` tables survive across processes (used by the CLI
    for multi-run incremental pipelines; the default in-memory catalog
    lives and dies with the session).
    """
    master = master or os.environ.get("SPARK_MASTER") or f"local[{os.environ.get('SPARK_GRAFT_CPUS', '*')}]"
    shuffle = shuffle_partitions or int(os.environ.get("SPARK_SHUFFLE_PARTITIONS", "32"))
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        # console progress bars write to STDOUT carriage-return frames;
        # bench.py's contract is ONE parseable JSON line on stdout and
        # the driver wrapper keeps only the last 2000 chars — progress
        # junk glued (no newline) in front of the JSON breaks its parse
        .config("spark.ui.showConsoleProgress", "false")
    )
    if persistent_warehouse:
        wh = os.path.abspath(persistent_warehouse)
        os.makedirs(wh, exist_ok=True)
        builder = (
            builder.config("spark.sql.catalogImplementation", "hive")
            .config("spark.sql.warehouse.dir", os.path.join(wh, "tables"))
            .config(
                "spark.hadoop.javax.jdo.option.ConnectionURL",
                f"jdbc:derby:;databaseName={os.path.join(wh, 'metastore_db')};create=true",
            )
            .enableHiveSupport()
        )
    else:
        builder = builder.config(
            "spark.sql.warehouse.dir", os.environ.get("SPARK_WAREHOUSE_DIR", "/tmp/spark-warehouse")
        )
    for k, v in RUNTIME_CONFS.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    if persistent_warehouse:
        # getOrCreate silently IGNORES every builder config when a
        # session already exists in the process — including the
        # Hive/Derby catalog, in which case every saveAsTable lands in
        # the pre-existing session's in-memory catalog and dies with the
        # process, discovered only when the next run finds no tables.
        # Static confs can't be applied post-hoc, so the honest move is
        # a loud warning (raising would break embedders who *meant* to
        # share their session).
        wh = os.path.join(os.path.abspath(persistent_warehouse), "tables")
        impl = spark.conf.get("spark.sql.catalogImplementation", "in-memory")
        got_wh = spark.conf.get("spark.sql.warehouse.dir", "")
        if impl != "hive" or not got_wh.replace("file:", "").startswith(wh):
            import logging

            logging.getLogger(__name__).warning(
                "get_spark(persistent_warehouse=%r) reused an existing "
                "SparkSession with catalogImplementation=%r, "
                "warehouse.dir=%r — the requested persistent catalog was "
                "NOT applied (builder configs are ignored by getOrCreate "
                "on a live session); tables written through this session "
                "will not survive the process. Stop the existing session "
                "first or pass its own warehouse.", persistent_warehouse,
                impl, got_wh)
    return spark


def apply_runtime_confs(spark: SparkSession) -> SparkSession:
    """Apply runtime-mutable engine confs to an externally owned session."""
    for k, v in RUNTIME_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:  # conf not settable in this deployment — keep going
            pass
    return spark
