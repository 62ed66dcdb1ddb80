"""JDBC source helpers (SURVEY.md §2.1 S1/S2).

The reference ingests from Azure SQL over JDBC with pushdown subqueries
and ``fetchsize=10000`` (bronze_full_load.ipynb:1 cells 14-27). This
container has no JDBC endpoint, so these helpers only *build* readers;
they are exercised by unit tests at the options level and by parquet
stand-ins elsewhere.

Scale notes baked in: partitioned reads (``partitionColumn`` +
lower/upper bound + numPartitions) so a 100 TB-source extract fans out
across executors instead of a single connection.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.readwriter import DataFrameReader

DEFAULT_FETCHSIZE = 10_000


def jdbc_reader(
    spark: SparkSession,
    url: str,
    query: str | None = None,
    table: str | None = None,
    fetchsize: int = DEFAULT_FETCHSIZE,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int | None = None,
    **options: str,
) -> DataFrameReader:
    """Build a configured JDBC reader (call ``.load()`` on a live endpoint).

    Exactly one of ``query`` (pushdown subquery, S2) or ``table`` (full
    scan, S1) must be given.
    """
    if (query is None) == (table is None):
        raise ValueError("provide exactly one of query= or table=")
    reader = spark.read.format("jdbc").option("url", url).option("fetchsize", str(fetchsize))
    if query is not None:
        reader = reader.option("query", query)
    else:
        reader = reader.option("dbtable", table)
    if partition_column is not None:
        if query is not None:
            raise ValueError("partitioned JDBC reads require table=, not query=")
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions or 8))
        )
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader


def write_jdbc(
    df,
    url: str,
    table: str,
    mode: str = "overwrite",
    driver: str | None = None,
    batchsize: int = DEFAULT_FETCHSIZE,
    num_partitions: int | None = None,
    **options: str,
) -> None:
    """Cross-store copy (K7): ship a gold table to a warehouse over JDBC
    — the reference's per-run serving hop (ETL_FABRIC.json:1 activities
    "Copy_gold_*"; Lakehouse_to_Warehouse.json:1).

    ``batchsize`` batches executor-side inserts (the write twin of the
    reader's ``fetchsize``); ``num_partitions`` CAPS the writer's
    parallelism — each task opens its own connection, and a 1000-task
    gold table would otherwise open 1000 simultaneous warehouse
    connections. Serving copies are aggregates (small); the cap is the
    scale control, not a throughput lever.
    """
    w = (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", str(batchsize))
        .mode(mode)
    )
    if driver is not None:
        w = w.option("driver", driver)
    if num_partitions is not None:
        w = w.option("numPartitions", str(num_partitions))
    for k, v in options.items():
        w = w.option(k, v)
    w.save()


def discovery_query(schemas: tuple[str, ...] = ("dim", "fact")) -> str:
    """INFORMATION_SCHEMA discovery subquery (S3), deterministic order (O1)."""
    in_list = ", ".join(f"'{s}'" for s in schemas)
    return (
        "SELECT TABLE_SCHEMA, TABLE_NAME FROM INFORMATION_SCHEMA.TABLES "
        f"WHERE TABLE_TYPE = 'BASE TABLE' AND TABLE_SCHEMA IN ({in_list}) "
        "ORDER BY TABLE_SCHEMA, TABLE_NAME"
    )
