"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Queries live in ``spaceparts_data_pipeline_spark/queries/`` — this file
only aggregates the registry.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (gold_fact_sales shape: broadcast FX/doctype joins,
    EUR arithmetic, when-chain categorization, conditional measures) on
    /root/testdata/sf0.001."""
    from spaceparts_data_pipeline_spark.queries.core import q04_flagship_sales_eur
    from spaceparts_data_pipeline_spark.session import apply_runtime_confs

    apply_runtime_confs(spark)
    return q04_flagship_sales_eur(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ LLM-data
    ops) — the DRIVER tier. Pure oracle-twins of a driver-tier query
    (exact-path twins, shared-oracle routes, rows-only xxhash emitters
    with a deterministic FULL-oracle sibling) live in the LOCAL-ONLY
    tier instead: still implemented, still value-checked against their
    own oracles by every local parity run, just not spending driver
    window slots (COVERAGE.md §rotation-policy; round-13 verdict #3)."""
    from spaceparts_data_pipeline_spark.queries import driver_queries

    return driver_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle twins for every SQL-expressible driver-tier query."""
    from spaceparts_data_pipeline_spark.queries import driver_oracles

    return driver_oracles()
