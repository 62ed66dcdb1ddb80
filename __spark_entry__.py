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
    """One entry per implemented operator from SURVEY.md §2 (+ LLM-data ops)."""
    from spaceparts_data_pipeline_spark.queries import all_queries

    return all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle twins for every SQL-expressible query; approximate
    ops (MinHash/LSH, SimHash) are intentionally absent → rows-only check."""
    from spaceparts_data_pipeline_spark.queries import all_oracles

    return all_oracles()
