"""Business-measure query layer (SURVEY.md §2.10).

The reference delegates rollups to DAX measures over the gold star
schema (README.md:460-481). Here they are first-class engine queries:
conditional aggregates, null-safe ratios, cross-fact variance, calendar
dimension generation, OTD quality metrics.

All expressed with built-in column functions (conditional aggregation =
``sum(when(...))`` — a single shuffle-with-partial-aggregation; no UDFs).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from spaceparts_data_pipeline_spark.functions.scalars import dsum, safe_divide


def sales_only(sales_col: str = "sales_eur", category_col: str = "document_category") -> Column:
    """``Sales Only = SUM(sales_eur) WHERE document_category = 'Sale'``
    (README.md:460-476) as a conditional aggregate."""
    return F.sum(
        F.when(F.col(category_col) == "Sale", F.col(sales_col)).cast("decimal(27,6)")
    ).cast("double")


def calendar_dim(dates_df: DataFrame, date_col: str = "date") -> DataFrame:
    """Generate the calendar dimension from the min/max of a date column
    (README.md:400-417 M dataflow): one row per day with
    ``date_key=yyyyMMdd`` int, year, quarter, month name.

    Fully distributed: ``sequence`` + ``explode`` on the single min/max
    row — no driver-side date loop, no collect.
    """
    bounds = dates_df.agg(
        F.min(F.col(date_col).cast("date")).alias("mn"),
        F.max(F.col(date_col).cast("date")).alias("mx"),
    )
    days = bounds.select(F.explode(F.sequence("mn", "mx")).alias("date"))
    return days.select(
        F.col("date"),
        F.date_format("date", "yyyyMMdd").cast("int").alias("date_key"),
        F.year("date").alias("year"),
        F.quarter("date").alias("quarter"),
        F.date_format("date", "MMMM").alias("month_name"),
    )


def budget_variance(
    sales: DataFrame,
    budget: DataFrame,
    keys: list[str],
    sales_col: str = "sales_eur",
    budget_col: str = "budget_eur",
) -> DataFrame:
    """Cross-fact variance: per key, ``variance = sales − budget`` and
    ``achievement_pct = DIVIDE(sales, budget, 0) × 100`` (README.md:469-471).

    Aggregates each fact FIRST (map-side combinable), then joins the two
    small aggregates — never joins fact-to-fact row-level.
    """
    s = sales.groupBy(*keys).agg(dsum(sales_col, "sales_total"))
    b = budget.groupBy(*keys).agg(dsum(budget_col, "budget_total"))
    joined = s.join(b, keys, "full_outer")
    return joined.select(
        *keys,
        F.coalesce("sales_total", F.lit(0.0)).alias("sales_total"),
        F.coalesce("budget_total", F.lit(0.0)).alias("budget_total"),
        (F.coalesce("sales_total", F.lit(0.0)) - F.coalesce("budget_total", F.lit(0.0))).alias("budget_variance"),
        (safe_divide(F.col("sales_total"), F.col("budget_total")) * 100).alias("achievement_pct"),
    )


def otd_metrics(df: DataFrame, ship_col: str, order_col: str) -> DataFrame:
    """On-time-delivery quality metrics: count and share of rows with
    ``ship_date < order_date`` (the reference's documented 1.048M-row data
    quality finding, README.md:487)."""
    inverted = F.when(F.col(ship_col) < F.col(order_col), 1).otherwise(0)
    return df.agg(
        F.count(F.lit(1)).alias("total_rows"),
        F.sum(inverted).alias("inverted_date_rows"),
        (F.sum(inverted).cast("double") / F.count(F.lit(1))).alias("inverted_share"),
    )
