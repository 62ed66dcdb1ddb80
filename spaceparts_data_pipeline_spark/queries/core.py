"""Core operator queries (SURVEY.md §2) over the driver's synthetic
star schema, each with a DuckDB oracle twin.

Query naming: ``qNN_*`` for pipeline/relational operators, ``pNN_*`` for
composite pipeline slices. The SURVEY §2 operator IDs covered by each
query are listed in its docstring.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from spaceparts_data_pipeline_spark.functions.scalars import (
    davg,
    document_category,
    dsum,
    epoch_micros,
    is_ntz,
    safe_divide,
)
from spaceparts_data_pipeline_spark.functions import measures
from spaceparts_data_pipeline_spark.operators.dedup import dedup_latest
from spaceparts_data_pipeline_spark.operators.merge import merge_upsert, upsert_union_dedup
from spaceparts_data_pipeline_spark.operators.quality import quarantine_split
from spaceparts_data_pipeline_spark.operators.standardize import standardize_types
from spaceparts_data_pipeline_spark.sources.parquet import load_table, watermark_scan

QUERIES: dict = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn
    return deco


def T(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# q01 — pricing summary: scan + filter + grouped aggregation (G-family ops,
# P-filters; the classic TPC-H Q1 shape). Partial aggregation is map-side
# combinable; one shuffle on the 2-col group key.
# ---------------------------------------------------------------------------

_Q01_CUTOFF = dt.datetime(1998, 9, 2)

@register(
    "q01_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(27,6))) AS VARCHAR) AS DOUBLE) AS sum_qty,
           CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(27,6))) AS VARCHAR) AS DOUBLE) AS sum_base_price,
           CAST(CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,6))) AS VARCHAR) AS DOUBLE) AS sum_disc_price,
           CAST(CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(27,6))) AS VARCHAR) AS DOUBLE) AS sum_charge,
           CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(27,6))) AS VARCHAR) AS DOUBLE) / COUNT(*) AS avg_qty,
           CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(27,6))) AS VARCHAR) AS DOUBLE) / COUNT(*) AS avg_price,
           CAST(CAST(SUM(CAST(l_discount AS DECIMAL(27,6))) AS VARCHAR) AS DOUBLE) / COUNT(*) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = T(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") <= F.lit(_Q01_CUTOFF))
    disc_price = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
    charge = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount")) * (F.lit(1) + F.col("l_tax"))
    return l.groupBy("l_returnflag", "l_linestatus").agg(
        dsum("l_quantity", "sum_qty"),
        dsum("l_extendedprice", "sum_base_price"),
        dsum(disc_price, "sum_disc_price"),
        dsum(charge, "sum_charge"),
        davg("l_quantity", "avg_qty"),
        davg("l_extendedprice", "avg_price"),
        davg("l_discount", "avg_disc"),
        F.count(F.lit(1)).alias("count_order"),
    )


# ---------------------------------------------------------------------------
# q02 — dim consolidation: J1 (geo left join), J2/J3 (the same small dim
# joined twice under different filters/aliases — the reference's
# account-manager / key-account-manager pattern). All dims broadcast.
# ---------------------------------------------------------------------------

@register(
    "q02_dim_customer_enrich",
    """
    SELECT c.c_custkey, c.c_name, c.c_mktsegment,
           n.n_name AS nation_name, r.r_name AS region_name,
           am.s_name AS account_manager, kam.s_name AS key_account_manager
    FROM customer c
    LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
    LEFT JOIN region r ON n.n_regionkey = r.r_regionkey
    LEFT JOIN (SELECT s_suppkey, s_name FROM supplier WHERE s_suppkey % 2 = 0) am
           ON c.c_custkey % 10 = am.s_suppkey
    LEFT JOIN (SELECT s_suppkey, s_name FROM supplier WHERE s_suppkey % 2 = 1) kam
           ON c.c_custkey % 7 = kam.s_suppkey
    """,
)
def q02_dim_customer_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = T(spark, sf_dir, "customer")
    n = T(spark, sf_dir, "nation")
    r = T(spark, sf_dir, "region")
    s = T(spark, sf_dir, "supplier")
    am = s.filter(F.col("s_suppkey") % 2 == 0).select(
        F.col("s_suppkey").alias("am_key"), F.col("s_name").alias("account_manager")
    )
    kam = s.filter(F.col("s_suppkey") % 2 == 1).select(
        F.col("s_suppkey").alias("kam_key"), F.col("s_name").alias("key_account_manager")
    )
    return (
        c.join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"], "left")
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"], "left")
        .join(F.broadcast(am), c["c_custkey"] % 10 == F.col("am_key"), "left")
        .join(F.broadcast(kam), c["c_custkey"] % 7 == F.col("kam_key"), "left")
        .select(
            "c_custkey", "c_name", "c_mktsegment",
            F.col("n_name").alias("nation_name"),
            F.col("r_name").alias("region_name"),
            "account_manager", "key_account_manager",
        )
    )


# ---------------------------------------------------------------------------
# q03 — fact-fact-dim join + grouped agg + top-k (J-family, O2 top-k).
# customer is the small side (broadcast); orders⋈lineitem shuffles on the
# join key with AQE sizing the partitions.
# ---------------------------------------------------------------------------

_Q03_DATE = dt.datetime(1998, 1, 1)

@register(
    "q03_top_revenue_orders",
    """
    SELECT o.o_orderkey, o.o_orderdate, o.o_orderpriority,
           CAST(CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(27,6))) AS VARCHAR) AS DOUBLE) AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      AND l.l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY o.o_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, o_orderkey
    LIMIT 10
    """,
)
def q03_top_revenue_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = T(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = T(spark, sf_dir, "orders").filter(F.col("o_orderdate") < F.lit(_Q03_DATE))
    l = T(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > F.lit(_Q03_DATE))
    revenue = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
    return (
        l.join(o, l["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum(revenue, "revenue"))
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# q04 — FLAGSHIP: the gold_fact_sales shape (J5 FX lookup with coalesce
# default, J6 doctype join, §2.9 when-chain categorization, EUR arithmetic,
# §2.10 conditional measures). All dims broadcast; single shuffle for the
# final group-by.
# ---------------------------------------------------------------------------

@register(
    "q04_flagship_sales_eur",
    """
    WITH fx AS (
      SELECT n_name AS from_currency, 1.0 + n_nationkey * 0.01 AS eur_rate
      FROM nation WHERE n_nationkey < 20
    ),
    doctype AS (SELECT * FROM (VALUES ('A','Invoice'), ('R','Adjustment')) AS t(code, group_col)),
    fact AS (
      SELECT l.l_extendedprice, l.l_discount,
             COALESCE(fx.eur_rate, 1.0) AS eur_rate, dt.group_col
      FROM lineitem l
      LEFT JOIN supplier s ON l.l_suppkey = s.s_suppkey
      LEFT JOIN nation n ON s.s_nationkey = n.n_nationkey
      LEFT JOIN fx ON n.n_name = fx.from_currency
      LEFT JOIN doctype dt ON l.l_returnflag = dt.code
    ),
    agg AS (
      SELECT CASE WHEN group_col = 'Invoice' THEN 'Sale'
                  WHEN group_col = 'Adjustment' THEN 'Adjustment'
                  WHEN group_col IS NULL THEN 'Unclassified'
                  ELSE group_col END AS document_category,
             CAST(CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * eur_rate AS DECIMAL(27,6))) AS VARCHAR) AS DOUBLE) AS sales_eur,
             CAST(CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * 0.8 * eur_rate AS DECIMAL(27,8))) AS VARCHAR) AS DOUBLE) AS cogs_eur,
             COUNT(*) AS line_count
      FROM fact GROUP BY 1
    )
    SELECT document_category, sales_eur, cogs_eur,
           sales_eur - cogs_eur AS gross_margin, line_count
    FROM agg
    """,
)
def q04_flagship_sales_eur(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = T(spark, sf_dir, "lineitem")
    s = T(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = T(spark, sf_dir, "nation")
    fx = n.filter(F.col("n_nationkey") < 20).select(
        F.col("n_name").alias("from_currency"),
        (F.lit(1.0) + F.col("n_nationkey") * F.lit(0.01)).alias("eur_rate"),
    )
    doctype = spark.createDataFrame([("A", "Invoice"), ("R", "Adjustment")], "code string, group_col string")
    fact = (
        l.join(F.broadcast(s), l["l_suppkey"] == s["s_suppkey"], "left")
        .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"], "left")
        .join(F.broadcast(fx), n["n_name"] == fx["from_currency"], "left")
        .join(F.broadcast(doctype), l["l_returnflag"] == F.col("code"), "left")
        .select(
            "l_extendedprice", "l_discount",
            F.coalesce("eur_rate", F.lit(1.0)).alias("eur_rate"),
            "group_col",
        )
    )
    sales = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount")) * F.col("eur_rate")
    cogs = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount")) * F.lit(0.8) * F.col("eur_rate")
    agg = (
        fact.withColumn("document_category", document_category("group_col"))
        .groupBy("document_category")
        .agg(dsum(sales, "sales_eur"), dsum(cogs, "cogs_eur", scale=8), F.count(F.lit(1)).alias("line_count"))
    )
    return agg.select(
        "document_category", "sales_eur", "cogs_eur",
        (F.col("sales_eur") - F.col("cogs_eur")).alias("gross_margin"),
        "line_count",
    )


# ---------------------------------------------------------------------------
# q05 — W1/W2 keep-latest dedup via window row_number (the silver dedup
# kernel), with pinned tie-breakers for determinism.
# ---------------------------------------------------------------------------

@register(
    "q05_dedup_latest_events",
    """
    SELECT user_id, event_type, event_id, ts, value
    FROM events
    QUALIFY row_number() OVER (PARTITION BY user_id, event_type ORDER BY ts DESC, event_id DESC) = 1
    """,
)
def q05_dedup_latest_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = T(spark, sf_dir, "events")
    deduped = dedup_latest(e, order_col="ts", keys=["user_id", "event_type"], tie_breakers=["event_id"])
    return deduped.select("user_id", "event_type", "event_id", "ts", "value")


# ---------------------------------------------------------------------------
# q06 — quarantine split (P5 disjunctive predicate + K4 side output).
# Horizon pinned for determinism; reason = first matching rule.
# ---------------------------------------------------------------------------

@register(
    "q06_quarantine_orders",
    """
    SELECT o_orderkey,
           CASE WHEN CAST(o_orderdate AS DATE) > DATE '2000-12-31' THEN 'future_date:o_orderdate'
                WHEN o_totalprice > 400000.0 OR o_totalprice < -10000000.0 THEN 'extreme_value:o_totalprice'
           END AS quarantine_reason,
           'orders' AS source_table
    FROM orders
    WHERE CAST(o_orderdate AS DATE) > DATE '2000-12-31'
       OR o_totalprice > 400000.0 OR o_totalprice < -10000000.0
    """,
)
def q06_quarantine_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = T(spark, sf_dir, "orders")
    _, quarantined = quarantine_split(
        o,
        source_table="orders",
        horizon="2000-12-31",
        value_max=400000.0,
        date_cols=["o_orderdate"],
        value_cols=["o_totalprice"],
    )
    return quarantined.select("o_orderkey", "quarantine_reason", "source_table")


# ---------------------------------------------------------------------------
# q07 — P7 membership-predicate null standardization + key normalization
# (upper/trim + null-token scrub), the silver string kernel.
# ---------------------------------------------------------------------------

@register(
    "q07_null_standardize",
    """
    SELECT event_id,
           CASE WHEN upper(trim(event_type)) IN ('', 'NULL', 'N/A', 'UNKNOWN', 'NONE', '#N/A')
                THEN NULL ELSE upper(trim(event_type)) END AS event_type_key
    FROM events
    """,
)
def q07_null_standardize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spaceparts_data_pipeline_spark.functions.scalars import standardize_key

    e = T(spark, sf_dir, "events")
    return e.select("event_id", standardize_key("event_type").alias("event_type_key"))


# ---------------------------------------------------------------------------
# q08 — S10 watermarked incremental scan with the reference's 1-hour
# late-arrival overlap. The predicate pushes down to the parquet scan.
# ---------------------------------------------------------------------------

_Q08_WM = "2024-01-20T00:00:00"

@register(
    "q08_watermark_scan",
    """
    SELECT event_id, ts, user_id, event_type, value
    FROM events
    WHERE ts > TIMESTAMP '2024-01-19 23:00:00'
    """,
)
def q08_watermark_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = T(spark, sf_dir, "events")
    return watermark_scan(e, "ts", _Q08_WM).select("event_id", "ts", "user_id", "event_type", "value")


# ---------------------------------------------------------------------------
# q09 — O2 top-1-by-timestamp (latest control row lookup).
# ---------------------------------------------------------------------------

@register(
    "q09_latest_control_row",
    "SELECT event_id, ts FROM events ORDER BY ts DESC, event_id DESC LIMIT 1",
)
def q09_latest_control_row(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = T(spark, sf_dir, "events")
    return e.orderBy(F.desc("ts"), F.desc("event_id")).select("event_id", "ts").limit(1)


# ---------------------------------------------------------------------------
# q10 — G2 global watermark extraction (max timestamp) + G1 count.
# ---------------------------------------------------------------------------

@register(
    "q10_watermark_max",
    "SELECT MAX(ts) AS last_watermark, COUNT(*) AS record_count FROM events",
)
def q10_watermark_max(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = T(spark, sf_dir, "events")
    return e.agg(F.max("ts").alias("last_watermark"), F.count(F.lit(1)).alias("record_count"))


# ---------------------------------------------------------------------------
# q11 — J8/G3 changed-key restriction: DISTINCT keys above watermark,
# applied as a left-semi join (the reference's incremental dim rebuild).
# ---------------------------------------------------------------------------

_Q11_WM = dt.datetime(2024, 1, 15)

@register(
    "q11_changed_keys_semi",
    """
    SELECT c_custkey, c_name FROM customer
    WHERE c_custkey IN (SELECT DISTINCT user_id FROM events WHERE ts >= TIMESTAMP '2024-01-15 00:00:00')
    """,
)
def q11_changed_keys_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = T(spark, sf_dir, "customer")
    e = T(spark, sf_dir, "events")
    changed = e.filter(F.col("ts") >= F.lit(_Q11_WM)).select(F.col("user_id")).distinct()
    return c.join(changed, c["c_custkey"] == changed["user_id"], "left_semi").select("c_custkey", "c_name")


# ---------------------------------------------------------------------------
# q12 — U1 silver-style upsert: union existing+incoming (with watermark
# overlap duplication) then keep-latest dedup.
# ---------------------------------------------------------------------------

@register(
    "q12_union_upsert",
    """
    WITH u AS (
      SELECT * FROM events WHERE ts < TIMESTAMP '2024-01-20 00:00:00'
      UNION ALL
      SELECT * FROM events WHERE ts >= TIMESTAMP '2024-01-19 23:00:00'
    )
    SELECT event_id, ts, user_id, event_type, value FROM u
    QUALIFY row_number() OVER (PARTITION BY event_id ORDER BY ts DESC, event_id DESC) = 1
    """,
)
def q12_union_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = T(spark, sf_dir, "events")
    cutoff = dt.datetime(2024, 1, 20)
    overlap_start = dt.datetime(2024, 1, 19, 23)
    existing = e.filter(F.col("ts") < F.lit(cutoff))
    incoming = e.filter(F.col("ts") >= F.lit(overlap_start))
    merged = upsert_union_dedup(existing, incoming, keys=["event_id"], order_col="ts", tie_breakers=["event_id"])
    return merged.select("event_id", "ts", "user_id", "event_type", "value")


# ---------------------------------------------------------------------------
# q13 — K3 MERGE upsert (update-existing + insert-new) emulated with a
# null-safe anti-join + union (the Parquet-only gold upsert).
# ---------------------------------------------------------------------------

@register(
    "q13_merge_upsert",
    """
    WITH src AS (
      SELECT user_id + 1400 AS c_custkey,
             CAST(CAST(SUM(CAST(value AS DECIMAL(27,6))) AS VARCHAR) AS DOUBLE) AS c_acctbal
      FROM events GROUP BY user_id
    )
    SELECT t.c_custkey, t.c_acctbal
    FROM customer t LEFT JOIN src s ON t.c_custkey = s.c_custkey
    WHERE s.c_custkey IS NULL
    UNION ALL
    SELECT c_custkey, c_acctbal FROM src
    """,
)
def q13_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = T(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    e = T(spark, sf_dir, "events")
    src = e.groupBy("user_id").agg(dsum("value", "c_acctbal")).select(
        (F.col("user_id") + 1400).alias("c_custkey"), "c_acctbal"
    )
    return merge_upsert(c, src, keys=["c_custkey"])


# ---------------------------------------------------------------------------
# q14 — calendar dimension generation (§2.10, M-dataflow semantics):
# distributed sequence+explode from the fact date bounds.
# ---------------------------------------------------------------------------

@register(
    "q14_calendar_dim",
    """
    WITH b AS (SELECT CAST(MIN(o_orderdate) AS DATE) AS mn, CAST(MAX(o_orderdate) AS DATE) AS mx FROM orders),
    d AS (SELECT CAST(unnest(generate_series(mn, mx, INTERVAL 1 DAY)) AS DATE) AS d FROM b)
    SELECT strftime(d, '%Y-%m-%d') AS cal_date,
           CAST(strftime(d, '%Y%m%d') AS INT) AS date_key,
           CAST(year(d) AS INT) AS year,
           CAST(quarter(d) AS INT) AS quarter,
           monthname(d) AS month_name
    FROM d
    """,
)
def q14_calendar_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = T(spark, sf_dir, "orders")
    cal = measures.calendar_dim(o.select(F.col("o_orderdate").alias("date")))
    return cal.select(
        F.date_format("date", "yyyy-MM-dd").alias("cal_date"),
        "date_key", "year", "quarter", "month_name",
    )


# ---------------------------------------------------------------------------
# q15 — G5/G6 profiling aggregates: counts, distinct, min/max, avg length.
# ---------------------------------------------------------------------------

@register(
    "q15_profile_customer",
    """
    SELECT COUNT(*) AS rows_total,
           COUNT(c_name) AS name_non_null,
           COUNT(DISTINCT c_mktsegment) AS segment_distinct,
           MIN(c_acctbal) AS min_acctbal,
           MAX(c_acctbal) AS max_acctbal,
           CAST(CAST(SUM(CAST(length(c_name) AS DECIMAL(27,6))) AS VARCHAR) AS DOUBLE) / COUNT(*) AS avg_name_len
    FROM customer
    """,
)
def q15_profile_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = T(spark, sf_dir, "customer")
    return c.agg(
        F.count(F.lit(1)).alias("rows_total"),
        F.count("c_name").alias("name_non_null"),
        F.count_distinct("c_mktsegment").alias("segment_distinct"),
        F.min("c_acctbal").alias("min_acctbal"),
        F.max("c_acctbal").alias("max_acctbal"),
        davg(F.length("c_name"), "avg_name_len"),
    )


# ---------------------------------------------------------------------------
# q16 — §2.10 cross-fact budget variance + null-safe achievement %:
# aggregate each fact first, then full-outer join the small aggregates.
# ---------------------------------------------------------------------------

@register(
    "q16_budget_variance_monthly",
    """
    WITH s AS (
      SELECT strftime(l_shipdate, '%Y-%m') AS year_month,
             CAST(CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,6))) AS VARCHAR) AS DOUBLE) AS sales_total
      FROM lineitem GROUP BY 1
    ),
    b AS (
      SELECT strftime(o_orderdate, '%Y-%m') AS year_month,
             CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(27,6))) AS VARCHAR) AS DOUBLE) AS budget_total
      FROM orders GROUP BY 1
    )
    SELECT COALESCE(s.year_month, b.year_month) AS year_month,
           COALESCE(s.sales_total, 0.0) AS sales_total,
           COALESCE(b.budget_total, 0.0) AS budget_total,
           COALESCE(s.sales_total, 0.0) - COALESCE(b.budget_total, 0.0) AS budget_variance,
           (CASE WHEN b.budget_total IS NULL OR b.budget_total = 0 THEN 0.0
                 ELSE s.sales_total / b.budget_total END) * 100 AS achievement_pct
    FROM s FULL OUTER JOIN b ON s.year_month = b.year_month
    """,
)
def q16_budget_variance_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = T(spark, sf_dir, "lineitem")
    o = T(spark, sf_dir, "orders")
    sales = l.select(
        F.date_format("l_shipdate", "yyyy-MM").alias("year_month"),
        (F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))).alias("sales_eur"),
    )
    budget = o.select(
        F.date_format("o_orderdate", "yyyy-MM").alias("year_month"),
        F.col("o_totalprice").alias("budget_eur"),
    )
    out = measures.budget_variance(sales, budget, keys=["year_month"])
    return out.select(
        "year_month", "sales_total", "budget_total", "budget_variance", "achievement_pct"
    )


# ---------------------------------------------------------------------------
# q17 — §2.10 OTD / date-inversion quality metric (ship < order).
# ---------------------------------------------------------------------------

@register(
    "q17_otd_quality",
    """
    SELECT COUNT(*) AS total_rows,
           CAST(SUM(CASE WHEN l.l_shipdate < o.o_orderdate THEN 1 ELSE 0 END) AS BIGINT) AS inverted_date_rows,
           CAST(CAST(SUM(CASE WHEN l.l_shipdate < o.o_orderdate THEN 1 ELSE 0 END) AS BIGINT) AS DOUBLE) / COUNT(*) AS inverted_share
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    """,
)
def q17_otd_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = T(spark, sf_dir, "lineitem")
    o = T(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    joined = l.join(o, l["l_orderkey"] == o["o_orderkey"])
    return measures.otd_metrics(joined, "l_shipdate", "o_orderdate")


# ---------------------------------------------------------------------------
# q19 — G5 distinct-ratio profiling (exact count_distinct / count).
# ---------------------------------------------------------------------------

@register(
    "q19_distinct_ratio",
    """
    SELECT CAST(COUNT(DISTINCT o_orderstatus) AS DOUBLE) / COUNT(*) AS status_ratio,
           CAST(COUNT(DISTINCT o_orderpriority) AS DOUBLE) / COUNT(*) AS priority_ratio,
           CAST(COUNT(DISTINCT o_custkey) AS DOUBLE) / COUNT(*) AS custkey_ratio
    FROM orders
    """,
)
def q19_distinct_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = T(spark, sf_dir, "orders")
    n = F.count(F.lit(1))
    return o.agg(
        (F.count_distinct("o_orderstatus").cast("double") / n).alias("status_ratio"),
        (F.count_distinct("o_orderpriority").cast("double") / n).alias("priority_ratio"),
        (F.count_distinct("o_custkey").cast("double") / n).alias("custkey_ratio"),
    )


# ---------------------------------------------------------------------------
# q20 — U2 date-domain union (calendar source domain).
# ---------------------------------------------------------------------------

@register(
    "q20_date_domain_union",
    """
    SELECT strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS d FROM orders
    UNION
    SELECT strftime(CAST(l_shipdate AS DATE), '%Y-%m-%d') AS d FROM lineitem
    """,
)
def q20_date_domain_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = T(spark, sf_dir, "orders").select(F.date_format("o_orderdate", "yyyy-MM-dd").alias("d"))
    l = T(spark, sf_dir, "lineitem").select(F.date_format("l_shipdate", "yyyy-MM-dd").alias("d"))
    return o.union(l).distinct()


# ---------------------------------------------------------------------------
# q21 — S7/O3 deterministic sample scan (ordered limit).
# ---------------------------------------------------------------------------

@register(
    "q21_sample_scan",
    "SELECT * FROM orders ORDER BY o_orderkey LIMIT 5",
)
def q21_sample_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    return T(spark, sf_dir, "orders").orderBy("o_orderkey").limit(5)


# ---------------------------------------------------------------------------
# q22 — J4 product-brand enrichment with a derived brand dim (broadcast).
# ---------------------------------------------------------------------------

@register(
    "q22_dim_product_enrich",
    """
    WITH b AS (SELECT p_brand, COUNT(*) AS brand_part_count FROM part GROUP BY p_brand)
    SELECT p.p_partkey, p.p_name, p.p_brand, p.p_retailprice, b.brand_part_count
    FROM part p LEFT JOIN b ON p.p_brand = b.p_brand
    """,
)
def q22_dim_product_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = T(spark, sf_dir, "part")
    b = p.groupBy("p_brand").agg(F.count(F.lit(1)).alias("brand_part_count"))
    return (
        p.join(F.broadcast(b), "p_brand", "left")
        .select("p_partkey", "p_name", "p_brand", "p_retailprice", "brand_part_count")
    )


# ---------------------------------------------------------------------------
# q18 — §2.10 DAX-style global measures: Sales Only (conditional agg),
# Total COGS, Gross Margin, Achievement % vs a cross-fact budget total.
# ---------------------------------------------------------------------------

@register(
    "q18_sales_measures",
    """
    WITH s AS (
      SELECT
        CAST(CAST(SUM(CAST(CASE WHEN l_returnflag = 'A' THEN l_extendedprice * (1 - l_discount) END AS DECIMAL(27,6))) AS VARCHAR) AS DOUBLE) AS sales_only,
        CAST(CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * 0.8 AS DECIMAL(27,8))) AS VARCHAR) AS DOUBLE) AS total_cogs
      FROM lineitem
    ),
    b AS (SELECT CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(27,6))) AS VARCHAR) AS DOUBLE) AS total_budget FROM orders)
    SELECT sales_only, total_cogs,
           sales_only - total_cogs AS gross_margin,
           (CASE WHEN total_budget IS NULL OR total_budget = 0 THEN 0.0
                 ELSE sales_only / total_budget END) * 100 AS achievement_pct
    FROM s, b
    """,
)
def q18_sales_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = T(spark, sf_dir, "lineitem")
    o = T(spark, sf_dir, "orders")
    rev = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
    s = l.agg(
        F.sum(F.when(F.col("l_returnflag") == "A", rev).cast("decimal(27,6)"))
        .cast("double").alias("sales_only"),
        dsum(rev * F.lit(0.8), "total_cogs", scale=8),
    )
    b = o.agg(dsum("o_totalprice", "total_budget"))
    return s.crossJoin(b).select(
        "sales_only", "total_cogs",
        (F.col("sales_only") - F.col("total_cogs")).alias("gross_margin"),
        (safe_divide(F.col("sales_only"), F.col("total_budget")) * 100).alias("achievement_pct"),
    )


# ---------------------------------------------------------------------------
# q23 — keep-latest dedup as a combinable max_by aggregation (the
# shuffle-light W1/W2 for 100 TB facts): same semantics as q05.
# ---------------------------------------------------------------------------

@register(
    "q23_dedup_latest_agg",
    """
    SELECT user_id, event_type, event_id, ts, value
    FROM events
    QUALIFY row_number() OVER (PARTITION BY user_id, event_type ORDER BY ts DESC, event_id DESC) = 1
    """,
)
def q23_dedup_latest_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spaceparts_data_pipeline_spark.operators.partitioning import dedup_latest_agg

    e = T(spark, sf_dir, "events").select("user_id", "event_type", "event_id", "ts", "value")
    out = dedup_latest_agg(e, order_col="ts", keys=["user_id", "event_type"], tie_breakers=["event_id"])
    return out.select("user_id", "event_type", "event_id", "ts", "value")


# ---------------------------------------------------------------------------
# x01 — sessionization (gap-based): lag + cumulative-sum session ids, the
# standard event-pipeline analytic (extension beyond the reference).
# ---------------------------------------------------------------------------

@register(
    "x01_event_sessions",
    """
    WITH l AS (
      SELECT user_id, event_id, ts,
             lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
      FROM events
    ),
    f AS (
      SELECT *, CASE WHEN prev_ts IS NULL OR ts - prev_ts > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_sess
      FROM l
    ),
    s AS (
      SELECT *, SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS session_seq
      FROM f
    )
    SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
           COUNT(*) AS n_events, MIN(ts) AS session_start, MAX(ts) AS session_end
    FROM s GROUP BY user_id, session_seq
    """,
)
def x01_event_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = T(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = 30 * 60 * 1_000_000
    ntz = is_ntz(e, "ts")
    with_prev = e.withColumn("prev_ts", F.lag("ts").over(w))
    flagged = with_prev.withColumn(
        "new_sess",
        F.when(
            F.col("prev_ts").isNull()
            | ((epoch_micros("ts", ntz=ntz) - epoch_micros("prev_ts", ntz=ntz)) > gap_us),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    sess = flagged.withColumn(
        "session_seq", F.sum("new_sess").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return sess.groupBy("user_id", "session_seq").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
    )


# ---------------------------------------------------------------------------
# x02 — rolling-window analytics (rows frame + lag), per-user over events.
# ---------------------------------------------------------------------------

@register(
    "x02_rolling_events",
    """
    SELECT event_id, user_id, ts,
           CAST(SUM(CAST(value AS DECIMAL(27,6))) OVER
                (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS DOUBLE) AS rolling_value,
           CAST(COUNT(*) OVER
                (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS BIGINT) AS rolling_n,
           lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_event_type
    FROM events
    """,
)
def x02_rolling_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = T(spark, sf_dir, "events")
    order = Window.partitionBy("user_id").orderBy("ts", "event_id")
    frame = order.rowsBetween(-3, 0)
    return e.select(
        "event_id", "user_id", "ts",
        F.sum(F.col("value").cast("decimal(27,6)")).over(frame).cast("double").alias("rolling_value"),
        F.count(F.lit(1)).over(frame).alias("rolling_n"),
        F.lag("event_type").over(order).alias("prev_event_type"),
    )


# ---------------------------------------------------------------------------
# x03 — hierarchical ROLLUP aggregation (subtotals + grand total).
# ---------------------------------------------------------------------------

@register(
    "x03_rollup_revenue",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,6))) AS VARCHAR) AS DOUBLE) AS revenue,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def x03_rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = T(spark, sf_dir, "lineitem")
    rev = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
    return l.rollup("l_returnflag", "l_linestatus").agg(
        dsum(rev, "revenue"), F.count(F.lit(1)).alias("n")
    )


# ---------------------------------------------------------------------------
# x04 — top-k per group (rank window): the standard "best N orders per
# customer" analytic.
# ---------------------------------------------------------------------------

@register(
    "x04_topk_per_group",
    """
    SELECT o_custkey, o_orderkey, o_totalprice, CAST(rnk AS INT) AS price_rank
    FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rnk
      FROM orders
    ) WHERE rnk <= 2
    """,
)
def x04_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = T(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        o.withColumn("price_rank", F.row_number().over(w))
        .filter(F.col("price_rank") <= 2)
        .select("o_custkey", "o_orderkey", "o_totalprice", "price_rank")
    )


# ---------------------------------------------------------------------------
# x08 — pivot (conditional-aggregation spread): revenue by status × flag.
# ---------------------------------------------------------------------------

@register(
    "x08_pivot_revenue",
    """
    SELECT l_linestatus,
           CAST(CAST(SUM(CAST(CASE WHEN l_returnflag = 'A' THEN l_extendedprice * (1 - l_discount) END AS DECIMAL(27,6))) AS VARCHAR) AS DOUBLE) AS A,
           CAST(CAST(SUM(CAST(CASE WHEN l_returnflag = 'N' THEN l_extendedprice * (1 - l_discount) END AS DECIMAL(27,6))) AS VARCHAR) AS DOUBLE) AS N,
           CAST(CAST(SUM(CAST(CASE WHEN l_returnflag = 'R' THEN l_extendedprice * (1 - l_discount) END AS DECIMAL(27,6))) AS VARCHAR) AS DOUBLE) AS R
    FROM lineitem GROUP BY l_linestatus
    """,
)
def x08_pivot_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = T(spark, sf_dir, "lineitem")
    rev = (F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))).cast("decimal(27,6)")
    return (
        l.groupBy("l_linestatus")
        .pivot("l_returnflag", ["A", "N", "R"])
        .agg(F.sum(rev).cast("double"))
    )


# ---------------------------------------------------------------------------
# x09 — histogram binning (fixed-width buckets over a numeric column).
# ---------------------------------------------------------------------------

@register(
    "x09_price_histogram",
    """
    SELECT CAST(floor(o_totalprice / 50000.0) AS BIGINT) AS bucket,
           CAST(floor(o_totalprice / 50000.0) AS BIGINT) * 50000.0 AS bucket_low,
           COUNT(*) AS n,
           CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(27,6))) AS VARCHAR) AS DOUBLE) AS total
    FROM orders GROUP BY 1, 2
    """,
)
def x09_price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = T(spark, sf_dir, "orders")
    bucket = F.floor(F.col("o_totalprice") / F.lit(50000.0)).cast("bigint")
    return (
        o.groupBy(bucket.alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"), dsum("o_totalprice", "total"))
        .select("bucket", (F.col("bucket") * 50000.0).alias("bucket_low"), "n", "total")
    )


# ---------------------------------------------------------------------------
# q24 — anti-join: customers with no orders (the complement of J8's semi).
# ---------------------------------------------------------------------------

@register(
    "q24_customers_without_orders",
    """
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey
        AND o.o_orderdate >= TIMESTAMP '2001-01-01 00:00:00'
    )
    """,
)
def q24_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = T(spark, sf_dir, "customer")
    recent = T(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit(dt.datetime(2001, 1, 1))
    )
    return c.join(recent, c["c_custkey"] == recent["o_custkey"], "left_anti").select("c_custkey", "c_name")


# ---------------------------------------------------------------------------
# x10 — set operations: INTERSECT / EXCEPT over key domains.
# ---------------------------------------------------------------------------

@register(
    "x10_key_set_ops",
    """
    WITH oc AS (SELECT DISTINCT o_custkey AS k FROM orders),
    ec AS (SELECT DISTINCT user_id AS k FROM events)
    SELECT 'both' AS which, k FROM (SELECT k FROM oc INTERSECT SELECT k FROM ec)
    UNION ALL
    SELECT 'orders_only' AS which, k FROM (SELECT k FROM oc EXCEPT SELECT k FROM ec)
    """,
)
def x10_key_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    oc = T(spark, sf_dir, "orders").select(F.col("o_custkey").alias("k")).distinct()
    ec = T(spark, sf_dir, "events").select(F.col("user_id").alias("k")).distinct()
    both = oc.intersect(ec).select(F.lit("both").alias("which"), "k")
    only = oc.exceptAll(ec).select(F.lit("orders_only").alias("which"), "k")
    return both.unionByName(only)


# ---------------------------------------------------------------------------
# x11 — CUBE aggregation (all grouping-set combinations).
# ---------------------------------------------------------------------------

@register(
    "x11_cube_counts",
    """
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
    FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def x11_cube_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = T(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(F.count(F.lit(1)).alias("n"))


# ---------------------------------------------------------------------------
# x12 — exact percentiles (interpolated median / p95 per group).
# ---------------------------------------------------------------------------

@register(
    "x12_price_percentiles",
    """
    SELECT o_orderpriority,
           round(quantile_cont(o_totalprice, 0.5), 4) AS median_price,
           round(quantile_cont(o_totalprice, 0.95), 4) AS p95_price,
           COUNT(*) AS n
    FROM orders GROUP BY o_orderpriority
    """,
)
def x12_price_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = T(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.round(F.percentile("o_totalprice", F.lit(0.5)), 4).alias("median_price"),
        F.round(F.percentile("o_totalprice", F.lit(0.95)), 4).alias("p95_price"),
        F.count(F.lit(1)).alias("n"),
    )


# ---------------------------------------------------------------------------
# x13 — distribution moments from exact sums (order-independent variance/
# stddev: sqrt((Σx² − (Σx)²/n)/(n−1)) over decimal sums — deterministic
# under any partitioning, unlike built-in stddev which folds doubles).
# ---------------------------------------------------------------------------

@register(
    "x13_stats_moments",
    """
    WITH s AS (
      SELECT l_returnflag,
             CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(27,6))) AS VARCHAR) AS DOUBLE) AS sx,
             CAST(CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(27,6))) AS VARCHAR) AS DOUBLE) AS sxx,
             COUNT(*) AS n
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, n,
           sx / n AS mean_qty,
           round(sqrt((sxx - sx * sx / n) / (n - 1)), 6) AS stddev_qty
    FROM s
    """,
)
def x13_stats_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = T(spark, sf_dir, "lineitem")
    s = l.groupBy("l_returnflag").agg(
        dsum("l_quantity", "sx"),
        dsum(F.col("l_quantity") * F.col("l_quantity"), "sxx"),
        F.count(F.lit(1)).alias("n"),
    )
    return s.select(
        "l_returnflag", "n",
        (F.col("sx") / F.col("n")).alias("mean_qty"),
        F.round(F.sqrt((F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n")) / (F.col("n") - 1)), 6).alias("stddev_qty"),
    )


# ---------------------------------------------------------------------------
# x14 — event-time RANGE frame: per-user rolling 1-hour window (range by
# epoch seconds, not row count) — late-arrival-robust rolling metrics.
# ---------------------------------------------------------------------------

@register(
    "x14_range_window",
    """
    SELECT event_id, user_id, ts,
           CAST(COUNT(*) OVER (PARTITION BY user_id ORDER BY epoch(ts)
                RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW) AS BIGINT) AS events_last_hour,
           CAST(SUM(CAST(value AS DECIMAL(27,6))) OVER (PARTITION BY user_id ORDER BY epoch(ts)
                RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW) AS DOUBLE) AS value_last_hour
    FROM events
    """,
)
def x14_range_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = T(spark, sf_dir, "events")
    # DuckDB's epoch(ts) yields fractional seconds; mirror it exactly so
    # the RANGE frame boundaries agree on sub-second timestamps.
    sec = epoch_micros("ts", ntz=is_ntz(e, "ts")) / F.lit(1_000_000.0)
    w = Window.partitionBy("user_id").orderBy(sec.alias("__sec")).rangeBetween(-3600, 0)
    return e.select(
        "event_id", "user_id", "ts",
        F.count(F.lit(1)).over(w).alias("events_last_hour"),
        F.sum(F.col("value").cast("decimal(27,6)")).over(w).cast("double").alias("value_last_hour"),
    )


# ---------------------------------------------------------------------------
# x15 — JSON extraction from the events.props payload column.
# ---------------------------------------------------------------------------

@register(
    "x15_json_extract",
    """
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS BIGINT) AS k_value,
           CAST(json_extract(props, '$.k') AS BIGINT) % 10 AS k_bucket
    FROM events
    """,
)
def x15_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = T(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return e.select("event_id", k.alias("k_value"), (k % 10).alias("k_bucket"))


# ---------------------------------------------------------------------------
# x16 — scalar string kit: case, pad, substring, replace, LIKE, length,
# conditional NULLIF/GREATEST — the §2.9 string-family surface widened.
# ---------------------------------------------------------------------------

@register(
    "x16_string_kit",
    """
    SELECT c_custkey,
           upper(c_name) AS name_upper,
           substring(c_name, 1, 8) AS name_prefix,
           lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS padded_key,
           replace(c_mktsegment, 'MACHINERY', 'MACH') AS segment_short,
           length(c_name) AS name_len,
           c_name LIKE '%1%' AS has_one,
           nullif(c_mktsegment, 'BUILDING') AS segment_or_null,
           greatest(c_acctbal, 0.0) AS nonneg_bal
    FROM customer
    """,
)
def x16_string_kit(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = T(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("name_upper"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.lpad(F.col("c_custkey").cast("string"), 10, "0").alias("padded_key"),
        F.replace(F.col("c_mktsegment"), F.lit("MACHINERY"), F.lit("MACH")).alias("segment_short"),
        F.length("c_name").alias("name_len"),
        F.col("c_name").like("%1%").alias("has_one"),
        F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")).alias("segment_or_null"),
        F.greatest(F.col("c_acctbal"), F.lit(0.0)).alias("nonneg_bal"),
    )


# ---------------------------------------------------------------------------
# x17 — date/time part extraction + truncation + day arithmetic.
# ---------------------------------------------------------------------------

@register(
    "x17_date_parts",
    """
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INT) AS y,
           CAST(month(o_orderdate) AS INT) AS m,
           CAST(day(o_orderdate) AS INT) AS d,
           CAST(dayofweek(o_orderdate) AS INT) AS dow_sun0,
           strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
           CAST(date_diff('day', o_orderdate, TIMESTAMP '2002-01-01 00:00:00') AS INT) AS days_to_2002
    FROM orders
    """,
)
def x17_date_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = T(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("y"),
        F.month("o_orderdate").alias("m"),
        F.dayofmonth("o_orderdate").alias("d"),
        (F.dayofweek("o_orderdate") - 1).alias("dow_sun0"),  # Spark 1=Sun; DuckDB dow 0=Sun
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias("month_start"),
        F.datediff(F.lit(dt.datetime(2002, 1, 1)).cast("date"), F.col("o_orderdate").cast("date")).alias("days_to_2002"),
    )


# ---------------------------------------------------------------------------
# x18 — approximate quantiles (the sketch-based scale path for x12). Sketch
# values are engine-specific, so the oracle checks the *containment
# properties* instead: exact per-group n, approx-median ∈ [min, max], and
# HLL distinct within ±30% of the exact count (default rsd is 5%, so 30%
# is a safe deterministic envelope). The DuckDB twin emits the same
# booleans as TRUE — an out-of-bounds sketch flips the value hash.
# ---------------------------------------------------------------------------

@register(
    "x18_approx_quantiles",
    """
    SELECT o_orderpriority, COUNT(*) AS n,
           TRUE AS median_in_bounds, TRUE AS distinct_in_bounds
    FROM orders GROUP BY o_orderpriority
    """,
)
def x18_approx_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = T(spark, sf_dir, "orders")
    agg = o.groupBy("o_orderpriority").agg(
        F.percentile_approx("o_totalprice", F.lit(0.5), F.lit(10000)).alias("__med"),
        F.approx_count_distinct("o_custkey").alias("__cd"),
        F.count(F.lit(1)).alias("n"),
        F.min("o_totalprice").alias("__mn"),
        F.max("o_totalprice").alias("__mx"),
        F.count_distinct("o_custkey").alias("__d"),
    )
    return agg.select(
        "o_orderpriority", "n",
        ((F.col("__med") >= F.col("__mn")) & (F.col("__med") <= F.col("__mx"))).alias("median_in_bounds"),
        (F.abs(F.col("__cd") - F.col("__d")) <= F.col("__d") * 0.3).alias("distinct_in_bounds"),
    )


# ---------------------------------------------------------------------------
# x20 — HAVING: post-aggregation filtering (customers with ≥12 orders).
# ---------------------------------------------------------------------------

@register(
    "x20_having_filter",
    """
    SELECT o_custkey, COUNT(*) AS n_orders,
           CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(27,6))) AS VARCHAR) AS DOUBLE) AS total_spend
    FROM orders GROUP BY o_custkey HAVING COUNT(*) >= 12
    """,
)
def x20_having_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = T(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_orders"), dsum("o_totalprice", "total_spend"))
        .filter(F.col("n_orders") >= 12)
    )


# ---------------------------------------------------------------------------
# x21 — ranking-function family: rank, dense_rank, lead, first_value over
# a deterministic per-group order.
# ---------------------------------------------------------------------------

@register(
    "x21_ranking_functions",
    """
    SELECT o_custkey, o_orderkey,
           CAST(rank() OVER w AS INT) AS price_rank,
           CAST(dense_rank() OVER (PARTITION BY o_custkey ORDER BY o_orderpriority) AS INT) AS priority_dense_rank,
           lead(o_orderkey) OVER w AS next_orderkey,
           first_value(o_orderkey) OVER w AS top_orderkey
    FROM orders
    WHERE o_custkey < 100
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
    """,
)
def x21_ranking_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = T(spark, sf_dir, "orders").filter(F.col("o_custkey") < 100)
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    wp = Window.partitionBy("o_custkey").orderBy("o_orderpriority")
    return o.select(
        "o_custkey", "o_orderkey",
        F.rank().over(w).alias("price_rank"),
        F.dense_rank().over(wp).alias("priority_dense_rank"),
        F.lead("o_orderkey").over(w).alias("next_orderkey"),
        F.first_value("o_orderkey").over(w).alias("top_orderkey"),
    )


# ---------------------------------------------------------------------------
# x22 — scalar-subquery predicate: orders above the (exact) global mean.
# ---------------------------------------------------------------------------

@register(
    "x22_above_average_orders",
    """
    SELECT o_orderkey, o_totalprice FROM orders
    WHERE o_totalprice > (
      SELECT CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(27,6))) AS VARCHAR) AS DOUBLE) / COUNT(*) FROM orders
    )
    """,
)
def x22_above_average_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = T(spark, sf_dir, "orders")
    avg_df = o.agg(davg("o_totalprice", "__avg"))
    return (
        o.join(F.broadcast(avg_df))
        .filter(F.col("o_totalprice") > F.col("__avg"))
        .select("o_orderkey", "o_totalprice")
    )


# ---------------------------------------------------------------------------
# x24 — unpivot (wide→long): per-order metrics as (metric, value) rows.
# ---------------------------------------------------------------------------

@register(
    "x24_unpivot_metrics",
    """
    SELECT o_orderkey, 'totalprice' AS metric, o_totalprice AS value FROM orders WHERE o_orderkey < 1000
    UNION ALL
    SELECT o_orderkey, 'custkey' AS metric, CAST(o_custkey AS DOUBLE) AS value FROM orders WHERE o_orderkey < 1000
    """,
)
def x24_unpivot_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = T(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 1000)
    return o.select(
        "o_orderkey",
        F.expr(
            "stack(2, 'totalprice', o_totalprice, 'custkey', cast(o_custkey as double))"
        ).alias("metric", "value"),
    )


# ---------------------------------------------------------------------------
# x27 — as-of join (backward inclusive): each even-id event gets the value
# of the latest odd-id event at-or-before it for the same user. Spark has
# no ASOF operator; operators/temporal.py composes it as union + ordered
# running window (one shuffle). DuckDB expresses it natively.
# ---------------------------------------------------------------------------

@register(
    "x27_asof_join",
    """
    WITH t AS (SELECT event_id, user_id, ts FROM events WHERE event_id % 2 = 0),
    q AS (SELECT user_id, ts, MAX(value) AS value
          FROM events WHERE event_id % 2 = 1 GROUP BY 1, 2)
    SELECT t.event_id, t.user_id, t.ts, q.value AS last_quote_value
    FROM t ASOF LEFT JOIN q ON t.user_id = q.user_id AND t.ts >= q.ts
    """,
)
def x27_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spaceparts_data_pipeline_spark.operators.temporal import asof_join

    e = T(spark, sf_dir, "events")
    trades = e.filter(F.col("event_id") % 2 == 0).select("event_id", "user_id", "ts")
    quotes = e.filter(F.col("event_id") % 2 == 1).select("user_id", "ts", "value")
    out = asof_join(trades, quotes, on=["user_id"], left_ts="ts",
                    right_ts="ts", value_cols=["value"])
    return out.withColumnRenamed("value", "last_quote_value")


# ---------------------------------------------------------------------------
# x28 — bounded range self-join: same-user event pairs within 30 minutes,
# as an equi hash join on gap-width buckets (each pair matches exactly
# once via the (bucket, bucket-1) probe) — never an all-pairs product.
# ---------------------------------------------------------------------------

@register(
    "x28_range_pairs",
    """
    SELECT a.user_id, a.event_id AS id_a, b.event_id AS id_b,
           epoch_us(b.ts) - epoch_us(a.ts) AS gap_us
    FROM events a JOIN events b ON a.user_id = b.user_id
    WHERE epoch_us(b.ts) - epoch_us(a.ts) BETWEEN 0 AND 1800000000
      AND (a.ts < b.ts OR (a.ts = b.ts AND a.event_id < b.event_id))
    """,
)
def x28_range_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spaceparts_data_pipeline_spark.operators.temporal import range_pairs

    e = T(spark, sf_dir, "events")
    return range_pairs(e, key="user_id", ts="ts", id_col="event_id",
                       max_gap_seconds=1800)


# ---------------------------------------------------------------------------
# p01 — composite silver slice: standardize → keep-latest dedup → watermark
# filter, the reference's silver pipeline shape end-to-end on events.
# ---------------------------------------------------------------------------

@register(
    "p01_silver_events_pipeline",
    """
    WITH std AS (
      SELECT event_id, ts, user_id,
             CASE WHEN upper(trim(event_type)) IN ('', 'NULL', 'N/A', 'UNKNOWN', 'NONE', '#N/A')
                  THEN NULL ELSE trim(event_type) END AS event_type,
             CASE WHEN isnan(value) OR isinf(value) THEN NULL ELSE value END AS value
      FROM events
    ),
    ded AS (
      SELECT * FROM std
      QUALIFY row_number() OVER (PARTITION BY user_id, event_type ORDER BY ts DESC, event_id DESC) = 1
    )
    SELECT event_id, ts, user_id, event_type, value FROM ded
    WHERE ts > TIMESTAMP '2024-01-09 23:00:00'
    """,
)
def p01_silver_events_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = T(spark, sf_dir, "events").select("event_id", "ts", "user_id", "event_type", "value")
    std = standardize_types(e)
    ded = dedup_latest(std, order_col="ts", keys=["user_id", "event_type"], tie_breakers=["event_id"])
    out = watermark_scan(ded, "ts", "2024-01-10T00:00:00")
    return out.select("event_id", "ts", "user_id", "event_type", "value")


# ---------------------------------------------------------------------------
# x18b — EXACT quantiles twin of x18: F.percentile (linear-interpolated,
# deterministic) vs DuckDB quantile_cont — the same interpolation
# formula on the same doubles, so unlike the sketch-based x18 this one
# carries a FULL value-hash oracle (6dp-rounded at the boundary, the
# engine convention for derived doubles). Keeps x18's weak-evidence
# exclusion honest: the quantile FAMILY now has a full-oracle driver
# row, and only the sketch variants stay property-checked.
# ---------------------------------------------------------------------------

@register(
    "x18b_exact_quantiles",
    """
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_custs,
           round(quantile_cont(o_totalprice, 0.25), 6) AS p25,
           round(quantile_cont(o_totalprice, 0.50), 6) AS p50,
           round(quantile_cont(o_totalprice, 0.75), 6) AS p75
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def x18b_exact_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = T(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.count_distinct("o_custkey").alias("n_custs"),
        F.round(F.percentile("o_totalprice", F.lit(0.25)), 6).alias("p25"),
        F.round(F.percentile("o_totalprice", F.lit(0.50)), 6).alias("p50"),
        F.round(F.percentile("o_totalprice", F.lit(0.75)), 6).alias("p75"),
    )


# ---------------------------------------------------------------------------
# q25 — SCD Type-2 dimension history from the events change feed: per
# user, consecutive same-event_type rows collapse into one version with
# valid_from/valid_to/is_current/version. The warehouse-history
# companion of the keep-latest upserts (K3/W1 territory, beyond the
# reference's keep-latest-only story).
# ---------------------------------------------------------------------------

@register(
    "q25_scd2_history",
    """
    WITH l AS (
      SELECT user_id, event_type, ts, event_id,
             lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_et,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      FROM events
    ),
    chg AS (
      SELECT user_id, event_type, ts, event_id FROM l
      WHERE rn = 1 OR prev_et IS DISTINCT FROM event_type
    )
    SELECT user_id, event_type,
           ts AS valid_from,
           lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to,
           lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL AS is_current,
           CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS INT) AS version
    FROM chg
    """,
)
def q25_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spaceparts_data_pipeline_spark.operators.merge import scd2_history

    e = T(spark, sf_dir, "events").select("user_id", "event_type", "ts", "event_id")
    return scd2_history(e, keys=["user_id"], order_col="ts",
                        tracked=["event_type"], tie_breakers=["event_id"])


# ---------------------------------------------------------------------------
# q25b — INCREMENTAL SCD2 (the production path): build history from the
# first half of the event feed, then APPLY the second half as a change
# batch — touched keys only; closed versions pass through; the open
# version collapses or closes; numbering continues; fresh keys start at
# 1. The oracle is q25's single-pass SQL over the FULL feed: under the
# watermark contract the incremental result must be row-identical to
# the rebuild (the d26 two-round-oracle pattern for warehouse history).
# ---------------------------------------------------------------------------

_SCD2_SPLIT = "2024-01-16 00:00:00"

@register(
    "q25b_scd2_apply",
    """
    WITH l AS (
      SELECT user_id, event_type, ts, event_id,
             lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_et,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      FROM events
    ),
    chg AS (
      SELECT user_id, event_type, ts, event_id FROM l
      WHERE rn = 1 OR prev_et IS DISTINCT FROM event_type
    )
    SELECT user_id, event_type,
           ts AS valid_from,
           lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to,
           lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL AS is_current,
           CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS INT) AS version
    FROM chg
    """,
)
def q25b_scd2_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spaceparts_data_pipeline_spark.operators.merge import scd2_apply, scd2_history

    e = T(spark, sf_dir, "events").select("user_id", "event_type", "ts", "event_id")
    cut = F.lit(_SCD2_SPLIT).cast(e.schema["ts"].dataType)
    h1 = scd2_history(e.filter(F.col("ts") < cut), keys=["user_id"],
                      order_col="ts", tracked=["event_type"], tie_breakers=["event_id"])
    return scd2_apply(h1, e.filter(F.col("ts") >= cut), keys=["user_id"],
                      order_col="ts", tracked=["event_type"], tie_breakers=["event_id"])
