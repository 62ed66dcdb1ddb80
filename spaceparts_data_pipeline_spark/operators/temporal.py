"""Temporal joins Spark has no native operator for, composed from
shuffle-friendly primitives (SURVEY.md §2.4 has no as-of/range join in
the reference either — these are the training-data/timeseries
extensions the engine adds).

- :func:`asof_join` — "latest right row at or before each left row" per
  key, via the union + ordered-window trick: ONE shuffle on (key), no
  per-row probing, no nested-loop join. The right side's attributes
  ride forward on a ``last(ignorenulls)`` running window.
- :func:`range_pairs` — all same-key row pairs within a bounded time
  gap, via gap-sized bucketing: each right row probes its own and the
  previous bucket, so the join is a plain equi hash join on
  (key, bucket) and the exact predicate filters inside the bucket.
  Cost is Σ bucket² per key — never the all-pairs product, and never
  a BroadcastNestedLoopJoin (asserted in tests/test_plan_shape.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.scalars import epoch_micros, is_ntz


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
) -> DataFrame:
    """Backward inclusive as-of join: for every left row, attach
    ``value_cols`` from the latest right row with
    ``right_ts <= left_ts`` and equal ``on`` keys (null when none).

    Right rows are deduped to one per (key, ts) first via
    ``max(struct(value_cols))`` — ROW-wise, so a tie at one timestamp
    resolves to a single right row and multiple value columns never mix
    across tied rows. The carried payload is that struct (never null for
    a right row), so a right row whose value IS null propagates its null
    instead of being skipped for an older non-null — matching DuckDB
    ``ASOF JOIN ... ON l.ts >= r.ts`` semantics. At a tie timestamp the
    right row sorts before the left row (inclusive).
    """
    clash = sorted(set(value_cols) & set(left.columns))
    if clash:
        raise ValueError(f"value_cols collide with left columns: {clash}")
    r = (
        # a NULL right timestamp can never satisfy right_ts <= left_ts
        # (DuckDB ASOF agrees) — but unfiltered it sorts FIRST under the
        # asc window order and its values would attach to every left row
        # with no true predecessor
        right.filter(F.col(right_ts).isNotNull())
        .groupBy(*on, F.col(right_ts).alias(left_ts))
        .agg(F.max(F.struct(*[F.col(c) for c in value_cols])).alias("__vals"))
        .withColumn("__src", F.lit(0))
    )
    l = left.withColumn("__src", F.lit(1))
    u = l.unionByName(r, allowMissingColumns=True)
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col(left_ts).asc(), F.col("__src").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carry = F.last(F.when(F.col("__src") == 0, F.col("__vals")), ignorenulls=True).over(w)
    out = u.withColumn("__carry", carry).filter(F.col("__src") == 1)
    return out.select(
        *left.columns, *[F.col("__carry")[c].alias(c) for c in value_cols]
    )


def range_pairs(
    df: DataFrame,
    key: str,
    ts: str,
    id_col: str,
    max_gap_seconds: int,
) -> DataFrame:
    """All ordered same-key pairs (a before-or-equal b, ``a != b`` by
    (ts, id) order) whose timestamps are within ``max_gap_seconds``.
    Output: (key, id_a, id_b, gap_us).

    Bucketing makes this a pure equi join: with buckets of exactly the
    gap width, any qualifying pair lands in the same or adjacent
    buckets, so the b-side probes (bucket, bucket-1) and each pair
    matches exactly once — no post-join dedup.
    """
    gap_us = max_gap_seconds * 1_000_000
    # Micros are computed ONCE here and carried through the join, so the
    # operator is agnostic to TIMESTAMP vs TIMESTAMP_NTZ input (the
    # driver reads tz-less parquet as NTZ under
    # spark.sql.timestampType=TIMESTAMP_NTZ, where unix_micros errors).
    us = epoch_micros(F.col(ts), ntz=is_ntz(df, ts))
    base = df.select(
        F.col(key), F.col(id_col), us.alias("__us"),
        F.floor(us / gap_us).alias("__b"),
    ).filter(F.col(key).isNotNull() & F.col(ts).isNotNull())
    a = base.select(
        F.col(key), F.col(id_col).alias("id_a"),
        F.col("__us").alias("__us_a"), F.col("__b").alias("__ba"),
    )
    b = base.select(
        F.col(key), F.col(id_col).alias("id_b"), F.col("__us").alias("__us_b"),
        F.explode(F.array(F.col("__b"), F.col("__b") - 1)).alias("__ba"),
    )
    ga, gb = F.col("__us_a"), F.col("__us_b")
    return (
        a.join(b, [key, "__ba"])
        .filter(
            (gb - ga >= 0) & (gb - ga <= gap_us)
            & ((ga < gb) | ((ga == gb) & (F.col("id_a") < F.col("id_b"))))
        )
        .select(key, "id_a", "id_b", (gb - ga).alias("gap_us"))
    )
