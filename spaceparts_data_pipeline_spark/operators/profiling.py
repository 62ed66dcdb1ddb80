"""Profiling-driven type inference (SURVEY.md §2.1 S6/S7, §2.5 G5/G6;
reference data_exploration.ipynb cells 18-19: TYPE_HINTS + profile_df).

The reference profiles samples to decide, per column: numeric coercion,
epoch-timestamp decoding, category encoding (distinct ratio < 0.5), and
null-token scrubbing. Here the same decisions come from one distributed
aggregation pass — no sampling needed, no driver loops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from spaceparts_data_pipeline_spark.functions.scalars import EPOCH_NS_THRESHOLD

#: distinct/count below this suggests dictionary/category encoding
#: (bronze_processor.py:198; silver_processor.py:268)
CATEGORY_RATIO = 0.5


def type_hints(df: DataFrame) -> dict[str, dict]:
    """One aggregation pass → per-column hints:

    - ``epoch_unit``: 'ns'/'s' for bigint columns that look like epochs
      (name ends 'date'/'month' or value magnitude in epoch range)
    - ``category``: distinct ratio < 0.5 on string columns
    - ``numeric_string``: string column whose non-null values all parse
      as numbers (→ to_numeric-coerce candidate)
    """
    aggs = [F.count(F.lit(1)).alias("__rows")]
    for name, dtype in df.dtypes:
        if dtype in ("bigint", "long", "int"):
            aggs += [
                F.min(name).alias(f"{name}__min"),
                F.max(name).alias(f"{name}__max"),
            ]
        elif dtype == "string":
            aggs += [
                F.approx_count_distinct(name).alias(f"{name}__distinct"),
                F.count(name).alias(f"{name}__nonnull"),
                F.count(F.when(F.col(name).try_cast("double").isNotNull(), 1)).alias(f"{name}__numeric"),
            ]
    row = df.agg(*aggs).collect()[0].asDict()
    total = row["__rows"] or 1
    hints: dict[str, dict] = {}
    for name, dtype in df.dtypes:
        h: dict = {}
        lname = name.lower()
        if dtype in ("bigint", "long", "int"):
            mx = row.get(f"{name}__max")
            mn = row.get(f"{name}__min")
            # magnitude over BOTH extremes: a pre-1970 epoch column is
            # all-negative (max near 0), so abs(max) alone missed it —
            # the min aggregate existed but was never read
            mag = max(abs(v) for v in (mn, mx) if v is not None) \
                if (mn is not None or mx is not None) else None
            if mag is not None and (lname.endswith("date") or lname == "month"):
                h["epoch_unit"] = "ns" if mag > EPOCH_NS_THRESHOLD else "s"
            elif mag is not None and mag > EPOCH_NS_THRESHOLD:
                h["epoch_unit"] = "ns"
        elif dtype == "string":
            nonnull = row.get(f"{name}__nonnull") or 0
            if nonnull:
                if (row.get(f"{name}__distinct") or 0) / total < CATEGORY_RATIO:
                    h["category"] = True
                if row.get(f"{name}__numeric") == nonnull:
                    h["numeric_string"] = True
        if h:
            hints[name] = h
    return hints
