"""Schema-generic type standardization (the silver cleaning kernel).

The single most distinctive semantic of the reference (SURVEY.md §1.4):
cleaning decisions are made *per column, by name-pattern and current
dtype*, via reflection over the schema — not hand-written per table.
Re-expressed here as ONE wide ``select`` of ``when`` expressions (a
single projection node → whole-stage codegen, no shuffle, scales
linearly at 100 TB).

Rules (Silver_full_load.ipynb:1 cell 8 `standardize_data_types`;
silver_processor.py:137-187):

- name ends with ``date`` or name == ``month``, dtype bigint →
  epoch-unit disambiguation (>1e12 ⇒ ns else s) → timestamp.
- name ends with ``_key``, dtype string → upper(trim) + null-token scrub.
- other string columns → trim + null-token scrub (keep original case).
- double/float columns → NaN/±Inf → NULL.
- everything else passes through untouched.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from spaceparts_data_pipeline_spark.functions.scalars import (
    NULL_TOKENS,
    epoch_to_timestamp,
    scrub_double,
    standardize_key,
)

_STRING_TYPES = {"string"}
_BIGINT_TYPES = {"bigint", "long", "int", "integer"}
_DOUBLE_TYPES = {"double", "float"}


def _rule_for(name: str, dtype: str) -> Column | None:
    """Pick the standardization expression for one column, or None to pass through."""
    lname = name.lower()
    if (lname.endswith("date") or lname == "month") and dtype in _BIGINT_TYPES:
        return epoch_to_timestamp(name)
    if dtype in _STRING_TYPES:
        if lname.endswith("_key"):
            return standardize_key(name)
        trimmed = F.trim(F.col(name))
        return F.when(F.upper(trimmed).isin(*NULL_TOKENS), F.lit(None)).otherwise(trimmed)
    if dtype in _DOUBLE_TYPES:
        return scrub_double(name)
    return None


def standardize_types(df: DataFrame) -> DataFrame:
    """Apply the name/dtype-dispatched cleaning rules as one projection."""
    exprs = []
    for name, dtype in df.dtypes:
        rule = _rule_for(name, dtype)
        exprs.append(rule.alias(name) if rule is not None else F.col(name))
    return df.select(*exprs)
