"""Query registry: every implemented operator from SURVEY.md §2 (and the
LLM-data extensions) exposed as a named (spark, sf_dir) -> DataFrame
callable, with a DuckDB oracle-SQL twin where SQL can express it.

The driver's correctness gate runs both sides at sf=0.01 and compares
row-count + schema + order-insensitive value hash, so every query here
is written for *cross-engine bit-exactness*: double aggregations go
through the decimal-sum pattern (functions.scalars.dsum), expression
association order matches the SQL text, and outputs avoid
engine-dependent types.
"""

from __future__ import annotations

from spaceparts_data_pipeline_spark.queries import core, llm


def all_queries():
    return {**core.QUERIES, **llm.QUERIES}


def all_oracles():
    return {**core.ORACLES, **llm.ORACLES}
