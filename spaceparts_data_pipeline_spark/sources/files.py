"""Delimited / JSON-lines file sources with corrupt-record quarantine.

The reference ingests from SQL Server only (SURVEY.md §2.1); a
Spark-first engine meets corpora where they actually land — JSONL is
the lingua franca of training-data drops, CSV of tabular exports. Both
readers here keep Catalyst in charge (plain ``spark.read`` with options,
so column pruning and filter pushdown still apply where the format
supports them) and expose malformed input the same way the silver layer
exposes bad rows: a (clean, corrupt) split, with the raw offending line
preserved for the quarantine side-sink instead of silently dropped
(DROPMALFORMED) or silently nulled (plain PERMISSIVE).

Scale notes: schema inference samples the files with a bounded
``samplingRatio`` — pass an explicit schema in production so a 100 TB
landing directory isn't scanned twice; both readers take directories /
globs and parallelize per file split like any Spark file source.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: column capturing the raw text of rows that failed to parse
CORRUPT_COL = "_corrupt_record"


def _with_corrupt_field(schema: T.StructType) -> T.StructType:
    """Schema + the corrupt-record capture column (required by Spark:
    the capture column must be declared in the read schema)."""
    if CORRUPT_COL in schema.fieldNames():
        return schema
    return T.StructType(list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType(), True)])


def _split_corrupt(df: DataFrame) -> tuple[DataFrame, DataFrame, DataFrame]:
    """(clean, corrupt, parent): corrupt rows are those whose capture
    column is non-null (raw text preserved as ``raw_record``); the clean
    side drops the capture column.

    The parsed frame is persisted MEMORY_AND_DISK and returned as
    ``parent`` — Spark refuses a query referencing ONLY the corrupt
    column of a raw file scan (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_
    RECORD_COLUMN; the documented pattern is to materialize first), and
    the cache also means the file parse runs once for both sinks — the
    same two-consumer contract as plans.silver.transform(persist=True).
    The caller owns ``parent.unpersist()`` after both sides are consumed.
    """
    from pyspark.storagelevel import StorageLevel

    df = df.persist(StorageLevel.MEMORY_AND_DISK)
    corrupt = df.filter(F.col(CORRUPT_COL).isNotNull()) \
                .select(F.col(CORRUPT_COL).alias("raw_record"))
    clean = df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    return clean, corrupt, df


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str | None = None,
    sampling_ratio: float = 1.0,
    **options,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """JSON-lines reader → (clean, corrupt, parent) — see
    :func:`_split_corrupt` for the parent/persist contract.

    With no ``schema`` the reader infers one (default: a full pass —
    correct on small drops; at corpus scale pass an explicit schema, or
    at least a small ``sampling_ratio``, so 100 TB isn't parsed twice).
    Malformed lines land on the corrupt side with the raw text
    preserved.
    """
    if schema is None:
        inferred = spark.read.option("samplingRatio", str(sampling_ratio)).json(path).schema
        schema = inferred
    if isinstance(schema, str):
        schema = T.StructType.fromDDL(schema)
    df = (
        spark.read.schema(_with_corrupt_field(schema))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .options(**options)
        .json(path)
    )
    return _split_corrupt(df)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str | None = None,
    header: bool = True,
    delimiter: str = ",",
    sampling_ratio: float = 1.0,
    **options,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """CSV reader → (clean, corrupt, parent); same contract as :func:`read_jsonl`."""
    base_opts = {"header": str(header).lower(), "sep": delimiter}
    if schema is None:
        inferred = (
            spark.read.options(inferSchema="true", samplingRatio=str(sampling_ratio), **base_opts)
            .csv(path)
            .schema
        )
        schema = inferred
    if isinstance(schema, str):
        schema = T.StructType.fromDDL(schema)
    df = (
        spark.read.schema(_with_corrupt_field(schema))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .options(**base_opts)
        .options(**options)
        .csv(path)
    )
    return _split_corrupt(df)
