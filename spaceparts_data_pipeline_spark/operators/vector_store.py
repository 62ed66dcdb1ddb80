"""Persistent vector store for cross-run SEMANTIC dedup (d26) — the
embedding-space member of the screen-store family, at parity with the
md5 fingerprint store (``operators.dedup``, d15) and the MinHash band
store (``operators.dedup_fuzzy``, d16): path + catalog-table backends,
crash-recovering compaction, and funnel/CLI wiring
(``plans.corpus.run_corpus_ingest(semdedup_embeddings=...)``).

Layout: ONE relation of ``(id, vector, sigs)`` rows — one row per
admitted vector, its ``n_bands`` banded LSH signatures riding as an
array. Parquet column pruning serves the screen's two reads from the
same table cheaply: the collision join scans ``(id, sigs)`` (vectors
never ride the band explode), the exact verify scans ``(id, vector)``
for just the candidate joins. With the table backend the store is
HASH-BUCKETED BY ID, which makes the verify join's store side
exchange-free; the collision join's store side never shuffles at all —
the batch side broadcasts onto the store's scan partitioning
(``incremental_semdedup(broadcast_screen=True)``).

A (band, sig)-bucketed PRE-EXPLODED index was built and MEASURED in
round 13 and rejected: the high-recall 4×16 profile has a 16-value
band-signature space, so collision candidates are ~|batch|·|store| and
scattering a store row's bands across bucket partitions defeats the
map-side duplicate-pair collapse — 1.7 GB of dedup shuffle where the
scan-order explode moves 45 MB (scale-harness ``--semdedup-store``).
Keeping the store in scan order IS the optimization.

Append-only under DISTINCT-equivalent screen semantics, like the other
screen stores: the screen is an existence test, so duplicate rows (a
replayed run's re-append) change no decision, and a periodic
distinct-rewrite compaction is exactness-preserving at any moment.
Callers order durable outputs BEFORE store appends (the funnel's
proven crash ordering), so a replay's screen misses exactly the
unfinished appends and re-appends them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spaceparts_data_pipeline_spark.operators import dedup
from spaceparts_data_pipeline_spark.operators.partitioning import write_bucketed

#: bucket count for the table backend — matches the engine's default
#: shuffle partitioning so the verify join's store side lines up
#: without an exchange at local[32]; deployments size it to their
#: shuffle parallelism.
DEFAULT_NUM_BUCKETS = 32


def store_location(prefix: str, table_backend: bool = False) -> str:
    """The store's location for ``prefix`` — table ``{prefix}_sem_store``
    for the table backend, the ``prefix`` directory itself for the path
    backend (callers pass e.g. ``{out_dir}/sem_store``)."""
    return f"{prefix}_sem_store" if table_backend else prefix


# -- catalog-table backend (bucketed) ----------------------------------------
#
# A plain bucketed table, not a versioned view: Spark's bucketed-scan
# exchange elimination needs the bucket spec on the scanned relation,
# and a bucketBy saveAsTable cannot target a view. Compaction therefore
# swaps via catalog RENAME (write {t}__compact bucketed -> rename away
# -> promote -> drop old), with recover_store_table resolving each
# crash window — the catalog twin of dedup.recover_store's path state
# machine. saveAsTable's own all-or-nothing catalog commit means a
# "__compact exists in the catalog" state is always a COMPLETE copy.

def recover_store_table(spark: SparkSession, table: str) -> str | None:
    """Finish or roll back an interrupted :func:`_compact_table` swap.
    Mirrors ``dedup.recover_store`` state for state with tableExists
    standing in for fs.exists."""
    old, comp = f"{table}__old", f"{table}__compact"
    if spark.catalog.tableExists(table):
        acted = None
        for stale in (old, comp):
            if spark.catalog.tableExists(stale):
                spark.sql(f"DROP TABLE {stale}")
                acted = "deleted stale leftovers"
        return acted
    if spark.catalog.tableExists(comp):
        spark.sql(f"ALTER TABLE {comp} RENAME TO {table}")
        if spark.catalog.tableExists(old):
            spark.sql(f"DROP TABLE {old}")
        return "promoted compacted store"
    if spark.catalog.tableExists(old):
        spark.sql(f"ALTER TABLE {old} RENAME TO {table}")
        return "rolled back to pre-compaction store"
    return None


def _compact_table(spark: SparkSession, table: str, keys: list[str],
                   num_buckets: int) -> dict:
    recover_store_table(spark, table)
    n_before = spark.table(table).count()
    write_bucketed(spark.table(table).distinct(), f"{table}__compact",
                   keys, num_buckets=num_buckets, mode="overwrite")
    spark.sql(f"ALTER TABLE {table} RENAME TO {table}__old")
    spark.sql(f"ALTER TABLE {table}__compact RENAME TO {table}")
    spark.sql(f"DROP TABLE {table}__old")
    return {"rows_before": n_before,
            "rows_after": spark.table(table).count()}


def _table_file_count(spark: SparkSession, table: str) -> int:
    rows = spark.sql(f"DESCRIBE FORMATTED {table}").collect()
    location = next((r[1] for r in rows if (r[0] or "").strip() == "Location"), None)
    if not location:
        return 0
    return dedup.data_file_count(spark, location)


# -- unified API --------------------------------------------------------------

def read_semdedup_store(
    spark: SparkSession,
    prefix: str,
    *,
    table_backend: bool = False,
) -> DataFrame | None:
    """Read the ``(id, vector, sigs)`` store for
    :func:`similarity.incremental_semdedup`'s ``store`` param, or
    ``None`` iff never created (the only state meaning an empty screen
    — any other read failure raises, the ``read_store`` discipline).
    Recovers an interrupted compaction swap first."""
    loc = store_location(prefix, table_backend)
    if table_backend:
        recover_store_table(spark, loc)
        if not spark.catalog.tableExists(loc):
            return None
        return spark.table(loc)
    return dedup.read_store(spark, loc)


def append_semdedup_store(
    spark: SparkSession,
    admitted_store_rows: DataFrame,
    prefix: str,
    *,
    table_backend: bool = False,
    num_buckets: int = DEFAULT_NUM_BUCKETS,
    id_col: str = "vec_id",
) -> None:
    """Append a run's admitted ``(id, vector, sigs)`` rows (the second
    element of :func:`similarity.incremental_semdedup`'s return, or a
    fresh :func:`similarity.det_lsh_signatures` pass over the durable
    corpus). Duplicate appends are harmless (existence screen)."""
    loc = store_location(prefix, table_backend)
    if table_backend:
        recover_store_table(spark, loc)
        mode = "append" if spark.catalog.tableExists(loc) else "overwrite"
        write_bucketed(admitted_store_rows, loc, [id_col],
                       num_buckets=num_buckets, mode=mode)
    else:
        dedup.recover_store(spark, loc)
        admitted_store_rows.write.mode("append").parquet(loc)


def maybe_compact_semdedup_store(
    spark: SparkSession,
    prefix: str,
    max_files: int,
    *,
    table_backend: bool = False,
    num_buckets: int = DEFAULT_NUM_BUCKETS,
    id_col: str = "vec_id",
) -> dict | None:
    """Distinct-rewrite the store once its data-file count passes
    ``max_files`` (append-only stores grow one file set per run).
    Exactness-preserving at any moment — the screen's decisions are
    invariant under duplicate removal."""
    loc = store_location(prefix, table_backend)
    if table_backend:
        if not spark.catalog.tableExists(loc) or \
                _table_file_count(spark, loc) <= max_files:
            return None
        return {loc: _compact_table(spark, loc, [id_col], num_buckets)}
    c = dedup.maybe_compact_store(spark, loc, max_files)
    return {loc: c} if c is not None else None
