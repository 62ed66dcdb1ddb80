"""Structured Streaming re-expression of the incremental layer
(SURVEY.md §2.11 notes this is optional for parity; we provide it as
the engine's native streaming path for event-style sources).

- ``stream_events``: file-source stream over a directory of parquet.
- ``windowed_counts``: event-time windowed aggregation with a real
  ``withWatermark`` (the principled replacement for the reference's
  fixed 1-hour overlap: late rows beyond the watermark are dropped
  instead of double-processed).
- ``stream_upsert``: foreachBatch MERGE into a target table — the
  streaming twin of the gold K3 upsert; each micro-batch runs the same
  null-safe anti-join+union merge.

All tested with ``availableNow`` triggers (bounded drain) so the same
code serves batch backfill and continuous ingest — Spark's unified
model.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from spaceparts_data_pipeline_spark.operators.merge import merge_into_table


def stream_events(spark: SparkSession, path: str, schema: StructType) -> DataFrame:
    """File-source stream over a directory of parquet.

    NOTE: with no rate limit configured, the file source drains ALL
    available files in ONE micro-batch (availableNow included) — callers
    that want per-file batch granularity must set
    ``.option("maxFilesPerTrigger", 1)`` on their own reader (the way
    the ingest tests do); this helper deliberately leaves the trigger
    rate unconfigured."""
    return spark.readStream.schema(schema).parquet(path)


def _run_tag(spark: SparkSession, checkpoint_dir: str) -> str:
    """Partition scope for this checkpoint INSTANCE — the batch-id
    scope: derived from the streaming query id in
    ``{checkpoint}/metadata``, which Spark writes at query start, keeps
    STABLE across restarts of the same checkpoint, and REGENERATES when
    the checkpoint is wiped. A tag derived from the checkpoint PATH
    collides when a wiped path is reused: batch ids restart at 0 under
    the same tag, so the new deployment's batch-0 dynamic overwrite
    would delete the prior deployment's batch-0 documents (r16 review).
    Falls back to the path hash when the metadata file is unreadable
    (called before query start, exotic FS).

    "r" prefix: a digits-only md5 prefix would make Spark's
    partition-column type inference read ``ingest_run`` back as BIGINT,
    and a later deployment's non-numeric tag then crashes the ANSI
    string→bigint cast in the read-back filter (hit by md5 luck in the
    round-13 suite). A leading letter pins the inferred type to STRING
    for every corpus this writes."""
    import hashlib
    import json

    try:
        line = spark.read.text(os.path.join(checkpoint_dir, "metadata")).head()
        qid = json.loads(line[0])["id"]
        return "r" + hashlib.md5(str(qid).encode()).hexdigest()[:11]
    except Exception:
        return "r" + hashlib.md5(
            os.path.abspath(checkpoint_dir).encode()).hexdigest()[:11]


def _write_batch_partition(payload: DataFrame, corpus_path: str,
                           run_tag: str, batch_id: int, id_col: str) -> None:
    """Dynamic-overwrite the (run_tag, batch_id) corpus partition with
    ``payload`` ∪ the partition's EXISTING rows.

    The union is the replay guard for PARTIALLY-committed store
    appends: if the fingerprint/band/vector append crashed mid
    job-commit, a replayed batch's screen rejects the docs whose store
    rows became visible and would otherwise rewrite the partition
    WITHOUT them — deleting durable corpus rows whose fingerprints
    remain in the store, i.e. permanent loss (r16 review). Unioning the
    already-durable partition back in makes the rewrite byte-equivalent
    under every partial state; rows are deterministic re-derivations of
    the same docs, so the id-keyed dropDuplicates picks identical
    content either way. The existence probe is a pure FS check — the
    extra pruned read job runs ONLY on the replay path.

    foreachBatch runs under a CLONED session with isolated conf — the
    dynamic-overwrite conf is set on the batch's own session."""
    from spaceparts_data_pipeline_spark.operators import dedup

    sess = payload.sparkSession
    part_dir = os.path.join(corpus_path, f"ingest_run={run_tag}",
                            f"ingest_batch_id={batch_id}")
    if dedup.has_data_files(sess, part_dir):
        existing = sess.read.parquet(corpus_path).filter(
            (F.col("ingest_run").cast("string") == run_tag)
            & (F.col("ingest_batch_id") == batch_id))
        for f in payload.schema.fields:
            existing = existing.withColumn(f.name, F.col(f.name).cast(f.dataType))
        payload = (payload.unionByName(existing.select(payload.columns))
                   .dropDuplicates([id_col]))
        # materialize BEFORE the overwrite: the union reads the very
        # files the commit will replace — localCheckpoint finishes the
        # read and cuts the lineage to a leaf first
        payload = payload.localCheckpoint()
    prior = sess.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    sess.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        payload.write.mode("overwrite").partitionBy(
            "ingest_run", "ingest_batch_id").parquet(corpus_path)
    finally:
        sess.conf.set("spark.sql.sources.partitionOverwriteMode", prior)


def windowed_counts(
    stream: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    window: str = "1 hour",
    watermark: str = "1 hour",
) -> DataFrame:
    """Event-time windowed counts with late-data watermarking."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("win"), F.col(key_col))
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total_value"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            key_col, "n", "total_value",
        )
    )


def session_window_agg(
    stream: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
    gap: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Native session windows (gap-based) — the streaming twin of the
    batch sessionization query (x01_event_sessions)."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(F.col(ts_col), gap).alias("sess"), F.col(key_col))
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("total_value"))
        .select(
            F.col(key_col),
            F.col("sess.start").alias("session_start"),
            F.col("sess.end").alias("session_end"),
            "n_events", "total_value",
        )
    )


def stream_dedup(stream: DataFrame, keys: list[str], ts_col: str = "ts", watermark: str = "1 hour") -> DataFrame:
    """Streaming exact dedup with bounded state:
    dropDuplicatesWithinWatermark keeps each key's state only until the
    watermark passes — the streaming W1 with O(window) memory."""
    return stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)


def running_user_totals(
    stream: DataFrame,
    checkpoint_dir: str,
    queryName: str = "user_totals",
):
    """Custom stateful operator via applyInPandasWithState: a running
    per-user (event_count, value_sum) that survives across micro-batches.
    This is the escape hatch for stateful logic the built-in windowed
    operators can't express; state is per-key, Arrow-batched."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    output_schema = "user_id bigint, event_count bigint, value_sum double"
    state_schema = "event_count bigint, value_sum double"

    def update(key, pdfs, state: GroupState):
        count, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            count += len(pdf)
            total += float(pdf["value"].fillna(0.0).sum())
        state.update((count, total))
        yield pd.DataFrame({"user_id": [key[0]], "event_count": [count], "value_sum": [total]})

    out = (
        stream.groupBy("user_id")
        .applyInPandasWithState(
            update, output_schema, state_schema, "update", GroupStateTimeout.NoTimeout
        )
    )
    return (
        out.writeStream.format("memory").queryName(queryName)
        .outputMode("update").trigger(availableNow=True)
        .option("checkpointLocation", checkpoint_dir).start()
    )


def stream_upsert(
    spark: SparkSession,
    stream: DataFrame,
    target_table: str,
    keys: list[str],
    order_col: str,
    checkpoint_dir: str,
    partition_col: str | None = None,
):
    """writeStream.foreachBatch MERGE: each micro-batch upserts into
    ``target_table`` with the engine's keyed merge (dedup-latest source,
    null-safe match). When the target is partitioned on ``partition_col``
    (a function of the keys), each micro-batch rewrites only the touched
    partitions — O(batch), not O(table), per trigger. Returns the
    StreamingQuery (availableNow)."""

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        if not spark.catalog.tableExists(target_table):
            # Create the target with the physical partitioning the merge
            # path expects — a plain saveAsTable here would leave the
            # table unpartitioned and every later batch on the O(table)
            # full-rewrite fallback instead of O(touched partitions).
            # Keep-latest dedup FIRST: the merge path dedups its source
            # to one row per key, and a batch-0 carrying two versions of
            # one key must not create a target that permanently violates
            # that invariant (keys never updated again would stay
            # duplicated forever).
            from spaceparts_data_pipeline_spark.operators.dedup import dedup_latest
            from spaceparts_data_pipeline_spark.operators.maintenance import (
                safe_save_as_table,
            )

            safe_save_as_table(dedup_latest(batch_df, order_col=order_col, keys=keys),
                               target_table, mode="overwrite",
                               partition_by=partition_col)
            return
        target = spark.table(target_table)
        merge_into_table(spark, target_table, batch_df.select(*target.columns), keys,
                         partition_col=partition_col, order_col=order_col)

    return (
        stream.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def stream_ingest_dedup(
    spark: SparkSession,
    stream: DataFrame,
    store_path: str,
    corpus_path: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    run_tag: str | None = None,
    band_store_path: str | None = None,
    num_perm: int = 16,
    rows_per_band: int = 2,
    threshold: float = 0.5,
):
    """Continuous corpus ingestion with cross-run dedup — the streaming
    twin of ``operators.dedup.incremental_dedup``: each micro-batch is
    screened against the fingerprint store of everything ever admitted
    (any prior run OR prior micro-batch), survivors' payloads land in
    the corpus, and their fingerprints extend the store.

    Exactly-once without a transactional sink, from three properties:

    - the corpus is partitioned by (``ingest_run``, ``ingest_batch_id``)
      and written with DYNAMIC partition overwrite — a replayed
      micro-batch (same batch_id, per foreachBatch's contract) rewrites
      its own partition byte-for-byte instead of appending twice, and
      an empty survivor set touches no partition at all. ``ingest_run``
      scopes the overwrite to THIS deployment: batch ids restart at 0
      whenever a job starts with a fresh checkpoint, so without the run
      scope a redeployment's batch 0 would silently overwrite the prior
      deployment's batch-0 documents (whose fingerprints stay in the
      store — permanent loss). ``run_tag`` defaults to a hash of the
      streaming query id in the checkpoint's metadata (stable across
      restarts, regenerated on checkpoint wipe — see :func:`_run_tag`);
    - the store append is idempotent under the screen (the anti join
      reads DISTINCT fingerprints — see ``update_fingerprint_store``);
    - corpus lands BEFORE the store append, and a replayed batch's
      rewrite unions the partition's already-durable rows back in
      (:func:`_write_batch_partition`) — so both replayable crash
      windows (corpus written + store not, and corpus written + store
      PARTIALLY committed) converge to the same partition content
      instead of dropping rows whose fingerprints became visible.

    The batch is persisted across the two writes: fingerprints shuffle;
    raw text goes scan→corpus without entering any exchange.

    ``band_store_path`` adds the cross-run NEAR-dup screen after the
    exact one — the streaming twin of the batch funnel's LSH stage
    (``dedup_fuzzy.incremental_near_dedup``): each micro-batch is
    within-batch LSH-deduplicated, then screened against the MinHash
    band store of everything ever admitted; survivors' bands extend
    the band store FROM THE DURABLE CORPUS, after the fingerprint
    append, so every crash window replays to the same decisions (band
    appends are idempotent under the DISTINCT band screen exactly as
    fingerprint appends are under theirs)."""
    from spaceparts_data_pipeline_spark.operators import dedup, dedup_fuzzy

    tag_cell = {"v": run_tag}

    def ingest(batch_df: DataFrame, batch_id: int) -> None:
        if tag_cell["v"] is None:
            # resolved lazily INSIDE the batch: the checkpoint metadata
            # (the query id the tag derives from) exists by the time the
            # first batch runs, not necessarily when the query is built
            tag_cell["v"] = _run_tag(spark, checkpoint_dir)
        run_tag = tag_cell["v"]
        # read_store recovers interrupted compactions and raises on any
        # failure other than "never created" — a transient read fault
        # must NOT silently screen against an empty store.
        store = dedup.read_store(spark, store_path)
        batch_df = batch_df.persist()
        try:
            survivors = dedup.incremental_dedup(
                batch_df, store, id_col=id_col, text_col=text_col
            )
            # inner join keeps the fingerprint column IN the payload —
            # the durable corpus is what the fp-store append reads
            admitted_rows = survivors.join(batch_df, id_col)
            if band_store_path is not None:
                band_store = dedup.read_store(spark, band_store_path)
                admitted_rows, _ = dedup_fuzzy.incremental_near_dedup(
                    admitted_rows, band_store, id_col=id_col, text_col=text_col,
                    num_perm=num_perm, rows_per_band=rows_per_band,
                    threshold=threshold,
                )
            payload = (
                admitted_rows
                .withColumn("ingest_run", F.lit(run_tag))
                .withColumn("ingest_batch_id", F.lit(batch_id))
            )
            _write_batch_partition(payload, corpus_path, run_tag, batch_id,
                                   id_col=id_col)
            # Append fingerprints FROM THE DURABLE CORPUS, not the
            # in-memory survivors: a replay whose screen already finds
            # the fingerprints (survivors empty) still completes a
            # store append that crashed mid-way last time. "Nothing was
            # EVER admitted" means no data files — an all-screened first
            # micro-batch's empty dynamic overwrite still creates the
            # (empty) corpus dir, which a bare exists-gated read would
            # then fail on with UNABLE_TO_INFER_SCHEMA.
            if not dedup.has_data_files(spark, corpus_path):
                return
            admitted = spark.read.parquet(corpus_path).filter(
                (F.col("ingest_run").cast("string") == run_tag)
                & (F.col("ingest_batch_id") == batch_id)
            )
            dedup.update_fingerprint_store(spark, admitted, store_path)
            if band_store_path is not None:
                # bands recomputed from the DURABLE corpus, same replay
                # argument as the fingerprints; appends are idempotent
                # under the band screen's semi-join
                dedup.recover_store(spark, band_store_path)
                dedup_fuzzy.band_table(
                    admitted, id_col=id_col, text_col=text_col,
                    num_perm=num_perm, rows_per_band=rows_per_band,
                ).write.mode("append").parquet(band_store_path)
        finally:
            batch_df.unpersist()

    return (
        stream.writeStream.foreachBatch(ingest)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def stream_ingest_semdedup(
    spark: SparkSession,
    stream: DataFrame,
    sem_store_prefix: str,
    corpus_path: str,
    checkpoint_dir: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    run_tag: str | None = None,
    dim: int = 64,
    n_planes: int = 4,
    n_bands: int = 16,
    threshold: float = 0.35,
    seed: int = 12,
):
    """Continuous EMBEDDING ingestion with cross-run semantic dedup —
    the streaming member of the semantic-screen family, completing the
    symmetry the text screens already have (exact: d15 batch / s04
    stream; MinHash: d16 / s05; semantic: d26 / THIS): each
    micro-batch is within-batch semantically deduplicated
    (deterministic-LSH candidates, exact-cosine-verified min-id
    decision) and screened against the vector store of everything any
    prior run or micro-batch admitted; survivors land in the corpus
    and their ``(id, vector, sigs)`` rows extend the store.

    Exactly-once by the s04 construction: the corpus is partitioned by
    (ingest_run, ingest_batch_id) and written with dynamic partition
    overwrite (a replayed micro-batch rewrites its own partition, with
    the partition's already-durable rows unioned back in — see
    :func:`_write_batch_partition` for why a PARTIALLY-committed store
    append would otherwise lose rows on replay); the store rows are
    derived FROM THE DURABLE corpus after the corpus write, so every
    crash window replays to the same decisions; store appends are
    idempotent under the existence screen (duplicate store rows change
    no decision — :func:`operators.similarity.incremental_semdedup`'s
    contract). ``run_tag`` defaults to the checkpoint-instance scope of
    :func:`_run_tag`.
    """
    from spaceparts_data_pipeline_spark.operators import (
        dedup, similarity, vector_store)

    tag_cell = {"v": run_tag}

    def ingest(batch_df: DataFrame, batch_id: int) -> None:
        if tag_cell["v"] is None:
            tag_cell["v"] = _run_tag(spark, checkpoint_dir)
        run_tag = tag_cell["v"]
        store = vector_store.read_semdedup_store(spark, sem_store_prefix)
        batch_df = batch_df.persist()
        try:
            admitted, _ = similarity.incremental_semdedup(
                batch_df, store, id_col=id_col, vec_col=vec_col, dim=dim,
                n_planes=n_planes, n_bands=n_bands, threshold=threshold,
                seed=seed)
            payload = (
                admitted
                .withColumn("ingest_run", F.lit(run_tag))
                .withColumn("ingest_batch_id", F.lit(batch_id))
            )
            _write_batch_partition(payload, corpus_path, run_tag, batch_id,
                                   id_col=id_col)
            if not dedup.has_data_files(spark, corpus_path):
                return
            durable = spark.read.parquet(corpus_path).filter(
                (F.col("ingest_run").cast("string") == run_tag)
                & (F.col("ingest_batch_id") == batch_id)
            )
            vector_store.append_semdedup_store(
                spark,
                similarity.det_lsh_signatures(
                    durable, id_col=id_col, vec_col=vec_col, dim=dim,
                    n_planes=n_planes, n_bands=n_bands, seed=seed),
                sem_store_prefix, id_col=id_col)
        finally:
            batch_df.unpersist()

    return (
        stream.writeStream.foreachBatch(ingest)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
