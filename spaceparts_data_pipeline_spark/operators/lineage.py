"""Lineage control for iterative / composed plans.

Three independent subsystems discovered the same failure mode and the
same fix (round-11 verdict next-round #6 named it; this module is the
single implementation):

- iterative label propagation (``dedup_fuzzy.connected_components``):
  each round's plan references the previous round twice, so the
  ANALYZED plan doubles per iteration — ``persist`` alone leaves 2^k
  copies of the upstream generator in the logical tree and OOMs the
  driver during CacheManager plan normalization at toy data sizes;
- iterative vocabulary training (``text.bpe_train``): same shape, one
  fold per round over the word table;
- composed cached stage frames (``plans/corpus.run_corpus_ingest``):
  stage frames nesting corpus-scale aggregate subtrees (model gates)
  make plan compilation AND ``unpersist()``'s CacheManager cascade walk
  re-canonicalize those trees against every cached entry — ~30 s of
  pure driver time per funnel batch, a measured 4× end-to-end penalty.

``stage_cut`` materializes a stage boundary AND replaces its logical
plan with a leaf (LogicalRDD), so downstream plans stay O(1) in
composition depth and cache operations stay milliseconds. Data
semantics are unchanged — the same rows, computed once.

Replay trade (same as localCheckpoint everywhere in the engine): local
checkpoint blocks live on executor block managers; losing an executor
makes them unrecoverable, which aborts the job rather than corrupting
results — acceptable wherever the surrounding computation is idempotent
(all three call sites re-run their batch/round on failure). For
multi-hour cluster runs pass ``reliable=True`` to write through the
SparkContext checkpoint dir instead (requires ``sc.setCheckpointDir``).
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame

_log = logging.getLogger(__name__)


def share_mode(df: DataFrame | None = None) -> str:
    """Runtime override for the r16 measured shared-subtree decisions:
    ``spark.spaceparts.shareSubtrees`` = ``auto`` (default — ship the
    per-query choices A/B-measured in OPTIMIZATION_r16.md), ``off``
    (disable every r16 subtree share, restoring the pre-round recompute
    shapes), or ``on`` (enable the full-share variants, including the
    paths measured slower at sf0.1 bench scale: e06's codebook share
    and the d23/d24 tiny-frame gram-kernel cuts). Read at
    query-CONSTRUCTION time so one session can interleave variants
    rep-by-rep — the contract tools_r16/probe_share_crossover.py
    measures the larger-scale / lower-core crossover against. Values
    are identical in every mode (each shared subtree is deterministic
    and the cut is pure materialization); only how many times it is
    computed changes."""
    spark = df.sparkSession if df is not None else None
    if spark is None:
        from pyspark.sql import SparkSession

        spark = SparkSession.getActiveSession()
    if spark is None:
        return "auto"
    try:
        mode = (spark.conf.get("spark.spaceparts.shareSubtrees", "auto")
                or "auto").lower()
    except Exception:
        return "auto"
    return mode if mode in ("auto", "off", "on") else "auto"


def stage_cut(df: DataFrame, *, eager: bool = True, reliable: bool = False,
              unpersist: DataFrame | list | tuple | None = None) -> DataFrame:
    """Materialize ``df`` and cut its logical lineage to a leaf.

    ``unpersist``: previous-stage frame(s) to release once the cut is
    materialized — the bookkeeping every iterative caller was
    hand-rolling (cut next, then unpersist previous, never the reverse:
    the cut must not recompute through an already-released cache)."""
    cut = df.checkpoint(eager=eager) if reliable else df.localCheckpoint(eager=eager)
    if unpersist is not None:
        prev = unpersist if isinstance(unpersist, (list, tuple)) else [unpersist]
        for p in prev:
            # never-persisted frames are the expected no-op (checked, not
            # caught); a genuine release failure — stopped SparkContext,
            # JVM error mid-loop — is LOGGED so leaking cached stages has
            # a signal instead of a silent pass (ADVICE r12). Cleanup
            # still doesn't abort the caller: the surrounding iteration
            # is idempotent and the leak is bounded by one stage frame.
            try:
                sl = p.storageLevel
                if sl.useMemory or sl.useDisk or sl.useOffHeap:
                    p.unpersist()
            except Exception:
                _log.warning("stage_cut: failed to release a cached "
                             "previous-stage frame; its blocks may leak "
                             "until session end", exc_info=True)
    return cut
