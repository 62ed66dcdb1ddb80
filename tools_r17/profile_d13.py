#!/usr/bin/env python
"""Step-profile d13_canonical_corpus (r16 verdict next-round #3: the
largest bench line, 6-18 s, never step-profiled) and A/B its candidate
shapes, interleaved, equality-gated.

Stages of the shipped shape (jaccard_pairs(threshold=.05) →
connected_components → semi join):
  A. word_shingles explosion (tokenize+distinct+explode), consumed 3×
     by jaccard_pairs (counts pass + both self-join sides)
  B. jaccard_pairs end-to-end (shingle self-join + inter/union math)
  C. connected_components over the pairs (iterative, eager cuts)
  D. the full query

Candidate shapes (bit-identical by construction; equality-gated here):
  1. counts-from-array: per-doc shingle count via size() on the
     shingle ARRAY (map-side, no explode/exchange) instead of the
     exploded groupBy().count() pass — one corpus pass and one
     exchange fewer.
  2. shared-base: ONE materialized (id, shingle-array) base
     (stage_cut), self-join sides + counts all derived from the leaf —
     one tokenize pass instead of three (the d14 _minhash_base
     pattern, without signatures).

Usage: python tools_r17/profile_d13.py [reps] [rounds]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def jaccard_pairs_counts_from_array(df, threshold=0.05, k=3):
    from spaceparts_data_pipeline_spark.operators.dedup_fuzzy import (
        shingle_arrays,
        word_shingles,
    )

    sh = word_shingles(df, "doc_id", "text", k)
    counts = shingle_arrays(df, "doc_id", "text", k).select(
        F.col("doc_id"), F.size("__sh").alias("n"))
    a = sh.select(F.col("doc_id").alias("id_a"), "shingle")
    b = sh.select(F.col("doc_id").alias("id_b"), "shingle")
    inter = (
        a.join(b, (a["shingle"] == b["shingle"]) & (a["id_a"] < b["id_b"]))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    ca = counts.select(F.col("doc_id").alias("id_a"), F.col("n").alias("n_a"))
    cb = counts.select(F.col("doc_id").alias("id_b"), F.col("n").alias("n_b"))
    out = (
        inter.join(ca, "id_a").join(cb, "id_b")
        .withColumn("jaccard", F.col("inter") / (F.col("n_a") + F.col("n_b") - F.col("inter")))
        .filter(F.col("jaccard") >= threshold)
    )
    return out.select("id_a", "id_b", "inter", "jaccard")


def jaccard_pairs_shared_base(df, threshold=0.05, k=3):
    from spaceparts_data_pipeline_spark.operators.dedup_fuzzy import shingle_arrays
    from spaceparts_data_pipeline_spark.operators.lineage import stage_cut

    base = stage_cut(shingle_arrays(df, "doc_id", "text", k))
    sh = base.select(F.col("doc_id"), F.explode("__sh").alias("shingle"))
    counts = base.select(F.col("doc_id"), F.size("__sh").alias("n"))
    a = sh.select(F.col("doc_id").alias("id_a"), "shingle")
    b = sh.select(F.col("doc_id").alias("id_b"), "shingle")
    inter = (
        a.join(b, (a["shingle"] == b["shingle"]) & (a["id_a"] < b["id_b"]))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    ca = counts.select(F.col("doc_id").alias("id_a"), F.col("n").alias("n_a"))
    cb = counts.select(F.col("doc_id").alias("id_b"), F.col("n").alias("n_b"))
    out = (
        inter.join(ca, "id_a").join(cb, "id_b")
        .withColumn("jaccard", F.col("inter") / (F.col("n_a") + F.col("n_b") - F.col("inter")))
        .filter(F.col("jaccard") >= threshold)
    )
    return out.select("id_a", "id_b", "inter", "jaccard")


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from spaceparts_data_pipeline_spark.operators import dedup_fuzzy
    from spaceparts_data_pipeline_spark.queries import all_queries, llm
    from spaceparts_data_pipeline_spark.session import get_spark

    spark = get_spark(app_name="d13-profile")
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).count()
    spark.range(1 << 14).repartition(spark.sparkContext.defaultParallelism) \
        .mapInPandas(lambda it: it, "id long") \
        .write.format("noop").mode("overwrite").save()
    queries = all_queries()

    def docs():
        return llm.T(spark, sf_dir, "documents")

    def _isolate():
        spark.catalog.clearCache()
        try:
            spark.sparkContext._jvm.System.gc()
        except Exception:
            pass

    # ---- equality gates (run ONCE, before any timing) ----
    head_pairs = sorted(map(tuple, dedup_fuzzy.jaccard_pairs(
        docs(), threshold=0.05).collect()))
    for label, fn in (("counts_from_array", jaccard_pairs_counts_from_array),
                      ("shared_base", jaccard_pairs_shared_base)):
        got = sorted(map(tuple, fn(docs(), threshold=0.05).collect()))
        if got != head_pairs:
            only_a = [r for r in head_pairs if r not in got][:5]
            only_b = [r for r in got if r not in head_pairs][:5]
            raise AssertionError(f"{label}: pair sets differ "
                                 f"({len(head_pairs)} vs {len(got)}; "
                                 f"head-only {only_a}; alt-only {only_b})")
        print(f"equality {label}: {len(got)} pairs identical", flush=True)

    # ---- step profile + interleaved A/B ----
    def timed(label, build, n=None):
        _isolate()
        out = []
        for _ in range(n or reps):
            t0 = time.perf_counter()
            build().write.format("noop").mode("overwrite").save()
            out.append(round(time.perf_counter() - t0, 3))
        print(f"{label:34s} min {min(out):6.2f}  all {out}", flush=True)
        return out

    variants = {
        "A_shingles_once": lambda: dedup_fuzzy.word_shingles(docs(), "doc_id", "text", 3),
        "B_pairs_head": lambda: dedup_fuzzy.jaccard_pairs(docs(), threshold=0.05),
        "B_pairs_counts_arr": lambda: jaccard_pairs_counts_from_array(docs()),
        "B_pairs_shared_base": lambda: jaccard_pairs_shared_base(docs()),
        "D_d13_head": lambda: queries["d13_canonical_corpus"](spark, sf_dir),
        "D_d13_counts_arr": lambda: dedup_fuzzy.canonical_corpus(
            docs(), jaccard_pairs_counts_from_array(docs())),
        "D_d13_shared_base": lambda: dedup_fuzzy.canonical_corpus(
            docs(), jaccard_pairs_shared_base(docs())),
        "ctl_x29": lambda: queries["x29_contamination_check"](spark, sf_dir),
    }
    acc: dict[str, list[float]] = {}
    for rnd in range(rounds):
        print(f"--- round {rnd} ---", flush=True)
        for label, build in variants.items():
            n = max(2, reps - 2) if label.startswith(("A_", "ctl_")) else reps
            acc.setdefault(label, []).extend(timed(label, build, n))
    print("\n=== summary (min / median) ===")
    for label, ts in acc.items():
        st = sorted(ts)
        print(f"{label:34s} min {st[0]:6.2f} med {st[len(st)//2]:6.2f} n={len(st)}")


if __name__ == "__main__":
    main()
