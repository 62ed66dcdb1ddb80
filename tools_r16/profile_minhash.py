#!/usr/bin/env python
"""Step-profile the MinHash-LSH family (d14 canonical_corpus_lsh, d16
incremental_near_dedup) at $SPARK_GRAFT_SF_DIR — guide §1: measure
first, attribute the wall to stages before touching anything.

Each stage is timed through the noop sink on a quiet machine,
min-of-3, with cache-clear + GC between queries (bench.py's isolation
protocol).
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def timeit(spark, name, df_fn, reps=3):
    spark.catalog.clearCache()
    try:
        spark.sparkContext._jvm.System.gc()
    except Exception:
        pass
    ts = []
    for _ in range(reps):
        spark.sparkContext.setJobDescription(name)
        t0 = time.perf_counter()
        df_fn().write.format("noop").mode("overwrite").save()
        ts.append(time.perf_counter() - t0)
    spark.sparkContext.setJobDescription(None)
    print(f"{name:55s} min {min(ts):6.2f}s  reps {[round(t,2) for t in ts]}", flush=True)
    return min(ts)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from spaceparts_data_pipeline_spark.session import get_spark
    from spaceparts_data_pipeline_spark.operators import dedup_fuzzy as dz
    from spaceparts_data_pipeline_spark.sources.parquet import load_table

    spark = get_spark(app_name="profile-minhash")
    spark.sparkContext.setLogLevel("ERROR")
    # warmup: JVM + python workers
    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).count()
    spark.range(1 << 14).repartition(spark.sparkContext.defaultParallelism) \
        .mapInPandas(lambda it: it, "id long") \
        .write.format("noop").mode("overwrite").save()

    d = load_table(spark, sf_dir, "documents")

    # --- d14 stages ---------------------------------------------------
    timeit(spark, "scan documents (floor)", lambda: d)
    timeit(spark, "word_shingles (tokenize+gram explode)",
           lambda: dz.word_shingles(d))
    timeit(spark, "shingle_arrays (array shape)",
           lambda: dz.shingle_arrays(d))
    timeit(spark, "minhash_signatures 16p (explode+groupBy-min)",
           lambda: dz.minhash_signatures(d, num_perm=16))
    timeit(spark, "band_table 16p/1r",
           lambda: dz.band_table(d, num_perm=16, rows_per_band=1))
    timeit(spark, "minhash_lsh_pairs 16p/1r (cand pairs)",
           lambda: dz.minhash_lsh_pairs(d, num_perm=16, rows_per_band=1))
    timeit(spark, "verify sets (explode+collect_set)",
           lambda: dz.word_shingles(d)
           .select(F.col("doc_id"), F.xxhash64("shingle").alias("__h"))
           .groupBy("doc_id").agg(F.collect_set("__h").alias("__hs")))
    timeit(spark, "verified_lsh_pairs 16p/1r thr0.5",
           lambda: dz.verified_lsh_pairs(d, num_perm=16, rows_per_band=1,
                                         threshold=0.5))
    timeit(spark, "canonical_corpus_lsh (full d14)",
           lambda: dz.canonical_corpus_lsh(d, threshold=0.5, rows_per_band=1))

    # --- d16 stages ----------------------------------------------------
    store_side = d.filter(F.col("doc_id") % 10 < 6)
    batch = d.filter(F.col("doc_id") % 10 >= 4)
    timeit(spark, "d16 store band_table 32p/4r",
           lambda: dz.band_table(store_side, num_perm=32, rows_per_band=4))
    timeit(spark, "d16 within-batch canonical_corpus_lsh 32p/4r",
           lambda: dz.canonical_corpus_lsh(batch, num_perm=32, rows_per_band=4,
                                           threshold=0.5))
    def d16_full():
        store = dz.band_table(store_side, num_perm=32, rows_per_band=4)
        admitted, bands = dz.incremental_near_dedup(
            batch, store, num_perm=32, rows_per_band=4)
        return admitted.select("doc_id", "lang")
    timeit(spark, "d16 full (admitted only)", d16_full)
    def d16_bands_recompute():
        admitted = dz.canonical_corpus_lsh(batch, num_perm=32, rows_per_band=4,
                                           threshold=0.5)
        return dz.band_table(admitted, num_perm=32, rows_per_band=4)
    timeit(spark, "d16 bands-of-admitted recompute (the dup pass)",
           d16_bands_recompute)


if __name__ == "__main__":
    main()
