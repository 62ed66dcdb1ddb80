#!/usr/bin/env python
"""A/B probe: d27 global_line_dedup's canonical-occurrence WINDOW
(row_number over md5(line), per-partition sort) vs a min(struct)
AGGREGATION shape (map-side partial combine, no sort) + hash join back.

Decision rule equivalence: rn==1 under (ORDER BY doc_id, pos) within an
md5(line) partition  ⟺  (doc_id, pos) == min(struct(doc_id, pos)) over
the same key — (doc_id, pos) is globally unique so the min is unique.
The probe asserts exact row equality before timing.

Usage: python tools_r16/probe_d27_minby.py [reps] [rounds]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def alt_global_line_dedup(df, id_col="doc_id", text_col="text"):
    """min_by aggregation shape: winners per line-hash via partial agg
    (narrow rows, no per-partition sort), join flags back by hash."""
    lines = (
        df.filter(F.col(text_col).isNotNull())
        .select(F.col(id_col),
                F.posexplode(F.split(text_col, "\n")).alias("pos", "line"))
        .filter(F.length(F.trim("line")) > 0)
        .withColumn("__h", F.md5("line"))
    )
    winners = (
        lines.select("__h", F.struct(F.col(id_col), F.col("pos")).alias("__w"))
        .groupBy("__h").agg(F.min("__w").alias("__w"))
        .select("__h", F.col(f"__w.{id_col}").alias("__wid"),
                F.col("__w.pos").alias("__wpos"))
    )
    flagged = lines.join(winners, "__h").withColumn(
        "rn", F.when((F.col(id_col) == F.col("__wid"))
                     & (F.col("pos") == F.col("__wpos")), F.lit(1)).otherwise(F.lit(2)))
    keep = (F.col("rn") == 1).cast("long")
    return (
        flagged.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(keep).alias("n_kept"),
            F.array_sort(F.collect_list(
                F.when(F.col("rn") == 1, F.struct("pos", "line")))).alias("__ks"),
        )
        .filter(F.col("n_kept") >= 1)
        .select(
            F.col(id_col), "n_lines", "n_kept",
            F.concat_ws("\n", F.transform("__ks", lambda s: s["line"]))
            .alias("text_dedup"),
        )
    )


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from spaceparts_data_pipeline_spark.session import get_spark
    from spaceparts_data_pipeline_spark.queries import all_queries, llm

    spark = get_spark(app_name="d27-minby-probe")
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).count()
    spark.range(1 << 14).repartition(spark.sparkContext.defaultParallelism) \
        .mapInPandas(lambda it: it, "id long") \
        .write.format("noop").mode("overwrite").save()
    queries = all_queries()

    def head_df():
        return queries["d27_line_dedup_global"](spark, sf_dir)

    def alt_df():
        d = llm.T(spark, sf_dir, "documents")
        return alt_global_line_dedup(llm._multiline(d, every=2))

    # sorted lists (multiplicity drift must fail) + a sample of the
    # symmetric difference on mismatch so a failed gate is debuggable
    # (ADVICE r16)
    a = sorted(map(tuple, head_df().collect()))
    b = sorted(map(tuple, alt_df().collect()))
    if a != b:
        only_a = [r for r in a if r not in b][:5]
        only_b = [r for r in b if r not in a][:5]
        raise AssertionError(
            f"shapes differ: {len(a)} vs {len(b)} rows; "
            f"window-only sample {only_a}; minby-only sample {only_b}")
    print(f"equality: {len(a)} rows identical", flush=True)

    def _isolate():
        spark.catalog.clearCache()
        try:
            spark.sparkContext._jvm.System.gc()
        except Exception:
            pass

    results: dict[str, list[float]] = {"head": [], "alt": [], "ctrl": []}
    ctrl = "x29_contamination_check"
    for rnd in range(rounds):
        for label, fn in (("head", head_df), ("alt", alt_df)):
            _isolate()
            ts = []
            for _ in range(reps):
                t0 = time.perf_counter()
                fn().write.format("noop").mode("overwrite").save()
                ts.append(round(time.perf_counter() - t0, 3))
            results[label].extend(ts)
            print(f"round {rnd} {label:4s} min {min(ts):6.2f}  all {ts}", flush=True)
        _isolate()
        ts = []
        for _ in range(max(2, reps - 2)):
            t0 = time.perf_counter()
            queries[ctrl](spark, sf_dir).write.format("noop").mode("overwrite").save()
            ts.append(round(time.perf_counter() - t0, 3))
        results["ctrl"].extend(ts)
        print(f"round {rnd} ctrl min {min(ts):6.2f}  all {ts}", flush=True)

    print("\n=== summary ===")
    for label, ts in results.items():
        st = sorted(ts)
        print(f"{label:5s} min {st[0]:6.2f} med {st[len(st)//2]:6.2f} n={len(st)}")


if __name__ == "__main__":
    main()
