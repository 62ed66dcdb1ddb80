#!/usr/bin/env python
"""Measured scale-up harness (SCALING.md's data source).

Synthesizes a 1x and an Nx (default 8x) copy of the scale-relevant
tables from $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), both
written as 32 parquet files per table — the realistic multi-file layout
a production lake has — then runs the scale-path operators at both
sizes and records wall time, shuffle read/write bytes, and output rows
per op. Shuffle bytes come from the Spark status REST API (the same
numbers the Spark UI shows), so the scaling table in SCALING.md is a
measurement, not a shape argument.

Shard synthesis is designed so each op's WORK scales with data honestly:

- lineitem / orders / events: key-shifted unions (8x rows, 8x keys —
  per-key group sizes constant, as real growth behaves).
- documents: per-shard alphabet rotation via ``translate`` — shards are
  DISJOINT in shingle space, so the near-dup pair structure is exactly
  N copies of the 1x structure (appending a tag would instead make
  every doc a cross-shard near-dup of its 7 twins and measure the
  fixture, not the operator).
- embeddings: per-shard deterministic SIGN mask (orthogonal diagonal
  ±1 transform) — within-shard cosines are preserved EXACTLY, while
  cross-shard cosines collapse to ~0 (random-sign inner products), so
  the similar-pair structure is N copies of the 1x structure. A small
  multiplicative jitter instead leaves every vector a ~0.999-cosine
  twin of its 7 shard copies and the pair count explodes superlinearly
  (measured: e03 159 -> 931 pairs at 2x) — that measures the fixture,
  not the operator.

Usage:  python scale_harness.py [--factor 8] [--skip-build]
Prints one JSON line per (op, scale) plus a final markdown table.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

N_FILES = 32
ID_STRIDE = 10_000_000          # divisible by 20: doc_id%20 splits survive
KEY_STRIDE = 1_000_000_000
ALPHA = "abcdefghijklmnopqrstuvwxyz"

#: the five LLM-ops scale paths (round-5 verdict #1) + the relational
#: trio already measured in round 5, re-run for continuity.
OPS = [
    "q01_pricing_summary",
    "q05_dedup_latest_events",
    "p01_silver_events_pipeline",
    "d07_minhash_lsh_pairs",
    "d13_canonical_corpus",
    "d14_canonical_corpus_lsh",
    "x29_contamination_check",
    "e03_similar_pairs_lsh",
    "e04_knn_ivf",
    # round-6 late additions: cross-run dedup (fingerprint anti join),
    # bigram heavy hitters, cross-run near-dup (band-store screen)
    "d15_incremental_dedup",
    "x31_bigram_topk",
    "x31b_bigram_topk_twopass",
    "d16_incremental_near_dedup",
]

TABLES = ("lineitem", "orders", "events", "documents", "embeddings")


def build_session():
    """Own builder (not session.get_spark): identical runtime confs but
    with the UI enabled so the status REST API serves shuffle metrics."""
    from pyspark.sql import SparkSession

    from spaceparts_data_pipeline_spark.session import RUNTIME_CONFS

    b = (
        SparkSession.builder.appName("spaceparts-scale-harness")
        .master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '*')}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", "0")
        # shuffle bytes are measured as before/after diffs of stage
        # totals from the status API — the iterative component-loop ops
        # run hundreds of stages per rep, and the default 1000-stage
        # retention evicts "before" stages mid-measurement (observed:
        # a negative shuffle diff for d16 at 16×); retain enough for
        # the longest op × reps
        .config("spark.ui.retainedStages", "50000")
        .config("spark.sql.warehouse.dir", "/tmp/spark-warehouse-scale")
    )
    for k, v in RUNTIME_CONFS.items():
        b = b.config(k, v)
    return b.getOrCreate()


def _shard(df, table: str, shard: int):
    from pyspark.sql import functions as F

    if shard == 0:
        return df
    if table == "lineitem":
        return df.withColumn("l_orderkey", F.col("l_orderkey") + shard * KEY_STRIDE)
    if table == "orders":
        return df.withColumn("o_orderkey", F.col("o_orderkey") + shard * KEY_STRIDE)
    if table == "events":
        return (df.withColumn("event_id", F.col("event_id") + shard * KEY_STRIDE)
                  .withColumn("user_id", F.col("user_id") + shard * ID_STRIDE))
    if table == "documents":
        rot = ALPHA[shard % 26:] + ALPHA[: shard % 26]
        return (df.withColumn("doc_id", F.col("doc_id") + shard * ID_STRIDE)
                  .withColumn("text", F.translate("text", ALPHA + ALPHA.upper(),
                                                  rot + rot.upper())))
    if table == "embeddings":
        sign = lambda i: F.when(  # noqa: E731
            F.pmod(F.xxhash64(F.lit(shard), i), F.lit(2)) == 0, F.lit(1.0)
        ).otherwise(F.lit(-1.0))
        return (df.withColumn("vec_id", F.col("vec_id") + shard * ID_STRIDE)
                  .withColumn("embedding",
                              F.transform("embedding",
                                          lambda x, i: (x * sign(i)).cast("float"))))
    raise ValueError(table)


def build_data(spark, src_dir: str, base: str, factor: int) -> None:
    for scale, n_shards in (("x1", 1), (f"x{factor}", factor)):
        out_dir = os.path.join(base, scale)
        if os.path.isdir(out_dir):
            shutil.rmtree(out_dir)
        for t in TABLES:
            src = spark.read.parquet(os.path.join(src_dir, f"{t}.parquet"))
            parts = [_shard(src, t, s) for s in range(n_shards)]
            df = parts[0]
            for p in parts[1:]:
                df = df.unionByName(p)
            df.repartition(N_FILES).write.mode("overwrite").parquet(
                os.path.join(out_dir, f"{t}.parquet"))
        print(f"built {out_dir}", file=sys.stderr)


def _stage_totals(spark) -> dict:
    ui = spark.sparkContext.uiWebUrl
    apps = json.load(urllib.request.urlopen(f"{ui}/api/v1/applications"))
    app_id = apps[0]["id"]
    tot = {"shuffle_read": 0, "shuffle_write": 0}
    for st in json.load(urllib.request.urlopen(f"{ui}/api/v1/applications/{app_id}/stages")):
        tot["shuffle_read"] += st.get("shuffleReadBytes", 0)
        tot["shuffle_write"] += st.get("shuffleWriteBytes", 0)
    return tot


def run_op(spark, queries, name: str, sf_dir: str, reps: int = 3) -> dict:
    spark.catalog.clearCache()
    try:
        spark.sparkContext._jvm.System.gc()
    except Exception:
        pass
    before = _stage_totals(spark)
    times = []
    for i in range(reps):
        # build INSIDE the timed region: the connected-components family
        # runs its iterative jobs eagerly at construction (localCheckpoint)
        # — building once outside the timer would exclude that work
        t0 = time.perf_counter()
        df = queries[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        times.append(time.perf_counter() - t0)
        if i == 0:
            after = _stage_totals(spark)
    rows = df.count()
    return {
        "op": name,
        "sec": round(min(times), 3),
        "sec_all": [round(t, 3) for t in times],
        "rows_out": rows,
        "shuffle_read_mb": round((after["shuffle_read"] - before["shuffle_read"]) / 1e6, 2),
        "shuffle_write_mb": round((after["shuffle_write"] - before["shuffle_write"]) / 1e6, 2),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=int, default=8)
    ap.add_argument("--skip-build", action="store_true")
    ap.add_argument("--ops", nargs="*", default=OPS)
    args = ap.parse_args()

    src_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    base = os.environ.get("SPARK_GRAFT_SCALE_DIR", "/tmp/spark_graft_scale")

    import __spark_entry__ as entry_mod

    spark = build_session()
    spark.sparkContext.setLogLevel("ERROR")
    if not args.skip_build:
        build_data(spark, src_dir, base, args.factor)

    queries = entry_mod.queries()
    # Arrow/python-worker warmup (same rationale as bench.py)
    spark.range(1 << 14).repartition(spark.sparkContext.defaultParallelism) \
        .mapInPandas(lambda it: it, "id long") \
        .write.format("noop").mode("overwrite").save()

    results: dict[str, dict[str, dict]] = {}
    for scale in ("x1", f"x{args.factor}"):
        sf_dir = os.path.join(base, scale)
        for op in args.ops:
            r = run_op(spark, queries, op, sf_dir)
            results.setdefault(op, {})[scale] = r
            print(json.dumps({"scale": scale, **r}), flush=True)

    xN = f"x{args.factor}"
    print(f"\n| op | 1x sec | {args.factor}x sec | time ratio | 1x rows | {args.factor}x rows | "
          f"{args.factor}x shuffle W MB | shuffle W ratio |")
    print("|---|---|---|---|---|---|---|---|")
    for op in args.ops:
        a, b = results[op]["x1"], results[op][xN]
        tr = round(b["sec"] / a["sec"], 2) if a["sec"] else float("nan")
        wr = (round(b["shuffle_write_mb"] / a["shuffle_write_mb"], 2)
              if a["shuffle_write_mb"] > 0.01 else "-")
        print(f"| {op} | {a['sec']} | {b['sec']} | {tr} | {a['rows_out']} | {b['rows_out']} | "
              f"{b['shuffle_write_mb']} | {wr} |")


if __name__ == "__main__":
    main()
