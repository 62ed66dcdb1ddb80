#!/usr/bin/env python
"""Benchmark the engine's headline queries.

Runs at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS]; prints ONE JSON line:
{"metric": ..., "value": <total sec>, "unit": "sec", "queries": {...}, "sf": ...}

Each query executes fully through the noop sink (no driver collect, no
result materialization cost) — the measured time is scan + compute +
shuffle, which is what scales.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

#: headline set: flagship + one representative per operator family whose
#: cost is scale-relevant (agg, join+topk, window dedup, cross-fact,
#: composite silver slice, minhash LSH, knn, text quality).
HEADLINE = [
    "q01_pricing_summary",
    "q03_top_revenue_orders",
    "q04_flagship_sales_eur",
    "q05_dedup_latest_events",
    "q16_budget_variance_monthly",
    "p01_silver_events_pipeline",
    "d04_text_quality",
    "d07_minhash_lsh_pairs",
    "e01_knn_topk",
    "e03_similar_pairs_lsh",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    from spaceparts_data_pipeline_spark.session import get_spark
    import __spark_entry__ as entry_mod

    spark = get_spark(app_name="spaceparts-bench")
    spark.sparkContext.setLogLevel("ERROR")
    queries = entry_mod.queries()

    # JVM/codegen warmup on the smallest table so query 1 isn't penalized.
    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).count()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        df = queries[name](spark, sf_dir)
        best = float("inf")
        for _ in range(2):  # min of 2: steady-state, amortizes codegen compile
            start = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - start)
        timings[name] = round(best, 3)

    total = round(sum(timings.values()), 3)
    print(json.dumps({
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf),
    }))


if __name__ == "__main__":
    main()
