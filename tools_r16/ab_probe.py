#!/usr/bin/env python
"""Multi-rep min probe for a named set of queries, mimicking bench.py's
methodology (noop sink, cache-clear+GC isolation, rebuild-inside-timer
for the corpus family). Prints min/median and the executed-plan node
counts. Usage: python tools_r16/ab_probe.py [reps] name [name...]"""
from __future__ import annotations

import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REBUILD = True  # corpus-family protocol: construction inside the timer


def main() -> None:
    reps = int(sys.argv[1])
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from spaceparts_data_pipeline_spark.session import get_spark
    from spaceparts_data_pipeline_spark.queries import all_queries

    spark = get_spark(app_name="ab-probe")
    spark.sparkContext.setLogLevel("ERROR")
    warm = "region.parquet" if os.path.exists(
        os.path.join(sf_dir, "region.parquet")) else "documents.parquet"
    spark.read.parquet(os.path.join(sf_dir, warm)).count()
    spark.range(1 << 14).repartition(spark.sparkContext.defaultParallelism) \
        .mapInPandas(lambda it: it, "id long") \
        .write.format("noop").mode("overwrite").save()
    queries = all_queries()
    for name in names:
        spark.catalog.clearCache()
        try:
            spark.sparkContext._jvm.System.gc()
        except Exception:
            pass
        ts = []
        last_df = None
        for _ in range(reps):
            t0 = time.perf_counter()
            last_df = queries[name](spark, sf_dir)
            last_df.write.format("noop").mode("overwrite").save()
            ts.append(time.perf_counter() - t0)
        plan = last_df._jdf.queryExecution().executedPlan().toString()
        counts = {p: len(re.findall(re.escape(p), plan)) for p in
                  ("Exchange hashpartitioning", "BroadcastExchange",
                   "Scan parquet", "Scan ExistingRDD")}
        ts.sort()
        print(f"{name:35s} min {ts[0]:6.2f}  med {ts[len(ts)//2]:6.2f}  "
              f"all {[round(t,2) for t in ts]}  {counts}", flush=True)


if __name__ == "__main__":
    main()
