#!/usr/bin/env python
"""A/B the connected-components per-round cut eagerness (the x37
lesson applied to the label-propagation loop: each round previously
paid an eager blocking cut job before the convergence collect).

The "old" leg is reproduced by patching lineage.stage_cut to force
eager=True (connected_components resolves it via a function-local
import; jaccard_pairs' module-top binding is untouched and is eager
either way). Values are identical by construction and equality-gated.

Usage: python tools_r17/probe_cc_lazy_cut.py [reps] [rounds]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from spaceparts_data_pipeline_spark.operators import lineage
    from spaceparts_data_pipeline_spark.queries import all_queries
    from spaceparts_data_pipeline_spark.session import get_spark

    spark = get_spark(app_name="cc-lazy-cut-probe")
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).count()
    spark.range(1 << 14).repartition(spark.sparkContext.defaultParallelism) \
        .mapInPandas(lambda it: it, "id long") \
        .write.format("noop").mode("overwrite").save()
    queries = all_queries()

    real_stage_cut = lineage.stage_cut

    def eager_stage_cut(df, *, eager=True, reliable=False, unpersist=None):
        return real_stage_cut(df, eager=True, reliable=reliable,
                              unpersist=unpersist)

    def set_shape(shape: str):
        lineage.stage_cut = eager_stage_cut if shape == "eager" else real_stage_cut

    def _isolate():
        spark.catalog.clearCache()
        try:
            spark.sparkContext._jvm.System.gc()
        except Exception:
            pass

    def job_count() -> int:
        ids = spark.sparkContext.statusTracker().getJobIdsForGroup(None) or []
        return max(ids) if ids else 0

    names = ["d13_canonical_corpus", "d14_canonical_corpus_lsh",
             "d16_incremental_near_dedup"]
    for name in names:
        set_shape("eager")
        a = sorted(map(tuple, queries[name](spark, sf_dir).collect()))
        set_shape("lazy")
        b = sorted(map(tuple, queries[name](spark, sf_dir).collect()))
        assert a == b, f"{name}: lazy/eager outputs differ"
        print(f"equality {name}: {len(a)} rows identical", flush=True)

    acc: dict[tuple[str, str], list[float]] = {}
    jobs: dict[tuple[str, str], list[int]] = {}
    try:
        for rnd in range(rounds):
            for name in names:
                for shape in ("eager", "lazy"):
                    set_shape(shape)
                    _isolate()
                    for _ in range(reps):
                        j0 = job_count()
                        t0 = time.perf_counter()
                        queries[name](spark, sf_dir) \
                            .write.format("noop").mode("overwrite").save()
                        dt = round(time.perf_counter() - t0, 3)
                        acc.setdefault((name, shape), []).append(dt)
                        jobs.setdefault((name, shape), []).append(job_count() - j0)
                    ts = acc[(name, shape)][-reps:]
                    print(f"round {rnd} {name:28s} {shape:5s} min {min(ts):6.2f} "
                          f"all {ts} jobs {jobs[(name, shape)][-reps:]}",
                          flush=True)
            set_shape("lazy")
            _isolate()
            t0 = time.perf_counter()
            queries["x29_contamination_check"](spark, sf_dir) \
                .write.format("noop").mode("overwrite").save()
            print(f"round {rnd} ctl x29 {round(time.perf_counter() - t0, 3)}",
                  flush=True)
    finally:
        lineage.stage_cut = real_stage_cut

    print("\n=== summary (min / median / jobs-median) ===")
    for (name, shape), ts in sorted(acc.items()):
        st = sorted(ts)
        js = sorted(jobs[(name, shape)])
        print(f"{name:30s} {shape:5s} min {st[0]:6.2f} med "
              f"{st[len(st)//2]:6.2f} jobs {js[len(js)//2]} n={len(st)}")


if __name__ == "__main__":
    main()
