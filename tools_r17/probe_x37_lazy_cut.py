#!/usr/bin/env python
"""A/B the BPE trainer's per-round cut eagerness (r16 verdict #5).

The shipped r17 shape uses LAZY per-round localCheckpoints (each
round's argmax collect materializes the cut inside its own job); the
old shape paid a separate eager blocking job per round. This probe
times both, interleaved, and counts driver JOBS per leg (the thing the
change removes) via the status tracker. The "old" leg is reproduced by
forcing eager=True through a stage_cut wrapper — values are identical
by construction and equality-gated below.

Usage: python tools_r17/probe_x37_lazy_cut.py [reps] [rounds]
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

    from spaceparts_data_pipeline_spark.operators import lineage, text
    from spaceparts_data_pipeline_spark.queries import all_queries
    from spaceparts_data_pipeline_spark.session import get_spark

    spark = get_spark(app_name="x37-lazy-cut-probe")
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
        text.stage_cut = eager_stage_cut if shape == "eager" else real_stage_cut

    def _isolate():
        spark.catalog.clearCache()
        try:
            spark.sparkContext._jvm.System.gc()
        except Exception:
            pass

    def job_count() -> int:
        # monotonically increasing job ids across the app
        tracker = spark.sparkContext.statusTracker()
        ids = tracker.getJobIdsForGroup(None) or []
        return max(ids) if ids else 0

    names = ["x37_bpe_merges", "x37b_bpe_merges_greedy"]
    # equality gate: lazy vs eager merge tables must be identical
    for name in names:
        set_shape("eager")
        a = sorted(map(tuple, queries[name](spark, sf_dir).collect()))
        set_shape("lazy")
        b = sorted(map(tuple, queries[name](spark, sf_dir).collect()))
        assert a == b, f"{name}: lazy/eager merge tables differ"
        print(f"equality {name}: {len(a)} merges identical", flush=True)

    acc: dict[tuple[str, str], list[float]] = {}
    jobs: dict[tuple[str, str], list[int]] = {}
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
                print(f"round {rnd} {name:26s} {shape:5s} min {min(ts):6.2f} "
                      f"all {ts} jobs {jobs[(name, shape)][-reps:]}",
                      flush=True)
        set_shape("lazy")
        _isolate()
        t0 = time.perf_counter()
        queries["x29_contamination_check"](spark, sf_dir) \
            .write.format("noop").mode("overwrite").save()
        print(f"round {rnd} ctl x29 {round(time.perf_counter() - t0, 3)}",
              flush=True)

    print("\n=== summary (min / median / jobs-median) ===")
    for (name, shape), ts in sorted(acc.items()):
        st = sorted(ts)
        js = sorted(jobs[(name, shape)])
        print(f"{name:28s} {shape:5s} min {st[0]:6.2f} med "
              f"{st[len(st)//2]:6.2f} jobs {js[len(js)//2]} n={len(st)}")
    text.stage_cut = real_stage_cut


if __name__ == "__main__":
    main()
