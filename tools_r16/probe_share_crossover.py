#!/usr/bin/env python
"""Interleaved A/B of the shared-subtree variants vs HEAD shapes at a
chosen data scale — the larger-SF crossover probe OPTIMIZATION_r16.md
changes 3-4 deferred.

The share toggles are runtime confs read at query-construction time
(`spark.spaceparts.shareSubtrees` = on|off|auto), so one session can
interleave both variants rep-by-rep: per round, each named query runs
`reps` times with sharing OFF then `reps` times ON (same session, same
cache-clear+GC isolation as bench.py), and a control query runs once
per round to tag machine-noise windows. Values are compared exactly
(sorted collect) once per query at the probe scale before any timing.

Usage:
  python tools_r16/probe_share_crossover.py --factor 64 [--build] \
      [--reps 5] [--rounds 3] [--scale x64] \
      [--names e06_knn_ivf_pq d23_charlm_quality ...] \
      [--control x29_contamination_check]

Data dirs come from scale_harness.build_data under /tmp/share_probe_f<N>
(x1 + x<N> layouts, 32 files/table — the standard multi-file layout).
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_NAMES = [
    "e06_knn_ivf_pq",
    "d23_charlm_quality",
    "d24_dsir_importance",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=int, default=64)
    ap.add_argument("--build", action="store_true")
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--scale", default=None,
                    help="x1 or x<factor>; default x<factor>")
    ap.add_argument("--names", nargs="*", default=DEFAULT_NAMES)
    ap.add_argument("--control", default="x29_contamination_check")
    ap.add_argument("--skip-equality", action="store_true")
    args = ap.parse_args()

    base = f"/tmp/share_probe_f{args.factor}"
    scale = args.scale or f"x{args.factor}"
    sf_dir = os.path.join(base, scale)

    import scale_harness
    from spaceparts_data_pipeline_spark.session import get_spark
    from spaceparts_data_pipeline_spark.queries import all_queries

    spark = get_spark(app_name="share-crossover-probe")
    spark.sparkContext.setLogLevel("ERROR")

    if args.build or not os.path.isdir(sf_dir):
        src = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
        scale_harness.build_data(spark, src, base, args.factor)

    # warmups: JVM/codegen + Python worker pool (bench.py protocol)
    spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).count()
    spark.range(1 << 14).repartition(spark.sparkContext.defaultParallelism) \
        .mapInPandas(lambda it: it, "id long") \
        .write.format("noop").mode("overwrite").save()

    queries = all_queries()

    def _isolate():
        spark.catalog.clearCache()
        try:
            spark.sparkContext._jvm.System.gc()
        except Exception:
            pass

    def timed(name: str, mode: str, reps: int) -> list[float]:
        spark.conf.set("spark.spaceparts.shareSubtrees", mode)
        _isolate()
        out = []
        for _ in range(reps):
            t0 = time.perf_counter()
            df = queries[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            out.append(round(time.perf_counter() - t0, 3))
        return out

    # value equality gate: ON vs OFF must be row-identical at this scale
    # (sorted lists so multiplicity drift fails; sample the symmetric
    # difference on mismatch — ADVICE r16)
    if not args.skip_equality:
        for name in args.names:
            spark.conf.set("spark.spaceparts.shareSubtrees", "off")
            a = sorted(map(tuple, queries[name](spark, sf_dir).collect()))
            spark.conf.set("spark.spaceparts.shareSubtrees", "on")
            b = sorted(map(tuple, queries[name](spark, sf_dir).collect()))
            if a != b:
                only_a = [r for r in a if r not in b][:5]
                only_b = [r for r in b if r not in a][:5]
                raise AssertionError(
                    f"{name}: ON/OFF outputs differ at {scale} "
                    f"({len(a)} vs {len(b)} rows; off-only {only_a}; "
                    f"on-only {only_b})")
            print(f"equality {name}: {len(a)} rows identical", flush=True)

    results: dict[tuple[str, str], list[float]] = {}
    for rnd in range(args.rounds):
        for name in args.names:
            for mode in ("off", "on"):
                ts = timed(name, mode, args.reps)
                results.setdefault((name, mode), []).extend(ts)
                print(f"round {rnd} {name:28s} {mode:3s} "
                      f"min {min(ts):6.2f}  all {ts}", flush=True)
        if args.control:
            ts = timed(args.control, "off", max(2, args.reps - 2))
            results.setdefault((args.control, "ctrl"), []).extend(ts)
            print(f"round {rnd} {args.control:28s} ctl "
                  f"min {min(ts):6.2f}  all {ts}", flush=True)

    print("\n=== summary (min / median over all rounds) ===")
    summary = {}
    for (name, mode), ts in sorted(results.items()):
        st = sorted(ts)
        summary[f"{name}:{mode}"] = {
            "min": st[0], "median": st[len(st) // 2], "n": len(st)}
        print(f"{name:32s} {mode:4s} min {st[0]:6.2f} "
              f"med {st[len(st)//2]:6.2f} n={len(st)}")
    print(json.dumps({"scale": scale, "factor": args.factor,
                      "reps": args.reps, "rounds": args.rounds,
                      "summary": summary}))


if __name__ == "__main__":
    main()
