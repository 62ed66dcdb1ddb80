#!/usr/bin/env python
"""Capture .explain('formatted') for queries into plans/r17/<name>_<tag>.txt.

Usage: python tools_r17/capture_plans.py <tag> [--sf-dir DIR] [--mode M] [name ...]
With no names: every query in the full registry (local-only twins too).
--sf-dir overrides $SPARK_GRAFT_SF_DIR (so the multi-file scale layouts
can be captured alongside the single-file bench layout; tag the output
accordingly, e.g. `multifile32_after`). --mode sets
spark.spaceparts.shareSubtrees for the capture (auto|off|on) so the
conf-gated shapes can be pinned per mode. Plans are built but NOT
executed (explain is driver-side) — except queries whose construction
itself runs jobs (BPE trainers, component loops); those run their
construction jobs.
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("tag")
    ap.add_argument("names", nargs="*")
    ap.add_argument("--sf-dir", default=None)
    ap.add_argument("--mode", default=None, choices=["auto", "off", "on"])
    args = ap.parse_args()

    sf_dir = args.sf_dir or os.environ.get("SPARK_GRAFT_SF_DIR",
                                           "/root/testdata/sf0.1")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                           "plans", "r17")
    os.makedirs(out_dir, exist_ok=True)

    from spaceparts_data_pipeline_spark.session import get_spark
    from spaceparts_data_pipeline_spark.queries import all_queries

    spark = get_spark(app_name=f"plan-capture-{args.tag}")
    spark.sparkContext.setLogLevel("ERROR")
    if args.mode:
        spark.conf.set("spark.spaceparts.shareSubtrees", args.mode)
    queries = all_queries()
    todo = args.names or list(queries)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    for name in todo:
        try:
            df = queries[name](spark, sf_dir)
            txt = df._jdf.queryExecution().explainString(mode)
        except Exception as e:  # capture the failure instead of dying mid-sweep
            txt = f"EXPLAIN FAILED: {type(e).__name__}: {e}"
        with open(os.path.join(out_dir, f"{name}_{args.tag}.txt"), "w") as fh:
            fh.write(txt)
        print(name, "ok" if not txt.startswith("EXPLAIN FAILED") else "FAIL")


if __name__ == "__main__":
    main()
