#!/usr/bin/env python
"""Capture .explain('formatted') for queries into plans/r16/<name>_<tag>.txt.

Usage: python tools_r16/capture_plans.py <tag> [name ...]
With no names: every query in the full registry (local-only twins too).
Plans are built at $SPARK_GRAFT_SF_DIR (default sf0.1) but NOT executed
(explain is driver-side) — except queries whose construction itself runs
jobs (BPE trainers, component loops); those run their construction jobs.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                           "plans", "r16")
    os.makedirs(out_dir, exist_ok=True)

    from spaceparts_data_pipeline_spark.session import get_spark
    from spaceparts_data_pipeline_spark.queries import all_queries

    spark = get_spark(app_name=f"plan-capture-{tag}")
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()
    todo = names or list(queries)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    for name in todo:
        try:
            df = queries[name](spark, sf_dir)
            txt = df._jdf.queryExecution().explainString(mode)
        except Exception as e:  # capture the failure instead of dying mid-sweep
            txt = f"EXPLAIN FAILED: {type(e).__name__}: {e}"
        with open(os.path.join(out_dir, f"{name}_{tag}.txt"), "w") as fh:
            fh.write(txt)
        print(name, "ok" if not txt.startswith("EXPLAIN FAILED") else "FAIL")


if __name__ == "__main__":
    main()
