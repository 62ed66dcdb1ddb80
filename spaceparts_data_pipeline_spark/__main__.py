"""CLI: run the medallion pipeline over a landing directory.

Usage:
    python -m spaceparts_data_pipeline_spark --source-dir DIR [--mode full|incremental]
        [--ts-col dwcreateddate] [--database spaceparts] [--horizon YYYY-MM-DD]

Each ``<table>.parquet`` / ``.jsonl`` / ``.json`` / ``.csv`` in
--source-dir becomes a source table; JSONL/CSV go through the
corrupt-capture readers, with malformed lines preserved raw in
``landing_quarantine_<table>`` instead of poisoning bronze. The pipeline
lands bronze_/silver_/gold_ tables in the session catalog and prints a
one-line JSON status report to stdout.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="spaceparts_data_pipeline_spark")
    p.add_argument("--source-dir", required=True, help="directory of <table>.parquet inputs")
    p.add_argument("--mode", choices=["full", "incremental"], default="full")
    p.add_argument("--ts-col", default="dwcreateddate", help="watermark column for incremental mode")
    p.add_argument("--database", default="spaceparts", help="catalog database for layer tables")
    p.add_argument("--horizon", default=None, help="quarantine future-date cutoff (default: today+730d)")
    p.add_argument("--skip-gold", action="store_true", help="run bronze+silver only")
    p.add_argument("--warehouse", default=None,
                   help="persistent warehouse dir (Hive/Derby catalog) so layer tables "
                        "survive across runs; default: in-memory catalog, single run")
    args = p.parse_args(argv)

    from spaceparts_data_pipeline_spark.session import get_spark
    from spaceparts_data_pipeline_spark.plans import runner
    from spaceparts_data_pipeline_spark.streaming.incremental import run_incremental_pipeline

    spark = get_spark(app_name="spaceparts-pipeline", persistent_warehouse=args.warehouse)
    spark.sparkContext.setLogLevel("ERROR")
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {args.database}")
    spark.catalog.setCurrentDatabase(args.database)

    from spaceparts_data_pipeline_spark.sources.files import load_landing_dir

    sources, landing_quarantined, parents = load_landing_dir(spark, args.source_dir)
    if not sources:
        print(json.dumps({
            "status": "failed",
            "error": f"no *.parquet/*.jsonl/*.csv in {args.source_dir}",
        }))
        return 2

    if args.mode == "incremental":
        result = run_incremental_pipeline(spark, sources, ts_col=args.ts_col, skip_gold=args.skip_gold)
        for p in parents:
            p.unpersist()
        statuses = [t.get("status") for layer in ("bronze", "silver") for t in result[layer].values()]
        statuses += [t.get("status") for t in result["gold"].values()]
        status = "success" if all(x == "success" for x in statuses) else (
            "failed" if all(x != "success" for x in statuses) else "completed_with_errors")
    else:
        b = runner.run_bronze_layer(spark, sources)
        for p in parents:
            p.unpersist()
        s = runner.run_silver_layer(spark, horizon=args.horizon)
        g = {"status": "skipped"} if args.skip_gold else runner.run_gold_layer(spark)
        result = {"bronze": b, "silver": s, "gold": g}
        statuses = [b["status"], s["status"]] + ([] if args.skip_gold else [g["status"]])
        status = "success" if all(x == "success" for x in statuses) else (
            "failed" if all(x == "failed" for x in statuses) else "completed_with_errors")

    summary = {
        "status": status,
        "database": args.database,
        **({"landing_quarantined": landing_quarantined} if landing_quarantined else {}),
        "tables": {
            layer: {
                t: r.get("records") for t, r in info.get("tables", {}).items()
            } if isinstance(info, dict) and "tables" in info else info.get("status", info)
            for layer, info in (result.items() if args.mode == "full" else result.items())
            if isinstance(info, dict)
        },
    }
    print(json.dumps(summary, default=str))
    return 0 if status == "success" else 1


if __name__ == "__main__":
    sys.exit(main())
