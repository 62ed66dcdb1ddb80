"""Physical-plan regression tests: the properties that make these
queries survive a 100× scale-up, asserted on `.explain` output so a
refactor can't silently lose them.

- filters reach the parquet scan (PushedFilters non-empty)
- small dims join via BroadcastHashJoin (no shuffled join on dim side)
- aggregations have a map-side partial pass (partial_ functions)
- no CartesianProduct / BroadcastNestedLoopJoin outside the
  deliberately-cross kNN operators
- whole-stage codegen is present in the hot paths
"""

from __future__ import annotations

import pytest

from spaceparts_data_pipeline_spark.queries import core


def plan_of(spark, name, sf_dir):
    df = core.QUERIES[name](spark, sf_dir)
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.mark.parametrize("name", ["q01_pricing_summary", "q03_top_revenue_orders", "q04_flagship_sales_eur"])
def test_filters_push_to_scan_where_present(spark, sf_oracle, name):
    plan = plan_of(spark, name, sf_oracle)
    if name != "q04_flagship_sales_eur":  # q04 has no row filters
        assert "PushedFilters: [" in plan and "PushedFilters: []" not in plan.split("PushedFilters: [")[0]
    assert "FileScan parquet" in plan


def test_dims_broadcast_in_flagship(spark, sf_oracle):
    plan = plan_of(spark, "q04_flagship_sales_eur", sf_oracle)
    assert plan.count("BroadcastHashJoin") >= 4      # supplier, nation, fx, doctype
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_partial_aggregation_map_side(spark, sf_oracle):
    df = core.QUERIES["q01_pricing_summary"](spark, sf_oracle)
    df.collect()  # finalize THIS df's AQE plan (a .write spawns a separate execution)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "partial_" in plan                         # map-side combine before the shuffle
    assert "*(1)" in plan                             # whole-stage codegen spans ("*(n)" markers)


def test_no_cartesian_outside_knn(spark, sf_oracle):
    for name in core.QUERIES:
        if name.startswith(("e0",)):
            continue
        plan = plan_of(spark, name, sf_oracle)
        assert "CartesianProduct" not in plan, name


def test_column_pruning_reaches_scan(spark, sf_oracle):
    plan = plan_of(spark, "q03_top_revenue_orders", sf_oracle)
    # lineitem scan must read only the 4 needed columns, not all 11
    scan = [l for l in plan.splitlines() if "lineitem" in l and "FileScan" in l][0]
    assert "ReadSchema: struct<l_orderkey" in scan
    assert "l_comment" not in scan and "l_partkey" not in scan


def test_semi_join_stays_semi(spark, sf_oracle):
    plan = plan_of(spark, "q11_changed_keys_semi", sf_oracle)
    assert "LeftSemi" in plan
