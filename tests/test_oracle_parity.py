"""Every registered query — BOTH tiers, local-only twins included —
must match its DuckDB oracle at the oracle SF: the local replica of the
driver's t2 correctness gate, run over the superset of what the driver
sees (COVERAGE.md §rotation-policy)."""

from __future__ import annotations

import pytest

import __spark_entry__ as entry_mod
from spaceparts_data_pipeline_spark.queries import (
    LOCAL_ONLY, all_oracles, all_queries,
)
from tests.oracle_harness import compare

QUERIES = all_queries()
ORACLES = all_oracles()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, sf_oracle, name):
    compare(spark, QUERIES[name], ORACLES.get(name), sf_oracle, name=name)


def test_driver_tier_composition():
    """The two-tier registry contract: the driver tier is exactly the
    full tier minus LOCAL_ONLY; every local-only entry names a
    surviving driver-tier twin; every demoted name really exists; and
    the driver window (first 50) holds no rows-only query."""
    driver = entry_mod.queries()
    driver_oracles = entry_mod.oracle_sql()
    assert set(driver) == set(QUERIES) - set(LOCAL_ONLY)
    missing_impl = set(LOCAL_ONLY) - set(QUERIES)
    assert not missing_impl, f"LOCAL_ONLY names unknown queries: {missing_impl}"
    bad_twin = {n: t for n, t in LOCAL_ONLY.items() if t not in driver}
    assert not bad_twin, f"local-only twins not in driver tier: {bad_twin}"
    window = list(driver)[:50]
    rows_only = [n for n in window if n not in driver_oracles]
    assert not rows_only, f"rows-only queries spending window slots: {rows_only}"
    # the standing tier-size guideline (r14/r15 verdicts): the ≤4-round
    # staleness discipline is only sustainable with ≤95 driver entries
    # against the 50-slot window — new twins go straight to LOCAL_ONLY
    assert len(driver) <= 95, (
        f"driver tier grew to {len(driver)} (>95): demote an oracle-twin "
        "to LOCAL_ONLY instead of growing the rotation debt")


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 1
    assert df.columns == ["document_category", "sales_eur", "cogs_eur", "gross_margin", "line_count"]


def test_dtype_gate_catches_hugeint_float_mismatch():
    """Regression for the r07 x34 red row: DuckDB SUM(BIGINT) returns
    HUGEINT (float64 in the compare frame) where Spark emits int64;
    every value compares equal under Python ==, but the driver's hash
    is dtype-sensitive. The local gate must fail on that shape BEFORE
    it burns a driver round."""
    import pandas as pd
    import pytest

    from tests.oracle_harness import assert_dtype_compatible

    sdf = pd.DataFrame({"source": ["a"], "total": pd.array([5], dtype="int64")})
    odf = pd.DataFrame({"source": ["a"], "total": pd.array([5.0], dtype="float64")})
    with pytest.raises(AssertionError, match="dtype"):
        assert_dtype_compatible(sdf, odf, "hugeint-regression")
    # equal families pass (int32 vs int64 is fine; so is the identity)
    assert_dtype_compatible(sdf, sdf, "identity")
    odf_ok = odf.assign(total=odf["total"].astype("int32"))
    assert_dtype_compatible(sdf, odf_ok, "int-family")


def test_attestation_verdict_includes_dtype_outcome(spark, sf_oracle):
    """r15 advice: the attestation verdict was computed from
    rows/schema/hash only, BEFORE assert_dtype_compatible — a query
    with incompatible dtypes but matching normalized values (e.g. an
    empty result set over int64 vs float64 columns) recorded verdict
    'pass' in PARITY_LOCAL_r{N}.json while the pytest gate itself
    failed. The record must agree with the gate."""
    from pyspark.sql import functions as F

    from tests.oracle_harness import PARITY_RECORDS, compare

    def q(spark_, sf_dir):
        return (spark_.range(1)
                .select(F.lit(5).cast("long").alias("total"))
                .where(F.lit(False)))

    with pytest.raises(AssertionError, match="dtype"):
        compare(spark, q, "SELECT 5.0 AS total WHERE false", sf_oracle,
                name="_dtype_verdict_probe")
    rec = PARITY_RECORDS.pop("_dtype_verdict_probe")
    assert rec["rows_match"] and rec["schema_match"] and rec["hash_match"]
    assert rec["dtype_compatible"] is False
    assert rec["verdict"] == "fail"


def test_every_query_has_oracle_or_is_approximate(spark):
    # d14 left this set in round 8; d16 and s05 left in round 9 (the
    # same playbook: admit-set equality with the exact path is a tested
    # property at the oracle SFs, so each carries the exact-path SQL as
    # its value oracle — see the ORACLE NOTEs in queries/llm.py and
    # queries/stream.py). What remains is genuinely hash-OUTPUT-valued
    # (pair lists / signatures xxhash emits) or approximate by contract.
    approximate = {"d07_minhash_lsh_pairs", "d08_simhash",
                   "e03_similar_pairs_lsh",
                   "e03b_similar_pairs_lsh_recall", "e04_knn_ivf",
                   "x18_approx_quantiles"}
    missing = set(QUERIES) - set(ORACLES) - approximate
    assert not missing, f"queries lacking oracles: {missing}"
