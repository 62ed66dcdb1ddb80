"""The rotation contract, enforced mechanically (r15 verdict next-round
#2: the hand-written COVERAGE.md ledger drifted — q03 misfiled, x29
omitted, demoted q05 still listed). These tests compute the ledger from
the CORRECTNESS files and fail the suite when

1. the CURRENT first-50 window would let any driver-tier entry exceed
   the 4-round staleness limit in the next round, or
2. COVERAGE.md's generated ledger section differs from the computed one
   (regenerate with ``python -m tests.staleness_ledger --write``).
"""

from __future__ import annotations

from tests import staleness_ledger as sl


def test_window_covers_every_due_entry():
    led = sl.ledger()
    assert not led["violations"], (
        f"entries that exceed {sl.MAX_STALENESS}-round staleness at "
        f"r{led['next_round']} unless rotated into the first-{sl.WINDOW} "
        f"window: {led['violations']} — fix the _PRIORITY order in "
        "spaceparts_data_pipeline_spark/queries/__init__.py, then "
        "regenerate the ledger (python -m tests.staleness_ledger --write)")


def test_coverage_md_ledger_matches_computed():
    committed = sl.committed_section()
    assert committed is not None, (
        "COVERAGE.md has no generated ledger section — run "
        "python -m tests.staleness_ledger --write")
    assert committed == sl.render(), (
        "COVERAGE.md's generated ledger section is stale — run "
        "python -m tests.staleness_ledger --write")


def test_ledger_green_row_semantics():
    """_row_green mirrors the driver gate: err kills, full hash wins,
    rows-only counts only when hash was not computed at all."""
    assert sl._row_green({"rows_match": True, "schema_match": True,
                          "hash_match": True, "err": None})
    assert not sl._row_green({"rows_match": True, "schema_match": True,
                              "hash_match": True, "err": "boom"})
    assert not sl._row_green({"rows_match": True, "schema_match": True,
                              "hash_match": False, "err": None})
    assert sl._row_green({"rows_match": True, "schema_match": True,
                          "hash_match": None, "err": None})
    assert not sl._row_green({"rows_match": False, "schema_match": True,
                              "hash_match": None, "err": None})


def test_identical_oracle_audit():
    """r15 verdict next-round #7: the audit that produced the q05/q25
    demotions, run mechanically every round — two DRIVER-tier entries
    sharing one oracle text are redundant window evidence unless they
    are DISTINCT capabilities under that text (the documented batch vs
    Structured-Streaming pairs). A new identical-oracle pair must
    either demote one side to LOCAL_ONLY or join the allowlist with a
    capability rationale."""
    from collections import defaultdict

    from spaceparts_data_pipeline_spark.queries import driver_oracles

    # batch vs streaming execution are distinct capabilities under one
    # oracle text: foreachBatch, checkpointing and store-replay
    # semantics only the streaming row evidences (same reasoning keeps
    # d15/s04 and d16/s05 apart — those differ textually today)
    allowed = {frozenset({"d26_incremental_semdedup",
                          "s06_stream_ingest_semdedup"})}
    by_text = defaultdict(list)
    for name, sql in driver_oracles().items():
        by_text[" ".join(sql.split())].append(name)
    offenders = [sorted(names) for names in by_text.values()
                 if len(names) > 1 and frozenset(names) not in allowed]
    assert not offenders, (
        f"driver-tier entries share one oracle text: {offenders} — demote "
        "one side to LOCAL_ONLY (queries/__init__.py) or allowlist the "
        "pair here with a distinct-capability rationale")
