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
