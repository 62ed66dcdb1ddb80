"""Machine-generated driver-window staleness ledger.

The driver value-checks the FIRST 50 driver-tier registry entries per
round (CORRECTNESS_r{N}.json). The two-tier rotation policy promises
every driver-tier entry a green driver row at most 4 rounds old — and
round 15 proved a hand-maintained ledger drifts (q03 misfiled into the
r13 tranche, x29 omitted entirely, demoted q05 still listed). This
module computes the ledger from the CORRECTNESS files themselves and
renders the COVERAGE.md section between the GENERATED-LEDGER markers;
``tests/test_staleness_ledger.py`` fails the suite when the committed
section drifts from the computed one, or when the CURRENT window would
let any entry exceed the 4-round staleness limit next round.

Regenerate after a rotation:  python -m tests.staleness_ledger --write
"""

from __future__ import annotations

import glob
import json
import os
import re

#: an entry's latest green driver row may be at most this many rounds
#: behind the most recent round (COVERAGE.md §rotation-policy)
MAX_STALENESS = 4
#: the driver checks this many leading registry entries per round
WINDOW = 50

BEGIN = "<!-- BEGIN GENERATED-LEDGER (tests/staleness_ledger.py; do not edit by hand) -->"
END = "<!-- END GENERATED-LEDGER -->"

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def correctness_rounds(repo_dir: str = REPO) -> dict[int, dict]:
    out = {}
    for p in glob.glob(os.path.join(repo_dir, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", p)
        if m:
            with open(p) as f:
                out[int(m.group(1))] = json.load(f)
    return out


def _row_green(row: dict) -> bool:
    if row.get("err"):
        return False
    # full-hash green; a rows-only row (hash_match null) counts only
    # when rows+schema matched — the weaker evidence the judge can see
    if row.get("hash_match"):
        return True
    return bool(row.get("rows_match") and row.get("schema_match")
                and row.get("hash_match") is None)


def latest_green(repo_dir: str = REPO) -> tuple[dict[str, int], int]:
    """(name -> latest round with a green driver row, newest round)."""
    rounds = correctness_rounds(repo_dir)
    latest: dict[str, int] = {}
    for r in sorted(rounds):
        for name, row in rounds[r].items():
            if _row_green(row):
                latest[name] = r
    return latest, (max(rounds) if rounds else 0)


def ledger(repo_dir: str = REPO) -> dict:
    """The full rotation picture for the CURRENT tree: per driver-tier
    entry its latest green round, the current first-50 window, and the
    drain obligations per upcoming round."""
    from spaceparts_data_pipeline_spark.queries import driver_queries

    driver = list(driver_queries())
    window = driver[:WINDOW]
    latest, newest = latest_green(repo_dir)
    next_round = newest + 1
    entries = {}
    for name in driver:
        last = latest.get(name)
        entries[name] = {
            "latest_green": last,
            "in_window": name in window,
            # the round by which this entry must next appear in the
            # window (it violates the limit one round later); entries
            # in the current window are about to get a next_round row
            "due": (next_round + MAX_STALENESS) if name in window
                   else (last + MAX_STALENESS if last is not None else next_round),
        }
    violations = sorted(
        n for n, e in entries.items()
        if not e["in_window"]
        and (e["latest_green"] is None
             or next_round - e["latest_green"] > MAX_STALENESS))
    return {"next_round": next_round, "window": window,
            "entries": entries, "violations": violations}


def render(repo_dir: str = REPO) -> str:
    led = ledger(repo_dir)
    nxt = led["next_round"]
    lines = [
        BEGIN,
        "",
        f"### Staleness ledger (computed from CORRECTNESS_r*.json; next round = r{nxt:02d})",
        "",
        f"Driver tier: {len(led['entries'])} entries; window = first {WINDOW}; "
        f"limit = {MAX_STALENESS}-round staleness. An entry is DUE in the round "
        "by which it must re-enter the window.",
        "",
    ]
    by_due: dict[int, list[str]] = {}
    for name, e in sorted(led["entries"].items()):
        if e["in_window"]:
            continue
        by_due.setdefault(e["due"], []).append(
            f"{name} (r{e['latest_green']:02d})" if e["latest_green"] else f"{name} (never)")
    for due in sorted(by_due):
        names = by_due[due]
        lines.append(f"- due r{due:02d} ({len(names)}): " + ", ".join(names))
    lines.append(f"- in the r{nxt:02d} window ({len(led['window'])}, due r{nxt + MAX_STALENESS:02d}): "
                 + ", ".join(led["window"]))
    if led["violations"]:
        lines.append(f"- **VIOLATIONS at r{nxt:02d}**: " + ", ".join(led["violations"]))
    else:
        lines.append(f"- violations at r{nxt:02d}: none — every out-of-window entry's "
                     "latest green row is within the limit.")
    lines += ["", END]
    return "\n".join(lines)


def committed_section(repo_dir: str = REPO) -> str | None:
    path = os.path.join(repo_dir, "COVERAGE.md")
    if not os.path.exists(path):
        return None
    text = open(path).read()
    m = re.search(re.escape(BEGIN) + r".*?" + re.escape(END), text, re.S)
    return m.group(0) if m else None


def write_section(repo_dir: str = REPO) -> str:
    path = os.path.join(repo_dir, "COVERAGE.md")
    text = open(path).read()
    block = render(repo_dir)
    if BEGIN in text:
        text, n = re.subn(re.escape(BEGIN) + r".*?" + re.escape(END), block,
                          text, flags=re.S)
        if n == 0:
            raise ValueError(
                "COVERAGE.md has the BEGIN GENERATED-LEDGER marker but no "
                "matching END marker — restore the END line before --write "
                "can replace the section")
    else:
        text = text.rstrip() + "\n\n" + block + "\n"
    with open(path, "w") as f:
        f.write(text)
    return block


if __name__ == "__main__":
    import sys

    if "--write" in sys.argv:
        print(write_section())
    else:
        print(render())
