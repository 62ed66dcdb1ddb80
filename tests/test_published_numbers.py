"""README's published layer-throughput numbers must quote the newest
STAMPED per-round bench artifact (BENCH_r{N}.json), not a separately
run "clean" pass — two same-code runs both being honest, the round's
published number is the stamped one (r15 verdict "What's wrong" #3).
This test recomputes the README strings from the newest artifact, so
the next round's stamp forces the README to follow."""

from __future__ import annotations

import glob
import json
import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _newest_bench() -> tuple[int, dict]:
    """(round, {layer: median_rows_per_hour}) from the newest
    BENCH_r{N}.json wrapper. Handles both wrapper generations: a parsed
    compact line (bench.py emits ≤1.9k chars since r16) and the legacy
    2000-char truncated tail (medians regexed out of the fragment)."""
    paths = {}
    for p in glob.glob(os.path.join(REPO, "BENCH_r*.json")):
        m = re.search(r"BENCH_r(\d+)\.json$", p)
        if m:
            paths[int(m.group(1))] = p
    rnd = max(paths)
    with open(paths[rnd]) as f:
        wrapper = json.load(f)
    medians = {}
    parsed = wrapper.get("parsed")
    if isinstance(parsed, dict) and "layer_rows_per_hour" in parsed:
        for layer, rec in parsed["layer_rows_per_hour"].items():
            medians[layer] = rec["median"] if isinstance(rec, dict) else rec
        return rnd, medians
    tail = wrapper.get("tail", "")
    # compact line present in the tail even if the driver didn't parse
    line = tail.strip().rsplit("\n", 1)[-1]
    try:
        doc = json.loads(line)
        for layer, rec in doc["layer_rows_per_hour"].items():
            medians[layer] = rec["median"] if isinstance(rec, dict) else rec
        return rnd, medians
    except (ValueError, KeyError):
        pass
    for layer in ("bronze", "silver", "gold"):
        m = re.search(r'"%s":\s*{[^{}]*"median":\s*(\d+)' % layer, tail)
        if m:
            medians[layer] = int(m.group(1))
    return rnd, medians


def test_readme_quotes_stamped_bench_medians():
    rnd, medians = _newest_bench()
    assert set(medians) >= {"bronze", "silver", "gold"}, (
        f"could not extract layer medians from BENCH_r{rnd:02d}.json")
    readme = open(os.path.join(REPO, "README.md")).read()
    assert f"BENCH_r{rnd}.json" in readme, (
        f"README must cite the newest stamped artifact BENCH_r{rnd}.json")
    expect = {
        "bronze": f"{round(medians['bronze'] / 1e6):.0f}M rows/h bronze",
        "silver": f"{round(medians['silver'] / 1e6):.0f}M silver",
        "gold": f"{medians['gold'] / 1e9:.2f}B rows/h",
    }
    missing = {k: v for k, v in expect.items() if v not in readme}
    assert not missing, (
        f"README throughput numbers drifted from the stamped "
        f"BENCH_r{rnd}.json medians — update README.md to quote: {missing}")
