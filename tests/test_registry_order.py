"""Registration order IS grading order: the driver's correctness pass
covers ``list(queries())[:50]`` each round (verified r1-r4 — every
round's CORRECTNESS key set equals the first-50 slice).  Since r5 the
window is DERIVED from the committed CORRECTNESS_r*.json files rather
than a hand-frozen tuple (VERDICT r4 "Next round" #1): never-graded
queries first, then latest-grade-red, then greens stalest-first.  The
committed files only change between rounds, so the order is frozen for
a whole round by construction, and queries added mid-round enter the
window automatically as never-graded."""

from __future__ import annotations

import json
import os

import __spark_entry__ as entrymod
from data_ingestion_system_spark import registry

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _graded_rows() -> dict[str, dict]:
    """Latest driver row per query across all committed rounds."""
    import glob

    latest: dict[str, dict] = {}
    latest_round: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(_REPO, "CORRECTNESS_r*.json"))):
        rnd = int(os.path.basename(path)[len("CORRECTNESS_r"):-len(".json")])
        with open(path) as f:
            for name, row in json.load(f).items():
                if latest_round.get(name, -1) <= rnd:
                    latest[name], latest_round[name] = row, rnd
    return latest


def _is_green(name: str, row: dict, rows_only: set[str]) -> bool:
    if row.get("err") == "no_oracle" and name in rows_only:
        return row.get("spark_rows") is not None
    return row.get("err") is None and all(
        row.get(k) is True
        for k in ("rows_match", "schema_match", "hash_match"))


def test_window_leads_with_every_evidence_gap():
    """Every query whose latest driver grade is missing or red sits
    inside the 50-slot window, ahead of all green re-grades."""
    names = list(entrymod.queries())
    rows_only = set(names) - set(entrymod.oracle_sql())
    latest = _graded_rows()
    gaps = [n for n in names
            if n not in latest or not _is_green(n, latest[n], rows_only)]
    assert len(gaps) <= 50, "more gaps than window slots — widen rotation"
    assert names[:len(gaps)] == gaps or set(names[:len(gaps)]) == set(gaps), (
        "evidence gap outside the window front: "
        f"{[n for n in gaps if n not in names[:len(gaps)]]}")


def test_window_fills_are_stalest_greens():
    """After the gaps, window slots go to greens in ascending
    latest-graded-round order — the longest-unverified regression
    re-grades first."""
    names = list(entrymod.queries())
    rows_only = set(names) - set(entrymod.oracle_sql())
    latest = _graded_rows()
    hist = registry._grade_history()
    greens = [n for n in names
              if n in latest and _is_green(n, latest[n], rows_only)]
    green_rounds = [hist[n][0] for n in greens]
    assert green_rounds == sorted(green_rounds), (
        "green re-grades not stalest-first")


def test_rotation_is_deterministic():
    assert registry._rotated_order() == registry._rotated_order()
    names = list(entrymod.queries())
    assert names == registry._rotated_order()


def test_every_query_has_an_oracle():
    """Every declared query is oracle-checked — including the PRODUCTION
    sketch twins since r5, whose oracles pin group keys + row count + a
    Spark-side within_bounds flag against the exact answer (estimates
    themselves are engine-specific, so the bound, not the value, is the
    cross-engine contract)."""
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    rows_only = sorted(set(qs) - set(oracles))
    assert rows_only == [], rows_only
