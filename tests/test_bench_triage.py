"""bench.py regression triage (VERDICT r4 #3): excursions vs the
best-known quiet record are listed with both loadavgs; contended runs
never update the record."""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _triage_regressions


def _seed(repo, queries, sf=0.1):
    with open(os.path.join(repo, "BENCH_BEST.json"), "w") as f:
        json.dump({"sf": sf, "queries": queries}, f)


def _best(repo):
    with open(os.path.join(repo, "BENCH_BEST.json")) as f:
        return json.load(f)


def test_flags_only_material_excursions(tmp_path):
    repo = str(tmp_path)
    _seed(repo, {"q_slow": {"sec": 2.0, "loadavg": 0.4},
                 "q_small": {"sec": 0.1, "loadavg": 0.4},
                 "q_fine": {"sec": 3.0, "loadavg": 0.4}})
    summary = {"loadavg_start": 4.2, "contended": True}
    regs = _triage_regressions(
        repo, 0.1,
        {"q_slow": 4.0,     # 2x and +2s -> flagged
         "q_small": 0.9,    # 9x but +0.8s < 1s floor -> not flagged
         "q_fine": 3.2,     # +0.2s -> not flagged
         "q_new": 5.0},     # no record -> not flagged
        summary)
    assert [r["query"] for r in regs] == ["q_slow"]
    r = regs[0]
    assert r["ratio"] == 2.0 and r["best_loadavg"] == 0.4
    assert r["loadavg"] == 4.2 and r["likely_contention"] is True
    # contended run must NOT rewrite the record
    assert _best(repo)["queries"]["q_slow"]["sec"] == 2.0


def test_quiet_run_updates_record_with_minima(tmp_path):
    repo = str(tmp_path)
    _seed(repo, {"q": {"sec": 2.0, "loadavg": 0.9}})
    summary = {"loadavg_start": 0.3, "contended": False}
    regs = _triage_regressions(repo, 0.1, {"q": 1.5, "q2": 7.0}, summary)
    assert regs == []
    best = _best(repo)
    assert best["queries"]["q"] == {"sec": 1.5, "loadavg": 0.3}
    assert best["queries"]["q2"] == {"sec": 7.0, "loadavg": 0.3}


def test_record_is_per_scale(tmp_path):
    repo = str(tmp_path)
    _seed(repo, {"q": {"sec": 0.1, "loadavg": 0.2}}, sf=0.01)
    summary = {"loadavg_start": 0.3, "contended": False}
    # sf mismatch: no cross-scale comparisons, record restarts at this sf
    regs = _triage_regressions(repo, 0.1, {"q": 5.0}, summary)
    assert regs == []
    assert _best(repo) == {"sf": 0.1,
                           "queries": {"q": {"sec": 5.0, "loadavg": 0.3}}}


def test_retime_contended_suspects(monkeypatch):
    """r5 verdict #6: when the capture ends contended, queries reading
    >1.3x their quiet record are re-timed once after a quiet-wait and
    keep the min; quiet endings and recordless queries are untouched."""
    import bench

    best = {"sf": 0.1, "queries": {"q_sus": {"sec": 1.0, "loadavg": 0.4},
                                   "q_ok": {"sec": 1.0, "loadavg": 0.4}}}
    timings = {"q_sus": 2.0, "q_ok": 1.1, "q_new": 9.0}
    ran = []
    qs = {n: (lambda spark, sf, n=n: n) for n in timings}

    class _Cat:
        def clearCache(self):
            pass

    class _Spark:
        catalog = _Cat()

    monkeypatch.delenv("SPARK_GRAFT_BENCH_NO_WAIT", raising=False)

    # quiet ending: no re-timing at all
    monkeypatch.setattr(bench.os, "getloadavg", lambda: (0.5, 0.5, 0.5))
    bench._retime_contended_suspects(_Spark(), qs, ran.append, timings, best)
    assert ran == [] and timings["q_sus"] == 2.0

    # contended ending: only the >1.3x-with-record query re-runs
    monkeypatch.setattr(bench.os, "getloadavg", lambda: (4.0, 2.0, 1.0))
    monkeypatch.setattr(bench, "wait_for_quiet_host", lambda: 0.5)
    bench._retime_contended_suspects(_Spark(), qs, ran.append, timings, best)
    assert ran == ["q_sus"]
    assert timings["q_sus"] < 2.0          # min kept from the fast re-run
    assert timings["q_ok"] == 1.1 and timings["q_new"] == 9.0
