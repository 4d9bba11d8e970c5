"""Unit tests for the bench regression tripwire (tools/bench_compare.py)
— pure Python, no Spark: the tool's verdict logic must flag exactly the
median-past-1.5x-spread-max case and tolerate format drift (driver
wrapper vs sidecar, missing spreads, added/dropped queries)."""

from __future__ import annotations

import json
import subprocess
import sys
import os

TOOL = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tools",
    "bench_compare.py",
)


def _run(tmp_path, cur: dict, prev: dict) -> subprocess.CompletedProcess:
    a = tmp_path / "cur.json"
    b = tmp_path / "prev.json"
    a.write_text(json.dumps(cur))
    b.write_text(json.dumps(prev))
    return subprocess.run(
        [sys.executable, TOOL, str(a), str(b)], capture_output=True, text=True
    )


def test_clean_run_passes(tmp_path):
    prev = {"queries": {"q": 1.0}, "spread": {"q": [0.9, 1.2]}}
    cur = {"queries": {"q": 1.7}}  # 1.7 <= 1.5 * 1.2
    r = _run(tmp_path, cur, prev)
    assert r.returncode == 0, r.stdout
    assert "no regressions" in r.stdout


def test_regression_fails(tmp_path):
    prev = {"queries": {"q": 1.0}, "spread": {"q": [0.9, 1.2]}}
    cur = {"queries": {"q": 1.81}}  # > 1.5 * 1.2 = 1.8
    r = _run(tmp_path, cur, prev)
    assert r.returncode == 1
    assert "REGRESSION" in r.stdout


def test_no_spread_falls_back_to_median(tmp_path):
    prev = {"queries": {"q": 1.0}}  # pre-r5 format: no spread
    assert _run(tmp_path, {"queries": {"q": 1.49}}, prev).returncode == 0
    assert _run(tmp_path, {"queries": {"q": 1.51}}, prev).returncode == 1


def test_new_and_dropped_queries_never_fail(tmp_path):
    prev = {"queries": {"old": 1.0}, "spread": {"old": [1.0, 1.0]}}
    cur = {"queries": {"new": 99.0}}
    r = _run(tmp_path, cur, prev)
    assert r.returncode == 0
    assert "NEW" in r.stdout and "DROPPED" in r.stdout


def test_extended_section_is_checked(tmp_path):
    prev = {
        "queries": {},
        "extended": {"x": 2.0},
        "extended_spread": {"x": [1.8, 2.0]},
    }
    cur = {"queries": {}, "extended": {"x": 3.1}}  # > 1.5 * 2.0
    assert _run(tmp_path, cur, prev).returncode == 1


def test_driver_wrapper_format_accepted(tmp_path):
    prev = {"parsed": {"queries": {"q": 1.0}, "spread": {"q": [1.0, 1.0]}}}
    cur = {"queries": {"q": 1.0}}
    assert _run(tmp_path, cur, prev).returncode == 0


def test_unparsed_driver_wrapper_rejected_with_message(tmp_path):
    prev = {"parsed": None, "tail": "..."}  # the BENCH_r05.json failure mode
    r = _run(tmp_path, {"queries": {}}, prev)
    assert r.returncode != 0
    assert "parsed:null" in r.stdout + r.stderr


def test_bench_compact_line_degrades_instead_of_dying():
    """ADVICE r6 (bench.py:162): an oversized stdout payload must shed
    the bulky per-query maps and still emit parseable JSON with the
    totals intact — never abort after the timing work completed."""
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import bench

    payload = {
        "metric": "headline_total",
        "value": 12.5,
        "unit": "sec",
        "queries": {f"q{i:03d}_{'x' * 30}": 0.1 for i in range(40)},
        "extended": {f"e{i:03d}_{'y' * 30}": 0.2 for i in range(40)},
        "extended_total": 8.0,
        "sf": 0.1,
    }
    line = bench.compact_line(dict(payload), "/tmp/DETAIL.json", cap=1900)
    assert len(line) < 1900
    out = json.loads(line)
    assert out["value"] == 12.5 and out["extended_total"] == 8.0
    assert "extended" not in out  # bulkiest map shed first
    assert out["truncated"] == "see DETAIL.json"
    # an already-compact payload passes through untouched
    small = {"metric": "headline_total", "value": 1.0, "queries": {"q1": 1.0}}
    assert json.loads(bench.compact_line(dict(small), "/tmp/D.json")) == small
