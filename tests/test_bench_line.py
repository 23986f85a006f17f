"""Guard the driver contract for bench.py's stdout line.

The driver captures only ~2000 chars of bench.py's final JSON line;
BENCH_r08.json came back ``parsed: null`` when the line (raw + normalized
walls for 55 queries) outgrew that. These tests pin the compact emitter:
the line must parse, carry the contract fields, and stay under 1800 chars
even with pessimistic 3-digit walls for every headline query.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import bench  # noqa: E402


def test_line_under_driver_capture_budget(tmp_path):
    # pessimistic walls: 3 integer digits + 3 decimals for every query
    times = {n: 999.999 for n in bench.HEADLINE}
    line = bench.emit_lines(times, 0.1, 999.999, full_path=None)
    assert len(line) < 1800, f"bench stdout line is {len(line)} chars"
    assert "\n" not in line


def test_line_carries_contract_fields(tmp_path):
    times = {n: 1.234 for n in bench.HEADLINE}
    full = tmp_path / "bench_full.json"
    line = bench.emit_lines(times, 0.1, 1.111, full_path=str(full))
    obj = json.loads(line)
    assert obj["metric"] == "headline_queries_total_wall"
    assert obj["unit"] == "sec"
    assert obj["sf"] == 0.1
    assert set(obj["queries"]) == set(bench.HEADLINE)
    assert obj["control"] == bench.CONTROL
    assert obj["control_wall"] == 1.11
    assert obj["value"] == round(1.234 * len(bench.HEADLINE), 2)
    # normalized ratios live in the full-payload file, not on the line
    assert "queries_normalized" not in obj
    payload = json.loads(full.read_text())
    assert set(payload["queries_normalized"]) == set(bench.HEADLINE)
    assert payload["queries"][bench.HEADLINE[0]] == 1.234  # 3-decimal raw


def test_control_wall_is_median_of_probes():
    """bench's control is the MEDIAN of three spaced probes (r9 verdict
    #3): one bad window (e.g. a 2× outlier like the r9 campaign leg)
    must not poison the cross-run denominator."""
    probes = [1.1, 2.9, 1.2]  # middle probe hit a bad window
    assert sorted(probes)[len(probes) // 2] == 1.2


def test_full_payload_carries_control_probes(tmp_path):
    times = {n: 1.0 for n in bench.HEADLINE}
    full = tmp_path / "bench_full.json"
    bench.emit_lines(
        times, 0.1, 1.2, full_path=str(full), control_probes=[1.1, 2.9, 1.2]
    )
    payload = json.loads(full.read_text())
    assert payload["control_probes"] == [1.1, 2.9, 1.2]
