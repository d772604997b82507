"""bench.py is driver-facing infrastructure: it must run end-to-end and print
exactly one valid JSON line with the agreed keys. Exercised at sf0.001 so the
whole-harness check stays cheap."""

from __future__ import annotations

import json
import os
import subprocess
import sys


def test_bench_emits_contract_json():
    env = dict(os.environ)
    env["SPARK_GRAFT_SF_DIR"] = "/root/testdata/sf0.001"
    env["SPARK_GRAFT_CPUS"] = "8"
    env["SPARK_GRAFT_BENCH_REPEATS"] = "1"  # contract check, not a measurement
    out = subprocess.run(
        [sys.executable, "bench.py"],
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=env,
        capture_output=True,
        text=True,
        timeout=1200,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [l for l in out.stdout.splitlines() if l.strip()]
    assert len(lines) == 1, f"expected ONE json line on stdout, got: {lines}"
    payload = json.loads(lines[0])
    assert payload["unit"] == "sec"
    assert payload["sf"] == 0.001
    assert payload["value"] > 0
    assert set(payload["queries"]) >= {
        "pricing_summary",
        "dedup_clusters",
        "matched_pairs",
        "minhash_near_dup_pairs",
        "cosine_topk",
    }
    assert all(v >= 0 for v in payload["queries"].values())


def test_bench_final_line_fits_driver_tail_window():
    """The external driver snapshots only the last ~2000 chars of bench
    output and parses the final JSON line — a per-query medians dict for
    all 29 headline queries must stay comfortably inside that window
    (BENCH_r05.json recorded parsed=null when run arrays shared the
    line). Static check: build the contract line with worst-case 7-char
    timings for every headline query."""
    import bench

    line = json.dumps(
        {
            "metric": "headline_queries_total_wall",
            "value": 9999.999,
            "unit": "sec",
            "queries": {name: 999.999 for name in bench.HEADLINE},
            "sf": 0.001,
            "load1_start": 99.99,
            "load1_end": 99.99,
            "conditions_factor": 9.999,
            "value_normalized": 9999.999,
            "calib_attempts": 3,
            "conditions_warning": "box not idle at start",
        }
    )
    assert len(line) < 1800, f"final JSON line {len(line)} chars"


def test_calibration_reference_filters_by_sf():
    """The trailing-median reference only consumes committed artifacts at
    the SAME sf: a sf0.001 smoke run has no sf0.001 history and must get no
    factor at all, while the sf0.1 reference exists (9 committed rounds)
    and covers every calibration query."""
    import bench

    assert bench._calibration_reference(0.001) == {}
    ref = bench._calibration_reference(0.1)
    assert set(ref) == set(bench.CALIBRATION)
    # floor-class queries: trailing medians are sub-2s at sf0.1
    assert all(0.0 < v < 2.0 for v in ref.values())


def test_calibration_queries_are_headline_members():
    """Calibration rows must come from HEADLINE so every committed artifact
    carries them (the reference is self-maintaining round over round)."""
    import bench

    assert set(bench.CALIBRATION) <= set(bench.HEADLINE)
