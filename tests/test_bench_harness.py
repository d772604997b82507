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
        }
    )
    assert len(line) < 1800, f"final JSON line {len(line)} chars"
