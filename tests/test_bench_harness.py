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
            "calib_ref": "trailing",
            # outlier stamp is capped at 5 entries in bench.py; worst-case
            # long names here
            "query_ratio_outliers": {
                "fuzzy_benchmark_contamination": 99.99,
                "embedding_dedup_clusters": 99.99,
                "incremental_cluster_update": 99.99,
                "duplicate_substring_spans": 99.99,
                "semantic_dedup_embeddings": 99.99,
            },
            "conditions_warning": "box not idle at start",
        }
    )
    assert len(line) < 1800, f"final JSON line {len(line)} chars"


def test_calibration_reference_filters_by_sf():
    """The reference only covers the SAME sf: a sf0.001 smoke run has no
    sf0.001 history (and the pinned CALIB_REF.json is sf0.1) so it must get
    no factor at all, while the sf0.1 reference exists and covers every
    calibration query."""
    import bench

    ref001, _src = bench._calibration_reference(0.001)
    assert ref001 == {}
    ref, src = bench._calibration_reference(0.1)
    assert set(ref) == set(bench.CALIBRATION)
    assert all(v > 0.0 for v in ref.values())
    # mid-weight probes (round-11 verdict #2) sit above the sub-second
    # floor class so one noisy floor row can't tilt the geomean
    assert ref["clean_corpus"] > 1.0
    if src == "pinned":
        # the committed certified-idle reference must carry its evidence
        pinned = json.load(open(bench.CALIB_REF_PATH))
        cert = pinned["certification"]
        assert cert["factor_vs_prior_ref"] is None or (
            cert["factor_vs_prior_ref"] <= bench.CALIB_REF_WRITE_MAX
        )
        # and the full headline medians for the per-query ratio stamp
        assert set(pinned["headline"]) >= set(bench.HEADLINE)


def test_headline_reference_matches_pinned_sf():
    """_headline_reference returns the pinned run's medians only at the
    pinned SF; other SFs get no per-query ratio stamp."""
    import bench

    assert bench._headline_reference(0.001) == {}
    href = bench._headline_reference(0.1)
    if href:  # present once CALIB_REF.json is committed
        assert set(href) >= set(bench.CALIBRATION)


def test_calibration_queries_are_headline_members():
    """Calibration rows must come from HEADLINE so every committed artifact
    carries them (the reference is self-maintaining round over round)."""
    import bench

    assert set(bench.CALIBRATION) <= set(bench.HEADLINE)
