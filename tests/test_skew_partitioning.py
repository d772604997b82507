"""Compressed-size-aware skew thresholds (round-9 verdict #4 -> round-10).

AQE's OptimizeSkewedJoin compares COMPRESSED map-output bytes against
skewedPartitionThresholdInBytes. The mega-block probe's hot partition is
~1.29 MiB uncompressed (10k prepared-name rows) but lz4 compresses the
short-string shuffle ~7x, so a threshold naively set to "1 MiB" (thinking
in data bytes) never fires while the uncompressed-target derivation in
session.skew_confs does. These tests machine-assert that distinction on
the executed plan, at the same corpus scale the probe gates timing on.
"""

from __future__ import annotations

import pytest

from datafusion_dedup_ai_spark.session import (
    TEXT_SHUFFLE_COMPRESSION_RATIO,
    skew_confs,
)


def test_skew_env_parse_errors_name_the_var(monkeypatch):
    """Malformed SPARK_GRAFT_SKEW_* env values must fail with a message
    naming the variable and the expected format, not a bare int()/float()
    ValueError (round-10 advisor)."""
    from datafusion_dedup_ai_spark.session import build_session

    monkeypatch.setenv("SPARK_GRAFT_SKEW_TARGET_UNCOMPRESSED", "1MiB")
    with pytest.raises(ValueError, match="SPARK_GRAFT_SKEW_TARGET_UNCOMPRESSED"):
        build_session(app_name="never-built")

    monkeypatch.setenv("SPARK_GRAFT_SKEW_TARGET_UNCOMPRESSED", "1048576")
    monkeypatch.setenv("SPARK_GRAFT_SKEW_RATIO", "fast")
    with pytest.raises(ValueError, match="SPARK_GRAFT_SKEW_RATIO"):
        build_session(app_name="never-built")


def test_scale_probe_gate_missing_fields_fail():
    """Merge-mode gate re-derivation treats missing fields as FAILURE: a
    truncated prior SCALE100.json row must not flip all_linearish to true
    via permissive defaults (round-10 advisor)."""
    import importlib.util
    import os as _os

    spec = importlib.util.spec_from_file_location(
        "scale_probe_mod",
        _os.path.join(
            _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))),
            "scale_probe.py",
        ),
    )
    sp = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(sp)

    ok = sp._x100_row_ok
    assert ok({"gated": True, "exponent": 0.5})
    assert not ok({"gated": True})  # missing exponent -> fail, not pass
    assert ok(
        {"gated": "per_pair_cost", "s_per_1k_pairs_10x": 1.0,
         "s_per_1k_pairs_100x": 1.5}
    )
    # no per-unit keys at all -> fail
    assert not ok({"gated": "per_pair_cost"})
    # late-scale key absent -> fail (was: silently passed)
    assert not ok({"gated": "per_pair_cost", "s_per_1k_pairs_10x": 1.0})
    assert not ok(
        {"gated": "per_pair_cost", "s_per_1k_pairs_10x": 1.0,
         "s_per_1k_pairs_100x": 2.1}
    )


def test_skew_confs_derivation():
    confs = skew_confs(1 << 20, compression_ratio=8.0)
    thr = int(confs["spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes"])
    adv = int(confs["spark.sql.adaptive.advisoryPartitionSizeInBytes"])
    assert thr == (1 << 20) // 8
    assert adv < thr  # advisory below threshold or AQE re-coalesces splits
    # floors: never derive thresholds below task granularity
    tiny = skew_confs(1, compression_ratio=100.0)
    assert (
        int(tiny["spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes"])
        >= 16 << 10
    )


def _run_megablock(spark, confs):
    from scale_probe import megablock_candidate_agg

    keys = set(confs) | {
        "spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.shuffle.partitions",
    }
    prev = {k: spark.conf.get(k, None) for k in keys}
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        # The skew check is "partition > max(threshold, factor * median)":
        # at the test session's 8 shuffle partitions the median carries
        # ~200 KiB of singleton mass and masks the hot block. Run at the
        # engine's deployment partitioning (32), as the probe does.
        spark.conf.set("spark.sql.shuffle.partitions", "32")
        for k, v in confs.items():
            spark.conf.set(k, v)
        agg = megablock_candidate_agg(spark, 100_000, None)
        agg.collect()
        return agg._jdf.queryExecution().executedPlan().toString()
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_uncompressed_target_fires_where_naive_bytes_do_not(spark):
    """The pin for the round-9 operational lesson: targeting "split above
    1 MiB uncompressed" via skew_confs fires on the 1.29 MiB hot partition;
    setting the same 1 MiB directly as the (compressed) threshold does not,
    because the partition compresses to ~190 KiB."""
    derived = skew_confs(1 << 20, TEXT_SHUFFLE_COMPRESSION_RATIO)
    plan = _run_megablock(spark, derived)
    assert "skew=true" in plan, "uncompressed-target sizing must split"

    naive = {
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": str(1 << 20),
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": str(1 << 19),
    }
    plan = _run_megablock(spark, naive)
    assert "skew=true" not in plan, (
        "naive byte sizing unexpectedly fired — remeasure the compression "
        "ratio in session.py"
    )
