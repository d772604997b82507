"""Incremental maintenance: merged batch aggregates must equal a full
recompute, and SCD2 applies must preserve history, close superseded
versions, and answer as-of reads correctly."""

from __future__ import annotations

from pyspark.sql import functions as F

from datafusion_dedup_ai_spark.operators import maintenance as M
from datafusion_dedup_ai_spark.sources.readers import load_table

KEYS = ["user_id", "event_type"]


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_incremental_aggregate_equals_recompute(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    # split history/batch on event_id parity — both sides nonempty
    hist = ev.where(F.col("event_id") % 2 == 0)
    batch = ev.where(F.col("event_id") % 2 == 1)

    state = M.aggregate_batch(hist, KEYS)
    merged = M.merge_aggregate_state(state, M.aggregate_batch(batch, KEYS), KEYS)
    full = M.aggregate_batch(ev, KEYS)
    assert _rows(merged.select(*KEYS, "cnt", "sum_cents")) == _rows(
        full.select(*KEYS, "cnt", "sum_cents")
    )


def test_incremental_aggregate_new_keys_appear(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    hist = ev.where(F.col("user_id") < 5)
    batch = ev.where(F.col("user_id") >= 5)
    merged = M.merge_aggregate_state(
        M.aggregate_batch(hist, KEYS), M.aggregate_batch(batch, KEYS), KEYS
    )
    assert _rows(merged) == _rows(M.aggregate_batch(ev, KEYS))


def _dim(spark, rows):
    return spark.createDataFrame(
        rows, "k bigint, city string, valid_from long, valid_to long, is_current boolean"
    )


def test_scd2_close_insert_noop_and_new_key(spark):
    dim = _dim(
        spark,
        [
            (1, "paris", 100, None, True),
            (2, "lyon", 100, None, True),
            (3, "nice", 50, 100, False),   # history row
            (3, "lille", 100, None, True),
        ],
    )
    updates = spark.createDataFrame(
        [(1, "berlin"),   # changed -> close + new version
         (2, "lyon"),     # identical -> no-op
         (4, "rome")],    # new key -> first version
        "k bigint, city string",
    )
    out = M.scd2_apply(dim, updates, "k", ["city"], F.lit(200))
    got = _rows(out)
    assert got == sorted(
        [
            (1, "paris", 100, 200, False),   # closed
            (1, "berlin", 200, None, True),  # new version
            (2, "lyon", 100, None, True),    # untouched (identical attrs)
            (3, "nice", 50, 100, False),     # history preserved
            (3, "lille", 100, None, True),   # untouched (no update)
            (4, "rome", 200, None, True),    # brand-new key
        ]
    )


def test_scd2_as_of_time_travel(spark):
    dim = _dim(
        spark,
        [
            (1, "paris", 100, 200, False),
            (1, "berlin", 200, None, True),
        ],
    )
    at_150 = _rows(M.scd2_as_of(dim, F.lit(150)).select("k", "city"))
    at_250 = _rows(M.scd2_as_of(dim, F.lit(250)).select("k", "city"))
    before = _rows(M.scd2_as_of(dim, F.lit(50)).select("k", "city"))
    assert at_150 == [(1, "paris")]
    assert at_250 == [(1, "berlin")]
    assert before == []


def test_scd2_idempotent_reapply(spark):
    dim = _dim(spark, [(1, "paris", 100, None, True)])
    updates = spark.createDataFrame([(1, "berlin")], "k bigint, city string")
    once = M.scd2_apply(dim, updates, "k", ["city"], F.lit(200))
    twice = M.scd2_apply(once, updates, "k", ["city"], F.lit(300))
    # second apply of the SAME attrs is a no-op
    assert _rows(once) == _rows(twice)


def test_observed_write_counts_match_batch(spark, sf_dir, tmp_path):
    from datafusion_dedup_ai_spark.observability import write_with_dq_metrics

    ev = load_table(spark, sf_dir, "events")
    checks = {
        "value_out_of_range": (F.col("value") <= 0) | (F.col("value") > 300),
        "k_out_of_range": F.get_json_object("props", "$.k").cast("bigint") >= 90,
    }
    got = write_with_dq_metrics(ev, str(tmp_path / "out"), checks)
    want_v = ev.where(checks["value_out_of_range"]).count()
    want_k = ev.where(checks["k_out_of_range"]).count()
    assert got["value_out_of_range"] == want_v
    assert got["k_out_of_range"] == want_k
    assert got["rows_written"] == ev.count()
    # the write actually happened with all rows
    assert spark.read.parquet(str(tmp_path / "out")).count() == ev.count()
