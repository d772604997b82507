"""Bucketed-layout contract: co-bucketed fact tables must join with ZERO
Exchange operators (the 100 TB shuffle-elimination strategy), and the result
must equal the plain shuffled join."""

from __future__ import annotations

from pyspark.sql import functions as F

from datafusion_dedup_ai_spark.sources import bucketing as B
from datafusion_dedup_ai_spark.sources.readers import load_table


import contextlib


def _executed_plan(df) -> str:
    # run first so AQE finalizes (isFinalPlan=true); the pre-execution string
    # is only the initial plan
    df.write.mode("overwrite").format("noop").save()
    return df._jdf.queryExecution().executedPlan().toString()


@contextlib.contextmanager
def _no_autobroadcast(spark):
    """At sf0.001 AQE broadcasts the tiny sides, masking what the test is
    about: at 100 TB NEITHER fact side broadcasts, and the bucketed layout is
    what removes the shuffle. Pin the planner to the at-scale regime."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        yield
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_cobucketed_join_is_exchange_free(spark, sf_dir):
    orders_t, lineitem_t = B.cobucket_fact_tables(spark, sf_dir, num_buckets=8)
    with _no_autobroadcast(spark):
        joined = B.bucketed_order_lineitem_join(spark, orders_t, lineitem_t)
        plan = _executed_plan(joined)
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan, f"bucketed join should not shuffle:\n{plan}"

    # the same join over plain parquet DOES shuffle — proves the assertion
    # above is measuring the bucket layout, not a planner accident
    orders = load_table(spark, sf_dir, "orders")
    items = load_table(spark, sf_dir, "lineitem")
    revenue = items.groupBy("l_orderkey").agg(
        F.round(
            F.sum(F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")), 2)), 2
        ).alias("revenue")
    )
    plain = orders.join(
        revenue, orders["o_orderkey"] == revenue["l_orderkey"]
    ).select("o_orderkey", "o_orderdate", "o_orderpriority", "revenue")
    with _no_autobroadcast(spark):
        assert "Exchange" in _executed_plan(plain)

    got = {r["o_orderkey"]: r["revenue"] for r in joined.collect()}
    want = {r["o_orderkey"]: r["revenue"] for r in plain.collect()}
    assert got == want


def test_bucketed_agg_skips_shuffle(spark, sf_dir):
    """Aggregation on the bucket key reads pre-partitioned buckets — no
    Exchange before the HashAggregate either."""
    orders_t, lineitem_t = B.cobucket_fact_tables(spark, sf_dir, num_buckets=8)
    per_order = (
        spark.table(lineitem_t)
        .groupBy("l_orderkey")
        .agg(F.count("*").alias("n_items"))
    )
    assert "Exchange" not in _executed_plan(per_order)
