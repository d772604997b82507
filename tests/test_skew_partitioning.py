"""Scale-mechanics demos with machine-asserted plans: salted joins spread a
hot key across tasks without changing results; date-partitioned writes give
the scan partition pruning."""

from __future__ import annotations

from pyspark.sql import functions as F

from datafusion_dedup_ai_spark.operators.skew import salted_join
from datafusion_dedup_ai_spark.sources.readers import load_table


def test_salted_join_matches_plain_join(spark, sf_dir):
    """Same multiset of result rows as the plain join, but the hot side's
    shuffle key space is key x salt."""
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    right = cust.withColumnRenamed("c_custkey", "o_custkey")

    plain = orders.join(right, "o_custkey").groupBy("o_custkey").count()
    salted = (
        salted_join(orders, right, "o_custkey", salt=4)
        .groupBy("o_custkey")
        .count()
    )
    want = {(r["o_custkey"], r["count"]) for r in plain.collect()}
    got = {(r["o_custkey"], r["count"]) for r in salted.collect()}
    assert got == want


def test_salted_join_spreads_hot_key(spark):
    """A single ultra-hot key lands in ~salt distinct shuffle partitions
    instead of one — the straggler killer."""
    hot = spark.range(10_000).select(
        F.lit(7).alias("k"), F.col("id").alias("payload")
    )
    dim = spark.createDataFrame([(7, "only")], ["k", "v"])
    joined = salted_join(hot, dim, "k", salt=8)
    # count distinct salt sub-keys actually produced on the fact side
    n_subkeys = (
        hot.withColumn(
            "s", F.pmod(F.xxhash64(*[F.col(c) for c in hot.columns]), F.lit(8))
        )
        .select("s")
        .distinct()
        .count()
    )
    assert n_subkeys == 8  # hash spreads the hot key over all sub-keys
    assert joined.count() == 10_000  # multiplicity preserved


def test_partitioned_write_prunes_partitions(spark, sf_dir, tmp_path):
    """Writing events partitioned by event_type makes a type-filtered scan
    read ONLY that partition — asserted via the scan's partition filters."""
    out = str(tmp_path / "events_by_type")
    events = load_table(spark, sf_dir, "events")
    events.write.mode("overwrite").partitionBy("event_type").parquet(out)

    back = spark.read.parquet(out).where(F.col("event_type") == "click")
    back.write.mode("overwrite").format("noop").save()
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert "event_type" in plan.split("PartitionFilters")[1][:200]
    # and the pruned read returns exactly the filtered rows
    want = events.where(F.col("event_type") == "click").count()
    assert back.count() == want
