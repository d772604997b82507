"""Bucketed tables: the canonical shuffle-elimination strategy for repeated
big-to-big joins at 100 TB.

A fact table bucketed AND sorted by its join key is pre-shuffled on disk:
every join (or aggregation) on that key reads co-located buckets and skips
the Exchange entirely — at cluster scale that is the difference between
re-shuffling 100 TB per query and reading it in place. Spark implements this
through the table catalog (``bucketBy``/``sortBy`` + ``saveAsTable``), not
path-based writes: bucket metadata lives in the metastore, which is how the
planner knows the layout is trustworthy.

tests/test_bucketing.py machine-asserts the contract: a self-bucketed
orders-lineitem join plans as SortMergeJoin with ZERO Exchange operators,
while the same join over plain parquet shuffles both sides.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int = 32,
    sort_cols: list[str] | None = None,
) -> None:
    """Persist ``df`` as a bucketed (and optionally sorted) catalog table.

    ``num_buckets`` is a layout contract, not a parallelism knob: both sides
    of a co-located join must use the SAME bucket count on the SAME key
    expression. Sorting within buckets lets SortMergeJoin skip its sort too.
    """
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    # With an in-memory catalog a table written by a PREVIOUS session is
    # unknown to DROP TABLE but its warehouse directory survives, and
    # saveAsTable refuses to reuse the location; clear it explicitly.
    import shutil
    from urllib.parse import urlparse

    warehouse = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    shutil.rmtree(os.path.join(warehouse, table.lower()), ignore_errors=True)

    w = df.write.mode("overwrite").format("parquet").bucketBy(
        num_buckets, *bucket_cols
    )
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)


def cobucket_fact_tables(
    spark: SparkSession,
    sf_dir: str,
    num_buckets: int = 32,
    prefix: str = "bucketed",
) -> tuple[str, str]:
    """Demo layout: orders and lineitem co-bucketed + sorted on the join key
    (o_orderkey / l_orderkey). Returns the two table names. After this, every
    orders-lineitem join on orderkey is Exchange-free."""
    from datafusion_dedup_ai_spark.sources.readers import load_table

    orders_t = f"{prefix}_orders"
    lineitem_t = f"{prefix}_lineitem"
    write_bucketed_table(
        load_table(spark, sf_dir, "orders"),
        orders_t,
        ["o_orderkey"],
        num_buckets,
        sort_cols=["o_orderkey"],
    )
    write_bucketed_table(
        load_table(spark, sf_dir, "lineitem"),
        lineitem_t,
        ["l_orderkey"],
        num_buckets,
        sort_cols=["l_orderkey"],
    )
    return orders_t, lineitem_t


def bucketed_order_lineitem_join(
    spark: SparkSession, orders_table: str, lineitem_table: str
) -> DataFrame:
    """The co-located join itself: per-order revenue joined back to order
    metadata — at 100 TB the bucketed layout makes this a local merge per
    bucket pair, no shuffle of either fact table."""
    from pyspark.sql import functions as F

    orders = spark.table(orders_table)
    items = spark.table(lineitem_table)
    revenue = items.groupBy("l_orderkey").agg(
        F.round(
            F.sum(F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")), 2)), 2
        ).alias("revenue")
    )
    return orders.join(
        revenue, orders["o_orderkey"] == revenue["l_orderkey"]
    ).select("o_orderkey", "o_orderdate", "o_orderpriority", "revenue")
