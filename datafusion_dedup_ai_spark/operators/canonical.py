"""C5/C6 — per-cluster canonical-name election and cluster size, as window/
aggregate expressions (the reference does both with driver-side loops +
``pd.Series.value_counts``, engine.py:321-338).

Election rule: most frequent non-empty base_name; ties -> shortest; remaining
length-ties -> lexicographic ASC (the reference falls to unspecified
``value_counts`` ordering there — documented divergence, SURVEY.md §7 R4).
All-empty clusters fall back to the ``normalized_name`` of the first member
(min row_order).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def elect_canonical(clustered: DataFrame) -> DataFrame:
    """Input: rows with cluster_id, base_name, normalized_name, row_order.
    Output: + canonical_name, cluster_size. Two shuffles on cluster_id, both
    partial-aggregated map-side; cluster_id is the reused partitioning key."""
    freq = (
        clustered.where(F.col("base_name") != "")
        .groupBy("cluster_id", "base_name")
        .agg(F.count("*").alias("freq"))
    )
    w_rank = Window.partitionBy("cluster_id").orderBy(
        F.col("freq").desc(),
        F.length("base_name").asc(),
        F.col("base_name").asc(),
    )
    winners = (
        freq.withColumn("rn", F.row_number().over(w_rank))
        .where(F.col("rn") == 1)
        .select("cluster_id", F.col("base_name").alias("elected_name"))
    )
    fallback = clustered.groupBy("cluster_id").agg(
        F.min_by("normalized_name", "row_order").alias("fallback_name"),
        F.count("*").alias("cluster_size"),
    )
    return (
        clustered.join(fallback, "cluster_id")
        .join(winners, "cluster_id", "left")
        .withColumn(
            "canonical_name", F.coalesce(F.col("elected_name"), F.col("fallback_name"))
        )
        .drop("elected_name", "fallback_name")
    )
