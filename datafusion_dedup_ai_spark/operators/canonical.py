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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def elect_canonical(clustered: DataFrame) -> DataFrame:
    """Input: rows with cluster_id, base_name, normalized_name, row_order.
    Output: + canonical_name, cluster_size.

    Shape: a two-level aggregation chain — (cluster_id, base_name) partials,
    then one (cluster_id) roll-up electing the winner with ``min_by`` over a
    tie-break struct (-freq, length, name) == (freq DESC, length ASC, name
    ASC) — followed by ONE equi-join back to the member rows. The input is
    consumed exactly twice (agg chain + final join); callers that persist it
    (plans/pipeline.py) therefore execute its subtree once."""
    per_name = clustered.groupBy("cluster_id", "base_name").agg(
        F.count("*").alias("cnt"),
        F.min("row_order").alias("mro"),
        F.min_by("normalized_name", "row_order").alias("first_norm"),
    )
    per_cluster = per_name.groupBy("cluster_id").agg(
        F.sum("cnt").alias("cluster_size"),
        # all-empty clusters fall back to the first member's normalized_name:
        # min(mro) over the cluster is the globally smallest row_order, and
        # first_norm of that group is exactly that row's normalized_name.
        F.min_by("first_norm", "mro").alias("fallback_name"),
        F.expr(
            "min_by(base_name, struct(-cnt, length(base_name), base_name)) "
            "FILTER (WHERE base_name != '')"
        ).alias("elected_name"),
    )
    return (
        clustered.join(per_cluster, "cluster_id")
        .withColumn(
            "canonical_name", F.coalesce(F.col("elected_name"), F.col("fallback_name"))
        )
        .drop("elected_name", "fallback_name")
    )
