"""J2/J4/C2 — pair scoring: Jaro-Winkler + token-sorted match + the link
predicate and confidence tiers.

Reference: engine.py:257-260 (predicate), engine.py:371-375 (tiers).
Everything except the JW itself is a JVM Column expression.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from datafusion_dedup_ai_spark.config import (
    CONF_DEFAULT,
    CONF_HARD,
    CONF_SOFT,
    CONF_TOKEN_AND_HARD,
    REASON_DEFAULT,
    REASON_HARD,
    REASON_SOFT,
    REASON_TOKEN_AND_HARD,
    DedupConfig,
)
from datafusion_dedup_ai_spark.functions.similarity import jaro_winkler_udf


def score_confidence(ratio: Column, is_token_match: Column) -> tuple[Column, Column]:
    """C2: fixed tiers, independent of configured thresholds (engine.py:371-375)."""
    conf = (
        F.when(is_token_match & (ratio >= 0.90), F.lit(CONF_TOKEN_AND_HARD))
        .when(ratio >= 0.90, F.lit(CONF_HARD))
        .when(ratio >= 0.85, F.lit(CONF_SOFT))
        .otherwise(F.lit(CONF_DEFAULT))
    )
    reason = (
        F.when(is_token_match & (ratio >= 0.90), F.lit(REASON_TOKEN_AND_HARD))
        .when(ratio >= 0.90, F.lit(REASON_HARD))
        .when(ratio >= 0.85, F.lit(REASON_SOFT))
        .otherwise(F.lit(REASON_DEFAULT))
    )
    return conf, reason


def match_pairs(pairs: DataFrame, config: DedupConfig | None = None) -> DataFrame:
    """J2+J4: score candidate pairs and keep links.

    Link iff ``(token_match AND jw >= soft) OR (jw >= hard)`` (engine.py:260).
    The token-match leg compares precomputed J3 keys (a join-key-able equality,
    not a per-pair recompute). Output keeps the edge list lean: it is the input
    to connected components, where shuffle volume matters.
    """
    config = config or DedupConfig()
    # Spread pairs before the Python UDF: a single hot block otherwise lands
    # every pair in one hash partition and serializes the JW scoring. The
    # explicit partition count matters — a bare column-repartition of a
    # few-MB shuffle gets coalesced back to ~1 partition by AQE.
    n_parts = pairs.sparkSession.sparkContext.defaultParallelism
    scored = pairs.repartition(n_parts, "row_order_a", "row_order_b").withColumn(
        "jw", jaro_winkler_udf(F.col("base_a"), F.col("base_b"))
    ).withColumn("is_token_match", F.col("token_a") == F.col("token_b"))
    linked = scored.where(
        (F.col("is_token_match") & (F.col("jw") >= F.lit(config.soft_threshold)))
        | (F.col("jw") >= F.lit(config.hard_threshold))
    )
    conf, reason = score_confidence(F.col("jw"), F.col("is_token_match"))
    return linked.select(
        "block_key",
        "row_order_a",
        "row_order_b",
        "jw",
        "is_token_match",
        conf.alias("pair_confidence"),
        reason.alias("pair_reason"),
    )


def group_pair_matches(
    prepared: DataFrame, config: DedupConfig | None = None
) -> DataFrame:
    """Distinct-base-pair match table per block: (block_key, base_a, base_b,
    pair_confidence, pair_reason) for base_a < base_b passing the J4 predicate.

    This is the entity-collapsed input to the exact cluster replay
    (clustering.cluster_exact): Jaro-Winkler runs once per DISTINCT base pair
    per block instead of once per row pair, so exact duplicates — the bulk of
    a 100 TB corpus — never reach the quadratic stage. Identical-base matches
    are implicit (jw = 1.0) and handled by the replay itself.
    """
    config = config or DedupConfig()
    g = (
        prepared.where(F.col("base_name") != "")
        .select("block_key", "base_name", "token_key")
        .distinct()
    )
    a = g.alias("a")
    b = g.alias("b")
    pairs = a.join(b, on="block_key").where(F.col("a.base_name") < F.col("b.base_name"))
    # spread before the Python UDF (explicit count — AQE would coalesce a
    # bare column-repartition of a small shuffle back to one partition)
    n_parts = pairs.sparkSession.sparkContext.defaultParallelism
    pairs = pairs.repartition(n_parts, "block_key", "a.base_name", "b.base_name")
    scored = pairs.withColumn(
        "jw", jaro_winkler_udf(F.col("a.base_name"), F.col("b.base_name"))
    ).withColumn("is_token_match", F.col("a.token_key") == F.col("b.token_key"))
    linked = scored.where(
        (F.col("is_token_match") & (F.col("jw") >= F.lit(config.soft_threshold)))
        | (F.col("jw") >= F.lit(config.hard_threshold))
    )
    conf, reason = score_confidence(F.col("jw"), F.col("is_token_match"))
    return linked.select(
        "block_key",
        F.col("a.base_name").alias("base_a"),
        F.col("b.base_name").alias("base_b"),
        conf.alias("pair_confidence"),
        reason.alias("pair_reason"),
    )
