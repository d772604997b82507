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
    scored = pairs.withColumn(
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
