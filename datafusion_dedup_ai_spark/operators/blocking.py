"""Stage-1/2 front half: row preparation (N1-N5, B1, J3 keys) and candidate
pair generation (B2 block grouping + J1 within-block self-join).

Reference: engine.py:212-226 (row build), engine.py:246-255 (blocks + pairs).

Scale notes
-----------
* The blocking key IS the shuffle key: the J1 self-join is an equi-join on
  ``block_key`` so Catalyst/AQE picks the physical join and splits skewed
  blocks across tasks.
* ``max_block_size`` (DedupConfig) sub-splits oversized blocks: first by
  extending the key with extra leading characters of the base name, then —
  for blocks a shared first token keeps hot through that refinement — by
  hash-salting into ceil(n/cap) sub-blocks on the full base name. A semantic
  restriction (pairs across sub-blocks are skipped) used as a guard against
  quadratic blow-up on adversarial keys; off by default for reference parity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from datafusion_dedup_ai_spark.config import (
    CONF_DEFAULT,
    REASON_DEFAULT,
    DedupConfig,
)
from datafusion_dedup_ai_spark.functions.normalize import (
    base_name,
    block_key,
    normalize_name,
    token_sort_key,
)


def prepare_names(
    df: DataFrame,
    name_col: str,
    config: DedupConfig | None = None,
    order_col: str | None = None,
) -> DataFrame:
    """Build the working record schema (SURVEY.md §1.2) from any input table.

    ``row_order`` replaces the reference's pandas index (engine.py:218): a
    deterministic 0-based rank over ``order_col`` (falling back to the name
    itself — callers with a real key column should pass it; a global
    ``row_number`` is a single-partition sort, so at 100 TB scale callers
    should always supply a numeric unique key, which keeps this a narrow
    projection instead).
    """
    config = config or DedupConfig()
    if order_col is not None:
        # Stable key available: rank is only needed to be *deterministic and
        # unique*, so reuse the key directly when it's already numeric-unique.
        ordered = df.withColumn("row_order", F.col(order_col).cast("bigint"))
    else:
        w = Window.orderBy(F.col(name_col).asc_nulls_first())
        ordered = df.withColumn("row_order", F.row_number().over(w) - 1)

    base = base_name(
        F.col(name_col),
        mapping=config.acronym_map,
        no_subsidiary_fold=config.no_subsidiary_fold,
    )
    out = (
        ordered.withColumn("original_name", F.col(name_col).cast("string"))
        .withColumn("normalized_name", normalize_name(F.col(name_col)))
        .withColumn("base_name", base)
        .withColumn("block_key", block_key(F.col("base_name")))
        .withColumn("token_key", token_sort_key(F.col("base_name")))
        .withColumn("confidence", F.lit(CONF_DEFAULT))
        .withColumn("reason", F.lit(REASON_DEFAULT))
    )
    if config.max_block_size is not None:
        # Sub-split hot blocks in two stages. Stage 1 extends the key with
        # more leading base-name chars, which preserves every pair whose
        # members agree on the first 8 chars (the cheap, recall-friendly
        # refinement). Stage 2 (round 9, motivated by the Zipf-skew probe):
        # a block can stay hot AFTER stage 1 when its members share a first
        # token — thousands of "MEGACORP <suffix>" variants all carry the
        # same 8-char prefix, so the prefix refinement is a no-op on exactly
        # the hot-key shape it exists for. Those residual blocks hash-salt
        # into ceil(n / max_block_size) sub-blocks keyed on the FULL
        # base_name, which bounds expected sub-block size at the cap PER
        # DISTINCT base_name: identical base names (the token-key/exact
        # tier) stay co-located by design, so a residual block dominated by
        # one repeated base_name keeps that mass in a single sub-block —
        # identical-name mass is inherently quadratic output no blocking
        # scheme can shrink (r9 advice). Cross-sub-block fuzzy pairs are the
        # sacrificed approximation — flagged by the distinct key suffixes
        # ("#p" prefix stage, "#s" salt stage) so outputs stay auditable,
        # and QUANTIFIED by the registered block_guard_recall_report.
        # Cost note: the stage-2 recount is a second full window Exchange
        # over the rewritten key even when stage 1 already tamed every
        # block — acceptable for an off-by-default guard aimed at corpora
        # where hot blocks are the bottleneck (see SCALE.md skew rows).
        cap = F.lit(config.max_block_size)
        w_cnt = Window.partitionBy("block_key")
        out = out.withColumn("_block_n", F.count("*").over(w_cnt)).withColumn(
            "block_key",
            F.when(
                (F.col("_block_n") > cap) & (F.col("base_name") != ""),
                F.concat_ws(
                    "#p", F.col("block_key"), F.substring(F.col("base_name"), 1, 8)
                ),
            ).otherwise(F.col("block_key")),
        )
        n_sub = F.ceil(F.col("_block_n2") / cap).cast("bigint")
        out = (
            out.withColumn("_block_n2", F.count("*").over(w_cnt))
            .withColumn(
                "block_key",
                F.when(
                    (F.col("_block_n2") > cap) & (F.col("base_name") != ""),
                    F.concat_ws(
                        "#s",
                        F.col("block_key"),
                        F.pmod(F.xxhash64(F.col("base_name")), n_sub).cast(
                            "string"
                        ),
                    ),
                ).otherwise(F.col("block_key")),
            )
            .drop("_block_n", "_block_n2")
        )
    return out.select(
        "row_order",
        "original_name",
        "normalized_name",
        "base_name",
        "block_key",
        "token_key",
        "confidence",
        "reason",
    )


def candidate_pairs(prepared: DataFrame) -> DataFrame:
    """J1: all unordered within-block pairs, ``row_order_a < row_order_b``.

    Empty-base rows never enter blocks (engine.py:248) — that filter is applied
    on both join inputs *before* the shuffle so Catalyst pushes it to the scan.
    """
    cols = ["row_order", "base_name", "token_key", "block_key"]
    nonempty = prepared.where(F.col("base_name") != "").select(*cols)
    a = nonempty.alias("a")
    b = nonempty.alias("b")
    return (
        a.join(b, on="block_key")
        .where(F.col("a.row_order") < F.col("b.row_order"))
        .select(
            F.col("block_key"),
            F.col("a.row_order").alias("row_order_a"),
            F.col("b.row_order").alias("row_order_b"),
            F.col("a.base_name").alias("base_a"),
            F.col("b.base_name").alias("base_b"),
            F.col("a.token_key").alias("token_a"),
            F.col("b.token_key").alias("token_b"),
        )
    )
