"""Misra-Gries sketch guarantees + round-5 extras-pack behavior pins.

The oracle gates (CORRECTNESS_FULL) verify the SQL-expressible queries
value-exactly; these tests pin the sketch-theoretic guarantees the oracle
cannot express and the semantic traffic of the new keep rules.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from datafusion_dedup_ai_spark import queries_extras  # noqa: F401 — registry
from datafusion_dedup_ai_spark.operators.sketches import (
    heavy_hitters_report,
    misra_gries_terms,
)


def _docs(spark, rows):
    return spark.createDataFrame([(i, t) for i, t in enumerate(rows)], ["doc_id", "text"])


def test_mg_exact_when_counters_cover_vocab(spark):
    """With k >= |vocab| no decrement ever fires, so the merged summary IS
    the exact count for every term."""
    docs = _docs(spark, ["a b a c", "b a b", "c c a"])
    got = {
        r["term"]: r["mg_count"]
        for r in misra_gries_terms(docs, k=10).collect()
    }
    assert got == {"a": 4, "b": 3, "c": 3}


def test_mg_report_guarantees(spark, sf_dir):
    """On the real corpus with k=8 (vocab ~30 -> real evictions):
    0 <= underestimate <= N/(k+1), and every term whose exact count exceeds
    the bound is retained."""
    from datafusion_dedup_ai_spark.sources.readers import load_spread

    docs = load_spread(spark, sf_dir, "documents")
    rep = heavy_hitters_report(docs, "text", k=8).toPandas()
    assert len(rep) > 0
    assert (rep.underestimate >= 0).all()
    assert (rep.underestimate <= rep.error_bound).all()

    exact = (
        docs.select(F.explode(F.split("text", " ")).alias("term"))
        .groupBy("term")
        .agg(F.count("*").alias("exact_count"))
        .toPandas()
    )
    bound = int(rep.error_bound.iloc[0])
    heavy = set(exact[exact.exact_count > bound].term)
    assert heavy <= set(rep.term), heavy - set(rep.term)


def test_mg_bounded_state_per_partition(spark):
    """Each partition summary emits at most k terms (the memory bound that
    justifies the sketch) even when the vocabulary is much wider."""
    rows = [f"t{i} t{i} filler{i}" for i in range(200)]
    docs = _docs(spark, rows).repartition(4)
    k = 8
    # 4 partitions x k counters caps the merged summary at 4k terms, however
    # wide the vocabulary (400 distinct terms here).
    merged = misra_gries_terms(docs, k=k)
    assert merged.count() <= 4 * k


def test_priority_dedup_prefers_priority_over_doc_id(spark, sf_dir):
    """The keep rule must pick by scrambled source priority, not by min
    doc_id — assert at least one kept row is NOT its group's min doc_id
    (real traffic for the editorial-priority semantics)."""
    from datafusion_dedup_ai_spark.registry import queries

    kept = queries()["cross_source_priority_dedup"](spark, sf_dir).toPandas()
    multi = kept[kept.n_copies > 1]
    assert len(multi) > 0, "fixture lost its prefix-collision traffic"

    from datafusion_dedup_ai_spark.functions import text as T
    from datafusion_dedup_ai_spark.sources.readers import load_table

    d = load_table(spark, sf_dir, "documents")
    keyed = d.select(
        "doc_id",
        F.md5(F.concat_ws(" ", F.slice(T.tokens(F.col("text")), 1, 8))).alias(
            "prefix_key"
        ),
    ).toPandas()
    min_ids = keyed.groupby("prefix_key").doc_id.min()
    assert (multi.doc_id != multi.prefix_key.map(min_ids)).any(), (
        "priority never overrode doc_id order — rule untested by fixture"
    )


def test_linear_quality_keep_two_sided(spark, sf_dir):
    """The classifier threshold must split the corpus (both keeps and drops),
    otherwise the gate pins a constant."""
    from datafusion_dedup_ai_spark.registry import queries

    scores = queries()["linear_quality_scores"](spark, sf_dir).toPandas()
    assert scores.keep.any() and (~scores.keep).any()


def test_dsir_targets_score_higher(spark, sf_dir):
    """DSIR sanity: the target slice (sources 0-3) must score higher on
    average than the rest — its tokens define the target distribution."""
    from datafusion_dedup_ai_spark.registry import queries
    from datafusion_dedup_ai_spark.sources.readers import load_table

    w = queries()["dsir_importance_weights"](spark, sf_dir).toPandas()
    src = load_table(spark, sf_dir, "documents").select("doc_id", "source").toPandas()
    m = w.merge(src, on="doc_id")
    m["per_tok"] = m.dsir_score_scaled / m.n_tokens
    is_target = m.source.str.slice(3).astype(int) < 4
    assert m[is_target].per_tok.mean() >= m[~is_target].per_tok.mean()
