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


# ---------------------------------------------------------------------------
# KMV distinct sketch
# ---------------------------------------------------------------------------


def test_kmv_merge_is_partitioning_invariant(spark, sf_dir):
    """The merged KMV state (k smallest distinct global hashes) must be
    identical whether the corpus arrives as 1 partition or 8 — the merge law
    that makes the sketch distributable."""
    from datafusion_dedup_ai_spark.operators.sketches import kmv_partials
    from datafusion_dedup_ai_spark.sources.readers import load_table

    docs = load_table(spark, sf_dir, "documents")
    k = 32

    def merged_state(df):
        return [
            r["h"]
            for r in kmv_partials(df, "text", k=k, gram=2)
            .distinct()
            .orderBy("h")
            .limit(k)
            .collect()
        ]

    one = merged_state(docs.coalesce(1))
    many = merged_state(docs.repartition(8))
    assert one == many and len(one) == k


def test_kmv_exact_when_vocab_below_k(spark):
    """Fewer distinct values than k: the state is complete and the report
    must return the exact count with zero error."""
    from datafusion_dedup_ai_spark.operators.sketches import kmv_distinct_report

    docs = spark.createDataFrame(
        [(i, "a b c a b") for i in range(50)], ["doc_id", "text"]
    )
    row = kmv_distinct_report(docs, "text", k=64).collect()[0]
    assert row["n_state"] == row["exact_distinct"] == 3
    assert row["est_distinct"] == 3.0 and row["rel_error"] == 0.0


def test_kmv_estimate_within_bound(spark, sf_dir):
    """Estimator path (bigram vocab 916 >> k=64): KMV standard error is
    ~1/sqrt(k-2) ~ 0.127; assert the realized error stays within 3 sigma."""
    from datafusion_dedup_ai_spark.operators.sketches import kmv_distinct_report
    from datafusion_dedup_ai_spark.sources.readers import load_spread

    docs = load_spread(spark, sf_dir, "documents")
    row = kmv_distinct_report(docs, "text", k=64, gram=2).collect()[0]
    assert row["n_state"] == 64
    assert row["exact_distinct"] > 64
    assert row["rel_error"] <= 3 / (64 - 2) ** 0.5, row["rel_error"]


# ---------------------------------------------------------------------------
# Weighted sampling / upsampling plan / containment
# ---------------------------------------------------------------------------


def test_weighted_sample_matches_python_mirror(spark, sf_dir):
    """The Spark top-K by Efraimidis-Spirakis key must equal an independent
    pure-Python computation of the same draw (validates the plan end to end,
    not just the SQL oracle's dialect agreement)."""
    import hashlib
    import math

    from datafusion_dedup_ai_spark.registry import queries
    from datafusion_dedup_ai_spark.sources.readers import load_table

    got = (
        queries()["weighted_doc_sample"](spark, sf_dir)
        .orderBy("sample_rank")
        .toPandas()
    )
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars").collect()
    keyed = []
    for r in docs:
        v = int(hashlib.md5(str(r["doc_id"]).encode()).hexdigest()[:8], 16)
        u = (v + 1.0) / 4294967296.0
        keyed.append((math.log(u) / float(r["n_chars"]), -r["doc_id"]))
    keyed.sort(reverse=True)
    expect = [-d for _, d in keyed[: len(got)]]
    assert list(got.doc_id) == expect


def test_upsampling_plan_hits_target_mass(spark, sf_dir):
    """Per-source integer repeat factors must renormalize token mass to the
    4:1 target weighting: planned mass ratio (r_scaled x n_chars) between a
    curated and an uncurated source equals 4.0 up to integer-floor error,
    and realized copies are floor(r) or floor(r)+1."""
    from datafusion_dedup_ai_spark.registry import queries
    from datafusion_dedup_ai_spark.sources.readers import load_table

    plan = queries()["source_upsampling_plan"](spark, sf_dir).toPandas()
    chars = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "n_chars")
        .toPandas()
    )
    m = plan.merge(chars, on="doc_id")
    assert ((m.n_copies - m.r_scaled // 1_000_000).isin([0, 1])).all()
    m["snum"] = m.source.str.slice(3).astype(int)
    m["planned_mass"] = m.r_scaled * m.n_chars / 1e6
    per_char = m.groupby(m.snum < 4).apply(
        lambda g: g.planned_mass.sum() / g.n_chars.sum()
    )
    ratio = per_char[True] / per_char[False]
    assert abs(ratio - 4.0) < 0.01, ratio


def test_containment_catches_subset_doc(spark):
    """A short doc pasted verbatim inside a long one: containment 1.0 (the
    pair this operator exists for) while Jaccard stays below the usual 0.2
    near-dup threshold."""
    from datafusion_dedup_ai_spark.functions import text as T

    short = "alpha beta gamma delta epsilon zeta"
    long = (
        "one two three four five six seven eight nine ten "
        + short
        + " eleven twelve thirteen fourteen fifteen sixteen seventeen "
        + "eighteen nineteen twenty twentyone twentytwo twentythree"
    )
    docs = spark.createDataFrame([(0, long), (1, short)], ["doc_id", "text"])
    sh = docs.select("doc_id", T.distinct_shingles(F.col("text")).alias("sg"))
    rows = {r["doc_id"]: set(r["sg"]) for r in sh.collect()}
    inter = len(rows[0] & rows[1])
    jacc = inter / len(rows[0] | rows[1])
    cont = inter / min(len(rows[0]), len(rows[1]))
    assert jacc < 0.2 <= 1.0 == cont
