"""End-to-end pipeline equality against the reference's golden fixture
(FIXTURES.md §2 — deterministic columns of company_duplicates_final.xlsx,
golden_mapping.xlsx, high_confidence_review.xlsx, and the stats quadruple).

cluster_id numbering is engine-defined (min row_order per component) — the
golden check compares the *partition* via same-cluster pairs, not raw ids
(SURVEY.md §7 R3)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datafusion_dedup_ai_spark.config import DedupConfig
from datafusion_dedup_ai_spark.plans.pipeline import (
    canonical_summary,
    dedup_pipeline,
    golden_mapping,
    high_confidence_review,
    run_stats,
)

GOLDEN_INPUT = [
    "IBM India Pvt Ltd",
    "IBM",
    "TCS",
    "Tata Consultancy Services Limited",
    "Google LLC",
    "Alphabet Inc",
    "Microsoft",
    "Ltd",
]

# row_order -> (normalized, base, cluster(frozenset), size, canonical, conf, reason)
GOLDEN = {
    0: ("IBM INDIA PVT LTD", "IBM", frozenset({0, 1}), 2, "IBM", 0.98,
        "token-sorted match AND ratio >= 0.90"),
    1: ("IBM", "IBM", frozenset({0, 1}), 2, "IBM", 0.70, "Isolated or weak match"),
    2: ("TCS", "TATA CONSULTANCY SERVICES", frozenset({2, 3}), 2,
        "TATA CONSULTANCY SERVICES", 0.98, "token-sorted match AND ratio >= 0.90"),
    3: ("TATA CONSULTANCY SERVICES LIMITED", "TATA CONSULTANCY SERVICES",
        frozenset({2, 3}), 2, "TATA CONSULTANCY SERVICES", 0.70,
        "Isolated or weak match"),
    4: ("GOOGLE LLC", "GOOGLE", frozenset({4}), 1, "GOOGLE", 0.70,
        "Isolated or weak match"),
    5: ("ALPHABET INC", "ALPHABET", frozenset({5}), 1, "ALPHABET", 0.70,
        "Isolated or weak match"),
    6: ("MICROSOFT", "MICROSOFT", frozenset({6}), 1, "MICROSOFT", 0.70,
        "Isolated or weak match"),
    7: ("LTD", "", frozenset({7}), 1, "LTD", 0.50,
        "No base name after cleaning; kept as singleton"),
}


@pytest.fixture(scope="module")
def clusters(spark):
    df = spark.createDataFrame(
        [(i, n) for i, n in enumerate(GOLDEN_INPUT)], ["idx", "company_name"]
    )
    out = dedup_pipeline(df, "company_name", DedupConfig(), order_col="idx")
    out.cache()
    return out


def test_golden_rows(clusters):
    rows = {r["row_order"]: r for r in clusters.collect()}
    assert set(rows) == set(GOLDEN)
    by_cluster: dict[int, set] = {}
    for ro, r in rows.items():
        by_cluster.setdefault(r["cluster_id"], set()).add(ro)
    for ro, (norm, base, comp, size, canon, conf, reason) in GOLDEN.items():
        r = rows[ro]
        assert r["normalized_name"] == norm, ro
        assert r["base_name"] == base, ro
        assert by_cluster[r["cluster_id"]] == set(comp), ro
        assert r["cluster_size"] == size, ro
        assert r["canonical_name"] == canon, ro
        assert r["confidence"] == pytest.approx(conf), ro
        assert r["reason"] == reason, ro


def test_golden_mapping(clusters):
    got = {
        (r["original_name"], r["canonical_name"])
        for r in golden_mapping(clusters).collect()
    }
    want = {
        (GOLDEN_INPUT[ro], g[4]) for ro, g in GOLDEN.items()
    }
    assert got == want


def test_review_filter(clusters):
    got = [r["row_order"] for r in high_confidence_review(clusters).collect()]
    assert got == [0, 2]


def test_canonical_summary(clusters):
    got = {
        (r["canonical_name"], r["count"]) for r in canonical_summary(clusters).collect()
    }
    assert got == {
        ("IBM", 2),
        ("TATA CONSULTANCY SERVICES", 2),
        ("GOOGLE", 1),
        ("ALPHABET", 1),
        ("MICROSOFT", 1),
        ("LTD", 1),
    }


def test_stats(clusters):
    s = run_stats(clusters).collect()[0]
    assert (
        s["total_rows"],
        s["total_clusters"],
        s["multi_record_clusters"],
        s["high_confidence_review_rows"],
    ) == (8, 6, 4, 2)


def test_no_subsidiary_fold_toggle(spark):
    df = spark.createDataFrame([(0, "IBM India Pvt Ltd")], ["idx", "company_name"])
    out = dedup_pipeline(
        df, "company_name", DedupConfig(no_subsidiary_fold=True), order_col="idx"
    ).collect()[0]
    # With folding disabled the acronym rewrite IBM INDIA -> IBM still applies
    # (reference engine.py:185-192: map runs after fold regardless of toggle).
    assert out["base_name"] == "IBM"


def test_acronym_overrides(spark):
    df = spark.createDataFrame(
        [(0, "GE"), (1, "General Electric Co")], ["idx", "company_name"]
    )
    cfg = DedupConfig(acronym_overrides={"GE": "GENERAL ELECTRIC"})
    rows = {
        r["row_order"]: r
        for r in dedup_pipeline(df, "company_name", cfg, order_col="idx").collect()
    }
    assert rows[0]["base_name"] == "GENERAL ELECTRIC"
    assert rows[0]["cluster_id"] == rows[1]["cluster_id"]
