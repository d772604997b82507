"""Equivalence of the entity-collapsed cluster replay against the full
row-pair path: identical clusters, confidences, and reasons — including the
adversarial shape that breaks naive collapses (an external row smaller than a
group's min attaching the group's members before its star edges run)."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from datafusion_dedup_ai_spark.config import DedupConfig
from datafusion_dedup_ai_spark.operators.blocking import candidate_pairs, prepare_names
from datafusion_dedup_ai_spark.operators.canonical import elect_canonical
from datafusion_dedup_ai_spark.operators.clustering import cluster_exact, cluster_from_edges
from datafusion_dedup_ai_spark.operators.matching import group_pair_matches, match_pairs

COLS = ["row_order", "base_name", "cluster_id", "cluster_size",
        "canonical_name", "confidence", "reason"]


def _run_both(spark, names):
    df = spark.createDataFrame(list(enumerate(names)), ["idx", "name"])
    cfg = DedupConfig()
    prep = prepare_names(df, "name", cfg, order_col="idx")
    full = elect_canonical(
        cluster_from_edges(prep, match_pairs(candidate_pairs(prep), cfg))
    )
    fast = elect_canonical(cluster_exact(prep, group_pair_matches(prep, cfg)))
    f = [tuple(r[c] for c in COLS) for r in full.select(COLS).orderBy("row_order").collect()]
    g = [tuple(r[c] for c in COLS) for r in fast.select(COLS).orderBy("row_order").collect()]
    return f, g


def test_external_attacher_shape(spark):
    # 'Acme Grp' (row 0) fuzzy-matches the later identical group 'Acme Corp'
    # (rows 1..3): the full scan attaches rows 1-3 via row 0 before the
    # group's internal star pairs — row 1 must NOT get the 0.98 upgrade.
    names = ["Acme Grp", "Acme Corp", "Acme Corp", "Acme Corp"]
    f, g = _run_both(spark, names)
    assert f == g


def test_mega_block_fallback_partition_matches_exact(spark):
    """A pathological corpus where (almost) every name lands in ONE block —
    the reference's key is first-char/length-bucket/first-token, so 120 rows
    share block A_1_AAACORP. With max_block_rows=50 that block routes to the
    label-propagation fallback; the partition (row_order -> cluster_id, and
    cluster sizes) must equal the exact replay's, and the small block that
    stayed on the exact path must match bit-for-bit including confidences."""
    names = [f"AAACORP {i % 7}" for i in range(120)] + ["Zebra Inc"] * 3
    df = spark.createDataFrame(list(enumerate(names)), ["idx", "name"])
    cfg = DedupConfig()
    prep = prepare_names(df, "name", cfg, order_col="idx")
    matches = group_pair_matches(prep, cfg)
    exact = cluster_exact(prep, matches)
    routed = cluster_exact(prep, matches, max_block_rows=50)

    def part(df_):
        return {
            r["row_order"]: r["cluster_id"]
            for r in df_.select("row_order", "cluster_id").collect()
        }

    assert part(exact) == part(routed)
    # the sub-threshold block must be byte-identical (exact path both times)
    small_cols = ["row_order", "cluster_id", "confidence", "reason"]
    sm_e = [tuple(r) for r in exact.where(F.col("base_name") == "ZEBRA")
            .select(small_cols).orderBy("row_order").collect()]
    sm_r = [tuple(r) for r in routed.where(F.col("base_name") == "ZEBRA")
            .select(small_cols).orderBy("row_order").collect()]
    assert sm_e == sm_r and len(sm_e) == 3
    # fallback requires identical-base linking semantics
    with pytest.raises(ValueError, match="link_identical"):
        cluster_exact(prep, matches, link_identical=False, max_block_rows=50)


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_random_fuzzy_corpora(spark, seed):
    rng = random.Random(seed)
    stems = ["acme", "acme corp", "acmecorp", "globex", "globex intl",
             "initech", "initech inc", "umbrella", "umbrela", "stark",
             "starrk", "wayne", "wayne bros"]
    sfx = ["", " ltd", " llc", " pvt ltd", " india", " co"]
    names = [
        rng.choice(stems) + rng.choice(sfx)
        for _ in range(rng.randrange(30, 80))
    ]
    f, g = _run_both(spark, names)
    assert f == g


def _uf_min_labels(edges):
    """Union-find reference: {vertex: min(vertex in component)} over vertices
    appearing in edges."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {v: find(v) for v in parent}


@pytest.mark.parametrize("seed", range(4))
def test_star_contraction_matches_union_find(spark, seed):
    """Random sparse graphs + disjoint chains (the diameter-heavy topology
    star contraction exists for): labels must equal union-find's min-label
    partition exactly, chains and isolated pairs included."""
    from datafusion_dedup_ai_spark.operators.clustering import (
        cluster_components_star,
    )

    rng = random.Random(seed)
    n = rng.randint(30, 80)
    edges = [
        (rng.randrange(n), rng.randrange(n)) for _ in range(rng.randint(3, n // 2))
    ]
    # two disjoint chains in a high id range: diameter >> log(n)
    base = n + 10
    edges += [(base + i, base + i + 1) for i in range(17)]
    base2 = n + 100
    edges += [(base2 + i, base2 + i + 1) for i in range(9)]
    edges = [e for e in edges if e[0] != e[1]]
    df = spark.createDataFrame(edges, ["row_order_a", "row_order_b"])
    got = {
        r["row_order"]: r["cluster_id"]
        for r in cluster_components_star(df).collect()
    }
    assert got == _uf_min_labels(edges)


def test_star_contraction_agrees_with_label_propagation(spark):
    """The two scale backends implement the same contract — identical
    labelings on the same edge set."""
    from datafusion_dedup_ai_spark.operators.clustering import (
        cluster_components_star,
        cluster_label_propagation,
    )

    rng = random.Random(99)
    edges = [(rng.randrange(40), rng.randrange(40)) for _ in range(50)]
    edges = [e for e in edges if e[0] != e[1]]
    df = spark.createDataFrame(edges, ["row_order_a", "row_order_b"])
    star = {
        r["row_order"]: r["cluster_id"]
        for r in cluster_components_star(df).collect()
    }
    lp = {
        r["row_order"]: r["cluster_id"]
        for r in cluster_label_propagation(df).collect()
    }
    assert star == lp


def test_mega_block_star_backend_matches_exact(spark):
    """cc_backend='star' routes the mega-block fallback through star
    contraction; the partition must still equal the exact replay's, and an
    unknown backend fails loudly."""
    names = [f"AAACORP {i % 7}" for i in range(120)] + ["Zebra Inc"] * 3
    df = spark.createDataFrame(list(enumerate(names)), ["idx", "name"])
    cfg = DedupConfig()
    prep = prepare_names(df, "name", cfg, order_col="idx")
    matches = group_pair_matches(prep, cfg)
    exact = cluster_exact(prep, matches)
    star = cluster_exact(prep, matches, max_block_rows=50, cc_backend="star")

    def part(df_):
        return {
            r["row_order"]: r["cluster_id"]
            for r in df_.select("row_order", "cluster_id").collect()
        }

    assert part(exact) == part(star)
    with pytest.raises(ValueError, match="backend"):
        cluster_exact(
            prep, matches, max_block_rows=50, cc_backend="nope"
        ).collect()


def test_components_auto_routes_and_matches_iterative_backends(spark):
    """cluster_components_auto: the small path (single-task union-find), the
    forced-LP path (threshold 0), and star must all produce the identical
    min-label partition on a random graph with chains, blobs, and
    singleton-free isolates; the empty edge list yields an empty frame."""
    from datafusion_dedup_ai_spark.operators.clustering import (
        cluster_components_auto,
        cluster_components_star,
        cluster_label_propagation,
    )

    rng = random.Random(7)
    edges = [(rng.randrange(60), rng.randrange(60)) for _ in range(70)]
    # a long chain forces multi-round LP so the comparison is non-trivial
    edges += [(100 + i, 101 + i) for i in range(25)]
    edges = [e for e in edges if e[0] != e[1]]
    df = spark.createDataFrame(edges, ["row_order_a", "row_order_b"])

    def part(res):
        return {r["row_order"]: r["cluster_id"] for r in res.collect()}

    small = part(cluster_components_auto(df))
    routed_lp = part(cluster_components_auto(df, small_max_edges=0))
    routed_star = part(
        cluster_components_auto(df, small_max_edges=0, scale_backend="star")
    )
    lp = part(cluster_label_propagation(df))
    star = part(cluster_components_star(df))
    assert small == lp == star == routed_lp == routed_star

    empty = df.where(F.col("row_order_a") < 0)
    assert cluster_components_auto(empty).count() == 0
