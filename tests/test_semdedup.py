"""SemDeDup (operators/semantic_dedup.py) + Gopher quality flags pins.

The semantic_dedup hash gate (queries_extras.semantic_dedup_embeddings)
verifies the within-cell prune against DuckDB given the materialized cell
fixture; these tests pin what the gate can't see — assignment determinism,
the keep rule's exact semantics vs an order-pinned Python replay, and the
cell-size guard."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from datafusion_dedup_ai_spark.operators import semantic_dedup as SD
from datafusion_dedup_ai_spark.operators.semantic_dedup import (
    SEMANTIC_TAU,
    assign_semantic_cells,
    semantic_dedup,
)
from datafusion_dedup_ai_spark.sources.readers import load_table


def _fold_cosine(a, b):
    """The exact arithmetic both engines run: left-fold dot products on
    double-widened values, acc starting at 0.0."""

    def dot(x, y):
        acc = 0.0
        for i in range(len(x)):
            acc = acc + float(x[i]) * float(y[i])
        return acc

    import math

    return dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))


def test_assignment_deterministic(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    a = sorted(assign_semantic_cells(emb).collect())
    b = sorted(assign_semantic_cells(emb).collect())
    assert a == b
    assert len(a) == emb.count()  # nprobe=1: exactly one cell per vector


def test_keep_rule_matches_python_replay(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    out = {r.vec_id: r for r in semantic_dedup(emb).collect()}
    cells = {r.vec_id: r.cell for r in assign_semantic_cells(emb).collect()}
    vecs = {r.vec_id: list(r.embedding) for r in emb.collect()}

    assert set(out) == set(vecs)  # every vector gets a decision

    by_cell: dict[int, list[int]] = {}
    for vid, cell in cells.items():
        by_cell.setdefault(cell, []).append(vid)

    n_dropped = 0
    for vid, row in out.items():
        assert row.cell == cells[vid]
        peers = [
            p
            for p in by_cell[cells[vid]]
            if p < vid and _fold_cosine(vecs[p], vecs[vid]) >= SEMANTIC_TAU
        ]
        if peers:
            n_dropped += 1
            assert not row.keep
            assert row.dup_of == min(peers)
            best = max(_fold_cosine(vecs[p], vecs[vid]) for p in peers)
            assert row.max_cos == pytest.approx(best, abs=0.0)
        else:
            assert row.keep
            assert row.dup_of is None and row.max_cos is None
    # the fixture plants embedding near-dups, so the rule must have traffic
    assert 0 < n_dropped < len(out)


def test_cell_size_guard_trips(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    with pytest.raises(ValueError, match="quadratic per cell"):
        semantic_dedup(emb, max_cell_rows=1)


def test_reused_cells_frame_matches_recompute(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    cells = assign_semantic_cells(emb)
    a = sorted(map(tuple, semantic_dedup(emb).collect()))
    b = sorted(map(tuple, semantic_dedup(emb, cells=cells).collect()))
    assert a == b


def test_gopher_flags_have_two_sided_traffic(spark, sf_dir):
    from datafusion_dedup_ai_spark.queries_extras import q_gopher_quality_flags

    rows = q_gopher_quality_flags(spark, sf_dir).collect()
    assert len(rows) > 0
    keeps = [r.keep for r in rows]
    assert any(keeps) and not all(keeps)  # thresholds actually discriminate
    for r in rows:
        assert r.keep == (
            r.flag_word_count
            and r.flag_mean_word_len
            and r.flag_alpha_words
            and r.flag_stopwords
        )
        # mean word length == total token chars / n tokens (single-space text)
        assert r.n_words >= 1 and r.mean_word_len > 0
