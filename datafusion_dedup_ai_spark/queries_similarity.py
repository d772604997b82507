"""Similarity-search query pack over `embeddings`. The exact tier is
oracle-gated (DuckDB mirrors the left-fold dot product bitwise); the LSH tier
is rows-only (recall pinned against brute force in tests/test_similarity.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datafusion_dedup_ai_spark.operators import similarity_search as S
from datafusion_dedup_ai_spark.registry import register
from datafusion_dedup_ai_spark.sources.readers import load_spread, load_table

N_QUERIES = 5
TOP_K = 5
NEAR_DUP_THRESHOLD = 0.35

# DuckDB mirror of operators.similarity_search.dot_fold on double-widened
# lists: left fold over elementwise products, same order as Spark aggregate.
_SQL_DOT = (
    "list_reduce(list_concat([0.0], "
    "[{a}[i] * {b}[i] FOR i IN range(1, len({a}) + 1)]), "
    "(acc, x) -> acc + x)"
)


def _sql_cosine(a: str, b: str) -> str:
    dot_ab = _SQL_DOT.format(a=a, b=b)
    dot_aa = _SQL_DOT.format(a=a, b=a)
    dot_bb = _SQL_DOT.format(a=b, b=b)
    return f"({dot_ab} / (sqrt({dot_aa}) * sqrt({dot_bb})))"


@register(
    "cosine_topk",
    f"""
    WITH c AS (
        SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
    ), q AS (
        SELECT vec_id AS query_id, v AS qv FROM c WHERE vec_id < {N_QUERIES}
    ), scored AS (
        SELECT q.query_id, c.vec_id AS neighbor_id,
               {_sql_cosine('q.qv', 'c.v')} AS cosine
        FROM c CROSS JOIN q
        WHERE c.vec_id <> q.query_id
    )
    SELECT query_id, neighbor_id, cosine, rk FROM (
        SELECT query_id, neighbor_id, cosine,
               CAST(ROW_NUMBER() OVER (
                   PARTITION BY query_id
                   ORDER BY cosine DESC, neighbor_id ASC) AS BIGINT) AS rk
        FROM scored)
    WHERE rk <= {TOP_K}
    """,
)
def q_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-5 cosine neighbors for query vectors vec_id < 5 — the
    correctness baseline every ANN tier is measured against."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < N_QUERIES)
    return S.brute_force_topk(emb, queries, k=TOP_K)


@register(
    "embedding_near_pairs",
    f"""
    WITH c AS (
        SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
    )
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           {_sql_cosine('a.v', 'b.v')} AS cosine
    FROM c a CROSS JOIN c b
    WHERE a.vec_id < b.vec_id
      AND {_sql_cosine('a.v', 'b.v')} >= {NEAR_DUP_THRESHOLD}
    """,
)
def q_embedding_near_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space near-duplicate pairs (cosine >= 0.35) — exact
    quadratic form; the LSH tier is the scale path."""
    emb = load_table(spark, sf_dir, "embeddings")
    return S.near_duplicate_embeddings(emb, threshold=NEAR_DUP_THRESHOLD)


@register("ann_lsh_topk", None)
def q_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-table random-hyperplane LSH top-k (8 tables x 4 bits, exact
    re-rank of candidates). Rows-only at t2; recall vs brute force is pinned
    in tests/test_similarity.py."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < N_QUERIES)
    return S.lsh_topk(emb, queries, k=TOP_K)


@register("ann_ivf_topk", None)
def q_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-flat ANN top-k (spherical k-means cells, nprobe=4 of 16, exact
    re-rank within probed cells). Rows-only at t2; recall vs brute force is
    pinned in tests/test_similarity.py. The LSH tier hashes independently of
    the data; IVF adapts cells to the data distribution — both ship because
    at 100 TB the winner depends on the embedding geometry."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < N_QUERIES)
    return S.ivf_topk(emb, queries, k=TOP_K, n_cells=16, nprobe=4)


@register("embedding_dedup_clusters", None)
def q_embedding_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic dedup composite, scale-safe: LSH-candidate near-pairs
    (bucket equi-join + exact cosine >= 0.35 verify, operators/
    similarity_search.lsh_near_pairs — no crossJoin in the plan, asserted in
    tests/test_plans.py) -> hash-min label propagation -> (vec_id,
    cluster_id, cluster_size). Singletons keep their own id with size 1.
    Rows-only (iterative connected components); edge recall vs the exact
    quadratic reference and component equivalence vs driver-side union-find
    are pinned in tests/test_similarity.py."""
    from datafusion_dedup_ai_spark.operators.clustering import (
        cluster_label_propagation,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    pairs = S.lsh_near_pairs(emb, threshold=NEAR_DUP_THRESHOLD)
    edges = pairs.select(
        F.col("id_a").alias("row_order_a"), F.col("id_b").alias("row_order_b")
    )
    labels = cluster_label_propagation(edges).select(
        F.col("row_order").alias("vec_id"), "cluster_id"
    )
    full = emb.select("vec_id").join(labels, "vec_id", "left").select(
        "vec_id", F.coalesce("cluster_id", F.col("vec_id")).alias("cluster_id")
    )
    sizes = full.groupBy("cluster_id").agg(F.count("*").alias("cluster_size"))
    return full.join(sizes, "cluster_id").select(
        "vec_id", "cluster_id", "cluster_size"
    )


@register("ann_int8_topk", None)
def q_ann_int8_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQ8 quantized ANN: int8-quantize corpus and queries, rank by integer
    dot products over the 4x-smaller codes, exact-re-rank the top k*4
    candidates against the float vectors (operators/quantization.py). The
    memory tier: at 100 TB the quantized scan fits where the float scan
    spills. Rows-only at t2; recall vs brute force pinned in
    tests/test_curation.py."""
    from datafusion_dedup_ai_spark.operators.quantization import quantized_topk

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < N_QUERIES)
    return quantized_topk(emb, queries, k=TOP_K, oversample=4)
