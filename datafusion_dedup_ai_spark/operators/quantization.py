"""Int8 embedding quantization — the memory tier for similarity search.

At 100 TB, the embedding column dominates storage and shuffle: a 64-dim
float32 vector is 256 bytes/row; symmetric int8 quantization cuts it to 64
bytes + one float scale, a 4x reduction in scan, cache, and shuffle volume.
The standard serving pattern (FAISS SQ8, ScaNN) is: quantize the corpus
once, generate candidates with cheap integer dot products, then exact
re-rank the survivors against the float vectors.

Everything here is JVM-side Column expressions (transform/zip_with/
aggregate) — no Python in the scan path. The integer dot product is exact
int arithmetic; only the quantization itself is lossy, and the recall loss
is pinned in tests/test_similarity.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from datafusion_dedup_ai_spark.operators.similarity_search import cosine

Q_LEVELS = 127  # symmetric int8: codes in [-127, 127]


def quantize_int8(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    out_id: str | None = None,
) -> DataFrame:
    """(id, qvec: array<tinyint>, scale: double): per-vector symmetric
    quantization, code = round(x / scale) with scale = max|x| / 127.

    Per-vector (not per-corpus) scales make the operator a pure map — no
    global pass, no shuffle — and dequantized dot products recompose as
    int_dot * scale_a * scale_b."""
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    scale = F.greatest(
        F.array_max(F.transform(v, F.abs)) / F.lit(float(Q_LEVELS)),
        F.lit(1e-30),  # all-zero vectors quantize to zeros, not NaNs
    )
    return df.select(
        F.col(id_col).alias(out_id or id_col),
        F.transform(
            v, lambda x: F.round(x / scale).cast("tinyint")
        ).alias("qvec"),
        scale.alias("scale"),
    )


def int_dot(a: Column, b: Column) -> Column:
    """Exact integer dot product of two int8 code arrays (widened to long;
    64 * 127^2 is far inside int64)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("long") * y.cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def quantized_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    oversample: int = 4,
) -> DataFrame:
    """Approximate top-k via the SQ8 two-stage pattern: rank ALL corpus
    vectors by approximate (dequantized-int8) cosine, keep k * oversample
    candidates per query, then exact-re-rank only those against the float
    vectors.

    The stage-1 scan touches only the 4x-smaller quantized columns — at
    cluster scale that is the difference between an in-memory scan and a
    spill. Stage 2 joins the tiny candidate set back to the float corpus
    (k * oversample rows per query). Output schema matches the other ANN
    tiers: (query_id, neighbor_id, cosine, rk)."""
    cq = quantize_int8(corpus, id_col, vec_col, out_id="neighbor_id")
    qq = quantize_int8(queries, id_col, vec_col, out_id="query_id")
    qq = qq.withColumnRenamed("qvec", "q_qvec").withColumnRenamed("scale", "q_scale")

    # approx cosine: (int_dot * sa * sb) / (|a| * |b|) with norms also taken
    # from the codes — stage 1 never touches the float column.
    qnorm = lambda qv, s: F.sqrt(int_dot(qv, qv).cast("double")) * s  # noqa: E731
    scored = (
        cq.crossJoin(F.broadcast(qq))
        .where(F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "approx_cosine",
            (
                int_dot(F.col("qvec"), F.col("q_qvec")).cast("double")
                * F.col("scale")
                * F.col("q_scale")
            )
            / (
                qnorm(F.col("qvec"), F.col("scale"))
                * qnorm(F.col("q_qvec"), F.col("q_scale"))
            ),
        )
    )
    w1 = Window.partitionBy("query_id").orderBy(
        F.col("approx_cosine").desc(), F.col("neighbor_id").asc()
    )
    cand = (
        scored.withColumn("crk", F.row_number().over(w1))
        .where(F.col("crk") <= k * oversample)
        .select("query_id", "neighbor_id")
    )

    qv = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"))
    cv = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec"))
    rescored = (
        cand.join(F.broadcast(qv), "query_id")
        .join(cv, "neighbor_id")
        .withColumn("cosine", cosine(F.col("q_vec"), F.col("c_vec")))
    )
    w2 = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        rescored.withColumn("rk", F.row_number().over(w2).cast("bigint"))
        .where(F.col("rk") <= k)
        .select("query_id", "neighbor_id", "cosine", "rk")
    )
