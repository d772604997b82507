"""SemDeDup-style semantic deduplication over an embedding column.

Shape (Abbas et al. 2023, "SemDeDup: Data-efficient learning at web-scale
through semantic deduplication", arXiv:2303.09540): cluster the corpus with
spherical k-means, then compare vectors ONLY within their cluster and drop
all but one member of every epsilon-ball (cosine >= tau). The clustering is
what makes the operator scale — the quadratic pair scan runs per cell, so
with n_cells ~ sqrt(N) the total work is ~N^1.5 instead of N^2, and the cell
id is an ordinary equi-join/shuffle key.

Keep rule (deterministic variant): a vector is DROPPED iff a SMALLER-id
vector in the same cell has cosine >= tau to it; the survivor of every dup
group is the minimum id reachable greedily. The paper keeps a per-ball
random/centroid-extremal representative — min-id is the reproducible choice
an incremental pipeline wants (re-running after an append never flips an
earlier survivor to dropped unless a genuinely older duplicate appeared).

Everything after centroid training is declarative DataFrame work: one Arrow
matmul pass for cell assignment (operators/similarity_search.ivf_assign_cells),
one equi-self-join on the cell id, order-pinned fold cosines (so the DuckDB
oracle mirrors bitwise), one per-victim min/max aggregation, one left join.
Centroid training is the documented few-KB driver-side sample
(train_spherical_centroids) — at 100 TB you still train 16..65536 centroids
on ~10^4 sampled rows and broadcast them.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datafusion_dedup_ai_spark.materialize import _REPO_ROOT, sf_cache_key
from datafusion_dedup_ai_spark.operators.similarity_search import (
    cosine_with_norms,
    ivf_assign_cells,
    self_dot,
    train_spherical_centroids,
)

SEMANTIC_TAU = 0.4
SEMANTIC_CELLS = 16
SEMANTIC_SEED = 7


def assign_semantic_cells(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = SEMANTIC_CELLS,
    seed: int = SEMANTIC_SEED,
) -> DataFrame:
    """(id, cell): nearest spherical-k-means centroid per vector. Fully
    deterministic: the training sample is the first `sample_size` ids, the
    k-means seed is fixed, and numpy argmax tie-breaks to the first index —
    so repeated calls (fixture materialization vs query run) agree exactly."""
    centroids = train_spherical_centroids(
        corpus, id_col, vec_col, n_cells=n_cells, seed=seed
    )
    return ivf_assign_cells(corpus, centroids, id_col, vec_col, nprobe=1)


def semantic_dedup(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    tau: float = SEMANTIC_TAU,
    n_cells: int = SEMANTIC_CELLS,
    seed: int = SEMANTIC_SEED,
    cells: DataFrame | None = None,
    max_cell_rows: int | None = 1_000_000,
) -> DataFrame:
    """Per-vector keep/drop decision: (id, cell, keep, dup_of, max_cos).

    ``dup_of`` is the smallest same-cell id with cosine >= tau (NULL for
    keepers); ``max_cos`` the largest qualifying cosine (NULL for keepers).
    Pass ``cells`` to reuse a precomputed (id, cell) assignment (the fixture
    path, or a persisted assignment shared across taus).

    ``max_cell_rows`` fails loudly when a cell exceeds the cap instead of
    silently running a quadratic join over it — the fix at scale is MORE
    CELLS (n_cells ~ N / target_cell_size), not a bigger cap; SemDeDup's
    cost model assumes cells stay bounded."""
    caller_cells = cells is not None
    if cells is None:
        cells = assign_semantic_cells(corpus, id_col, vec_col, n_cells, seed)
    # Persist the computed (id, cell) assignment: it feeds the cell-size
    # probe, both sides of the within-cell self-join, and the final
    # keep/drop join — unpersisted, the Arrow matmul pass executed once PER
    # CONSUMER (three ArrowEvalPython scans in the round-12 'before' plan,
    # plus a fourth at the probe). Two longs per row (16 B/row — far below
    # the corpus payload), the documented-exception persist class; released
    # by bench.py's per-run cache clear / session teardown. A
    # CALLER-SUPPLIED frame is left alone (round-12 advisor): the caller
    # owns its lifecycle (the fixture path hands in a parquet-backed frame
    # with no matmul to deduplicate), and pinning it here leaked an
    # unreleasable persist.
    from pyspark import StorageLevel

    cells = cells.select(F.col(id_col), "cell")
    if not caller_cells:
        cells = cells.persist(StorageLevel.MEMORY_AND_DISK)
    if max_cell_rows is not None:
        # The probe reads the assignment alone when WE computed it (1:1
        # with corpus ids by construction — joining the corpus in first
        # only added a scan to a count the cell column fully determines).
        # A caller-supplied assignment may cover a superset of the corpus
        # (round-12 advisor), so the probe there counts the frame the
        # within-cell join actually consumes: the corpus-semi-joined one.
        probe = (
            cells
            if not caller_cells
            else cells.join(
                corpus.select(F.col(id_col)), id_col, "left_semi"
            )
        )
        biggest = (
            probe.groupBy("cell").agg(F.count("*").alias("n")).agg(F.max("n")).collect()
        )[0][0]
        if biggest is not None and biggest > max_cell_rows:
            raise ValueError(
                f"semantic_dedup: largest cell has {biggest} rows > "
                f"max_cell_rows={max_cell_rows}; the within-cell pair scan is "
                "quadratic per cell — raise n_cells so cells stay bounded, or "
                "raise max_cell_rows explicitly if this size is intended"
            )
    v = corpus.select(F.col(id_col), F.col(vec_col).alias("_v")).join(
        cells, id_col
    )
    # Per-vector self-dots precomputed in the projections (self_dot /
    # cosine_with_norms, the lsh_near_pairs verify pattern): the within-cell
    # pair scan otherwise folds dot(a,a) and dot(b,b) once per PAIR
    # (quadratic-per-cell) instead of once per vector — a third of the fold
    # work for bit-identical cosines, so the oracle mirror is unchanged.
    a = v.select(
        F.col("cell"),
        F.col(id_col).alias("id_a"),
        F.col("_v").alias("va"),
        self_dot(F.col("_v")).alias("naa"),
    )
    b = v.select(
        F.col("cell"),
        F.col(id_col).alias("id_b"),
        F.col("_v").alias("vb"),
        self_dot(F.col("_v")).alias("nbb"),
    )
    dup = (
        a.join(b, "cell")
        .where(F.col("id_a") < F.col("id_b"))
        .withColumn(
            "cos",
            cosine_with_norms(
                F.col("va"), F.col("vb"), F.col("naa"), F.col("nbb")
            ),
        )
        .where(F.col("cos") >= tau)
        .groupBy("id_b")
        .agg(F.min("id_a").alias("dup_of"), F.max("cos").alias("max_cos"))
        .withColumnRenamed("id_b", id_col)
    )
    return (
        v.join(dup, id_col, "left")
        .select(
            F.col(id_col),
            "cell",
            F.col("dup_of").isNull().alias("keep"),
            "dup_of",
            "max_cos",
        )
    )


# ---------------------------------------------------------------------------
# Cell-assignment fixture (materialized-snapshot oracle pattern,
# materialize.py): the k-means assignment is not SQL-expressible, so the
# hash-gated oracle verifies the WITHIN-CELL prune exactly, given the same
# (id, cell) parquet both engines read. Cell-assignment determinism itself is
# pinned in tests (assign twice -> identical).
# ---------------------------------------------------------------------------

_written: set[str] = set()


def semantic_cells_path(sf_dir: str) -> str:
    return os.path.join(
        _REPO_ROOT, ".materialized", sf_cache_key(sf_dir), "semantic_cells.parquet"
    )


def materialize_semantic_cells(spark: SparkSession, sf_dir: str) -> str:
    """Write the (vec_id, cell) assignment for `embeddings` at ``sf_dir`` to
    parquet once per process; returns the path."""
    path = semantic_cells_path(sf_dir)
    if path not in _written:
        from datafusion_dedup_ai_spark.sources.readers import load_table

        emb = load_table(spark, sf_dir, "embeddings")
        from datafusion_dedup_ai_spark.materialize import (
            atomic_parquet_overwrite,
        )

        atomic_parquet_overwrite(assign_semantic_cells(emb), path)
        _written.add(path)
    return path
