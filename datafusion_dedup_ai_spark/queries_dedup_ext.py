"""Scalable-dedup query pack: exact dedup (oracle-gated) and the MinHash-LSH /
SimHash approximate tiers (rows-only at t2 — xxhash64 has no DuckDB
equivalent; their fidelity is pinned by tests/test_dedup_ext.py against the
exact oracle-gated ngram_jaccard_pairs)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datafusion_dedup_ai_spark.functions import text as T
from datafusion_dedup_ai_spark.operators import dedup as D
from datafusion_dedup_ai_spark.registry import register
from datafusion_dedup_ai_spark.sources.readers import load_spread, load_table


# ===========================================================================
# Exact dedup — keep-first per key
# ===========================================================================


@register(
    "exact_dedup_events",
    """
    SELECT user_id, event_type, event_id, epoch_us(ts) AS ts_us
    FROM (
        SELECT user_id, event_type, event_id, ts,
               ROW_NUMBER() OVER (
                   PARTITION BY user_id, event_type
                   ORDER BY ts, event_id) AS rn
        FROM events)
    WHERE rn = 1
    """,
)
def q_exact_dedup_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First event per (user, type): classic keep-first exact dedup."""
    e = load_table(spark, sf_dir, "events")
    kept = D.exact_dedup(e, ["user_id", "event_type"], ["ts", "event_id"])
    return kept.select(
        "user_id", "event_type", "event_id", F.unix_micros("ts").alias("ts_us")
    )


@register(
    "exact_dedup_documents",
    """
    SELECT content_hash, rep_doc_id, n_copies FROM (
        SELECT md5(text) AS content_hash,
               MIN(doc_id) AS rep_doc_id,
               COUNT(*) AS n_copies
        FROM documents GROUP BY md5(text))
    """,
)
def q_exact_dedup_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-hash dedup: one representative (min id) per distinct text.
    Hash-groupBy form — at 100 TB this is the cheapest dedup pass (map-side
    partial agg on md5, one shuffle)."""
    d = load_table(spark, sf_dir, "documents")
    return d.groupBy(F.md5("text").alias("content_hash")).agg(
        F.min("doc_id").alias("rep_doc_id"), F.count("*").alias("n_copies")
    )


# ===========================================================================
# Approximate distinct (extension; rows-only: approx by definition)
# ===========================================================================


@register("approx_distinct_users", None)
def q_approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ distinct-count vs exact, with relative error — the
    constant-memory path for 100 TB cardinality estimation."""
    e = load_table(spark, sf_dir, "events")
    return e.agg(
        F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"),
        F.countDistinct("user_id").alias("exact_users"),
    ).select(
        "approx_users",
        "exact_users",
        (
            F.abs(F.col("approx_users") - F.col("exact_users"))
            / F.col("exact_users")
        ).alias("rel_error"),
    )


# ===========================================================================
# MinHash + LSH near-duplicate tier (rows-only; fidelity pinned in tests)
# ===========================================================================


def _shingled_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_spread(spark, sf_dir, "documents")
    return d.select("doc_id", T.distinct_shingles(F.col("text")).alias("shingles"))


@register("minhash_signatures", None)
def q_minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-hash MinHash signatures over word-bigram shingles (one explode +
    64 partial-aggregated mins; xxhash64 mixing — no DuckDB analog).

    The contract surface serializes ``sig`` to JSON: the driver's rows-only
    canonicalizer sorts every column and array cells are unhashable in pandas.
    Library callers use D.minhash_signatures directly for the array form.
    """
    sigs = D.minhash_signatures(_shingled_docs(spark, sf_dir))
    return sigs.select("doc_id", F.to_json("sig").alias("sig_json"))


@register("minhash_near_dup_pairs", None)
def q_minhash_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH (16 bands x 4 rows) candidates, exact-Jaccard-verified at 0.2 —
    the scale path replacing the quadratic ngram_jaccard_pairs join."""
    return D.minhash_near_dup_pairs(_shingled_docs(spark, sf_dir))


# ===========================================================================
# SimHash near-duplicate tier (rows-only)
# ===========================================================================


@register("simhash_fingerprints", None)
def q_simhash_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_spread(spark, sf_dir, "documents")
    tok = d.select("doc_id", T.tokens(F.col("text")).alias("tokens"))
    return D.simhash64(tok)


@register("simhash_near_pairs", None)
def q_simhash_near_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hamming <= 6 pairs via pigeonhole banding (equi-join on bit chunks,
    never all-pairs)."""
    d = load_spread(spark, sf_dir, "documents")
    tok = d.select("doc_id", T.tokens(F.col("text")).alias("tokens"))
    return D.simhash_near_pairs(D.simhash64(tok), max_hamming=6)


# ===========================================================================
# Incremental (batch-vs-corpus) dedup — the per-crawl ingestion shape
# ===========================================================================

# Deterministic corpus/batch split of the documents table: 80% existing
# corpus, 20% incoming batch.
_CORPUS_PRED = "doc_id % 10 < 8"
_BATCH_PRED = "doc_id % 10 >= 8"


@register(
    "incremental_exact_new_docs",
    f"""
    WITH corpus AS (
        SELECT * FROM documents WHERE {_CORPUS_PRED}
    ), batch AS (
        SELECT * FROM documents WHERE {_BATCH_PRED}
    ), firsts AS (
        SELECT doc_id, n_chars, md5(text) AS content_hash,
               ROW_NUMBER() OVER (
                   PARTITION BY md5(text) ORDER BY doc_id) AS rn
        FROM batch
    )
    SELECT f.doc_id, f.content_hash, f.n_chars
    FROM firsts f
    WHERE rn = 1 AND NOT EXISTS (
        SELECT 1 FROM corpus c WHERE md5(c.text) = f.content_hash)
    """,
)
def q_incremental_exact_new_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact incremental dedup: documents in the incoming batch (doc_id%10>=8)
    that are genuinely new — first of their content hash within the batch and
    unseen in the existing corpus (doc_id%10<8). The anti-join side is a
    16-byte/row hash projection, so the corpus can be arbitrarily large."""
    d = load_table(spark, sf_dir, "documents")
    corpus = d.where(F.expr(_CORPUS_PRED))
    batch = d.where(F.expr(_BATCH_PRED))
    new = D.incremental_exact_dedup(corpus, batch)
    return new.select("doc_id", "content_hash", "n_chars")


# Corpus signature indexes built by THIS process, keyed by sf_dir — the
# index is immutable per scale factor, so one build serves every evaluation
# (query construction stays cheap, and repeated runs don't litter /tmp with
# corpus-sized parquet copies).
_INDEX_BUILT: set[str] = set()


def _corpus_index_path(spark: SparkSession, sf_dir: str) -> str:
    import os

    from datafusion_dedup_ai_spark.operators import minhash_index as MI

    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sf_name = os.path.basename(os.path.normpath(sf_dir))
    path = os.path.join(repo_root, ".materialized", sf_name, "minhash_index")
    if path not in _INDEX_BUILT:
        d = load_spread(spark, sf_dir, "documents")
        sh = d.select("doc_id", T.distinct_shingles(F.col("text")).alias("shingles"))
        MI.build_minhash_index(sh.where(F.expr(_CORPUS_PRED)), path)
        _INDEX_BUILT.add(path)
    return path


@register("incremental_near_dup_matches", None)
def q_incremental_near_dup_matches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH matches of incoming-batch docs against the existing corpus
    (cross-set only — |batch| x collision-rate candidates, never |corpus|^2),
    via the PERSISTED signature index (operators/minhash_index.py): the
    corpus is shingled/signed ONCE PER PROCESS into a parquet index (the
    materialize.py snapshot pattern), then the batch is matched against the
    index without rescanning corpus text — the shape a per-crawl pipeline
    actually runs. Index-path == recompute-path equality, the
    no-corpus-rescan plan property, and cross-set recall vs the exact
    Jaccard ground truth are pinned in tests/test_dedup_ext.py.
    Rows-only (xxhash64 signatures have no DuckDB analog)."""
    from datafusion_dedup_ai_spark.operators import minhash_index as MI

    index_path = _corpus_index_path(spark, sf_dir)
    d = load_spread(spark, sf_dir, "documents")
    sh = d.select("doc_id", T.distinct_shingles(F.col("text")).alias("shingles"))
    batch_sh = sh.where(F.expr(_BATCH_PRED))
    return MI.incremental_near_dup_matches_indexed(spark, index_path, batch_sh)
