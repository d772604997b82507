"""Extended query pack. As of round 6 this pack registers FIRST, taking the
driver's ~50-entry correctness window (entry_queries.py explains the
rotation): rounds 2-5 validated the other packs in the window; these 59
entries had only ever been validated by the self-run full_correctness.py, so
per the round-5 verdict they now get independent driver rows. All packs are
replayed every round by full_correctness.py -> CORRECTNESS_FULL.json.

Contents: the fuzzy-dedup FINAL step (doc cluster assignment + representative
election over MinHash-LSH pairs — what a pipeline actually applies to drop
near-duplicates), weighted source-mixture / Efraimidis-Spirakis sampling and
the LLaMA-recipe upsampling plan, per-source quality/token-budget selection,
DSIR importance weights, linear quality scores, Gopher rule flags, SemDeDup,
cross-source priority dedup and the source-overlap duplication matrix,
containment near-dup pairs, the Misra-Gries and KMV sketch reports, the skew
-guard report, and the streaming ingest replays (text near-dup + semantic).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from datafusion_dedup_ai_spark.functions import text as T
from datafusion_dedup_ai_spark.operators import dedup as D
from datafusion_dedup_ai_spark.registry import register
from datafusion_dedup_ai_spark.sources.readers import load_spread, load_table

NEAR_DUP_JACCARD = 0.5


def _text_dedup_clusters_oracle() -> str:
    """SQL replay of the FULL fuzzy-dedup composite: MinHash mins + banding +
    candidate + exact-Jaccard verify from the shingle-hash fixture
    (queries_dedup_ext's builders), then connected components as a recursive
    transitive closure (oracles.sql_connected_components)."""
    from datafusion_dedup_ai_spark import queries_dedup_ext as QD
    from datafusion_dedup_ai_spark.operators import hash_fixtures as HF
    from datafusion_dedup_ai_spark.oracles import sql_connected_components

    g = HF.shingle_hashes_glob()
    return f"""
    WITH RECURSIVE {QD._minhash_mins_with(g)},
    {QD._band_cands_with(g)},
    cand AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM bandkeys a JOIN bandkeys b
          ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id
    ),
    common AS (
        SELECT c.id_a, c.id_b, COUNT(*) AS n_common
        FROM cand c
        JOIN '{g}' fa ON fa.doc_id = c.id_a
        JOIN '{g}' fb ON fb.doc_id = c.id_b AND fb.shingle = fa.shingle
        GROUP BY c.id_a, c.id_b
    ),
    pairs AS (
        SELECT cm.id_a, cm.id_b
        FROM common cm
        JOIN sizes sa ON sa.doc_id = cm.id_a
        JOIN sizes sb ON sb.doc_id = cm.id_b
        WHERE CAST(cm.n_common AS DOUBLE) / (sa.n + sb.n - cm.n_common)
              >= {NEAR_DUP_JACCARD}
    ),
    {sql_connected_components("pairs", "SELECT doc_id FROM documents", "doc_id")}
    SELECT f.doc_id, f.cluster_id, s.cluster_size,
           f.doc_id = s.rep AS is_representative
    FROM fullset f JOIN csize s USING (cluster_id)
    """


@register("text_dedup_clusters", _text_dedup_clusters_oracle)
def q_text_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document-level fuzzy-dedup clusters: MinHash-LSH near-dup pairs
    (J >= 0.5, exact-verified) -> hash-min label propagation -> every doc
    labeled (doc_id, cluster_id, cluster_size, is_representative), with the
    min doc_id elected representative — i.e. the keep/drop decision of a
    near-dedup pass, materialized. Singletons keep their own id.

    Scale shape: the pair generator is the bucketed LSH tier (no quadratic
    scan); components route through the SIZE ROUTER
    (cluster_components_auto, round-12 — the incremental_cluster_update
    pattern): near-dup edge lists are pair-density-bounded, so the
    single-task union-find labels them without LP's per-iteration shuffle
    rounds + convergence count jobs (at bench scale those were ~1s of
    pure job-launch overhead on a graph one task labels in milliseconds),
    while graphs beyond the 2M-edge threshold still take the LP scale
    path — O(component diameter) shuffle rounds; near-dup components are
    shallow (dup groups, not social graphs). The same composition as
    embedding_dedup_clusters, over text instead of embeddings. Hash-gated
    since round 5: the oracle replays the whole pipeline INCLUDING
    connected components (recursive-CTE transitive closure — min-id
    component labels are backend-independent, equivalence pinned in
    tests/test_clustering_equiv.py); recall of the pair tier in
    tests/test_dedup_ext.py."""
    from datafusion_dedup_ai_spark.operators.clustering import (
        cluster_components_auto,
    )

    return _text_dedup_clusters_impl(spark, sf_dir, cluster_components_auto)


def _text_dedup_clusters_impl(spark, sf_dir, cc) -> DataFrame:
    d = load_spread(spark, sf_dir, "documents")
    sh = d.select("doc_id", T.distinct_shingles(F.col("text")).alias("shingles"))
    pairs = D.minhash_near_dup_pairs(sh, threshold=NEAR_DUP_JACCARD)
    edges = pairs.select(
        F.col("id_a").alias("row_order_a"), F.col("id_b").alias("row_order_b")
    )
    labels = cc(edges).select(F.col("row_order").alias("doc_id"), "cluster_id")
    full = d.select("doc_id").join(labels, "doc_id", "left").select(
        "doc_id", F.coalesce("cluster_id", F.col("doc_id")).alias("cluster_id")
    )
    # Sizes + representative as ONE window pass (single shuffle by
    # cluster_id); the former groupBy + join-back consumed `full` — and
    # with it the docs-join subtree — twice per run.
    w = Window.partitionBy("cluster_id")
    return full.select(
        "doc_id",
        "cluster_id",
        F.count("*").over(w).alias("cluster_size"),
        (F.col("doc_id") == F.min("doc_id").over(w)).alias(
            "is_representative"
        ),
    )


@register("text_dedup_clusters_star", _text_dedup_clusters_oracle)
def q_text_dedup_clusters_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same fuzzy-dedup composite routed through the large-star/
    small-star component backend (operators/clustering.py::
    cluster_components_star) instead of label propagation — and gated by
    the SAME DuckDB oracle as `text_dedup_clusters`: both backends define
    cluster_id = min(doc_id) per component, so a hash-green row here is an
    end-to-end cross-engine proof that star contraction labels the real
    near-dup graph identically (the random-graph equivalence pins in
    tests/test_clustering_equiv.py are the property-level counterpart)."""
    from datafusion_dedup_ai_spark.operators.clustering import (
        cluster_components_star,
    )

    return _text_dedup_clusters_impl(spark, sf_dir, cluster_components_star)


# Target corpus mixture by source, normalized over the weighted sources;
# unweighted sources are excluded. Quotas exceeding a stratum's population
# cap at availability (testdata strata have 25 docs each at sf0.01, so the
# src0 quota of 40 exercises the cap).
MIXTURE_WEIGHTS = {"src0": 4.0, "src1": 3.0, "src2": 2.0, "src3": 1.0}
MIXTURE_TOTAL = 100  # rows in the mixed sample


@register(
    "source_mixture_sample",
    f"""
    WITH w(source, weight) AS (
        VALUES {", ".join(f"('{s}', {w})" for s, w in sorted(MIXTURE_WEIGHTS.items()))}
    ), avail AS (
        SELECT d.source, COALESCE(w.weight, 0.0) AS weight, COUNT(*) AS n_avail
        FROM documents d LEFT JOIN w USING (source)
        GROUP BY d.source, w.weight
    ), quota AS (
        SELECT source, n_avail,
               LEAST(n_avail,
                     CAST(floor({MIXTURE_TOTAL} * weight /
                          (SELECT SUM(weight) FROM avail WHERE weight > 0))
                          AS BIGINT)) AS take
        FROM avail
    ), ranked AS (
        SELECT doc_id, source,
               CAST(ROW_NUMBER() OVER (
                   PARTITION BY source
                   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT)
                   AS sample_rank
        FROM documents
    )
    SELECT r.doc_id, r.source, r.sample_rank, q.take AS source_quota
    FROM ranked r JOIN quota q USING (source)
    WHERE r.sample_rank <= q.take
    """,
)
def q_source_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted mixture sampling: draw a {MIXTURE_TOTAL}-doc sample whose
    source proportions follow MIXTURE_WEIGHTS (renormalized over the weights
    present, capped at stratum availability), choosing WHICH docs by md5
    order so the draw is deterministic and reproducible under retries — the
    knob that sets a training corpus's domain mixture, distinct from
    source_stratified_sample's fixed top-N-per-stratum. Hash-gated.

    Scale shape: quotas come from a tiny per-source aggregate (broadcast);
    ranking is one window per source partition; no global sort."""
    d = load_table(spark, sf_dir, "documents")
    weights = F.create_map(
        *[x for s, w in sorted(MIXTURE_WEIGHTS.items()) for x in (F.lit(s), F.lit(w))]
    )
    avail = d.groupBy("source").agg(F.count("*").alias("n_avail")).select(
        "source",
        "n_avail",
        F.coalesce(weights[F.col("source")], F.lit(0.0)).alias("weight"),
    )
    wsum = avail.where(F.col("weight") > 0).agg(
        F.sum("weight").alias("weight_sum")
    )
    quota = avail.crossJoin(F.broadcast(wsum)).select(
        "source",
        F.least(
            F.col("n_avail"),
            F.floor(F.lit(MIXTURE_TOTAL) * F.col("weight") / F.col("weight_sum"))
            .cast("bigint"),
        ).alias("source_quota"),
    )
    rk = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    ranked = d.select(
        "doc_id", "source", F.row_number().over(rk).cast("bigint").alias("sample_rank")
    )
    return ranked.join(F.broadcast(quota), "source").where(
        F.col("sample_rank") <= F.col("source_quota")
    ).select("doc_id", "source", "sample_rank", "source_quota")


# ---------------------------------------------------------------------------
# Per-source quality percentile filter + token-budget selection
# ---------------------------------------------------------------------------

QUALITY_KEEP_FRAC = 0.5  # keep the top half of each source by quality
TOKEN_BUDGET_PER_SOURCE = 1000

# Shared quality expression: generated from the SAME constants the Spark
# side uses (functions/text.py), like queries_text.py's mirrors, so the two
# sides cannot drift.
_SQL_STOPWORDS = "[" + ", ".join(f"'{w}'" for w in T.STOPWORDS) + "]"
_SQL_QUALITY = f"""
    WITH t AS (
        SELECT doc_id, source, string_split(text, ' ') AS tk FROM documents
    ), q AS (
        SELECT doc_id, source,
               CAST(len(tk) AS BIGINT) AS n_tokens,
               least(CAST(len(tk) AS DOUBLE) / 50.0, 1.0) * 0.4
                 + (CAST(len(list_distinct(tk)) AS DOUBLE) / len(tk)) * 0.4
                 + (CASE WHEN CAST(len(list_filter(tk, x -> list_contains(
                            {_SQL_STOPWORDS}, x))) AS DOUBLE)
                            / len(tk) BETWEEN 0.02 AND 0.4
                         THEN 1.0 ELSE 0.0 END) * 0.2 AS quality
        FROM t
    )
"""


def _spark_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_spread(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        "source",
        T.token_count(F.col("text")).alias("n_tokens"),
        T.quality_score(F.col("text")).alias("quality"),
    )


@register(
    "per_source_quality_filter",
    f"""{_SQL_QUALITY}
    SELECT doc_id, source, n_tokens, quality, q_rank FROM (
        SELECT doc_id, source, n_tokens, quality,
               percent_rank() OVER (
                   PARTITION BY source
                   ORDER BY quality DESC, doc_id ASC) AS q_rank
        FROM q)
    WHERE q_rank <= {QUALITY_KEEP_FRAC}
    """,
)
def q_per_source_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adaptive quality filtering: keep the top {QUALITY_KEEP_FRAC:.0%} of
    each source by quality PERCENTILE rather than a global threshold — the
    per-domain cut real pipelines use because quality distributions differ
    by source (a global cut would empty the weakest domain). percent_rank =
    (rank-1)/(n-1) is an IEEE-exact rational, and the (quality DESC, doc_id)
    ordering is tie-free, so the filter is hash-gateable cross-engine.
    One window per source partition; no global sort."""
    w = Window.partitionBy("source").orderBy(
        F.col("quality").desc(), F.col("doc_id").asc()
    )
    return (
        _spark_quality(spark, sf_dir)
        .withColumn("q_rank", F.percent_rank().over(w))
        .where(F.col("q_rank") <= QUALITY_KEEP_FRAC)
        .select("doc_id", "source", "n_tokens", "quality", "q_rank")
    )


@register(
    "token_budget_selection",
    f"""{_SQL_QUALITY}
    SELECT doc_id, source, n_tokens, cum_tokens FROM (
        SELECT doc_id, source, n_tokens,
               CAST(SUM(n_tokens) OVER (
                   PARTITION BY source
                   ORDER BY quality DESC, doc_id ASC
                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
        FROM q)
    WHERE cum_tokens <= {TOKEN_BUDGET_PER_SOURCE}
    """,
)
def q_token_budget_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget corpus selection: fill each source's
    {TOKEN_BUDGET_PER_SOURCE}-token budget with its best documents (quality
    order, deterministic tie-break), keeping docs while the running token
    total fits — how a pretraining mix targets tokens-per-domain, not
    docs-per-domain. Integer cumulative sums, exact in both engines.
    One window per source partition; no global sort."""
    w = (
        Window.partitionBy("source")
        .orderBy(F.col("quality").desc(), F.col("doc_id").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        _spark_quality(spark, sf_dir)
        .withColumn("cum_tokens", F.sum("n_tokens").over(w))
        .where(F.col("cum_tokens") <= TOKEN_BUDGET_PER_SOURCE)
        .select("doc_id", "source", "n_tokens", "cum_tokens")
    )


# ---------------------------------------------------------------------------
# Unigram commonness scoring (LM-quality proxy)
# ---------------------------------------------------------------------------


@register(
    "doc_token_commonness",
    """
    WITH ex AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
    ), tc AS (
        SELECT term, COUNT(*) AS tf FROM ex GROUP BY term
    )
    SELECT ex.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(SUM(tc.tf) AS BIGINT) AS sum_tf,
           CAST(MIN(tc.tf) AS BIGINT) AS min_tf,
           CAST(SUM(tc.tf) AS DOUBLE) / COUNT(*) AS avg_tf
    FROM ex JOIN tc USING (term)
    GROUP BY ex.doc_id
    """,
)
def q_doc_token_commonness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram commonness per document — the integer-exact core of the
    LM-based quality signal (CCNet-style perplexity filtering): for each
    doc, the corpus-wide frequency mass of its tokens (sum_tf), its rarest
    token (min_tf), and the mean frequency (avg_tf = one IEEE-exact division
    of two exact integers). Low avg_tf = rare/unusual vocabulary, high =
    templated/common text; a real pipeline swaps the corpus unigram table
    for KenLM scores through the same join. Log-domain scores are
    deliberately NOT in the hash gate (libm ulp + float-sum order); integer
    sums are order-independent so this gates exactly.

    Scale shape: one shuffle to count terms (map-side combined), one join of
    the exploded tokens against the term table (term is the shuffle key; at
    100 TB the term table is Zipf-small after counting and broadcastable),
    one per-doc integer aggregation."""
    d = load_spread(spark, sf_dir, "documents")
    ex = d.select("doc_id", F.explode(T.tokens(F.col("text"))).alias("term"))
    tc = ex.groupBy("term").agg(F.count("*").alias("tf"))
    # no broadcast HINT: a forced broadcast bypasses size thresholds, and a
    # web-scale vocabulary (10^8+ unigrams) would OOM the driver; AQE
    # broadcasts on its own when the counted term table is actually small.
    return (
        ex.join(tc, "term")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_tokens"),
            F.sum("tf").cast("bigint").alias("sum_tf"),
            F.min("tf").cast("bigint").alias("min_tf"),
            (F.sum("tf").cast("double") / F.count("*")).alias("avg_tf"),
        )
    )


@register("skew_guard_report", None)
def q_skew_guard_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self-grading execution of BOTH skew guards (one row per guard):
    (guard, n_unguarded, n_guarded, recall) —

    * ``minhash_max_df``: minhash_near_dup_pairs with the hot-shingle
      boilerplate defense engaged (drop_hot_shingles, operators/dedup.py) vs
      the unguarded run;
    * ``lsh_max_bucket_size``: lsh_near_pairs with the oversized-bucket cap
      vs the unguarded run.

    The guards are RECALL knobs (documented in their operators); this entry
    makes the guarded code paths execute under the correctness audit and
    reports the recall delta as data instead of leaving it test-only. Recall
    is measured against the same operator unguarded (both bucketed — the
    exact baselines grade the unguarded tiers elsewhere). Rows-only by
    design; per-guard floors live in tests/test_dedup_ext.py and
    tests/test_similarity.py.
    """
    from datafusion_dedup_ai_spark.operators import similarity_search as S
    from datafusion_dedup_ai_spark.queries_similarity import NEAR_DUP_THRESHOLD

    d = load_spread(spark, sf_dir, "documents")
    sh = d.select("doc_id", T.distinct_shingles(F.col("text")).alias("shingles"))
    mh_plain = D.minhash_near_dup_pairs(sh, threshold=NEAR_DUP_JACCARD)
    mh_guard = D.minhash_near_dup_pairs(
        sh, threshold=NEAR_DUP_JACCARD, max_df=0.05
    )
    emb = load_table(spark, sf_dir, "embeddings")
    ls_plain = S.lsh_near_pairs(emb, threshold=NEAR_DUP_THRESHOLD)
    ls_guard = S.lsh_near_pairs(
        emb, threshold=NEAR_DUP_THRESHOLD, max_bucket_size=64
    )

    def row(tag: str, plain: DataFrame, guarded: DataFrame) -> DataFrame:
        p = plain.select(F.col(plain.columns[0]).alias("a"), F.col(plain.columns[1]).alias("b"))
        g = guarded.select(F.col(guarded.columns[0]).alias("a"), F.col(guarded.columns[1]).alias("b"))
        kept = g.join(p, ["a", "b"], "left_semi")
        return (
            p.agg(F.count("*").alias("n_unguarded"))
            .crossJoin(kept.agg(F.count("*").alias("n_guarded")))
            .select(
                F.lit(tag).alias("guard"),
                F.col("n_unguarded").cast("bigint").alias("n_unguarded"),
                F.col("n_guarded").cast("bigint").alias("n_guarded"),
                F.when(F.col("n_unguarded") > 0,
                       F.col("n_guarded") / F.col("n_unguarded"))
                .otherwise(F.lit(1.0)).alias("recall"),
            )
        )

    return row("minhash_max_df", mh_plain, mh_guard).unionByName(
        row("lsh_max_bucket_size", ls_plain, ls_guard)
    )


# Streaming ingest surfaced as a batch-shaped entry: per-process staged
# replay directories, torn down and rebuilt once per process so reruns are
# deterministic and stale state from earlier processes never leaks in.
_STREAM_INGEST_DONE: set[str] = set()

# The registered entries whose fn memoizes a converged streaming replay per
# (process, sf): their first call drives the stream, later calls scan the
# snapshot parquet. Benchmarks that want the OPERATOR cost must call
# reset_replay_memos() before every timed run (scale_probe.py always did;
# bench_full.py since round 9 — its round-8 medians measured the snapshot
# scan, undercounting ~150s of replay work: round-8 verdict #1).
STREAMING_REPLAY_ENTRIES = (
    "streaming_near_dup_ingest",
    "streaming_sliding_counts",
    "streaming_stateful_first_events",
    "streaming_attribution_join",
    "streaming_semantic_ingest",
)


def reset_replay_memos() -> None:
    """Clear every streaming-replay memo so the next call of any
    STREAMING_REPLAY_ENTRIES entry re-drives the stream from scratch."""
    for memo in (
        _STREAM_INGEST_DONE,
        _STREAM_SLIDING_DONE,
        _STATEFUL_DEDUP_DONE,
        _SSJOIN_DONE,
        _SEM_INGEST_DONE,
    ):
        memo.clear()


def _streaming_near_dup_ingest_oracle() -> str:
    """SQL replay of the CONVERGED text-ingest survivor corpus. Why a pure
    batch SQL expression equals a 4-batch stateful streaming process
    (round-8 verdict #6 — the argument that upgraded this entry from
    rows-only to hash-gated):

    * Detection is batch-independent. A pair is detected iff the two docs
      share an LSH band (signatures are per-doc functions of the text at
      FIXED geometry — 64 hashes / 16 bands / seed 42 on BOTH the in-batch
      path and the persisted index, minhash_index.py) AND exact Jaccard >=
      0.5. Band collision and Jaccard depend only on the two documents, so
      the same pair graph is seen whether the docs meet in one batch or
      across the index.
    * The replay's chunks are doc_id ranges ASCENDING, the index screen
      drops a doc iff it matches an already-KEPT doc (earlier chunk), and
      in-batch leader election processes ids ascending keeping a doc iff no
      already-kept neighbor — composing to exactly the GLOBAL
      sequential-by-id leader election over the detected pair graph
      (dropped docs never enter the index, so they block no one — same
      rule in both scopes).

    So the oracle = minhash band candidates + exact-Jaccard verify from the
    shingle-hash fixture (the text_dedup_clusters machinery) -> greedy
    min-id leader election (oracles.sql_greedy_min_id_dropped, the same
    parallel-rounds schedule as operators/dedup.greedy_min_id_dropped) ->
    survivors. The sink's too-short-doc singleton-shingle fallback is
    vacuous here: every testdata doc has >= 10 tokens at every sf (the
    fallback itself is pinned in tests/test_streaming.py)."""
    from datafusion_dedup_ai_spark import queries_dedup_ext as QD
    from datafusion_dedup_ai_spark.operators import hash_fixtures as HF
    from datafusion_dedup_ai_spark.oracles import sql_greedy_min_id_dropped

    g = HF.shingle_hashes_glob()
    return f"""
    WITH RECURSIVE {QD._minhash_mins_with(g)},
    {QD._band_cands_with(g)},
    cand AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM bandkeys a JOIN bandkeys b
          ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id
    ),
    common AS (
        SELECT c.id_a, c.id_b, COUNT(*) AS n_common
        FROM cand c
        JOIN '{g}' fa ON fa.doc_id = c.id_a
        JOIN '{g}' fb ON fb.doc_id = c.id_b AND fb.shingle = fa.shingle
        GROUP BY c.id_a, c.id_b
    ),
    pairs AS (
        SELECT cm.id_a, cm.id_b
        FROM common cm
        JOIN sizes sa ON sa.doc_id = cm.id_a
        JOIN sizes sb ON sb.doc_id = cm.id_b
        WHERE CAST(cm.n_common AS DOUBLE) / (sa.n + sb.n - cm.n_common)
              >= {NEAR_DUP_JACCARD}
    ),
    {sql_greedy_min_id_dropped("pairs")}
    SELECT d.doc_id, md5(d.text) AS text_md5
    FROM documents d
    WHERE d.doc_id NOT IN (SELECT id FROM gdropped)
    """


@register("streaming_near_dup_ingest", _streaming_near_dup_ingest_oracle)
def q_streaming_near_dup_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The always-on near-dup ingest (streaming/ingest.py) driven to
    completion over a deterministic 4-chunk replay of `documents`, surfaced
    as the post-ingest SURVIVOR corpus: (doc_id, text_md5). Each micro-batch
    dedups against the persisted MinHash index + in-batch, appends survivors
    to the corpus and their signatures to the index; availableNow drains the
    staged chunks and stops.

    HASH-GATED as of round 9 (previously rows-only): the converged survivor
    set equals the global sequential-by-id leader election over the
    detected near-dup pair graph — see _streaming_near_dup_ingest_oracle
    for the two-part argument (batch-independent detection at fixed index
    geometry; id-ordered chunks + index screen + in-batch leader election =
    global greedy). Replay idempotency and batch-vs-streaming equivalence
    are additionally pinned in tests/test_streaming.py."""
    import os
    import shutil

    from datafusion_dedup_ai_spark.materialize import _REPO_ROOT, sf_cache_key
    from datafusion_dedup_ai_spark.streaming.ingest import (
        replay_documents_as_stream,
        start_near_dup_ingest,
    )

    root = os.path.join(
        _REPO_ROOT, ".materialized", sf_cache_key(sf_dir), "stream_ingest"
    )
    corpus_dir = os.path.join(root, "corpus")
    if root not in _STREAM_INGEST_DONE:
        shutil.rmtree(root, ignore_errors=True)
        stream = replay_documents_as_stream(
            spark, sf_dir, os.path.join(root, "stage")
        )
        q = start_near_dup_ingest(
            stream,
            corpus_dir,
            os.path.join(root, "index"),
            os.path.join(root, "ckpt"),
            threshold=0.5,
            available_now=True,
        )
        q.awaitTermination()
        _STREAM_INGEST_DONE.add(root)
    corpus = spark.read.parquet(corpus_dir)
    return corpus.select("doc_id", F.md5("text").alias("text_md5"))


_STREAM_SLIDING_DONE: set[str] = set()

# Sliding-window params (streaming/windows.py defaults): length 2h, slide
# 30min => every event lands in exactly length/slide = 4 epoch-aligned
# windows. The oracle replays that expansion in pure SQL — no fixture.
_SLIDE_US = 1_800_000_000
_SLIDING_LEN_US = 7_200_000_000


@register(
    "streaming_sliding_counts",
    f"""
    WITH e AS (SELECT epoch_us(ts) AS t, event_type FROM events),
    w AS (
        SELECT (t // {_SLIDE_US}) * {_SLIDE_US}
                   - CAST(i AS BIGINT) * {_SLIDE_US} AS win_start_us,
               event_type
        FROM e, (SELECT unnest([0, 1, 2, 3]) AS i)
    )
    SELECT win_start_us,
           win_start_us + {_SLIDING_LEN_US} AS win_end_us,
           event_type,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM w
    GROUP BY 1, 2, 3
    """,
)
def q_streaming_sliding_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The sliding-window streaming aggregation (streaming/windows.py
    streaming_sliding_counts: 2h windows sliding every 30min, 2h watermark)
    driven to completion over the deterministic event-time-ordered replay of
    `events` — the smoothed rolling-count shape — surfaced as the final
    complete-mode result. Round-5 verdict #8: previously the batch-
    convergence pin lived only in tests/test_streaming.py with no registry
    visibility.

    HASH-GATED (upgraded from the rows-only ask): with the event-time-
    ordered replay the watermark always trails arrivals, so nothing is
    dropped and the converged streaming state equals the batch sliding
    aggregation — which the oracle replays in pure SQL as the epoch-aligned
    window expansion (each event joins its 4 containing window starts:
    floor(t/slide)*slide - i*slide for i in 0..3). Same convergence
    argument tests/test_streaming.py pins against the batch DataFrame.

    Scale shape: watermark-bounded state, (windows open per key) =
    length/slide x the tumbling case — slide choice IS the state budget at
    100 TB/day rates. The run-once replay caches its result parquet per
    (process, sf); the registered query itself is a plain scan."""
    import os
    import shutil

    from datafusion_dedup_ai_spark.materialize import _REPO_ROOT, sf_cache_key
    from datafusion_dedup_ai_spark.streaming import windows as W

    root = os.path.join(
        _REPO_ROOT, ".materialized", sf_cache_key(sf_dir), "stream_sliding"
    )
    out_dir = os.path.join(root, "result")
    if root not in _STREAM_SLIDING_DONE:
        shutil.rmtree(root, ignore_errors=True)
        stream = W.replay_events_as_stream(
            spark, sf_dir, os.path.join(root, "stage")
        )
        q = W.run_stream_to_memory(
            W.streaming_sliding_counts(stream),
            "sliding_registry",
            output_mode="complete",
        )
        try:
            q.processAllAvailable()
            spark.table("sliding_registry").write.mode("overwrite").parquet(
                out_dir
            )
        finally:
            q.stop()
        _STREAM_SLIDING_DONE.add(root)
    return spark.read.parquet(out_dir).select(
        "win_start_us",
        "win_end_us",
        "event_type",
        F.col("n").cast("bigint").alias("n"),
    )


_STATEFUL_DEDUP_DONE: set[str] = set()


@register(
    "streaming_stateful_first_events",
    """
    SELECT user_id, event_type, event_id, first_ts_us FROM (
        SELECT user_id, event_type, event_id, epoch_us(ts) AS first_ts_us,
               ROW_NUMBER() OVER (
                   PARTITION BY user_id, event_type
                   ORDER BY ts, event_id) AS rn
        FROM events) WHERE rn = 1
    """,
)
def q_streaming_stateful_first_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The CUSTOM STATEFUL streaming operator (streaming/stateful.py::
    streaming_dedup_first_event, applyInPandasWithState): keep each
    (user_id, event_type) key's first event across ALL triggers, state
    carrying the first-seen id/timestamp — the §2-C 'custom stateful
    operator' class, driven to completion over the deterministic replay
    and now HASH-GATED (previously pinned only in tests/test_streaming.py).

    Why the gate is sound: the operator sorts each key's within-batch rows
    by (ts, event_id) before electing, and the replay's chunks are
    event-time-ordered (ntile over (ts, event_id)), so a key's globally
    minimal event always arrives in the first trigger that carries the key
    at all — the converged output is exactly the batch
    row_number()-over-(ts, event_id) = 1 projection the oracle computes.

    Scale shape: one row of state per key (id + ts + dup counter, a few
    bytes); production passes dedup_horizon_ms to bound the store via
    EventTimeTimeout eviction (the bounded-window dedup contract —
    eviction/re-admission pinned in tests)."""
    import os
    import shutil

    from datafusion_dedup_ai_spark.materialize import _REPO_ROOT, sf_cache_key
    from datafusion_dedup_ai_spark.streaming import windows as W
    from datafusion_dedup_ai_spark.streaming.stateful import (
        streaming_dedup_first_event,
    )

    root = os.path.join(
        _REPO_ROOT, ".materialized", sf_cache_key(sf_dir), "stream_stateful"
    )
    out_dir = os.path.join(root, "result")
    if root not in _STATEFUL_DEDUP_DONE:
        shutil.rmtree(root, ignore_errors=True)
        stream = W.replay_events_as_stream(
            spark, sf_dir, os.path.join(root, "stage")
        )
        q = W.run_stream_to_memory(
            streaming_dedup_first_event(stream),
            "stateful_registry",
            output_mode="append",
        )
        try:
            q.processAllAvailable()
            spark.table("stateful_registry").write.mode("overwrite").parquet(
                out_dir
            )
        finally:
            q.stop()
        _STATEFUL_DEDUP_DONE.add(root)
    return spark.read.parquet(out_dir).select(
        "user_id", "event_type", "event_id", "first_ts_us"
    )


_SSJOIN_DONE: set[str] = set()

_ATTR_HORIZON_US = 3_600_000_000  # 60 minutes


@register(
    "streaming_attribution_join",
    f"""
    WITH c AS (
        SELECT user_id, event_id AS click_id, epoch_us(ts) AS click_us
        FROM events WHERE event_type = 'click'
    ), p AS (
        SELECT user_id, event_id AS purchase_id, epoch_us(ts) AS purchase_us
        FROM events WHERE event_type = 'purchase'
    )
    SELECT c.user_id, c.click_id, p.purchase_id, c.click_us, p.purchase_us
    FROM c JOIN p ON c.user_id = p.user_id
     AND c.click_us <= p.purchase_us
     AND c.click_us >= p.purchase_us - {_ATTR_HORIZON_US}
    """,
)
def q_streaming_attribution_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked STREAM-STREAM inner join (streaming/windows.py::
    streaming_click_purchase_join): each purchase attributes the same
    user's clicks from the preceding 60 minutes, driven to completion over
    the deterministic event-time-ordered replay of `events`. The one major
    Structured Streaming operator class that previously had no registry
    surface (tumbling/sliding/session aggs and three foreachBatch sinks are
    registered; the two-sided-state join was pinned only in
    tests/test_streaming.py).

    HASH-GATED by the same convergence argument as
    streaming_sliding_counts: with event-time-ordered replay the watermark
    always trails both sides' arrivals, so no click is evicted from join
    state before its attributable purchases arrive, and the converged
    append-mode output equals the batch time-range join — which the oracle
    replays in pure SQL.

    Scale shape: BOTH sides watermarked + an explicit time-range predicate,
    so Spark derives state-eviction bounds — click state is dropped once
    the purchase watermark passes click_ts + horizon. Without the range
    condition state grows forever; the horizon IS the state budget at
    100 TB/day rates. Run-once replay caches its result parquet per
    (process, sf); the registered query itself is a plain scan."""
    import os
    import shutil

    from datafusion_dedup_ai_spark.materialize import _REPO_ROOT, sf_cache_key
    from datafusion_dedup_ai_spark.streaming import windows as W

    root = os.path.join(
        _REPO_ROOT, ".materialized", sf_cache_key(sf_dir), "stream_ssjoin"
    )
    out_dir = os.path.join(root, "result")
    if root not in _SSJOIN_DONE:
        shutil.rmtree(root, ignore_errors=True)
        stream = W.replay_events_as_stream(
            spark, sf_dir, os.path.join(root, "stage")
        )
        joined = W.streaming_click_purchase_join(
            stream, stream, horizon_minutes=_ATTR_HORIZON_US // 60_000_000
        )
        q = W.run_stream_to_memory(
            joined, "ssjoin_registry", output_mode="append"
        )
        try:
            q.processAllAvailable()
            spark.table("ssjoin_registry").write.mode("overwrite").parquet(
                out_dir
            )
        finally:
            q.stop()
        _SSJOIN_DONE.add(root)
    return spark.read.parquet(out_dir).select(
        "user_id", "click_id", "purchase_id", "click_us", "purchase_us"
    )


# ---------------------------------------------------------------------------
# Gopher-style document quality rule pack (Rae et al. 2021, "Scaling Language
# Models: Methods, Analysis & Insights from Training Gopher", arXiv:2112.11446
# §A1.1): per-rule boolean flags + the conjunctive keep decision, so a
# pipeline can audit WHICH rule rejected a document, not just that one did.
# Rules needing punctuation/line structure (bullet ratio, ellipsis lines,
# symbol-to-word ratio) are omitted: the corpus is single-space word text and
# they would be vacuously true; the bands below all have both-sided traffic
# on the testdata. Thresholds are module constants so both engine sides are
# generated from one definition.
# ---------------------------------------------------------------------------

GOPHER_MIN_WORDS = 40
GOPHER_MAX_WORDS = 100_000
GOPHER_MIN_MEAN_WORD_LEN = 3.0
GOPHER_MAX_MEAN_WORD_LEN = 10.0
GOPHER_MIN_ALPHA_FRAC = 0.8
GOPHER_MIN_STOPWORD_HITS = 2


@register(
    "gopher_quality_flags",
    f"""
    WITH t AS (
        SELECT doc_id, string_split(text, ' ') AS tk,
               CAST(length(replace(text, ' ', '')) AS BIGINT) AS n_word_chars
        FROM documents
    ), m AS (
        SELECT doc_id,
               CAST(len(tk) AS BIGINT) AS n_words,
               CAST(n_word_chars AS DOUBLE) / len(tk) AS mean_word_len,
               CAST(len(list_filter(tk, x -> regexp_matches(x, '[a-zA-Z]')))
                    AS DOUBLE) / len(tk) AS frac_alpha_words,
               CAST(len(list_filter(list_distinct(tk),
                    x -> list_contains({_SQL_STOPWORDS}, x))) AS BIGINT)
                   AS n_stopword_hits
        FROM t
    )
    SELECT doc_id, n_words, mean_word_len, frac_alpha_words, n_stopword_hits,
           (n_words BETWEEN {GOPHER_MIN_WORDS} AND {GOPHER_MAX_WORDS})
               AS flag_word_count,
           (mean_word_len BETWEEN {GOPHER_MIN_MEAN_WORD_LEN}
                AND {GOPHER_MAX_MEAN_WORD_LEN}) AS flag_mean_word_len,
           (frac_alpha_words >= {GOPHER_MIN_ALPHA_FRAC}) AS flag_alpha_words,
           (n_stopword_hits >= {GOPHER_MIN_STOPWORD_HITS}) AS flag_stopwords,
           ((n_words BETWEEN {GOPHER_MIN_WORDS} AND {GOPHER_MAX_WORDS})
            AND (mean_word_len BETWEEN {GOPHER_MIN_MEAN_WORD_LEN}
                 AND {GOPHER_MAX_MEAN_WORD_LEN})
            AND (frac_alpha_words >= {GOPHER_MIN_ALPHA_FRAC})
            AND (n_stopword_hits >= {GOPHER_MIN_STOPWORD_HITS})) AS keep
    FROM m
    """,
)
def q_gopher_quality_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher rule flags per document: word-count band, mean-word-length
    band, alphabetic-word fraction, distinct-stopword presence — each as its
    own boolean plus the conjunctive keep. All ratios are single IEEE
    divisions of exact integers (mean_word_len counts non-space chars via
    translate, which equals the sum of token lengths on single-space text),
    so the hash gate holds bitwise. Pure column expressions — codegen-only
    at any scale."""
    d = load_spread(spark, sf_dir, "documents")
    t = T.tokens(F.col("text"))
    n_words = F.size(t).cast("bigint")
    mean_word_len = (
        F.length(F.translate(F.col("text"), " ", "")).cast("double") / F.size(t)
    )
    frac_alpha = (
        F.size(F.filter(t, lambda x: x.rlike("[a-zA-Z]"))).cast("double") / F.size(t)
    )
    sw_hits = F.size(
        F.filter(
            F.array_distinct(t),
            lambda x: x.isin(*T.STOPWORDS),
        )
    ).cast("bigint")
    m = d.select(
        "doc_id",
        n_words.alias("n_words"),
        mean_word_len.alias("mean_word_len"),
        frac_alpha.alias("frac_alpha_words"),
        sw_hits.alias("n_stopword_hits"),
    )
    f_wc = F.col("n_words").between(GOPHER_MIN_WORDS, GOPHER_MAX_WORDS)
    f_mwl = F.col("mean_word_len").between(
        GOPHER_MIN_MEAN_WORD_LEN, GOPHER_MAX_MEAN_WORD_LEN
    )
    f_alpha = F.col("frac_alpha_words") >= GOPHER_MIN_ALPHA_FRAC
    f_sw = F.col("n_stopword_hits") >= GOPHER_MIN_STOPWORD_HITS
    return m.select(
        "doc_id",
        "n_words",
        "mean_word_len",
        "frac_alpha_words",
        "n_stopword_hits",
        f_wc.alias("flag_word_count"),
        f_mwl.alias("flag_mean_word_len"),
        f_alpha.alias("flag_alpha_words"),
        f_sw.alias("flag_stopwords"),
        (f_wc & f_mwl & f_alpha & f_sw).alias("keep"),
    )


# ---------------------------------------------------------------------------
# SemDeDup — semantic (embedding-space) deduplication, hash-gated
# ---------------------------------------------------------------------------


def _semantic_cells_glob() -> str:
    """DuckDB-side path to the (vec_id, cell) assignment fixture, resolved
    lazily and (re)materialized here — same contract as
    materialize.snapshot_glob / queries_multimodal._media_glob, including
    the standalone-consumer session fallback
    (materialize.ensure_fixture_session)."""
    import os

    from datafusion_dedup_ai_spark.materialize import (
        ensure_fixture_session,
        oracle_sf_dir,
    )
    from datafusion_dedup_ai_spark.operators import semantic_dedup as SD

    spark = ensure_fixture_session(SD.semantic_cells_path(oracle_sf_dir()))
    if spark is not None:
        SD.materialize_semantic_cells(spark, oracle_sf_dir())
    return os.path.join(SD.semantic_cells_path(oracle_sf_dir()), "*.parquet")


def _semantic_dedup_oracle() -> str:
    from datafusion_dedup_ai_spark.operators.semantic_dedup import SEMANTIC_TAU
    from datafusion_dedup_ai_spark.queries_similarity import _sql_cosine

    cos = _sql_cosine("a.v", "b.v")
    return f"""
    WITH cells AS (
        SELECT vec_id, cell FROM '{_semantic_cells_glob()}'
    ), v AS (
        SELECT c.vec_id, c.cell, e.embedding::DOUBLE[] AS v
        FROM cells c JOIN embeddings e USING (vec_id)
    ), dup AS (
        SELECT b.vec_id, MIN(a.vec_id) AS dup_of, MAX({cos}) AS max_cos
        FROM v a JOIN v b ON a.cell = b.cell AND a.vec_id < b.vec_id
        WHERE {cos} >= {SEMANTIC_TAU}
        GROUP BY b.vec_id
    )
    SELECT v.vec_id, v.cell, dup.dup_of IS NULL AS keep,
           dup.dup_of, dup.max_cos
    FROM v LEFT JOIN dup USING (vec_id)
    """


@register("semantic_dedup_embeddings", _semantic_dedup_oracle)
def q_semantic_dedup_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (arXiv:2303.09540) keep/drop decisions over `embeddings`:
    spherical-k-means cells, then within-cell cosine >= tau drops every
    vector with a smaller-id near-duplicate (operators/semantic_dedup.py).
    The Spark side runs the FULL operator (centroid train + assign + prune);
    the oracle replays the prune in SQL over the materialized (vec_id, cell)
    fixture — so the hash gate verifies the within-cell logic exactly AND
    that the query's own assignment matches the fixture's (assignment
    determinism, also pinned in tests/test_semdedup.py)."""
    from datafusion_dedup_ai_spark.operators.semantic_dedup import semantic_dedup

    emb = load_table(spark, sf_dir, "embeddings")
    return semantic_dedup(emb)


# ===========================================================================
# Round-5 additions: cross-source priority dedup, model-shaped quality
# scoring, DSIR-style importance weighting, heavy-hitter sketching.
# ===========================================================================

# Deterministic source priority: parse the numeric suffix of srcN and
# scramble it with an affine map so the rule is neither "min source string"
# nor "min doc_id" (a real pipeline's priority list is an explicit ranking
# of curated > reference > crawl sources; the scramble stands in for that
# editorial ordering while staying SQL-replayable).
_SRC_PRIORITY_SQL = "(CAST(substr(source, 4) AS BIGINT) * 7) % 20"


@register(
    "cross_source_priority_dedup",
    f"""
    WITH keyed AS (
        SELECT doc_id, source, n_chars,
               md5(array_to_string((string_split(text, ' '))[1:8], ' '))
                   AS prefix_key,
               {_SRC_PRIORITY_SQL} AS priority
        FROM documents
    ), ranked AS (
        SELECT *, COUNT(*) OVER (PARTITION BY prefix_key) AS n_copies,
               COUNT(DISTINCT source) OVER (PARTITION BY prefix_key)
                   AS n_sources,
               ROW_NUMBER() OVER (
                   PARTITION BY prefix_key ORDER BY priority, doc_id) AS rn
        FROM keyed
    )
    SELECT doc_id, source, prefix_key, n_copies, n_sources
    FROM ranked WHERE rn = 1
    """,
)
def q_cross_source_priority_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source dedup with a keep-priority rule: documents sharing a
    content fingerprint (first-8-token prefix hash — near-dup bucket with
    real traffic on this corpus; exact md5(text) has none) keep ONE copy,
    chosen by source priority then doc_id. This is the "prefer the curated
    source's copy over the crawl's" pass every multi-source training
    pipeline runs after per-source dedup.

    Scale shape: one shuffle on the fingerprint; the window carries three
    frame-less aggregates over the same partition key (single Exchange +
    Sort, no self-join). Priority is a pure expression — a real priority
    list would be a broadcast map join, same plan otherwise."""
    d = load_table(spark, sf_dir, "documents")
    keyed = d.select(
        "doc_id",
        "source",
        F.md5(F.concat_ws(" ", F.slice(T.tokens(F.col("text")), 1, 8))).alias(
            "prefix_key"
        ),
        ((F.substring("source", 4, 10).cast("bigint") * 7) % 20).alias("priority"),
    )
    w = Window.partitionBy("prefix_key")
    wo = w.orderBy("priority", "doc_id")
    ranked = keyed.select(
        "doc_id",
        "source",
        "prefix_key",
        F.count("*").over(w).alias("n_copies"),
        F.size(F.collect_set("source").over(w)).cast("bigint").alias("n_sources"),
        F.row_number().over(wo).alias("rn"),
    )
    return ranked.where(F.col("rn") == 1).drop("rn")


# Hash-derived per-token weight in [-1000, 1000]: both engines parse the
# first 8 hex chars of md5(token) as an integer. A production classifier
# would broadcast-join real trained weights; the hash derivation keeps the
# fixture self-contained while exercising the identical aggregation plan
# (and is itself a published trick — hashed features, Weinberger et al. 2009).
_TOKEN_W_SPARK = None  # built inline below
_TOKEN_W_SQL = "(CAST(('0x' || substr(md5(term), 1, 8)) AS BIGINT) % 2001) - 1000"
_QUALITY_BIAS = -3_500  # centers the hash-weight logit so keep/drop both fire
_QUALITY_THRESHOLD = 0


@register(
    "linear_quality_scores",
    f"""
    WITH toks AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
    ), scored AS (
        SELECT doc_id,
               COUNT(*) AS n_tokens,
               CAST(SUM({_TOKEN_W_SQL}) + {_QUALITY_BIAS} AS BIGINT)
                   AS logit_scaled
        FROM toks GROUP BY doc_id
    )
    SELECT doc_id, n_tokens, logit_scaled,
           logit_scaled >= {_QUALITY_THRESHOLD} AS keep
    FROM scored
    """,
)
def q_linear_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """fastText-shaped linear quality classifier (the CCNet/DCLM filtering
    stage): per-document logit = bias + sum over token occurrences of a
    per-token weight, keep when the logit clears a threshold. Weights are
    integer-scaled so the aggregation is exact at any parallelism (the
    float sigmoid is monotone in the logit, so thresholding the logit IS
    thresholding the probability).

    Scale shape: weights are computed inline from the token bytes (no join
    at all); explode -> one map-side-combined sum per doc. With a real
    trained vocabulary this becomes explode -> broadcast-join weights ->
    same aggregate."""
    d = load_spread(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(T.tokens(F.col("text"))).alias("term"))
    w = (
        F.conv(F.substring(F.md5("term"), 1, 8), 16, 10).cast("bigint") % 2001
        - 1000
    )
    scored = toks.groupBy("doc_id").agg(
        F.count("*").alias("n_tokens"),
        (F.sum(w) + F.lit(_QUALITY_BIAS)).alias("logit_scaled"),
    )
    return scored.select(
        "doc_id",
        "n_tokens",
        "logit_scaled",
        (F.col("logit_scaled") >= F.lit(_QUALITY_THRESHOLD)).alias("keep"),
    )


_DSIR_SCALE = 1_000_000
_DSIR_TARGET_PRED = "CAST(substr(source, 4) AS BIGINT) < 4"  # srcs 0-3


@register(
    "dsir_importance_weights",
    f"""
    WITH toks AS (
        SELECT doc_id, source, unnest(string_split(text, ' ')) AS term
        FROM documents
    ), raw_counts AS (
        SELECT term, COUNT(*) AS raw_cnt FROM toks GROUP BY term
    ), target_counts AS (
        SELECT term, COUNT(*) AS target_cnt FROM toks
        WHERE {_DSIR_TARGET_PRED} GROUP BY term
    ), feature_scores AS (
        SELECT r.term,
               (COALESCE(t.target_cnt, 0) * {_DSIR_SCALE}) // r.raw_cnt
                   AS fscore
        FROM raw_counts r LEFT JOIN target_counts t USING (term)
    )
    SELECT k.doc_id,
           COUNT(*) AS n_tokens,
           CAST(SUM(f.fscore) AS BIGINT) AS dsir_score_scaled
    FROM toks k JOIN feature_scores f USING (term)
    GROUP BY k.doc_id
    """,
)
def q_dsir_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style importance weights (Xie et al. 2023, arXiv:2302.03169):
    score each document by how target-like its token distribution is —
    sum over token occurrences of the per-token target/raw frequency ratio.
    The target set is sources 0-3 (the "curated" slice); the raw set is the
    whole corpus. Ratios are integer-scaled (floor((target*1e6)/raw)) so the
    sum is exact at any parallelism — DSIR's log-ratio form is monotone-
    equivalent for ranking/resampling, and IEEE log would break the
    bit-exact oracle gate.

    Scale shape: two map-side-combined token aggregations; the per-token
    score table is vocabulary-sized and broadcast-joins back onto the
    exploded corpus (at web scale: a shuffle join on term with the same
    hot-term salting as the TF-IDF pass). One final sum per doc."""
    d = load_spread(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", "source", F.explode(T.tokens(F.col("text"))).alias("term")
    )
    raw = toks.groupBy("term").agg(F.count("*").alias("raw_cnt"))
    target = (
        toks.where(F.substring("source", 4, 10).cast("bigint") < 4)
        .groupBy("term")
        .agg(F.count("*").alias("target_cnt"))
    )
    fscores = raw.join(target, "term", "left").select(
        "term",
        F.expr(
            f"(COALESCE(target_cnt, 0) * {_DSIR_SCALE}) div raw_cnt"
        ).alias("fscore"),
    )
    return (
        toks.join(F.broadcast(fscores), "term")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum("fscore").alias("dsir_score_scaled"),
        )
    )


_MG_K = 64


@register(
    "heavy_hitter_terms",
    f"""
    WITH toks AS (
        SELECT unnest(string_split(text, ' ')) AS term FROM documents
    ), ex AS (
        SELECT term, COUNT(*) AS exact_count FROM toks GROUP BY term
    ), n AS (
        SELECT COUNT(*) // {_MG_K + 1} AS bound FROM toks
    )
    SELECT term,
           CAST(exact_count AS BIGINT) AS exact_count,
           CAST((SELECT bound FROM n) AS BIGINT) AS error_bound,
           TRUE AS retained,
           TRUE AS bound_ok
    FROM ex WHERE exact_count > (SELECT bound FROM n)
    """,
)
def q_heavy_hitter_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Misra-Gries heavy hitters with k=_MG_K counters per partition
    summary (operators/sketches.py) — the bounded-memory path for
    frequent-term mining when the vocabulary itself is too wide to shuffle.

    Hash-gated via the GUARANTEE SET (round-6 verdict #9): the sketch's raw
    counts are partition-order dependent, but its theorem is not — every
    term with true count > N/(k+1) MUST be retained, with underestimate in
    [0, N/(k+1)]. The Spark side runs the real sketch and emits, for each
    guaranteed-heavy term (exact_count > N/(k+1), computed exactly), whether
    the merged summary retained it and whether its estimate honors the
    bounds; the oracle derives the same term set in SQL and asserts both
    flags TRUE. A sketch-violating run flips a boolean and goes hash-red —
    the invariant is now machine-checked by the driver, not only by
    tests/test_sketches.py."""
    from datafusion_dedup_ai_spark.operators.sketches import misra_gries_terms

    d = load_spread(spark, sf_dir, "documents")
    mg = misra_gries_terms(d, "text", k=_MG_K)
    toks = d.select(F.explode(F.split(F.col("text"), " ")).alias("term"))
    exact = toks.groupBy("term").agg(
        F.count("*").cast("bigint").alias("exact_count")
    )
    bound = toks.agg(
        F.expr(f"count(*) div {_MG_K + 1}").cast("bigint").alias("error_bound")
    )
    guaranteed = exact.crossJoin(F.broadcast(bound)).where(
        F.col("exact_count") > F.col("error_bound")
    )
    return guaranteed.join(mg, "term", "left").select(
        "term",
        "exact_count",
        "error_bound",
        F.col("mg_count").isNotNull().alias("retained"),
        (
            F.col("mg_count").isNotNull()
            & (F.col("mg_count") <= F.col("exact_count"))
            & (F.col("exact_count") - F.col("mg_count") <= F.col("error_bound"))
        ).alias("bound_ok"),
    )


# ---------------------------------------------------------------------------
# Jaccard-CONTAINMENT near-dup pairs (asymmetric: subset documents)
# ---------------------------------------------------------------------------

CONTAINMENT_THRESHOLD = 0.5
_SQL_TOKS = "string_split(text, ' ')"
_SQL_BIGRAMS_T = "[t[i] || ' ' || t[i+1] FOR i IN range(1, len(t))]"


@register(
    "doc_containment_pairs",
    f"""
    WITH toks AS (
        SELECT doc_id, {_SQL_TOKS} AS t FROM documents
    ), sh AS (
        SELECT doc_id, list_distinct({_SQL_BIGRAMS_T}) AS shingles FROM toks
    ), ex AS (
        SELECT doc_id, unnest(shingles) AS s FROM sh
    ), inter AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
        FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    ), sizes AS (
        SELECT doc_id, len(shingles) AS n_sh FROM sh
    )
    SELECT doc_a, doc_b, n_common,
           CAST(least(sa.n_sh, sb.n_sh) AS BIGINT) AS n_min,
           CAST(n_common AS DOUBLE) / least(sa.n_sh, sb.n_sh) AS containment
    FROM inter
    JOIN sizes sa ON doc_a = sa.doc_id
    JOIN sizes sb ON doc_b = sb.doc_id
    WHERE CAST(n_common AS DOUBLE) / least(sa.n_sh, sb.n_sh)
          >= {CONTAINMENT_THRESHOLD}
    """,
)
def q_doc_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric near-dup pairs by bigram-shingle CONTAINMENT — |A∩B| over
    the SMALLER set, not the union. Jaccard misses a short document pasted
    inside a much longer one (the quote/boilerplate-wrapper case: J =
    |A|/|B| -> 0 as B grows, containment stays 1.0); dedup passes built on
    suffix arrays (Lee et al. 2021) catch these, and this is the
    shingle-join equivalent. Same plan shape as ngram_jaccard_pairs — the
    shingle equi-join is the one shuffle; only the normalizer differs."""
    d = load_spread(spark, sf_dir, "documents")
    sh = d.select("doc_id", T.distinct_shingles(F.col("text")).alias("shingles"))
    sizes = sh.select("doc_id", F.size("shingles").cast("bigint").alias("n_sh"))
    ex = sh.select("doc_id", F.explode("shingles").alias("s"))
    a, b = ex.alias("a"), ex.alias("b")
    inter = (
        a.join(b, (F.col("a.s") == F.col("b.s")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("n_common"))
    )
    sa, sb = sizes.alias("sa"), sizes.alias("sb")
    out = (
        inter.join(sa, F.col("doc_a") == F.col("sa.doc_id"))
        .join(sb, F.col("doc_b") == F.col("sb.doc_id"))
        .withColumn("n_min", F.least(F.col("sa.n_sh"), F.col("sb.n_sh")).cast("bigint"))
        .withColumn("containment", F.col("n_common").cast("double") / F.col("n_min"))
    )
    return out.where(F.col("containment") >= CONTAINMENT_THRESHOLD).select(
        "doc_a", "doc_b", "n_common", "n_min", "containment"
    )


# ---------------------------------------------------------------------------
# Weighted sampling without replacement (Efraimidis-Spirakis)
# ---------------------------------------------------------------------------

WEIGHTED_SAMPLE_K = 100
# u = (hex8(md5(doc_id)) + 1) / 2^32 in (0, 1]; key = ln(u) / weight.
# E-S: taking the K LARGEST u^(1/w) — equivalently the K largest ln(u)/w —
# draws a without-replacement sample where selection probability is
# proportional to weight (Efraimidis & Spirakis 2006).
_ES_U_SQL = (
    "((('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT + 1.0)"
    " / 4294967296.0)"
)


@register(
    "weighted_doc_sample",
    f"""
    SELECT doc_id, source, n_chars, sample_rank FROM (
        SELECT doc_id, source, n_chars,
               CAST(ROW_NUMBER() OVER (
                   ORDER BY ln({_ES_U_SQL}) / CAST(n_chars AS DOUBLE) DESC,
                            doc_id ASC
               ) AS BIGINT) AS sample_rank
        FROM documents)
    WHERE sample_rank <= {WEIGHTED_SAMPLE_K}
    """,
)
def q_weighted_doc_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement (Efraimidis-
    Spirakis exponential-keys): keep the K docs with the largest
    ln(u)/weight where u is an md5-derived uniform — selection probability
    proportional to weight (here n_chars: a token-mass-proportional draw,
    the shape used for budgeted corpus subsetting). Like every sampler in
    this pack, u is a pure function of doc_id, so the sample is reproducible
    across runs/engines/partitionings.

    The double key stays INTERNAL: Spark's Math.log and DuckDB's libm ln
    differ by 1 ulp on ~5% of values (measured), so the gate compares the
    selected ids/ranks, never the keys. Key gaps between distinct docs are
    ~1e7 ulp, so selection order is ulp-robust.

    Scale shape: global top-K = TakeOrderedAndProject (per-partition heaps,
    no full sort, no single-partition window); the rank is re-derived over the
    K survivors only."""
    d = load_table(spark, sf_dir, "documents")
    v = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10).cast("double")
    u = (v + F.lit(1.0)) / F.lit(4294967296.0)
    key = F.log(u) / F.col("n_chars").cast("double")
    top = (
        d.select("doc_id", "source", "n_chars", key.alias("_key"))
        .orderBy(F.col("_key").desc(), F.col("doc_id").asc())
        .limit(WEIGHTED_SAMPLE_K)
    )
    w = Window.orderBy(F.col("_key").desc(), F.col("doc_id").asc())
    return top.select(
        "doc_id",
        "source",
        "n_chars",
        F.row_number().over(w).cast("bigint").alias("sample_rank"),
    )


# ---------------------------------------------------------------------------
# Source upsampling plan (epochs-per-source, LLaMA-recipe shape)
# ---------------------------------------------------------------------------

# Target mixture weight per source bucket: sources 0-3 (the "curated" slice)
# get 4x the weight of the rest. All arithmetic integer-scaled; the
# fractional epoch is realized per-doc by an md5 draw against the scaled
# remainder, so expected copies per source hit the target exactly.
_UPSAMPLE_SCALE = 1_000_000
_TARGET_W_SQL = "(CASE WHEN CAST(substr(source, 4) AS BIGINT) < 4 THEN 4 ELSE 1 END)"


@register(
    "source_upsampling_plan",
    f"""
    WITH weighted AS (
        SELECT doc_id, source, n_chars, {_TARGET_W_SQL} AS target_w
        FROM documents
    ), totals AS (
        SELECT SUM(n_chars * target_w) AS wsum, SUM(n_chars) AS csum
        FROM weighted
    ), planned AS (
        SELECT doc_id, source, n_chars,
               (target_w * csum * {_UPSAMPLE_SCALE}) // wsum AS r_scaled,
               ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 25, 8))::BIGINT
                   % {_UPSAMPLE_SCALE} AS draw
        FROM weighted CROSS JOIN totals
    )
    SELECT doc_id, source, CAST(r_scaled AS BIGINT) AS r_scaled,
           CAST(r_scaled // {_UPSAMPLE_SCALE}
                + CASE WHEN draw < r_scaled % {_UPSAMPLE_SCALE}
                       THEN 1 ELSE 0 END AS BIGINT) AS n_copies
    FROM planned
    """,
)
def q_source_upsampling_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Epochs-per-source materialization plan (the LLaMA-style data recipe:
    'see curated sources ~4x as often'): renormalizes each source's token
    mass to its target mixture weight and emits per-doc integer copy counts.
    The repeat factor r = target_share / natural_share is realized as
    floor(r) copies plus one more with probability frac(r), decided by an
    md5 draw — so a source's expected emitted tokens hit the target exactly,
    deterministically, with no RNG state.

    All integer arithmetic (scaled by 1e6, floor division) — exact at any
    parallelism on both engines. Scale shape: one single-row total
    (broadcast back), then a pure map; the expansion itself (explode over
    sequence(1, n_copies)) is a downstream map too."""
    d = load_table(spark, sf_dir, "documents")
    target_w = F.when(
        F.substring("source", 4, 10).cast("bigint") < 4, F.lit(4)
    ).otherwise(F.lit(1))
    weighted = d.select("doc_id", "source", "n_chars", target_w.alias("target_w"))
    totals = weighted.agg(
        F.sum(F.col("n_chars") * F.col("target_w")).alias("wsum"),
        F.sum("n_chars").alias("csum"),
    )
    planned = weighted.crossJoin(F.broadcast(totals)).select(
        "doc_id",
        "source",
        F.expr(f"(target_w * csum * {_UPSAMPLE_SCALE}) div wsum").alias("r_scaled"),
        (
            F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 25, 8), 16, 10)
            .cast("bigint")
            % _UPSAMPLE_SCALE
        ).alias("draw"),
    )
    return planned.select(
        "doc_id",
        "source",
        F.col("r_scaled").cast("bigint").alias("r_scaled"),
        (
            F.expr(f"r_scaled div {_UPSAMPLE_SCALE}")
            + F.when(
                F.col("draw") < F.col("r_scaled") % _UPSAMPLE_SCALE, F.lit(1)
            ).otherwise(F.lit(0))
        )
        .cast("bigint")
        .alias("n_copies"),
    )


# ---------------------------------------------------------------------------
# KMV distinct-count sketch (mergeable bounded-state cardinality)
# ---------------------------------------------------------------------------


def _kmv_oracle() -> str:
    """Bit-exact SQL replay of the KMV sketch: the hash is the 60-bit
    md5-hex-prefix integer (DuckDB's '0x'-cast parses it identically to
    Python's int(hexdigest[:15], 16)), the state is the 64 smallest
    distinct hashes, and the estimator arithmetic repeats the Spark
    expression operation-for-operation so the doubles match bitwise."""
    space = float(1 << 60)
    return f"""
    WITH toks AS (
        SELECT string_split(text, ' ') AS t FROM documents WHERE text IS NOT NULL
    ), units AS (
        SELECT unnest([t[i] || ' ' || t[i+1] FOR i IN range(1, len(t))]) AS term
        FROM toks
    ), hs AS (
        SELECT DISTINCT ('0x' || substr(md5(term), 1, 15))::BIGINT AS h
        FROM units
    ), merged AS (
        SELECT h FROM hs ORDER BY h LIMIT 64
    ), state AS (
        SELECT COUNT(*) AS n_state, MAX(h) AS kth_hash FROM merged
    ), ex AS (
        SELECT COUNT(DISTINCT term) AS exact_distinct FROM units
    )
    SELECT CAST(64 AS BIGINT) AS k,
           CAST(n_state AS BIGINT) AS n_state,
           -- CAST to DOUBLE before the +1.0: DuckDB promotes BIGINT + 1.0
           -- to exact DECIMAL(21,1), which rounds the division differently
           -- from Spark's double-by-double (measured 1-ulp drift)
           (CAST(kth_hash AS DOUBLE) + 1.0) / {space!r} AS kth_frac,
           CASE WHEN n_state < 64 THEN CAST(n_state AS DOUBLE)
                ELSE 63.0 / ((CAST(kth_hash AS DOUBLE) + 1.0) / {space!r})
                END AS est_distinct,
           CAST(exact_distinct AS BIGINT) AS exact_distinct,
           abs(CASE WHEN n_state < 64 THEN CAST(n_state AS DOUBLE)
                    ELSE 63.0 / ((CAST(kth_hash AS DOUBLE) + 1.0) / {space!r})
                    END
               - exact_distinct) / exact_distinct AS rel_error
    FROM state CROSS JOIN ex
    """


@register("kmv_distinct_sketch", _kmv_oracle)
def q_kmv_distinct_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-minimum-values distinct-token estimate (Bar-Yossef et al. 2002):
    keep the K smallest md5-hash fractions over the word-bigram stream (916
    distinct bigrams at sf0.01 — wide enough that the estimator path, not
    the exact small-vocabulary fallback, is what runs); the K-th smallest
    value m estimates the cardinality as (K-1)/m. Self-grading
    single row — (k, kth_frac, est_distinct, exact_distinct, rel_error) —
    so the driver sees the error directly; the mergeability law (top-K of
    partial top-Ks == global top-K) and the error bound are pinned in
    tests/test_sketches.py. Hash-gated since round 5 (late): approximate
    as an ESTIMATE but fully deterministic as a COMPUTATION — the md5-based
    hash, k-min state, and estimator arithmetic replay bit-exactly in SQL.
    Complements approx_count_distinct (HLL) by exposing the sketch
    STATE (the K hashes are also a uniform sample of the distinct values —
    reusable for distinct-value sampling, which HLL cannot do)."""
    from datafusion_dedup_ai_spark.operators.sketches import kmv_distinct_report

    d = load_spread(spark, sf_dir, "documents")
    return kmv_distinct_report(d, "text", k=64, gram=2)


# ---------------------------------------------------------------------------
# Cross-source duplication matrix (corpus diagnostics)
# ---------------------------------------------------------------------------


@register(
    "source_overlap_matrix",
    """
    WITH keyed AS (
        SELECT doc_id, source,
               md5(array_to_string((string_split(text, ' '))[1:8], ' '))
                   AS prefix_key
        FROM documents
    ),
    pairs AS (
        SELECT least(a.source, b.source) AS source_a,
               greatest(a.source, b.source) AS source_b,
               a.prefix_key
        FROM keyed a JOIN keyed b
          ON a.prefix_key = b.prefix_key AND a.doc_id < b.doc_id
    )
    SELECT source_a, source_b,
           COUNT(*) AS n_dup_pairs,
           CAST(COUNT(DISTINCT prefix_key) AS BIGINT) AS n_keys_shared
    FROM pairs GROUP BY source_a, source_b
    """,
)
def q_source_overlap_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise duplication matrix between sources: for every (unordered)
    source pair, how many duplicate doc pairs share a content fingerprint
    (the same first-8-token prefix hash cross_source_priority_dedup keys on)
    and how many distinct fingerprints collide. The corpus-health diagnostic
    that tells you crawl-X is largely a copy of curated-Y BEFORE you spend a
    dedup pass on it — and the input to choosing a cross-source dedup
    priority order.

    Scale shape: one shuffle on the fingerprint; within-key self-join is
    bounded by duplicate-group size (boilerplate-heavy keys are the skew to
    watch — the same max_df-style cap as the shingle tiers applies); the
    final matrix is |sources|^2 rows, i.e. tiny."""
    d = load_table(spark, sf_dir, "documents")
    keyed = d.select(
        "doc_id",
        "source",
        F.md5(F.concat_ws(" ", F.slice(T.tokens(F.col("text")), 1, 8))).alias(
            "prefix_key"
        ),
    )
    a, b = keyed.alias("a"), keyed.alias("b")
    pairs = a.join(
        b,
        (F.col("a.prefix_key") == F.col("b.prefix_key"))
        & (F.col("a.doc_id") < F.col("b.doc_id")),
    ).select(
        F.least(F.col("a.source"), F.col("b.source")).alias("source_a"),
        F.greatest(F.col("a.source"), F.col("b.source")).alias("source_b"),
        F.col("a.prefix_key").alias("prefix_key"),
    )
    return pairs.groupBy("source_a", "source_b").agg(
        F.count("*").alias("n_dup_pairs"),
        F.countDistinct("prefix_key").cast("bigint").alias("n_keys_shared"),
    )


# ---------------------------------------------------------------------------
# Incremental semantic matching against a persisted vector index
# ---------------------------------------------------------------------------

# Registration-free import (shared_params): pulling these from
# queries_similarity would register that whole pack mid-extras and displace
# window slots (entry_queries.py round-6 rotation).
from datafusion_dedup_ai_spark.shared_params import (  # noqa: E402
    NEAR_DUP_THRESHOLD,
    _sql_cosine,
)

# ---------------------------------------------------------------------------

# Deterministic corpus/batch split (mirrors queries_dedup_ext's): 80%
# existing corpus, 20% incoming batch.
_VEC_CORPUS_PRED = "vec_id % 10 < 8"
_VEC_BATCH_PRED = "vec_id % 10 >= 8"

_VINDEX_BUILT: set[str] = set()


def _vector_index_path(spark: SparkSession, sf_dir: str) -> str:
    import os

    from datafusion_dedup_ai_spark.materialize import _REPO_ROOT, sf_cache_key
    from datafusion_dedup_ai_spark.operators import vector_index as VI

    path = os.path.join(
        _REPO_ROOT, ".materialized", sf_cache_key(sf_dir), "vector_index"
    )
    if path not in _VINDEX_BUILT:
        emb = load_table(spark, sf_dir, "embeddings")
        # Explicit n_bits=4: this index is hash-gated against the FIXED
        # lsh_buckets fixture geometry (an index whose width froze at build
        # time). Production builds omit n_bits and get the corpus-adaptive
        # width recorded in the sidecar (build_vector_index docstring).
        VI.build_vector_index(emb.where(F.expr(_VEC_CORPUS_PRED)), path, n_bits=4)
        _VINDEX_BUILT.add(path)
    return path


def _incremental_semantic_oracle() -> str:
    """Cross-set replay from the hyperplane-bucket fixture: per-vector codes
    are independent of the other vectors, so the full-corpus fixture serves
    both sides; only the candidate join is restricted to cross-set pairs,
    then the bitwise-mirrored cosine verifies."""
    from datafusion_dedup_ai_spark.operators import hash_fixtures as HF

    g = HF.lsh_buckets_glob()
    return f"""
    WITH cvec AS (
        SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
    ),
    cand AS (
        SELECT DISTINCT b.vec_id AS batch_id, c.vec_id AS corpus_id
        FROM '{g}' b JOIN '{g}' c
          ON b."table" = c."table" AND b.bucket = c.bucket
        WHERE b.vec_id % 10 >= 8 AND c.vec_id % 10 < 8
    )
    SELECT cd.batch_id, cd.corpus_id,
           {_sql_cosine('bv.v', 'cv.v')} AS cosine
    FROM cand cd
    JOIN cvec bv ON bv.vec_id = cd.batch_id
    JOIN cvec cv ON cv.vec_id = cd.corpus_id
    WHERE {_sql_cosine('bv.v', 'cv.v')} >= {NEAR_DUP_THRESHOLD}
    """


@register("incremental_semantic_matches", _incremental_semantic_oracle)
def q_incremental_semantic_matches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic near-dup matches of an incoming batch (vec_id%10>=8) against
    the existing corpus (vec_id%10<8), via the PERSISTED vector index
    (operators/vector_index.py): the corpus is coded ONCE PER PROCESS into a
    parquet index; the batch path computes only its own codes, bucket-joins
    them against the index's stored codes, and exact-cosine-verifies the
    candidates against the index's stored embeddings — corpus codes are
    never recomputed (single-ArrowEvalPython plan assert in
    tests/test_vector_index.py). Hash-gated: the oracle replays the
    cross-set bucket join + bitwise-mirrored cosine from the materialized
    hyperplane-bucket fixture."""
    from datafusion_dedup_ai_spark.operators import vector_index as VI

    index_path = _vector_index_path(spark, sf_dir)
    emb = load_table(spark, sf_dir, "embeddings")
    batch = emb.where(F.expr(_VEC_BATCH_PRED))
    return VI.incremental_semantic_matches_indexed(
        spark, index_path, batch, threshold=NEAR_DUP_THRESHOLD
    )


_SEM_INGEST_DONE: set[str] = set()


def _streaming_semantic_ingest_oracle() -> str:
    """SQL replay of the CONVERGED semantic-ingest survivor corpus — the
    embedding twin of _streaming_near_dup_ingest_oracle, same two-part
    argument: (a) detection is batch-independent — a pair is detected iff
    the two vectors share a hyperplane-LSH (table, bucket) at the FIXED
    16x4 seed-7 geometry (the registered query pins index_n_bits=4, so the
    in-batch lsh_near_pairs default and the persisted index agree) AND
    exact cosine >= 0.35; (b) vec_id-ascending chunks + index screen +
    in-batch leader election compose to the global sequential-by-id leader
    election over that pair graph. Candidates come from the full-corpus
    lsh_buckets fixture (per-vector codes are independent of the other
    vectors, so one fixture serves both the in-batch and cross-index
    paths); the zero-vector exact-dedup special case is vacuous on the
    testdata (no zero-norm embeddings at any sf; the path itself is pinned
    in tests/test_streaming.py)."""
    from datafusion_dedup_ai_spark.operators import hash_fixtures as HF
    from datafusion_dedup_ai_spark.oracles import sql_greedy_min_id_dropped

    g = HF.lsh_buckets_glob()
    return f"""
    WITH RECURSIVE cvec AS (
        SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
    ),
    cand AS (
        SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
        FROM '{g}' a JOIN '{g}' b
          ON a."table" = b."table" AND a.bucket = b.bucket
             AND a.vec_id < b.vec_id
    ),
    pairs AS (
        SELECT cd.id_a, cd.id_b
        FROM cand cd
        JOIN cvec va ON va.vec_id = cd.id_a
        JOIN cvec vb ON vb.vec_id = cd.id_b
        WHERE {_sql_cosine('va.v', 'vb.v')} >= {NEAR_DUP_THRESHOLD}
    ),
    {sql_greedy_min_id_dropped("pairs")}
    SELECT e.vec_id, e.label
    FROM embeddings e
    WHERE e.vec_id NOT IN (SELECT id FROM gdropped)
    """


@register("streaming_semantic_ingest", _streaming_semantic_ingest_oracle)
def q_streaming_semantic_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The always-on SEMANTIC ingest (streaming/ingest.start_semantic_ingest)
    driven to completion over a deterministic 4-chunk replay of `embeddings`,
    surfaced as the post-ingest survivor corpus: (vec_id, label). Each
    micro-batch screens against the persisted vector index (cosine >= 0.35)
    and in-batch via leader dedup, then appends survivors to the corpus and
    their codes to the index. The index geometry is pinned to 16x4 seed 7
    (index_n_bits=4) — the fixed lsh_buckets fixture geometry, same
    index-width doctrine as _vector_index_path; production sizes the width
    for the TARGET corpus instead (start_semantic_ingest docstring).

    HASH-GATED as of round 9 (previously rows-only): the converged survivor
    set equals the global sequential-by-id leader election over the
    detected cosine>=0.35 pair graph — see _streaming_semantic_ingest_oracle.
    Replay idempotency and the pair-free survivor invariant are additionally
    pinned in tests/test_streaming.py."""
    import os
    import shutil

    from datafusion_dedup_ai_spark.materialize import _REPO_ROOT, sf_cache_key
    from datafusion_dedup_ai_spark.streaming.ingest import (
        replay_embeddings_as_stream,
        start_semantic_ingest,
    )

    root = os.path.join(
        _REPO_ROOT, ".materialized", sf_cache_key(sf_dir), "sem_ingest"
    )
    corpus_dir = os.path.join(root, "corpus")
    if root not in _SEM_INGEST_DONE:
        shutil.rmtree(root, ignore_errors=True)
        stream = replay_embeddings_as_stream(
            spark, sf_dir, os.path.join(root, "stage")
        )
        q = start_semantic_ingest(
            stream,
            corpus_dir,
            os.path.join(root, "index"),
            os.path.join(root, "ckpt"),
            available_now=True,
            index_n_bits=4,
        )
        q.awaitTermination()
        _SEM_INGEST_DONE.add(root)
    corpus = spark.read.parquet(corpus_dir)
    return corpus.select("vec_id", "label")


# ---------------------------------------------------------------------------
# Hard-negative mining (contrastive-training data prep)
# ---------------------------------------------------------------------------

from datafusion_dedup_ai_spark.shared_params import N_QUERIES  # noqa: E402
from datafusion_dedup_ai_spark.operators import similarity_search as S  # noqa: E402


HARD_NEG_K = 3


@register(
    "hard_negative_mining",
    f"""
    WITH c AS (
        SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings
    ), q AS (
        SELECT vec_id AS query_id, label AS q_label, v AS qv
        FROM c WHERE vec_id < {N_QUERIES}
    ), scored AS (
        SELECT q.query_id, c.vec_id AS negative_id,
               CAST(c.label AS BIGINT) AS negative_label,
               {_sql_cosine('q.qv', 'c.v')} AS cosine
        FROM c CROSS JOIN q
        WHERE c.label <> q.q_label
    )
    SELECT query_id, negative_id, negative_label, cosine, rk FROM (
        SELECT query_id, negative_id, negative_label, cosine,
               CAST(ROW_NUMBER() OVER (
                   PARTITION BY query_id
                   ORDER BY cosine DESC, negative_id ASC) AS BIGINT) AS rk
        FROM scored)
    WHERE rk <= {HARD_NEG_K}
    """,
)
def q_hard_negative_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard negatives for contrastive training: per query vector, the
    top-{HARD_NEG_K} most-similar vectors with a DIFFERENT label — the
    near-miss examples that teach an embedding model its decision boundary
    (the mining step behind triplet/InfoNCE dataset prep). Exact form on
    the broadcast query set; at corpus scale the candidate generator swaps
    to the LSH/IVF tiers with the label filter applied pre-re-rank — the
    identical plan surgery as cosine_topk -> ann_topk_tiers, so the exact
    query stays the graded baseline."""
    emb = load_table(spark, sf_dir, "embeddings")
    # Self-dots precomputed per side (self_dot / cosine_with_norms):
    # bit-identical cosine, a third of the per-pair fold work on the
    # corpus-x-queries scoring scan.
    q = emb.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("q_label"),
        F.col("embedding").alias("qv"),
        S.self_dot(F.col("embedding")).alias("_nqq"),
    )
    c = emb.select(
        F.col("vec_id").alias("negative_id"),
        F.col("label").alias("negative_label"),
        F.col("embedding").alias("cv"),
        S.self_dot(F.col("embedding")).alias("_ncc"),
    )
    from pyspark.sql import Window

    scored = (
        c.crossJoin(F.broadcast(q))
        .where(F.col("negative_label") != F.col("q_label"))
        .withColumn(
            "cosine",
            S.cosine_with_norms(
                F.col("qv"), F.col("cv"), F.col("_nqq"), F.col("_ncc")
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("negative_id").asc()
    )
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("bigint"))
        .where(F.col("rk") <= HARD_NEG_K)
        .select(
            "query_id",
            "negative_id",
            F.col("negative_label").cast("bigint").alias("negative_label"),
            "cosine",
            "rk",
        )
    )


# ===========================================================================
# Chunk-level dedup, char-distribution quality, Bloom ingest prefilter
# (round-5 additions)
# ===========================================================================


def _chunk_dedup_stats_oracle() -> str:
    from datafusion_dedup_ai_spark.registry import get_oracle

    return f"""
    WITH chunks AS ({get_oracle("doc_chunks")}),
    marked AS (
        SELECT doc_id, chunk_id,
               ROW_NUMBER() OVER (
                   PARTITION BY chunk_text ORDER BY doc_id, chunk_id) AS rn
        FROM chunks)
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_chunks,
           CAST(SUM(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_dup_chunks,
           CAST(SUM(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS DOUBLE)
               / COUNT(*) AS dup_chunk_fraction
    FROM marked GROUP BY doc_id
    """


@register("chunk_dedup_stats", _chunk_dedup_stats_oracle)
def q_chunk_dedup_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sub-document (chunk-level) duplication — the FineWeb/RefinedWeb-style
    signal that catches boilerplate SHARED ACROSS documents that whole-doc
    dedup misses: per document, the fraction of its 256-char chunks whose
    exact text appeared earlier in the corpus ((doc_id, chunk_id) order).

    Composes the registered doc_chunks windowing (one map-side explode, no
    shuffle) with one keep-first window on chunk_text — a single shuffle
    keyed by chunk content, the same shape as exact_dedup_documents — then a
    per-doc re-aggregation (second shuffle on doc_id). dup_chunk_fraction is
    a single int/int division cast to double, so it hash-gates bit-exactly.
    At 100 TB the chunk-text shuffle key would be md5(chunk_text) (16 bytes
    vs 256) — kept as raw text here so the oracle's grouping is
    byte-identical rather than hash-collision-modulo-identical."""
    from datafusion_dedup_ai_spark.queries_curation import q_doc_chunks

    ch = q_doc_chunks(spark, sf_dir)
    w = Window.partitionBy("chunk_text").orderBy("doc_id", "chunk_id")
    marked = ch.withColumn("rn", F.row_number().over(w))
    dup = F.when(F.col("rn") > 1, F.lit(1)).otherwise(F.lit(0))
    return (
        marked.groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_chunks"),
            F.sum(dup).cast("bigint").alias("n_dup_chunks"),
        )
        .select(
            "doc_id",
            "n_chunks",
            "n_dup_chunks",
            (F.col("n_dup_chunks").cast("double") / F.col("n_chunks")).alias(
                "dup_chunk_fraction"
            ),
        )
    )


@register(
    "doc_char_diversity",
    """
    WITH ch AS (
        SELECT doc_id, unnest(string_split(text, '')) AS c
        FROM documents WHERE length(text) > 0
    ), cc AS (
        SELECT doc_id, c, COUNT(*) AS cnt FROM ch GROUP BY 1, 2
    )
    SELECT doc_id,
           CAST(SUM(cnt) AS BIGINT) AS n_chars,
           CAST(COUNT(*) AS BIGINT) AS n_distinct_chars,
           CAST(SUM(cnt * cnt) AS BIGINT) AS sum_sq_counts,
           1.0 - CAST(SUM(cnt * cnt) AS DOUBLE)
                 / (CAST(SUM(cnt) AS DOUBLE) * CAST(SUM(cnt) AS DOUBLE))
               AS simpson_diversity
    FROM cc GROUP BY doc_id
    """,
)
def q_doc_char_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-distribution quality signal: per-doc Simpson diversity
    1 - sum(p_c^2) over the character frequency distribution — near 0 for
    single-character junk (aaaa...), high for natural text. The standard
    entropy formulation needs ln (libm ulp drift poisons cross-engine
    hashes — see doc_tfidf_topterms); Simpson is the established
    diversity index that stays in exact integer arithmetic until ONE final
    division, so it hash-gates bit-exactly and ranks junk identically.

    Scale shape: explode-to-chars is map-side only — partial aggregation
    combines (doc_id, char) counts before the shuffle, so the exchange
    carries at most |alphabet| rows per document, not |text|. Empty docs are
    excluded on both sides (Spark split('','') -> [] vs DuckDB [''] — the
    filter removes the divergence)."""
    d = load_spread(spark, sf_dir, "documents")
    ch = d.where(F.length("text") > 0).select(
        "doc_id", F.explode(F.split("text", "")).alias("c")
    )
    cc = ch.groupBy("doc_id", "c").agg(F.count("*").alias("cnt"))
    n_chars = F.sum("cnt").cast("bigint")
    sum_sq = F.sum(F.col("cnt") * F.col("cnt")).cast("bigint")
    return (
        cc.groupBy("doc_id")
        .agg(
            n_chars.alias("n_chars"),
            F.count("*").cast("bigint").alias("n_distinct_chars"),
            sum_sq.alias("sum_sq_counts"),
        )
        .select(
            "doc_id",
            "n_chars",
            "n_distinct_chars",
            "sum_sq_counts",
            (
                F.lit(1.0)
                - F.col("sum_sq_counts").cast("double")
                / (F.col("n_chars").cast("double") * F.col("n_chars").cast("double"))
            ).alias("simpson_diversity"),
        )
    )


# ---------------------------------------------------------------------------
# Bloom-filter ingest prefilter — constant-memory incremental exact dedup
# ---------------------------------------------------------------------------
#
# The incremental-exact path (incremental_exact_new_docs) anti-joins the
# batch against the corpus hash projection — correct, but the join's corpus
# side grows with the corpus. The Bloom prefilter bounds the broadcast state:
# k=3 positions per key, each a disjoint 16-bit slice of md5 (3 independent
# 65,536-bit filters = 24 KiB packed), built with one bit_or aggregation.
# A batch doc whose 3 bits are not all set is DEFINITELY new (no false
# negatives) and skips the exact join; only bloom-maybe docs — true dups
# plus the ~(fill_rate)^3 false positives — pay the corpus-sized verify.
# This is the classic crawl-frontier / CDC dedup shape: the common case
# (new content) is decided against 24 KiB of broadcast state.

_BLOOM_SLOTS = 3  # disjoint md5 slices as independent hash functions

# Same deterministic corpus/batch split as the incremental-exact path, so the
# two operators answer the same question and are directly comparable
# (registration-free import — see shared_params docstring).
from datafusion_dedup_ai_spark.shared_params import (  # noqa: E402
    _BATCH_PRED,
    _CORPUS_PRED,
)


def _bloom_oracle(hex_chars: int) -> str:
    """Width-parameterized position-set replay of the packed filter: the
    slice width changes only the substr length on both engines."""
    return f"""
    WITH corpus AS (
        SELECT DISTINCT md5(text) AS h FROM documents WHERE {_CORPUS_PRED}
    ), slots AS (
        SELECT unnest([0, 1, 2]) AS slot
    ), cpos AS (
        SELECT DISTINCT slot,
               substr(h, 1 + {hex_chars} * slot, {hex_chars}) AS pos
        FROM corpus CROSS JOIN slots
    ), batch AS (
        SELECT doc_id, md5(text) AS h FROM documents WHERE {_BATCH_PRED}
    ), bpos AS (
        SELECT doc_id, h, slot,
               substr(h, 1 + {hex_chars} * slot, {hex_chars}) AS pos
        FROM batch CROSS JOIN slots
    ), probe AS (
        SELECT b.doc_id, b.h, BOOL_AND(c.pos IS NOT NULL) AS bloom_maybe
        FROM bpos b
        LEFT JOIN cpos c ON b.slot = c.slot AND b.pos = c.pos
        GROUP BY 1, 2
    ), flags AS (
        SELECT p.doc_id, p.h AS content_hash, p.bloom_maybe,
               (p.bloom_maybe AND EXISTS (
                   SELECT 1 FROM corpus c WHERE c.h = p.h)) AS in_corpus,
               ROW_NUMBER() OVER (PARTITION BY p.h ORDER BY p.doc_id) AS rn
        FROM probe p
    )
    SELECT doc_id, content_hash, bloom_maybe, in_corpus,
           (NOT in_corpus AND rn = 1) AS is_new
    FROM flags
    """


def _bloom_incremental_plan(
    spark: SparkSession, sf_dir: str, hex_chars: int
) -> DataFrame:
    """Shared Spark plan for both filter widths: corpus md5 slices of
    ``hex_chars`` hex digits -> (slot, word=pos div 64, bit=pos mod 64) ->
    bit_or(1L << bit) groupBy (slot, word) — a REAL packed Bloom filter —
    broadcast to the batch and probed with (bits >> bit) & 1."""
    d = load_table(spark, sf_dir, "documents")
    corpus_h = (
        d.where(F.expr(_CORPUS_PRED))
        .select(F.md5(F.col("text")).alias("h"))
        .distinct()
    )
    batch = d.where(F.expr(_BATCH_PRED)).select(
        "doc_id", F.md5(F.col("text")).alias("h")
    )

    def positions(df: DataFrame) -> DataFrame:
        slots = F.array(*[F.lit(i) for i in range(_BLOOM_SLOTS)])
        ex = df.select("*", F.explode(slots).alias("slot"))
        pos = F.expr(
            f"cast(conv(substr(h, 1 + {hex_chars} * slot, {hex_chars}),"
            " 16, 10) as long)"
        )
        return ex.withColumn("pos", pos).select(
            "*",
            F.expr("pos div 64").alias("word"),
            F.expr("cast(pos % 64 as int)").alias("bit"),
        )

    bitset = (
        positions(corpus_h)
        .groupBy("slot", "word")
        .agg(F.expr("bit_or(shiftleft(1L, bit))").alias("bits"))
    )
    probed = (
        positions(batch)
        .join(F.broadcast(bitset), ["slot", "word"], "left")
        .withColumn(
            "hit",
            F.coalesce(
                F.expr("(shiftright(bits, bit) & 1L) = 1L"), F.lit(False)
            ),
        )
        .groupBy("doc_id", "h")
        .agg(F.min("hit").alias("bloom_maybe"))
    )
    maybe = probed.where(F.col("bloom_maybe"))
    verified = maybe.join(
        corpus_h.select(F.col("h"), F.lit(True).alias("in_corpus")), "h", "left"
    ).select("doc_id", "h", "bloom_maybe", F.coalesce("in_corpus", F.lit(False)).alias("in_corpus"))
    definite = probed.where(~F.col("bloom_maybe")).select(
        "doc_id", "h", "bloom_maybe", F.lit(False).alias("in_corpus")
    )
    flags = verified.unionByName(definite)
    rn = F.row_number().over(Window.partitionBy("h").orderBy("doc_id"))
    return (
        flags.withColumn("rn", rn)
        .select(
            "doc_id",
            F.col("h").alias("content_hash"),
            "bloom_maybe",
            "in_corpus",
            ((~F.col("in_corpus")) & (F.col("rn") == 1)).alias("is_new"),
        )
    )


@register("bloom_incremental_new_docs", _bloom_oracle(4))
def q_bloom_incremental_new_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-prefiltered incremental exact dedup: every incoming-batch doc
    tagged (bloom_maybe, in_corpus, is_new), where the corpus-sized exact
    verify runs ONLY for bloom-maybe docs.

    Spark side builds a REAL packed Bloom filter (see
    _bloom_incremental_plan): 16-bit slices -> 3 independent 65,536-bit
    filters, at most 3 x 1024 longs (24 KiB) whatever the corpus size —
    broadcast to the batch. The DuckDB oracle expresses the identical
    membership semantics as a position-set join (pos -> (word, bit) is a
    bijection, and bit_or only unions positions within a word, so
    packed-bit membership == position-set membership, row for row). No
    false negatives is a theorem (a corpus key's own positions are always
    set); the measured false-positive rate and the bloom_maybe=false =>
    not-in-corpus invariant are pinned in tests/test_extras2.py."""
    return _bloom_incremental_plan(spark, sf_dir, hex_chars=4)


@register("bloom_incremental_new_docs_wide", _bloom_oracle(6))
def q_bloom_incremental_new_docs_wide(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The PRODUCTION-SIZING variant of the Bloom prefilter (round-5
    verdict #9): 24-bit slices -> 3 independent 16,777,216-bit filters.
    SCALE.md's sizing note says 16-bit slots saturate around 1e9 corpus
    keys and production width is nbits ~ 10 x keys; this registers that
    wider width class as a first-class query to prove the operator SHAPE
    is width-invariant — the identical bit_or groupBy -> broadcast ->
    bitwise-probe plan, only the substr slice length changes. Dense
    worst case is 3 x 262,144 longs = 6 MiB of broadcast state (still
    trivially broadcastable); at fixture scale the bit_or aggregation
    materializes only the words actually set (sparse rows), so the
    broadcast grows smoothly from KBs toward the dense bound as corpus
    keys approach nbits/10 = 1.7e6 per slot. The no-false-negative pin at
    this width lives in tests/test_extras2.py."""
    return _bloom_incremental_plan(spark, sf_dir, hex_chars=6)


# ---------------------------------------------------------------------------
# n-gram LM count tables + vocabulary OOV rate — tokenizer/LM prep
# ---------------------------------------------------------------------------


@register(
    "ngram_lm_counts",
    """
    WITH bg AS (
        SELECT unnest([t[i] || ' ' || t[i+1] FOR i IN range(1, len(t))])
            AS bigram
        FROM (SELECT string_split(text, ' ') AS t FROM documents)
    ), sp AS (
        SELECT string_split(bigram, ' ')[1] AS w1,
               string_split(bigram, ' ')[2] AS w2
        FROM bg
    ), pc AS (
        SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS pair_count
        FROM sp GROUP BY 1, 2
    )
    SELECT w1, w2, pair_count,
           CAST(COUNT(*) OVER (PARTITION BY w2) AS BIGINT) AS left_contexts,
           CAST(COUNT(*) OVER (PARTITION BY w1) AS BIGINT) AS right_contexts
    FROM pc
    """,
)
def q_ngram_lm_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram LM count tables with continuation counts — the sufficient
    statistics for Kneser-Ney smoothing (Kneser & Ney 1995; the KenLM
    pipeline's first MapReduce pass): per bigram (w1, w2) its corpus count,
    plus N1+(. w2) (distinct left contexts — the KN continuation count) and
    N1+(w1 .) (distinct right contexts — the backoff normalizer).

    Scale shape: one shuffle reduces raw bigrams to (w1, w2, count); the two
    continuation counts are COUNT windows over the ALREADY-REDUCED pair
    table (one row per distinct pair, so partition row count == distinct
    context count) — the same one-exchange-fewer pattern as
    doc_tfidf_topterms' df. All integer arithmetic: hash-gates exactly."""
    d = load_spread(spark, sf_dir, "documents")
    bg = d.select(F.explode(T.word_bigrams(F.col("text"))).alias("bigram"))
    sp = bg.select(
        F.split("bigram", " ").getItem(0).alias("w1"),
        F.split("bigram", " ").getItem(1).alias("w2"),
    )
    pc = sp.groupBy("w1", "w2").agg(F.count("*").cast("bigint").alias("pair_count"))
    return pc.select(
        "w1",
        "w2",
        "pair_count",
        F.count("*").over(Window.partitionBy("w2")).cast("bigint").alias(
            "left_contexts"
        ),
        F.count("*").over(Window.partitionBy("w1")).cast("bigint").alias(
            "right_contexts"
        ),
    )


VOCAB_MIN_COUNT = 5


@register(
    "vocab_oov_rate",
    f"""
    WITH toks AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
    ), vocab AS (
        SELECT tok FROM toks GROUP BY tok HAVING COUNT(*) >= {VOCAB_MIN_COUNT}
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(SUM(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_oov,
           CAST(SUM(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
               / COUNT(*) AS oov_rate
    FROM toks t LEFT JOIN vocab v USING (tok)
    GROUP BY doc_id
    """,
)
def q_vocab_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document out-of-vocabulary rate against a corpus-derived
    vocabulary (tokens with count >= VOCAB_MIN_COUNT): the tokenizer-prep
    signal that
    flags docs full of rare junk (OCR noise, codes, non-target languages)
    BEFORE spending tokenizer training or BPE merges on them.

    The vocabulary is a frequency-thresholded projection (one groupBy) and
    the membership check is a broadcast-sized left join at real scale — the
    vocab is bounded by the language, not the corpus (Heaps' law: even
    100 TB of English stays in the tens of millions of types; a count>=5
    threshold keeps it far smaller). oov_rate is one int/int division —
    bit-exact cross-engine."""
    d = load_spread(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(T.tokens(F.col("text"))).alias("tok"))
    vocab = (
        toks.groupBy("tok")
        .agg(F.count("*").alias("c"))
        .where(F.col("c") >= VOCAB_MIN_COUNT)
        .select("tok")
    )
    joined = toks.join(
        F.broadcast(vocab.withColumn("in_vocab", F.lit(1))), "tok", "left"
    )
    oov = F.when(F.col("in_vocab").isNull(), F.lit(1)).otherwise(F.lit(0))
    return (
        joined.groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_tokens"),
            F.sum(oov).cast("bigint").alias("n_oov"),
        )
        .select(
            "doc_id",
            "n_tokens",
            "n_oov",
            (F.col("n_oov").cast("double") / F.col("n_tokens")).alias("oov_rate"),
        )
    )


@register(
    "bpe_pair_counts",
    """
    WITH words AS (
        SELECT tok, CAST(COUNT(*) AS BIGINT) AS word_count
        FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
        WHERE tok <> ''
        GROUP BY tok
    ), pairs AS (
        SELECT unnest([s[i] || ' ' || s[i+1] FOR i IN range(1, len(s))])
                   AS pair,
               word_count
        FROM (SELECT string_split(tok, '') AS s, word_count FROM words)
    )
    SELECT string_split(pair, ' ')[1] AS sym_a,
           string_split(pair, ' ')[2] AS sym_b,
           CAST(SUM(word_count) AS BIGINT) AS pair_count
    FROM pairs
    GROUP BY 1, 2
    """,
)
def q_bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-iteration BPE merge statistics (Sennrich et al. 2016 §3): the
    frequency of every adjacent symbol pair across the corpus, computed the
    way a tokenizer trainer does — count each DISTINCT word once, weight its
    pairs by the word's corpus frequency. argmax(pair_count) is literally
    the first BPE merge; the table is the map-side statistic a distributed
    BPE trainer reduces per iteration.

    Scale shape: the word-frequency reduction (one shuffle) shrinks the
    working set from corpus tokens to VOCABULARY entries (Heaps' law —
    millions, not billions) BEFORE the char-pair explode, so the expensive
    blow-up runs on the small side; one more shuffle aggregates pair
    counts. All integer arithmetic — hash-gates exactly."""
    d = load_spread(spark, sf_dir, "documents")
    words = (
        d.select(F.explode(T.tokens(F.col("text"))).alias("tok"))
        .where(F.col("tok") != "")
        .groupBy("tok")
        .agg(F.count("*").cast("bigint").alias("word_count"))
    )
    s = F.split("tok", "")
    n = F.size(s)
    pairs = words.select(
        F.explode(
            F.zip_with(
                F.slice(s, 1, n - 1),
                F.slice(s, 2, n - 1),
                lambda a, b: F.struct(a.alias("sym_a"), b.alias("sym_b")),
            )
        ).alias("p"),
        "word_count",
    )
    return (
        pairs.select("p.sym_a", "p.sym_b", "word_count")
        .groupBy("sym_a", "sym_b")
        .agg(F.sum("word_count").cast("bigint").alias("pair_count"))
    )


def _tokenized_length_stats_oracle() -> str:
    """SQL replay of the tokenizer APPLY step from the frozen piece fixture
    (hash_fixtures.materialize_bpe_pieces — trained once, shared by both
    engines like the semantic_dedup centroids): a recursive CTE walks each
    distinct word left to right, each step consuming
    coalesce(max(len(piece)) over pieces prefix-matching at pos, 1)
    characters — exactly operators/tokenizer.greedy_token_count — then the
    per-word counts join back onto the corpus word stream. All integer
    arithmetic except the final exact-BIGINT-over-BIGINT division."""
    from datafusion_dedup_ai_spark.operators import hash_fixtures as HF

    g = HF.bpe_pieces_glob()
    return f"""
    WITH RECURSIVE words AS (
        SELECT DISTINCT tok FROM (
            SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
        WHERE tok <> ''
    ),
    enc(tok, pos, n) AS (
        SELECT tok, 1, 0 FROM words
        UNION ALL
        SELECT e.tok,
               e.pos + coalesce(
                   (SELECT max(len(p.piece)) FROM '{g}' p
                    WHERE p.piece = substr(e.tok, e.pos, len(p.piece))), 1),
               e.n + 1
        FROM enc e WHERE e.pos <= len(e.tok)
    ),
    wordtok AS (SELECT tok, n AS n_bpe FROM enc WHERE pos > len(tok)),
    occ AS (
        SELECT doc_id, source, unnest(string_split(text, ' ')) AS tok
        FROM documents
    )
    SELECT o.source,
           CAST(COUNT(DISTINCT o.doc_id) AS BIGINT) AS n_docs,
           CAST(COUNT(*) AS BIGINT) AS n_words,
           CAST(SUM(w.n_bpe) AS BIGINT) AS n_bpe_tokens,
           CAST(SUM(w.n_bpe) AS DOUBLE) / COUNT(*) AS bpe_tokens_per_word
    FROM occ o JOIN wordtok w ON w.tok = o.tok
    WHERE o.tok <> ''
    GROUP BY o.source
    """


@register("tokenized_length_stats", _tokenized_length_stats_oracle)
def q_tokenized_length_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-APPLY token accounting (round-8 verdict task 8): encode
    the corpus with the frozen BPE-trained piece vocabulary via greedy
    longest-match (operators/tokenizer.py — the WordPiece application rule
    over a Sennrich-BPE vocab) and report per-source real token counts —
    what token-budget selection, mixture planning and sequence packing
    actually consume, where the registry previously had only whitespace
    counts and first-merge statistics (bpe_pair_counts).

    Columns: (source, n_docs, n_words, n_bpe_tokens, bpe_tokens_per_word).

    Scale shape: the Python encode runs on DISTINCT words only (an Arrow
    pandas_udf over the Heaps-law-small vocabulary — O(|vocab|), never
    O(corpus)); the corpus-sized work is one explode, one BROADCAST hash
    join of the per-word counts back onto the word stream, and one
    partial-aggregated groupBy(source). Hash-gated: training is frozen
    into the shared piece fixture; both engines replay the apply step
    independently (greedy longest-match is deterministic integer
    arithmetic), and the final ratio is one exact BIGINT/BIGINT divide."""
    from datafusion_dedup_ai_spark.operators import hash_fixtures as HF
    from datafusion_dedup_ai_spark.operators import tokenizer as TK

    pieces = HF.load_bpe_pieces(spark, sf_dir)
    d = load_table(spark, sf_dir, "documents")
    occ = d.select(
        "doc_id", "source", F.explode(T.tokens(F.col("text"))).alias("tok")
    ).where(F.col("tok") != "")
    encoded = TK.encoded_word_lengths(occ.select("tok").distinct(), pieces)
    return (
        occ.join(F.broadcast(encoded), "tok")
        .groupBy("source")
        .agg(
            F.countDistinct("doc_id").cast("bigint").alias("n_docs"),
            F.count("*").cast("bigint").alias("n_words"),
            F.sum("n_bpe").cast("bigint").alias("n_bpe_tokens"),
        )
        .select(
            "source",
            "n_docs",
            "n_words",
            "n_bpe_tokens",
            (F.col("n_bpe_tokens").cast("double") / F.col("n_words")).alias(
                "bpe_tokens_per_word"
            ),
        )
    )


def _media_near_dup_oracle() -> str:
    """SQL replay of the ENTIRE perceptual-near-dup pipeline — planting,
    per-byte hex parse, np.array_split block boundaries, block means,
    even-count median, sign-wrapped 64-bit signature, pigeonhole banding
    (masks inlined as Python-side signed literals — DuckDB BIGINT shifts
    overflow where numpy wraps), bit_count verify. Every arithmetic step
    is exact: byte sums are integers (any summation order exact in
    float64), the mean is one division, the median is (a+b)/2 of picked
    order statistics."""
    from datafusion_dedup_ai_spark.operators.dedup import _signed64
    from datafusion_dedup_ai_spark.queries_multimodal import _media_glob

    max_hamming = 6
    n_chunks = max_hamming + 1
    width = 64 // n_chunks
    masks = []
    for c in range(n_chunks):
        shift = c * width
        w = width if c < n_chunks - 1 else 64 - shift
        masks.append((c, _signed64(((1 << w) - 1) << shift)))
    mask_vals = ", ".join(f"({c}, CAST({m} AS BIGINT))" for c, m in masks)
    # bit value of block i in the signed-wrapped signature
    bitval = (
        f"CASE WHEN blk = 63 THEN CAST(-9223372036854775808 AS BIGINT) "
        f"ELSE CAST(1 AS BIGINT) << blk END"
    )
    return f"""
    WITH m0 AS (
        SELECT doc_id, payload FROM '{_media_glob()}'
    ), plant_src AS (
        SELECT doc_id, payload FROM m0 ORDER BY doc_id LIMIT 10
    ), m AS (
        SELECT doc_id, payload, FALSE AS perturbed FROM m0
        UNION ALL
        SELECT doc_id + 1000000, payload, TRUE FROM plant_src
    ), bytes0 AS (
        SELECT doc_id, perturbed,
               CAST(octet_length(payload) AS BIGINT) AS n,
               hex(payload) AS h,
               unnest(range(0, greatest(octet_length(payload), 64))) AS idx
        FROM m
    ), v0 AS (
        SELECT doc_id, perturbed, n, idx,
               CASE WHEN idx < n THEN
                   (strpos('0123456789ABCDEF', substr(h, CAST(2*idx+1 AS INT), 1)) - 1) * 16
                   + (strpos('0123456789ABCDEF', substr(h, CAST(2*idx+2 AS INT), 1)) - 1)
               ELSE 0 END AS val
        FROM bytes0
    ), v AS (
        SELECT doc_id, n, idx,
               CASE WHEN perturbed AND n > 0 AND
                   (CASE WHEN 13 % n = idx THEN 1 ELSE 0 END
                    + CASE WHEN 110 % n = idx THEN 1 ELSE 0 END
                    + CASE WHEN 207 % n = idx THEN 1 ELSE 0 END) % 2 = 1
               THEN xor(val, 255) ELSE val END AS val,
               greatest(n, 64) AS np
        FROM v0
    ), blocked AS (
        SELECT doc_id, val,
               CASE WHEN idx < (np % 64) * (np // 64 + 1)
                    THEN idx // (np // 64 + 1)
                    ELSE (np % 64)
                         + (idx - (np % 64) * (np // 64 + 1)) // (np // 64)
               END AS blk
        FROM v
    ), means AS (
        SELECT doc_id, blk,
               CAST(SUM(val) AS DOUBLE) / COUNT(*) AS mean
        FROM blocked GROUP BY doc_id, blk
    ), med AS (
        SELECT doc_id,
               (MAX(CASE WHEN rn = 32 THEN mean END)
                + MAX(CASE WHEN rn = 33 THEN mean END))
               / CAST(2 AS DOUBLE) AS median
        FROM (
            SELECT doc_id, mean,
                   ROW_NUMBER() OVER (
                       PARTITION BY doc_id ORDER BY mean) AS rn
            FROM means)
        GROUP BY doc_id
    ), sigs AS (
        SELECT means.doc_id,
               CAST(SUM(CASE WHEN mean > median THEN {bitval}
                             ELSE 0 END) AS BIGINT) AS psig
        FROM means JOIN med ON means.doc_id = med.doc_id
        GROUP BY means.doc_id
    ), chunks(chunk, mask) AS (VALUES {mask_vals}),
    buckets AS (
        SELECT s.doc_id, s.psig, c.chunk, s.psig & c.mask AS val
        FROM sigs s CROSS JOIN chunks c
    ), cands AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
               a.psig AS sig_a, b.psig AS sig_b
        FROM buckets a JOIN buckets b
          ON a.chunk = b.chunk AND a.val = b.val AND a.doc_id < b.doc_id
    )
    SELECT id_a, id_b,
           CAST(bit_count(xor(sig_a, sig_b)) AS BIGINT) AS hamming
    FROM cands
    WHERE bit_count(xor(sig_a, sig_b)) <= {max_hamming}
    """


@register("media_near_dup_pairs", _media_near_dup_oracle)
def q_media_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate binary payloads by perceptual signature: 64-bit
    aHash-style signature per payload (operators/multimodal.py::
    perceptual_signature — blockwise byte means vs their median, the same
    recipe a real image pHash uses), then the SAME pigeonhole Hamming
    banding as SimHash (chunk-equality equi-join + bit_count verify — no
    quadratic scan). Output (id_a, id_b, hamming) at Hamming <= 6.

    HASH-GATED since the third round-5 session: the oracle replays the
    whole pipeline — including the deterministic planting and the
    np.array_split block boundaries — from the binary fixture via
    per-byte hex parsing (see _media_near_dup_oracle); block-mean sums
    are integer-exact in any order, so the Arrow featurizer and the SQL
    replay agree bit-for-bit. The planted-perturbation recall pin stays
    in tests/test_multimodal.py."""
    from datafusion_dedup_ai_spark.operators import multimodal as M
    from datafusion_dedup_ai_spark.operators.dedup import simhash_near_pairs

    media = M.load_media(spark, sf_dir)
    # The md5-derived payloads have no natural near-dups, so plant 10
    # byte-perturbed copies first (deterministic, same convention as the
    # PII planting) — the banded join then finds real matches instead of
    # vacuously returning empty.
    with_planted = M.plant_perturbed_media(media)
    sigs = M.perceptual_signature(with_planted).select("doc_id", "psig")
    return simhash_near_pairs(
        sigs, id_col="doc_id", sim_col="psig", max_hamming=6
    )


def _langid_confusion_oracle() -> str:
    from datafusion_dedup_ai_spark.registry import get_oracle

    return f"""
    WITH preds AS ({get_oracle("doc_language_id")}),
    cm AS (
        SELECT claimed_lang, pred_lang, CAST(COUNT(*) AS BIGINT) AS n_docs
        FROM preds GROUP BY 1, 2
    ), tot AS (
        SELECT claimed_lang, CAST(SUM(n_docs) AS BIGINT) AS n_claimed
        FROM cm GROUP BY 1
    )
    SELECT cm.claimed_lang, cm.pred_lang, cm.n_docs, tot.n_claimed,
           CAST(cm.n_docs AS DOUBLE) / tot.n_claimed AS fraction
    FROM cm JOIN tot USING (claimed_lang)
    """


@register("langid_confusion_matrix", _langid_confusion_oracle)
def q_langid_confusion_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self-grading report for the language-ID heuristic: the confusion
    matrix between the corpus's claimed `lang` column and the n-gram
    marker prediction — (claimed, predicted, count, claimed-total,
    fraction). A production filter pipeline watches exactly this table to
    decide whether its language gate is trustworthy per source. Composes
    the registered doc_language_id plan; two small groupBys over its
    output; fraction is one int/int division — hash-gates exactly."""
    from datafusion_dedup_ai_spark.queries_text import q_doc_language_id

    preds = q_doc_language_id(spark, sf_dir)
    cm = preds.groupBy("claimed_lang", "pred_lang").agg(
        F.count("*").cast("bigint").alias("n_docs")
    )
    tot = cm.groupBy("claimed_lang").agg(
        F.sum("n_docs").cast("bigint").alias("n_claimed")
    )
    return cm.join(tot, "claimed_lang").select(
        "claimed_lang",
        "pred_lang",
        "n_docs",
        "n_claimed",
        (F.col("n_docs").cast("double") / F.col("n_claimed")).alias("fraction"),
    )


def _tier_agreement_oracle() -> str:
    """Composes the three tier oracles (exact n-gram Jaccard SQL, the
    MinHash fixture replay, the SimHash fixture replay) as nested CTEs and
    folds the nine counts exactly like the Spark side — fully hash-gated
    because every tier is itself deterministic given the materialized hash
    fixtures."""
    from datafusion_dedup_ai_spark.registry import get_oracle

    return f"""
    WITH exact0 AS ({get_oracle("ngram_jaccard_pairs")}),
    mh0 AS ({get_oracle("minhash_near_dup_pairs")}),
    sh0 AS ({get_oracle("simhash_near_pairs")}),
    tagged AS (
        SELECT DISTINCT 'exact_jaccard' AS tier, doc_a AS id_a, doc_b AS id_b
        FROM exact0
        UNION ALL
        SELECT DISTINCT 'minhash_lsh', id_a, id_b FROM mh0
        UNION ALL
        SELECT DISTINCT 'simhash', id_a, id_b FROM sh0
    ), marks AS (
        SELECT id_a, id_b,
               MAX(CASE WHEN tier = 'exact_jaccard' THEN 1 ELSE 0 END) AS m_e,
               MAX(CASE WHEN tier = 'minhash_lsh' THEN 1 ELSE 0 END) AS m_m,
               MAX(CASE WHEN tier = 'simhash' THEN 1 ELSE 0 END) AS m_s
        FROM tagged GROUP BY id_a, id_b
    ), one AS (
        SELECT CAST(SUM(m_e) AS BIGINT) AS n_e,
               CAST(SUM(m_m) AS BIGINT) AS n_m,
               CAST(SUM(m_s) AS BIGINT) AS n_s,
               CAST(SUM(m_e * m_m) AS BIGINT) AS nb_em,
               CAST(SUM(m_e * m_s) AS BIGINT) AS nb_es,
               CAST(SUM(m_m * m_s) AS BIGINT) AS nb_ms
        FROM marks
    )
    SELECT tier_a, tier_b, n_a, n_b, n_both,
           CASE WHEN n_a + n_b - n_both = 0 THEN 0.0
                ELSE CAST(n_both AS DOUBLE) / (n_a + n_b - n_both)
                END AS jaccard
    FROM (
        SELECT 'exact_jaccard' AS tier_a, 'minhash_lsh' AS tier_b,
               n_e AS n_a, n_m AS n_b, nb_em AS n_both FROM one
        UNION ALL
        SELECT 'exact_jaccard', 'simhash', n_e, n_s, nb_es FROM one
        UNION ALL
        SELECT 'minhash_lsh', 'simhash', n_m, n_s, nb_ms FROM one
    )
    """


@register("near_dup_tier_agreement", _tier_agreement_oracle)
def q_near_dup_tier_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-tier diagnostic: pairwise agreement between the three text
    near-dup pair generators — exact n-gram Jaccard (ground truth), the
    MinHash-LSH tier, and the SimHash tier — as (tier_a, tier_b, n_a, n_b,
    n_both, jaccard). The table a pipeline owner reads to pick a tier (and
    thresholds) for a corpus: how much of exact does each sketch recover,
    and how much do the sketches overlap with each other? Hash-gated since
    round 5 (late): the sketch tiers are approximate as ESTIMATORS but
    deterministic as computations, so the oracle replays all three from
    their own (already-gated) oracles and folds the same nine counts."""
    from datafusion_dedup_ai_spark.queries_dedup_ext import (
        q_minhash_near_dup_pairs,
        q_simhash_near_pairs,
    )
    from datafusion_dedup_ai_spark.queries_text import q_ngram_jaccard_pairs

    tiers = {
        "exact_jaccard": q_ngram_jaccard_pairs(spark, sf_dir).select(
            F.col("doc_a").alias("id_a"), F.col("doc_b").alias("id_b")
        ),
        "minhash_lsh": q_minhash_near_dup_pairs(spark, sf_dir).select(
            "id_a", "id_b"
        ),
        "simhash": q_simhash_near_pairs(spark, sf_dir).select("id_a", "id_b"),
    }
    # One pass over everything: tag + union the tier pair sets, reduce to a
    # per-pair tier membership set, then fold ALL nine counts into a single
    # one-row aggregation and explode it into the three report rows — each
    # tier plan executes exactly once (the naive per-pair agg/intersect
    # shape re-ran the expensive exact-Jaccard plan four times).
    names = list(tiers)
    tagged = None
    for t, df in tiers.items():
        part = df.withColumn("tier", F.lit(t)).dropDuplicates(
            ["tier", "id_a", "id_b"]
        )
        tagged = part if tagged is None else tagged.unionByName(part)
    marks = tagged.groupBy("id_a", "id_b").agg(
        F.collect_set("tier").alias("ts")
    )
    has = lambda t: F.array_contains("ts", t).cast("long")  # noqa: E731
    aggs = []
    for t in names:
        aggs.append(F.sum(has(t)).cast("bigint").alias(f"n_{t}"))
    for i, a in enumerate(names):
        for b in names[i + 1 :]:
            aggs.append(
                F.sum(has(a) * has(b)).cast("bigint").alias(f"nb_{a}_{b}")
            )
    one = marks.agg(*aggs)
    rows = []
    for i, a in enumerate(names):
        for b in names[i + 1 :]:
            rows.append(
                F.struct(
                    F.lit(a).alias("tier_a"),
                    F.lit(b).alias("tier_b"),
                    F.col(f"n_{a}").alias("n_a"),
                    F.col(f"n_{b}").alias("n_b"),
                    F.col(f"nb_{a}_{b}").alias("n_both"),
                )
            )
    exploded = one.select(F.explode(F.array(*rows)).alias("r")).select("r.*")
    union = F.col("n_a") + F.col("n_b") - F.col("n_both")
    # ANSI mode throws on 0/0 — an empty-corpus diagnostic must report 0.0
    # agreement, not crash
    jac = F.when(union == 0, F.lit(0.0)).otherwise(
        F.col("n_both").cast("double") / union
    )
    return exploded.select(
        "tier_a", "tier_b", "n_a", "n_b", "n_both", jac.alias("jaccard")
    )


def _ensemble_dedup_oracle() -> str:
    """Composes the three already-hash-gated component oracles: the
    keep-first exact rule, the recursive-CTE text fuzzy clusters, and the
    hyperplane-fixture semantic clusters — each nested as its own CTE
    (DuckDB allows WITH RECURSIVE inside a CTE body)."""
    from datafusion_dedup_ai_spark.queries_similarity import (
        _embedding_dedup_clusters_oracle,
    )

    return f"""
    WITH tdc AS ({_text_dedup_clusters_oracle()}),
    edc AS ({_embedding_dedup_clusters_oracle()}),
    ex AS (
        SELECT doc_id, ROW_NUMBER() OVER (
            PARTITION BY md5(text) ORDER BY doc_id) AS rn
        FROM documents
    )
    SELECT d.doc_id,
           (ex.rn > 1) AS exact_dup,
           (NOT tdc.is_representative) AS text_near_dup,
           (edc.vec_id <> edc.cluster_id) AS semantic_dup,
           (ex.rn = 1 AND tdc.is_representative
            AND edc.vec_id = edc.cluster_id) AS keep,
           CASE WHEN ex.rn > 1 THEN 'exact'
                WHEN NOT tdc.is_representative THEN 'text_near_dup'
                WHEN edc.vec_id <> edc.cluster_id THEN 'semantic'
                ELSE 'kept' END AS drop_reason
    FROM documents d
    JOIN ex ON ex.doc_id = d.doc_id
    JOIN tdc ON tdc.doc_id = d.doc_id
    JOIN edc ON edc.vec_id = d.doc_id
    """


@register("ensemble_dedup_decisions", _ensemble_dedup_oracle)
def q_ensemble_dedup_decisions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The final keep/drop table a multi-pass dedup pipeline actually emits
    (the Dolma/FineWeb shape: several dedup passes, one decision column
    with provenance): per document, whether the EXACT pass (content-hash
    keep-first), the TEXT near-dup pass (MinHash-LSH clusters, min-id
    representative), or the SEMANTIC pass (embedding LSH clusters) would
    drop it, the combined ``keep``, and the first-tripped ``drop_reason``.

    Every component is itself hash-gated (exact_dedup_documents,
    text_dedup_clusters, embedding_dedup_clusters), and the composite is
    TOO: the oracle nests the recursive-CTE and fixture-replay oracles as
    CTEs, so the whole ensemble is verified end-to-end cross-engine. The
    doc_id == vec_id alignment of the two tables is the testdata contract
    (TESTDATA.md). Scale shape: three already-scale-safe passes joined on
    their id — no new shuffles beyond the components' own."""
    from datafusion_dedup_ai_spark.queries_similarity import (
        q_embedding_dedup_clusters,
    )

    d = load_table(spark, sf_dir, "documents")
    ex = d.select(
        "doc_id",
        (
            F.row_number().over(
                Window.partitionBy(F.md5("text")).orderBy("doc_id")
            )
            > 1
        ).alias("exact_dup"),
    )
    tdc = q_text_dedup_clusters(spark, sf_dir).select(
        "doc_id", (~F.col("is_representative")).alias("text_near_dup")
    )
    edc = q_embedding_dedup_clusters(spark, sf_dir).select(
        F.col("vec_id").alias("doc_id"),
        (F.col("vec_id") != F.col("cluster_id")).alias("semantic_dup"),
    )
    out = ex.join(tdc, "doc_id").join(edc, "doc_id")
    keep = (
        ~F.col("exact_dup") & ~F.col("text_near_dup") & ~F.col("semantic_dup")
    )
    reason = (
        F.when(F.col("exact_dup"), F.lit("exact"))
        .when(F.col("text_near_dup"), F.lit("text_near_dup"))
        .when(F.col("semantic_dup"), F.lit("semantic"))
        .otherwise(F.lit("kept"))
    )
    return out.select(
        "doc_id",
        "exact_dup",
        "text_near_dup",
        "semantic_dup",
        keep.alias("keep"),
        reason.alias("drop_reason"),
    )


_NIBBLES = "0123456789ABCDEF"


def _media_nibble_oracle() -> str:
    from datafusion_dedup_ai_spark.queries_multimodal import _media_glob

    bins = ",\n           ".join(
        f"CAST(length(hi) - length(translate(hi, '{c}', '')) AS BIGINT)"
        f" AS b_{i}"
        for i, c in enumerate(_NIBBLES)
    )
    return f"""
    WITH h AS (
        SELECT doc_id, media_type,
               CAST(octet_length(payload) AS BIGINT) AS n_bytes,
               regexp_replace(hex(payload), '(.)(.)', '\\1', 'g') AS hi
        FROM '{_media_glob()}'
    )
    SELECT doc_id, media_type, n_bytes,
           {bins}
    FROM h
    """


@register("media_nibble_histograms", _media_nibble_oracle)
def q_media_nibble_histograms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-gated byte-distribution histogram over the BINARY payloads —
    per document, the count of each high-nibble value (16 bins), computed
    with NO Python at all: hex(payload) -> keep the first char of every
    pair (regexp_replace '(.)(.)' -> '$1') -> per-bin translate-count. The
    cross-engine twin of media_feature_histograms' Arrow-seam version
    (whose entropy column is libm-bound and therefore rows-only): this one
    proves the binary-column arithmetic end-to-end against DuckDB, byte
    for byte. A pure string-expression map — no shuffle, no UDF."""
    from datafusion_dedup_ai_spark.operators import multimodal as M

    media = M.load_media(spark, sf_dir)
    hi = F.regexp_replace(F.hex(F.col("payload")), "(.)(.)", "$1")
    cols = [
        "doc_id",
        "media_type",
        F.length(F.col("payload")).cast("bigint").alias("n_bytes"),
    ]
    for i, c in enumerate(_NIBBLES):
        cols.append(
            (
                F.length(hi) - F.length(F.translate(hi, c, ""))
            ).cast("bigint").alias(f"b_{i}")
        )
    return media.select(*cols)


# ===========================================================================
# Round-5 retrieval/LM-scoring pack: BM25 top-k, Kneser-Ney document
# scoring, length-bucketed batch packing.
#
# Cross-engine float gate used by all three: every per-item partial score is
# a correctly-rounded double computed with an IDENTICAL expression tree on
# both engines (IEEE ops are deterministic given identical operands), then
# scaled by 2^40 (exact — power-of-two multiply) and floored to BIGINT.
# Integer sums are order-independent, so the parallel aggregation
# hash-gates bit-exactly at any partitioning — no ordered-fold assumptions,
# no sum-of-doubles nondeterminism. The final human-readable double is ONE
# division at the end. (The complement of the repo's "exact integer
# arithmetic until one division" rule, for scores that are irreducibly
# rational-with-varying-denominators.)
# ===========================================================================

_FP_SCALE = 1099511627776  # 2^40

# Fixed retrieval workload: 8 queries x 3 distinct terms from the corpus
# vocabulary (mix of rare and stopword-common terms so idf spread is real).
RETRIEVAL_QUERIES: tuple[tuple[int, tuple[str, str, str]], ...] = (
    (1, ("spark", "table", "join")),
    (2, ("window", "agg", "merge")),
    (3, ("customer", "order", "query")),
    (4, ("fast", "hash", "scan")),
    (5, ("stream", "batch", "window")),
    (6, ("sort", "column", "filter")),
    (7, ("vector", "data", "group")),
    (8, ("big", "small", "the")),
)

_BM25_TOPK = 10


def _bm25_oracle() -> str:
    vals = ",\n        ".join(
        f"({qid}, '{t}')"
        for qid, terms in RETRIEVAL_QUERIES
        for t in terms
    )
    return f"""
    WITH tk AS (
        SELECT doc_id, tok
        FROM (
            SELECT doc_id, unnest(string_split(text, ' ')) AS tok
            FROM documents
        )
        WHERE tok <> ''
    ), tf AS (
        SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS tfreq
        FROM tk GROUP BY 1, 2
    ), tfd AS (
        SELECT *, CAST(COUNT(*) OVER (PARTITION BY tok) AS BIGINT) AS dfreq
        FROM tf
    ), dl AS (
        SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dlen FROM tk GROUP BY 1
    ), tot AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(dlen) AS BIGINT) AS n_toks
        FROM dl
    ), q(query_id, term) AS (VALUES
        {vals}
    ), w AS (
        SELECT tfd.doc_id, tfd.tok,
               CAST(FLOOR(
                   ((CAST(n_docs - dfreq AS DOUBLE) + CAST(0.5 AS DOUBLE))
                    / (CAST(dfreq AS DOUBLE) + CAST(0.5 AS DOUBLE)))
                   * ((CAST(tfreq AS DOUBLE) * CAST(2.2 AS DOUBLE))
                      / (CAST(tfreq AS DOUBLE)
                         + CAST(1.2 AS DOUBLE)
                           * (CAST(0.25 AS DOUBLE)
                              + (CAST(0.75 AS DOUBLE) * CAST(dlen AS DOUBLE))
                                / (CAST(n_toks AS DOUBLE)
                                   / CAST(n_docs AS DOUBLE)))))
                   * CAST({_FP_SCALE} AS DOUBLE)
               ) AS BIGINT) AS w_fp
        FROM tfd JOIN dl USING (doc_id) CROSS JOIN tot
    ), m AS (
        SELECT q.query_id, w.doc_id,
               CAST(SUM(w_fp) AS BIGINT) AS score_fp,
               CAST(COUNT(*) AS BIGINT) AS n_terms_matched
        FROM q JOIN w ON w.tok = q.term
        GROUP BY 1, 2
    )
    SELECT CAST(query_id AS BIGINT) AS query_id, doc_id, rank,
           n_terms_matched,
           CAST(score_fp AS DOUBLE) / CAST({_FP_SCALE} AS DOUBLE)
               AS bm25_score
    FROM (
        SELECT *, CAST(ROW_NUMBER() OVER (
                   PARTITION BY query_id ORDER BY score_fp DESC, doc_id
               ) AS BIGINT) AS rank
        FROM m
    )
    WHERE rank <= {_BM25_TOPK}
    """


@register("bm25_retrieval_topk", _bm25_oracle)
def q_bm25_retrieval_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-k retrieval (Robertson-Sparck Jones) over the documents
    table for a fixed 8-query workload — the retrieval primitive behind
    RAG chunk selection and retrieval-based quality filtering. k1=1.2,
    b=0.75; idf is the rational odds form (N-df+0.5)/(df+0.5) WITHOUT the
    log wrap (same reason doc_tfidf_topterms uses rational idf: log is
    libm, 1-ulp across engines; the rational form hash-gates; ranking
    changes only in the weighting across terms, documented).

    Per-term weights become 2^40-fixed-point BIGINTs (see pack header), so
    the per-(query, doc) score sum is order-independent and the whole
    query hash-gates exactly, including rank order (ties broken by
    doc_id on identical integer scores).

    Scale shape: df via a COUNT window over the reduced (doc, term) table
    (one exchange fewer — the doc_tfidf_topterms pattern); the query
    workload joins in as a BROADCAST (queries are always driver-small);
    one shuffle aggregates (query, doc) scores. The top-k window
    partitions by query_id over candidate sets already reduced to matched
    docs. Document length is DERIVED from the term-frequency table (a
    dlen = sum(tfreq) window per doc) rather than re-tokenizing (round-6
    A/B: a groupBy(doc)+broadcast-join dlen variant measured equal at
    sf0.1, 1.82s vs 1.86s median-of-5 — and the window is the shape that
    still works at 100 TB, where a one-row-per-doc length table is far
    beyond broadcast size), and the
    tf table is persisted so the corpus explode+scan executes ONCE
    (round-5 verdict #1 found it running twice — exchange reuse alone
    cannot collapse it because PushDownLeftSemiAntiJoin pushes the
    query-term filter below tf_q's aggregate, making that exchange
    non-identical to the corpus-stats branch's). The persist is the
    documented-exception class (textrank edge cache): (doc,
    distinct-token)-sized, released by bench.py's per-run cache clear; at
    100 TB skip the persist and pay the second tokenize pass, or
    checkpoint tf — the tradeoff flips when tf no longer fits the
    cluster's storage fraction. Fixed-point caveat at
    extreme scale: idf < N, so weights fit 2^63 up to ~N*2.2*2^40 —
    beyond ~1e6-doc idf ranges, drop SCALE to 2^30 or gate
    selection-only."""
    d = load_spread(spark, sf_dir, "documents")
    tk = d.select(
        "doc_id", F.explode(T.tokens(F.col("text"))).alias("tok")
    ).where(F.col("tok") != "")
    from pyspark import StorageLevel

    tf = (
        tk.groupBy("doc_id", "tok")
        .agg(F.count("*").cast("bigint").alias("tfreq"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    qdf = spark.createDataFrame(
        [(qid, t) for qid, terms in RETRIEVAL_QUERIES for t in terms],
        "query_id int, term string",
    )
    # Document length attaches as a window over the cached tf (dlen =
    # sum tfreq per doc) BEFORE the query-term restriction — one cached
    # scan instead of a separate doc-length aggregate plus a join back
    # (A/B at sf0.1: 2.2s -> 1.8s median).
    tfl = tf.withColumn(
        "dlen", F.sum("tfreq").over(Window.partitionBy("doc_id")).cast("bigint")
    )
    # Push the query-term restriction BELOW the df computation: dfreq for a
    # term is its doc count over the whole corpus, which the tf rows of
    # that term alone determine — so semi-joining to the (tiny, broadcast)
    # query vocabulary first shrinks the per-term COUNT window from
    # corpus-vocabulary size to |query terms| with identical values.
    tf_q = tfl.join(
        F.broadcast(qdf.select("term").distinct()),
        tfl["tok"] == F.col("term"),
        "leftsemi",
    )
    tfd = tf_q.withColumn(
        "dfreq", F.count("*").over(Window.partitionBy("tok")).cast("bigint")
    )
    tot = tf.groupBy().agg(
        F.countDistinct("doc_id").cast("bigint").alias("n_docs"),
        F.sum("tfreq").cast("bigint").alias("n_toks"),
    )

    def dbl(c):
        return c.cast("double")

    idf = (dbl(F.col("n_docs") - F.col("dfreq")) + F.lit(0.5)) / (
        dbl(F.col("dfreq")) + F.lit(0.5)
    )
    avgdl = dbl(F.col("n_toks")) / dbl(F.col("n_docs"))
    denom = dbl(F.col("tfreq")) + F.lit(1.2) * (
        F.lit(0.25) + (F.lit(0.75) * dbl(F.col("dlen"))) / avgdl
    )
    w_fp = F.floor(
        idf * ((dbl(F.col("tfreq")) * F.lit(2.2)) / denom)
        * F.lit(float(_FP_SCALE))
    ).cast("bigint")
    w = tfd.crossJoin(F.broadcast(tot)).select(
        "doc_id", "tok", w_fp.alias("w_fp")
    )
    m = (
        w.join(F.broadcast(qdf), w["tok"] == qdf["term"])
        .groupBy("query_id", "doc_id")
        .agg(
            F.sum("w_fp").cast("bigint").alias("score_fp"),
            F.count("*").cast("bigint").alias("n_terms_matched"),
        )
    )
    rank = (
        F.row_number()
        .over(
            Window.partitionBy("query_id").orderBy(
                F.col("score_fp").desc(), "doc_id"
            )
        )
        .cast("bigint")
    )
    return (
        m.withColumn("rank", rank)
        .where(F.col("rank") <= _BM25_TOPK)
        .select(
            F.col("query_id").cast("bigint").alias("query_id"),
            "doc_id",
            "rank",
            "n_terms_matched",
            (F.col("score_fp").cast("double") / F.lit(float(_FP_SCALE))).alias(
                "bm25_score"
            ),
        )
    )


def _kn_doc_scores_oracle() -> str:
    from datafusion_dedup_ai_spark.registry import get_oracle

    return f"""
    WITH lm AS ({get_oracle("ngram_lm_counts")}),
    ctx AS (
        SELECT w1, w2, pair_count, left_contexts, right_contexts,
               CAST(SUM(pair_count) OVER (PARTITION BY w1) AS BIGINT) AS c1
        FROM lm
    ), npairs AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_pair_types FROM lm
    ), db AS (
        SELECT doc_id,
               string_split(bigram, ' ')[1] AS w1,
               string_split(bigram, ' ')[2] AS w2
        FROM (
            SELECT doc_id,
                   unnest([t[i] || ' ' || t[i+1] FOR i IN range(1, len(t))])
                       AS bigram
            FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)
        )
    ), scored AS (
        SELECT db.doc_id,
               CAST(FLOOR((
                   (CAST(pair_count AS DOUBLE) - CAST(0.75 AS DOUBLE))
                       / CAST(c1 AS DOUBLE)
                   + ((CAST(0.75 AS DOUBLE) * CAST(right_contexts AS DOUBLE))
                      / CAST(c1 AS DOUBLE))
                     * (CAST(left_contexts AS DOUBLE)
                        / CAST(n_pair_types AS DOUBLE))
               ) * CAST({_FP_SCALE} AS DOUBLE)) AS BIGINT) AS p_fp
        FROM db JOIN ctx ON db.w1 = ctx.w1 AND db.w2 = ctx.w2
        CROSS JOIN npairs
    )
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           (CAST(SUM(p_fp) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE))
               / CAST({_FP_SCALE} AS DOUBLE) AS avg_kn_prob,
           CAST(MIN(p_fp) AS DOUBLE) / CAST({_FP_SCALE} AS DOUBLE)
               AS min_kn_prob
    FROM scored GROUP BY doc_id
    """


@register("kn_doc_scores", _kn_doc_scores_oracle)
def q_kn_doc_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document Kneser-Ney bigram LM scores — the CCNet-style
    "perplexity filter" signal, composed from the registered
    ngram_lm_counts sufficient statistics. For each bigram instance,
    interpolated KN probability (Kneser & Ney 1995; d=0.75):

        p(w2|w1) = (c(w1,w2) - d)/c(w1.)
                 + (d * N1+(w1.)/c(w1.)) * (N1+(.w2)/N1+(..))

    (the max(c-d, 0) clamp is vacuous in-sample: c >= 1 > d). Per doc:
    bigram count, AVERAGE probability (the quality signal — low = the
    corpus LM finds the doc surprising), and MIN probability (the single
    most anomalous transition). Probabilities ride the 2^40 fixed-point
    gate (pack header), so the per-doc aggregation hash-gates exactly;
    avg/min become doubles via one (resp. two fixed-order) final
    divisions. A real CCNet filter takes the bottom quantile of
    avg_kn_prob — composable with per_source_quality_filter's percentile
    machinery.

    Scale shape (round 11): the LM table is vocabulary-pair-bounded (far
    below corpus scale, Heaps' law) — and the measured corpus makes the
    consequence concrete: 4,000 pair types at the 100x corpus, so a
    shuffle join on (w1, w2) would spread 50M doc-bigram rows over 4,000
    partitions-worth of keys — every key a hot partition at cluster
    scale. The pair table is therefore persisted (it feeds ctx, npairs,
    AND the probe; without the pin the explode+reduce pipeline executes
    per consumer) and counted once, and the doc-bigram stream joins it as
    a BROADCAST map-side probe whenever the count says it fits — the
    skew-proof shape. Beyond the budget (a truly open vocabulary) it
    falls back to the shuffle join, where AQE skew-split applies. The
    per-doc reduce is a partial-agg groupBy either way. Measured at the
    100x corpus: 15.7s -> 13.4s wall, and the 4,000-key shuffle is gone
    (kn crossover row, SCALE.md round 11)."""
    from datafusion_dedup_ai_spark.queries_extras import q_ngram_lm_counts

    # INTENTIONAL session-lifetime pin + eager count (round-11 advisor
    # note, adjudicated): the persisted pair table is vocabulary-pair-
    # bounded (Heaps' law — 4,000 rows at the 100x corpus, KiB not GiB),
    # and it feeds THREE consumers (ctx, npairs, the probe join), so
    # without the pin the corpus-scale explode+reduce executes once per
    # consumer. The count is the broadcast decision's only input and
    # doubles as the materialization of the cache the execution reuses —
    # i.e. construction pays the one corpus pass execution needs anyway.
    # No unpersist: an unpersist before execution would void the pin, and
    # Spark's CacheManager dedups by canonicalized plan, so re-building
    # this query re-uses (not re-pins) the same vocab-bounded entry. This
    # is the opposite regime from the removed lsh bucket-cap persist,
    # which pinned a CORPUS-sized bucketized frame.
    lm = q_ngram_lm_counts(spark, sf_dir).persist()
    n_pairs = lm.count()
    ctx = lm.withColumn(
        "c1", F.sum("pair_count").over(Window.partitionBy("w1")).cast("bigint")
    )
    if n_pairs * 80 <= 256 * 1024 * 1024:  # ~80 B/row: 2 words + 3 longs
        ctx = F.broadcast(ctx)
    npairs = lm.agg(F.count("*").cast("bigint").alias("n_pair_types"))
    d = load_spread(spark, sf_dir, "documents")
    db = d.select(
        "doc_id", F.explode(T.word_bigrams(F.col("text"))).alias("bigram")
    ).select(
        "doc_id",
        F.split("bigram", " ").getItem(0).alias("w1"),
        F.split("bigram", " ").getItem(1).alias("w2"),
    )

    def dbl(c):
        return c.cast("double")

    p = (dbl(F.col("pair_count")) - F.lit(0.75)) / dbl(F.col("c1")) + (
        (F.lit(0.75) * dbl(F.col("right_contexts"))) / dbl(F.col("c1"))
    ) * (dbl(F.col("left_contexts")) / dbl(F.col("n_pair_types")))
    scored = (
        db.join(ctx, ["w1", "w2"])
        .crossJoin(F.broadcast(npairs))
        .select(
            "doc_id",
            F.floor(p * F.lit(float(_FP_SCALE))).cast("bigint").alias("p_fp"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("n_bigrams"),
        (
            (F.sum("p_fp").cast("double") / F.count("*").cast("double"))
            / F.lit(float(_FP_SCALE))
        ).alias("avg_kn_prob"),
        (F.min("p_fp").cast("double") / F.lit(float(_FP_SCALE))).alias(
            "min_kn_prob"
        ),
    )


# Length buckets for inference/training batch packing: smallest power of
# two >= n_tokens, from a fixed CASE ladder (testdata docs are < 128
# tokens; the ladder top absorbs the rest).
_LEN_BUCKETS = (16, 32, 64, 128, 256)
_BATCH_SIZE = 8


def _length_bucket_sql(col: str) -> str:
    branches = " ".join(
        f"WHEN {col} <= {b} THEN {b}" for b in _LEN_BUCKETS[:-1]
    )
    return f"CASE {branches} ELSE {_LEN_BUCKETS[-1]} END"


def _length_batch_oracle() -> str:
    return f"""
    WITH sized AS (
        SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT)
                   AS n_tokens
        FROM documents
    ), bucketed AS (
        SELECT doc_id, n_tokens,
               CAST({_length_bucket_sql("n_tokens")} AS BIGINT)
                   AS bucket_len,
               md5(CAST(doc_id AS VARCHAR)) AS k
        FROM sized
    ), ranked AS (
        SELECT *, ROW_NUMBER() OVER (
                   PARTITION BY bucket_len ORDER BY k, doc_id) AS pos
        FROM bucketed
    ), batched AS (
        SELECT bucket_len, CAST((pos - 1) // {_BATCH_SIZE} AS BIGINT)
                   AS batch_id,
               n_tokens
        FROM ranked
    )
    SELECT bucket_len, batch_id,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(MAX(n_tokens) AS BIGINT) AS max_len,
           CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens,
           CAST(COUNT(*) * MAX(n_tokens) - SUM(n_tokens) AS BIGINT)
               AS pad_waste,
           CAST(SUM(n_tokens) AS DOUBLE)
               / CAST(COUNT(*) * MAX(n_tokens) AS DOUBLE) AS pack_efficiency
    FROM batched
    GROUP BY 1, 2
    """


@register("length_bucket_batches", _length_batch_oracle)
def q_length_bucket_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-bucketed batch packing plan — the dynamic-batching step an
    inference/training data loader runs: bucket documents by
    power-of-two token length, fill fixed-size batches per bucket in
    deterministic md5 order, and report per-batch padding waste (the
    thing length bucketing exists to minimize: every batch pads to its
    own max, not the corpus max).

    Scale shape: a handful of giant length-bucket groups is the
    canonical window-collapse trap — ROW_NUMBER PARTITION BY bucket_len
    puts a billion rows in one task. The Spark side instead ranks with
    operators/ordering.py::global_rank(partition_cols=[bucket_len]) —
    bucket-parallel WITHIN each length bucket via the md5-prefix offset
    trick, reproducing the serial window's numbering exactly (that
    equality is what the hash gate proves, since the oracle IS the
    serial window). Pure integer arithmetic + one final division."""
    from datafusion_dedup_ai_spark.operators.ordering import global_rank

    d = load_spread(spark, sf_dir, "documents")
    sized = d.select(
        "doc_id", T.token_count(F.col("text")).alias("n_tokens")
    )
    bucket = F.lit(_LEN_BUCKETS[-1])
    for b in reversed(_LEN_BUCKETS[:-1]):
        bucket = F.when(F.col("n_tokens") <= b, F.lit(b)).otherwise(bucket)
    bucketed = sized.withColumn("bucket_len", bucket.cast("bigint"))
    ranked = global_rank(
        bucketed,
        key=F.md5(F.col("doc_id").cast("string")),
        tiebreak=F.col("doc_id"),
        partition_cols=["bucket_len"],
    )
    batched = ranked.select(
        "bucket_len",
        F.expr(f"(pos - 1) div {_BATCH_SIZE}").cast("bigint").alias(
            "batch_id"
        ),
        "n_tokens",
    )
    return batched.groupBy("bucket_len", "batch_id").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.max("n_tokens").cast("bigint").alias("max_len"),
        F.sum("n_tokens").cast("bigint").alias("sum_tokens"),
        (F.count("*") * F.max("n_tokens") - F.sum("n_tokens"))
        .cast("bigint")
        .alias("pad_waste"),
        (
            F.sum("n_tokens").cast("double")
            / (F.count("*") * F.max("n_tokens")).cast("double")
        ).alias("pack_efficiency"),
    )


# ---------------------------------------------------------------------------
# Cluster-balanced sampling + per-source datasheet
# ---------------------------------------------------------------------------

_BALANCE_QUOTA = 20


def _cluster_balanced_oracle() -> str:
    return f"""
    WITH cells AS (
        SELECT vec_id, cell FROM '{{glob}}'
    ), sized AS (
        SELECT vec_id, cell,
               CAST(COUNT(*) OVER (PARTITION BY cell) AS BIGINT)
                   AS cell_size,
               md5(CAST(vec_id AS VARCHAR)) AS k
        FROM cells
    ), ranked AS (
        SELECT vec_id, cell, cell_size,
               CAST(ROW_NUMBER() OVER (
                   PARTITION BY cell ORDER BY k, vec_id) AS BIGINT)
                   AS pick_rank
        FROM sized
    )
    SELECT vec_id, CAST(cell AS BIGINT) AS cell, cell_size, pick_rank
    FROM ranked WHERE pick_rank <= {_BALANCE_QUOTA}
    """.format(glob="{glob}")


def _cluster_balanced_oracle_resolved() -> str:
    return _cluster_balanced_oracle().replace("{glob}", _semantic_cells_glob())


@register("cluster_balanced_sample", _cluster_balanced_oracle_resolved)
def q_cluster_balanced_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-balanced corpus sampling (the DataComp/DCLM-style topic
    rebalancing pass): assign every embedding to its spherical-k-means
    cell (the SAME deterministic assignment semantic_dedup uses, pinned
    against the materialized fixture by the hash gate), then keep at most
    QUOTA members per cell in md5 order — over-represented topics are
    clipped, rare topics survive whole. Output: the sampled members with
    their cell and cell_size (the before/after evidence).

    Scale shape: the per-cell rank is the SAME window-collapse trap as
    length bucketing (16 cells over a billion vectors = 16 tasks), so the
    Spark side ranks with global_rank(partition_cols=[cell]) —
    bucket-parallel within each cell; the oracle IS the serial window, so
    the hash gate proves the parallel rank's equality. The quota head is
    deterministic (md5 order), reproducible under retries."""
    from datafusion_dedup_ai_spark.operators.ordering import global_rank
    from datafusion_dedup_ai_spark.operators.semantic_dedup import (
        assign_semantic_cells,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    cells = assign_semantic_cells(emb).select("vec_id", "cell")
    sized = cells.withColumn(
        "cell_size",
        F.count("*").over(Window.partitionBy("cell")).cast("bigint"),
    )
    ranked = global_rank(
        sized,
        key=F.md5(F.col("vec_id").cast("string")),
        tiebreak=F.col("vec_id"),
        partition_cols=["cell"],
        out="pick_rank",
    )
    return (
        ranked.where(F.col("pick_rank") <= _BALANCE_QUOTA)
        .select(
            "vec_id",
            F.col("cell").cast("bigint").alias("cell"),
            "cell_size",
            F.col("pick_rank").cast("bigint").alias("pick_rank"),
        )
    )


def _source_datasheet_oracle() -> str:
    from datafusion_dedup_ai_spark.registry import get_oracle

    return f"""
    WITH lang AS ({get_oracle("doc_language_id")}),
    qual AS ({get_oracle("doc_quality_scores")}),
    base AS (
        SELECT d.doc_id, d.source,
               COUNT(*) OVER (PARTITION BY md5(d.text)) > 1 AS is_exact_dup
        FROM documents d
    )
    SELECT b.source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(q.n_tokens) AS BIGINT) AS total_tokens,
           CAST(SUM(CASE WHEN l.pred_lang = 'en' THEN 1 ELSE 0 END)
               AS BIGINT) AS n_pred_en,
           CAST(SUM(CASE WHEN b.is_exact_dup THEN 1 ELSE 0 END) AS BIGINT)
               AS n_exact_dup_docs,
           CAST(SUM(CAST(FLOOR(q.quality
                   * CAST({_FP_SCALE} AS DOUBLE)) AS BIGINT)) AS BIGINT)
               AS quality_fp_sum,
           CAST(SUM(q.n_tokens) AS DOUBLE) / COUNT(*) AS mean_tokens,
           CAST(SUM(CASE WHEN l.pred_lang = 'en' THEN 1 ELSE 0 END)
               AS DOUBLE) / COUNT(*) AS frac_pred_en,
           CAST(SUM(CASE WHEN b.is_exact_dup THEN 1 ELSE 0 END) AS DOUBLE)
               / COUNT(*) AS exact_dup_rate,
           (CAST(SUM(CAST(FLOOR(q.quality
                   * CAST({_FP_SCALE} AS DOUBLE)) AS BIGINT)) AS DOUBLE)
               / COUNT(*)) / CAST({_FP_SCALE} AS DOUBLE) AS mean_quality
    FROM base b
    JOIN lang l ON b.doc_id = l.doc_id
    JOIN qual q ON b.doc_id = q.doc_id
    GROUP BY b.source
    """


@register("source_datasheet", _source_datasheet_oracle)
def q_source_datasheet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source dataset card ("datasheets for datasets", Gebru et al.
    2018): one row per source with the numbers a data curator reads
    before choosing mixture weights — doc/token volume, predicted-
    language composition, exact-duplicate rate, and mean heuristic
    quality. Composes the REGISTERED language-ID and quality plans (their
    oracles nest as CTEs, so the whole card is hash-gated end-to-end).

    mean_quality rides the 2^40 fixed-point gate (pack header): per-doc
    quality doubles are floored to BIGINT so the per-source sum is
    order-independent; the mean is two fixed-order final divisions. The
    exact-dup flag is a COUNT window over md5(text) — one shuffle; the
    three plans join on doc_id and reduce to |sources| rows."""
    from datafusion_dedup_ai_spark.queries_text import (
        q_doc_language_id,
        q_doc_quality_scores,
    )

    d = load_spread(spark, sf_dir, "documents")
    lang = q_doc_language_id(spark, sf_dir).select("doc_id", "pred_lang")
    qual = q_doc_quality_scores(spark, sf_dir).select(
        "doc_id", "n_tokens", "quality"
    )
    base = d.select(
        "doc_id",
        "source",
        (
            F.count("*").over(Window.partitionBy(F.md5("text"))) > 1
        ).alias("is_exact_dup"),
    )
    j = base.join(lang, "doc_id").join(qual, "doc_id")
    q_fp = F.floor(
        F.col("quality") * F.lit(float(_FP_SCALE))
    ).cast("bigint")
    en = F.when(F.col("pred_lang") == "en", F.lit(1)).otherwise(F.lit(0))
    dup = F.when(F.col("is_exact_dup"), F.lit(1)).otherwise(F.lit(0))
    return j.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("total_tokens"),
        F.sum(en).cast("bigint").alias("n_pred_en"),
        F.sum(dup).cast("bigint").alias("n_exact_dup_docs"),
        F.sum(q_fp).cast("bigint").alias("quality_fp_sum"),
        (F.sum("n_tokens").cast("double") / F.count("*")).alias("mean_tokens"),
        (F.sum(en).cast("double") / F.count("*")).alias("frac_pred_en"),
        (F.sum(dup).cast("double") / F.count("*")).alias("exact_dup_rate"),
        (
            (F.sum(q_fp).cast("double") / F.count("*"))
            / F.lit(float(_FP_SCALE))
        ).alias("mean_quality"),
    )


# ---------------------------------------------------------------------------
# Product-analytics pack over `events`: ordered funnel + cohort retention —
# the sequence/temporal operator class (distinct from windowed aggs and
# sessionization, both already registered).
# ---------------------------------------------------------------------------

_FUNNEL_STAGES = ("signup", "view", "click", "purchase")


def _event_funnel_oracle() -> str:
    return """
    WITH ev AS (
        SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events
    ), u AS (
        SELECT DISTINCT user_id FROM ev
    ), s1 AS (
        SELECT user_id, MIN(ts_us) AS t1 FROM ev
        WHERE event_type = 'signup' GROUP BY 1
    ), s2 AS (
        SELECT ev.user_id, MIN(ts_us) AS t2 FROM ev JOIN s1 USING (user_id)
        WHERE event_type = 'view' AND ts_us > t1 GROUP BY 1
    ), s3 AS (
        SELECT ev.user_id, MIN(ts_us) AS t3 FROM ev JOIN s2 USING (user_id)
        WHERE event_type = 'click' AND ts_us > t2 GROUP BY 1
    ), s4 AS (
        SELECT ev.user_id, MIN(ts_us) AS t4 FROM ev JOIN s3 USING (user_id)
        WHERE event_type = 'purchase' AND ts_us > t3 GROUP BY 1
    )
    SELECT u.user_id,
           t1 AS t_signup_us, t2 AS t_view_us,
           t3 AS t_click_us, t4 AS t_purchase_us,
           CAST(CASE WHEN t4 IS NOT NULL THEN 4
                     WHEN t3 IS NOT NULL THEN 3
                     WHEN t2 IS NOT NULL THEN 2
                     WHEN t1 IS NOT NULL THEN 1
                     ELSE 0 END AS BIGINT) AS stage_reached
    FROM u
    LEFT JOIN s1 USING (user_id) LEFT JOIN s2 USING (user_id)
    LEFT JOIN s3 USING (user_id) LEFT JOIN s4 USING (user_id)
    """


@register("event_funnel", _event_funnel_oracle)
def q_event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel (signup -> view -> click -> purchase):
    per user, the FIRST timestamp of each stage that occurs strictly
    AFTER the previous stage was first reached — the standard product-
    analytics funnel semantics (a purchase before the first post-view
    click does not count). Output: the four stage timestamps (epoch
    micros, nullable) and the furthest stage reached.

    Implemented as staged MIN-aggregations — stage k+1 filters events
    against stage k's time and re-reduces. Every aggregation and join
    keys on user_id, so at scale the whole funnel is ONE shuffle's
    partitioning reused across stages (co-partitioned joins); no window,
    no per-user event sorting, no collect_list of event histories (the
    naive funnel implementation that OOMs on power users). All integer
    timestamp arithmetic — hash-gates exactly."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.unix_micros(F.col("ts")).alias("ts_us"),
    )
    u = ev.select("user_id").distinct()
    s1 = (
        ev.where(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts_us").alias("t1"))
    )
    s2 = (
        ev.where(F.col("event_type") == "view")
        .join(s1, "user_id")
        .where(F.col("ts_us") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts_us").alias("t2"))
    )
    s3 = (
        ev.where(F.col("event_type") == "click")
        .join(s2, "user_id")
        .where(F.col("ts_us") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts_us").alias("t3"))
    )
    s4 = (
        ev.where(F.col("event_type") == "purchase")
        .join(s3, "user_id")
        .where(F.col("ts_us") > F.col("t3"))
        .groupBy("user_id")
        .agg(F.min("ts_us").alias("t4"))
    )
    out = (
        u.join(s1, "user_id", "left")
        .join(s2, "user_id", "left")
        .join(s3, "user_id", "left")
        .join(s4, "user_id", "left")
    )
    stage = (
        F.when(F.col("t4").isNotNull(), F.lit(4))
        .when(F.col("t3").isNotNull(), F.lit(3))
        .when(F.col("t2").isNotNull(), F.lit(2))
        .when(F.col("t1").isNotNull(), F.lit(1))
        .otherwise(F.lit(0))
    )
    return out.select(
        "user_id",
        F.col("t1").alias("t_signup_us"),
        F.col("t2").alias("t_view_us"),
        F.col("t3").alias("t_click_us"),
        F.col("t4").alias("t_purchase_us"),
        stage.cast("bigint").alias("stage_reached"),
    )


def _retention_oracle() -> str:
    return """
    WITH ev AS (
        SELECT user_id, date_trunc('day', ts) AS d FROM events
    ), cohorts AS (
        SELECT user_id, MIN(d) AS cohort FROM ev GROUP BY 1
    ), active AS (
        SELECT DISTINCT user_id, d FROM ev
    ), j AS (
        SELECT c.cohort, date_diff('day', c.cohort, a.d) AS day_offset
        FROM active a JOIN cohorts c USING (user_id)
    ), cs AS (
        SELECT cohort, CAST(COUNT(*) AS BIGINT) AS cohort_size
        FROM cohorts GROUP BY 1
    ), act AS (
        SELECT cohort, CAST(day_offset AS BIGINT) AS day_offset,
               CAST(COUNT(*) AS BIGINT) AS n_active
        FROM j GROUP BY 1, 2
    )
    SELECT epoch_us(act.cohort) AS cohort_day_us, act.day_offset,
           act.n_active, cs.cohort_size,
           CAST(act.n_active AS DOUBLE) / cs.cohort_size AS retention_rate
    FROM act JOIN cs USING (cohort)
    """


@register("user_retention_cohorts", _retention_oracle)
def q_user_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention triangle: users grouped by first-activity day
    (their cohort), then for each day-offset the count and fraction of
    the cohort active that day — the table behind every retention curve
    dashboard. day_offset 0 is the cohort day itself (retention 1.0 by
    construction, a built-in sanity row).

    Scale shape: first-day reduction and the distinct (user, day)
    activity set both shuffle on user_id (one partitioning, reused by
    the cohort join); the final reduce is on (cohort, offset) — tiny.
    No windows. Integer counts + one final division — hash-gates
    exactly; days cross the compare as epoch micros."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.date_trunc("day", F.col("ts")).alias("d")
    )
    cohorts = ev.groupBy("user_id").agg(F.min("d").alias("cohort"))
    active = ev.distinct()
    j = active.join(cohorts, "user_id").select(
        "cohort", F.datediff(F.col("d"), F.col("cohort")).alias("day_offset")
    )
    cs = cohorts.groupBy("cohort").agg(
        F.count("*").cast("bigint").alias("cohort_size")
    )
    act = j.groupBy("cohort", "day_offset").agg(
        F.count("*").cast("bigint").alias("n_active")
    )
    return act.join(cs, "cohort").select(
        F.unix_micros(F.col("cohort")).alias("cohort_day_us"),
        F.col("day_offset").cast("bigint").alias("day_offset"),
        "n_active",
        "cohort_size",
        (F.col("n_active").cast("double") / F.col("cohort_size")).alias(
            "retention_rate"
        ),
    )


# ---------------------------------------------------------------------------
# Graph / sequence / robust-stats operator classes: near-dup graph audit
# (triangle counting), Markov transition matrix, MAD outlier detection.
# ---------------------------------------------------------------------------


def _dup_graph_metrics_oracle() -> str:
    from datafusion_dedup_ai_spark.registry import get_oracle

    return f"""
    WITH pairs AS ({get_oracle("ngram_jaccard_pairs")}),
    e AS (SELECT doc_a AS a, doc_b AS b FROM pairs),
    tri AS (
        SELECT e1.a AS x, e1.b AS y, e2.b AS z
        FROM e e1
        JOIN e e2 ON e1.b = e2.a
        JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
    ), tri_nodes AS (
        SELECT x AS node FROM tri
        UNION ALL SELECT y FROM tri
        UNION ALL SELECT z FROM tri
    ), tcount AS (
        SELECT node, CAST(COUNT(*) AS BIGINT) AS n_triangles
        FROM tri_nodes GROUP BY 1
    ), deg AS (
        SELECT node, CAST(COUNT(*) AS BIGINT) AS degree
        FROM (SELECT a AS node FROM e UNION ALL SELECT b FROM e)
        GROUP BY 1
    )
    SELECT deg.node AS doc_id, deg.degree,
           CAST(COALESCE(tcount.n_triangles, 0) AS BIGINT) AS n_triangles,
           CASE WHEN deg.degree >= 2
                THEN CAST(2 * COALESCE(tcount.n_triangles, 0) AS DOUBLE)
                     / (deg.degree * (deg.degree - 1))
                ELSE CAST(0.0 AS DOUBLE) END AS clustering_coeff
    FROM deg LEFT JOIN tcount ON deg.node = tcount.node
    """


@register("dup_graph_metrics", _dup_graph_metrics_oracle)
def q_dup_graph_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate graph audit: per document in the exact-Jaccard pair
    graph, its degree, the number of triangles through it, and the local
    clustering coefficient — the diagnostic that distinguishes chain-
    shaped near-dup families (transitive drift: A~B~C but A!~C, coeff 0)
    from clique-shaped ones (template spam, coeff 1). Dedup keep/drop
    policies behave very differently on the two shapes, so a production
    pipeline audits exactly this before choosing cluster-collapse rules.

    Exact triangle counting by oriented edge join (edges are already
    a<b-oriented): wedges e1(a,b)+e2(b,c) close iff e3(a,c) exists —
    every triangle counted once as its sorted triple, then credited to
    its three corners. At corpus scale the standard low-degree-first
    orientation bounds the wedge join; here edges are the (sparse)
    near-dup pairs, orders of magnitude below corpus cardinality.
    Composes the registered ngram_jaccard_pairs plan (oracle nests its
    SQL); integer counts + one guarded division — hash-gates exactly."""
    from datafusion_dedup_ai_spark.queries_text import q_ngram_jaccard_pairs

    pairs = q_ngram_jaccard_pairs(spark, sf_dir)
    e = pairs.select(F.col("doc_a").alias("a"), F.col("doc_b").alias("b"))
    e1 = e.alias("e1")
    e2 = e.alias("e2")
    e3 = e.alias("e3")
    tri = (
        e1.join(e2, F.col("e1.b") == F.col("e2.a"))
        .join(
            e3,
            (F.col("e3.a") == F.col("e1.a")) & (F.col("e3.b") == F.col("e2.b")),
        )
        .select(
            F.col("e1.a").alias("x"),
            F.col("e1.b").alias("y"),
            F.col("e2.b").alias("z"),
        )
    )
    tri_nodes = (
        tri.select(F.col("x").alias("node"))
        .unionAll(tri.select(F.col("y").alias("node")))
        .unionAll(tri.select(F.col("z").alias("node")))
    )
    tcount = tri_nodes.groupBy("node").agg(
        F.count("*").cast("bigint").alias("n_triangles")
    )
    deg = (
        e.select(F.col("a").alias("node"))
        .unionAll(e.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count("*").cast("bigint").alias("degree"))
    )
    out = deg.join(tcount, "node", "left")
    n_tri = F.coalesce(F.col("n_triangles"), F.lit(0)).cast("bigint")
    coeff = F.when(
        F.col("degree") >= 2,
        (F.lit(2) * n_tri).cast("double")
        / (F.col("degree") * (F.col("degree") - 1)),
    ).otherwise(F.lit(0.0))
    return out.select(
        F.col("node").alias("doc_id"),
        "degree",
        n_tri.alias("n_triangles"),
        coeff.alias("clustering_coeff"),
    )


def _transition_matrix_oracle() -> str:
    return """
    WITH seq AS (
        SELECT user_id, event_type AS src,
               LEAD(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS dst
        FROM events
    ), pc AS (
        SELECT src, dst, CAST(COUNT(*) AS BIGINT) AS n_transitions
        FROM seq WHERE dst IS NOT NULL GROUP BY 1, 2
    ), tot AS (
        SELECT *, CAST(SUM(n_transitions) OVER (PARTITION BY src) AS BIGINT)
                   AS n_from_src
        FROM pc
    )
    SELECT src, dst, n_transitions, n_from_src,
           CAST(n_transitions AS DOUBLE) / n_from_src AS prob
    FROM tot
    """


@register("event_transition_matrix", _transition_matrix_oracle)
def q_event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event streams:
    for each ordered (src, dst) event-type pair, how often dst
    immediately follows src in the same user's timeline, with the
    row-normalized transition probability. The behavioral-model
    complement of event_funnel (which tracks one prescribed path; this
    measures ALL empirical paths).

    One LEAD window per user partition (ties broken by event_id —
    deterministic), one reduce to the |types|^2 matrix, then the row
    total via a SUM window over the already-reduced matrix (the
    one-exchange-fewer pattern). prob is one int/int division —
    hash-gates exactly."""
    ev = load_table(spark, sf_dir, "events")
    seq = ev.select(
        F.col("event_type").alias("src"),
        F.lead("event_type")
        .over(Window.partitionBy("user_id").orderBy("ts", "event_id"))
        .alias("dst"),
    )
    pc = (
        seq.where(F.col("dst").isNotNull())
        .groupBy("src", "dst")
        .agg(F.count("*").cast("bigint").alias("n_transitions"))
    )
    tot = pc.withColumn(
        "n_from_src",
        F.sum("n_transitions").over(Window.partitionBy("src")).cast("bigint"),
    )
    return tot.select(
        "src",
        "dst",
        "n_transitions",
        "n_from_src",
        (F.col("n_transitions").cast("double") / F.col("n_from_src")).alias(
            "prob"
        ),
    )


def _mad_outliers_oracle() -> str:
    return """
    WITH v AS (
        SELECT event_id, event_type, value FROM events
    ), r AS (
        SELECT *, ROW_NUMBER() OVER (
                   PARTITION BY event_type ORDER BY value, event_id) AS rn,
               COUNT(*) OVER (PARTITION BY event_type) AS n
        FROM v
    ), med AS (
        SELECT event_type, value AS med FROM r WHERE rn = (n + 1) // 2
    ), d AS (
        SELECT v.event_id, v.event_type, v.value, med.med,
               abs(v.value - med.med) AS dev
        FROM v JOIN med USING (event_type)
    ), r2 AS (
        SELECT *, ROW_NUMBER() OVER (
                   PARTITION BY event_type ORDER BY dev, event_id) AS rn,
               COUNT(*) OVER (PARTITION BY event_type) AS n
        FROM d
    ), mad AS (
        SELECT event_type, dev AS mad FROM r2 WHERE rn = (n + 1) // 2
    )
    SELECT d.event_id, d.event_type, d.value, d.med, d.dev, mad.mad,
           d.dev > CAST(3.0 AS DOUBLE) * mad.mad AS is_outlier
    FROM d JOIN mad USING (event_type)
    """


@register("value_outliers_mad", _mad_outliers_oracle)
def q_value_outliers_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection on event values: per event type, the
    median and the Median Absolute Deviation (the robust scale estimator
    a data-quality gate uses where mean/stddev would be dragged by the
    outliers it hunts), flagging values deviating > 3 * MAD. Medians are
    the LOWER median (rank (n+1)//2 under (value, event_id) order) — a
    picked order statistic, not an average, so the gate needs no float
    summation at all; dev and the 3*MAD comparison are single
    correctly-rounded ops on identical operands.

    Scale note: the per-type rank windows partition by event_type — few
    huge groups. At corpus scale swap the rank for the bucket-parallel
    order-statistic machinery (operators/ordering.py::global_rank needs a
    hex key, so: approx_percentile to bracket the median bucket, then an
    exact rank inside the bracket), or accept approx_percentile as the
    registered quantity_quantiles_approx tier does; flagged here rather
    than silently absorbed."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    w_rank = Window.partitionBy("event_type").orderBy("value", "event_id")
    w_all = Window.partitionBy("event_type")
    r = ev.select(
        "*",
        F.row_number().over(w_rank).alias("rn"),
        F.count("*").over(w_all).alias("n"),
    )
    med = r.where(F.col("rn") == F.expr("(n + 1) div 2")).select(
        "event_type", F.col("value").alias("med")
    )
    d = ev.join(med, "event_type").select(
        "event_id",
        "event_type",
        "value",
        "med",
        F.abs(F.col("value") - F.col("med")).alias("dev"),
    )
    w_rank2 = Window.partitionBy("event_type").orderBy("dev", "event_id")
    r2 = d.select(
        "event_type",
        "dev",
        F.row_number().over(w_rank2).alias("rn"),
        F.count("*").over(w_all).alias("n"),
    )
    mad = r2.where(F.col("rn") == F.expr("(n + 1) div 2")).select(
        "event_type", F.col("dev").alias("mad")
    )
    return d.join(mad, "event_type").select(
        "event_id",
        "event_type",
        "value",
        "med",
        "dev",
        "mad",
        (F.col("dev") > F.lit(3.0) * F.col("mad")).alias("is_outlier"),
    )


# ---------------------------------------------------------------------------
# Fuzzy (MinHash-tier) benchmark decontamination
# ---------------------------------------------------------------------------

_CONTAM_J = 0.5


def _fuzzy_contamination_oracle() -> str:
    from datafusion_dedup_ai_spark.operators import hash_fixtures as HF
    from datafusion_dedup_ai_spark.queries_curation import BENCHMARK_MOD
    from datafusion_dedup_ai_spark.queries_dedup_ext import (
        _band_cands_with,
        _JACCARD_T,
        _minhash_mins_with,
    )

    g = HF.shingle_hashes_glob()
    return f"""
    WITH {_minhash_mins_with(g)},
    {_band_cands_with(g)},
    cand AS (
        SELECT DISTINCT t.doc_id AS train_id, e.doc_id AS bench_id
        FROM bandkeys t JOIN bandkeys e
          ON t.band = e.band AND t.bkey = e.bkey
        WHERE t.doc_id % {BENCHMARK_MOD} <> 0
          AND e.doc_id % {BENCHMARK_MOD} = 0
    ),
    common AS (
        SELECT c.train_id, c.bench_id, COUNT(*) AS n_common
        FROM cand c
        JOIN '{g}' fa ON fa.doc_id = c.train_id
        JOIN '{g}' fb ON fb.doc_id = c.bench_id AND fb.shingle = fa.shingle
        GROUP BY c.train_id, c.bench_id
    ),
    verified AS (
        SELECT cm.train_id,
               CAST(cm.n_common AS DOUBLE)
                   / (sa.n + sb.n - cm.n_common) AS jaccard
        FROM common cm
        JOIN sizes sa ON sa.doc_id = cm.train_id
        JOIN sizes sb ON sb.doc_id = cm.bench_id
        WHERE CAST(cm.n_common AS DOUBLE) / (sa.n + sb.n - cm.n_common)
              >= {_JACCARD_T}
    ),
    per_doc AS (
        SELECT train_id, CAST(COUNT(*) AS BIGINT) AS n_bench_matches,
               MAX(jaccard) AS max_jaccard
        FROM verified GROUP BY train_id
    )
    SELECT d.doc_id,
           CAST(COALESCE(p.n_bench_matches, 0) AS BIGINT)
               AS n_bench_matches,
           p.max_jaccard,
           COALESCE(p.max_jaccard >= {_CONTAM_J}, FALSE) AS contaminated
    FROM documents d
    LEFT JOIN per_doc p ON d.doc_id = p.train_id
    WHERE d.doc_id % {BENCHMARK_MOD} <> 0
    """


@register("fuzzy_benchmark_contamination", _fuzzy_contamination_oracle)
def q_fuzzy_benchmark_contamination(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Fuzzy eval-set decontamination — the NEAR-duplicate tier of
    benchmark_contamination (which counts exact shingle overlap): every
    training doc is LSH-probed against the benchmark docs' MinHash bands,
    candidates exact-Jaccard-verified, and docs whose best benchmark
    match reaches the contamination threshold are flagged. This is the
    GPT-3/Pile-style fuzzy decontamination pass: paraphrased or lightly
    edited eval leakage that exact matching misses.

    Scale shape: the benchmark side is tiny — its band table broadcasts,
    so the corpus-side cost is one signature pass + a broadcast probe
    (same topology as the incremental index match). Hash-gated via the
    xxhash64 shingle fixture: the oracle replays signatures, banding,
    cross-set candidates, and verification in SQL; the same residual
    2^-64 band-bucket collision caveat as minhash_near_dup_pairs."""
    from datafusion_dedup_ai_spark.operators import dedup as D
    from datafusion_dedup_ai_spark.queries_curation import BENCHMARK_MOD
    from datafusion_dedup_ai_spark.queries_dedup_ext import (
        _JACCARD_T,
        _shingled_docs,
    )
    from pyspark import StorageLevel

    # Documented-exception persist (the textrank-edge-cache class): the
    # shingled frame feeds BOTH the signature pass and the exact-Jaccard
    # verification join inside one action, and a query function returning a
    # lazy DataFrame has no post-action hook to unpersist from. Released by
    # bench.py's per-run cache clear / session teardown; a long-lived
    # service would wrap the action and unpersist in a finally.
    shingled = _shingled_docs(spark, sf_dir).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    sigs = D.minhash_signatures(shingled)
    buckets = D.band_buckets(sigs)
    is_bench = F.col("doc_id") % BENCHMARK_MOD == 0
    bench_b = buckets.where(is_bench)
    train_b = buckets.where(~is_bench)
    cand = (
        train_b.alias("t")
        .join(
            F.broadcast(bench_b.alias("e")),
            (F.col("t.band") == F.col("e.band"))
            & (F.col("t.bucket") == F.col("e.bucket")),
        )
        .select(
            F.col("t.doc_id").alias("id_a"),
            F.col("e.doc_id").alias("id_b"),
        )
        .distinct()
    )
    verified = D.verify_jaccard(
        cand, shingled, threshold=_JACCARD_T
    )
    per_doc = verified.groupBy(F.col("id_a").alias("train_id")).agg(
        F.count("*").cast("bigint").alias("n_bench_matches"),
        F.max("jaccard").alias("max_jaccard"),
    )
    train_docs = (
        load_spread(spark, sf_dir, "documents")
        .where(~is_bench)
        .select("doc_id")
    )
    out = train_docs.join(
        per_doc, train_docs["doc_id"] == per_doc["train_id"], "left"
    )
    return out.select(
        "doc_id",
        F.coalesce(F.col("n_bench_matches"), F.lit(0))
        .cast("bigint")
        .alias("n_bench_matches"),
        "max_jaccard",
        F.coalesce(F.col("max_jaccard") >= _CONTAM_J, F.lit(False)).alias(
            "contaminated"
        ),
    )


# ---------------------------------------------------------------------------
# Multimodal curation decisions — text + binary signals combined
# ---------------------------------------------------------------------------

_MEDIA_MIN_QUALITY = 0.5
_MEDIA_MIN_BYTES = 128
# The synthetic payloads have no natural exact duplicates (they derive from
# distinct texts), so — same convention as the PII and perceptual-dup
# planting — every doc_id % MOD == 1 payload is re-ingested verbatim under
# doc_id + OFFSET, deterministically on BOTH engines, so the keep-first
# content-hash rule demonstrably fires.
_MEDIA_PLANT_OFFSET = 1_000_000
_MEDIA_PLANT_MOD = 100


def _multimodal_curation_oracle() -> str:
    from datafusion_dedup_ai_spark.queries_multimodal import _media_glob
    from datafusion_dedup_ai_spark.registry import get_oracle

    return f"""
    WITH qual0 AS ({get_oracle("doc_quality_scores")}),
    m0 AS (
        SELECT doc_id, media_type,
               CAST(octet_length(payload) AS BIGINT) AS n_bytes,
               md5(hex(payload)) AS payload_md5
        FROM '{_media_glob()}'
    ), m AS (
        SELECT * FROM m0
        UNION ALL
        SELECT doc_id + {_MEDIA_PLANT_OFFSET}, media_type, n_bytes,
               payload_md5
        FROM m0 WHERE doc_id % {_MEDIA_PLANT_MOD} = 1
    ), qual AS (
        SELECT doc_id, quality FROM qual0
        UNION ALL
        SELECT doc_id + {_MEDIA_PLANT_OFFSET}, quality
        FROM qual0 WHERE doc_id % {_MEDIA_PLANT_MOD} = 1
    ), flagged AS (
        SELECT m.doc_id, m.media_type, m.n_bytes, q.quality,
               ROW_NUMBER() OVER (
                   PARTITION BY m.payload_md5 ORDER BY m.doc_id) > 1
                   AS dup_payload,
               q.quality < CAST({_MEDIA_MIN_QUALITY} AS DOUBLE)
                   AS low_text_quality,
               m.n_bytes < {_MEDIA_MIN_BYTES} AS tiny_payload
        FROM m JOIN qual q USING (doc_id)
    )
    SELECT doc_id, media_type, n_bytes, quality,
           dup_payload, low_text_quality, tiny_payload,
           NOT (dup_payload OR low_text_quality OR tiny_payload) AS keep,
           CASE WHEN dup_payload THEN 'dup_payload'
                WHEN low_text_quality THEN 'low_text_quality'
                WHEN tiny_payload THEN 'tiny_payload'
                ELSE 'kept' END AS drop_reason
    FROM flagged
    """


@register("multimodal_curation_decisions", _multimodal_curation_oracle)
def q_multimodal_curation_decisions(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Joint text+binary curation for multimodal training pairs — the
    decision table a caption/image pipeline runs before writing training
    shards: drop exact-duplicate payloads (keep-first by content hash,
    the image twin of exact text dedup), drop pairs whose TEXT side fails
    the quality gate (a good image with junk caption is junk training
    signal), drop truncated/stub payloads. One row per media doc with
    every flag, the verdict, and the first-match drop reason — same
    provenance convention as ensemble_dedup_decisions.

    Composes the registered doc_quality_scores plan over the TEXT side
    with the true-BINARY payload fixture on the media side (md5(hex(
    payload)) — the DuckDB-1.0-compatible BLOB hash from
    media_payload_stats). The fixture has no natural exact-dup payloads,
    so deterministic verbatim copies are planted on both engines
    (_MEDIA_PLANT_*) and the keep-first rule's firing is itself part of
    the hash gate. Scale shape: content-hash dedup is one window over
    md5 (one shuffle); the text-media join keys on doc_id. All flags are
    integer/boolean; quality is the already-gated double — hash-gates
    exactly."""
    from datafusion_dedup_ai_spark.operators import multimodal as M
    from datafusion_dedup_ai_spark.queries_text import q_doc_quality_scores

    media = M.load_media(spark, sf_dir)
    qual0 = q_doc_quality_scores(spark, sf_dir).select("doc_id", "quality")
    m0 = media.select(
        "doc_id",
        "media_type",
        F.octet_length("payload").cast("bigint").alias("n_bytes"),
        F.md5(F.hex("payload")).alias("payload_md5"),
    )
    planted = F.col("doc_id") % _MEDIA_PLANT_MOD == 1
    shifted = (F.col("doc_id") + _MEDIA_PLANT_OFFSET).alias("doc_id")
    m = m0.unionByName(
        m0.where(planted).select(
            shifted, "media_type", "n_bytes", "payload_md5"
        )
    )
    qual = qual0.unionByName(
        qual0.where(planted).select(shifted, "quality")
    )
    flagged = m.join(qual, "doc_id").select(
        "doc_id",
        "media_type",
        "n_bytes",
        "quality",
        (
            F.row_number().over(
                Window.partitionBy("payload_md5").orderBy("doc_id")
            )
            > 1
        ).alias("dup_payload"),
        (F.col("quality") < F.lit(_MEDIA_MIN_QUALITY)).alias(
            "low_text_quality"
        ),
        (F.col("n_bytes") < _MEDIA_MIN_BYTES).alias("tiny_payload"),
    )
    keep = ~(
        F.col("dup_payload")
        | F.col("low_text_quality")
        | F.col("tiny_payload")
    )
    reason = (
        F.when(F.col("dup_payload"), F.lit("dup_payload"))
        .when(F.col("low_text_quality"), F.lit("low_text_quality"))
        .when(F.col("tiny_payload"), F.lit("tiny_payload"))
        .otherwise(F.lit("kept"))
    )
    return flagged.select(
        "doc_id",
        "media_type",
        "n_bytes",
        "quality",
        "dup_payload",
        "low_text_quality",
        "tiny_payload",
        keep.alias("keep"),
        reason.alias("drop_reason"),
    )


# ---------------------------------------------------------------------------
# Hash-gated LSH ANN top-k (cross-engine verification of the approximate
# tier itself)
# ---------------------------------------------------------------------------


def _ann_lsh_gated_oracle() -> str:
    from datafusion_dedup_ai_spark.operators import hash_fixtures as HF
    from datafusion_dedup_ai_spark.queries_similarity import (
        N_QUERIES,
        TOP_K,
        _sql_cosine,
    )

    g = HF.lsh_buckets_glob()
    qm = HF.lsh_query_margins_glob()
    return f"""
    WITH c AS (
        SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
    ), b AS (
        SELECT vec_id, "table", bucket FROM '{g}'
    ), flips AS (
        -- per (query, table): base code + the lowest-|margin| bit, i.e. the
        -- bit multi-probe flips (probe R=1). The margins come from the
        -- fixture; the flip RANKING and the probe bucket are derived here.
        SELECT vec_id, "table", MIN(bucket) AS bucket,
               arg_min(bit, margin) AS flip_bit
        FROM '{qm}' GROUP BY vec_id, "table"
    ), qb AS (
        SELECT vec_id, "table", bucket FROM flips
        UNION
        SELECT vec_id, "table",
               xor(bucket, CAST(1 << flip_bit AS BIGINT)) AS bucket
        FROM flips
    ), cand AS (
        SELECT DISTINCT q.vec_id AS query_id, cb.vec_id AS neighbor_id
        FROM qb q JOIN b cb
          ON q."table" = cb."table" AND q.bucket = cb.bucket
         AND cb.vec_id <> q.vec_id
        WHERE q.vec_id < {N_QUERIES}
    ), scored AS (
        SELECT cand.query_id, cand.neighbor_id,
               {_sql_cosine('qv.v', 'cv.v')} AS cosine
        FROM cand
        JOIN c qv ON qv.vec_id = cand.query_id
        JOIN c cv ON cv.vec_id = cand.neighbor_id
    )
    SELECT query_id, neighbor_id, cosine, rk FROM (
        SELECT query_id, neighbor_id, cosine,
               CAST(ROW_NUMBER() OVER (
                   PARTITION BY query_id
                   ORDER BY cosine DESC, neighbor_id ASC) AS BIGINT) AS rk
        FROM scored)
    WHERE rk <= {TOP_K}
    """


@register("ann_lsh_topk_gated", _ann_lsh_gated_oracle)
def q_ann_lsh_topk_gated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hyperplane-LSH ANN tier under a FULL cross-engine hash gate,
    now INCLUDING query-side multi-probe (round-6 verdict #10): bucket
    probe (16 tables x 4 sign bits), the R=1 lowest-|margin| bit flip per
    table, candidate union, exact-cosine re-rank, top-k. The oracle reads
    the per-bit projection margins from the lsh_query_margins fixture and
    re-derives the flip itself — ``bucket XOR (1 << arg_min(bit,
    margin))`` — so the probe SELECTION is cross-engine verified, not just
    which candidates the buckets admit. The only non-SQL step anywhere in
    the tier is the hyperplane matmul (pinned against a numpy-free
    reference in tests/test_similarity.py). The cosine arithmetic is the
    same expression pair already gated by cosine_topk."""
    from datafusion_dedup_ai_spark.operators import similarity_search as S

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 5)
    return S.lsh_topk(
        emb,
        queries,
        k=5,
        n_tables=16,
        n_bits=4,
        dim=64,
        seed=7,
        extra_probes=1,
    )


# ---------------------------------------------------------------------------
# TextRank keyword scores — the distributed-iterative class (Pregel shape),
# hash-gated through integer fixed-point arithmetic
# ---------------------------------------------------------------------------

_TR_ITERS = 10
_TR_SCALE = 1 << 30  # rank 1.0


def _textrank_oracle() -> str:
    edges = """
    bg AS (
        SELECT string_split(b, ' ')[1] AS w1, string_split(b, ' ')[2] AS w2
        FROM (
            SELECT unnest([t[i] || ' ' || t[i+1] FOR i IN range(1, len(t))])
                AS b
            FROM (SELECT string_split(text, ' ') AS t FROM documents)
        )
    ), pc AS (
        SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c
        FROM bg WHERE w1 <> w2 GROUP BY 1, 2
    ), edges AS (
        SELECT u, v, CAST(SUM(c) AS BIGINT) AS w FROM (
            SELECT w1 AS u, w2 AS v, c FROM pc
            UNION ALL
            SELECT w2 AS u, w1 AS v, c FROM pc
        ) GROUP BY u, v
    ), nodes AS (
        SELECT u AS word, CAST(SUM(w) AS BIGINT) AS w_total,
               CAST(COUNT(*) AS BIGINT) AS n_neighbors
        FROM edges GROUP BY u
    ), r0 AS (
        SELECT word, CAST({scale} AS BIGINT) AS r FROM nodes
    )""".format(scale=_TR_SCALE)
    iters = ""
    for i in range(1, _TR_ITERS + 1):
        iters += """,
    r{i} AS (
        SELECT n.word,
               CAST((3 * CAST({scale} AS BIGINT)) // 20
                    + (17 * COALESCE(s.contrib, 0)) // 20 AS BIGINT) AS r
        FROM nodes n LEFT JOIN (
            SELECT e.v AS word,
                   SUM((p.r * e.w) // nu.w_total) AS contrib
            FROM edges e
            JOIN r{prev} p ON p.word = e.u
            JOIN nodes nu ON nu.word = e.u
            GROUP BY e.v
        ) s ON s.word = n.word
    )""".format(i=i, prev=i - 1, scale=_TR_SCALE)
    return f"""
    WITH {edges}{iters}
    SELECT n.word, n.n_neighbors, n.w_total,
           CAST(r.r AS BIGINT) AS rank_fp,
           CAST(r.r AS DOUBLE) / CAST({_TR_SCALE} AS DOUBLE) AS textrank
    FROM nodes n JOIN r{_TR_ITERS} r ON r.word = n.word
    """


@register("textrank_keywords", _textrank_oracle)
def q_textrank_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TextRank keyword scores (Mihalcea & Tarau, EMNLP 2004): weighted
    PageRank over the word co-occurrence graph (symmetrized bigram
    counts, self-loops dropped), damping 0.85, 10 synchronous
    iterations — the distributed-ITERATIVE operator class (the Pregel
    shape: per-iteration join of ranks against the edge list + reduce),
    which no other registered query exercises.

    Determinism: ranks live in 2^30 fixed point and every update is pure
    integer arithmetic — contribution floor((r_u * w_uv) / W_u), then
    floor-weighted damping (3*S)//20 + (17*sum)//20 — so the
    per-iteration aggregation is order-independent and all 10 iterations
    replay bit-exactly in SQL (unrolled CTE chain). One final division
    reports the float rank.

    Scale shape: each iteration is one shuffle join of the rank table
    against the edge list keyed on source word + one reduce on target —
    the canonical iterative-graph plan. The vocabulary-pair edge list and
    the vocabulary table are Heaps-law-bounded and persisted (each is
    consumed by all 10 iterations); the rank lineage is truncated by a
    non-eager localCheckpoint every 3 rounds so the final action never
    plans more than a 3-join-deep segment (plan tree in PLANS.md;
    round-5 verdict #3)."""
    d = load_spread(spark, sf_dir, "documents")
    bg = d.select(
        F.explode(T.word_bigrams(F.col("text"))).alias("b")
    ).select(
        F.split("b", " ").getItem(0).alias("w1"),
        F.split("b", " ").getItem(1).alias("w2"),
    )
    pc = (
        bg.where(F.col("w1") != F.col("w2"))
        .groupBy("w1", "w2")
        .agg(F.count("*").cast("bigint").alias("c"))
    )
    edges = (
        pc.select(F.col("w1").alias("u"), F.col("w2").alias("v"), "c")
        .unionByName(
            pc.select(F.col("w2").alias("u"), F.col("w1").alias("v"), "c")
        )
        .groupBy("u", "v")
        .agg(F.sum("c").cast("bigint").alias("w"))
    )
    # Vocabulary table — consumed by EVERY iteration's rank rebuild (the
    # left join that restores dangling nodes) plus the final report join;
    # unpersisted, each of those 11 uses re-ran the whole explode+bigram
    # subtree (round-5 verdict #2). Vocabulary-sized (Heaps' law) — the
    # documented exception class, released by bench.py's per-run cache
    # clear. A pre-partitioned
    # (repartition on the join key) persist of both tables was A/B-measured
    # WORSE here (6.0s vs 4.4s median at sf0.1): it pins 32-task cached
    # scans under every iteration and defeats AQE's coalescing of the
    # vocabulary-sized exchanges.
    nodes = edges.groupBy(F.col("u").alias("word")).agg(
        F.sum("w").cast("bigint").alias("w_total"),
        F.count("*").cast("bigint").alias("n_neighbors"),
    ).persist()
    # Edge list with source total attached once — consumed by all 10
    # iteration joins inside the single final action, so the cache is hit
    # 9 times per run. Vocabulary-PAIR-bounded (Heaps' law), not corpus-
    # bounded, so the session-lifetime pin is kilobytes-to-megabytes (the
    # documented exception class; bench.py clears cache between runs).
    e = edges.join(
        nodes.select(F.col("word").alias("u"), "w_total"), "u"
    ).persist()
    ranks = nodes.select("word", F.lit(_TR_SCALE).cast("bigint").alias("r"))
    for _i in range(_TR_ITERS):
        contrib = (
            # Plain shuffle joins, NOT per-iteration broadcasts: a
            # broadcast of the freshly-computed rank table forces a
            # driver-side materialization barrier EVERY round, serializing
            # the iteration pipeline — measured 7.5s vs 4.5s at sf0.1 for
            # the 10 rounds (and at billion-edge scale the rank table is
            # the thing you shuffle-partition anyway).
            e.join(ranks.withColumnRenamed("word", "u"), "u")
            # `div` is EXACT BIGINT division — double `/` + cast would
            # round the quotient before truncating and diverge from the
            # oracle's `//` on ~1-ulp boundaries.
            .select(
                F.col("v").alias("word"),
                F.expr("(r * w) div w_total").alias("part"),
            )
            .groupBy("word")
            .agg(F.sum("part").alias("contrib"))
        )
        ranks = (
            nodes.select("word")
            .join(contrib, "word", "left")
            .select(
                "word",
                (
                    F.lit((3 * _TR_SCALE) // 20)
                    + F.expr("(17 * coalesce(contrib, 0L)) div 20")
                )
                .cast("bigint")
                .alias("r"),
            )
        )
        # Lineage truncation every 3 rounds (round-5 verdict #3): without
        # it the final action carries a 10-deep unpersisted join tree,
        # whose analysis/codegen cost and all-or-nothing recompute are the
        # 100 TB failure mode of iterative plans. Non-eager localCheckpoint
        # compiles the segment to an RDD boundary NOW (plan depth stays
        # <= 3 joins) and materializes it inside the single final action —
        # no extra jobs, no driver barrier; integer ranks replay exactly
        # across the boundary so the hash gate is unaffected.
        if (_i + 1) % 3 == 0 and (_i + 1) < _TR_ITERS:
            ranks = ranks.localCheckpoint(eager=False)
    out = nodes.join(ranks, "word").select(
        "word",
        "n_neighbors",
        "w_total",
        F.col("r").alias("rank_fp"),
        (F.col("r").cast("double") / F.lit(float(_TR_SCALE))).alias(
            "textrank"
        ),
    )
    return out


# ---------------------------------------------------------------------------
# Count-min sketch + positional inverted index
# ---------------------------------------------------------------------------

_CMS_W = 1024
_CMS_SALTS = ("cms0", "cms1", "cms2")
_CMS_PROBE_TOPN = 20


def _cms_hash_sql(salt: str, term: str) -> str:
    """First 8 md5 hex digits -> BIGINT -> mod w: < 2^32, exact in BIGINT,
    identical in both engines (same md5 string, same base-16 parse)."""
    return (
        f"CAST(conv(substr(md5(concat('{salt}', {term})), 1, 8), 16, 10)"
        f" AS BIGINT) % {_CMS_W}"
    )


def _cms_oracle() -> str:
    # DuckDB lacks conv(); from_hex equivalent: parse base-16 via
    # CAST(concat('0x', ...) AS BIGINT) is unsupported in 1.0 — use
    # list_reduce-free arithmetic: 8 hex chars -> strtol via
    # bit-shifting position lookup is clumsy; DuckDB DOES have
    # from_hex? No — but it has ('x' prefix)? Simplest portable form:
    # sum over the 8 chars of digit * 16^i using strpos on a hex alphabet.
    def duck_hex(salt: str) -> str:
        terms = " + ".join(
            f"(strpos('0123456789abcdef', substr(h_{salt}, {i + 1}, 1)) - 1)"
            f" * {16 ** (7 - i)}"
            for i in range(8)
        )
        return f"CAST(({terms}) AS BIGINT) % {_CMS_W}"

    pre = ", ".join(
        f"substr(md5(concat('{s}', tok)), 1, 8) AS h_{s}" for s in _CMS_SALTS
    )
    mins = ", ".join(
        f"MIN(est_{s}) AS est_{s}" for s in _CMS_SALTS
    )
    return f"""
    WITH toks AS (
        SELECT unnest(string_split(text, ' ')) AS tok FROM documents
    ), tc AS (
        SELECT tok, CAST(COUNT(*) AS BIGINT) AS true_count
        FROM toks WHERE tok <> '' GROUP BY tok
    ), hashed AS (
        SELECT tok, true_count, {pre} FROM tc
    ), slots AS (
        SELECT tok, true_count,
               {', '.join(duck_hex(s) + f' AS slot_{s}' for s in _CMS_SALTS)}
        FROM hashed
    ), counters AS (
        {' UNION ALL '.join(
            f"SELECT '{s}' AS row_id, slot_{s} AS slot, "
            f"CAST(SUM(true_count) AS BIGINT) AS counter "
            f"FROM slots GROUP BY slot_{s}" for s in _CMS_SALTS
        )}
    ), probes AS (
        SELECT tok, true_count,
               {', '.join(f'slot_{s}' for s in _CMS_SALTS)},
               CAST(ROW_NUMBER() OVER (
                   ORDER BY true_count DESC, tok ASC) AS BIGINT) AS rn
        FROM slots
    ), est AS (
        SELECT p.tok, p.true_count,
               LEAST({', '.join(
                   f"(SELECT counter FROM counters c WHERE c.row_id = '{s}'"
                   f" AND c.slot = p.slot_{s})" for s in _CMS_SALTS
               )}) AS est_count
        FROM probes p WHERE p.rn <= {_CMS_PROBE_TOPN}
    )
    SELECT tok AS term, true_count, CAST(est_count AS BIGINT) AS est_count,
           CAST(est_count - true_count AS BIGINT) AS overestimate
    FROM est
    """


@register("cms_term_frequencies", _cms_oracle)
def q_cms_term_frequencies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch (Cormode & Muthukrishnan 2005) over the corpus
    token stream — the mergeable fixed-memory frequency sketch a
    streaming ingest keeps where exact per-term counts no longer fit:
    3 salted-md5 hash rows x {w} counters, each counter the sum of
    colliding terms' counts (map-side combinable: the sketch of a union
    is the elementwise sum of sketches). The top-{n} true terms are then
    point-queried (min over the 3 rows) and reported against their true
    counts — est >= true ALWAYS (one-sided error, the CMS theorem), with
    overestimate bounded by collision mass ~ 2N/w in expectation.

    Everything is integer arithmetic on md5-derived slots — no xxhash64,
    so the sketch hash-gates with NO materialized fixture (the oracle
    re-parses the same 8 hex digits positionally; DuckDB 1.0 has no
    conv())."""
    d = load_spread(spark, sf_dir, "documents")
    tc = (
        d.select(F.explode(T.tokens(F.col("text"))).alias("tok"))
        .where(F.col("tok") != "")
        .groupBy("tok")
        .agg(F.count("*").cast("bigint").alias("true_count"))
    )
    slots = tc.select(
        "tok",
        "true_count",
        *[
            F.expr(_cms_hash_sql(s, "tok")).alias(f"slot_{s}")
            for s in _CMS_SALTS
        ],
    )
    est_cols = []
    # top-N probes via orderBy().limit() -> TakeOrderedAndProject
    # (distributed per-partition heaps + driver merge), NOT a global
    # ROW_NUMBER window — the single-task collapse at vocabulary scale.
    # The total order (count desc, term asc) makes the selected SET
    # identical to the oracle's ROW_NUMBER spec.
    probe = slots.orderBy(
        F.col("true_count").desc(), F.col("tok").asc()
    ).limit(_CMS_PROBE_TOPN)
    for s in _CMS_SALTS:
        counters = (
            slots.groupBy(f"slot_{s}")
            .agg(F.sum("true_count").cast("bigint").alias(f"est_{s}"))
        )
        probe = probe.join(F.broadcast(counters), f"slot_{s}")
        est_cols.append(F.col(f"est_{s}"))
    return probe.select(
        F.col("tok").alias("term"),
        "true_count",
        F.least(*est_cols).cast("bigint").alias("est_count"),
        (F.least(*est_cols) - F.col("true_count"))
        .cast("bigint")
        .alias("overestimate"),
    )


@register(
    "positional_index",
    """
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ), pos AS (
        SELECT doc_id, unnest(range(0, len(t))) AS p, t FROM toks
    ), terms AS (
        SELECT doc_id, t[p + 1] AS term, p FROM pos WHERE t[p + 1] <> ''
    ), postings AS (
        SELECT term, doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_occurrences,
               to_json(list(p ORDER BY p))::VARCHAR AS positions
        FROM terms GROUP BY term, doc_id
    )
    SELECT term, doc_id, n_occurrences, positions,
           CAST(COUNT(*) OVER (PARTITION BY term) AS BIGINT) AS doc_freq
    FROM postings
    """,
)
def q_positional_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional inverted index construction — the search-engine build
    step BM25 retrieval consumes: per (term, doc) posting with occurrence
    count, the sorted position list (JSON at the contract surface —
    nested columns break the driver hash), and the term's document
    frequency. Posting lists are the input to phrase/proximity queries;
    the ExactSubstr span machinery reuses the same positional explode.

    Scale shape: one positional explode (bounded by corpus token count),
    one reduce to (term, doc), then doc_freq as a COUNT window over the
    ALREADY-REDUCED posting table (the one-exchange-fewer pattern). The
    JSON list is array_sort-deterministic on both engines."""
    d = load_spread(spark, sf_dir, "documents")
    terms = (
        d.select(
            "doc_id",
            F.posexplode(T.tokens(F.col("text"))).alias("p", "term"),
        )
        .where(F.col("term") != "")
    )
    postings = terms.groupBy("term", "doc_id").agg(
        F.count("*").cast("bigint").alias("n_occurrences"),
        F.to_json(F.sort_array(F.collect_list("p"))).alias("positions"),
    )
    return postings.select(
        "term",
        "doc_id",
        "n_occurrences",
        "positions",
        F.count("*")
        .over(Window.partitionBy("term"))
        .cast("bigint")
        .alias("doc_freq"),
    )


@register(
    "hourly_value_ohlc",
    """
    WITH b AS (
        SELECT event_type, date_trunc('hour', ts) AS h, ts, event_id, value
        FROM events
    ), r AS (
        SELECT *,
               ROW_NUMBER() OVER (PARTITION BY event_type, h
                   ORDER BY ts, event_id) AS rn_open,
               ROW_NUMBER() OVER (PARTITION BY event_type, h
                   ORDER BY ts DESC, event_id DESC) AS rn_close
        FROM b
    )
    SELECT event_type, epoch_us(h) AS hour_us,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           MAX(CASE WHEN rn_open = 1 THEN value END) AS open,
           MAX(value) AS high,
           MIN(value) AS low,
           MAX(CASE WHEN rn_close = 1 THEN value END) AS close
    FROM r GROUP BY 1, 2
    """,
)
def q_hourly_value_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC bars per (event type, hour) — the time-series downsampling
    shape every metrics/finance pipeline runs: open = first value in the
    bucket, close = last (both tie-broken by event_id — deterministic
    under concurrent timestamps), high/low = max/min. First/last are
    picked order statistics via two ROW_NUMBERs over the SAME partition
    key (one Exchange+Sort serves both windows and the final group-by) —
    no float summation, so every column is an exactly-picked or
    exactly-compared double; hash-gates bit-for-bit."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.date_trunc("hour", F.col("ts")).alias("h"),
        "ts",
        "event_id",
        "value",
    )
    w_open = Window.partitionBy("event_type", "h").orderBy("ts", "event_id")
    w_close = Window.partitionBy("event_type", "h").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    r = ev.select(
        "*",
        F.row_number().over(w_open).alias("rn_open"),
        F.row_number().over(w_close).alias("rn_close"),
    )
    return r.groupBy("event_type", "h").agg(
        F.count("*").cast("bigint").alias("n_events"),
        F.max(F.when(F.col("rn_open") == 1, F.col("value"))).alias("open"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.max(F.when(F.col("rn_close") == 1, F.col("value"))).alias("close"),
    ).select(
        "event_type",
        F.unix_micros(F.col("h")).alias("hour_us"),
        "n_events",
        "open",
        "high",
        "low",
        "close",
    )


# ---------------------------------------------------------------------------
# Collocation detection + A/B experiment analysis
# ---------------------------------------------------------------------------

_COLLOC_DELTA = 5
_COLLOC_MIN_COUNT = 10


@register(
    "collocation_scores",
    f"""
    WITH lm AS (
        SELECT w1, w2, pair_count FROM (
            SELECT string_split(b, ' ')[1] AS w1,
                   string_split(b, ' ')[2] AS w2,
                   CAST(COUNT(*) AS BIGINT) AS pair_count
            FROM (
                SELECT unnest([t[i] || ' ' || t[i+1]
                               FOR i IN range(1, len(t))]) AS b
                FROM (SELECT string_split(text, ' ') AS t FROM documents)
            ) GROUP BY 1, 2
        )
    ), uni AS (
        SELECT tok, CAST(COUNT(*) AS BIGINT) AS c
        FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
        WHERE tok <> '' GROUP BY tok
    ), tot AS (
        SELECT CAST(SUM(c) AS BIGINT) AS n FROM uni
    )
    SELECT lm.w1, lm.w2, lm.pair_count,
           u1.c AS count_w1, u2.c AS count_w2,
           CAST(lm.pair_count - {_COLLOC_DELTA} AS DOUBLE)
               * CAST(n AS DOUBLE) / (CAST(u1.c AS DOUBLE) * u2.c)
               AS phrase_score
    FROM lm
    JOIN uni u1 ON u1.tok = lm.w1
    JOIN uni u2 ON u2.tok = lm.w2
    CROSS JOIN tot
    WHERE lm.pair_count >= {_COLLOC_MIN_COUNT}
    """,
)
def q_collocation_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Phrase/collocation detection scores (the word2vec phrase pass,
    Mikolov et al. 2013 §4): score(w1 w2) = (c12 - delta) * N /
    (c1 * c2) — the discounted PMI ODDS form, deliberately without the
    log wrap (log is libm, 1-ulp cross-engine; the odds form ranks
    identically and hash-gates — same policy as rational idf). Pairs
    above a score threshold become merge candidates ("New York" ->
    "New_York") in tokenizer prep.

    One bigram reduce + a broadcast-sized unigram join + a 1-row total:
    integers until the final fixed-shape double expression."""
    d = load_spread(spark, sf_dir, "documents")
    lm = (
        d.select(F.explode(T.word_bigrams(F.col("text"))).alias("b"))
        .select(
            F.split("b", " ").getItem(0).alias("w1"),
            F.split("b", " ").getItem(1).alias("w2"),
        )
        .groupBy("w1", "w2")
        .agg(F.count("*").cast("bigint").alias("pair_count"))
        .where(F.col("pair_count") >= _COLLOC_MIN_COUNT)
    )
    uni = (
        d.select(F.explode(T.tokens(F.col("text"))).alias("tok"))
        .where(F.col("tok") != "")
        .groupBy("tok")
        .agg(F.count("*").cast("bigint").alias("c"))
    )
    tot = uni.agg(F.sum("c").cast("bigint").alias("n"))
    u1 = uni.select(F.col("tok").alias("w1"), F.col("c").alias("count_w1"))
    u2 = uni.select(F.col("tok").alias("w2"), F.col("c").alias("count_w2"))
    j = (
        lm.join(F.broadcast(u1), "w1")
        .join(F.broadcast(u2), "w2")
        .crossJoin(F.broadcast(tot))
    )
    score = (
        (F.col("pair_count") - F.lit(_COLLOC_DELTA)).cast("double")
        * F.col("n").cast("double")
        / (F.col("count_w1").cast("double") * F.col("count_w2"))
    )
    return j.select(
        "w1",
        "w2",
        "pair_count",
        "count_w1",
        "count_w2",
        score.alias("phrase_score"),
    )


@register(
    "ab_test_report",
    """
    WITH assign AS (
        SELECT user_id, CAST(user_id % 2 AS BIGINT) AS variant
        FROM (SELECT DISTINCT user_id FROM events)
    ), conv AS (
        SELECT user_id FROM events WHERE event_type = 'purchase'
        GROUP BY user_id HAVING COUNT(*) >= 14
    ), per_variant AS (
        SELECT a.variant,
               CAST(COUNT(*) AS BIGINT) AS n_users,
               CAST(SUM(CASE WHEN c.user_id IS NOT NULL THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_converted
        FROM assign a LEFT JOIN conv c ON a.user_id = c.user_id
        GROUP BY a.variant
    ), wide AS (
        SELECT
            MAX(CASE WHEN variant = 0 THEN n_users END) AS n0,
            MAX(CASE WHEN variant = 0 THEN n_converted END) AS c0,
            MAX(CASE WHEN variant = 1 THEN n_users END) AS n1,
            MAX(CASE WHEN variant = 1 THEN n_converted END) AS c1
        FROM per_variant
    )
    SELECT n0 AS n_control, c0 AS conv_control,
           n1 AS n_treatment, c1 AS conv_treatment,
           CAST(c0 AS DOUBLE) / n0 AS rate_control,
           CAST(c1 AS DOUBLE) / n1 AS rate_treatment,
           CAST(c1 AS DOUBLE) / n1 - CAST(c0 AS DOUBLE) / n0 AS lift,
           CASE WHEN sqrt(
                   (CAST(c0 + c1 AS DOUBLE) / (n0 + n1))
                   * (CAST(1 AS DOUBLE)
                      - CAST(c0 + c1 AS DOUBLE) / (n0 + n1))
                   * (CAST(1 AS DOUBLE) / n0 + CAST(1 AS DOUBLE) / n1)
               ) = CAST(0 AS DOUBLE) THEN NULL
               ELSE (CAST(c1 AS DOUBLE) / n1 - CAST(c0 AS DOUBLE) / n0)
               / sqrt(
                   (CAST(c0 + c1 AS DOUBLE) / (n0 + n1))
                   * (CAST(1 AS DOUBLE)
                      - CAST(c0 + c1 AS DOUBLE) / (n0 + n1))
                   * (CAST(1 AS DOUBLE) / n0 + CAST(1 AS DOUBLE) / n1)
               ) END AS z_score
    FROM wide
    """,
)
def q_ab_test_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample proportion test for an A/B experiment: users split by
    id parity, conversion = made >= 14 purchases (fixture-tuned: the
    synthetic events table gives every user some purchases, so a >= 1
    cut would convert 100% of both variants and zero out the statistic;
    14 lands both variants' rates strictly inside (0, 1)); reports
    per-variant
    conversion rates, lift, and the pooled two-proportion z-score — the
    experimentation-analytics readout. sqrt IS hash-gateable (IEEE 754
    requires correctly-rounded sqrt, unlike libm's ln/exp), so the whole
    statistic crosses engines bit-exactly given the fixed expression
    tree. One distinct + one semi-ish join + a 2-row reduce."""
    ev = load_table(spark, sf_dir, "events")
    assign = ev.select("user_id").distinct().select(
        "user_id", (F.col("user_id") % 2).cast("bigint").alias("variant")
    )
    conv = (
        ev.where(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.count("*").alias("n_purch"))
        .where(F.col("n_purch") >= 14)
        .select("user_id", F.lit(1).alias("converted"))
    )
    per_variant = (
        assign.join(conv, "user_id", "left")
        .groupBy("variant")
        .agg(
            F.count("*").cast("bigint").alias("n_users"),
            F.sum(F.coalesce(F.col("converted"), F.lit(0)))
            .cast("bigint")
            .alias("n_converted"),
        )
    )
    wide = per_variant.agg(
        F.max(F.when(F.col("variant") == 0, F.col("n_users"))).alias("n0"),
        F.max(F.when(F.col("variant") == 0, F.col("n_converted"))).alias(
            "c0"
        ),
        F.max(F.when(F.col("variant") == 1, F.col("n_users"))).alias("n1"),
        F.max(F.when(F.col("variant") == 1, F.col("n_converted"))).alias(
            "c1"
        ),
    )

    def dbl(c):
        return c.cast("double")

    rate0 = dbl(F.col("c0")) / F.col("n0")
    rate1 = dbl(F.col("c1")) / F.col("n1")
    pooled = dbl(F.col("c0") + F.col("c1")) / (F.col("n0") + F.col("n1"))
    se = F.sqrt(
        pooled
        * (F.lit(1.0) - pooled)
        * (F.lit(1.0) / F.col("n0") + F.lit(1.0) / F.col("n1"))
    )
    z = F.when(se == F.lit(0.0), F.lit(None)).otherwise((rate1 - rate0) / se)
    return wide.select(
        F.col("n0").alias("n_control"),
        F.col("c0").alias("conv_control"),
        F.col("n1").alias("n_treatment"),
        F.col("c1").alias("conv_treatment"),
        rate0.alias("rate_control"),
        rate1.alias("rate_treatment"),
        (rate1 - rate0).alias("lift"),
        z.alias("z_score"),
    )


# ---------------------------------------------------------------------------
# Reciprocal-rank fusion + grouped KMV distinct sketch
# ---------------------------------------------------------------------------

_RRF_K = 60


def _rrf_oracle() -> str:
    from datafusion_dedup_ai_spark.registry import get_oracle

    return f"""
    WITH exact_rk AS ({get_oracle("cosine_topk")}),
    lsh_rk AS ({get_oracle("ann_lsh_topk_gated")}),
    fused AS (
        SELECT COALESCE(e.query_id, l.query_id) AS query_id,
               COALESCE(e.neighbor_id, l.neighbor_id) AS neighbor_id,
               e.rk AS rank_exact, l.rk AS rank_lsh,
               COALESCE(CAST(1 AS DOUBLE) / ({_RRF_K} + e.rk),
                        CAST(0 AS DOUBLE))
               + COALESCE(CAST(1 AS DOUBLE) / ({_RRF_K} + l.rk),
                          CAST(0 AS DOUBLE)) AS rrf_score
        FROM exact_rk e
        FULL OUTER JOIN lsh_rk l
          ON e.query_id = l.query_id AND e.neighbor_id = l.neighbor_id
    )
    SELECT query_id, neighbor_id, rank_exact, rank_lsh, rrf_score,
           CAST(ROW_NUMBER() OVER (
               PARTITION BY query_id
               ORDER BY rrf_score DESC, neighbor_id ASC) AS BIGINT)
               AS fused_rank
    FROM fused
    """


@register("rrf_fused_ranking", _rrf_oracle)
def q_rrf_fused_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al., SIGIR 2009) of two
    registered retrievers — the exact cosine top-k and the LSH ANN tier —
    per query: score = sum over lists of 1/(60 + rank), absent-from-list
    contributes 0. RRF is THE standard hybrid-retrieval combiner (BM25 +
    vector search in production RAG stacks); here both fused lists rank
    the same id space, and both are themselves hash-gated queries whose
    oracles nest as CTEs, so the fusion is verified end-to-end. The score
    is a fixed two-term sum of correctly-rounded divisions — bit-exact
    cross-engine without the fixed-point gate.

    Scale shape: two top-k tables (queries x k rows each) full-outer
    join on (query, neighbor) — fused cardinality is bounded by the sum
    of list sizes, never corpus-sized."""
    from datafusion_dedup_ai_spark.queries_extras import q_ann_lsh_topk_gated
    from datafusion_dedup_ai_spark.queries_similarity import q_cosine_topk

    exact_rk = q_cosine_topk(spark, sf_dir).select(
        "query_id", "neighbor_id", F.col("rk").alias("rank_exact")
    )
    lsh_rk = q_ann_lsh_topk_gated(spark, sf_dir).select(
        "query_id", "neighbor_id", F.col("rk").alias("rank_lsh")
    )
    fused = exact_rk.join(
        lsh_rk, ["query_id", "neighbor_id"], "full_outer"
    ).select(
        "query_id",
        "neighbor_id",
        "rank_exact",
        "rank_lsh",
        (
            F.coalesce(
                F.lit(1.0) / (F.lit(_RRF_K) + F.col("rank_exact")),
                F.lit(0.0),
            )
            + F.coalesce(
                F.lit(1.0) / (F.lit(_RRF_K) + F.col("rank_lsh")),
                F.lit(0.0),
            )
        ).alias("rrf_score"),
    )
    fused_rank = (
        F.row_number()
        .over(
            Window.partitionBy("query_id").orderBy(
                F.col("rrf_score").desc(), F.col("neighbor_id").asc()
            )
        )
        .cast("bigint")
    )
    return fused.withColumn("fused_rank", fused_rank)


_KMV_GROUP_K = 32


def _kmv_by_type_oracle() -> str:
    return f"""
    WITH u AS (
        SELECT DISTINCT event_type, user_id FROM events
    ), h AS (
        SELECT event_type, user_id,
               ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 12))::BIGINT
                   AS hv
        FROM u
    ), r AS (
        SELECT event_type, hv,
               ROW_NUMBER() OVER (
                   PARTITION BY event_type ORDER BY hv, user_id) AS rn,
               COUNT(*) OVER (PARTITION BY event_type) AS n_exact
        FROM h
    )
    SELECT event_type,
           CAST(MAX(n_exact) AS BIGINT) AS exact_distinct,
           CAST(CASE WHEN MAX(n_exact) <= {_KMV_GROUP_K}
                THEN CAST(MAX(n_exact) AS DOUBLE)
                ELSE CAST({_KMV_GROUP_K} - 1 AS DOUBLE)
                     / (CAST(MAX(CASE WHEN rn = {_KMV_GROUP_K} THEN hv END)
                             AS DOUBLE)
                        / CAST(281474976710656 AS DOUBLE))
                END AS DOUBLE) AS est_distinct
    FROM r GROUP BY event_type
    """


@register("kmv_distinct_by_type", _kmv_by_type_oracle)
def q_kmv_distinct_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPED K-minimum-values distinct estimate: distinct users per
    event type via per-group KMV-{k} over 48-bit md5-prefix hash
    fractions — the "distinct per dimension" form a metrics pipeline
    keeps one mergeable sketch per group for, where per-group exact
    distinct would shuffle the full (group, user) universe every window.
    Groups at-or-under K report exactly (the sketch holds the whole
    set). est = (K-1)/frac(K-th smallest hash), one fixed expression
    tree — hash-gates like the global KMV (same DECIMAL-promotion trap:
    the divisor is cast to DOUBLE before dividing).

    (The per-group rank window is vocabulary-of-groups x users wide here;
    at scale the per-group k-min state comes from the mergeable
    aggregate in operators/sketches.py — this query's point is the
    cross-engine arithmetic gate on the grouped estimator.)"""
    ev = load_table(spark, sf_dir, "events")
    u = ev.select("event_type", "user_id").distinct()
    hv = F.expr(
        "cast(conv(substr(md5(cast(user_id as string)), 1, 12), 16, 10)"
        " as bigint)"
    )
    h = u.select("event_type", "user_id", hv.alias("hv"))
    r = h.select(
        "event_type",
        "hv",
        F.row_number()
        .over(Window.partitionBy("event_type").orderBy("hv", "user_id"))
        .alias("rn"),
        F.count("*").over(Window.partitionBy("event_type")).alias("n_exact"),
    )
    kth = F.max(F.when(F.col("rn") == _KMV_GROUP_K, F.col("hv")))
    est = F.when(
        F.max("n_exact") <= _KMV_GROUP_K,
        F.max("n_exact").cast("double"),
    ).otherwise(
        F.lit(float(_KMV_GROUP_K - 1))
        / (kth.cast("double") / F.lit(281474976710656.0))
    )
    return r.groupBy("event_type").agg(
        F.max("n_exact").cast("bigint").alias("exact_distinct"),
        est.cast("double").alias("est_distinct"),
    )


# ---------------------------------------------------------------------------
# B-cubed cluster evaluation — self-grading the dedup partition
# ---------------------------------------------------------------------------


def _b3_oracle() -> str:
    from datafusion_dedup_ai_spark import materialize as MZ

    return f"""
    WITH snap AS (
        SELECT row_order, base_name, cluster_id, cluster_size
        FROM '{MZ.snapshot_glob()}'
    ), labeled AS (
        SELECT row_order, cluster_id, cluster_size,
               CASE WHEN base_name = '' THEN '&' || row_order
                    ELSE list_aggr(list_sort(string_split(base_name, ' ')),
                                   'string_agg', '')
               END AS gold_key
        FROM snap
    ), gsize AS (
        SELECT gold_key, CAST(COUNT(*) AS BIGINT) AS g FROM labeled
        GROUP BY gold_key
    ), cells AS (
        SELECT cluster_id, gold_key, CAST(COUNT(*) AS BIGINT) AS cell,
               CAST(MAX(cluster_size) AS BIGINT) AS c
        FROM labeled GROUP BY cluster_id, gold_key
    ), fp AS (
        SELECT cells.cell, cells.c, gsize.g,
               CAST(FLOOR((CAST(cell AS DOUBLE) / c)
                   * CAST({_FP_SCALE} AS DOUBLE)) AS BIGINT) AS p_fp,
               CAST(FLOOR((CAST(cell AS DOUBLE) / g)
                   * CAST({_FP_SCALE} AS DOUBLE)) AS BIGINT) AS r_fp
        FROM cells JOIN gsize USING (gold_key)
    ), agg AS (
        SELECT CAST(SUM(cell) AS BIGINT) AS n_rows,
               CAST(SUM(cell * p_fp) AS BIGINT) AS p_sum,
               CAST(SUM(cell * r_fp) AS BIGINT) AS r_sum
        FROM fp
    ), tot AS (
        SELECT n_rows,
               (CAST(p_sum AS DOUBLE) / n_rows)
                   / CAST({_FP_SCALE} AS DOUBLE) AS b3_precision,
               (CAST(r_sum AS DOUBLE) / n_rows)
                   / CAST({_FP_SCALE} AS DOUBLE) AS b3_recall
        FROM agg
    )
    SELECT n_rows,
           (SELECT CAST(COUNT(DISTINCT cluster_id) AS BIGINT) FROM snap)
               AS n_system_clusters,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM gsize) AS n_gold_clusters,
           b3_precision, b3_recall,
           CASE WHEN b3_precision + b3_recall = CAST(0 AS DOUBLE)
                THEN CAST(0 AS DOUBLE)
                ELSE CAST(2 AS DOUBLE) * b3_precision * b3_recall
                     / (b3_precision + b3_recall) END AS b3_f1
    FROM tot
    """


@register("cluster_b3_metrics", _b3_oracle)
def q_cluster_b3_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B-cubed evaluation (Bagga & Baldwin 1998) of the fuzzy-dedup
    partition against the token-sorted exact-key clustering as reference:
    per item, precision = |C(i) n G(i)| / |C(i)| and recall = the same
    over |G(i)|, averaged over items — THE standard entity-resolution
    quality metric (pairwise F-measure overweights big clusters; B-cubed
    does not). Empty-base singletons are their own gold cluster. The
    system side reads the SAME materialized cluster snapshot the O-pack
    oracles grade against, so this row is the engine scoring its own
    headline feature.

    Per-item fractions ride the 2^40 fixed-point gate (pack header) —
    each (cluster, gold) CELL's p/r is floored once and weighted by the
    cell size, so the global averages are order-independent integer
    sums; F1 is a fixed expression over the two gated doubles. Scale
    shape: two grouped reductions (cells, gold sizes) + a broadcast-size
    join — never materializes pairs."""
    from datafusion_dedup_ai_spark import materialize as MZ
    from datafusion_dedup_ai_spark.functions.normalize import token_sort_key

    snap = MZ.read_clusters_snapshot(spark, sf_dir).select(
        "row_order", "base_name", "cluster_id", "cluster_size"
    )
    labeled = snap.select(
        "cluster_id",
        "cluster_size",
        F.when(
            F.col("base_name") == "",
            F.concat(F.lit("&"), F.col("row_order").cast("string")),
        )
        .otherwise(token_sort_key(F.col("base_name")))
        .alias("gold_key"),
    )
    gsize = labeled.groupBy("gold_key").agg(
        F.count("*").cast("bigint").alias("g")
    )
    cells = labeled.groupBy("cluster_id", "gold_key").agg(
        F.count("*").cast("bigint").alias("cell"),
        F.max("cluster_size").cast("bigint").alias("c"),
    )
    scale = F.lit(float(_FP_SCALE))
    fp = cells.join(gsize, "gold_key").select(
        "cluster_id",
        "cell",
        F.floor((F.col("cell").cast("double") / F.col("c")) * scale)
        .cast("bigint")
        .alias("p_fp"),
        F.floor((F.col("cell").cast("double") / F.col("g")) * scale)
        .cast("bigint")
        .alias("r_fp"),
    )
    agg = fp.agg(
        F.sum("cell").cast("bigint").alias("n_rows"),
        F.sum(F.col("cell") * F.col("p_fp")).cast("bigint").alias("p_sum"),
        F.sum(F.col("cell") * F.col("r_fp")).cast("bigint").alias("r_sum"),
        F.countDistinct("cluster_id").cast("bigint").alias(
            "n_system_clusters"
        ),
    )
    ngold = gsize.agg(
        F.count("*").cast("bigint").alias("n_gold_clusters")
    )
    p = (F.col("p_sum").cast("double") / F.col("n_rows")) / scale
    r = (F.col("r_sum").cast("double") / F.col("n_rows")) / scale
    f1 = F.when(p + r == F.lit(0.0), F.lit(0.0)).otherwise(
        F.lit(2.0) * p * r / (p + r)
    )
    return agg.crossJoin(F.broadcast(ngold)).select(
        "n_rows",
        "n_system_clusters",
        "n_gold_clusters",
        p.alias("b3_precision"),
        r.alias("b3_recall"),
        f1.alias("b3_f1"),
    )


# ---------------------------------------------------------------------------
# Per-event ML feature engineering (lag + time-range rolling frames)
# ---------------------------------------------------------------------------


@register(
    "user_event_features",
    """
    WITH ev AS (
        SELECT event_id, user_id, event_type, value,
               epoch_us(ts) AS ts_us
        FROM events
    )
    SELECT event_id, user_id, event_type, ts_us,
           LAG(value) OVER w AS prev_value,
           ts_us - LAG(ts_us) OVER w AS micros_since_prev,
           CAST(COUNT(*) OVER (
               PARTITION BY user_id ORDER BY ts_us
               RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW
           ) - 1 AS BIGINT) AS events_prev_hour,
           CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
               OVER (
               PARTITION BY user_id ORDER BY ts_us
               RANGE BETWEEN 86400000000 PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS errors_prev_day
    FROM ev
    WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
    """,
)
def q_user_event_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event ML feature table — the feature-engineering pass a churn/
    fraud model trains on: previous value and inter-event gap (LAG over
    the user timeline) plus TIME-RANGE rolling aggregates (events in the
    trailing hour, errors in the trailing day) via RANGE frames over
    epoch-micros — the frame type where the window extends by TIME, not
    row count, so bursts and quiet periods aggregate correctly (a ROWS
    frame would be wrong on irregular event spacing).

    One Exchange on user_id serves the LAG window and both RANGE frames.
    Note the RANGE windows order by ts alone (SQL requires a single
    ordering expression for RANGE) — simultaneous events aggregate
    identically on both engines because the frame boundary is a value
    predicate, not a row position. All integer arithmetic; LAG(value) is
    a picked double — hash-gates exactly."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "event_type",
        "value",
        F.unix_micros(F.col("ts")).alias("ts_us"),
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    w_hour = (
        Window.partitionBy("user_id")
        .orderBy("ts_us")
        .rangeBetween(-3_600_000_000, 0)
    )
    w_day = (
        Window.partitionBy("user_id")
        .orderBy("ts_us")
        .rangeBetween(-86_400_000_000, 0)
    )
    err = F.when(F.col("event_type") == "error", F.lit(1)).otherwise(F.lit(0))
    return ev.select(
        "event_id",
        "user_id",
        "event_type",
        "ts_us",
        F.lag("value").over(w).alias("prev_value"),
        (F.col("ts_us") - F.lag("ts_us").over(w)).alias("micros_since_prev"),
        (F.count("*").over(w_hour) - F.lit(1))
        .cast("bigint")
        .alias("events_prev_hour"),
        F.sum(err).over(w_day).cast("bigint").alias("errors_prev_day"),
    )


# ---------------------------------------------------------------------------
# Per-label embedding centroid drift (the data-drift monitor shape)
# ---------------------------------------------------------------------------


def _centroid_drift_oracle() -> str:
    return f"""
    WITH c AS (
        SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings
    ), comp AS (
        SELECT label, vec_id,
               unnest(range(0, len(v))) AS dim, v
        FROM c
    ), fp AS (
        SELECT label, dim,
               CAST(FLOOR(v[dim + 1] * CAST({_FP_SCALE} AS DOUBLE))
                   AS BIGINT) AS comp_fp
        FROM comp
    ), lmean AS (
        SELECT label, dim,
               (CAST(SUM(comp_fp) AS DOUBLE) / COUNT(*))
                   / CAST({_FP_SCALE} AS DOUBLE) AS m,
               CAST(COUNT(*) AS BIGINT) AS n_vecs
        FROM fp GROUP BY label, dim
    ), gmean AS (
        SELECT dim,
               (CAST(SUM(comp_fp) AS DOUBLE) / COUNT(*))
                   / CAST({_FP_SCALE} AS DOUBLE) AS g
        FROM fp GROUP BY dim
    ), diffs AS (
        SELECT l.label, l.n_vecs,
               CAST(FLOOR(((l.m - g.g) * (l.m - g.g))
                   * CAST({_FP_SCALE} AS DOUBLE)) AS BIGINT) AS sq_fp
        FROM lmean l JOIN gmean g USING (dim)
    )
    SELECT label, CAST(MAX(n_vecs) AS BIGINT) AS n_vecs,
           sqrt((CAST(SUM(sq_fp) AS DOUBLE))
                / CAST({_FP_SCALE} AS DOUBLE)) AS centroid_drift
    FROM diffs GROUP BY label
    """


@register("label_centroid_drift", _centroid_drift_oracle)
def q_label_centroid_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-distribution drift monitor: per label, the Euclidean
    distance from the label's embedding centroid to the global corpus
    centroid — the statistic a production pipeline tracks per source/day
    to catch upstream drift (encoder swap, topic shift, pipeline bug)
    before it poisons training. Here grouped by the embeddings' label
    column; the per-source/per-day form is the same plan with a
    different key.

    Two fixed-point passes keep the whole statistic order-independent:
    vector components are floored to 2^40 BIGINTs before the per-group
    per-dimension mean (integer sums commute; two fixed-order divisions
    recover the double), and the squared centroid differences are
    floored again before the cross-dimension sum, so the final sqrt (the
    one IEEE-exact libm call) sees the identical double on both engines.
    Scale: one explode bounded by n_vectors x dim, two grouped
    reductions — the standard wide-agg shape."""
    emb = load_table(spark, sf_dir, "embeddings")
    scale = F.lit(float(_FP_SCALE))
    comp = emb.select(
        "label", F.posexplode(F.col("embedding").cast("array<double>"))
    ).select(
        "label",
        F.col("pos").alias("dim"),
        F.floor(F.col("col") * scale).cast("bigint").alias("comp_fp"),
    )
    lmean = comp.groupBy("label", "dim").agg(
        (
            (F.sum("comp_fp").cast("double") / F.count("*")) / scale
        ).alias("m"),
        F.count("*").cast("bigint").alias("n_vecs"),
    )
    gmean = comp.groupBy("dim").agg(
        ((F.sum("comp_fp").cast("double") / F.count("*")) / scale).alias("g")
    )
    diffs = lmean.join(gmean, "dim").select(
        "label",
        "n_vecs",
        F.floor(((F.col("m") - F.col("g")) * (F.col("m") - F.col("g"))) * scale)
        .cast("bigint")
        .alias("sq_fp"),
    )
    return diffs.groupBy("label").agg(
        F.max("n_vecs").cast("bigint").alias("n_vecs"),
        F.sqrt(F.sum("sq_fp").cast("double") / scale).alias(
            "centroid_drift"
        ),
    )


# ---------------------------------------------------------------------------
# MinHash estimator accuracy report (signature agreement vs exact Jaccard)
# ---------------------------------------------------------------------------


def _minhash_estimate_oracle() -> str:
    from datafusion_dedup_ai_spark.operators import hash_fixtures as HF
    from datafusion_dedup_ai_spark.queries_dedup_ext import (
        _minhash_mins_with,
        _NUM_HASHES,
    )
    from datafusion_dedup_ai_spark.registry import get_oracle

    g = HF.shingle_hashes_glob()
    return f"""
    WITH {_minhash_mins_with(g)},
    pairs AS ({get_oracle("ngram_jaccard_pairs")}),
    agree AS (
        SELECT p.doc_a, p.doc_b, p.jaccard,
               CAST(SUM(CASE WHEN ma.hv = mb.hv THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_agree
        FROM pairs p
        JOIN mins ma ON ma.doc_id = p.doc_a
        JOIN mins mb ON mb.doc_id = p.doc_b AND mb.i = ma.i
        GROUP BY p.doc_a, p.doc_b, p.jaccard
    )
    SELECT doc_a, doc_b, jaccard, n_agree,
           CAST(n_agree AS DOUBLE) / {_NUM_HASHES} AS jaccard_est,
           abs(CAST(n_agree AS DOUBLE) / {_NUM_HASHES} - jaccard)
               AS abs_error
    FROM agree
    """


@register("minhash_estimate_report", _minhash_estimate_oracle)
def q_minhash_estimate_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self-grading MinHash fidelity: for every EXACT near-dup pair, the
    signature-agreement Jaccard estimate (matching positions / 64 —
    E[agreement] = J is the MinHash theorem) against the true Jaccard,
    with the absolute error. The operator a pipeline owner reads before
    trusting signature-only dedup decisions (e.g. the persisted-index
    match path, which never rescans text). Pure integers until two
    divisions — hash-gated through the xxhash64 shingle fixture like the
    rest of the MinHash pack; the estimator's per-pair error is the
    VALUE under test, visible to the driver."""
    from datafusion_dedup_ai_spark.operators import dedup as D
    from datafusion_dedup_ai_spark.queries_dedup_ext import _shingled_docs
    from datafusion_dedup_ai_spark.queries_text import q_ngram_jaccard_pairs

    sigs = D.minhash_signatures(_shingled_docs(spark, sf_dir))
    pairs = q_ngram_jaccard_pairs(spark, sf_dir).select(
        "doc_a", "doc_b", "jaccard"
    )
    sa = sigs.select(F.col("doc_id").alias("doc_a"), F.col("sig").alias("sig_a"))
    sb = sigs.select(F.col("doc_id").alias("doc_b"), F.col("sig").alias("sig_b"))
    j = pairs.join(sa, "doc_a").join(sb, "doc_b")
    n_agree = F.expr(
        "size(filter(zip_with(sig_a, sig_b, (x, y) -> x = y), b -> b))"
    ).cast("bigint")
    est = F.col("n_agree").cast("double") / F.lit(64)
    return (
        j.withColumn("n_agree", n_agree)
        .select(
            "doc_a",
            "doc_b",
            "jaccard",
            "n_agree",
            est.alias("jaccard_est"),
            F.abs(est - F.col("jaccard")).alias("abs_error"),
        )
    )


# ---------------------------------------------------------------------------
# Incremental cluster maintenance (batch edges into existing state)
# ---------------------------------------------------------------------------


def _incremental_cluster_oracle() -> str:
    # The oracle IS the full recompute (text_dedup_clusters' SQL verbatim):
    # the hash gate therefore PROVES the incremental path's partition and
    # labels equal a from-scratch connected-components run, bit for bit.
    from datafusion_dedup_ai_spark.registry import get_oracle

    return get_oracle("text_dedup_clusters")


@register("incremental_cluster_update", _incremental_cluster_oracle)
def q_incremental_cluster_update(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental cluster maintenance — the state-merge step between the
    persisted near-dup indexes and the cluster outputs: given the
    corpus's EXISTING cluster assignment (components over corpus-only
    edges) and a new batch's delta edges (batch-batch and batch-corpus,
    the pairs an index match emits), produce the updated assignment
    WITHOUT re-running components on the corpus graph. Corpus components
    contract to supernodes (their existing min-id label), delta edges
    relabel onto supernodes, components run on that contracted graph
    (delta-sized, not corpus-sized), and labels map back.

    Correctness is the definition of contraction: a supernode's label is
    its component's min doc_id, so min-label propagation over the
    contracted graph yields the min doc_id of each MERGED component —
    exactly the from-scratch answer. The oracle runs the FULL recompute
    (text_dedup_clusters' SQL verbatim), so the hash gate is an
    end-to-end machine proof of incremental == full on this corpus.

    Scale shape: the corpus-side work is one pass to build base labels
    (amortized: in production they're the persisted state, not
    recomputed) plus a map-side relabel of delta edges; the component
    iteration touches only the contracted delta graph. Batch split is
    the established doc_id%10 convention."""
    from datafusion_dedup_ai_spark.operators.clustering import (
        cluster_components_auto,
    )
    from datafusion_dedup_ai_spark.queries_extras import NEAR_DUP_JACCARD

    d = load_spread(spark, sf_dir, "documents")
    sh = d.select(
        "doc_id", T.distinct_shingles(F.col("text")).alias("shingles")
    )
    # Documented-exception persist (textrank-edge-cache class): the pair
    # list feeds BOTH the corpus-only and delta splits below — unpersisted,
    # the whole signature+banding+verify pipeline executed twice per run
    # (in production this frame IS the persisted index-match state, not a
    # recompute). Near-dup-pair-sized, released by bench.py's per-run
    # cache clear / session teardown.
    pairs = (
        D.minhash_near_dup_pairs(sh, threshold=NEAR_DUP_JACCARD)
        .select("id_a", "id_b")
        .persist()
    )

    def in_batch(c):
        return F.col(c) % 10 >= 8

    corpus_pairs = pairs.where(~in_batch("id_a") & ~in_batch("id_b"))
    delta_pairs = pairs.where(in_batch("id_a") | in_batch("id_b"))

    # existing state: components over corpus-only edges, min-id labels.
    # Both component runs go through the SIZE ROUTER (round-6): the
    # contracted delta graph is delta-sized by construction, so it takes
    # the single-task union-find path at ANY corpus scale, and the
    # corpus-side run (amortized-away in production, see above) routes to
    # LP only beyond the 2M-edge threshold — at bench scale this removed
    # ~20 iterative Spark jobs per run (8.3s -> see BENCH_r06).
    base = cluster_components_auto(
        corpus_pairs.select(
            F.col("id_a").alias("row_order_a"),
            F.col("id_b").alias("row_order_b"),
        )
    ).select(F.col("row_order").alias("doc_id"), "cluster_id")
    universe = d.select("doc_id")
    base_full = (
        universe.where(~in_batch("doc_id"))
        .join(base, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("cluster_id", F.col("doc_id")).alias("supernode"),
        )
    )
    # batch docs are their own supernode; corpus docs contract to labels.
    # Persisted (same documented-exception class as `pairs`): sup_map feeds
    # THREE consumers (both delta-edge endpoint relabels and the final
    # label map-back) — unpersisted, the corpus components subtree above,
    # applyInPandas included, executed once per consumer. One row per doc
    # id (two longs), released with the session / bench cache clear.
    sup_map = base_full.unionByName(
        universe.where(in_batch("doc_id")).select(
            "doc_id", F.col("doc_id").alias("supernode")
        )
    ).persist()
    ma = sup_map.select(
        F.col("doc_id").alias("id_a"), F.col("supernode").alias("sup_a")
    )
    mb = sup_map.select(
        F.col("doc_id").alias("id_b"), F.col("supernode").alias("sup_b")
    )
    contracted = (
        delta_pairs.join(ma, "id_a")
        .join(mb, "id_b")
        .where(F.col("sup_a") != F.col("sup_b"))
        .select(
            F.col("sup_a").alias("row_order_a"),
            F.col("sup_b").alias("row_order_b"),
        )
    )
    merged = cluster_components_auto(contracted).select(
        F.col("row_order").alias("supernode"), F.col("cluster_id").alias("comp")
    )
    full = sup_map.join(merged, "supernode", "left").select(
        "doc_id",
        F.coalesce("comp", F.col("supernode")).alias("cluster_id"),
    )
    # Sizes + representative as ONE window pass (single shuffle by
    # cluster_id) — the former groupBy + join-back consumed `full` twice,
    # re-executing the whole assembly subtree per consumer.
    w = Window.partitionBy("cluster_id")
    return full.select(
        "doc_id",
        "cluster_id",
        F.count("*").over(w).cast("bigint").alias("cluster_size"),
        (F.col("doc_id") == F.min("doc_id").over(w)).alias(
            "is_representative"
        ),
    )
