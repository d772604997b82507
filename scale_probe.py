#!/usr/bin/env python
"""Empirical scale-up probe: measure the document-pipeline operators at
1x (sf0.1, 5k docs) vs a 10x corpus (50k docs) built by replicating the
driver's sf0.1 documents with perturbed copies, and report the observed
scaling exponent per query.

Why it exists: SCALE.md argues each operator's shuffle/candidate volume is
linear-ish in corpus size; this script MEASURES it. A query whose wall time
grows ~O(n) prints exponent ~1; a hidden quadratic prints ~2 and fails the
probe. The 10x corpus derives from the driver testdata (each copy i appends
a marker token and shifts doc_id by i * n), so near-dup structure grows
realistically: every original gains 9 planted near-duplicates.

Usage: python scale_probe.py  (writes /tmp/spark_graft_scale10, prints one
JSON line; results are recorded in SCALE.md "Measured scale-up").
"""

from __future__ import annotations

import json
import os
import shutil
import time

PROBES = [
    "doc_token_stats",          # scan-bound map
    "exact_dedup_documents",    # one hash shuffle
    "doc_tfidf_topterms",       # two shuffles + window
    "minhash_near_dup_pairs",   # banded LSH join
    "chunk_dedup_stats",        # explode + keep-first window
    "ngram_lm_counts",          # explode + window counts
    "bm25_retrieval_topk",      # broadcast query probe + score reduce
    "kn_doc_scores",            # bigram join against the LM pair table
    "length_bucket_batches",    # partitioned bucket-parallel global rank
    "textrank_keywords",        # 10 iterative broadcast-join rounds
    "positional_index",         # positional explode + posting reduce
    # round-6: the cluster-maintenance path — components over LSH pairs
    # (full) and the contracted-delta incremental variant (size-routed)
    "text_dedup_clusters",
    "incremental_cluster_update",
    # round-6 (late): the two remaining banded-candidate heavies.
    # Deliberately NOT probed: the exact-Jaccard family (ngram_jaccard,
    # doc_containment, clean_corpus, duplicate_substring_spans) — their
    # shingle/fingerprint equality joins cost Sum(df^2), and the planted
    # corpus grows every df 10x, i.e. the TRUE candidate mass grows ~100x
    # by construction; a high exponent there measures the planted dup
    # density, not a hidden algorithmic quadratic (the sketch tiers prove
    # the same pairs stay findable at ~linear cost).
    "media_near_dup_pairs",
    "fuzzy_benchmark_contamination",
    # round-8 (round-7 verdict #3): the round-7 additions. url mapping is a
    # pure regexp map; host stats one groupBy on host (source-derived, so
    # the 10x corpus grows each host group 10x — the skewed-host shape);
    # the two quality composites add a doc_id join + one window on top of
    # already-probed layers (text_dedup_clusters / doc_quality_scores).
    "url_canonical_mapping",
    "host_url_stats",
    "dedup_quality_representatives",
    "source_quality_percentiles",
    # round-8: the ExactSubstr removal transform — gram-dup core (already
    # probed via duplicate_substring_spans' family) + covered-position
    # distinct + (doc, pos) anti-join + per-doc reassembly
    "doc_substring_trimmed",
]
# round-6: the embeddings pipeline gets its own 10x probe (exact copies:
# each original gains 9 planted exact duplicates — same K10-family
# candidate growth the documents corpus plants)
EMB_PROBES = [
    "cosine_topk",                 # brute-force exact tier: linear scan
    "embedding_dedup_clusters",    # LSH bucket join -> verify -> components
    "semantic_dedup_embeddings",   # k-means cells -> in-cell dedup
]
# round-6 (late): the events pipeline too — 10x by replicating users
# (user_id shifted per copy, timestamps unchanged), i.e. MORE users with
# the same per-user history length: per-key session/funnel state stays
# bounded while key cardinality grows, which is exactly the claim the
# event operators make at 100 TB
EVENT_PROBES = [
    "user_sessions",               # sessionization: lag window per user
    "event_funnel",                # staged MIN aggs per user
    "event_transition_matrix",     # lag window -> pair counts
    "user_retention_cohorts",      # first-seen cohort x activity week join
    "value_outliers_mad",          # grouped median/MAD via percentile
    # round-8: the applyInPandasWithState dedup driven over the full replay
    # (state = one row per (user, event_type) key; the 10x corpus grows KEY
    # cardinality 10x with per-key history unchanged — the state-size claim)
    "streaming_stateful_first_events",
]

# Queries whose registered fn memoizes a per-(process, sf) side effect (the
# streaming replays cache their converged parquet): reset before EVERY timed
# run or the probe would measure a parquet re-scan, not the operator.
# Central hook shared with bench_full.py since round 9
# (queries_extras.reset_replay_memos).
def _reset_replays():
    from datafusion_dedup_ai_spark import queries_extras as QE

    QE.reset_replay_memos()


RESET_HOOKS = {
    "streaming_stateful_first_events": _reset_replays,
}
MAX_EXPONENT = 1.35  # fail the probe if wall time grows super-linearly


def build_scaled(spark, src_sf: str, dst: str, factor: int) -> None:
    from pyspark.sql import functions as F

    docs = spark.read.parquet(os.path.join(src_sf, "documents.parquet"))
    n = docs.count()
    out = None
    for i in range(factor):
        copy = docs.select(
            (F.col("doc_id") + F.lit(i * n)).alias("doc_id"),
            (
                F.col("text")
                if i == 0
                else F.concat(F.col("text"), F.lit(f" copymarker{i}"))
            ).alias("text"),
            "lang",
            "source",
            (F.length(F.col("text")) + (0 if i == 0 else len(f" copymarker{i}")))
            .cast("bigint")
            .alias("n_chars"),
        )
        out = copy if out is None else out.unionByName(copy)
    out.repartition(32).write.mode("overwrite").parquet(
        os.path.join(dst, "documents.parquet")
    )


def _marker_scaled_docs(spark, src_sf: str, dst: str, factor: int, marker_sql):
    """Copies with every SECOND word rewritten by ``marker_sql`` — token
    and shingle VOLUME are unchanged (appending markers instead would
    double both and conflate a 10x corpus with a 20x workload), while
    every original word-bigram gains a rewritten endpoint, pushing every
    copy past the J >= 0.5 verify threshold vs the original."""
    from pyspark.sql import functions as F

    docs = spark.read.parquet(os.path.join(src_sf, "documents.parquet"))
    n = docs.count()
    out = None
    for i in range(factor):
        if i == 0:
            text = F.col("text")
        else:
            text = F.expr(
                f"array_join(transform(split(text, ' '), "
                f"(x, idx) -> CASE WHEN idx % 2 = 1 THEN {marker_sql(i)} "
                f"ELSE x END), ' ')"
            )  # marker_sql may reference x (the word) and outer columns
        copy = docs.select(
            (F.col("doc_id") + F.lit(i * n)).alias("doc_id"),
            text.alias("text"),
            "lang",
            "source",
        ).withColumn("n_chars", F.length("text").cast("bigint"))
        out = copy if out is None else out.unionByName(copy)
    out.repartition(32).write.mode("overwrite").parquet(
        os.path.join(dst, "documents.parquet")
    )


def build_scaled_constdup(spark, src_sf: str, dst: str, factor: int) -> None:
    """CONSTANT-dup-rate 10x documents corpus (round-6 verdict #4): each
    copy i > 0 PREFIXES every second word with a copy-level tag — a
    bijective rewrite of the word-bigram shingle space, so within-copy
    pairwise Jaccard is EXACTLY preserved (the 1x corpus's intrinsic
    near-dup pairs exist once per copy: constant density, 10x true pairs)
    while every cross-stratum pair shares zero shingles (every bigram has
    a tagged endpoint, and tags differ per stratum / from the original).
    Token and shingle volume unchanged. This isolates the ALGORITHMIC
    exponent of the banded-LSH candidate path: output grows exactly 10x,
    ambient candidate mass does not grow at all. (The first cut of this
    corpus used per-DOC markers, which silently destroyed the intra-copy
    dups — pairs stayed 256 at 10x, making the probe vacuously linear;
    the copy-level bijection is the honest construction.)"""
    _marker_scaled_docs(
        spark, src_sf, dst, factor, lambda i: f"concat('zq{i}', x)"
    )


def build_scaled_templated(spark, src_sf: str, dst: str, factor: int) -> None:
    """ADVERSARIAL ambient-similarity 10x corpus: every copy-i document
    replaces every second word with the SAME copy-wide marker — a stand-in
    for boilerplate-heavy corpora (site templates, license headers) where
    large document strata share moderate shingle overlap without being
    near-dups. Any two copy-i documents then share every (w, marker) /
    (marker, w) shingle for their common words w, pushing ambient pairwise
    Jaccard into the LSH banding's catch range while staying below the
    J >= 0.5 verify threshold: the 16x4 banding admits Theta(sum over
    pairs of catch(J_pair)) candidates that all FAIL verification — LSH's
    documented boilerplate failure mode, NOT a plan defect (the
    per-doc-marker corpus above measures the same code at ~linear). The
    mitigation is the max_df hot-shingle guard, whose effect the probe
    measures alongside (minhash_near_dup_pairs@templated vs
    @templated_maxdf)."""
    _marker_scaled_docs(
        spark, src_sf, dst, factor, lambda i: f"'zqmark{i}z'"
    )


def build_scaled_embeddings(spark, src_sf: str, dst: str, factor: int) -> None:
    from pyspark.sql import functions as F

    emb = spark.read.parquet(os.path.join(src_sf, "embeddings.parquet"))
    n = emb.count()
    out = None
    for i in range(factor):
        copy = emb.select(
            (F.col("vec_id") + F.lit(i * n)).alias("vec_id"),
            "embedding",
            "label",
        )
        out = copy if out is None else out.unionByName(copy)
    out.repartition(32).write.mode("overwrite").parquet(
        os.path.join(dst, "embeddings.parquet")
    )


def build_scaled_events(spark, src_sf: str, dst: str, factor: int) -> None:
    from pyspark.sql import functions as F

    ev = spark.read.parquet(os.path.join(src_sf, "events.parquet"))
    n_events = ev.count()
    n_users = ev.agg(F.countDistinct("user_id")).collect()[0][0]
    out = None
    for i in range(factor):
        copy = ev.select(
            (F.col("event_id") + F.lit(i * n_events)).alias("event_id"),
            "ts",
            (F.col("user_id") + F.lit(i * n_users)).alias("user_id"),
            "event_type",
            "value",
            "props",
        )
        out = copy if out is None else out.unionByName(copy)
    out.repartition(32).write.mode("overwrite").parquet(
        os.path.join(dst, "events.parquet")
    )


def time_adaptive_index_match(spark, sf_dir: str, tag: str) -> float:
    """Round-6 verdict #3 'done' check: a vector index built with DEFAULTS
    (n_bits=None -> corpus-adaptive width, recorded in the sidecar) must
    keep the bucket-join match path linear-ish at 10x — the fixed 4-bit
    default was the geometry the round-6 probe measured as exponent 1.43.
    Build (fresh each call, defaults only) + incremental match of the 20%
    batch against the 80% corpus index, timed end to end."""
    import tempfile

    from pyspark.sql import functions as F

    from datafusion_dedup_ai_spark.operators import vector_index as VI

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    spark.catalog.clearCache()
    spark.sparkContext._jvm.System.gc()
    time.sleep(1.0)
    path = os.path.join(tempfile.gettempdir(), f"spark_graft_vidx_{tag}")
    if os.path.isdir(path):
        shutil.rmtree(path)
    t0 = time.time()
    VI.build_vector_index(emb.where(F.expr("vec_id % 10 < 8")), path)
    VI.incremental_semantic_matches_indexed(
        spark, path, emb.where(F.expr("vec_id % 10 >= 8")), threshold=0.35
    ).count()
    dt = time.time() - t0
    shutil.rmtree(path, ignore_errors=True)
    return dt


def time_query(qs, name, spark, sf_dir) -> float:
    """One steady-state UNCACHED measurement — clear the cache and drain
    the cleaner before timing, exactly like bench.py. Without the clear,
    the 1x timed runs silently hit the warm run's internal persists (the
    CacheManager matches by analyzed plan across separate query() calls)
    while the single 10x run executed cold in a session whose storage
    memory held every earlier probe's never-released caches — observed as
    a 3x inflation of the 10x wall time (80s vs 28s for
    text_dedup_clusters) and therefore of the exponent."""
    spark.catalog.clearCache()
    spark.sparkContext._jvm.System.gc()
    time.sleep(1.0)
    if name in RESET_HOOKS:
        RESET_HOOKS[name]()
    t0 = time.time()
    qs[name](spark, sf_dir).count()
    return time.time() - t0


def main() -> None:
    import math

    import __spark_entry__ as entry_mod
    from datafusion_dedup_ai_spark.session import build_session

    src = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    dst = "/tmp/spark_graft_scale10"
    dst_const = "/tmp/spark_graft_scale10_constdup"
    factor = 10
    spark = build_session(app_name="scale-probe")
    if os.path.isdir(dst):
        shutil.rmtree(dst)
    if os.path.isdir(dst_const):
        shutil.rmtree(dst_const)
    build_scaled(spark, src, dst, factor)
    build_scaled_constdup(spark, src, dst_const, factor)
    build_scaled_embeddings(spark, src, dst, factor)
    build_scaled_events(spark, src, dst, factor)

    qs = entry_mod.queries()
    report = {}
    ok = True
    for name in PROBES + EMB_PROBES + EVENT_PROBES:
        # warm BOTH shapes (codegen, Python workers, AQE stats) before
        # timing, so t1 and t10 measure the same steady-uncached regime
        time_query(qs, name, spark, src)
        time_query(qs, name, spark, dst)
        t1 = min(time_query(qs, name, spark, src) for _ in range(2))
        t10 = min(time_query(qs, name, spark, dst) for _ in range(2))
        exponent = math.log(max(t10, 1e-6) / max(t1, 1e-6)) / math.log(factor)
        report[name] = {
            "t_1x_s": round(t1, 3),
            "t_10x_s": round(t10, 3),
            "exponent": round(exponent, 3),
        }
        ok = ok and exponent <= MAX_EXPONENT

    # Constant-dup-rate minhash variant (verdict #4): the planted-near-dup
    # corpus grows TRUE pair output ~45x, so minhash's 0.87-1.03 exponent
    # there measures data density; this corpus holds pair density constant
    # and measures the candidate machinery alone.
    def probe_minhash(name, sf10_dir, max_df, gate):
        nonlocal ok

        def one(sf_dir):
            from pyspark.sql import functions as F

            from datafusion_dedup_ai_spark.functions import text as T
            from datafusion_dedup_ai_spark.operators import dedup as D

            spark.catalog.clearCache()
            spark.sparkContext._jvm.System.gc()
            time.sleep(1.0)
            docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
            sh = docs.select(
                "doc_id", T.distinct_shingles(F.col("text")).alias("shingles")
            )
            t0 = time.time()
            D.minhash_near_dup_pairs(sh, threshold=0.5, max_df=max_df).count()
            return time.time() - t0

        one(src)
        one(sf10_dir)
        t1 = min(one(src) for _ in range(2))
        t10 = min(one(sf10_dir) for _ in range(2))
        exponent = math.log(max(t10, 1e-6) / max(t1, 1e-6)) / math.log(factor)
        report[name] = {
            "t_1x_s": round(t1, 3),
            "t_10x_s": round(t10, 3),
            "exponent": round(exponent, 3),
            "gated": gate,
        }
        if gate:
            ok = ok and exponent <= MAX_EXPONENT

    probe_minhash("minhash_near_dup_pairs@constdup", dst_const, None, True)
    # Templated-boilerplate stress PAIR: the default config's documented
    # failure mode (ambient-Jaccard candidate mass — expected superlinear,
    # excluded from the gate) and the max_df guard that restores the
    # exponent (gated).
    dst_tmpl = "/tmp/spark_graft_scale10_templated"
    if os.path.isdir(dst_tmpl):
        shutil.rmtree(dst_tmpl)
    build_scaled_templated(spark, src, dst_tmpl, factor)
    probe_minhash("minhash_near_dup_pairs@templated", dst_tmpl, None, False)
    probe_minhash(
        "minhash_near_dup_pairs@templated_maxdf", dst_tmpl, 0.05, True
    )

    # Round-8 (round-7 verdict #3): phonetic blocking's within-code
    # quadratic. soundex has only ~9k effective codes, so distinct-token
    # vocabulary growth (Heaps' law on a growing corpus) grows per-code
    # buckets linearly and pair OUTPUT quadratically — an output property
    # of the operator (every within-code pair IS the result), same class
    # as @templated, not a hidden plan defect. The registered query's part
    # vocabulary is 23 tokens (floor-bound), so the probe drives the
    # OPERATOR on a synthetic consonant vocabulary with a realistic code
    # spread (V -> 10V distinct tokens) and forces the JW scoring via an
    # aggregate over jw so candidate volume dominates the wall. Unguarded
    # documents the expected superlinear pair growth (ungated, like
    # @templated); the max_bucket_size fuse added this round must hold the
    # wall-time exponent (gated).
    def probe_phonetic(name, v1, max_bucket_size, gate):
        nonlocal ok
        from pyspark.sql import functions as F

        from datafusion_dedup_ai_spark.queries_dedup import (
            phonetic_pairs_from_freq,
        )

        tok = " || ".join(
            "substr('BCDFGHJKLMNPQRSTVWXZ', "
            f"cast(pmod(xxhash64(id, {p}), 20) as int) + 1, 1)"
            for p in range(7)
        )

        def one(v):
            spark.catalog.clearCache()
            spark.sparkContext._jvm.System.gc()
            time.sleep(1.0)
            freq = (
                spark.range(v)
                .selectExpr(f"({tok}) AS tok", "cast(1 + id % 5 AS bigint) AS cnt")
                .groupBy("tok")
                .agg(F.max("cnt").alias("cnt"))
            )
            t0 = time.time()
            row = (
                phonetic_pairs_from_freq(freq, max_bucket_size=max_bucket_size)
                .agg(F.count("*").alias("n"), F.sum("jw").alias("s"))
                .collect()[0]
            )
            return time.time() - t0, row["n"]

        one(v1)
        one(v1 * factor)
        (t1, n1) = min(one(v1) for _ in range(2))
        (t10, n10) = min(one(v1 * factor) for _ in range(2))
        exponent = math.log(max(t10, 1e-6) / max(t1, 1e-6)) / math.log(factor)
        report[name] = {
            "t_1x_s": round(t1, 3),
            "t_10x_s": round(t10, 3),
            "exponent": round(exponent, 3),
            "pairs_1x": n1,
            "pairs_10x": n10,
            "gated": gate,
        }
        if gate:
            ok = ok and exponent <= MAX_EXPONENT

    probe_phonetic("phonetic_vocab_pairs@unguarded", 10_000, None, False)
    probe_phonetic("phonetic_vocab_pairs@guarded16", 10_000, 16, True)

    # Adaptive-default index build + match (verdict #3 'done' check)
    name = "vector_index_adaptive_build_match"
    time_adaptive_index_match(spark, src, "warm1")
    time_adaptive_index_match(spark, dst, "warm10")
    t1 = min(time_adaptive_index_match(spark, src, "t1") for _ in range(2))
    t10 = min(time_adaptive_index_match(spark, dst, "t10") for _ in range(2))
    exponent = math.log(max(t10, 1e-6) / max(t1, 1e-6)) / math.log(factor)
    report[name] = {
        "t_1x_s": round(t1, 3),
        "t_10x_s": round(t10, 3),
        "exponent": round(exponent, 3),
    }
    ok = ok and exponent <= MAX_EXPONENT
    print(
        json.dumps(
            {
                "metric": "scale_probe_10x",
                "factor": factor,
                "max_exponent": MAX_EXPONENT,
                "all_linearish": ok,
                "queries": report,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
