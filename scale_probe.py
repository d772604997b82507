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
import sys
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
    # round-9: tokenizer APPLY (verdict task 8's probe row). The Python
    # encode runs on DISTINCT words only (Heaps-law-small), corpus-sized
    # work is one explode + broadcast join + partial-agg groupBy; the
    # frozen piece fixture materializes once per corpus in the warm run,
    # so timed runs price the apply path the query claims is vocab-bound.
    "tokenized_length_stats",
    # round-9: html visible-text extraction — one regexp projection over
    # the scan (no shuffle, no UDF); the probe pins the scan-speed claim.
    "html_text_extraction",
    # round-10 (r9 verdict #3): simhash fingerprints — explode + 64
    # partial-agg bit votes, one shuffle on doc_id; the missing probe row
    # for the one headline query without one. (simhash_near_pairs stays
    # deliberately unprobed with the exact-Jaccard family above: its
    # chunk-equality candidates grow with the planted true-pair mass.)
    "simhash_fingerprints",
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

# Dedicated gate for the tau=0.8 embedding-cluster machinery (round-11
# verdict #4): the probe-wide 1.35 is a quadratic-catcher, not the claim —
# the claim is candidate machinery LINEAR IN ITS WORK UNIT. The verdict
# sketched a ~1.05 wall-slope bound on the assumption (round-10/11) that
# the dithered width makes DISTINCT candidate mass linear in N; the
# round-12 3-point measurement disproves that assumption on the embconst
# geometry: candidates 11.74M -> 38.14M -> 147.24M over 10x/30x/100x — a
# fitted mass slope of ~1.10 — because the dither linearizes EXPECTED
# (pair, table) collision incidences while the distinct-pair count and
# the bucket-load second moment still drift with width on correlated
# vectors. A wall-slope<=1.05 gate is therefore unachievable by ANY
# implementation of this candidate generator on this corpus (the wall
# cannot grow slower than the candidates it must verify), and gating on
# it would measure the workload, not the machinery — exactly why the
# sibling rows (tau=0.35 per-edge, planted minhash per-pair) gate
# per-unit cost. The dedicated gate is therefore: fitted WALL slope may
# exceed the fitted CANDIDATE-MASS slope by at most this excess (plus the
# per-1k-candidate cost band, unchanged). The raw fitted wall slope stays
# in the row so the unnormalized number is never hidden. A 3-point fit
# over a decade-and-a-half absorbs the denominator noise that made the
# two committed 2-point exponents disagree (1.027 vs 1.211 on a ~10s
# base).
EDC_TAU08_MAX_SLOPE_EXCESS = 0.10


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


def build_scaled_embeddings_constdup(
    spark, src_sf: str, dst: str, factor: int
) -> None:
    """Density-controlled embeddings corpus (round-9 verdict #6): copy i > 0
    multiplies each vector by a copy-specific deterministic SIGN-FLIP mask.
    A sign flip per dimension is an orthogonal transform, so WITHIN-copy
    cosines are preserved exactly (the 1x corpus's intrinsic near-pairs
    exist once per copy: true output grows exactly linearly), while any
    cross-copy pair's cosine is a +-mixed dot whose magnitude concentrates
    near zero at these dimensions — far below the dedup taus, so ambient
    candidate mass stays flat. The embedding analog of
    build_scaled_constdup's bijective shingle rewrite."""
    from pyspark.sql import functions as F

    emb = spark.read.parquet(os.path.join(src_sf, "embeddings.parquet"))
    n = emb.count()

    def _flip(i):
        # closure, not a default arg: transform inspects the lambda's arity
        return lambda x, j: F.when(
            F.pmod(F.xxhash64(F.lit(i), j), F.lit(2)) == 0, x
        ).otherwise(-x)

    out = None
    for i in range(factor):
        flipped = (
            F.col("embedding") if i == 0 else F.transform(F.col("embedding"), _flip(i))
        )
        copy = emb.select(
            (F.col("vec_id") + F.lit(i * n)).alias("vec_id"),
            flipped.alias("embedding"),
            "label",
        )
        out = copy if out is None else out.unionByName(copy)
    out.repartition(32).write.mode("overwrite").parquet(
        os.path.join(dst, "embeddings.parquet")
    )


def build_widened_embeddings(
    spark, src_dir: str, dst: str, replicas: int = 4
) -> None:
    """Production-width embeddings from an existing (constdup-scaled) dim-64
    corpus (round-10 verdict #7 — the SQ8 prescreen's payload claim is about
    dim >= ~256, unmeasured at that width on this testdata): tile each
    vector ``replicas`` times, replica r > 0 under a replica-specific
    deterministic sign mask. A shared-per-replica sign mask is an orthogonal
    transform applied to BOTH sides of every pair, so each replica's dot
    equals the base dot and the widened cosine equals the dim-64 cosine
    EXACTLY — same pair structure, same candidate mass, 4x the payload and
    fold work. Composes with build_scaled_embeddings_constdup's copy flips
    (both are diagonal +-1 maps on the base dims)."""
    from pyspark.sql import functions as F

    emb = spark.read.parquet(os.path.join(src_dir, "embeddings.parquet"))

    def _mask(r):
        return lambda x, j: F.when(
            F.pmod(F.xxhash64(F.lit(7000 + r), j), F.lit(2)) == 0, x
        ).otherwise(-x)

    reps = [F.col("embedding")] + [
        F.transform(F.col("embedding"), _mask(r)) for r in range(1, replicas)
    ]
    emb.select(
        "vec_id", F.concat(*reps).alias("embedding"), "label"
    ).repartition(32).write.mode("overwrite").parquet(
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


def build_scaled_zipf_hosts(spark, src_sf: str, dst: str, factor: int) -> None:
    """Zipf-skew 10x documents corpus for the HOST-keyed operators (round-9
    verdict #7): identical rows to build_scaled's uniform corpus except
    copies i > 0 overwrite ``source`` with one hot value, so ~90% of rows
    canonicalize into a single host group — the one-site-dominates-the-crawl
    shape a real 100 TB url table always has."""
    from pyspark.sql import functions as F

    docs = spark.read.parquet(os.path.join(src_sf, "documents.parquet"))
    n = docs.count()
    out = None
    for i in range(factor):
        copy = docs.select(
            (F.col("doc_id") + F.lit(i * n)).alias("doc_id"),
            "text",
            "lang",
            (F.col("source") if i == 0 else F.lit("zipfhot")).alias("source"),
            "n_chars",
        )
        out = copy if out is None else out.unionByName(copy)
    out.repartition(32).write.mode("overwrite").parquet(
        os.path.join(dst, "documents.parquet")
    )


def probe_host_skew(spark, qs, dst_uniform: str, dst_zipf: str, report) -> bool:
    """host_url_stats on the one-hot-host corpus vs the uniform 10x corpus
    (same row count): the host groupBy partial-aggregates map-side (and the
    countDistinct expands to a two-phase (host, url) aggregate), so one mega
    host group must NOT serialize into a straggler reduce task. Gated on the
    skew/uniform wall RATIO (<= 2.0) rather than an exponent — the corpora
    are the same size; only the key distribution differs."""

    def one(sf_dir):
        return time_query(qs, "host_url_stats", spark, sf_dir)

    one(dst_uniform)
    one(dst_zipf)
    t_u = min(one(dst_uniform) for _ in range(2))
    t_z = min(one(dst_zipf) for _ in range(2))
    ratio = t_z / max(t_u, 1e-6)
    report["host_url_stats@zipfhost"] = {
        "t_uniform10x_s": round(t_u, 3),
        "t_zipf10x_s": round(t_z, 3),
        "skew_ratio": round(ratio, 3),
        "gated": True,
    }
    return ratio <= 2.0


# The session's skew-split byte thresholds (session.py: 32m/8m via
# SPARK_GRAFT_SKEW_*) are sized to the bench corpus's task granularity; the
# mega-block probe's hot shuffle partition holds ~100k short strings that
# lz4 compresses to tens of KB (AQE sizes partitions by COMPRESSED map
# output), so the probe scales the thresholds down in proportion — a real
# deployment sizes them to executor memory, and the MECHANISM (AQE
# OptimizeSkewedJoin splitting the hot block's SMJ partition, `skew=true`
# in the executed plan) is what's under probe. Broadcast is disabled
# because the probe name table is KB-sized while the 100 TB name table
# this models is not: SMJ is the physical join whose skew behavior matters.
_SKEW_PROBE_CONFS = {
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "32768",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16384",
    "spark.sql.autoBroadcastJoinThreshold": "-1",
}


def megablock_candidate_agg(spark, v: int, cap):
    """The J1 candidate self-join + JVM Levenshtein scoring over a Zipf
    name table: 10% of v rows share the first token MEGACORP (one block —
    the prefix refinement is a NO-OP on it, every member agrees on the
    first 8 base chars), the rest are singleton blocks. Returns the
    aggregate DataFrame; pair count is output-quadratic in the hot block
    unless ``cap`` (DedupConfig.max_block_size) hash-salts it."""
    from pyspark.sql import functions as F

    from datafusion_dedup_ai_spark.config import DedupConfig
    from datafusion_dedup_ai_spark.operators.blocking import (
        candidate_pairs,
        prepare_names,
    )

    names = spark.range(v).selectExpr(
        "id",
        "CASE WHEN id % 10 = 0 THEN "
        "concat('MEGACORP ', lpad(cast(id AS string), 8, '0')) "
        "ELSE concat('UNIQ', lpad(cast(id AS string), 8, '0'), "
        "' WHOLESALE') END AS name",
    )
    prepared = prepare_names(
        names, "name", DedupConfig(max_block_size=cap), order_col="id"
    )
    pairs = candidate_pairs(prepared)
    lev = F.levenshtein(F.col("base_a"), F.col("base_b"))
    denom = F.greatest(F.length("base_a"), F.length("base_b"), F.lit(1))
    return pairs.agg(
        F.count("*").alias("n"),
        F.sum(F.lit(1.0) - lev.cast("double") / denom).alias("s"),
    )


def probe_megablock(spark, factor: int, report) -> bool:
    """Mega-block skew probe (round-9 verdict #7): drive the dedup
    candidate join with one hot block_key and record (a) whether AQE's
    skew-join split fires on the hot SMJ partition (executed-plan marker)
    and (b) that the max_block_size hash-salt guard holds the wall-time
    exponent. Unguarded is OUTPUT-quadratic by construction (hot-block
    pairs grow factor^2) — recorded ungated with pair counts, like
    @templated and phonetic@unguarded."""
    import math

    def one(v, cap):
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()
        time.sleep(1.0)
        agg = megablock_candidate_agg(spark, v, cap)
        t0 = time.time()
        row = agg.collect()[0]
        dt = time.time() - t0
        plan = agg._jdf.queryExecution().executedPlan().toString()
        fired = ("skew=true" in plan) or ("skewed" in plan)
        return dt, row["n"], fired

    v1 = 10_000
    ok = True
    prev = {k: spark.conf.get(k, None) for k in _SKEW_PROBE_CONFS}
    for k, v in _SKEW_PROBE_CONFS.items():
        spark.conf.set(k, v)
    try:
        for tag, cap, gate in [("unguarded", None, False), ("guarded64", 64, True)]:
            one(v1, cap)
            one(v1 * factor, cap)
            t1, n1, _ = min((one(v1, cap) for _ in range(2)), key=lambda x: x[0])
            t10, n10, fired = min(
                (one(v1 * factor, cap) for _ in range(2)), key=lambda x: x[0]
            )
            exponent = math.log(max(t10, 1e-6) / max(t1, 1e-6)) / math.log(factor)
            report[f"megablock_candidate_pairs@{tag}"] = {
                "t_1x_s": round(t1, 3),
                "t_10x_s": round(t10, 3),
                "exponent": round(exponent, 3),
                "pairs_1x": n1,
                "pairs_10x": n10,
                "aqe_skew_split_10x": fired,
                "gated": gate,
            }
            if gate:
                ok = ok and exponent <= MAX_EXPONENT
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    return ok


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
    import argparse
    import math

    import __spark_entry__ as entry_mod
    from datafusion_dedup_ai_spark.session import build_session

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument(
        "--only",
        default=None,
        help="comma-separated probe/report names — iteration aid; the "
        "committed SCALE_PROBE.json comes from a full no-args run",
    )
    ap.add_argument(
        "--x100",
        action="store_true",
        help="run the deep 100x probes instead (prints the SCALE100.json "
        "line; round-9 verdict #4)",
    )
    args = ap.parse_args()
    if args.x100:
        main_x100(set(args.only.split(",")) if args.only else None)
        return
    only = set(args.only.split(",")) if args.only else None

    def want(name: str) -> bool:
        return only is None or name in only

    src = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    dst = "/tmp/spark_graft_scale10"
    dst_const = "/tmp/spark_graft_scale10_constdup"
    dst_zipf = "/tmp/spark_graft_scale10_zipfhosts"
    factor = 10
    spark = build_session(app_name="scale-probe")
    if os.path.isdir(dst):
        shutil.rmtree(dst)
    if os.path.isdir(dst_const):
        shutil.rmtree(dst_const)
    build_scaled(spark, src, dst, factor)
    if want("minhash_near_dup_pairs@constdup"):
        build_scaled_constdup(spark, src, dst_const, factor)
    build_scaled_embeddings(spark, src, dst, factor)
    build_scaled_events(spark, src, dst, factor)

    qs = entry_mod.queries()
    report = {}
    ok = True
    for name in [n for n in PROBES + EMB_PROBES + EVENT_PROBES if want(n)]:
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

    if want("minhash_near_dup_pairs@constdup"):
        probe_minhash("minhash_near_dup_pairs@constdup", dst_const, None, True)
    # Templated-boilerplate stress PAIR: the default config's documented
    # failure mode (ambient-Jaccard candidate mass — expected superlinear,
    # excluded from the gate) and the max_df guard that restores the
    # exponent (gated).
    dst_tmpl = "/tmp/spark_graft_scale10_templated"
    if want("minhash_near_dup_pairs@templated") or want(
        "minhash_near_dup_pairs@templated_maxdf"
    ):
        if os.path.isdir(dst_tmpl):
            shutil.rmtree(dst_tmpl)
        build_scaled_templated(spark, src, dst_tmpl, factor)
    if want("minhash_near_dup_pairs@templated"):
        probe_minhash("minhash_near_dup_pairs@templated", dst_tmpl, None, False)
    if want("minhash_near_dup_pairs@templated_maxdf"):
        probe_minhash(
            "minhash_near_dup_pairs@templated_maxdf", dst_tmpl, 0.05, True
        )

    # Round-9 (round-8 verdict #7): deliberate Zipf-skew probes — one hot
    # host for the host-keyed groupBy, one mega block for the dedup
    # candidate join (with the AQE skew-split observation and the
    # hash-salt guard added to blocking.py this round).
    if want("host_url_stats@zipfhost"):
        if os.path.isdir(dst_zipf):
            shutil.rmtree(dst_zipf)
        build_scaled_zipf_hosts(spark, src, dst_zipf, factor)
        ok = probe_host_skew(spark, qs, dst, dst_zipf, report) and ok
    if want("megablock_candidate_pairs@unguarded") or want(
        "megablock_candidate_pairs@guarded64"
    ):
        ok = probe_megablock(spark, factor, report) and ok

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

    if want("phonetic_vocab_pairs@unguarded"):
        probe_phonetic("phonetic_vocab_pairs@unguarded", 10_000, None, False)
    if want("phonetic_vocab_pairs@guarded16"):
        probe_phonetic("phonetic_vocab_pairs@guarded16", 10_000, 16, True)

    # Adaptive-default index build + match (verdict #3 'done' check)
    name = "vector_index_adaptive_build_match"
    if want(name):
        time_adaptive_index_match(spark, src, "warm1")
        time_adaptive_index_match(spark, dst, "warm10")
        t1 = min(time_adaptive_index_match(spark, src, "t1") for _ in range(2))
        t10 = min(
            time_adaptive_index_match(spark, dst, "t10") for _ in range(2)
        )
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


def main_x100(only: set | None = None) -> None:
    """Deep 100x spot-check (round-8 verdict #4) for the two steepest gated
    10x exponents — minhash_near_dup_pairs (0.874) and
    incremental_cluster_update (0.863) — to rule out hidden log factors.
    Two corpus families:

    * constdup (factor 100): the density-controlled construction — within-
      copy near-dup pairs are bijectively preserved per stratum, so TRUE
      pair output grows exactly linearly and the measured 10x->100x wall
      exponent isolates the candidate machinery. GATED on the exponent.
    * planted (build_scaled — the verdict's literal corpus): every original
      gains factor-1 near-dup copies, so TRUE pair output grows
      ~C(factor,2) BY CONSTRUCTION. At planted-100x that is ~24.75M
      verified pairs whose verify join carries two shingle payloads per
      candidate — ~70+ GB of shuffle spill, which EXCEEDED this box's disk
      (the first x100 attempt died on ENOSPC in the verify stage; the
      failure is recorded in the output as evidence of the corpus's
      output mass, not of operator work). The planted row therefore runs
      10x -> 30x (pair output still grows ~9.7x vs the 10x corpus) and
      gates on PER-OUTPUT-PAIR cost (t/pairs at 30x within 2x of 10x);
      the 100x gate is carried by the density-controlled constdup rows.

    Round-10 additions: (4) the TWO-PHASE verify on the planted corpus at
    the full 10x -> 100x — the run whose all-exact form hit ENOSPC —
    gated on per-output-pair cost and on completing at all; (5, 6) the
    embedding lane (semantic_dedup_embeddings, embedding_dedup_clusters)
    at a density-controlled 10x -> 100x built by per-copy sign-flip masks
    (build_scaled_embeddings_constdup), gated on the wall exponent.

    Per-phase results flush to stderr as they land (a late-phase failure
    must not lose the earlier measurements — the ENOSPC lesson); the final
    stdout line is committed as SCALE100.json and summarized in SCALE.md.
    """
    import math

    import __spark_entry__ as entry_mod
    from pyspark.sql import functions as F

    from datafusion_dedup_ai_spark.functions import text as T
    from datafusion_dedup_ai_spark.operators import dedup as D
    from datafusion_dedup_ai_spark.session import build_session

    src = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    d10 = "/tmp/spark_graft_scale10"
    d30 = "/tmp/spark_graft_scale30"
    d100 = "/tmp/spark_graft_scale100"
    c10 = "/tmp/spark_graft_scale10_constdup"
    c100 = "/tmp/spark_graft_scale100_constdup"
    e10 = "/tmp/spark_graft_scale10_embconst"
    e30 = "/tmp/spark_graft_scale30_embconst"
    e100 = "/tmp/spark_graft_scale100_embconst"
    # ``only`` (--only phase,phase): rerun a subset of phases and MERGE
    # into the committed SCALE100.json — untouched phases keep their prior
    # rows; the merged artifact re-derives all_linearish from every row's
    # own gate (see _row_ok). Corpus builds run only for needed phases.
    def want_phase(name: str) -> bool:
        return only is None or any(tag in name for tag in only)

    w100 = "/tmp/spark_graft_scale100_embwide"
    # build only the corpora the selected phases consume (the constdup
    # docs build alone is minutes of wall the planted-only phases never
    # read)
    need_planted = any(
        want_phase(p)
        for p in ("minhash_planted30", "two_phase_planted100", "curate100")
    )
    need_constdup = want_phase("minhash_constdup") or want_phase(
        "incremental_constdup"
    )
    need_wide = want_phase("sq8wide")
    need_emb = want_phase("semantic") or want_phase("edc") or need_wide
    # the 30x midpoint exists only for the edc 3-point fit
    need_e30 = want_phase("edc")

    spark = build_session(app_name="scale-probe-100x")
    doc_dirs = ((d10, d30, d100) if need_planted else ()) + (
        (c10, c100) if need_constdup else ()
    )
    emb_dirs = ((e10, e100) if need_emb else ()) + ((e30,) if need_e30 else ())
    wide_dirs = (w100,) if need_wide else ()
    for d in doc_dirs + emb_dirs + wide_dirs:
        if os.path.isdir(d):
            shutil.rmtree(d)
    if need_planted:
        build_scaled(spark, src, d10, 10)
        build_scaled(spark, src, d30, 30)
        build_scaled(spark, src, d100, 100)
    if need_constdup:
        build_scaled_constdup(spark, src, c10, 10)
        build_scaled_constdup(spark, src, c100, 100)
    if need_emb:
        build_scaled_embeddings_constdup(spark, src, e10, 10)
        build_scaled_embeddings_constdup(spark, src, e100, 100)
    if need_e30:
        build_scaled_embeddings_constdup(spark, src, e30, 30)
    if need_wide:
        build_widened_embeddings(spark, e100, w100, replicas=4)

    qs = entry_mod.queries()
    report = {}
    ok = True

    def clear():
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()
        time.sleep(1.0)

    def minhash_once(sf_dir):
        clear()
        docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        sh = docs.select(
            "doc_id", T.distinct_shingles(F.col("text")).alias("shingles")
        )
        t0 = time.time()
        n = D.minhash_near_dup_pairs(sh, threshold=0.5).count()
        return time.time() - t0, n

    def incr_once(sf_dir):
        clear()
        t0 = time.time()
        n = qs["incremental_cluster_update"](spark, sf_dir).count()
        return time.time() - t0, n

    def best(fn, sf_dir, runs):
        fn(sf_dir)  # warm: codegen, Python workers, AQE stats
        return min((fn(sf_dir) for _ in range(runs)), key=lambda x: x[0])

    def flush_phase(name):
        print(f"phase done: {name} -> {report[name]}", file=sys.stderr, flush=True)

    if want_phase("minhash_constdup"):
        # 1) minhash, density-controlled: gate the 10x->100x wall exponent
        t10, n10 = best(minhash_once, c10, 2)
        t100, n100 = best(minhash_once, c100, 2)
        exp = math.log(max(t100, 1e-6) / max(t10, 1e-6)) / math.log(10)
        report["minhash_near_dup_pairs@constdup_10x_to_100x"] = {
            "t_10x_s": round(t10, 3),
            "t_100x_s": round(t100, 3),
            "exponent": round(exp, 3),
            "pairs_10x": n10,
            "pairs_100x": n100,
            "gated": True,
        }
        ok = ok and exp <= MAX_EXPONENT
        flush_phase("minhash_near_dup_pairs@constdup_10x_to_100x")

    if want_phase("incremental_constdup"):
        # 2) incremental maintenance, density-controlled: same gate
        t10, n10 = best(incr_once, c10, 2)
        t100, n100 = best(incr_once, c100, 2)
        exp = math.log(max(t100, 1e-6) / max(t10, 1e-6)) / math.log(10)
        report["incremental_cluster_update@constdup_10x_to_100x"] = {
            "t_10x_s": round(t10, 3),
            "t_100x_s": round(t100, 3),
            "exponent": round(exp, 3),
            "rows_10x": n10,
            "rows_100x": n100,
            "gated": True,
        }
        ok = ok and exp <= MAX_EXPONENT
        flush_phase("incremental_cluster_update@constdup_10x_to_100x")

    if want_phase("minhash_planted30"):
        # 3) minhash, planted 10x -> 30x: output grows ~9.7x by construction —
        # gate the per-output-pair cost, record the wall exponent ungated
        t10, n10 = best(minhash_once, d10, 2)
        t30, n30 = best(minhash_once, d30, 2)
        exp = math.log(max(t30, 1e-6) / max(t10, 1e-6)) / math.log(3)
        cost10 = t10 / max(n10, 1)
        cost30 = t30 / max(n30, 1)
        report["minhash_near_dup_pairs@planted_10x_to_30x"] = {
            "t_10x_s": round(t10, 3),
            "t_30x_s": round(t30, 3),
            "wall_exponent_ungated": round(exp, 3),
            "pairs_10x": n10,
            "pairs_30x": n30,
            "s_per_1k_pairs_10x": round(1000 * cost10, 4),
            "s_per_1k_pairs_30x": round(1000 * cost30, 4),
            "gated": "per_pair_cost",
        }
        ok = ok and cost30 <= 2.0 * cost10
        flush_phase("minhash_near_dup_pairs@planted_10x_to_30x")

    if want_phase("two_phase_planted100"):
        # 4) TWO-PHASE verify at planted 10x -> 100x (round-9 verdict #2: the
        # all-exact verify died on disk here — ~24.75M true pairs x two full
        # shingle payloads. The signature-screened path never fetches payloads
        # for clear-accept mass, so the same corpus must now COMPLETE within
        # the box's disk). Output grows ~C(factor,2): gate per-output-pair cost.
        def two_phase_once(sf_dir):
            clear()
            docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
            sh = docs.select(
                "doc_id", T.distinct_shingles(F.col("text")).alias("shingles")
            )
            t0 = time.time()
            n = D.minhash_near_dup_pairs_two_phase(sh, threshold=0.5).count()
            return time.time() - t0, n

        t10, n10 = best(two_phase_once, d10, 2)
        t100, n100 = min((two_phase_once(d100) for _ in range(2)), key=lambda x: x[0])
        cost10 = t10 / max(n10, 1)
        cost100 = t100 / max(n100, 1)
        report["minhash_two_phase_pairs@planted_10x_to_100x"] = {
            "t_10x_s": round(t10, 3),
            "t_100x_s": round(t100, 3),
            "pairs_10x": n10,
            "pairs_100x": n100,
            "s_per_1k_pairs_10x": round(1000 * cost10, 4),
            "s_per_1k_pairs_100x": round(1000 * cost100, 4),
            "completed_within_disk": True,
            "gated": "per_pair_cost",
        }
        ok = ok and cost100 <= 2.0 * cost10
        flush_phase("minhash_two_phase_pairs@planted_10x_to_100x")

    if want_phase("curate100"):
        # 4b) the curate CLI END-TO-END at planted 10x -> 100x (round-11
        # verdict #5): every operator has its own probe row, but the
        # composed journey a user actually runs (`python -m
        # datafusion_dedup_ai_spark curate` = clean_corpus -> exact dedup
        # -> near-dup removal -> 80/10/10 split -> chunk counts -> manifest
        # + stats) had only fixture-scale e2e tests — and a composition can
        # re-execute a stage its parts don't (the kn pair re-execution
        # class). The first 100x attempt (round-12) answered with the
        # round-9 failure signature: the DEFAULT exact-Jaccard near-dup
        # stage ENOSPC'd at 100x (500k docs over the corpus's ~931-shingle
        # constant vocabulary make the shingle self-join's shuffle
        # unrunnable — no exact-tier plan completes on this box), so the
        # composition is probed in its SCALE CONFIGURATION: --near-dup-tier
        # minhash (LSH + two-phase verify, the swap clean_corpus's
        # docstring specifies at cluster scale) at BOTH factors so the
        # exponent compares like with like; the exact tier's 10x wall is
        # recorded alongside for the crossover context. Wall-gated on the
        # 10x->100x exponent; --bpe-tokens measured on/off at 100x and
        # recorded ungated (it adds one vocabulary-sized collect + the
        # per-distinct-word encode, both sub-linear terms by construction).
        import datafusion_dedup_ai_spark.__main__ as CLI

        curate_out = "/tmp/spark_graft_curate_probe_out"

        def curate_once(sf_dir, bpe=False, tier="minhash"):
            if os.path.isdir(curate_out):
                shutil.rmtree(curate_out)
            clear()
            argv = [
                os.path.join(sf_dir, "documents.parquet"),
                "--out",
                curate_out,
                "--near-dup-tier",
                tier,
            ] + (["--bpe-tokens"] if bpe else [])
            t0 = time.time()
            rc = CLI.curate_main(argv, spark=spark)
            dt = time.time() - t0
            assert rc == 0, f"curate CLI failed rc={rc} at {sf_dir}"
            stats = json.load(open(os.path.join(curate_out, "stats.json")))
            return dt, stats

        curate_once(d10)  # warm
        t10, s10 = min((curate_once(d10) for _ in range(2)), key=lambda x: x[0])
        # min-of-2 at 100x too: the first single-shot 100x run read 337s
        # against 172s for the SAME pipeline re-run with --bpe-tokens on
        # top — one-time shuffle-litter/GC noise on a single sample, not
        # pipeline cost. The exact-tier context run goes LAST so its ~450s
        # of shuffle files never precede a timed run.
        t100, s100 = min((curate_once(d100) for _ in range(2)), key=lambda x: x[0])
        t100b, s100b = curate_once(d100, bpe=True)
        t10x, s10x = curate_once(d10, tier="exact")
        exp = math.log(max(t100, 1e-6) / max(t10, 1e-6)) / math.log(10)
        report["curate_cli@planted_10x_to_100x"] = {
            "near_dup_tier": "minhash",
            "t_10x_s": round(t10, 3),
            "t_100x_s": round(t100, 3),
            "exponent": round(exp, 3),
            "t_10x_exact_tier_s": round(t10x, 3),
            "kept_docs_10x_exact_tier": s10x["kept_docs"],
            "kept_docs_10x": s10["kept_docs"],
            "exact_tier_100x": "not attempted deliberately: the exact "
            "shingle self-join ENOSPC'd here (round-9 failure class; "
            "first round-12 attempt reproduced it)",
            "t_100x_bpe_s": round(t100b, 3),
            "bpe_overhead_x": round(t100b / max(t100, 1e-6), 2),
            "input_docs_100x": s100["input_docs"],
            "kept_docs_100x": s100["kept_docs"],
            "kept_docs_100x_bpe": s100b["kept_docs"],
            "train_tokens_100x": s100["splits"]["train"]["n_tokens"],
            "gated": True,
        }
        ok = ok and exp <= MAX_EXPONENT
        flush_phase("curate_cli@planted_10x_to_100x")

    if want_phase("semantic"):
        # 5) semantic dedup at constdup 10x -> 100x (round-9 verdict #6):
        # sign-flip strata preserve within-copy cosines; at SemDeDup's high tau
        # cross-stratum pairs are ~impossible, so output grows linearly and the
        # exponent isolates the cell machinery.
        def emb_once(name):
            def run(sf_dir):
                clear()
                t0 = time.time()
                n = qs[name](spark, sf_dir).count()
                return time.time() - t0, n

            return run

        t10, n10 = best(emb_once("semantic_dedup_embeddings"), e10, 2)
        t100, n100 = min(
            (emb_once("semantic_dedup_embeddings")(e100) for _ in range(2)),
            key=lambda x: x[0],
        )
        exp = math.log(max(t100, 1e-6) / max(t10, 1e-6)) / math.log(10)
        report["semantic_dedup_embeddings@embconst_10x_to_100x"] = {
            "t_10x_s": round(t10, 3),
            "t_100x_s": round(t100, 3),
            "exponent": round(exp, 3),
            "rows_10x": n10,
            "rows_100x": n100,
            "gated": True,
        }
        ok = ok and exp <= MAX_EXPONENT
        flush_phase("semantic_dedup_embeddings@embconst_10x_to_100x")

    if want_phase("edc"):
        # 6) embedding clustering at constdup 10x -> 100x — TWO taus, because
        # the registered tau=0.35 sits at ~2.8 sigma of the RANDOM-pair cosine
        # at dim 64: across 2e10 cross-stratum pairs the tail is enormous, so
        # no 64-dim construction can keep 100 strata mutually below it (first
        # x100 attempt measured 1.37 ungated-root-caused: 99% of 100x edges
        # were cross-stratum — corpus EDGE MASS, the planted lesson again, not
        # machinery). The registered-tau row therefore gates per-OUTPUT-EDGE
        # cost; the machinery wall-exponent gate runs at tau=0.8, the cosine
        # real embedding-model dedup uses (lsh_near_pairs docstring), where
        # cross-stratum leakage is ~6.4 sigma == zero.
        from datafusion_dedup_ai_spark.operators import similarity_search as SS

        # round-12: the registered composite routes components through the
        # SIZE ROUTER (cluster_components_auto) — the probe replays the
        # same backend so the exponent gates measure what ships (tau=0.8
        # edge lists are delta-sized -> single-task union-find; tau=0.35 at
        # 100x crosses the 2M-edge threshold -> the LP scale path, same as
        # before).
        from datafusion_dedup_ai_spark.operators.clustering import (
            cluster_components_auto,
        )
        from pyspark.sql import Window

        def edc_once(sf_dir, tau):
            clear()
            emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
            n_emb = emb.count()
            bits = SS.lsh_bits_schedule(n_emb)
            t0 = time.time()
            pairs = SS.lsh_near_pairs(
                emb, threshold=tau, n_bits=bits, corpus_rows=n_emb
            ).persist()
            n_edges = pairs.count()
            edges = pairs.select(
                F.col("id_a").alias("row_order_a"),
                F.col("id_b").alias("row_order_b"),
            )
            labels = cluster_components_auto(edges).select(
                F.col("row_order").alias("vec_id"), "cluster_id"
            )
            full = (
                emb.select("vec_id")
                .join(labels, "vec_id", "left")
                .select(
                    "vec_id",
                    F.coalesce("cluster_id", F.col("vec_id")).alias("cluster_id"),
                )
            )
            full.select(
                "vec_id",
                "cluster_id",
                F.count("*").over(Window.partitionBy("cluster_id")).alias(
                    "cluster_size"
                ),
            ).count()
            dt = time.time() - t0
            pairs.unpersist()
            return dt, n_edges

        # registered tau: output-normalized gate (edge mass is the corpus's)
        tau = 0.35
        edc_once(e10, tau)
        t10, m10 = min((edc_once(e10, tau) for _ in range(2)), key=lambda x: x[0])
        t100, m100 = edc_once(e100, tau)
        c10, c100 = t10 / max(m10, 1), t100 / max(m100, 1)
        report["embedding_dedup_clusters@embconst_tau035_10x_to_100x"] = {
            "t_10x_s": round(t10, 3),
            "t_100x_s": round(t100, 3),
            "edges_10x": m10,
            "edges_100x": m100,
            "s_per_1k_edges_10x": round(1000 * c10, 4),
            "s_per_1k_edges_100x": round(1000 * c100, 4),
            "gated": "per_edge_cost",
        }
        ok = ok and c100 <= 2.0 * c10
        flush_phase("embedding_dedup_clusters@embconst_tau035_10x_to_100x")

        # dedup tau: MACHINERY gate. The work unit is the CANDIDATE (bucket
        # co-occurrence): candidate count is provably O(N) — the adaptive
        # width keeps mean bucket load <= target_bucket, so candidates <=
        # N * target * n_tables / 2. Round 10 recorded the one-decade WALL
        # exponent ungated at 1.17 because lsh_bits_for's ceil quantized the
        # load by up to 2x between decades (measured 39 vs 49 here); round 11
        # replaced the ceil with the dithered per-table lsh_bits_schedule
        # (expected candidate mass linear in N at every N), so the wall
        # exponent is now GATED directly alongside the per-1k-candidate cost.
        def edc_cands(sf_dir):
            from datafusion_dedup_ai_spark.operators import (
                similarity_search as SS2,
            )

            emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
            bits = SS2.lsh_bits_schedule(emb.count())
            b = SS2.lsh_bucketize(emb, "vec_id", "embedding", 16, bits, 64, 7)
            return (
                b.alias("a")
                .join(
                    b.alias("b"),
                    (F.col("a.table") == F.col("b.table"))
                    & (F.col("a.bucket") == F.col("b.bucket"))
                    & (F.col("a.vec_id") < F.col("b.vec_id")),
                )
                .select("a.vec_id", "b.vec_id")
                .distinct()
                .count()
            )

        # Round-12 (round-11 verdict #4): the 2-point exponent on a ~10s
        # base is denominator noise — the two committed runs read 1.027 and
        # 1.211 from t_10x spreads of 7.7s vs 12.9s alone. Settle it with a
        # 3-POINT least-squares fit (10x/30x/100x) over >=3 repeats at the
        # noisy 10x base, gated at the DEDICATED machinery bound: the wall
        # slope may exceed the fitted CANDIDATE-MASS slope by at most
        # EDC_TAU08_MAX_SLOPE_EXCESS (see the constant's comment — the
        # measured mass slope is ~1.10 on this geometry, so an absolute
        # ~1.0 wall bound would gate the workload, not the machinery),
        # plus the per-1k-candidate cost band.
        tau = 0.8
        k10, k30, k100 = edc_cands(e10), edc_cands(e30), edc_cands(e100)
        edc_once(e10, tau)  # warm
        t10, m10 = min((edc_once(e10, tau) for _ in range(3)), key=lambda x: x[0])
        t30, m30 = min((edc_once(e30, tau) for _ in range(2)), key=lambda x: x[0])
        t100, m100 = min(
            (edc_once(e100, tau) for _ in range(2)), key=lambda x: x[0]
        )
        xs = [math.log(10.0), math.log(30.0), math.log(100.0)]

        def _fit(vals):
            ys = [math.log(max(v, 1e-6)) for v in vals]
            xbar, ybar = sum(xs) / 3, sum(ys) / 3
            return sum(
                (x - xbar) * (y - ybar) for x, y in zip(xs, ys)
            ) / sum((x - xbar) ** 2 for x in xs)

        slope = _fit((t10, t30, t100))
        mass_slope = _fit((k10, k30, k100))
        exp = math.log(max(t100, 1e-6) / max(t10, 1e-6)) / math.log(10)
        c10, c30, c100 = (
            t10 / max(k10, 1),
            t30 / max(k30, 1),
            t100 / max(k100, 1),
        )
        report["embedding_dedup_clusters@embconst_tau080_10x_to_100x"] = {
            "t_10x_s": round(t10, 3),
            "t_30x_s": round(t30, 3),
            "t_100x_s": round(t100, 3),
            "fitted_slope": round(slope, 3),
            "candidate_mass_slope": round(mass_slope, 3),
            "max_slope_excess": EDC_TAU08_MAX_SLOPE_EXCESS,
            "exponent_2pt": round(exp, 3),
            "candidates_10x": k10,
            "candidates_30x": k30,
            "candidates_100x": k100,
            "s_per_1k_cands_10x": round(1000 * c10, 5),
            "s_per_1k_cands_30x": round(1000 * c30, 5),
            "s_per_1k_cands_100x": round(1000 * c100, 5),
            "edges_10x": m10,
            "edges_30x": m30,
            "edges_100x": m100,
            "gated": "machinery_vs_mass",
        }
        # Round-13 (round-12 advisor): the machinery-vs-mass gate alone
        # would silently track a super-linear candidate GENERATOR (wall
        # tracks mass, mass blows up, row still passes) — so the workload
        # itself is also bounded: the fitted mass slope must stay under the
        # probe-wide quadratic-catcher MAX_EXPONENT (measured ~1.10 on this
        # geometry; 1.35 is a generator-regression tripwire, not a tune).
        ok = (
            ok
            and c100 <= 2.0 * c10
            and slope <= mass_slope + EDC_TAU08_MAX_SLOPE_EXCESS
            and mass_slope <= MAX_EXPONENT
        )
        flush_phase("embedding_dedup_clusters@embconst_tau080_10x_to_100x")

    if want_phase("sq8wide"):
        # 7) SQ8 prescreen at PRODUCTION vector width (round-10 verdict #7):
        # the dim-64 measurements said the screen loses at tau=0.8 because
        # the verify there is fold-CPU-bound, and claimed the 8x payload cut
        # pays at dim >= ~256 — a claim with no measurement at that width.
        # w100/w10 are the embconst corpora widened to dim 256 by
        # per-replica sign masks (pair structure and candidate mass
        # IDENTICAL to the dim-64 corpora — see build_widened_embeddings).
        #
        # The first w100 run answered the headline question more bluntly
        # than a timing row: screen OFF at dim 256 the verify join shuffles
        # 147M candidates x two dim-256 double[] payloads (~600 GB) — the
        # vector map (600k x 256 x 8 = 1.2 GiB) is beyond the broadcast
        # budget, and the box died ENOSPC (80 GB free). There is NO
        # completable screen-off plan at that width/volume on this box, so:
        #
        #   * exact-safety + both-modes timing run on w10 (60k x dim 256 —
        #     the vector map fits broadcast, both modes complete): pair
        #     equality on/off FAILS the probe if violated;
        #   * w100 rows time screen ON (codes broadcast under the separate
        #     code-map gate) and attempt screen OFF once under try/except —
        #     a disk failure is recorded as completed_off=False, the
        #     planted-100x ENOSPC precedent (evidence of the corpus's
        #     payload mass, not of machinery).
        from datafusion_dedup_ai_spark.operators import (
            similarity_search as SSW,
        )

        w10 = "/tmp/spark_graft_scale10_embwide"
        if os.path.isdir(w10):
            shutil.rmtree(w10)
        build_widened_embeddings(spark, e10, w10, replicas=4)

        def sq8_once(sf_dir, tau, scr, dim):
            clear()
            emb = spark.read.parquet(
                os.path.join(sf_dir, "embeddings.parquet")
            )
            n_emb = emb.count()
            bits = SSW.lsh_bits_schedule(n_emb)
            t0 = time.time()
            n = SSW.lsh_near_pairs(
                emb,
                threshold=tau,
                n_bits=bits,
                dim=dim,
                screen=scr,
                corpus_rows=n_emb,
            ).count()
            return time.time() - t0, n

        for tau in (0.35, 0.8):
            sq8_once(w10, tau, False, 256)  # shape/JIT warm-up
            t_off10, n_off10 = sq8_once(w10, tau, False, 256)
            t_on10, n_on10 = sq8_once(w10, tau, True, 256)
            row = {
                "t_10x_screen_off_s": round(t_off10, 3),
                "t_10x_screen_on_s": round(t_on10, 3),
                "pairs_off": n_off10,
                "pairs_on": n_on10,
                "dim": 256,
                "tau": tau,
                "regime": "vector map fits broadcast (123 MiB)",
                "gated": "decision_row",
            }
            report[f"sq8_prescreen_dim256@embwide_10x_tau{tau}"] = row
            if n_on10 != n_off10:
                row["pair_count_mismatch"] = True
                ok = False  # exact-safety violated — never acceptable
            flush_phase(f"sq8_prescreen_dim256@embwide_10x_tau{tau}")

        # w100: screen-off attempted ONCE (payload mass is tau-independent
        # — candidates are bucket co-occurrences, tau only gates the verify
        # filter), screen-on timed per tau.
        off_row: dict = {"attempted": True}
        try:
            t_off, n_off = sq8_once(w100, 0.35, False, 256)
            off_row.update(
                {"completed": True, "t_s": round(t_off, 3), "pairs": n_off}
            )
        except Exception as e:  # noqa: BLE001 — record, don't die (ENOSPC)
            off_row.update(
                {"completed": False, "error": type(e).__name__,
                 "detail": str(e)[:200]}
            )
        for tau in (0.35, 0.8):
            t_on, n_on = sq8_once(w100, tau, True, 256)
            row = {
                "t_100x_screen_on_s": round(t_on, 3),
                "pairs_on": n_on,
                "dim": 256,
                "tau": tau,
                "screen_off_100x": off_row,
                "regime": "vector map beyond broadcast budget (1.2 GiB); "
                "int8 code map broadcast (separate gate)",
                "gated": "decision_row",
            }
            report[f"sq8_prescreen_dim256@embwide_100x_tau{tau}"] = row
            flush_phase(f"sq8_prescreen_dim256@embwide_100x_tau{tau}")

    if only is not None:
        # merge mode: keep the prior artifact's rows for phases not rerun,
        # then re-derive all_linearish from every merged row's own gate
        prior_path = os.path.join(_x100_repo_root(), "SCALE100.json")
        if os.path.exists(prior_path):
            with open(prior_path) as f:
                prior = json.load(f).get("queries", {})
            merged = dict(prior)
            merged.update(report)
            report = merged
        ok = all(_x100_row_ok(r) for r in report.values())
    print(
        json.dumps(
            {
                "metric": "scale_probe_100x",
                "factors": "constdup 10x->100x (gated); planted 10x->30x "
                "(per-pair-cost gate)",
                "planted_100x_note": "the ALL-EXACT verify died on disk "
                "here in round 9 (~24.75M true pairs x two shingle "
                "payloads, ENOSPC); the round-10 two-phase verify runs the "
                "same planted-100x corpus to completion "
                "(minhash_two_phase_pairs@planted_10x_to_100x row); the "
                "all-exact planted row stays 10x->30x",
                "max_exponent": MAX_EXPONENT,
                "all_linearish": ok,
                "rerun_phases": sorted(only) if only is not None else "all",
                "queries": report,
            }
        )
    )
    spark.stop()


def _x100_repo_root() -> str:
    return os.path.dirname(os.path.abspath(__file__))


def _x100_row_ok(row: dict) -> bool:
    """Re-derive a row's gate from its own fields (merge mode): exponent
    rows gate on MAX_EXPONENT; *_cost rows gate on the 100x (or 30x)
    per-unit cost staying within 2x of the 10x cost; ungated rows pass."""
    gate = row.get("gated")
    if row.get("pair_count_mismatch"):
        return False  # SQ8 screen exact-safety violated
    if gate is True:
        # Missing gate fields FAIL (round-10 advisor): a corrupted/truncated
        # prior artifact row must not flip all_linearish to true via a
        # permissive default.
        if "exponent" not in row:
            return False
        return row["exponent"] <= MAX_EXPONENT
    if gate == "machinery_vs_mass":
        # 3-point rows (round-11 verdict #4, semantics settled round-12):
        # the fitted WALL slope may exceed the fitted CANDIDATE-MASS slope
        # by at most max_slope_excess (the machinery must be linear in its
        # work unit; the unit count's growth is the measured workload — see
        # EDC_TAU08_MAX_SLOPE_EXCESS), plus the per-candidate cost band.
        if "fitted_slope" not in row or "candidate_mass_slope" not in row:
            return False
        excess = row.get("max_slope_excess", EDC_TAU08_MAX_SLOPE_EXCESS)
        if row["fitted_slope"] > row["candidate_mass_slope"] + excess:
            return False
        # round-13 (round-12 advisor): also bound the WORKLOAD — a
        # super-linear candidate generator must not pass just because the
        # per-candidate machinery tracked its blow-up.
        if row["candidate_mass_slope"] > MAX_EXPONENT:
            return False
        c10 = row.get("s_per_1k_cands_10x")
        c100 = row.get("s_per_1k_cands_100x")
        return (
            c10 is not None and c100 is not None and c100 <= 2.0 * c10
        )
    if isinstance(gate, str) and gate.startswith("per_"):
        pairs = [
            (k, k.replace("_10x", "_100x"))
            for k in row
            if k.startswith("s_per_1k_") and k.endswith("_10x")
        ]
        if not pairs:
            return False
        for k10, k100 in pairs:
            k_late = k100 if k100 in row else k100.replace("_100x", "_30x")
            if k_late not in row:
                return False
            if row[k_late] > 2.0 * row[k10]:
                return False
        return True
    return True


if __name__ == "__main__":
    main()
