"""Text-analysis query pack over `documents` (extension scope): token stats,
quality scores, language-ID, fingerprints, corpus term stats, and exact
n-gram-Jaccard near-duplicate pairs — every one oracle-gated.

The SQL mirrors are generated from the same constants (functions/text.py) so
the two sides can't drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from datafusion_dedup_ai_spark.functions import text as T
from datafusion_dedup_ai_spark.registry import register
from datafusion_dedup_ai_spark.sources.readers import load_spread, load_table

# ---------------------------------------------------------------------------
# SQL mirror helpers (DuckDB dialect)
# ---------------------------------------------------------------------------

_TOKS = "string_split(text, ' ')"


def _sql_list_lit(words: tuple[str, ...]) -> str:
    return "[" + ", ".join("'" + w + "'" for w in words) + "]"


def _sql_marker_count(lang: str) -> str:
    return (
        f"CAST(len(list_filter({_TOKS}, x -> list_contains("
        f"{_sql_list_lit(T.LANG_MARKERS[lang])}, x))) AS BIGINT)"
    )


def _sql_lang_id() -> str:
    """Mirror of functions.text.lang_id: fold langs in sorted order,
    strictly-greater marker count replaces the running best."""
    langs = sorted(T.LANG_MARKERS)
    best = f"'{langs[0]}'"
    best_count = f"c_{langs[0]}"
    for lang in langs[1:]:
        cnt = f"c_{lang}"
        best = f"(CASE WHEN {cnt} > {best_count} THEN '{lang}' ELSE {best} END)"
        best_count = f"(CASE WHEN {cnt} > {best_count} THEN {cnt} ELSE {best_count} END)"
    return f"(CASE WHEN {best_count} > 0 THEN {best} ELSE 'und' END)"


_SQL_BIGRAMS = (
    "[t[i] || ' ' || t[i+1] FOR i IN range(1, len(t))]"
)

_SQL_ROLLING_HASH = (
    "list_reduce(list_concat([CAST(0 AS BIGINT)], "
    "[CAST(ascii(ch) AS BIGINT) FOR ch IN string_split(text, '')]), "
    f"(acc, x) -> (acc * {T.ROLLING_HASH_BASE} + x) % {T.ROLLING_HASH_MOD})"
)

_BPE_PATTERN = r"[a-z]+|[A-Z]+|[0-9]+|[^A-Za-z0-9\s]"


# ===========================================================================
# Token statistics
# ===========================================================================


@register(
    "doc_token_stats",
    f"""
    SELECT doc_id,
           CAST(len({_TOKS}) AS BIGINT) AS n_tokens,
           CAST(len(list_distinct({_TOKS})) AS BIGINT) AS n_distinct_tokens,
           CAST(length(text) AS BIGINT) AS n_chars_actual,
           CAST(len(regexp_extract_all(text, '{_BPE_PATTERN}')) AS BIGINT) AS n_bpe_tokens
    FROM documents
    """,
)
def q_doc_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_spread(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        T.token_count(F.col("text")).alias("n_tokens"),
        F.size(F.array_distinct(T.tokens(F.col("text")))).cast("bigint").alias(
            "n_distinct_tokens"
        ),
        F.length("text").cast("bigint").alias("n_chars_actual"),
        T.regex_token_count(F.col("text")).alias("n_bpe_tokens"),
    )


# ===========================================================================
# Quality scoring
# ===========================================================================


@register(
    "doc_quality_scores",
    f"""
    WITH t AS (
        SELECT doc_id,
               CAST(len({_TOKS}) AS DOUBLE) AS n_tok,
               CAST(len(list_distinct({_TOKS})) AS DOUBLE) AS n_distinct,
               CAST(len(list_filter({_TOKS}, x -> list_contains(
                   {_sql_list_lit(T.STOPWORDS)}, x))) AS DOUBLE) AS sw
        FROM documents
    )
    SELECT doc_id,
           CAST(n_tok AS BIGINT) AS n_tokens,
           CAST(sw AS BIGINT) AS n_stopwords,
           least(n_tok / 50.0, 1.0) * 0.4
             + (n_distinct / n_tok) * 0.4
             + (CASE WHEN sw / n_tok >= 0.02 AND sw / n_tok <= 0.4
                     THEN 1.0 ELSE 0.0 END) * 0.2 AS quality
    FROM t
    """,
)
def q_doc_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_spread(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        T.token_count(F.col("text")).alias("n_tokens"),
        T.stopword_count(F.col("text")).alias("n_stopwords"),
        T.quality_score(F.col("text")).alias("quality"),
    )


# ===========================================================================
# Language identification (marker-word heuristic)
# ===========================================================================


@register(
    "doc_language_id",
    f"""
    WITH c AS (
        SELECT doc_id, lang AS claimed_lang,
               {', '.join(f'{_sql_marker_count(lang)} AS c_{lang}' for lang in sorted(T.LANG_MARKERS))}
        FROM documents
    )
    SELECT doc_id, claimed_lang,
           {', '.join(f'c_{lang}' for lang in sorted(T.LANG_MARKERS))},
           {_sql_lang_id()} AS pred_lang
    FROM c
    """,
)
def q_doc_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_spread(spark, sf_dir, "documents")
    cols = [
        "doc_id",
        F.col("lang").alias("claimed_lang"),
        *[
            T.lang_marker_count(F.col("text"), lang).alias(f"c_{lang}")
            for lang in sorted(T.LANG_MARKERS)
        ],
        T.lang_id(F.col("text")).alias("pred_lang"),
    ]
    return d.select(*cols)


# ===========================================================================
# Fingerprints (md5 + order-sensitive rolling hash)
# ===========================================================================


@register(
    "doc_fingerprints",
    f"""
    SELECT doc_id, md5(text) AS fp_md5, {_SQL_ROLLING_HASH} AS fp_rolling
    FROM documents
    """,
)
def q_doc_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_spread(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        T.fingerprint_md5(F.col("text")).alias("fp_md5"),
        T.rolling_hash(F.col("text")).alias("fp_rolling"),
    )


# ===========================================================================
# Corpus term statistics (TF + DF, top-k)
# ===========================================================================


@register(
    "corpus_top_terms",
    f"""
    WITH ex AS (
        SELECT doc_id, unnest({_TOKS}) AS term FROM documents
    )
    SELECT term,
           COUNT(*) AS tf,
           COUNT(DISTINCT doc_id) AS df
    FROM ex
    GROUP BY term
    ORDER BY tf DESC, term ASC
    LIMIT 50
    """,
)
def q_corpus_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF/DF table (the exact-counting core of TF-IDF; idf = ln((N+1)/(df+1))+1
    is derivable but kept out of the hash gate — libm ulp differences)."""
    d = load_table(spark, sf_dir, "documents")
    ex = d.select("doc_id", F.explode(T.tokens(F.col("text"))).alias("term"))
    return (
        ex.groupBy("term")
        .agg(F.count("*").alias("tf"), F.countDistinct("doc_id").alias("df"))
        .orderBy(F.col("tf").desc(), F.col("term").asc())
        .limit(50)
    )


TFIDF_TOP_N = 3


@register(
    "doc_tfidf_topterms",
    f"""
    WITH ex AS (
        SELECT doc_id, unnest({_TOKS}) AS term FROM documents
    ), tf_tab AS (
        SELECT doc_id, term, COUNT(*) AS tf FROM ex GROUP BY 1, 2
    ), df_tab AS (
        SELECT term, COUNT(*) AS df FROM tf_tab GROUP BY 1
    ), n_tab AS (
        SELECT COUNT(*) AS n_docs FROM documents
    )
    SELECT doc_id, term, tf, df, tfidf, rk FROM (
        SELECT tf_tab.doc_id, tf_tab.term, tf_tab.tf, df_tab.df,
               CAST(tf AS DOUBLE) * (n_docs + 1) / (df + 1) AS tfidf,
               CAST(ROW_NUMBER() OVER (
                   PARTITION BY tf_tab.doc_id
                   ORDER BY CAST(tf AS DOUBLE) * (n_docs + 1) / (df + 1) DESC,
                            tf_tab.term ASC) AS BIGINT) AS rk
        FROM tf_tab
        JOIN df_tab USING (term)
        CROSS JOIN n_tab)
    WHERE rk <= {TFIDF_TOP_N}
    """,
)
def q_doc_tfidf_topterms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document TF-IDF top terms: (doc_id, term, tf, df, tfidf, rk) for
    the top-3 terms of every document. The idf is the *rational* form
    (n_docs+1)/(df+1) rather than ln of it: multiplication and division are
    IEEE-exact so the score hash-gates cross-engine, while ln's libm ulp
    drift would poison both the hash and the rank order (the concern
    documented on corpus_top_terms). ln is monotone, so swapping it in
    changes scores but this rational score is the defined contract here.

    Scale shape: tf is one shuffle on (doc_id, term); df is a COUNT window
    over the term partition of the already-reduced tf table (one row per
    (doc, term), so partition row count == document frequency) — one
    exchange fewer than a groupBy-on-term + join-back, measured ~15% faster
    at sf0.1; n_docs is a scalar broadcast; the final top-k is a window on
    doc_id. No step touches raw text twice."""
    d = load_table(spark, sf_dir, "documents")
    ex = d.select("doc_id", F.explode(T.tokens(F.col("text"))).alias("term"))
    tf = ex.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    n = d.agg(F.count("*").alias("n_docs"))
    scored = (
        tf.withColumn("df", F.count("*").over(Window.partitionBy("term")))
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "term",
            "tf",
            "df",
            (
                F.col("tf").cast("double")
                * (F.col("n_docs") + F.lit(1))
                / (F.col("df") + F.lit(1))
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("tfidf").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("bigint"))
        .where(F.col("rk") <= TFIDF_TOP_N)
        .select("doc_id", "term", "tf", "df", "tfidf", "rk")
    )


# ===========================================================================
# Exact-substring duplicate spans (the token-level dedup removal op)
# ===========================================================================

# Minimum duplicated run, in tokens. Real pipelines use ~50 BPE tokens
# (Lee et al. 2021, "Deduplicating Training Data Makes Language Models
# Better"); the synthetic fixture's vocabulary is tiny, so 5 keeps planted
# duplicate spans detectable without flagging every random collision.
SPAN_GRAM = 5
SPAN_MIN_COUNT = 2  # a gram is duplicated if it occurs >= twice corpus-wide


@register(
    "duplicate_substring_spans",
    f"""
    WITH toks AS (
        SELECT doc_id, {_TOKS} AS t FROM documents
    ), starts AS (
        SELECT doc_id, t,
               unnest(range(0, greatest(len(t) - {SPAN_GRAM} + 1, 0))) AS pos
        FROM toks
    ), g AS (
        SELECT doc_id, pos,
               md5(array_to_string(t[pos + 1 : pos + {SPAN_GRAM}], ' ')) AS gh
        FROM starts
    ), dup AS (
        SELECT doc_id, pos FROM g
        WHERE gh IN (
            SELECT gh FROM g GROUP BY gh HAVING COUNT(*) >= {SPAN_MIN_COUNT})
    ), flagged AS (
        SELECT doc_id, pos,
               CASE WHEN prev IS NULL OR pos - prev > {SPAN_GRAM}
                    THEN 1 ELSE 0 END AS new_island
        FROM (
            SELECT doc_id, pos,
                   lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
            FROM dup)
    ), isl AS (
        SELECT doc_id, pos,
               SUM(new_island) OVER (
                   PARTITION BY doc_id ORDER BY pos
                   ROWS UNBOUNDED PRECEDING) AS island
        FROM flagged
    )
    SELECT doc_id,
           CAST(MIN(pos) AS BIGINT) AS span_start,
           CAST(MAX(pos) + {SPAN_GRAM} - 1 AS BIGINT) AS span_end,
           CAST(MAX(pos) + {SPAN_GRAM} - MIN(pos) AS BIGINT) AS span_tokens
    FROM isl
    GROUP BY doc_id, island
    """,
)
def q_duplicate_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring dedup spans (ExactSubstr a la Lee et al. 2021): the
    maximal token spans of each document that are covered by {SPAN_GRAM}-gram
    runs occurring >= {SPAN_MIN_COUNT} times corpus-wide — i.e. the byte
    ranges a dedup pass would CUT, not just a per-doc contamination score
    (that is doc_dup_shingle_fraction).

    Plan: positional gram explode (sequence+explode, codegen) -> one shuffle
    on the gram hash for the global occurrence count (map-side combined) ->
    semi-join back -> per-doc gaps-and-islands merge of overlapping gram
    starts (two window passes on doc_id) -> span aggregate. At 100 TB: the
    gram table is ~tokens-sized; suffix automata are not needed because the
    fixed-L rolling window + island merge reconstructs maximal duplicated
    runs >= L exactly; hot grams (boilerplate) are the skew key, the same
    max_df guard as the MinHash tier applies before the count join.
    """
    d = load_spread(spark, sf_dir, "documents")
    toks = d.select("doc_id", T.tokens(F.col("text")).alias("t"))
    dup = _dup_gram_starts(toks)
    w = Window.partitionBy("doc_id").orderBy("pos")
    prev = F.lag("pos").over(w)
    flagged = dup.select(
        "doc_id",
        "pos",
        F.when(prev.isNull() | ((F.col("pos") - prev) > SPAN_GRAM), 1)
        .otherwise(0)
        .alias("new_island"),
    )
    isl = flagged.select(
        "doc_id",
        "pos",
        F.sum("new_island")
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("island"),
    )
    return isl.groupBy("doc_id", "island").agg(
        F.min("pos").cast("bigint").alias("span_start"),
        (F.max("pos") + F.lit(SPAN_GRAM - 1)).cast("bigint").alias("span_end"),
        (F.max("pos") + F.lit(SPAN_GRAM) - F.min("pos"))
        .cast("bigint")
        .alias("span_tokens"),
    ).drop("island")


def _dup_gram_starts(toks: DataFrame) -> DataFrame:
    """(doc_id, pos): start positions of corpus-duplicated SPAN_GRAM-gram
    runs — the shared detection core of q_duplicate_substring_spans (island
    merge on top) and q_doc_substring_trimmed (coverage removal on top).
    Expression-identical to the pre-refactor spans body, so the spans hash
    gate is unaffected."""
    n_starts = F.greatest(F.size("t") - F.lit(SPAN_GRAM - 1), F.lit(0))
    starts = toks.select(
        "doc_id",
        "t",
        F.explode(
            F.when(n_starts > 0, F.sequence(F.lit(0), n_starts - 1)).otherwise(
                F.array().cast("array<int>")
            )
        ).alias("pos"),
    )
    g = starts.select(
        "doc_id",
        "pos",
        F.md5(F.concat_ws(" ", F.slice(F.col("t"), F.col("pos") + 1, SPAN_GRAM))).alias(
            "gh"
        ),
    )
    dup_grams = g.groupBy("gh").agg(F.count("*").alias("n")).where(
        F.col("n") >= SPAN_MIN_COUNT
    )
    return g.join(dup_grams.select("gh"), "gh", "left_semi").select("doc_id", "pos")


# The trimmed-corpus oracle re-derives the SAME toks/starts/g/dup CTEs as the
# spans oracle above (kept in lockstep by construction — both are generated
# from SPAN_GRAM / SPAN_MIN_COUNT / _TOKS), then removes covered tokens and
# reassembles the text in token order.
_TRIM_DUP_CTES = f"""
    toks AS (
        SELECT doc_id, {{toks}} AS t FROM documents
    ), starts AS (
        SELECT doc_id, t,
               unnest(range(0, greatest(len(t) - {SPAN_GRAM} + 1, 0))) AS pos
        FROM toks
    ), g AS (
        SELECT doc_id, pos,
               md5(array_to_string(t[pos + 1 : pos + {SPAN_GRAM}], ' ')) AS gh
        FROM starts
    ), dup AS (
        SELECT doc_id, pos FROM g
        WHERE gh IN (
            SELECT gh FROM g GROUP BY gh HAVING COUNT(*) >= {SPAN_MIN_COUNT})
    )"""


@register(
    "doc_substring_trimmed",
    f"""
    WITH {_TRIM_DUP_CTES.format(toks=_TOKS)},
    covered AS (
        SELECT DISTINCT doc_id, pos + o AS tokpos
        FROM dup CROSS JOIN (SELECT unnest(range(0, {SPAN_GRAM})) AS o)
    ), tk AS (
        SELECT doc_id, t, unnest(range(0, len(t))) AS tokpos FROM toks
    ), tok AS (
        SELECT doc_id, tokpos, t[tokpos + 1] AS tok FROM tk
    ), kept AS (
        SELECT o.doc_id, o.tokpos, o.tok FROM tok o
        WHERE NOT EXISTS (
            SELECT 1 FROM covered c
            WHERE c.doc_id = o.doc_id AND c.tokpos = o.tokpos)
    ), agg AS (
        SELECT doc_id,
               string_agg(tok, ' ' ORDER BY tokpos) AS trimmed_text,
               CAST(COUNT(*) AS BIGINT) AS n_kept
        FROM kept GROUP BY doc_id
    )
    SELECT t.doc_id,
           CAST(len(t.t) AS BIGINT) AS n_tokens,
           COALESCE(a.n_kept, CAST(0 AS BIGINT)) AS n_kept,
           CAST(len(t.t) AS BIGINT) - COALESCE(a.n_kept, CAST(0 AS BIGINT))
               AS n_removed,
           COALESCE(a.trimmed_text, '') AS trimmed_text
    FROM toks t LEFT JOIN agg a USING (doc_id)
    """,
)
def q_doc_substring_trimmed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ExactSubstr dedup REMOVAL (Lee et al. 2022, arXiv:2107.06499 §4.1):
    the transform that actually emits the trimmed corpus, not just the span
    report — every token covered by a corpus-duplicated {SPAN_GRAM}-gram run
    is cut from EVERY occurrence (the paper's documented choice: removing
    all copies, not all-but-one, is what eliminates the memorization
    surface), and the survivors reassemble in token order into
    ``trimmed_text``. Counts travel alongside so downstream token budgets
    see the loss.

    Determinism / gate: token positions are explicit (posexplode), coverage
    is a distinct (doc, pos) anti-join, and reassembly sorts by position
    before joining with single spaces — the input text is single-space
    normalized, so an untouched document round-trips byte-identically and
    the whole output (including the string column) hash-gates cross-engine.

    Scale shape: the gram-duplication core is shared with
    duplicate_substring_spans (one shuffle on the gram hash, map-side
    combined; hot boilerplate grams are the skew key, same max_df-style
    guard applies). Removal adds one distinct on covered positions and one
    (doc, pos) anti-join — both token-table-sized shuffles — and the
    per-doc reassembly state is bounded by document length, never corpus
    size. The tokenize projection is consumed three times (dup core,
    positional explode, length base): a deliberate re-scan — at 100 TB a
    cheap split over a column-pruned scan pipelines, where a persist of the
    token table would pin corpus-sized storage."""
    d = load_spread(spark, sf_dir, "documents")
    toks = d.select("doc_id", T.tokens(F.col("text")).alias("t"))
    dup = _dup_gram_starts(toks)
    covered = dup.select(
        "doc_id",
        F.explode(
            F.sequence(F.col("pos"), F.col("pos") + F.lit(SPAN_GRAM - 1))
        ).alias("tokpos"),
    ).distinct()
    tokp = toks.select("doc_id", F.posexplode("t").alias("tokpos", "tok"))
    kept = tokp.join(covered, ["doc_id", "tokpos"], "left_anti")
    agg = kept.groupBy("doc_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("tokpos", "tok"))),
                lambda x: x["tok"],
            ),
            " ",
        ).alias("trimmed_text"),
        F.count("*").cast("bigint").alias("n_kept"),
    )
    base = toks.select("doc_id", F.size("t").cast("bigint").alias("n_tokens"))
    zero = F.lit(0).cast("bigint")
    return base.join(agg, "doc_id", "left").select(
        "doc_id",
        "n_tokens",
        F.coalesce("n_kept", zero).alias("n_kept"),
        (F.col("n_tokens") - F.coalesce(F.col("n_kept"), zero))
        .cast("bigint")
        .alias("n_removed"),
        F.coalesce("trimmed_text", F.lit("")).alias("trimmed_text"),
    )


# ===========================================================================
# Exact n-gram Jaccard near-duplicate pairs
# ===========================================================================

JACCARD_THRESHOLD = 0.2


@register(
    "ngram_jaccard_pairs",
    f"""
    WITH toks AS (
        SELECT doc_id, {_TOKS} AS t FROM documents
    ), sh AS (
        SELECT doc_id, list_distinct({_SQL_BIGRAMS}) AS shingles FROM toks
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
           CAST(sa.n_sh + sb.n_sh - n_common AS BIGINT) AS n_union,
           CAST(n_common AS DOUBLE) / (sa.n_sh + sb.n_sh - n_common) AS jaccard
    FROM inter
    JOIN sizes sa ON doc_a = sa.doc_id
    JOIN sizes sb ON doc_b = sb.doc_id
    WHERE CAST(n_common AS DOUBLE) / (sa.n_sh + sb.n_sh - n_common) >= {JACCARD_THRESHOLD}
    """,
)
def q_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact near-dup pairs by word-bigram Jaccard — the ground truth the
    MinHash-LSH tier approximates. Shingle equality is the shuffle key; the
    per-shingle explode is bounded by document length, and hot shingles are
    the skew to watch at scale (AQE skew-join handles the bucket join)."""
    d = load_spread(spark, sf_dir, "documents")
    sh = d.select(
        "doc_id", T.distinct_shingles(F.col("text")).alias("shingles")
    )
    sizes = sh.select("doc_id", F.size("shingles").cast("bigint").alias("n_sh"))
    ex = sh.select("doc_id", F.explode("shingles").alias("s"))
    a = ex.alias("a")
    b = ex.alias("b")
    inter = (
        a.join(b, (F.col("a.s") == F.col("b.s")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("n_common"))
    )
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    j = (
        inter.join(sa, F.col("doc_a") == F.col("sa.doc_id"))
        .join(sb, F.col("doc_b") == F.col("sb.doc_id"))
        .withColumn("n_union", (F.col("sa.n_sh") + F.col("sb.n_sh") - F.col("n_common")).cast("bigint"))
        .withColumn("jaccard", F.col("n_common").cast("double") / (F.col("sa.n_sh") + F.col("sb.n_sh") - F.col("n_common")))
    )
    return j.where(F.col("jaccard") >= JACCARD_THRESHOLD).select(
        "doc_a", "doc_b", "n_common", "n_union", "jaccard"
    )


# ===========================================================================
# Composite: the full training-corpus cleaning pipeline in one plan
# ===========================================================================

QUALITY_FLOOR = 0.5
KEEP_LANG = "en"


@register(
    "clean_corpus",
    f"""
    WITH scored AS (
        SELECT doc_id, text,
               CAST(len({_TOKS}) AS BIGINT) AS n_tokens,
               least(CAST(len({_TOKS}) AS DOUBLE) / 50.0, 1.0) * 0.4
                 + (CAST(len(list_distinct({_TOKS})) AS DOUBLE)
                    / CAST(len({_TOKS}) AS DOUBLE)) * 0.4
                 + (CASE WHEN CAST(len(list_filter({_TOKS}, x -> list_contains(
                            {_sql_list_lit(T.STOPWORDS)}, x))) AS DOUBLE)
                            / CAST(len({_TOKS}) AS DOUBLE) >= 0.02
                          AND CAST(len(list_filter({_TOKS}, x -> list_contains(
                            {_sql_list_lit(T.STOPWORDS)}, x))) AS DOUBLE)
                            / CAST(len({_TOKS}) AS DOUBLE) <= 0.4
                         THEN 1.0 ELSE 0.0 END) * 0.2 AS quality,
               {', '.join(f'{_sql_marker_count(lang)} AS c_{lang}' for lang in sorted(T.LANG_MARKERS))}
        FROM documents
    ), kept AS (
        SELECT doc_id, text, n_tokens, quality
        FROM scored
        WHERE quality >= {QUALITY_FLOOR} AND {_sql_lang_id()} = '{KEEP_LANG}'
    ), hashed AS (
        SELECT doc_id, text, n_tokens, quality,
               MIN(doc_id) OVER (PARTITION BY md5(text)) AS rep
        FROM kept
    ), exact_kept AS (
        SELECT doc_id, text, n_tokens, quality
        FROM hashed WHERE doc_id = rep
    ), toks AS (
        SELECT doc_id, {_TOKS} AS t FROM exact_kept
    ), sh AS (
        SELECT doc_id, list_distinct({_SQL_BIGRAMS}) AS shingles FROM toks
    ), ex AS (
        SELECT doc_id, unnest(shingles) AS s FROM sh
    ), inter AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
        FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    ), sizes AS (
        SELECT doc_id, len(shingles) AS n_sh FROM sh
    ), near_dup_victims AS (
        SELECT DISTINCT doc_b AS doc_id
        FROM inter
        JOIN sizes sa ON doc_a = sa.doc_id
        JOIN sizes sb ON doc_b = sb.doc_id
        WHERE CAST(n_common AS DOUBLE) / (sa.n_sh + sb.n_sh - n_common)
              >= {JACCARD_THRESHOLD}
    )
    SELECT doc_id, n_tokens, quality
    FROM exact_kept
    WHERE doc_id NOT IN (SELECT doc_id FROM near_dup_victims)
    """,
)
def q_clean_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full training-data cleaning pipeline as ONE declarative plan —
    the composition a 100 TB corpus prep actually runs, end-to-end
    hash-gated:

        quality floor (0.5) -> language keep ('en')
        -> exact dedup (min doc_id per content md5)
        -> near-dup removal (drop the HIGHER doc id of every exact-Jaccard
           pair at J >= 0.2; greedy pairwise kill, not transitive
           clustering — deterministic and SQL-expressible, and the common
           production choice since clustering near-dup graphs of
           boilerplate can collapse too much)

    Filters run BEFORE the expensive shingle join, so the join input is the
    already-reduced survivor set — the stage order is itself the scale
    optimization. At cluster scale the near-dup stage swaps to the
    MinHash-LSH tier (same victim rule over minhash_near_dup_pairs).
    """
    return clean_corpus_frame(load_spread(spark, sf_dir, "documents"))


def clean_corpus_frame(d: DataFrame, near_dup_tier: str = "exact") -> DataFrame:
    """Library form of clean_corpus over an arbitrary (doc_id, text, ...)
    frame — the `curate` CLI subcommand runs this on a user parquet; the
    registered q_clean_corpus binds it to the sf documents table.

    ``near_dup_tier`` selects the near-dup victim generator (round-12 —
    the scale swap this docstring always promised, now implemented because
    the curate@100x probe measured the exact tier non-completable):

    * ``"exact"`` (default, what the registered hash-gated query runs):
      the exact word-bigram Jaccard self-join — ground truth, but the
      shingle equi-join is quadratic in per-shingle document frequency, so
      on corpora whose vocabulary doesn't grow with N (the planted-100x
      probe corpus: 500k docs over ~931 distinct shingles) its shuffle is
      unrunnable (measured ENOSPC at 100x, the round-9 all-exact verify
      failure class).
    * ``"minhash"``: MinHash-LSH candidates + the TWO-PHASE verify
      (minhash_near_dup_pairs_two_phase — signature screen, borderline
      band exact) at the same Jaccard threshold, victims by the same
      drop-the-higher-id rule. Recall follows the LSH S-curve instead of
      being exact (at J=0.2 the 16x4 catch probability is ~2.5%, rising to
      ~65% at J=0.5 — so a minhash-tier manifest KEEPS marginal near-dups
      the exact tier would drop); on the fixed-seed test corpora the
      two-phase pair set equals the all-exact MinHash pair set (pinned in
      tests/test_dedup_ext.py), making minhash-tier victims a subset of
      exact-tier victims there (asserted in tests/test_cli.py). This is
      the 100 TB configuration: the planted-100x corpus that ENOSPCs the
      exact tier completes on it (SCALE100.json curate row).
    """
    if near_dup_tier not in ("exact", "minhash"):
        raise ValueError(
            f"near_dup_tier must be 'exact' or 'minhash', got {near_dup_tier!r}"
        )
    # Tokenize-once (round-13, round-12 verdict #4): project the whitespace
    # split into a real column and fold quality/langid over IT — the scoring
    # expressions reference tokens(text) ~8x (length band, diversity,
    # stopword band, 4 language-marker filters) and codegen's subexpression
    # elimination does not reach the occurrences nested in CaseWhen
    # branches, so the split re-ran per occurrence. CollapseProject keeps
    # the two-level projection (a non-cheap alias referenced more than once
    # is not inlined), so `_toks` is computed once per row. Expression math
    # is unchanged — same bits, hash-gate unaffected.
    scored = d.select(
        "doc_id", "text", T.tokens(F.col("text")).alias("_toks")
    ).select(
        "doc_id",
        "text",
        F.size("_toks").cast("bigint").alias("n_tokens"),
        T.quality_score_from_tokens(F.col("_toks")).alias("quality"),
        T.lang_id_from_tokens(F.col("_toks")).alias("pred_lang"),
    )
    kept = scored.where(
        (F.col("quality") >= QUALITY_FLOOR) & (F.col("pred_lang") == KEEP_LANG)
    ).drop("pred_lang")

    w = Window.partitionBy(F.md5("text"))
    exact_kept = (
        kept.withColumn("rep", F.min("doc_id").over(w))
        .where(F.col("doc_id") == F.col("rep"))
        .drop("rep")
    )
    # Three consumers (both self-join branches + the final anti-join) read
    # exact_kept, and its subtree carries the expensive quality/language char
    # folds — persist or every branch recomputes them (measured 36s vs ~6s at
    # sf0.1). Same pattern as the dedup pipeline's `prepared` persist.
    from pyspark import StorageLevel

    exact_kept = exact_kept.persist(StorageLevel.MEMORY_AND_DISK)

    sh = exact_kept.select(
        "doc_id", T.distinct_shingles(F.col("text")).alias("shingles")
    )
    if near_dup_tier == "minhash":
        from datafusion_dedup_ai_spark.operators.dedup import (
            minhash_near_dup_pairs_two_phase,
        )

        victims = (
            minhash_near_dup_pairs_two_phase(sh, threshold=JACCARD_THRESHOLD)
            .select(F.col("id_b").alias("doc_id"))
            .distinct()
        )
        return exact_kept.join(victims, "doc_id", "left_anti").select(
            "doc_id", "n_tokens", "quality"
        )
    sizes = sh.select("doc_id", F.size("shingles").cast("bigint").alias("n_sh"))
    ex = sh.select("doc_id", F.explode("shingles").alias("s"))
    a, b = ex.alias("a"), ex.alias("b")
    inter = (
        a.join(b, (F.col("a.s") == F.col("b.s")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("n_common"))
    )
    sa, sb = sizes.alias("sa"), sizes.alias("sb")
    victims = (
        inter.join(sa, F.col("doc_a") == F.col("sa.doc_id"))
        .join(sb, F.col("doc_b") == F.col("sb.doc_id"))
        .where(
            F.col("n_common").cast("double")
            / (F.col("sa.n_sh") + F.col("sb.n_sh") - F.col("n_common"))
            >= JACCARD_THRESHOLD
        )
        .select(F.col("doc_b").alias("doc_id"))
        .distinct()
    )
    return exact_kept.join(victims, "doc_id", "left_anti").select(
        "doc_id", "n_tokens", "quality"
    )


# ===========================================================================
# Repetition detection (gaps-and-islands over the token sequence)
# ===========================================================================


@register(
    "doc_repetition_stats",
    f"""
    WITH ex AS (
        SELECT doc_id, unnest(range(1, len(t)+1)) AS i, unnest(t) AS tok
        FROM (SELECT doc_id, {_TOKS} AS t FROM documents)
    ), flagged AS (
        SELECT doc_id, i, tok,
               CASE WHEN tok = lag(tok) OVER (PARTITION BY doc_id ORDER BY i)
                    THEN 0 ELSE 1 END AS new_run
        FROM ex
    ), grouped AS (
        SELECT doc_id, i, tok,
               SUM(new_run) OVER (PARTITION BY doc_id ORDER BY i
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_id
        FROM flagged
    ), runs AS (
        SELECT doc_id, run_id, COUNT(*) AS run_len
        FROM grouped GROUP BY doc_id, run_id
    )
    SELECT doc_id,
           CAST(SUM(run_len) AS BIGINT) AS n_tokens,
           CAST(COUNT(*) AS BIGINT) AS n_runs,
           CAST(MAX(run_len) AS BIGINT) AS max_run,
           1.0 - CAST(COUNT(*) AS DOUBLE) / SUM(run_len) AS repetition_ratio
    FROM runs
    GROUP BY doc_id
    """,
)
def q_doc_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition detection — the stuck-generation / boilerplate-spam
    signal: longest run of identical consecutive tokens and the fraction of
    tokens that just repeat their predecessor (1 - runs/tokens). Classic
    gaps-and-islands: lag marks run starts, a running sum labels runs, two
    aggregations summarize. The windows partition by doc_id, so parallelism
    is per-document and no single task ever sees more than one doc's
    tokens."""
    d = load_spread(spark, sf_dir, "documents")
    ex = d.select(
        "doc_id", F.posexplode(T.tokens(F.col("text"))).alias("i", "tok")
    )
    w_seq = Window.partitionBy("doc_id").orderBy("i")
    flagged = ex.withColumn(
        "new_run",
        F.when(F.col("tok") == F.lag("tok").over(w_seq), 0).otherwise(1),
    )
    grouped = flagged.withColumn(
        "run_id",
        F.sum("new_run").over(
            w_seq.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    runs = grouped.groupBy("doc_id", "run_id").agg(F.count("*").alias("run_len"))
    return runs.groupBy("doc_id").agg(
        F.sum("run_len").cast("bigint").alias("n_tokens"),
        F.count("*").cast("bigint").alias("n_runs"),
        F.max("run_len").cast("bigint").alias("max_run"),
        (F.lit(1.0) - F.count("*").cast("double") / F.sum("run_len")).alias(
            "repetition_ratio"
        ),
    )
