"""Bounded-memory frequency sketches for heavy-hitter mining at corpus scale.

``corpus_top_terms`` (queries_text.py) is the EXACT path: explode + groupBy,
one shuffle whose width is the vocabulary. On web-scale corpora the
vocabulary (URLs, hostnames, n-grams, typo'd tokens) can be billions of keys
— the shuffle itself becomes the bottleneck and most keys are long-tail
noise nobody asked for. The Misra-Gries summary bounds state to k counters
per partition regardless of vocabulary size, and partition summaries merge
by plain addition: each partition's counter underestimates the true
partition count by at most N_p/(k+1), so the summed merge underestimates the
global count by at most N/(k+1) (Misra & Gries 1982; merge bound per
Agarwal et al., "Mergeable Summaries", PODS 2012). Every term with true
frequency > N/(k+1) is guaranteed to survive at least one partition summary.

Spark shape: the only Python is the per-partition sketch loop (mapInPandas,
Arrow-batched — the sketch is WHY the state fits in memory, imperative by
nature); the merge is a plain groupBy-sum over at most
``num_partitions * k`` rows — a few KB regardless of corpus size.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def misra_gries_terms(
    docs: DataFrame,
    text_col: str = "text",
    k: int = 8,
) -> DataFrame:
    """(term, mg_count): merged Misra-Gries lower-bound counts, at most k
    terms per partition summary before the merge.

    Tokenization is a single-space split, matching functions/text.py::tokens
    on this corpus (documents are single-space normalized — pinned by the
    oracle-gated token queries)."""

    def sketch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict[str, int] = {}
        for pdf in batches:
            for text in pdf[text_col]:
                if text is None:
                    continue
                for tok in text.split(" "):
                    if tok in counters:
                        counters[tok] += 1
                    elif len(counters) < k:
                        counters[tok] = 1
                    else:
                        # decrement-all step; drop zeroed counters
                        dead = []
                        for t in counters:
                            counters[t] -= 1
                            if counters[t] == 0:
                                dead.append(t)
                        for t in dead:
                            del counters[t]
        yield pd.DataFrame(
            {"term": list(counters.keys()), "cnt": list(counters.values())}
        )

    summaries = docs.select(text_col).mapInPandas(sketch, "term string, cnt long")
    return summaries.groupBy("term").agg(F.sum("cnt").alias("mg_count"))


def heavy_hitters_report(
    docs: DataFrame,
    text_col: str = "text",
    k: int = 8,
) -> DataFrame:
    """Self-grading heavy-hitter report: Misra-Gries estimates joined to the
    exact counts, with the per-term underestimate and the theoretical error
    bound N/(k+1) as columns (the ann_recall_report pattern — the sketch
    grades itself against the exact path on the same frame).

    Output: (term, mg_count, exact_count, underestimate, error_bound) for
    every term the merged summary retained. Properties asserted in
    tests/test_sketches.py: 0 <= underestimate <= error_bound, and every
    term with exact_count > error_bound is present.
    """
    mg = misra_gries_terms(docs, text_col, k)
    exact = (
        docs.select(F.explode(F.split(F.col(text_col), " ")).alias("term"))
        .groupBy("term")
        .agg(F.count("*").alias("exact_count"))
    )
    total = docs.select(
        F.sum(F.size(F.split(F.col(text_col), " "))).alias("n_tokens")
    )
    return (
        mg.join(exact, "term")
        .crossJoin(F.broadcast(total))
        .select(
            "term",
            "mg_count",
            "exact_count",
            (F.col("exact_count") - F.col("mg_count")).alias("underestimate"),
            (F.col("n_tokens") / F.lit(k + 1)).cast("bigint").alias("error_bound"),
        )
    )


# ---------------------------------------------------------------------------
# KMV (K-minimum-values) distinct-count sketch
# ---------------------------------------------------------------------------

# 60-bit md5-prefix hash: fits a Spark LongType exactly, and collision
# probability over any realistic vocabulary is negligible (2^-60 per pair).
_KMV_BITS = 60
_KMV_SPACE = float(1 << _KMV_BITS)


def kmv_partials(
    docs: DataFrame,
    text_col: str = "text",
    k: int = 64,
    gram: int = 1,
) -> DataFrame:
    """Per-partition KMV state: the k smallest DISTINCT 60-bit hashes of the
    token `gram`-grams, one bounded heap per partition (Bar-Yossef et al.
    2002). Like the Misra-Gries loop above, the imperative per-partition
    pass is the point — the sketch is why state stays at k longs no matter
    how wide the vocabulary is; a DataFrame `distinct()` would shuffle the
    full vocabulary."""

    def sketch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib
        import heapq

        heap: list[int] = []  # max-heap via negation
        seen: set[int] = set()
        for pdf in batches:
            for text in pdf[text_col]:
                if text is None:
                    continue
                toks = text.split(" ")
                units = (
                    toks
                    if gram == 1
                    else [
                        " ".join(toks[i : i + gram])
                        for i in range(len(toks) - gram + 1)
                    ]
                )
                for tok in units:
                    h = int(
                        hashlib.md5(tok.encode("utf-8")).hexdigest()[:15], 16
                    )
                    if h in seen:
                        continue
                    if len(heap) < k:
                        heapq.heappush(heap, -h)
                        seen.add(h)
                    elif h < -heap[0]:
                        evicted = -heapq.heappushpop(heap, -h)
                        seen.discard(evicted)
                        seen.add(h)
        yield pd.DataFrame({"h": sorted(seen)})

    return docs.select(text_col).mapInPandas(sketch, "h long")


def kmv_distinct_report(
    docs: DataFrame,
    text_col: str = "text",
    k: int = 64,
    gram: int = 1,
) -> DataFrame:
    """Self-grading KMV cardinality estimate, one row: (k, n_state,
    kth_frac, est_distinct, exact_distinct, rel_error).

    Merge law: the k smallest distinct GLOBAL hashes are the k smallest of
    the union of per-partition k-smallest states — so the merge is
    distinct + top-k over at most partitions*k rows (a few KB), and the
    merged state is partitioning-invariant (pinned in tests/test_sketches.py).
    Estimator: with m = the k-th smallest hash mapped to (0,1],
    est = (k-1)/m; standard error ~ 1/sqrt(k-2). When the state holds fewer
    than k hashes the vocabulary itself is < k and the state IS the exact
    answer. The exact distinct count is computed alongside for the grade —
    at real scale that column is the expensive path the sketch replaces."""
    partials = kmv_partials(docs, text_col, k, gram=gram)
    merged = partials.distinct().orderBy("h").limit(k)
    state = merged.agg(
        F.count("*").alias("n_state"),
        F.max("h").alias("kth_hash"),
    )
    toks = F.split(F.col(text_col), " ")
    units = (
        toks
        if gram == 1
        else F.transform(
            F.slice(toks, 1, F.greatest(F.size(toks) - (gram - 1), F.lit(0))),
            lambda _, i: F.concat_ws(
                " ", F.slice(toks, i + 1, gram)
            ),
        )
    )
    exact = (
        docs.select(F.explode(units).alias("term"))
        .agg(F.countDistinct("term").alias("exact_distinct"))
    )
    est = F.when(
        F.col("n_state") < k, F.col("n_state").cast("double")
    ).otherwise(
        F.lit(float(k - 1)) / ((F.col("kth_hash") + F.lit(1.0)) / F.lit(_KMV_SPACE))
    )
    return (
        state.crossJoin(F.broadcast(exact))
        .select(
            F.lit(k).cast("bigint").alias("k"),
            F.col("n_state").cast("bigint").alias("n_state"),
            ((F.col("kth_hash") + F.lit(1.0)) / F.lit(_KMV_SPACE)).alias("kth_frac"),
            est.alias("est_distinct"),
            F.col("exact_distinct").cast("bigint").alias("exact_distinct"),
            (
                F.abs(est - F.col("exact_distinct"))
                / F.col("exact_distinct")
            ).alias("rel_error"),
        )
    )
