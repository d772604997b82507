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
