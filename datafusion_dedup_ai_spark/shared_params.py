"""Cross-pack shared parameters, registration-free.

Several extras-pack oracles embed constants that also parameterize the
similarity / incremental-dedup packs (thresholds, the deterministic
corpus/batch split predicates, the DuckDB cosine mirror). They used to live
in those packs' modules, which meant a module-level import from
queries_extras transitively REGISTERED the other pack mid-stream — and
registration order is the driver's correctness-window order
(entry_queries.py). Hoisting them here keeps the round-6 window rotation
pure: importing queries_extras registers only extras entries.

The origin packs re-export these names unchanged, so existing imports and
tests keep working.
"""

from __future__ import annotations

# --- similarity pack (queries_similarity) ---------------------------------
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


# --- incremental-dedup pack (queries_dedup_ext) ---------------------------
# Deterministic corpus/batch split of the documents table: 80% existing
# corpus, 20% incoming batch.
_CORPUS_PRED = "doc_id % 10 < 8"
_BATCH_PRED = "doc_id % 10 >= 8"
