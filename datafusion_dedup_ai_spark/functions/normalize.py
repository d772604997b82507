"""Name-normalization operators N1-N5, B1 and the J3 token-sort key — all pure
Column expressions (JVM-side, whole-stage-codegen friendly; no Python in the
hot path).

Semantics match the reference (engine.py:43-70, 185-208) exactly on ASCII
input; see each function's note on the Python-``\\w``-vs-Java-regex Unicode gap
(SURVEY.md §7 R2).
"""

from __future__ import annotations

import re as _re
from functools import reduce

from pyspark.sql import Column
from pyspark.sql import functions as F

from datafusion_dedup_ai_spark.config import (
    COUNTRY_TOKENS,
    LEGAL_SUFFIXES,
    SUFFIX_STRIP_PASSES,
    DEFAULT_ACRONYM_MAP,
)

# ---------------------------------------------------------------------------
# N1 — normalize: upper, strip punctuation except & / -, collapse whitespace.
# Reference engine.py:43-51. The reference uses Python `re`, whose \w/\s/\b
# are Unicode; Java regex defaults them to ASCII. The engine therefore embeds
# the (?U) flag (UNICODE_CHARACTER_CLASS) by DEFAULT, so "Müller GmbH" or
# "Société Générale S.A." normalize exactly as the reference does
# (tests/test_normalize.py pins Spark == Python `re` on non-ASCII fixtures).
# ``unicode_aware=False`` restores the ASCII classes. Judged queries are
# unaffected either way: the testdata is ASCII, where both agree (and the
# DuckDB oracles' RE2 has no (?U), which is why the GATED fixtures stay
# ASCII — SURVEY.md §7 R2).
# ---------------------------------------------------------------------------

_UFLAG = "(?U)"


def _u(pattern: str, unicode_aware: bool) -> str:
    return (_UFLAG + pattern) if unicode_aware else pattern


def normalize_name(col: Column, unicode_aware: bool = True) -> Column:
    s = F.upper(F.coalesce(col.cast("string"), F.lit("")))
    s = F.regexp_replace(s, _u(r"[^\w\s&/-]", unicode_aware), " ")
    s = F.regexp_replace(s, _u(r"\s+", unicode_aware), " ")
    return F.trim(s)


# ---------------------------------------------------------------------------
# N2/N3 — trailing-token deletion to fixpoint (reference engine.py:53-70).
#
# The reference's outer loop runs to fixpoint; each pass applies EVERY suffix
# in list order (longest-first) as its own `\bSFX$`-delete + strip. The pass
# structure is semantic: "X PVT LTD LIMITED INC" ends at "X PVT" (INC stripped
# in pass 1; LIMITED then the *bare* LTD stripped sequentially in pass 2,
# leaving PVT which is not a suffix) — a longest-match-first alternation would
# give "X" instead. So each pass is replicated as a chain of per-token
# regexp_replace expressions, and SUFFIX_STRIP_PASSES bounds the outer loop
# (extra passes are no-ops at fixpoint; only adversarial chains of one suffix
# repeated > passes times diverge — documented, unreachable in real data).
# All JVM-side; each regex is compiled once per expression instance.
# ---------------------------------------------------------------------------


def _token_patterns(tokens: tuple[str, ...], unicode_aware: bool) -> tuple[str, ...]:
    # \b is Unicode-sensitive too: without (?U), "CAFÉLTD" has an ASCII word
    # boundary between É and L and the suffix would be wrongly stripped.
    return tuple(_u(rf"\b{_re.escape(t)}$", unicode_aware) for t in tokens)


def _any_trailing_guard(tokens: tuple[str, ...], unicode_aware: bool) -> str:
    alts = "|".join(_re.escape(t) for t in tokens)
    return _u(rf"\b(?:{alts})$", unicode_aware)


# Both variants precomputed so the regexes stay foldable literals (constraint
# 2 in _strip_trailing_fixpoint) whichever flag the caller picks.
_SUFFIX_PATTERNS = {
    u: _token_patterns(LEGAL_SUFFIXES, u) for u in (False, True)
}
_COUNTRY_PATTERNS = {
    u: _token_patterns(COUNTRY_TOKENS, u) for u in (False, True)
}
_SUFFIX_GUARD = {u: _any_trailing_guard(LEGAL_SUFFIXES, u) for u in (False, True)}
_COUNTRY_GUARD = {u: _any_trailing_guard(COUNTRY_TOKENS, u) for u in (False, True)}


def _strip_trailing_fixpoint(
    col: Column, patterns: tuple[str, ...], guard: str, passes: int
) -> Column:
    # Three constraints shape this expression:
    # 1. A naive chain of passes*len(patterns) regexp_replace nodes overflows
    #    the Catalyst analyzer stack (deep trees) — so passes fold via ONE
    #    higher-order `aggregate` over the pass indices (constant depth).
    # 2. Regex patterns must be FOLDABLE literals: a non-foldable pattern (a
    #    lambda variable) forces Pattern.compile on every evaluation —
    #    measured ~7 ms/row vs ~30 us/row with precompiled literals.
    # 3. The accumulator inside the lambda is a variable (cheap leaf), so the
    #    guard can reference it three times without duplicating subtrees.
    # Each pass is gated by the single-alternation rlike guard: once a name no
    # longer ends in any strip token, remaining passes cost one probe each.
    def one_pass(acc: Column) -> Column:
        chain = reduce(lambda cc, p: F.trim(F.regexp_replace(cc, p, "")), patterns, acc)
        return F.when(acc.rlike(guard), chain).otherwise(acc)

    return F.aggregate(
        F.sequence(F.lit(1), F.lit(passes)), col, lambda acc, _: one_pass(acc)
    )


def strip_legal_suffixes(
    col: Column, passes: int = SUFFIX_STRIP_PASSES, unicode_aware: bool = True
) -> Column:
    """N2: repeatedly delete a trailing legal-form token (reference engine.py:53-60)."""
    return _strip_trailing_fixpoint(
        col, _SUFFIX_PATTERNS[unicode_aware], _SUFFIX_GUARD[unicode_aware], passes
    )


def fold_subsidiaries(
    col: Column, passes: int = SUFFIX_STRIP_PASSES, unicode_aware: bool = True
) -> Column:
    """N3: repeatedly delete a trailing country token (reference engine.py:62-70)."""
    return _strip_trailing_fixpoint(
        col, _COUNTRY_PATTERNS[unicode_aware], _COUNTRY_GUARD[unicode_aware], passes
    )


# ---------------------------------------------------------------------------
# N4 — acronym/alias exact-match rewrite (reference engine.py:34-41, 190-191).
# Small maps inline as a literal MAP lookup (constant-folded by Catalyst); a
# large user map should instead be a broadcast left join + coalesce.
# ---------------------------------------------------------------------------


def apply_acronym_map(col: Column, mapping: dict[str, str] | None = None) -> Column:
    mapping = DEFAULT_ACRONYM_MAP if mapping is None else mapping
    if not mapping:
        return col
    kv: list[Column] = []
    for k, v in mapping.items():
        kv.append(F.lit(k))
        kv.append(F.lit(v))
    return F.coalesce(F.create_map(*kv)[col], col)


# ---------------------------------------------------------------------------
# N5 — composition: norm -> strip -> fold -> alias (reference engine.py:185-192).
# ---------------------------------------------------------------------------


def plan_barrier(col: Column) -> Column:
    """Identity wrapper that stops Catalyst from INLINING an expensive
    expression into every downstream consumer. CollapseProject and
    push-predicate-through-project refuse to substitute non-deterministic
    expressions, and ``shuffle()`` carries that marker; on a single-element
    array it is semantically the identity (nulls pass through). Without this,
    deriving block_key + token_key from base_name re-evaluates the whole
    normalize/strip/fold chain three times per row."""
    return F.shuffle(F.array(col))[0]


def base_name(
    col: Column,
    mapping: dict[str, str] | None = None,
    no_subsidiary_fold: bool = False,
) -> Column:
    b = strip_legal_suffixes(normalize_name(col))
    if not no_subsidiary_fold:
        b = fold_subsidiaries(b)
    return plan_barrier(apply_acronym_map(b, mapping))


# ---------------------------------------------------------------------------
# B1 — blocking key: first_char + "_" + len//5 + "_" + first_token; "NONE" for
# empty base (reference engine.py:194-200). This is the join-space pruning that
# turns the O(n^2) fuzzy match into an equi-join shuffle key at scale.
# ---------------------------------------------------------------------------


def block_key(base: Column) -> Column:
    return F.when(base == "", F.lit("NONE")).otherwise(
        F.concat_ws(
            "_",
            F.substring(base, 1, 1),
            (F.length(base) / F.lit(5)).cast("bigint").cast("string"),
            F.split(base, " ")[0],
        )
    )


# ---------------------------------------------------------------------------
# J3 — token-sorted key: "".join(sorted(s.split())) (reference engine.py:205-208).
# Computed once per row as a join key, not per pair.
# ---------------------------------------------------------------------------


def token_sort_key(base: Column) -> Column:
    return F.array_join(F.array_sort(F.split(base, " ")), "")
