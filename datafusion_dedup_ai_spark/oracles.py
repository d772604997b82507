"""DuckDB-SQL mirrors of the engine's Column expressions.

The driver's t2 correctness gate runs each ``queries()[name]`` Spark plan AND
the ``oracle_sql()[name]`` string on the same parquet and hash-compares the
results. These generators build the SQL from the *same* config constants the
Spark side uses, so the two stay in lockstep by construction.

Dialect notes (verified against DuckDB 1.0.0):
- DuckDB ``regexp_replace`` replaces the FIRST match unless the 'g' flag is
  given; Spark replaces all. Anchored ``...$`` patterns match at most once, so
  only the unanchored rewrites need 'g'.
- RE2 ``\\w`` is ASCII, same as Java's default — parity holds on ASCII data
  (SURVEY.md §7 R2).
- The suffix-strip fixpoint mirrors the Spark HOF fold: a guarded
  ``list_reduce`` over the same flattened pattern sequence.
"""

from __future__ import annotations

import re as _re

from datafusion_dedup_ai_spark.config import (
    COUNTRY_TOKENS,
    DEFAULT_ACRONYM_MAP,
    LEGAL_SUFFIXES,
    SUFFIX_STRIP_PASSES,
)


def _q(s: str) -> str:
    """SQL single-quote a literal."""
    return "'" + s.replace("'", "''") + "'"


def sql_normalize(expr: str) -> str:
    """N1 mirror of functions.normalize.normalize_name."""
    s = f"upper(coalesce(CAST({expr} AS VARCHAR), ''))"
    s = f"regexp_replace({s}, '[^\\w\\s&/-]', ' ', 'g')"
    s = f"regexp_replace({s}, '\\s+', ' ', 'g')"
    return f"trim({s})"


def _sql_strip_fixpoint(expr: str, tokens: tuple[str, ...], passes: int) -> str:
    patterns = [rf"\b{_re.escape(t)}$" for t in tokens] * passes
    pattern_list = "[" + ", ".join(_q(p) for p in patterns) + "]"
    guard_alts = "|".join(_re.escape(t) for t in tokens)
    guard = _q(rf"\b(?:{guard_alts})$")
    fold = (
        f"list_reduce(list_prepend({expr}, {pattern_list}), "
        f"(acc, p) -> trim(regexp_replace(acc, p, '')))"
    )
    return f"(CASE WHEN regexp_matches({expr}, {guard}) THEN {fold} ELSE {expr} END)"


def sql_strip_suffixes(expr: str, passes: int = SUFFIX_STRIP_PASSES) -> str:
    """N2 mirror."""
    return _sql_strip_fixpoint(expr, LEGAL_SUFFIXES, passes)


def sql_fold_subsidiaries(expr: str, passes: int = SUFFIX_STRIP_PASSES) -> str:
    """N3 mirror."""
    return _sql_strip_fixpoint(expr, COUNTRY_TOKENS, passes)


def sql_acronym_map(expr: str, mapping: dict[str, str] | None = None) -> str:
    """N4 mirror."""
    mapping = DEFAULT_ACRONYM_MAP if mapping is None else mapping
    if not mapping:
        return expr
    whens = " ".join(
        f"WHEN {expr} = {_q(k)} THEN {_q(v)}" for k, v in mapping.items()
    )
    return f"(CASE {whens} ELSE {expr} END)"


def sql_base_name(
    expr: str,
    mapping: dict[str, str] | None = None,
    no_subsidiary_fold: bool = False,
) -> str:
    """N5 mirror (norm -> strip -> fold -> alias)."""
    b = sql_strip_suffixes(sql_normalize(expr))
    if not no_subsidiary_fold:
        b = sql_fold_subsidiaries(b)
    return sql_acronym_map(b, mapping)


def sql_block_key(expr: str) -> str:
    """B1 mirror."""
    return (
        f"(CASE WHEN {expr} = '' THEN 'NONE' ELSE "
        f"concat(substr({expr}, 1, 1), '_', "
        f"CAST(length({expr}) // 5 AS VARCHAR), '_', "
        f"string_split({expr}, ' ')[1]) END)"
    )


def sql_token_sort_key(expr: str) -> str:
    """J3 mirror."""
    return f"list_aggr(list_sort(string_split({expr}, ' ')), 'string_agg', '')"


def sql_confidence(ratio: str, token_match: str) -> str:
    """C2 mirror (tiers from config)."""
    return (
        f"(CASE WHEN {token_match} AND {ratio} >= 0.90 THEN 0.98 "
        f"WHEN {ratio} >= 0.90 THEN 0.95 "
        f"WHEN {ratio} >= 0.85 THEN 0.88 "
        f"ELSE 0.70 END)"
    )


def sql_reason(ratio: str, token_match: str) -> str:
    return (
        f"(CASE WHEN {token_match} AND {ratio} >= 0.90 "
        f"THEN 'token-sorted match AND ratio >= 0.90' "
        f"WHEN {ratio} >= 0.90 THEN 'ratio >= 0.90' "
        f"WHEN {ratio} >= 0.85 THEN 'ratio >= 0.85' "
        f"ELSE 'Isolated or weak match' END)"
    )


# Spark's US_ENGLISH soundex mapping (UTF8String.soundex): A..Z ->
# 0123 0127 0224 5501 2623 0172 02, where 7 marks H/W ("silent": skipped
# WITHOUT touching the last-code state) and 0 marks vowels+Y (emit nothing,
# reset the last-code state so a repeated consonant across a vowel emits).
_SOUNDEX_DIGITS = "01230127022455012623017202"


def sql_soundex(expr: str) -> str:
    """DuckDB mirror of Spark's ``soundex`` for UPPERCASE ALPHABETIC input
    (the phonetic-blocking query feeds it `[A-Z]+` tokens only — Spark's
    non-letter fallback branches are out of contract and pinned as such in
    tests/test_normalize.py::test_soundex_parity). Implemented as a
    list_reduce fold over the character stream with the (output, last-code)
    state encoded in a VARCHAR accumulator ('out|last'), the same
    same-type-accumulator trick as the suffix-strip fixpoint."""
    d_first = f"translate({expr}[1], 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', '{_SOUNDEX_DIGITS}')"
    chars = f"[{expr}[i] FOR i IN range(2, len({expr}) + 1)]"
    step = (
        "(acc, c) -> CASE "
        # 4 output chars reached: the Java loop breaks — state frozen
        "WHEN len(split_part(acc, '|', 1)) >= 4 THEN acc "
        # H/W: skipped entirely, last-code untouched
        f"WHEN translate(c, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', '{_SOUNDEX_DIGITS}') = '7' THEN acc "
        # vowels: emit nothing, reset last-code
        f"WHEN translate(c, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', '{_SOUNDEX_DIGITS}') = '0' "
        "THEN split_part(acc, '|', 1) || '|0' "
        # same code as previous: collapse, keep state
        f"WHEN translate(c, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', '{_SOUNDEX_DIGITS}') = split_part(acc, '|', 2) "
        f"THEN split_part(acc, '|', 1) || '|' || translate(c, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', '{_SOUNDEX_DIGITS}') "
        # new code: emit and remember
        f"ELSE split_part(acc, '|', 1) || translate(c, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', '{_SOUNDEX_DIGITS}') "
        f"|| '|' || translate(c, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', '{_SOUNDEX_DIGITS}') END"
    )
    fold = (
        f"list_reduce(list_prepend({expr}[1] || '|' || {d_first}, {chars}), {step})"
    )
    return (
        f"(CASE WHEN {expr} = '' OR {expr} IS NULL THEN '' "
        f"ELSE rpad(split_part({fold}, '|', 1), 4, '0') END)"
    )


def sql_connected_components(pairs_cte: str, universe_sql: str, id_col: str) -> str:
    """CTE chain labeling every id in ``universe_sql`` with the MIN id of its
    connected component over the undirected edge set in ``pairs_cte``
    (columns id_a, id_b) — the exact semantics of
    operators/clustering.cluster_label_propagation. Requires the enclosing
    query to open with WITH RECURSIVE. ``walk`` is a transitive closure
    (O(|component| * |edges|) rows — fine for oracle-scale graphs; the Spark
    side's iterative hash-min is the form that scales). Produces CTEs:
    ``fullset(id_col, cluster_id)`` and ``csize(cluster_id, cluster_size,
    rep)``."""
    return f"""
    edges AS (
        SELECT id_a AS a, id_b AS b FROM {pairs_cte}
        UNION ALL SELECT id_b, id_a FROM {pairs_cte}
    ),
    walk(node, reach) AS (
        SELECT DISTINCT a, a FROM edges
        UNION
        SELECT w.node, e.b FROM walk w JOIN edges e ON w.reach = e.a
    ),
    cc_labels AS (
        SELECT node AS id, MIN(reach) AS cluster_id FROM walk GROUP BY node
    ),
    cc_universe AS ({universe_sql}),
    fullset AS (
        SELECT u.{id_col}, COALESCE(l.cluster_id, u.{id_col}) AS cluster_id
        FROM cc_universe u LEFT JOIN cc_labels l ON l.id = u.{id_col}
    ),
    csize AS (
        SELECT cluster_id, COUNT(*) AS cluster_size, MIN({id_col}) AS rep
        FROM fullset GROUP BY cluster_id
    )"""


def sql_greedy_min_id_dropped(pairs_cte: str) -> str:
    """CTE chain computing the ids DROPPED by sequential-by-id leader dedup
    (greedy lexicographically-first maximal independent set) over the
    undirected pair graph in ``pairs_cte`` (columns id_a, id_b) — the exact
    semantics of operators/dedup.greedy_min_id_dropped, replayed as the same
    parallel rounds: each round promotes every undecided vertex with no
    SMALLER undecided neighbor to leader and drops the new leaders'
    undecided neighbors. Requires the enclosing query to open with WITH
    RECURSIVE.

    A recursive CTE may reference itself only once, but each greedy round
    needs the full decided/undecided sets on both sides of its joins — so
    the state travels as ONE ROW PER ROUND with the sets as sorted BIGINT
    lists, and the per-round set algebra runs in LATERAL subqueries over
    ``unnest`` (the non-recursive ``g_edges`` CTE may be referenced freely).
    Rounds = O(longest sequential dependency chain) — tiny for near-dup
    graphs; per-round cost is |undecided| x degree list probes, fine at
    oracle scale (the Spark side's shuffle-round formulation is the shape
    that scales). Produces CTE ``gdropped(id)``; survivors = universe minus
    gdropped."""
    return f"""
    g_edges AS (
        SELECT id_a AS u, id_b AS v FROM {pairs_cte}
        UNION ALL SELECT id_b, id_a FROM {pairs_cte}
    ),
    g_verts AS (SELECT DISTINCT u AS id FROM g_edges),
    g_state(it, undecided, dropped) AS (
        SELECT 0,
               (SELECT coalesce(list(id ORDER BY id), CAST([] AS BIGINT[]))
                FROM g_verts),
               CAST([] AS BIGINT[])
        UNION ALL
        SELECT s.it + 1,
               list_filter(s.undecided,
                   x -> NOT list_contains(L.leaders, x)
                    AND NOT list_contains(D.newly, x)),
               list_concat(s.dropped, D.newly)
        FROM g_state s,
        LATERAL (
            SELECT coalesce(list(x ORDER BY x), CAST([] AS BIGINT[])) AS leaders
            FROM unnest(s.undecided) AS t(x)
            WHERE NOT EXISTS (
                SELECT 1 FROM g_edges e
                WHERE e.u = x AND e.v < x
                  AND list_contains(s.undecided, e.v))
        ) L,
        LATERAL (
            SELECT coalesce(list(y ORDER BY y), CAST([] AS BIGINT[])) AS newly
            FROM unnest(s.undecided) AS t(y)
            WHERE EXISTS (
                SELECT 1 FROM g_edges e
                WHERE e.u = y AND list_contains(L.leaders, e.v))
        ) D
        WHERE len(s.undecided) > 0
    ),
    gdropped AS (
        SELECT unnest(dropped) AS id FROM g_state
        WHERE it = (SELECT max(it) FROM g_state)
    )"""
