"""URL hygiene for web-corpus curation (extension scope): canonicalization
and host extraction as pure Column expressions, with the DuckDB SQL mirrors
generated from the SAME regex constants so the two engines stay in lockstep
by construction (the oracles.py pattern).

Why this exists: a web-scale training corpus keys almost everything on URLs
— recrawl dedup, per-host quality priors, robots/licence policy, domain
mixing budgets — and raw crawl URLs are DIRTY: scheme/host case varies,
default ports and fragments appear and vanish between crawls, and tracking
parameters (utm_*, fbclid, gclid) make the same page look like thousands.
Canonicalization rules implemented (the standard crawl-dedup subset):

  * scheme and host lowercased (path/query case is significant, kept);
  * leading ``www.`` stripped from the host;
  * default ports stripped (``:80`` for http, ``:443`` for https);
  * ``#fragment`` dropped (client-side only, never reaches the server);
  * tracking params removed: any ``utm_*``, ``fbclid``, ``gclid``,
    ``msclkid``, ``ref`` — other params KEPT in original order (reordering
    would change semantics for servers that care, so we don't);
  * a now-empty ``?`` and a trailing ``/`` on a non-root path dropped.

Everything is regexp_replace-composable (no UDF — whole-stage codegen on
the Spark side) and uses only syntax BOTH regex engines accept: Java
(Spark) and RE2 (DuckDB), i.e. no lookaround, no backreference-in-pattern;
replacement backrefs are ``$1`` in Spark and ``\\1`` in DuckDB, translated
below.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_TRACKERS = r"(?:utm_[A-Za-z0-9_]*|fbclid|gclid|msclkid|ref)"

# (pattern, replacement) pipeline, applied in order; replacements use $N
# (Spark form), translated to \\N for DuckDB. All patterns are
# Java+RE2-compatible (no lookaround).
_CANON_STEPS: tuple[tuple[str, str], ...] = (
    # 1. drop the fragment (first, so later steps see no '#')
    (r"#.*$", ""),
    # 2. tracking params: kill 'key=value' where key is a tracker, then
    #    mend separators. A tracker mid-query hands its leading separator
    #    to the next param; a trailing tracker takes its separator with it.
    #    The mid-query rewrite consumes an ENTIRE consecutive-tracker run
    #    in one match — '([?&])(?:tracker=val&)+' with a greedy '+' — so a
    #    single global pass is complete for runs of ANY length (the earlier
    #    x3-unrolled form only cleared ~8-long runs; a 9-tracker URL kept
    #    its tail). Non-capturing group + quantifier is Java- and
    #    RE2-compatible, greedy in both, so parity holds and the whole
    #    pipeline is idempotent (tests assert canon(canon(u)) == canon(u)
    #    on 24-tracker runs).
    (rf"([?&])(?:{_TRACKERS}=[^&#]*&)+", "$1"),
    (rf"[?&]{_TRACKERS}=[^&#]*$", ""),
    # 3. dangling '?' left by param removal
    (r"\?$", ""),
    # 4. default ports (two RE2-safe variants instead of one lookahead:
    #    port followed by path/query/fragment, and port at end-of-string)
    (r"^(https://[^/:?#]+):443([/?#])", "$1$2"),
    (r"^(https://[^/:?#]+):443$", "$1"),
    (r"^(http://[^/:?#]+):80([/?#])", "$1$2"),
    (r"^(http://[^/:?#]+):80$", "$1"),
    # 5. trailing slash on a non-root path — both at end-of-url and
    #    immediately before the query. The prefix requires a '/' AFTER the
    #    authority so the root slash itself never strips ('https://h/'
    #    stays; an early cut of this pattern let [^?#]* swallow the host
    #    and turned the root form into 'https://h').
    (r"^([a-z]+://[^/?#]+/[^?#]*[^/?#])/$", "$1"),
    (r"^([a-z]+://[^/?#]+/[^?#]*[^/?#])/\?", "$1?"),
    # 6. empty path normalized to the root slash ('https://h' and
    #    'https://h?q' name the same resource as their '/' forms)
    (r"^([a-z]+://[^/?#]+)$", "$1/"),
    (r"^([a-z]+://[^/?#]+)\?", "$1/?"),
)

_HEAD_PAT = r"^([A-Za-z]+://[^/?#]*)"
_WWW_PAT = r"^([a-z]+://)www\."
_HOST_PAT = r"^[a-z]+://([^/:?#]+)"
_REG_DOMAIN_PAT = r"([^.]+\.[^.]+)$"


def canonical_url(col: Column) -> Column:
    """The full canonicalization pipeline as one Column expression."""
    head = F.regexp_extract(col, _HEAD_PAT, 1)
    tail = col.substr(F.length(head) + F.lit(1), F.length(col))
    out = F.concat(F.regexp_replace(F.lower(head), _WWW_PAT, "$1"), tail)
    for pat, rep in _CANON_STEPS:
        out = F.regexp_replace(out, pat, rep)
    return out


def url_host(col: Column) -> Column:
    """Host (no port) of an already-canonical url."""
    return F.regexp_extract(col, _HOST_PAT, 1)


def registrable_domain(host: Column) -> Column:
    """Last-two-labels heuristic for the registrable domain (example.com
    from a.b.example.com). A real deployment substitutes the public-suffix
    list; the heuristic is deliberate — PSL data is a lookup-table swap,
    not a shape change."""
    return F.regexp_extract(host, _REG_DOMAIN_PAT, 1)


# ---------------------------------------------------------------------------
# DuckDB mirrors — generated from the SAME constants
# ---------------------------------------------------------------------------


def _duck_rep(rep: str) -> str:
    return rep.replace("$1", "\\1").replace("$2", "\\2")


def sql_canonical_url(expr: str) -> str:
    head = f"regexp_extract({expr}, '{_HEAD_PAT}', 1)"
    tail = f"substring({expr}, length({head}) + 1)"
    # 'g' on every step: Spark's regexp_replace is always global while
    # DuckDB's defaults to first-match-only — without the flag the
    # mid-query tracker step would diverge on multi-param URLs.
    out = (
        f"(regexp_replace(lower({head}), '{_WWW_PAT}', '{_duck_rep('$1')}', 'g')"
        f" || {tail})"
    )
    for pat, rep in _CANON_STEPS:
        out = f"regexp_replace({out}, '{pat}', '{_duck_rep(rep)}', 'g')"
    return out


def sql_url_host(expr: str) -> str:
    return f"regexp_extract({expr}, '{_HOST_PAT}', 1)"


def sql_registrable_domain(expr: str) -> str:
    return f"regexp_extract({expr}, '{_REG_DOMAIN_PAT}', 1)"
