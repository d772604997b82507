"""HTML boilerplate removal / visible-text extraction (extension scope):
the step a web-crawl training pipeline runs BEFORE any text-quality
scoring — raw pages are mostly markup, and every downstream signal
(language ID, quality ratios, dedup shingles, token budgets) is computed
on the visible text, not the tag soup.

Implemented as a pure regexp_replace pipeline (no UDF — whole-stage
codegen on the Spark side), with the DuckDB SQL mirrors generated from
the SAME constants so both engines stay in lockstep by construction (the
functions/urls.py pattern). Extraction rules (the deterministic,
regexp-expressible subset of a trafilatura-class extractor):

  * ``<!-- comments -->``, ``<script>…</script>`` and ``<style>…</style>``
    blocks removed WHOLESALE (their text content is not page text) —
    case-insensitively and across newlines (``(?is)``);
  * every remaining tag ``<…>`` replaced by a space (block boundaries
    must not glue words together);
  * the six standard entities decoded AFTER tag removal (so ``&lt;b&gt;``
    in the source renders as literal ``<b>`` text instead of being
    stripped as a tag): ``&nbsp; &lt; &gt; &quot; &#39; &amp;`` —
    ``&amp;`` last, or ``&amp;lt;`` would double-decode;
  * whitespace collapsed to single spaces and trimmed.

Every pattern uses only syntax BOTH engines accept — Java (Spark) and RE2
(DuckDB): inline ``(?is)`` flags, lazy ``.*?``, no lookaround, no
backreferences. A real deployment swaps in a DOM-aware extractor behind
the same column contract; the regexp tier is the scale-shape-identical
stand-in (one projection, zero shuffles, zero Python).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# (pattern, replacement) applied in order. Block elements go first and
# WHOLE (comments before scripts: a commented-out </script> must not
# terminate a live script block early... and cannot, because the comment
# pass already consumed it).
_STRIP_STEPS: tuple[tuple[str, str], ...] = (
    (r"(?is)<!--.*?-->", " "),
    (r"(?is)<script\b[^>]*>.*?</script>", " "),
    (r"(?is)<style\b[^>]*>.*?</style>", " "),
    (r"(?is)<[^>]+>", " "),
)

# literal (entity, replacement) decodes — order matters, &amp; LAST
_ENTITY_STEPS: tuple[tuple[str, str], ...] = (
    ("&nbsp;", " "),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&amp;", "&"),
)

# Explicit whitespace class instead of \s: Java's \s includes \x0B (vertical
# tab) while RE2's does not, so \s+ is the one construct whose semantics
# would diverge between the two engines this module keeps in lockstep by
# construction (round-9 advice).
_WS_PAT = "[ \\t\\n\\r\\f\\x0B]+"
_TITLE_PAT = r"(?is)<title[^>]*>(.*?)</title>"


def visible_text(col: Column) -> Column:
    """Visible page text as one Column expression (strip -> decode ->
    collapse -> trim)."""
    out = col
    for pat, rep in _STRIP_STEPS:
        out = F.regexp_replace(out, pat, rep)
    for lit, rep in _ENTITY_STEPS:
        # entities contain no regex metacharacters except '#', which is
        # literal in both engines — safe as patterns verbatim
        out = F.regexp_replace(out, lit, rep)
    return F.trim(F.regexp_replace(out, _WS_PAT, " "))


def page_title(col: Column) -> Column:
    """<title> content (raw inner text, '' when absent) — both engines'
    regexp_extract return '' on no-match."""
    return F.regexp_extract(col, _TITLE_PAT, 1)


# ---------------------------------------------------------------------------
# DuckDB mirrors — generated from the SAME constants
# ---------------------------------------------------------------------------


def _q(s: str) -> str:
    return s.replace("'", "''")


def sql_visible_text(expr: str) -> str:
    out = expr
    for pat, rep in _STRIP_STEPS:
        out = f"regexp_replace({out}, '{_q(pat)}', '{_q(rep)}', 'g')"
    for lit, rep in _ENTITY_STEPS:
        out = f"regexp_replace({out}, '{_q(lit)}', '{_q(rep)}', 'g')"
    return f"trim(regexp_replace({out}, '{_WS_PAT}', ' ', 'g'))"


def sql_page_title(expr: str) -> str:
    return f"regexp_extract({expr}, '{_q(_TITLE_PAT)}', 1)"
