"""Unit tests for N1-N5/B1/J3 against a plain-Python reimplementation of the
reference semantics (engine.py:43-70, 185-208) — including hypothesis property
tests for the fixpoint/idempotence guarantees (SURVEY.md §5)."""

from __future__ import annotations

import re

import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from datafusion_dedup_ai_spark.config import (
    COUNTRY_TOKENS,
    DEFAULT_ACRONYM_MAP,
    LEGAL_SUFFIXES,
)
from datafusion_dedup_ai_spark.functions.normalize import (
    base_name,
    block_key,
    normalize_name,
    token_sort_key,
)


# --- plain-Python oracle (reference semantics, ASCII regime) ---------------

def py_normalize(name) -> str:
    if name is None:
        return ""
    s = str(name).upper()
    s = re.sub(r"[^a-zA-Z0-9_\s&/-]", " ", s)  # ASCII \w regime (Java parity)
    s = re.sub(r"\s+", " ", s).strip()
    return s


def py_strip_fixpoint(name: str, tokens) -> str:
    prev = None
    while name != prev:
        prev = name
        for t in tokens:
            name = re.sub(rf"\b{re.escape(t)}$", "", name).strip()
    return name


def py_base(name) -> str:
    b = py_strip_fixpoint(py_normalize(name), LEGAL_SUFFIXES)
    b = py_strip_fixpoint(b, COUNTRY_TOKENS)
    return DEFAULT_ACRONYM_MAP.get(b, b)


def py_block_key(base: str) -> str:
    if not base:
        return "NONE"
    toks = base.split()
    return f"{base[0]}_{len(base) // 5}_{toks[0] if toks else 'NONE'}"


def spark_eval(spark, names, col_expr):
    df = spark.createDataFrame([(n,) for n in names], ["name"])
    return [r[0] for r in df.select(col_expr(F.col("name"))).collect()]


CASES = [
    "IBM India Pvt Ltd",
    "IBM",
    "TCS",
    "Tata Consultancy Services Limited",
    "Google LLC",
    "Alphabet Inc",
    "Microsoft",
    "Ltd",
    None,
    "",
    "  apple, inc.  ",
    "ACME CO LTD",
    "X Pvt Ltd Limited Inc",
    "Siemens GmbH & Co KG",
    "Banco S.A. DE C.V.",
    "Weird & Sons Co.",
    "TATA CONSULTANCY SERVICES INDIA PRIVATE LIMITED",
    "HDFC",
    "A/B TESTING A/S",
    "ltd ltd ltd",
]


def test_normalize_matches_reference(spark):
    got = spark_eval(spark, CASES, normalize_name)
    assert got == [py_normalize(n) for n in CASES]


def test_base_name_matches_reference(spark):
    got = spark_eval(spark, CASES, base_name)
    assert got == [py_base(n) for n in CASES]


def test_block_key_matches_reference(spark):
    got = spark_eval(spark, CASES, lambda c: block_key(base_name(c)))
    assert got == [py_block_key(py_base(n)) for n in CASES]


def test_token_sort_key(spark):
    got = spark_eval(spark, ["IBM INDIA", "INDIA IBM", "B A C", ""], token_sort_key)
    assert got == ["IBMINDIA", "IBMINDIA", "ABC", ""]


# --- Unicode regime: Spark default (?U) == Python `re` defaults -----------
#
# The reference runs Python `re`, whose \w/\s/\b are Unicode. The engine's
# normalize/strip/fold embed (?U) by default; this pins Spark == the TRUE
# reference semantics on non-ASCII names (the ASCII mirrors above cover the
# regime the DuckDB-gated queries run in). Fixtures are NFC-composed: Java's
# (?U)\w includes nonspacing marks (Mn) while Python's \w does not, so
# DECOMPOSED accents are a documented residual divergence — real-world text
# normalization NFC-folds first.

def py_normalize_unicode(name) -> str:
    if name is None:
        return ""
    s = str(name).upper()
    s = re.sub(r"[^\w\s&/-]", " ", s)  # Python \w/\s: Unicode by default
    s = re.sub(r"\s+", " ", s).strip()
    return s


def py_base_unicode(name) -> str:
    b = py_strip_fixpoint(py_normalize_unicode(name), LEGAL_SUFFIXES)
    b = py_strip_fixpoint(b, COUNTRY_TOKENS)
    return DEFAULT_ACRONYM_MAP.get(b, b)


UNICODE_CASES = [
    "Müller GmbH",
    "Société Générale S.A.",
    "CaféLtd",  # NO Unicode word boundary between É and L: suffix must survive
    "Café Ltd",
    "Zürich Insurance Co",
    "Nestlé S.A.",
    "ÀCME-CORP Ltd",
    "naïve & Søn A/S",
    "Straße GmbH & Co KG",
    "ПАО Газпром",
    "株式会社トヨタ",
    "Łódź Tekstylia SP Z O O",
]


def test_unicode_normalize_matches_python_re(spark):
    got = spark_eval(spark, UNICODE_CASES, normalize_name)
    assert got == [py_normalize_unicode(n) for n in UNICODE_CASES]


def test_unicode_base_name_matches_python_re(spark):
    got = spark_eval(spark, UNICODE_CASES, base_name)
    assert got == [py_base_unicode(n) for n in UNICODE_CASES]
    # the boundary case that ASCII \b gets WRONG: ASCII regex sees a word
    # boundary inside CAFÉLTD (É is a non-word char to ASCII \b) and strips
    # the suffix; Unicode keeps the name intact
    cafeltd = spark_eval(spark, ["CaféLtd"], base_name)[0]
    assert cafeltd == "CAFÉLTD"


name_strategy = st.text(
    alphabet=st.sampled_from(
        list("ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789 .,&/-")
    ),
    max_size=40,
)


@settings(max_examples=10, deadline=None)
@given(st.lists(name_strategy, min_size=1, max_size=20))
def test_property_parity_random_names(spark, names):
    got_norm = spark_eval(spark, names, normalize_name)
    got_base = spark_eval(spark, names, base_name)
    assert got_norm == [py_normalize(n) for n in names]
    assert got_base == [py_base(n) for n in names]


@settings(max_examples=50, deadline=None)
@given(name_strategy)
def test_property_normalize_idempotent(name):
    once = py_normalize(name)
    assert py_normalize(once) == once


@settings(max_examples=50, deadline=None)
@given(name_strategy)
def test_property_strip_is_fixpoint(name):
    stripped = py_strip_fixpoint(py_normalize(name), LEGAL_SUFFIXES)
    assert py_strip_fixpoint(stripped, LEGAL_SUFFIXES) == stripped


def test_band_join_exact_vs_naive(spark):
    """band_join catches exactly the naive inequality-join pairs, including
    across band boundaries and for negative values."""
    from pyspark.sql import functions as F

    from datafusion_dedup_ai_spark.operators.rangejoin import band_join

    vals = [(i, v) for i, v in enumerate(
        [-25.0, -10.0, -9.9999, -0.01, 0.0, 0.01, 9.99, 10.0, 15.0, 19.9, 20.0, 100.0]
    )]
    df = spark.createDataFrame(vals, ["id", "x"])
    a, b = df.alias("a"), df.alias("b")
    naive = {
        (r["ia"], r["ib"])
        for r in a.join(
            b,
            (F.col("a.id") < F.col("b.id"))
            & (F.abs(F.col("a.x") - F.col("b.x")) < 10.0),
        )
        .select(F.col("a.id").alias("ia"), F.col("b.id").alias("ib"))
        .collect()
    }
    banded = {
        (r["ia"], r["ib"])
        for r in band_join(
            a, b, F.col("a.x"), F.col("b.x"), 10.0,
            residual=F.col("a.id") < F.col("b.id"),
        )
        .select(F.col("a.id").alias("ia"), F.col("b.id").alias("ib"))
        .collect()
    }
    assert banded == naive


def test_approx_quantiles_within_rank_error(spark, sf_dir):
    """approx_percentile(accuracy=1e4) must sit within ~1/accuracy rank error
    of the exact interpolated quantiles — here the quantity domain is small
    integers, so the sketch should land within 1 unit."""
    import __spark_entry__ as e

    exact = {
        r["l_returnflag"]: (r["p25"], r["p50"], r["p75"])
        for r in e.queries()["quantity_quantiles"](spark, sf_dir).collect()
    }
    approx = {
        r["l_returnflag"]: (r["p25"], r["p50"], r["p75"])
        for r in e.queries()["quantity_quantiles_approx"](spark, sf_dir).collect()
    }
    assert exact.keys() == approx.keys()
    for k in exact:
        for ev, av in zip(exact[k], approx[k]):
            assert abs(ev - av) <= 1.0, f"{k}: exact {ev} vs approx {av}"


def test_unicode_parity_randomized_batch(spark):
    """Broad randomized parity sweep: 300 seeded names over a mixed alphabet
    (Latin + precomposed accents + Cyrillic + CJK + digits + the preserved
    punctuation + suffix/country tokens), asserted in ONE Spark batch
    against the Python `re` reference — catches \\w/\\s/\\b regime drift the
    curated fixtures might miss. Alphabet is NFC-only by construction (the
    documented Mn-mark divergence is out of scope)."""
    import random as _random

    rng = _random.Random(20260814)
    atoms = (
        list("ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789")
        + list("ÀÉÜüéößàçñÅøæŁódź")
        + list("ПАОГазпромЖЩ")
        + list("株式会社トヨタ漢")
        + list("&/-.,!?#@'\"()[]{}%$^*+=~`|;:<>")
        + [" ", "  ", "\t"]
        + ["GmbH", "Ltd", "S.A.", "Inc", "Corp", "Co", "KG", "A/S",
           "GERMANY", "INDIA", "Sp Z O O", "LLC", "PLC"]
    )
    names = [
        "".join(rng.choice(atoms) for _ in range(rng.randint(0, 12)))
        for _ in range(300)
    ]
    got_norm = spark_eval(spark, names, normalize_name)
    assert got_norm == [py_normalize_unicode(n) for n in names]
    got_base = spark_eval(spark, names, base_name)
    assert got_base == [py_base_unicode(n) for n in names]


# Classic US-Soundex ground-truth vectors (the H/W-silence cases are the
# discriminating ones: ASHCRAFT -> A261 requires S and C to collapse ACROSS
# the silent H, which naive implementations miss).
_SOUNDEX_GROUND_TRUTH = {
    "ROBERT": "R163",
    "RUPERT": "R163",
    "ASHCRAFT": "A261",
    "ASHCROFT": "A261",
    "TYMCZAK": "T522",
    "PFISTER": "P236",
    "HONEYMAN": "H555",
    "JACKSON": "J250",
    "A": "A000",
    "EULER": "E460",
    "GAUSS": "G200",
    "HILBERT": "H416",
    "KNUTH": "K530",
    "LLOYD": "L300",
    "WHEATON": "W350",
}


def test_soundex_parity(spark):
    """Spark's builtin soundex vs the DuckDB list_reduce mirror
    (oracles.sql_soundex) — the phonetic_blocked_pairs gate rests on these
    two agreeing on every uppercase-alpha token. Checked on the classic
    ground-truth vectors AND the live part-name vocabulary."""
    import duckdb

    from datafusion_dedup_ai_spark.oracles import sql_soundex

    vocab = sorted(_SOUNDEX_GROUND_TRUTH) + [
        "GOLDENROD", "LAVENDER", "SPRING", "PERU", "POWDER", "ALMOND",
        "ANTIQUE", "AQUAMARINE", "AZURE", "BEIGE", "BISQUE", "BLANCHED",
        "BLUSH", "BURLYWOOD", "BURNISHED", "CHARTREUSE", "CHIFFON",
        "CHOCOLATE", "CORNFLOWER", "CORNSILK", "WHWH", "HW", "BB", "BPB",
    ]
    got_spark = {
        r["tok"]: r["sx"]
        for r in spark.createDataFrame([(w,) for w in vocab], "tok string")
        .select("tok", F.soundex(F.col("tok")).alias("sx"))
        .collect()
    }
    con = duckdb.connect()
    expr = sql_soundex("tok")
    for w in vocab:
        duck = con.execute(
            f"SELECT {expr} FROM (SELECT '{w}' AS tok)"
        ).fetchone()[0]
        assert duck == got_spark[w], f"{w}: duckdb {duck} vs spark {got_spark[w]}"
    for w, want in _SOUNDEX_GROUND_TRUTH.items():
        assert got_spark[w] == want, f"{w}: spark {got_spark[w]} vs classic {want}"
