"""HTML visible-text extraction (functions/html.py): semantic expectations
on handcrafted pages, and Java-vs-RE2 lockstep on an adversarial grid —
the same two-engine argument tests/test_curation.py makes for urls.py."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from datafusion_dedup_ai_spark.functions import html as H

CASES = [
    # basics: tags to spaces, collapse, trim
    ("<p>hello</p><p>world</p>", "hello world"),
    # script/style/comment content is NOT page text
    ("<script>var a = 'x<y';</script>keep", "keep"),
    ("<style>p{color:red}</style>keep", "keep"),
    ("<!-- secret -->keep", "keep"),
    # case-insensitive block tags
    ("<SCRIPT>gone()</SCRIPT><STYLE>b{}</STYLE>ok", "ok"),
    # a commented-out </script> must not terminate a live block early:
    # the comment pass runs first and consumes it
    ("<script>a()</script><!-- </script> -->tail", "tail"),
    # entities decode AFTER tag strip: literal <b> survives as text
    ("x &lt;b&gt; y", "x <b> y"),
    ("Tom &amp; Jerry&nbsp;&nbsp;Show", "Tom & Jerry Show"),
    ("&quot;q&quot; &#39;a&#39;", "\"q\" 'a'"),
    # &amp; decodes LAST: '&amp;lt;' means literal '&lt;', not '<'
    ("&amp;lt;", "&lt;"),
    # multiline blocks (lazy dot-all)
    ("<script>\nline1\nline2\n</script>after", "after"),
    ("a<br/>\n\t b", "a b"),
    # attributes with slashes and quotes
    ('<a href="/x" title="t">link</a>', "link"),
    # no-match title behavior is exercised in the grid below
]


@pytest.fixture(scope="module")
def duck():
    return duckdb.connect()


def spark_extract(spark, pages):
    df = spark.createDataFrame([(i, p) for i, p in enumerate(pages)], ["i", "h"])
    rows = (
        df.select(
            "i",
            H.visible_text(F.col("h")).alias("t"),
            H.page_title(F.col("h")).alias("ti"),
        )
        .orderBy("i")
        .collect()
    )
    return [(r["t"], r["ti"]) for r in rows]


def duck_extract(duck, pages):
    duck.execute("CREATE OR REPLACE TABLE pages(i INTEGER, h VARCHAR)")
    duck.executemany("INSERT INTO pages VALUES (?, ?)", list(enumerate(pages)))
    t = H.sql_visible_text("h")
    ti = H.sql_page_title("h")
    return [
        (r[0], r[1])
        for r in duck.execute(
            f"SELECT {t}, {ti} FROM pages ORDER BY i"
        ).fetchall()
    ]


def test_visible_text_semantics(spark):
    got = spark_extract(spark, [c[0] for c in CASES])
    for (page, want), (text, _) in zip(CASES, got):
        assert text == want, f"{page!r} -> {text!r}, want {want!r}"


def test_title_extraction(spark):
    pages = [
        "<html><head><title>My Page</title></head><body>b</body></html>",
        "<TITLE lang=en>Upper</TITLE>x",
        "<p>no title</p>",
    ]
    got = spark_extract(spark, pages)
    assert [t for _, t in got] == ["My Page", "Upper", ""]


def test_java_re2_lockstep_grid(spark, duck):
    """Every combination of chrome fragments around a payload — including
    the KNOWN regexp-tier limitation (an attribute containing '>', which
    truncates the tag identically in both engines) — must extract to
    byte-identical strings through Java and RE2."""
    payloads = ["plain words here", "a &amp; b &lt;tag&gt;", ""]
    chromes = [
        "<div class='c'>%s</div>",
        "<!-- c1 -->%s<!-- c2 -->",
        "<script>s<t</script>%s",
        "<STYLE media=all>x{}</STYLE>%s<footer>f&nbsp;g</footer>",
        "<title>T1</title>%s",
        '<a title="a>b">%s</a>',  # '>' in attr: truncates the same way
        "%s<br/><BR>\n<hr>",
    ]
    pages = [c % p for c in chromes for p in payloads]
    assert spark_extract(spark, pages) == duck_extract(duck, pages)


def test_registered_queries_cross_engine_exact(spark, sf_dir, duck):
    """The registered html queries at sf0.001: Spark output equals the
    DuckDB oracle VALUE-exactly (strings and doubles), not just by rows —
    a local mirror of the driver's hash gate."""
    import pandas as pd

    import __spark_entry__ as e

    qs, oracles = e.queries(), e.oracle_sql()
    duck.execute(
        "CREATE OR REPLACE VIEW documents AS "
        f"SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    for name in ["html_text_extraction", "boilerplate_source_stats"]:
        key = "doc_id" if name == "html_text_extraction" else "source"
        sdf = (
            qs[name](spark, sf_dir)
            .toPandas()
            .sort_values(key)
            .reset_index(drop=True)
        )
        odf = oracles[name]
        odf = duck.execute(odf).df().sort_values(key).reset_index(drop=True)
        # check_exact: the driver's gate hashes repr(float) textually, so
        # bitwise double equality is what this test claims to mirror —
        # assert_frame_equal's default rtol=1e-5 would be weaker (r9 advice)
        pd.testing.assert_frame_equal(
            sdf[sorted(sdf.columns)], odf[sorted(odf.columns)], check_exact=True
        )
