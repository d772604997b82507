"""LiveWebEnricher integration tests — network-free: the search transport is
injected (search_fn), so these exercise the full E2/E4 client logic and the
E5 mapInPandas/broadcast dataflow end-to-end without any live I/O. The
client itself is opt-in only (SPARK_GRAFT_LIVE_ENRICH=1); every correctness
surface keeps the deterministic StubEnricher."""

from __future__ import annotations

import pandas as pd
import pytest

from datafusion_dedup_ai_spark.enrich import (
    LiveWebEnricher,
    StubEnricher,
    enricher_from_env,
)


def make_fake_search():
    """Canned DDGS-shaped transport keyed on the company name in the query.
    Built as a CLOSURE so cloudpickle ships it by value to executors (a
    module-level function in a test file pickles by reference, which the
    executor can't import)."""

    def fake_search(query: str, max_results: int):
        name = query.removesuffix(" official website")
        if name == "BOOM CO":
            raise TimeoutError("search endpoint down")
        canned = {
            "ACME CORP": [
                # first result is a blocklisted aggregator -> must be skipped
                {
                    "title": "Acme | LinkedIn",
                    "href": "https://www.linkedin.com/company/acme",
                },
                {"title": "Acme Corp", "href": "https://www.acme.com/about"},
            ],
            "GLOBEX": [
                {"title": "Globex", "href": "http://globex.example.org/"},
            ],
            "NOHREF CO": [
                {"title": "no url in results", "body": "..."},
            ],
        }
        return canned.get(name, [])[:max_results]

    return fake_search


fake_search = make_fake_search()


def test_domain_extraction_blocklist_and_error_isolation():
    enr = LiveWebEnricher(search_fn=fake_search, rate_per_sec=0)
    out = enr.lookup(
        pd.Series(["ACME CORP", "GLOBEX", "NOHREF CO", "BOOM CO", "", None])
    )
    got = dict(zip(out["canonical_name"].fillna(""), out["website"]))
    assert got["ACME CORP"] == "acme.com"  # linkedin skipped, www. stripped
    assert got["GLOBEX"] == "globex.example.org"
    assert got["NOHREF CO"] == ""  # results without href -> miss
    assert got["BOOM CO"] == ""  # per-name failure isolated, no raise
    assert got[""] == ""  # empty/None short-circuit


def test_rate_limit_schedules_minimum_interval():
    enr = LiveWebEnricher(search_fn=fake_search, rate_per_sec=1000.0)
    import time

    t0 = time.monotonic()
    enr.lookup(pd.Series(["ACME CORP", "GLOBEX", "ACME CORP"]))
    # 3 calls at 1000/s: the bucket schedules each 1ms apart; just assert
    # the schedule advanced past now (the throttle is active, not a no-op)
    assert enr._next_call > t0


def make_llm():
    def llm(name):
        if name == "GLOBEX":
            return {"name": "GLOBEX CORPORATION", "reason": "legal filings"}
        return None  # LLM miss -> keep original (reference behavior)

    return llm


def test_llm_hook_emits_verified_name_keeps_join_key():
    enr = LiveWebEnricher(search_fn=fake_search, llm_fn=make_llm(), rate_per_sec=0)
    out = enr.lookup(pd.Series(["ACME CORP", "GLOBEX"]))
    # canonical_name is the join key back to clusters — never rewritten
    assert list(out["canonical_name"]) == ["ACME CORP", "GLOBEX"]
    assert list(out["verified_name"]) == ["ACME CORP", "GLOBEX CORPORATION"]


def test_llm_corrected_name_still_joins_back_to_cluster_rows(spark):
    """Regression: the E4 hook used to overwrite canonical_name in the lookup
    output while enrich() broadcast-joins ON canonical_name — LLM-corrected
    clusters got null website and the correction was silently dropped. The
    corrected name must arrive as verified_name WITH the website intact."""
    clusters = spark.createDataFrame(
        [(1, "ACME CORP"), (2, "GLOBEX"), (3, "GLOBEX")],
        "row_id int, canonical_name string",
    )
    enr = LiveWebEnricher(search_fn=fake_search, llm_fn=make_llm(), rate_per_sec=0)
    rows = {r["row_id"]: r for r in enr.enrich(clusters).collect()}
    assert len(rows) == 3
    # the corrected cluster keeps its enrichment AND carries the correction
    assert rows[2]["website"] == "globex.example.org"
    assert rows[2]["verified_name"] == "GLOBEX CORPORATION"
    assert rows[3]["verified_name"] == "GLOBEX CORPORATION"
    # uncorrected cluster: verified_name echoes the original (LLM miss)
    assert rows[1]["website"] == "acme.com"
    assert rows[1]["verified_name"] == "ACME CORP"


def test_live_enricher_drives_full_e5_dataflow(spark):
    """The injected-transport client through the REAL Spark seam: distinct
    canonicals -> mapInPandas lookup -> industry classifier -> broadcast
    join back to every row."""
    clusters = spark.createDataFrame(
        [(1, "ACME CORP"), (2, "ACME CORP"), (3, "GLOBEX"), (4, "BOOM CO")],
        "row_id int, canonical_name string",
    )
    enr = LiveWebEnricher(search_fn=fake_search, rate_per_sec=0)
    rows = {
        r["row_id"]: r
        for r in enr.enrich(clusters).collect()
    }
    assert len(rows) == 4  # broadcast join preserved every input row
    assert rows[1]["website"] == "acme.com"
    assert rows[2]["website"] == "acme.com"  # one lookup, joined to both
    assert rows[3]["website"] == "globex.example.org"
    assert rows[4]["website"] == ""  # failed lookup still yields the row
    assert rows[1]["industry"] is not None


def test_env_flag_selects_client(monkeypatch):
    monkeypatch.delenv("SPARK_GRAFT_LIVE_ENRICH", raising=False)
    assert isinstance(enricher_from_env(), StubEnricher)
    monkeypatch.setenv("SPARK_GRAFT_LIVE_ENRICH", "1")
    # no ddgs package in this sandbox: opting in must fail loudly, not
    # silently fall back (the operator asked for live results)
    with pytest.raises(RuntimeError, match="ddgs"):
        enricher_from_env()
