"""Enrichment operators E1-E6 (reference engine.py:72-183, 275-319, 340-367).

The reference's enrichment is live web search (DuckDuckGo) + an LLM call
(Gemini) — nondeterministic external I/O, excluded from correctness by design.
What IS preserved and tested here:

* the dataflow shape (E5): enrich once per DISTINCT canonical name, then
  broadcast-join results back to all rows — at 100 TB you never call an
  external service per row;
* the batched client seam: ``mapInPandas`` over the distinct-names frame with
  a rate-limit hook, replacing the reference's ThreadPoolExecutor (E6 — Spark
  task parallelism supersedes it);
* the deterministic keyword industry classifier (E3's pure part) as a Column
  expression, including the reference's quirk that the 'SaaS' keyword can
  never match (it is compared case-sensitively against an uppercased name,
  engine.py:116,123).

``WebEnricher``-style live clients plug in by implementing ``lookup``.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

# Reference keyword table (engine.py:115-121); dict order is match priority.
INDUSTRY_KEYWORDS: dict[str, tuple[str, ...]] = {
    "TECHNOLOGY": ("SOFTWARE", "TECH", "SaaS", "COMPUTING", "DIGITAL"),
    "FINANCE": ("BANK", "INVESTMENT", "FINANCIAL", "CAPITAL", "INSURANCE"),
    "HEALTHCARE": ("PHARMA", "HOSPITAL", "MEDICAL", "HEALTH", "BIOTECH"),
    "RETAIL": ("STORE", "SHOP", "MARKET", "COMMERCE"),
    "MANUFACTURING": ("ENGINEERING", "INDUSTRIAL", "SYSTEMS", "ELECTRONICS"),
}
INDUSTRY_FALLBACK = "Diversified/Other"
INDUSTRY_UNKNOWN = "Unknown"


def classify_industry(name: Column) -> Column:
    """E3 keyword part: first industry (dict order) with any keyword contained
    in the uppercased name; '' -> Unknown; no hit -> Diversified/Other.
    Case-sensitive contains replicates the inert-'SaaS' quirk exactly."""
    upper = F.upper(name)
    expr = F.lit(INDUSTRY_FALLBACK)
    for industry in reversed(list(INDUSTRY_KEYWORDS)):
        hit = None
        for kw in INDUSTRY_KEYWORDS[industry]:
            cond = upper.contains(F.lit(kw))
            hit = cond if hit is None else (hit | cond)
        expr = F.when(hit, F.lit(industry)).otherwise(expr)
    return F.when(name.isNull() | (name == ""), F.lit(INDUSTRY_UNKNOWN)).otherwise(expr)


class StubEnricher:
    """Deterministic stand-in for the web/LLM clients: domain = slugified
    canonical name; industry = keyword classifier. Same join topology as the
    real thing, so pipelines and tests exercise the full E5 shape."""

    def lookup(self, names: pd.Series) -> pd.DataFrame:
        domains = (
            names.fillna("")
            .str.lower()
            .str.replace(r"[^a-z0-9]+", "-", regex=True)
            .str.strip("-")
            .radd("")
            .apply(lambda s: f"{s}.example.com" if s else "")
        )
        return pd.DataFrame({"canonical_name": names, "website": domains})

    def enrich(self, clusters: DataFrame) -> DataFrame:
        distinct = clusters.select("canonical_name").distinct()

        schema = StructType(
            [
                StructField("canonical_name", StringType()),
                StructField("website", StringType()),
            ]
        )
        lookup = self.lookup

        def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                # a real client would rate-limit / batch HTTP or LLM calls here
                yield lookup(pdf["canonical_name"])

        enriched = distinct.mapInPandas(run, schema=schema).withColumn(
            "industry", classify_industry(F.col("canonical_name"))
        )
        return clusters.join(F.broadcast(enriched), "canonical_name", "left")
