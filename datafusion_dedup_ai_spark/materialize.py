"""Materialized-cluster snapshot shared by the O-pack oracle checks.

The fuzzy C1 cluster formation is not ANSI-SQL-expressible, so the report
queries built on top of it (reference outputs.py:30-66 — O2 summary, O4
mapping, O5 review, O6 stats) could previously only get rows-only checks.
This module converts them to hash-gated checks by snapshotting the pipeline
output to parquet once per process: the Spark side of each O-query reads the
snapshot and applies its aggregation/projection with DataFrame ops, and the
DuckDB oracle reads the SAME parquet with equivalent SQL. That verifies the
reporting layer exactly, independently of C1 (whose own exactness is pinned
by the golden-fixture and equivalence tests).

The oracle SQL strings embed the snapshot path, which depends on the scale
factor being compared. The driver always compares at sf0.01; local pytest
uses SPARK_GRAFT_TEST_SF_DIR (conftest pins it). ``oracle_sf_dir`` resolves
identically for both, and the registry resolves callable oracles at
``oracle_sql()`` call time so the path is computed lazily.
"""

from __future__ import annotations

import os

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# The driver runs the side-by-side compare at sf0.01 with no env set; pytest
# sets SPARK_GRAFT_TEST_SF_DIR (tests/conftest.py) so both the Spark fixture
# and the oracle path resolver agree on the same scale factor.
_DRIVER_SF_DIR = "/root/testdata/sf0.01"


def oracle_sf_dir() -> str:
    return os.environ.get("SPARK_GRAFT_TEST_SF_DIR", _DRIVER_SF_DIR)


def clusters_snapshot_path(sf_dir: str) -> str:
    sf_name = os.path.basename(os.path.normpath(sf_dir))
    return os.path.join(_REPO_ROOT, ".materialized", sf_name, "clusters.parquet")


# Paths written by THIS process — re-materialize once per process even if a
# stale snapshot exists on disk from an earlier run.
_written: set[str] = set()


def materialize_clusters(spark, sf_dir: str) -> str:
    """Run the dedup pipeline at ``sf_dir`` and snapshot the full cluster
    report to parquet (idempotent per process). Returns the snapshot path."""
    path = clusters_snapshot_path(sf_dir)
    if path not in _written:
        from datafusion_dedup_ai_spark.queries_dedup import q_dedup_clusters

        q_dedup_clusters(spark, sf_dir).write.mode("overwrite").parquet(path)
        _written.add(path)
    return path


def read_clusters_snapshot(spark, sf_dir: str):
    return spark.read.parquet(materialize_clusters(spark, sf_dir))


def snapshot_glob() -> str:
    """DuckDB-side reference to the snapshot the driver's compare targets
    (Spark writes a directory of part files; DuckDB globs them)."""
    return os.path.join(clusters_snapshot_path(oracle_sf_dir()), "*.parquet")
