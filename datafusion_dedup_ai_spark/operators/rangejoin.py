"""Banded range join: turn a pure inequality join ``|a.x - b.x| < width``
into an equi-join on a coarse band key plus a residual filter.

A pure inequality predicate gives Catalyst no equi-key, so it plans a
(Broadcast)NestedLoopJoin — O(|A|·|B|) comparisons, the classic 100 TB
scale-killer. Bucketizing the value into ``width``-sized bands restores an
equi-key: any pair within ``width`` lands in the same or adjacent bands, so
replicating ONE side into its 3 neighboring bands and equi-joining on the
band catches every qualifying pair exactly once (the replicated side carries
3 distinct band values, and the other side matches at most one of them).
Cost: 3× replication of one side + a hash/sort-merge join on the band — the
same trick DBMSes and the Spark range-join hints use.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def band_join(
    left: DataFrame,
    right: DataFrame,
    left_val: Column,
    right_val: Column,
    width: float,
    residual: Column | None = None,
) -> DataFrame:
    """Join rows where ``abs(left_val - right_val) < width``; ``residual``
    adds any extra predicate (e.g. key ordering for half-matrix output).

    The left side keeps one band (``floor(x/width)``); the right side is
    exploded into {band-1, band, band+1}. ``floor`` is correct for negative
    values (floors toward -inf, so bands partition the real line).
    """
    l_band = F.floor(left_val / F.lit(width)).cast("long")
    r_band = F.floor(right_val / F.lit(width)).cast("long")
    lb = left.withColumn("_band", l_band)
    rb = right.withColumn(
        "_band", F.explode(F.array(r_band - 1, r_band, r_band + 1))
    )
    cond = (F.col("_lband") == F.col("_rband")) & (
        F.abs(left_val - right_val) < F.lit(width)
    )
    # rename the band columns to avoid ambiguity in the join condition
    lb = lb.withColumnRenamed("_band", "_lband")
    rb = rb.withColumnRenamed("_band", "_rband")
    if residual is not None:
        cond = cond & residual
    return lb.join(rb, cond).drop("_lband", "_rband")
