"""Skew tooling: salted joins for hot keys.

AQE's skew-join splitting (enabled in session.py) handles most skew by
splitting oversized post-shuffle partitions, but it only works for sort-merge
joins and after a shuffle has already materialized the hot partition. The
classic preventative is SALTING: explode the hot key's rows on one side into
``salt`` sub-keys and replicate the other side across all sub-keys, so the
hot key's work spreads over ``salt`` tasks BEFORE any shuffle exists. At
100 TB this is the difference between one straggler task holding a 2-hour
stage and even task runtimes.

``salted_join`` salts every key (simple, predictable); for corpora where only
a few keys are hot, filter-split the input and salt only the hot subset.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``left`` and ``right`` on column ``on`` with ``salt``-way
    key splitting.

    The LEFT side (put the skewed/fact side here) gets a random-but-
    deterministic sub-key per row (hash of the whole row, not rand() — plans
    stay replayable); the RIGHT side is replicated ``salt`` times via an
    explode, so every (key, sub-key) pair finds its match. Row multiplicity
    is exactly the plain join's; only the shuffle distribution changes.
    """
    salt_col = "__salt"
    left_s = left.withColumn(
        salt_col,
        F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(salt)).cast("int"),
    )
    right_s = right.withColumn(
        salt_col, F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    return left_s.join(right_s, [on, salt_col], how).drop(salt_col)
