"""Incremental table maintenance — recompute-free updates at lake scale.

At 100 TB you cannot re-aggregate the world because a day of data arrived:

* ``merge_aggregate_state`` maintains a running per-key aggregate table by
  merging a new batch's partial aggregate into it (the materialized-view
  maintenance pattern). Cost scales with |batch| + |touched keys|, not with
  history. Works for any commutative-monoid aggregate (count/sum here;
  min/max/HLL merge the same way).

* ``scd2_apply`` maintains a slowly-changing-dimension (type 2) table:
  changed attribute rows close the open version (valid_to stamped) and
  append a new open version; unchanged and untouched rows pass through.
  The full history stays queryable "as of" any time.

Both are pure DataFrame plans: one shuffle on the merge key, no driver
loops, no table-format dependency (this is the logical core of what a
Delta/Iceberg MERGE INTO compiles to).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def aggregate_batch(events: DataFrame, key_cols: list[str]) -> DataFrame:
    """Partial aggregate of one batch: (keys..., cnt, sum_cents)."""
    return events.groupBy(*key_cols).agg(
        F.count("*").alias("cnt"),
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("sum_cents"),
    )


def merge_aggregate_state(state: DataFrame, batch_agg: DataFrame, key_cols: list[str]) -> DataFrame:
    """New state = state ⊎ batch: full outer join on the keys, monoid-add
    the aggregate columns (missing side contributes identity/0)."""
    s = state.select(
        *key_cols,
        F.col("cnt").alias("_s_cnt"),
        F.col("sum_cents").alias("_s_sum"),
    )
    b = batch_agg.select(
        *key_cols,
        F.col("cnt").alias("_b_cnt"),
        F.col("sum_cents").alias("_b_sum"),
    )
    zero = F.lit(0).cast("long")
    return s.join(b, key_cols, "full_outer").select(
        *key_cols,
        (F.coalesce("_s_cnt", zero) + F.coalesce("_b_cnt", zero)).alias("cnt"),
        (F.coalesce("_s_sum", zero) + F.coalesce("_b_sum", zero)).alias("sum_cents"),
    )


def scd2_apply(
    dim: DataFrame,
    updates: DataFrame,
    key_col: str,
    attr_cols: list[str],
    effective_ts: Column,
) -> DataFrame:
    """Apply an update batch to an SCD2 dimension.

    ``dim`` schema: key, attrs..., valid_from (long), valid_to (long,
    null = open), is_current (bool). ``updates``: key, attrs... — at most
    one row per key per batch (dedupe upstream; the single-batch contract
    every MERGE shares).

    Semantics per update row:
      * same attrs as the open version  -> no-op;
      * different attrs                 -> close open version at
        ``effective_ts``, append a new open version;
      * unseen key                      -> append first open version.
    History rows (is_current = false) are untouched."""
    attr_neq = None
    for c in attr_cols:
        ne = ~F.col(f"d.{c}").eqNullSafe(F.col(f"u.{c}"))  # null-safe differ
        attr_neq = ne if attr_neq is None else (attr_neq | ne)

    d, u = dim.alias("d"), updates.alias("u")
    open_rows = d.where(F.col("d.is_current"))
    history = dim.where(~F.col("is_current"))

    joined = open_rows.join(u, F.col(f"d.{key_col}") == F.col(f"u.{key_col}"), "full_outer")
    matched_changed = F.col(f"d.{key_col}").isNotNull() & F.col(f"u.{key_col}").isNotNull() & attr_neq

    # open rows that survive unchanged (no update, or identical attrs)
    untouched = joined.where(
        F.col(f"u.{key_col}").isNull() | (F.col(f"d.{key_col}").isNotNull() & ~attr_neq)
    ).select(
        F.col(f"d.{key_col}").alias(key_col),
        *[F.col(f"d.{c}").alias(c) for c in attr_cols],
        F.col("d.valid_from").alias("valid_from"),
        F.col("d.valid_to").alias("valid_to"),
        F.col("d.is_current").alias("is_current"),
    )
    # open rows being superseded: close them
    closed = joined.where(matched_changed).select(
        F.col(f"d.{key_col}").alias(key_col),
        *[F.col(f"d.{c}").alias(c) for c in attr_cols],
        F.col("d.valid_from").alias("valid_from"),
        effective_ts.cast("long").alias("valid_to"),
        F.lit(False).alias("is_current"),
    )
    # new versions: changed keys + brand-new keys
    fresh = joined.where(
        matched_changed | (F.col(f"d.{key_col}").isNull() & F.col(f"u.{key_col}").isNotNull())
    ).select(
        F.col(f"u.{key_col}").alias(key_col),
        *[F.col(f"u.{c}").alias(c) for c in attr_cols],
        effective_ts.cast("long").alias("valid_from"),
        F.lit(None).cast("long").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    return history.unionByName(untouched).unionByName(closed).unionByName(fresh)


def scd2_as_of(dim: DataFrame, ts: Column) -> DataFrame:
    """Time-travel read: the dimension exactly as it stood at ``ts``."""
    t = ts.cast("long")
    return dim.where(
        (F.col("valid_from") <= t)
        & (F.col("valid_to").isNull() | (F.col("valid_to") > t))
    )
