"""Pipeline observability: data-quality counters collected DURING a job via
``DataFrame.observe`` — the metrics ride along with the action (write, agg,
anything that executes the plan), so a 100 TB write reports its violation
counts without a second scan. This is the run-time companion to the
quarantine query (queries_relational.q_event_quality_quarantine): quarantine
routes the bad rows, observe counts them for the run report/alerting."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Observation
from pyspark.sql import functions as F


def violation_counter(cond: Column, name: str) -> Column:
    """An observe-compatible aggregate: rows where ``cond`` holds."""
    return F.sum(F.when(cond, 1).otherwise(0)).alias(name)


def write_with_dq_metrics(
    df: DataFrame,
    path: str,
    checks: dict[str, Column],
    fmt: str = "parquet",
) -> dict[str, int]:
    """Write ``df`` while counting ``checks`` (name -> violation predicate)
    in the same pass. Returns {name: violating_rows, "rows_written": n}.

    The counters are Spark accumulator-backed: exactly-once per task result,
    merged on the driver when the action finishes — zero extra scans, zero
    extra shuffles."""
    obs = Observation("dq")
    metrics = [violation_counter(c, name) for name, c in checks.items()]
    metrics.append(F.count(F.lit(1)).alias("rows_written"))
    observed = df.observe(obs, *metrics)
    observed.write.mode("overwrite").format(fmt).save(path)
    got = obs.get
    return {k: int(got[k]) for k in got}
