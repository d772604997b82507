"""Property test: band_join must equal the naive inequality join for any
value distribution and band width — boundary values, duplicates, negatives,
and widths that don't divide the data range evenly."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from datafusion_dedup_ai_spark.operators.rangejoin import band_join

_vals = st.lists(
    st.floats(
        min_value=-1000.0, max_value=1000.0, allow_nan=False, allow_infinity=False
    ),
    min_size=2,
    max_size=24,
)
_widths = st.sampled_from([0.5, 1.0, 3.7, 10.0, 250.0])


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(vals=_vals, width=_widths)
def test_band_join_equals_naive_property(spark, vals, width):
    df = spark.createDataFrame(list(enumerate(vals)), ["id", "x"])
    a, b = df.alias("a"), df.alias("b")
    naive = {
        (r["ia"], r["ib"])
        for r in a.join(
            b,
            (F.col("a.id") < F.col("b.id"))
            & (F.abs(F.col("a.x") - F.col("b.x")) < width),
        )
        .select(F.col("a.id").alias("ia"), F.col("b.id").alias("ib"))
        .collect()
    }
    banded = {
        (r["ia"], r["ib"])
        for r in band_join(
            a, b, F.col("a.x"), F.col("b.x"), width,
            residual=F.col("a.id") < F.col("b.id"),
        )
        .select(F.col("a.id").alias("ia"), F.col("b.id").alias("ib"))
        .collect()
    }
    assert banded == naive
