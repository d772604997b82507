"""Layout operators: compaction preserves content while cutting file count;
range-clustered writes produce near-disjoint per-file value bands that a
range predicate can prune against (checked from real parquet footers)."""

from __future__ import annotations

from pyspark.sql import functions as F

from datafusion_dedup_ai_spark.sources import layout as L
from datafusion_dedup_ai_spark.sources.readers import load_table


def test_compaction_reduces_files_and_preserves_rows(spark, sf_dir, tmp_path):
    src = str(tmp_path / "fragmented")
    dst = str(tmp_path / "compacted")
    orders = load_table(spark, sf_dir, "orders")
    # manufacture the small-files problem: 64 tiny files
    orders.repartition(64).write.parquet(src)
    assert len(L.parquet_files(src)) == 64

    n_out = L.compact_parquet(spark, src, dst, target_file_bytes=4 * 1024 * 1024)
    assert n_out == len(L.parquet_files(dst))
    assert n_out < 64  # actually compacted
    # content identical (same rows, same values)
    a = sorted(map(tuple, spark.read.parquet(src).collect()))
    b = sorted(map(tuple, spark.read.parquet(dst).collect()))
    assert a == b


def test_range_clustered_write_has_prunable_file_ranges(spark, sf_dir, tmp_path):
    clustered = str(tmp_path / "clustered")
    random_layout = str(tmp_path / "random")
    orders = load_table(spark, sf_dir, "orders")

    L.write_range_clustered(orders, clustered, ["o_totalprice"], n_files=8)
    orders.repartition(8).write.parquet(random_layout)

    lo_all = orders.agg(F.min("o_totalprice")).collect()[0][0]
    hi_all = orders.agg(F.max("o_totalprice")).collect()[0][0]
    span = hi_all - lo_all

    def prunable_fraction(path: str, lo_q: float, hi_q: float) -> float:
        ranges = L.file_column_ranges(path, "o_totalprice")
        assert ranges and all(r[1] is not None for r in ranges)
        skipped = sum(1 for _, lo, hi in ranges if hi < lo_q or lo > hi_q)
        return skipped / len(ranges)

    # a 10%-of-domain range query: clustered layout skips most files via
    # footer min/max; the random layout skips none (every file spans all)
    q_lo = lo_all + 0.45 * span
    q_hi = lo_all + 0.55 * span
    assert prunable_fraction(clustered, q_lo, q_hi) >= 0.5
    assert prunable_fraction(random_layout, q_lo, q_hi) == 0.0

    # row content preserved
    assert (
        spark.read.parquet(clustered).count() == orders.count()
    )


def test_zorder_write_gives_multi_column_locality(spark, sf_dir, tmp_path):
    """Z-order vs leading-column sort on (o_custkey, o_totalprice): under a
    plain sort by o_custkey, every file spans ~the full o_totalprice domain;
    under z-order BOTH columns' per-file footer ranges shrink, so a
    selective predicate on either column prunes files. Content unchanged."""
    zpath = str(tmp_path / "zorder")
    lexpath = str(tmp_path / "lex")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    n_files = 16
    L.write_zorder_clustered(
        orders, zpath, ["o_custkey", "o_totalprice"], n_files=n_files
    )
    L.write_range_clustered(orders, lexpath, ["o_custkey"], n_files=n_files)

    def mean_span_fraction(path, column):
        lo = orders.agg(F.min(column)).collect()[0][0]
        hi = orders.agg(F.max(column)).collect()[0][0]
        spans = [
            (fhi - flo) / (hi - lo)
            for (_f, flo, fhi) in L.file_column_ranges(path, column)
            if flo is not None
        ]
        return sum(spans) / len(spans)

    # leading column: z-order still clusters it (coarsely — 8 files split
    # the 2-D plane, so each dim gets ~sqrt(8) bands, not 8)
    assert mean_span_fraction(zpath, "o_custkey") < 0.7
    # second column: lex sort leaves ~full-domain files; z-order shrinks them
    lex_price = mean_span_fraction(lexpath, "o_totalprice")
    z_price = mean_span_fraction(zpath, "o_totalprice")
    assert lex_price > 0.8, f"lex baseline unexpectedly clustered: {lex_price}"
    assert z_price < 0.6 * lex_price, (z_price, lex_price)

    # content identical
    a = sorted(map(tuple, orders.collect()))
    b = sorted(map(tuple, spark.read.parquet(zpath).collect()))
    assert a == b
