"""Relational parity pack (SURVEY.md §2-B): the standard query-category
checklist — scan/filter/project pushdown, hash aggregation, equi/theta/semi/
anti joins, windows, sort/limit, set ops, rollup, distinct, string/date/math
functions, JSON extraction, tumbling windows, sessionization — each as a
Spark DataFrame plan with a DuckDB oracle.

Float discipline: every aggregated money/value column goes through exact
integer cents (`round(x*100)::BIGINT`) so sums are order-independent and
bit-identical at any parallelism; raw doubles pass through only unaggregated.
Timestamps cross the compare as epoch microseconds (unix_micros <-> epoch_us).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from datafusion_dedup_ai_spark.registry import register
from datafusion_dedup_ai_spark.sources.readers import load_table


def _cents(col: Column) -> Column:
    return F.round(col * 100).cast("long")


def _sql_cents(expr: str) -> str:
    return f"CAST(round({expr} * 100) AS BIGINT)"


# ===========================================================================
# Scan + filter pushdown + hash aggregation (TPC-H Q1 shape on lineitem)
# ===========================================================================


@register(
    "pricing_summary",
    f"""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM({_sql_cents('l_quantity')}) AS DOUBLE) / 100.0 AS sum_qty,
           CAST(SUM({_sql_cents('l_extendedprice')}) AS DOUBLE) / 100.0 AS sum_base_price,
           CAST(SUM({_sql_cents('l_extendedprice')} * (100 - {_sql_cents('l_discount')})) AS DOUBLE) / 10000.0 AS sum_disc_price,
           CAST(SUM({_sql_cents('l_extendedprice')} * (100 - {_sql_cents('l_discount')}) * (100 + {_sql_cents('l_tax')})) AS DOUBLE) / 1000000.0 AS sum_charge,
           CAST(SUM({_sql_cents('l_quantity')}) AS DOUBLE) / 100.0 / COUNT(*) AS avg_qty,
           CAST(SUM({_sql_cents('l_extendedprice')}) AS DOUBLE) / 100.0 / COUNT(*) AS avg_price,
           CAST(SUM({_sql_cents('l_discount')}) AS DOUBLE) / 100.0 / COUNT(*) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q1 shape: predicate pushes to the parquet scan; partial (map-side)
    aggregation before the single shuffle on the 2-column group key."""
    l = load_table(spark, sf_dir, "lineitem")
    qty, price, disc, tax = (
        _cents(F.col("l_quantity")),
        _cents(F.col("l_extendedprice")),
        _cents(F.col("l_discount")),
        _cents(F.col("l_tax")),
    )
    return (
        l.where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            (F.sum(qty).cast("double") / 100.0).alias("sum_qty"),
            (F.sum(price).cast("double") / 100.0).alias("sum_base_price"),
            (F.sum(price * (100 - disc)).cast("double") / 10000.0).alias("sum_disc_price"),
            (F.sum(price * (100 - disc) * (100 + tax)).cast("double") / 1000000.0).alias("sum_charge"),
            (F.sum(qty).cast("double") / 100.0 / F.count("*")).alias("avg_qty"),
            (F.sum(price).cast("double") / 100.0 / F.count("*")).alias("avg_price"),
            (F.sum(disc).cast("double") / 100.0 / F.count("*")).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


# ===========================================================================
# Equi-join + agg + deterministic top-k (sort/limit)
# ===========================================================================


@register(
    "top_revenue_orders",
    f"""
    SELECT o.o_orderkey, epoch_us(o.o_orderdate) AS order_date_us,
           CAST(SUM({_sql_cents('l.l_extendedprice')} * (100 - {_sql_cents('l.l_discount')})) AS DOUBLE) / 10000.0 AS revenue
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    GROUP BY o.o_orderkey, o.o_orderdate
    ORDER BY revenue DESC, o.o_orderkey ASC
    LIMIT 10
    """,
)
def q_top_revenue_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle join on the fact keys + top-k; the tie-break on o_orderkey makes
    LIMIT deterministic. Spark executes this as TakeOrderedAndProject (no full
    sort materialization)."""
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    rev = _cents(F.col("l_extendedprice")) * (100 - _cents(F.col("l_discount")))
    return (
        o.join(l, o["o_orderkey"] == l["l_orderkey"])
        .groupBy("o_orderkey", "o_orderdate")
        .agg((F.sum(rev).cast("double") / 10000.0).alias("revenue"))
        .select(
            "o_orderkey",
            # parquet ms-timestamps surface as TIMESTAMP_NTZ; session TZ is
            # pinned to UTC so the cast preserves the wall-clock instant.
            F.unix_micros(F.col("o_orderdate").cast("timestamp")).alias("order_date_us"),
            "revenue",
        )
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey").asc())
        .limit(10)
    )


# ===========================================================================
# Broadcast dimension joins (star join) + agg
# ===========================================================================


@register(
    "region_order_stats",
    f"""
    SELECT r.r_name, c.c_mktsegment,
           COUNT(*) AS n_orders,
           CAST(SUM({_sql_cents('o.o_totalprice')}) AS DOUBLE) / 100.0 AS total_price
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name, c.c_mktsegment
    """,
)
def q_region_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star join: nation/region (and customer at small SF) broadcast — no
    shuffle of the orders fact for the dimension hops."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .groupBy("r_name", "c_mktsegment")
        .agg(
            F.count("*").alias("n_orders"),
            (F.sum(_cents(F.col("o_totalprice"))).cast("double") / 100.0).alias(
                "total_price"
            ),
        )
    )


# ===========================================================================
# Anti join / semi join
# ===========================================================================


@register(
    "customers_without_orders",
    """
    SELECT c.c_custkey, c.c_name
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def q_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return c.join(o, c["c_custkey"] == o["o_custkey"], "left_anti").select(
        "c_custkey", "c_name"
    )


@register(
    "customer_nations_with_orders",
    """
    SELECT n.n_name, COUNT(*) AS n_customers
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    GROUP BY n.n_name
    """,
)
def q_customer_nations_with_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    n = load_table(spark, sf_dir, "nation")
    return (
        c.join(o, c["c_custkey"] == o["o_custkey"], "left_semi")
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(F.count("*").alias("n_customers"))
    )


# ===========================================================================
# Window functions: per-group top-k
# ===========================================================================


@register(
    "window_topk_orders",
    """
    SELECT o_custkey, o_orderkey, o_totalprice, rk FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               CAST(ROW_NUMBER() OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_totalprice DESC, o_orderkey ASC) AS BIGINT) AS rk
        FROM orders)
    WHERE rk <= 3
    """,
)
def q_window_topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer; Spark pushes the rk<=3 filter into the
    window sort (WindowGroupLimit) so no full per-group materialization."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).cast("bigint").alias("rk"),
        )
        .where(F.col("rk") <= 3)
    )


# ===========================================================================
# Rollup (grouping sets)
# ===========================================================================


@register(
    "rollup_order_counts",
    f"""
    SELECT o_orderstatus, o_orderpriority,
           COUNT(*) AS n_orders,
           CAST(SUM({_sql_cents('o_totalprice')}) AS DOUBLE) / 100.0 AS total_price
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
)
def q_rollup_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.rollup("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("n_orders"),
        (F.sum(_cents(F.col("o_totalprice"))).cast("double") / 100.0).alias(
            "total_price"
        ),
    )


# ===========================================================================
# Set operations
# ===========================================================================


@register(
    "repeat_status_customers",
    """
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    """,
)
def q_repeat_status_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    f = o.where(F.col("o_orderstatus") == "F").select("o_custkey")
    op = o.where(F.col("o_orderstatus") == "O").select("o_custkey")
    return f.intersect(op)


@register(
    "finished_only_customers",
    """
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    EXCEPT
    SELECT o_custkey FROM orders WHERE o_orderstatus <> 'F'
    """,
)
def q_finished_only_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    f = o.where(F.col("o_orderstatus") == "F").select("o_custkey")
    other = o.where(F.col("o_orderstatus") != "F").select("o_custkey")
    return f.subtract(other)  # EXCEPT (distinct) semantics, matches the SQL


# ===========================================================================
# Distinct / count-distinct
# ===========================================================================


@register(
    "distinct_order_stats",
    """
    SELECT COUNT(DISTINCT o_custkey) AS n_customers,
           COUNT(DISTINCT o_orderpriority) AS n_priorities,
           COUNT(*) AS n_orders
    FROM orders
    """,
)
def q_distinct_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.agg(
        F.countDistinct("o_custkey").alias("n_customers"),
        F.countDistinct("o_orderpriority").alias("n_priorities"),
        F.count("*").alias("n_orders"),
    )


# ===========================================================================
# Theta (inequality) join
# ===========================================================================


@register(
    "acctbal_close_suppliers",
    """
    SELECT a.s_suppkey AS suppkey_a, b.s_suppkey AS suppkey_b
    FROM supplier a JOIN supplier b
      ON a.s_suppkey < b.s_suppkey
     AND abs(a.s_acctbal - b.s_acctbal) < 10.0
    """,
)
def q_acctbal_close_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-band join via operators.rangejoin.band_join: a pure inequality
    predicate would plan a NestedLoopJoin (O(n²) — the scale-killer); the
    band key restores an equi-join (3× replication of one side, hash join on
    the band, residual filter). Oracle-gated equal to the naive form; the
    plan is asserted NestedLoop-free in tests/test_plans.py."""
    from datafusion_dedup_ai_spark.operators.rangejoin import band_join

    s = load_table(spark, sf_dir, "supplier")
    a = s.alias("a")
    b = s.alias("b")
    joined = band_join(
        a,
        b,
        F.col("a.s_acctbal"),
        F.col("b.s_acctbal"),
        width=10.0,
        residual=F.col("a.s_suppkey") < F.col("b.s_suppkey"),
    )
    return joined.select(
        F.col("a.s_suppkey").alias("suppkey_a"),
        F.col("b.s_suppkey").alias("suppkey_b"),
    )


# ===========================================================================
# String functions
# ===========================================================================


@register(
    "part_string_features",
    """
    SELECT p_partkey,
           upper(p_name) AS name_upper,
           CAST(length(p_name) AS BIGINT) AS name_len,
           substr(p_name, 1, 5) AS name_prefix,
           concat_ws('|', p_brand, p_type) AS brand_type,
           CAST(len(string_split(p_name, ' ')) AS BIGINT) AS n_tokens,
           reverse(p_name) AS name_rev,
           CAST(levenshtein(p_name, lower(p_brand)) AS BIGINT) AS lev_to_brand
    FROM part
    """,
)
def q_part_string_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.length("p_name").cast("bigint").alias("name_len"),
        F.substring("p_name", 1, 5).alias("name_prefix"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
        F.size(F.split("p_name", " ")).cast("bigint").alias("n_tokens"),
        F.reverse(F.col("p_name")).alias("name_rev"),
        F.levenshtein("p_name", F.lower("p_brand")).cast("bigint").alias("lev_to_brand"),
    )


# ===========================================================================
# Date/time functions
# ===========================================================================


@register(
    "event_date_parts",
    """
    SELECT event_id,
           CAST(year(ts) AS BIGINT) AS y,
           CAST(month(ts) AS BIGINT) AS m,
           CAST(day(ts) AS BIGINT) AS d,
           CAST(hour(ts) AS BIGINT) AS h,
           epoch_us(date_trunc('day', ts)) AS day_us
    FROM events
    """,
)
def q_event_date_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.year("ts").cast("bigint").alias("y"),
        F.month("ts").cast("bigint").alias("m"),
        F.dayofmonth("ts").cast("bigint").alias("d"),
        F.hour("ts").cast("bigint").alias("h"),
        F.unix_micros(F.date_trunc("day", F.col("ts"))).alias("day_us"),
    )


# ===========================================================================
# JSON extraction
# ===========================================================================


@register(
    "json_event_stats",
    """
    SELECT event_type,
           COUNT(*) AS n,
           -- CAST the SUM back down: DuckDB promotes SUM(BIGINT) to HUGEINT,
           -- which pandas lands as float64/object and breaks the value-hash
           -- compare against Spark's int64 (values are identical).
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
           MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
    FROM events
    GROUP BY event_type
    """,
)
def q_json_event_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return e.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(k).alias("sum_k"),
        F.min(k).alias("min_k"),
        F.max(k).alias("max_k"),
    )


# ===========================================================================
# Tumbling time-window aggregation (batch analog of streaming windows)
# ===========================================================================


@register(
    "hourly_event_stats",
    f"""
    SELECT epoch_us(date_trunc('hour', ts)) AS hour_us,
           event_type,
           COUNT(*) AS n,
           CAST(SUM({_sql_cents('value')}) AS DOUBLE) / 100.0 AS sum_value,
           COUNT(DISTINCT user_id) AS n_users
    FROM events
    GROUP BY 1, 2
    """,
)
def q_hourly_event_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1h window over event time — in Structured Streaming the same
    plan is F.window(ts, '1 hour') + watermark (streaming/ module)."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.unix_micros(F.date_trunc("hour", F.col("ts"))).alias("hour_us"),
            "event_type",
        )
        .agg(
            F.count("*").alias("n"),
            (F.sum(_cents(F.col("value"))).cast("double") / 100.0).alias("sum_value"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )


# ===========================================================================
# Gap-based sessionization (lag + running sum)
# ===========================================================================

_SESSION_GAP_US = 30 * 60 * 1_000_000


@register(
    "user_sessions",
    f"""
    WITH t AS (
        SELECT user_id, event_id, epoch_us(ts) AS ts_us FROM events
    ), marked AS (
        SELECT user_id, event_id, ts_us,
               CASE WHEN lag(ts_us) OVER w IS NULL
                         OR ts_us - lag(ts_us) OVER w > {_SESSION_GAP_US}
                    THEN 1 ELSE 0 END AS new_session
        FROM t
        WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
    ), sess AS (
        SELECT user_id,
               SUM(new_session) OVER (
                   PARTITION BY user_id ORDER BY ts_us, event_id
                   ROWS UNBOUNDED PRECEDING) AS session_id
        FROM marked
    )
    SELECT user_id,
           CAST(MAX(session_id) AS BIGINT) AS n_sessions,
           COUNT(*) AS n_events
    FROM sess
    GROUP BY user_id
    """,
)
def q_user_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows in batch: gap > 30 min starts a new session. One
    shuffle on user_id serves both window phases and the final aggregate."""
    e = load_table(spark, sf_dir, "events")
    t = e.select("user_id", "event_id", F.unix_micros(F.col("ts")).alias("ts_us"))
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    marked = t.withColumn(
        "new_session",
        F.when(
            F.lag("ts_us").over(w).isNull()
            | ((F.col("ts_us") - F.lag("ts_us").over(w)) > _SESSION_GAP_US),
            1,
        ).otherwise(0),
    )
    sess = marked.withColumn(
        "session_id",
        F.sum("new_session").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return sess.groupBy("user_id").agg(
        F.max("session_id").cast("bigint").alias("n_sessions"),
        F.count("*").alias("n_events"),
    )


# ===========================================================================
# Cube (full grouping-set lattice)
# ===========================================================================


@register(
    "cube_order_counts",
    """
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def q_cube_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("n_orders")
    )


# ===========================================================================
# As-of (previous-event) join via window lag — the Spark-idiomatic form
# ===========================================================================


@register(
    "orders_asof_prev",
    """
    SELECT o_orderkey, o_custkey,
           epoch_us(o_orderdate) AS order_us,
           lag(epoch_us(o_orderdate)) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
           ) AS prev_order_us
    FROM orders
    """,
)
def q_orders_asof_prev(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of lookup of each customer's previous order. For same-table as-of,
    a window lag IS the right plan (one shuffle on the key, no join); the
    two-table variant becomes union + the same window, tagged by source."""
    o = load_table(spark, sf_dir, "orders")
    ts = F.unix_micros(F.col("o_orderdate").cast("timestamp"))
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").asc(), F.col("o_orderkey").asc()
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        ts.alias("order_us"),
        F.lag(ts).over(w).alias("prev_order_us"),
    )


# ===========================================================================
# Pivot, grouping sets, exact quantiles, set operations
# ===========================================================================


@register(
    "status_pivot_by_priority",
    """
    SELECT o_orderpriority,
           COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS "O",
           COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS "F",
           COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS "P"
    FROM orders GROUP BY o_orderpriority
    """,
)
def q_status_pivot_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (long->wide) order counts: priority rows x status columns.
    Pinned pivot values keep the schema static (no extra distinct-scan job
    and no schema drift between runs — required at scale AND for the
    contract); counts fill to 0 like the oracle's FILTER form."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .agg(F.count(F.lit(1)))
        .na.fill(0, ["O", "F", "P"])
    )


@register(
    "revenue_grouping_sets",
    f"""
    SELECT COALESCE(o_orderstatus, 'ALL') AS status,
           COALESCE(o_orderpriority, 'ALL') AS priority,
           COUNT(*) AS n_orders,
           CAST(SUM({_sql_cents('o_totalprice')}) AS DOUBLE) / 100.0 AS revenue
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
)
def q_revenue_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS: status-level, priority-level, and grand totals in one
    pass (one shuffle; the expand operator replicates rows per set, which is
    exactly how a 100 TB multi-rollup should run — not three separate scans).
    Exact integer-cent accumulation keeps the double bit-identical at any
    partial-agg order."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupingSets(
            [[F.col("o_orderstatus")], [F.col("o_orderpriority")], []],
            F.col("o_orderstatus"),
            F.col("o_orderpriority"),
        )
        .agg(
            F.count("*").alias("n_orders"),
            (F.sum(_cents(F.col("o_totalprice"))).cast("double") / 100.0).alias(
                "revenue"
            ),
        )
        .select(
            F.coalesce(F.col("o_orderstatus"), F.lit("ALL")).alias("status"),
            F.coalesce(F.col("o_orderpriority"), F.lit("ALL")).alias("priority"),
            "n_orders",
            "revenue",
        )
    )


@register(
    "quantity_quantiles",
    """
    SELECT l_returnflag,
           quantile_cont(l_quantity, 0.25) AS p25,
           quantile_cont(l_quantity, 0.50) AS p50,
           quantile_cont(l_quantity, 0.75) AS p75,
           CAST(COUNT(*) AS BIGINT) AS n_rows
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_quantity_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact linear-interpolated quantiles per return flag. Spark's
    `percentile` matches DuckDB's `quantile_cont` definition; quantities are
    small integers stored as doubles, so the interpolated values are exact
    dyadic rationals — safe to hash. At 100 TB you'd switch to
    `approx_percentile` (t-digest, bounded memory); the exact form is the
    correctness baseline."""
    l = load_table(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.percentile("l_quantity", F.lit(0.25)).alias("p25"),
        F.percentile("l_quantity", F.lit(0.50)).alias("p50"),
        F.percentile("l_quantity", F.lit(0.75)).alias("p75"),
        F.count("*").alias("n_rows"),
    )


@register(
    "status_custkey_setops",
    """
    WITH f AS (SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'F'),
         o AS (SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'O')
    SELECT 'both' AS tag, o_custkey FROM (SELECT * FROM f INTERSECT SELECT * FROM o)
    UNION ALL
    SELECT 'f_only' AS tag, o_custkey FROM (SELECT * FROM f EXCEPT SELECT * FROM o)
    """,
)
def q_status_custkey_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT / UNION ALL in one result: customers with both
    finished and open orders vs finished-only. Catalyst rewrites the set ops
    to semi/anti joins over pre-aggregated distinct sets — the same two
    shuffles a hand-written plan would do."""
    o = load_table(spark, sf_dir, "orders")
    f_keys = o.where(F.col("o_orderstatus") == "F").select("o_custkey").distinct()
    o_keys = o.where(F.col("o_orderstatus") == "O").select("o_custkey").distinct()
    both = f_keys.intersect(o_keys).select(
        F.lit("both").alias("tag"), "o_custkey"
    )
    f_only = f_keys.exceptAll(o_keys).select(
        F.lit("f_only").alias("tag"), "o_custkey"
    )
    return both.unionAll(f_only)


@register("quantity_quantiles_approx", None)
def q_quantity_quantiles_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB form of quantity_quantiles: approx_percentile with
    accuracy=10000 (bounded memory regardless of group size, mergeable across
    partitions). Rows-only by definition; tests pin it within the sketch's
    rank-error bound of the exact quantiles."""
    l = load_table(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.approx_percentile("l_quantity", F.lit(0.25), F.lit(10000)).alias("p25"),
        F.approx_percentile("l_quantity", F.lit(0.50), F.lit(10000)).alias("p50"),
        F.approx_percentile("l_quantity", F.lit(0.75), F.lit(10000)).alias("p75"),
        F.count("*").alias("n_rows"),
    )


@register(
    "orders_profile",
    """
    SELECT 'o_orderkey' AS col, COUNT(*) - COUNT(o_orderkey) AS n_nulls,
           COUNT(DISTINCT o_orderkey) AS n_distinct,
           CAST(MIN(o_orderkey) AS DOUBLE) AS min_val,
           CAST(MAX(o_orderkey) AS DOUBLE) AS max_val
    FROM orders
    UNION ALL
    SELECT 'o_custkey', COUNT(*) - COUNT(o_custkey),
           COUNT(DISTINCT o_custkey),
           CAST(MIN(o_custkey) AS DOUBLE), CAST(MAX(o_custkey) AS DOUBLE)
    FROM orders
    UNION ALL
    SELECT 'o_totalprice', COUNT(*) - COUNT(o_totalprice),
           COUNT(DISTINCT o_totalprice),
           CAST(MIN(o_totalprice) AS DOUBLE), CAST(MAX(o_totalprice) AS DOUBLE)
    FROM orders
    UNION ALL
    SELECT 'o_orderstatus', COUNT(*) - COUNT(o_orderstatus),
           COUNT(DISTINCT o_orderstatus), NULL, NULL
    FROM orders
    UNION ALL
    SELECT 'o_orderpriority', COUNT(*) - COUNT(o_orderpriority),
           COUNT(DISTINCT o_orderpriority), NULL, NULL
    FROM orders
    """,
)
def q_orders_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-profiling utility (the ANALYZE-style pass a pipeline runs before
    choosing join strategies): per-column null count, exact distinct count,
    numeric min/max — computed in ONE scan as a wide aggregate, then
    unpivoted to long form. At 100 TB swap countDistinct for
    approx_count_distinct; the single-scan wide-agg shape is the point."""
    o = load_table(spark, sf_dir, "orders")
    num_cols = ["o_orderkey", "o_custkey", "o_totalprice"]
    str_cols = ["o_orderstatus", "o_orderpriority"]
    aggs = [F.count("*").alias("_n")]
    for c in num_cols + str_cols:
        aggs.append(F.count(c).alias(f"{c}__cnt"))
        aggs.append(F.countDistinct(c).alias(f"{c}__nd"))
    for c in num_cols:
        aggs.append(F.min(c).cast("double").alias(f"{c}__min"))
        aggs.append(F.max(c).cast("double").alias(f"{c}__max"))
    wide = o.agg(*aggs)
    rows = []
    for c in num_cols:
        rows.append(
            F.struct(
                F.lit(c).alias("col"),
                (F.col("_n") - F.col(f"{c}__cnt")).alias("n_nulls"),
                F.col(f"{c}__nd").alias("n_distinct"),
                F.col(f"{c}__min").alias("min_val"),
                F.col(f"{c}__max").alias("max_val"),
            )
        )
    for c in str_cols:
        rows.append(
            F.struct(
                F.lit(c).alias("col"),
                (F.col("_n") - F.col(f"{c}__cnt")).alias("n_nulls"),
                F.col(f"{c}__nd").alias("n_distinct"),
                F.lit(None).cast("double").alias("min_val"),
                F.lit(None).cast("double").alias("max_val"),
            )
        )
    return wide.select(F.explode(F.array(*rows)).alias("p")).select(
        "p.col", "p.n_nulls", "p.n_distinct", "p.min_val", "p.max_val"
    )


@register(
    "customer_running_revenue",
    f"""
    SELECT o_custkey, o_orderkey,
           CAST(SUM({_sql_cents('o_totalprice')}) OVER (
               PARTITION BY o_custkey
               ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS DOUBLE) / 100.0 AS running_revenue,
           CAST(RANK() OVER (
               PARTITION BY o_custkey ORDER BY {_sql_cents('o_totalprice')} DESC
           ) AS BIGINT) AS price_rank,
           CAST(NTILE(4) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
           ) AS BIGINT) AS date_quartile
    FROM orders
    """,
)
def q_customer_running_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window-frame coverage: cumulative sum over an explicit ROWS frame,
    rank, and ntile in one pass — one shuffle on o_custkey serves all three
    window specs (same partition key). Cents accumulation keeps the running
    double exact at every prefix."""
    o = load_table(spark, sf_dir, "orders")
    w_date = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w_cum = w_date.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_price = Window.partitionBy("o_custkey").orderBy(
        _cents(F.col("o_totalprice")).desc()
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        (F.sum(_cents(F.col("o_totalprice"))).over(w_cum).cast("double") / 100.0).alias(
            "running_revenue"
        ),
        F.rank().over(w_price).cast("bigint").alias("price_rank"),
        F.ntile(4).over(w_date).cast("bigint").alias("date_quartile"),
    )


@register(
    "nation_customer_roster",
    """
    SELECT n.n_name,
           COUNT(*) AS n_customers,
           string_agg(c.c_name, '|' ORDER BY c.c_name) AS roster
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
)
def q_nation_customer_roster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (LISTAGG shape): collect, sort, join —
    the explicit array_sort makes the concatenation deterministic at any
    parallelism (an unordered string_agg is not reproducible distributed)."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    return (
        c.join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .groupBy("n_name")
        .agg(
            F.count("*").alias("n_customers"),
            F.array_join(F.array_sort(F.collect_list("c_name")), "|").alias("roster"),
        )
    )


@register(
    "customer_order_coverage",
    f"""
    WITH per_cust AS (
        SELECT o_custkey, COUNT(*) AS n_orders,
               CAST(SUM({_sql_cents('o_totalprice')}) AS DOUBLE) / 100.0 AS revenue
        FROM orders GROUP BY o_custkey
    )
    SELECT COALESCE(c.c_custkey, p.o_custkey) AS custkey,
           c.c_name,
           COALESCE(p.n_orders, 0) AS n_orders,
           COALESCE(p.revenue, 0.0) AS revenue
    FROM customer c FULL OUTER JOIN per_cust p ON c.c_custkey = p.o_custkey
    """,
)
def q_customer_order_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER JOIN coverage: customers with zero orders AND (synthetic-
    data-possible) orders whose custkey has no customer row both survive,
    keys coalesced. Aggregate-then-join keeps the outer join on the small
    pre-aggregated side instead of the raw fact table."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    per_cust = o.groupBy("o_custkey").agg(
        F.count("*").alias("n_orders"),
        (F.sum(_cents(F.col("o_totalprice"))).cast("double") / 100.0).alias("revenue"),
    )
    j = c.join(per_cust, c["c_custkey"] == per_cust["o_custkey"], "full_outer")
    return j.select(
        F.coalesce(F.col("c_custkey"), F.col("o_custkey")).alias("custkey"),
        "c_name",
        F.coalesce(F.col("n_orders"), F.lit(0)).alias("n_orders"),
        F.coalesce(F.col("revenue"), F.lit(0.0)).alias("revenue"),
    )


# ===========================================================================
# Time-series gap fill (resample to a dense per-user daily spine)
# ===========================================================================


@register(
    "user_daily_gapfill",
    f"""
    WITH daily AS (
        SELECT user_id, CAST(ts AS DATE) AS day, COUNT(*) AS n_events,
               SUM({_sql_cents('value')}) AS cents
        FROM events GROUP BY 1, 2
    ), span AS (
        SELECT user_id, min(day) AS d0, max(day) AS d1 FROM daily GROUP BY 1
    ), spine AS (
        SELECT user_id,
               CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE)
                   AS day
        FROM span
    )
    SELECT s.user_id,
           strftime(s.day, '%Y-%m-%d') AS day,
           COALESCE(d.n_events, 0) AS n_events,
           CAST(COALESCE(d.cents, 0) AS DOUBLE) / 100.0 AS sum_value
    FROM spine s
    LEFT JOIN daily d ON s.user_id = d.user_id AND s.day = d.day
    """,
)
def q_user_daily_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resample/gap-fill: dense per-user daily activity with zero-filled
    missing days (the hypertable/time-bucket-gapfill shape). The spine is
    generated from each user's own [min, max] span — sequence + explode,
    sized by the span not the data — and joined back on (user_id, day).
    Two shuffles (daily agg, spine join), both keyed on user_id; the spine
    side is tiny (users x days) so AQE broadcasts it at any real scale."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "user_id", F.col("ts").cast("date").alias("day")
    ).agg(
        F.count("*").alias("n_events"),
        F.sum(_cents(F.col("value"))).alias("cents"),
    )
    span = daily.groupBy("user_id").agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    spine = span.select(
        "user_id", F.explode(F.sequence("d0", "d1")).alias("day")
    )
    return (
        spine.join(daily, ["user_id", "day"], "left")
        .select(
            "user_id",
            # ISO string, not DateType: the contract surface keeps temporal
            # outputs engine-neutral (dates materialize as datetime.date in
            # Spark's pandas but datetime64 in DuckDB's — dtype hash skew)
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.coalesce(F.col("n_events"), F.lit(0)).alias("n_events"),
            (F.coalesce(F.col("cents"), F.lit(0)).cast("double") / 100.0).alias(
                "sum_value"
            ),
        )
    )


# ===========================================================================
# Data-quality quarantine (expectations with violation reasons)
# ===========================================================================

_VALID_EVENT_TYPES = ("signup", "click", "purchase", "error", "view")


@register(
    "event_quality_quarantine",
    f"""
    WITH checked AS (
        SELECT event_id, user_id, event_type,
               CASE WHEN value <= 0 OR value > 300
                    THEN 'value_out_of_range' END AS v1,
               CASE WHEN CAST(json_extract_string(props, '$.k') AS BIGINT) >= 90
                    THEN 'k_out_of_range' END AS v2,
               CASE WHEN event_type NOT IN
                         {str(_VALID_EVENT_TYPES)}
                    THEN 'unknown_event_type' END AS v3
        FROM events
    )
    SELECT event_id, user_id, event_type,
           concat_ws(',', v1, v2, v3) AS violations,
           CAST((CASE WHEN v1 IS NULL THEN 0 ELSE 1 END)
              + (CASE WHEN v2 IS NULL THEN 0 ELSE 1 END)
              + (CASE WHEN v3 IS NULL THEN 0 ELSE 1 END) AS BIGINT)
               AS n_violations
    FROM checked
    WHERE v1 IS NOT NULL OR v2 IS NOT NULL OR v3 IS NOT NULL
    """,
)
def q_event_quality_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expectations-style validation: every row is checked against a rule
    set (value range, JSON field domain, enum membership) and violators are
    quarantined with machine-readable reasons — the split-and-route step
    upstream of every production ingest. Pure CASE projection + filter:
    fuses into the scan, no shuffle; the clean path is the same plan with
    the predicate inverted."""
    ev = load_table(spark, sf_dir, "events")
    v1 = F.when(
        (F.col("value") <= 0) | (F.col("value") > 300), "value_out_of_range"
    )
    v2 = F.when(
        F.get_json_object("props", "$.k").cast("bigint") >= 90,
        "k_out_of_range",
    )
    v3 = F.when(
        ~F.col("event_type").isin(*_VALID_EVENT_TYPES), "unknown_event_type"
    )
    checked = ev.select(
        "event_id", "user_id", "event_type",
        v1.alias("v1"), v2.alias("v2"), v3.alias("v3"),
    )
    n_violations = sum(
        F.when(F.col(c).isNull(), 0).otherwise(1) for c in ("v1", "v2", "v3")
    )
    return (
        checked.where(
            F.col("v1").isNotNull()
            | F.col("v2").isNotNull()
            | F.col("v3").isNotNull()
        )
        .select(
            "event_id",
            "user_id",
            "event_type",
            F.concat_ws(",", "v1", "v2", "v3").alias("violations"),
            n_violations.cast("bigint").alias("n_violations"),
        )
    )


# ---------------------------------------------------------------------------
# Correlated LATERAL subquery (per-row dependent top-N)
# ---------------------------------------------------------------------------


@register(
    "lateral_top_orders",
    """
    SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
    FROM customer c
    JOIN LATERAL (
        SELECT o_orderkey, o_totalprice
        FROM orders o WHERE o.o_custkey = c.c_custkey
        ORDER BY o_totalprice DESC, o_orderkey LIMIT 2
    ) t ON TRUE
    """,
)
def q_lateral_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-2 orders per customer via a correlated LATERAL subquery — the SQL
    surface for per-row dependent subplans. Catalyst DECORRELATES it
    (DecorrelateInnerQuery rewrites the correlated limit into a
    rank-over-window domain join), so the executed plan is the same
    shuffle-once window top-k a hand-written version would produce — no
    per-customer re-execution, which is what makes the construct survive
    100 TB. Complements `window_topk_orders` (explicit window form): same
    answer class, different front-end path, both oracle-gated. o_totalprice
    is projected untouched (stored doubles, no arithmetic), so the hash
    gate compares bit-identical values."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView(
        "v_lateral_customer"
    )
    load_table(spark, sf_dir, "orders").createOrReplaceTempView(
        "v_lateral_orders"
    )
    return spark.sql(
        """
        SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
        FROM v_lateral_customer c
        JOIN LATERAL (
            SELECT o_orderkey, o_totalprice
            FROM v_lateral_orders o WHERE o.o_custkey = c.c_custkey
            ORDER BY o_totalprice DESC, o_orderkey LIMIT 2
        ) t
        """
    )
