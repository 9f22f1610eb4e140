"""Product/warehouse analytics shapes round 4: event-sequence mining, rolling
and comparative time windows, and customer-value distribution.

Each query exercises a distinct window/aggregation pattern the registry did
not yet cover:

- transition mining (lag over a per-user ordered stream -> pair counts)
- rolling RANGE-frame average over a pre-aggregated daily series
- population z-score anomaly flagging (window stats without a second scan)
- lag-based month-over-month growth on a 1-shuffle monthly rollup
- ntile decile distribution over customer lifetime value
- per-key event-gap statistics (lag + datediff)
- year-over-year deltas via lag over a yearly rollup
- semi-structured JSON stats (get_json_object into typed aggregation)

Scale notes: every window here partitions by a key (user/customer/class) or
runs over a tiny pre-aggregated series (days/months/years — thousands of
rows at any corpus size), so no single-partition global sorts touch raw
facts. The raw-fact shuffles are the unavoidable one-per-rollup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mongodb_nats_connector_spark.plans.ranking import (
    ntile_from_rank,
    two_pass_global_rank,
)
from mongodb_nats_connector_spark.registry import register
from mongodb_nats_connector_spark.sources.tables import table


@register(
    "events_user_transitions",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_type
      FROM events WHERE ts IS NOT NULL
    )
    SELECT prev_type, event_type AS next_type,
           CAST(count(*) AS BIGINT) AS n_transitions
    FROM seq
    WHERE prev_type IS NOT NULL
    GROUP BY 1, 2
    """,
    doc="Event-sequence transition mining: per-user lag over (ts, event_id) "
    "order, then corpus-wide (prev, next) pair counts — the Markov-chain "
    "transition matrix of the event stream. One shuffle on user_id for the "
    "window, one on the pair for the count. NULL event times are filtered "
    "on both engines (Spark orders NULLs first, DuckDB last — an unguarded "
    "lag would pair boundary events differently).",
)
def events_user_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_transitions"))
    )


@register(
    "events_dau_rolling",
    oracle="""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day,
             CAST(count(DISTINCT user_id) AS BIGINT) AS dau
      FROM events
      GROUP BY 1
    )
    SELECT day, dau,
           avg(dau) OVER (ORDER BY epoch(CAST(day AS TIMESTAMP)) / 86400
                          RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
             AS dau_7d_avg
    FROM daily
    """,
    doc="Rolling 7-day average of daily active users: distinct-user rollup "
    "per day, then a RANGE frame keyed on epoch days (gap-correct even when "
    "days are missing — a ROWS frame would silently span gaps). The global "
    "window runs over the tiny post-agg day series, never the raw events.",
)
def events_dau_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.countDistinct("user_id").cast("bigint").alias("dau")
    )
    day_num = F.unix_timestamp(F.col("day").cast("timestamp")) / 86400
    w = Window.orderBy(day_num).rangeBetween(-6, 0)
    return daily.select(
        "day", "dau", F.avg("dau").over(w).alias("dau_7d_avg")
    )


@register(
    "events_daily_anomaly",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(count(*) AS BIGINT) AS n
      FROM events
      GROUP BY 1, 2
    ),
    scored AS (
      SELECT event_type, day, n,
             CASE WHEN min(n) OVER (PARTITION BY event_type)
                    <> max(n) OVER (PARTITION BY event_type) THEN
               round((n - avg(n) OVER (PARTITION BY event_type))
                 / stddev_samp(n) OVER (PARTITION BY event_type), 4)
             END AS zscore
      FROM daily
    )
    SELECT event_type, day, n, zscore
    FROM scored
    WHERE abs(zscore) > 2.0
    """,
    doc="Daily-volume anomaly detection: per-type daily counts, population "
    "mean/stddev via an unordered window over the same partition (no second "
    "scan or self-join), flag |z| > 2 days. Window partitions by event_type "
    "over the post-rollup series. The threshold filter runs on the ROUNDED "
    "z-score on both engines: filtering the raw double would let a "
    "stddev-algorithm ulp flip membership of a row that sits exactly on "
    "the 2.0 boundary after rounding. A constant daily series (sd = 0) "
    "emits NULL z via the exact-integer min<>max guard — never a 0/0 "
    "whose NULL-vs-NaN result is a DuckDB-version coin flip.",
)
def events_daily_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy("event_type", F.col("ts").cast("date").alias("day")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    w = Window.partitionBy("event_type")
    z = F.when(
        F.min("n").over(w) != F.max("n").over(w),
        F.round(
            (F.col("n") - F.avg("n").over(w)) / F.stddev_samp("n").over(w), 4
        ),
    )
    return (
        daily.withColumn("zscore", z)
        .filter(F.abs(F.col("zscore")) > 2.0)
        .select("event_type", "day", "n", "zscore")
    )


@register(
    "orders_monthly_growth",
    oracle="""
    WITH monthly AS (
      SELECT date_trunc('month', o_orderdate) AS month,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS rev_c
      FROM orders
      GROUP BY 1
    )
    SELECT month, round(rev_c / 100.0, 2) AS revenue,
           round((rev_c - lag(rev_c) OVER (ORDER BY month)) / 100.0, 2)
             AS revenue_delta,
           round((rev_c - lag(rev_c) OVER (ORDER BY month))
             * 1.0 / lag(rev_c) OVER (ORDER BY month), 6) AS growth_rate
    FROM monthly
    """,
    doc="Month-over-month revenue growth: monthly rollup in EXACT INTEGER "
    "CENTS (a raw double sum's last ulp depends on partition combine "
    "order, which diverges cross-engine the moment the scan splits), then "
    "lag deltas and growth rate over the ~80-row month series. The global "
    "orderBy window is safe — it sorts months, not orders.",
)
def orders_monthly_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    monthly = orders.groupBy(
        F.date_trunc("month", "o_orderdate").alias("month")
    ).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
        .cast("bigint")
        .alias("rev_c")
    )
    w = Window.orderBy("month")
    prev = F.lag("rev_c").over(w)
    return monthly.select(
        "month",
        F.round(F.col("rev_c") / 100.0, 2).alias("revenue"),
        F.round((F.col("rev_c") - prev) / 100.0, 2).alias("revenue_delta"),
        F.round((F.col("rev_c") - prev) * 1.0 / prev, 6).alias("growth_rate"),
    )


@register(
    "customer_ltv_deciles",
    oracle="""
    WITH ltv AS (
      SELECT o_custkey,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS ltv_c
      FROM orders
      GROUP BY 1
    ),
    ranked AS (
      SELECT o_custkey, ltv_c,
             ntile(10) OVER (ORDER BY ltv_c DESC, o_custkey) AS decile
      FROM ltv
    )
    SELECT decile,
           CAST(count(*) AS BIGINT) AS n_customers,
           round(sum(ltv_c) / 100.0, 2) AS total_value,
           round(min(ltv_c) / 100.0, 2) AS min_value,
           round(max(ltv_c) / 100.0, 2) AS max_value
    FROM ranked
    GROUP BY decile
    """,
    doc="Customer lifetime-value decile distribution: per-customer revenue "
    "rollup in EXACT INTEGER CENTS (so both the decile RANK and the decile "
    "sums are summation-order-independent — a double sum's last ulp could "
    "flip a tie-broken ntile boundary), then per-decile summary. The "
    "per-customer relation is data-proportional, so ntile's global "
    "single-partition sort is replaced by the two-pass range-partitioned "
    "rank (plans/ranking.py): quantile-boundary broadcast -> per-bucket "
    "row_number + bucket-offset prefix sum -> exact ntile arithmetic from "
    "(rank, n). Identical output to ntile(10) by construction — the "
    "oracle keeps the ntile formulation — with every data-proportional "
    "window partitioned by bucket.",
)
def customer_ltv_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    ltv = orders.groupBy("o_custkey").agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
        .cast("bigint")
        .alias("ltv_c")
    )
    # persisted NOW: the two-pass boundary sketch and the collected bucket
    # offsets both run jobs at construction and would otherwise recompute
    # the fact rollup; released on result GC
    ltv = ltv.persist()
    ranked = two_pass_global_rank(
        ltv, "ltv_c", "o_custkey", descending=True, collected_offsets=True
    )
    decile = ntile_from_rank(F.col("_rank"), F.col("_n"), 10)
    from mongodb_nats_connector_spark.plans.caching import release_on_gc

    return release_on_gc(
        ltv,
        ranked.withColumn("decile", decile)
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_customers"),
            F.round(F.sum("ltv_c") / 100.0, 2).alias("total_value"),
            F.round(F.min("ltv_c") / 100.0, 2).alias("min_value"),
            F.round(F.max("ltv_c") / 100.0, 2).alias("max_value"),
        ),
    )


@register(
    "customer_order_gaps",
    oracle="""
    WITH gaps AS (
      SELECT o_custkey,
             date_diff('day',
                       lag(o_orderdate) OVER (PARTITION BY o_custkey
                                              ORDER BY o_orderdate, o_orderkey),
                       o_orderdate) AS gap_days
      FROM orders
    )
    SELECT o_custkey,
           CAST(count(gap_days) AS BIGINT) AS n_gaps,
           avg(gap_days) AS avg_gap_days,
           CAST(max(gap_days) AS BIGINT) AS max_gap_days
    FROM gaps
    WHERE gap_days IS NOT NULL
    GROUP BY o_custkey
    HAVING count(gap_days) >= 2
    """,
    doc="Inter-order gap statistics per customer: lag over (orderdate, "
    "orderkey) within customer, day deltas, then avg/max per customer with "
    "at least two gaps. Window and final agg share the o_custkey "
    "partitioning — one shuffle total.",
)
def customer_order_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    gap = F.datediff(
        F.col("o_orderdate").cast("date"),
        F.lag(F.col("o_orderdate")).over(w).cast("date"),
    )
    return (
        orders.withColumn("gap_days", gap)
        .filter(F.col("gap_days").isNotNull())
        .groupBy("o_custkey")
        .agg(
            F.count("gap_days").cast("bigint").alias("n_gaps"),
            F.avg("gap_days").alias("avg_gap_days"),
            F.max("gap_days").cast("bigint").alias("max_gap_days"),
        )
        .filter(F.col("n_gaps") >= 2)
    )


@register(
    "revenue_yoy",
    oracle="""
    WITH yearly AS (
      SELECT CAST(year(l_shipdate) AS INT) AS ship_year,
             CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100)
                           AS BIGINT)) AS BIGINT) AS rev_c,
             CAST(count(*) AS BIGINT) AS n_lineitems
      FROM lineitem
      GROUP BY 1
    )
    SELECT ship_year, round(rev_c / 100.0, 2) AS revenue, n_lineitems,
           round(rev_c * 1.0 / lag(rev_c) OVER (ORDER BY ship_year) - 1.0, 6)
             AS yoy_growth
    FROM yearly
    """,
    doc="Year-over-year revenue: yearly rollup of discounted lineitem "
    "revenue in EXACT INTEGER CENTS (map-side partial agg, one shuffle to "
    "~7 rows; order-independent, so the growth ratio is engine-exact at "
    "any partitioning), then lag-based growth over the year series.",
)
def revenue_yoy(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    yearly = li.groupBy(
        F.year("l_shipdate").cast("int").alias("ship_year")
    ).agg(
        F.sum(
            F.round(
                F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
            ).cast("bigint")
        )
        .cast("bigint")
        .alias("rev_c"),
        F.count(F.lit(1)).cast("bigint").alias("n_lineitems"),
    )
    w = Window.orderBy("ship_year")
    return yearly.select(
        "ship_year",
        F.round(F.col("rev_c") / 100.0, 2).alias("revenue"),
        "n_lineitems",
        F.round(
            F.col("rev_c") * 1.0 / F.lag("rev_c").over(w) - 1.0, 6
        ).alias("yoy_growth"),
    )


@register(
    "events_props_stats",
    oracle="""
    WITH extracted AS (
      SELECT event_type,
             CASE WHEN regexp_matches(props->>'$.k', '^-?[0-9]+$')
                  THEN TRY_CAST(props->>'$.k' AS INT) END AS k
      FROM events
    )
    SELECT event_type,
           CAST(count(k) AS BIGINT) AS n_with_k,
           CAST(sum(k) AS BIGINT) AS sum_k,
           avg(k) AS avg_k,
           CAST(count(DISTINCT k) AS BIGINT) AS n_distinct_k
    FROM extracted
    GROUP BY event_type
    """,
    doc="Semi-structured aggregation: extract the JSON payload field once "
    "(get_json_object -> typed int), then count/sum/avg/distinct per event "
    "type. The extraction is a JVM expression inside codegen, not a UDF. "
    "An integer-format regex gates the cast on BOTH engines: a malformed "
    "or fractional value ('1.7', 'abc') becomes NULL identically, instead "
    "of a strict-cast error (DuckDB) or engine-specific rounding.",
)
def events_props_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    k_str = F.get_json_object("props", "$.k")
    k = F.when(k_str.rlike("^-?[0-9]+$"), k_str.try_cast("int"))
    return (
        ev.withColumn("k", k)
        .groupBy("event_type")
        .agg(
            F.count("k").cast("bigint").alias("n_with_k"),
            F.sum("k").cast("bigint").alias("sum_k"),
            F.avg("k").alias("avg_k"),
            F.countDistinct("k").cast("bigint").alias("n_distinct_k"),
        )
    )
