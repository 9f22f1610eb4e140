"""Data-quality and sampling operators (round 5): a declarative rule engine,
key-skew profiling for shuffle planning, and deterministic per-key sampling.

Scale notes:

- ``dq_rule_violations`` — all row-local rules on a table evaluate in ONE
  scan as conditional aggregates (sum-of-CASE partial-aggregates map-side);
  cross-table rules (referential integrity, date ordering) are the only
  joins, each keyed on the natural join key so AQE can pick broadcast vs
  shuffle by actual build-side size. The result is a handful of rows — the
  classic DQ sweep a warehouse runs nightly over every fact table.
- ``profile_key_skew`` — the pre-flight check for any big join/agg: per-key
  frequencies reduce map-side (groupBy count), then a second tiny aggregate
  derives max-share and the Herfindahl concentration index. This is how you
  decide a key needs salting BEFORE launching the 100 TB shuffle.
- ``sample_reservoir_perkey`` — deterministic per-key k-sample: order rows
  within each key by a cryptographic hash of their id and keep the first k.
  Equivalent in distribution to per-key reservoir sampling but fully
  reproducible and embarrassingly parallel; Spark rewrites the rank filter
  to WindowGroupLimit, so each map task pre-prunes to k rows per key before
  the shuffle (no full sort of the fact table).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mongodb_nats_connector_spark.plans.caching import persist_until_collected
from mongodb_nats_connector_spark.plans.hints import maybe_broadcast
from mongodb_nats_connector_spark.plans.ranking import (
    ntile_from_rank,
    two_pass_global_rank,
)
from mongodb_nats_connector_spark.registry import register
from mongodb_nats_connector_spark.sources.tables import table

SAMPLE_K = 7


@register(
    "dq_rule_violations",
    oracle="""
    WITH li AS (
      SELECT count(*) AS checked,
             sum(CASE WHEN l_discount < 0 OR l_discount > 1 THEN 1 ELSE 0 END)
               AS v_discount,
             sum(CASE WHEN l_quantity <= 0 THEN 1 ELSE 0 END) AS v_qty,
             sum(CASE WHEN l_extendedprice <= 0 THEN 1 ELSE 0 END) AS v_price
      FROM lineitem
    ),
    ord AS (
      SELECT count(*) AS checked,
             sum(CASE WHEN o_totalprice < 0 THEN 1 ELSE 0 END) AS v_total,
             sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS v_null_cust
      FROM orders
    ),
    orphan_li AS (
      SELECT count(*) AS v FROM lineitem l
      WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
    ),
    orphan_ord AS (
      SELECT count(*) AS v FROM orders o
      WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
    ),
    shiporder AS (
      SELECT count(*) AS checked,
             sum(CASE WHEN l.l_shipdate < o.o_orderdate THEN 1 ELSE 0 END) AS v
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    )
    SELECT rule, CAST(violations AS BIGINT) AS violations,
           CAST(checked AS BIGINT) AS checked
    FROM (
      SELECT 'li_discount_range' AS rule, v_discount AS violations, checked FROM li
      UNION ALL SELECT 'li_nonpositive_qty', v_qty, checked FROM li
      UNION ALL SELECT 'li_nonpositive_price', v_price, checked FROM li
      UNION ALL SELECT 'li_orphan_order', v, (SELECT checked FROM li) FROM orphan_li
      UNION ALL SELECT 'li_ship_before_order', v, checked FROM shiporder
      UNION ALL SELECT 'ord_negative_total', v_total, checked FROM ord
      UNION ALL SELECT 'ord_null_custkey', v_null_cust, checked FROM ord
      UNION ALL SELECT 'ord_orphan_customer', v, (SELECT checked FROM ord) FROM orphan_ord
    )
    """,
    doc="Declarative data-quality rule engine: 8 rules over lineitem/orders "
    "— range, non-positivity, null, referential-integrity (anti-join) and "
    "cross-table date-order checks — emitted as (rule, violations, checked) "
    "rows. Row-local rules per table share ONE scan via conditional "
    "aggregation; only the referential/date rules join.",
)
def dq_rule_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Five scans total, one job: the three row-local lineitem rules share
    # one scan; the orphan-lineitem AND ship-before-order rules share one
    # lineitem⟕orders pass (the anti-join is the null side of the left
    # join); orders contributes its row-local scan, the join probe, and
    # the orphan-customer anti-join. The four 1-row summaries broadcast-
    # crossJoin into a single row and explode into the 8 rule rows.
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")

    def _cnt(cond):
        return F.sum(F.when(cond, 1).otherwise(0)).cast("bigint")

    li_agg = li.agg(
        F.count(F.lit(1)).alias("li_checked"),
        _cnt((F.col("l_discount") < 0) | (F.col("l_discount") > 1)).alias("v_discount"),
        _cnt(F.col("l_quantity") <= 0).alias("v_qty"),
        _cnt(F.col("l_extendedprice") <= 0).alias("v_price"),
    )
    ord_agg = o.agg(
        F.count(F.lit(1)).alias("ord_checked"),
        _cnt(F.col("o_totalprice") < 0).alias("v_total"),
        _cnt(F.col("o_custkey").isNull()).alias("v_null_cust"),
    )
    joined = li.select("l_orderkey", "l_shipdate").join(
        o.select("o_orderkey", "o_orderdate"),
        F.col("l_orderkey") == F.col("o_orderkey"),
        "left",
    )
    jagg = joined.agg(
        _cnt(F.col("o_orderkey").isNull()).alias("v_orphan_li"),
        _cnt(F.col("o_orderkey").isNotNull()).alias("ship_checked"),
        _cnt(F.col("l_shipdate") < F.col("o_orderdate")).alias("v_ship"),
    )
    orphan_ord = (
        o.join(maybe_broadcast(c), o.o_custkey == c.c_custkey, "left_anti")
        .agg(F.count(F.lit(1)).alias("v_orphan_ord"))
    )

    def row(name, violations, checked):
        return F.struct(
            F.lit(name).alias("rule"),
            violations.cast("bigint").alias("violations"),
            checked.cast("bigint").alias("checked"),
        )

    one = (
        li_agg.crossJoin(F.broadcast(jagg))
        .crossJoin(F.broadcast(ord_agg))
        .crossJoin(F.broadcast(orphan_ord))
    )
    return one.select(
        F.explode(
            F.array(
                row("li_discount_range", F.col("v_discount"), F.col("li_checked")),
                row("li_nonpositive_qty", F.col("v_qty"), F.col("li_checked")),
                row("li_nonpositive_price", F.col("v_price"), F.col("li_checked")),
                row("li_orphan_order", F.col("v_orphan_li"), F.col("li_checked")),
                row("li_ship_before_order", F.col("v_ship"), F.col("ship_checked")),
                row("ord_negative_total", F.col("v_total"), F.col("ord_checked")),
                row("ord_null_custkey", F.col("v_null_cust"), F.col("ord_checked")),
                row("ord_orphan_customer", F.col("v_orphan_ord"), F.col("ord_checked")),
            )
        ).alias("r")
    ).select("r.*")


@register(
    "profile_key_skew",
    oracle="""
    WITH per_key AS (
      SELECT l_suppkey AS k, count(*) AS c FROM lineitem GROUP BY 1
    ),
    stats AS (
      SELECT CAST(count(*) AS BIGINT) AS n_keys,
             CAST(sum(c) AS BIGINT) AS n_rows,
             CAST(max(c) AS BIGINT) AS max_key_rows,
             round(max(c) * 1.0 / sum(c), 6) AS max_share,
             round(sum(c * c) * 1.0 / (sum(c) * sum(c)), 6) AS herfindahl,
             round(avg(c), 4) AS avg_key_rows
      FROM per_key
    ),
    top AS (SELECT k AS top_key FROM per_key ORDER BY c DESC, k LIMIT 1)
    SELECT n_keys, n_rows, top_key, max_key_rows, max_share, herfindahl,
           avg_key_rows
    FROM stats CROSS JOIN top
    """,
    doc="Shuffle-key skew profile for lineitem.l_suppkey: key count, total "
    "rows, heaviest key and its share, and the Herfindahl concentration "
    "index (sum of squared key shares — 1/n_keys when uniform, 1.0 when one "
    "key owns everything). Per-key counts partial-aggregate map-side; the "
    "stats pass runs over the tiny per-key relation. This is the pre-flight "
    "that decides whether a join key needs salting before a 100 TB shuffle.",
)
def profile_key_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    per_key = li.groupBy(F.col("l_suppkey").alias("k")).agg(
        F.count(F.lit(1)).alias("c")
    )
    # ONE pass over the per-key relation: the top key folds into the same
    # aggregation via max_by on (count, -key) — max count, ties to the
    # smallest key — instead of a second sort+limit job.
    return per_key.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_keys"),
        F.sum("c").cast("bigint").alias("n_rows"),
        F.max_by("k", F.struct(F.col("c"), -F.col("k"))).alias("top_key"),
        F.max("c").cast("bigint").alias("max_key_rows"),
        F.round(F.max("c") / F.sum("c"), 6).alias("max_share"),
        # squares in DOUBLE: int64 c*c (and sum*sum) wraps past ~3e9 rows —
        # exactly the 100 TB regime this profiler exists for
        F.round(
            F.sum(F.col("c").cast("double") * F.col("c"))
            / (F.sum("c").cast("double") * F.sum("c")),
            6,
        ).alias("herfindahl"),
        F.round(F.avg("c"), 4).alias("avg_key_rows"),
    ).select(
        "n_keys",
        "n_rows",
        "top_key",
        "max_key_rows",
        "max_share",
        "herfindahl",
        "avg_key_rows",
    ).filter(
        # empty-input parity: the oracle's CROSS JOIN with its empty LIMIT-1
        # `top` CTE yields ZERO rows, where Spark's global agg yields one
        # all-NULL row — drop it so both engines agree on degenerate input
        F.col("n_keys") > 0
    )


@register(
    "sample_reservoir_perkey",
    oracle=f"""
    SELECT event_type, event_id, CAST(rn AS BIGINT) AS rn
    FROM (
      SELECT event_type, event_id,
             row_number() OVER (
               PARTITION BY event_type
               ORDER BY md5(CAST(event_id AS VARCHAR)), event_id) AS rn
      FROM events
    )
    WHERE rn <= {SAMPLE_K}
    """,
    doc=f"Deterministic per-key {SAMPLE_K}-sample: within each event_type, "
    "rows order by md5(event_id) — a reproducible stand-in for a uniform "
    "random draw — and the first k survive. Catalyst rewrites the "
    "rank-filter to WindowGroupLimit, so every map task keeps only k rows "
    "per key BEFORE the shuffle; the sort never touches the full table. "
    "The hash-ordered form is the scalable, restart-stable alternative to "
    "stateful reservoir sampling.",
)
def sample_reservoir_perkey(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("event_type")
        .orderBy(F.md5(F.col("event_id").cast("string")), "event_id")
    )
    return (
        ev.select("event_type", "event_id")
        .withColumn("rn", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rn") <= SAMPLE_K)
    )


@register(
    "events_time_to_convert",
    oracle="""
    WITH s AS (
      SELECT user_id, min(ts) AS signup_ts
      FROM events WHERE event_type = 'signup' GROUP BY 1
    ),
    p AS (
      SELECT e.user_id, min(e.ts) AS first_purchase_ts
      FROM events e JOIN s ON s.user_id = e.user_id
      WHERE e.event_type = 'purchase' AND e.ts >= s.signup_ts
      GROUP BY 1
    )
    SELECT s.user_id, s.signup_ts, p.first_purchase_ts,
           CAST(epoch_us(p.first_purchase_ts) - epoch_us(s.signup_ts)
                AS BIGINT) AS micros_to_convert
    FROM s LEFT JOIN p ON p.user_id = s.user_id
    """,
    doc="Funnel latency: per user, first signup and the first purchase at "
    "or after it (NULL if never converted), gap in epoch micros. The "
    "signup relation reduces to one row per user and BROADCASTS back into "
    "the purchase filter, so the fact table is scanned with a pushed "
    "event_type filter and shuffles only per-user partial minimums — the "
    "time-to-convert shape behind every activation dashboard.",
)
def events_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    s = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("signup_ts"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(maybe_broadcast(s), "user_id")
        .filter(F.col("ts") >= F.col("signup_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_purchase_ts"))
    )
    # the signup aggregate feeds BOTH the purchase probe and the left-join
    # spine: persist it for the life of the result so the fact-side signup
    # scan+agg runs once, not twice
    return persist_until_collected(
        s,
        s.join(p, "user_id", "left").select(
            "user_id",
            "signup_ts",
            "first_purchase_ts",
            (
                F.unix_micros("first_purchase_ts") - F.unix_micros("signup_ts")
            ).cast("bigint").alias("micros_to_convert"),
        ),
    )


@register(
    "agg_welch_ttest",
    oracle="""
    WITH s AS (
      SELECT event_type,
             count(*) AS n,
             count(DISTINCT value) AS ndv,
             avg(value) AS mean_v,
             var_samp(value) AS var_v
      FROM events WHERE event_type IN ('purchase', 'click')
      GROUP BY 1
    ),
    p AS (SELECT n, ndv, mean_v, var_v FROM s WHERE event_type = 'purchase'),
    c AS (SELECT n, ndv, mean_v, var_v FROM s WHERE event_type = 'click')
    SELECT CAST(p.n AS BIGINT) AS n_purchase, CAST(c.n AS BIGINT) AS n_click,
           round(p.mean_v, 4) AS mean_purchase,
           round(c.mean_v, 4) AS mean_click,
           CASE WHEN p.ndv > 1 OR c.ndv > 1 THEN
             round((p.mean_v - c.mean_v)
                   / sqrt(p.var_v / p.n + c.var_v / c.n), 4)
           END AS welch_t
    FROM p CROSS JOIN c
    """,
    doc="Welch two-sample t statistic between purchase and click event "
    "values: ONE pushed-filter scan, conditional aggregation per group "
    "(count/mean/var_samp all partial-aggregate map-side), then pure "
    "arithmetic on the two 1-row summaries. The A/B-test primitive — at "
    "100 TB the whole query is a single map-combined shuffle of 2 keys. "
    "Both-groups-constant inputs (pooled variance 0) emit NULL t via an "
    "exact-integer distinct-count guard on both engines — never an x/0 "
    "whose NULL-vs-Inf result is a DuckDB-version coin flip.",
)
def agg_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    # ONE conditional-aggregation scan, no join: avg/var_samp over
    # when(cond, value) skip the nulls, so each group's moments compute
    # from the same pass (aggregate-FILTER semantics without a groupBy).
    ev = table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("purchase", "click")
    )
    pv = F.when(F.col("event_type") == "purchase", F.col("value"))
    cv = F.when(F.col("event_type") == "click", F.col("value"))
    agg = ev.agg(
        # count ROWS per group (the oracle's count(*)), not non-null values:
        # a NULL-valued purchase row must still count toward n
        F.count_if(F.col("event_type") == "purchase")
        .cast("bigint")
        .alias("n_purchase"),
        F.count_if(F.col("event_type") == "click").cast("bigint").alias("n_click"),
        F.avg(pv).alias("mean_p"),
        F.avg(cv).alias("mean_c"),
        F.var_samp(pv).alias("var_p"),
        F.var_samp(cv).alias("var_c"),
        F.count_distinct(pv).alias("ndv_p"),
        F.count_distinct(cv).alias("ndv_c"),
    )
    return agg.select(
        "n_purchase",
        "n_click",
        F.round("mean_p", 4).alias("mean_purchase"),
        F.round("mean_c", 4).alias("mean_click"),
        F.when(
            (F.col("ndv_p") > 1) | (F.col("ndv_c") > 1),
            F.round(
                (F.col("mean_p") - F.col("mean_c"))
                / F.sqrt(
                    F.col("var_p") / F.col("n_purchase")
                    + F.col("var_c") / F.col("n_click")
                ),
                4,
            ),
        ).alias("welch_t"),
    ).filter(
        # empty-group parity: if either cohort is absent the oracle's
        # p CROSS JOIN c is ZERO rows, but Spark's global agg emits one
        # NULL-laden row — drop it so a degenerate fixture can't diverge
        (F.col("n_purchase") > 0) & (F.col("n_click") > 0)
    )


PARETO_BUCKETS = 10


@register(
    "orders_pareto_curve",
    oracle=f"""
    WITH per_cust AS (
      SELECT o_custkey, sum(o_totalprice) AS revenue
      FROM orders GROUP BY 1
    ),
    ranked AS (
      SELECT revenue,
             ntile({PARETO_BUCKETS}) OVER (ORDER BY revenue DESC, o_custkey)
               AS bucket
      FROM per_cust
    ),
    tot AS (SELECT sum(revenue) AS total FROM per_cust)
    SELECT CAST(bucket AS BIGINT) AS bucket,
           CAST(count(*) AS BIGINT) AS n_customers,
           round(sum(revenue), 2) AS revenue,
           round(sum(revenue) / total, 4) AS revenue_share
    FROM ranked, tot
    GROUP BY bucket, total
    """,
    doc=f"Pareto concentration curve: customers bucketed into revenue-"
    f"ranked {PARETO_BUCKETS}-tiles with each bucket's revenue share — "
    "the 80/20 diagnostic behind every whale-risk and sampling-strategy "
    "decision. Two-phase so it scales: the fact table pre-aggregates to "
    "one row per customer (map-combined shuffle), and the customer-sized "
    "relation — data-proportional — takes its ntile from the two-pass "
    "range-partitioned rank (plans/ranking.py: boundary literals, "
    "per-bucket row_number + offset prefix sum, exact ntile arithmetic "
    "from (rank, n)); the grand total rides in as a broadcast 1-row "
    "scalar. Identical to ntile() by construction — the oracle keeps the "
    "window formulation.",
)
def orders_pareto_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    per_cust = o.groupBy("o_custkey").agg(
        F.sum("o_totalprice").alias("revenue")
    )
    # persisted NOW: the two-pass boundary sketch runs at construction and
    # would otherwise recompute the fact rollup; released on result GC
    per_cust = per_cust.persist()
    ranked = two_pass_global_rank(
        per_cust, "revenue", "o_custkey", descending=True
    ).withColumn(
        "bucket", ntile_from_rank(F.col("_rank"), F.col("_n"), PARETO_BUCKETS)
    )
    tot = per_cust.agg(F.sum("revenue").alias("total"))
    from mongodb_nats_connector_spark.plans.caching import release_on_gc

    return release_on_gc(per_cust, (
        ranked.crossJoin(F.broadcast(tot))
        .groupBy("bucket", "total")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_customers"),
            F.round(F.sum("revenue"), 2).alias("revenue"),
            F.round(F.sum("revenue") / F.first("total"), 4).alias(
                "revenue_share"
            ),
        )
        .select(
            F.col("bucket").cast("bigint").alias("bucket"),
            "n_customers",
            "revenue",
            "revenue_share",
        )
    ))


INCR_CUTOFF = "2001-01-01"


@register(
    "agg_incremental_merge",
    oracle=f"""
    WITH base AS (
      SELECT date_trunc('month', o_orderdate) AS month,
             count(*) AS n, sum(o_totalprice) AS rev
      FROM orders
      WHERE o_orderdate < DATE '{INCR_CUTOFF}' OR o_orderdate IS NULL
      GROUP BY 1
    ),
    delta AS (
      SELECT date_trunc('month', o_orderdate) AS month,
             count(*) AS n, sum(o_totalprice) AS rev
      FROM orders WHERE o_orderdate >= DATE '{INCR_CUTOFF}'
      GROUP BY 1
    ),
    merged AS (
      SELECT month, sum(n) AS n, sum(rev) AS rev
      FROM (SELECT * FROM base UNION ALL SELECT * FROM delta)
      GROUP BY 1
    )
    SELECT month, CAST(n AS BIGINT) AS n_orders,
           round(rev, 2) AS revenue,
           round(rev / n, 4) AS avg_price
    FROM merged
    """,
    doc="Incremental aggregate maintenance: the historical partition "
    "reduces once to algebraic partials (count, sum) per month and the "
    "fresh delta partition reduces separately; the merged rollup — "
    "including the non-algebraic-looking avg — re-aggregates ONLY the "
    "partials. The nightly-ETL pattern at 100 TB: yesterday's partials "
    "are a stored table, today's delta is the only raw scan, and the "
    "merge shuffles rows proportional to the GROUP-key domain, not the "
    "fact table. Both scans push their date predicate to parquet.",
)
def agg_incremental_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    cutoff = F.lit(INCR_CUTOFF).cast("date")

    def partials(df):
        return df.groupBy(
            F.date_trunc("month", "o_orderdate").alias("month")
        ).agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("o_totalprice").alias("rev"),
        )

    # NULL dates satisfy neither predicate and would vanish from the merge,
    # breaking merged == full-recompute; route them to the base partition
    base = partials(
        o.filter((F.col("o_orderdate") < cutoff) | F.col("o_orderdate").isNull())
    )
    delta = partials(o.filter(F.col("o_orderdate") >= cutoff))
    merged = (
        base.unionByName(delta)
        .groupBy("month")
        .agg(F.sum("n").alias("n"), F.sum("rev").alias("rev"))
    )
    return merged.select(
        "month",
        F.col("n").cast("bigint").alias("n_orders"),
        F.round("rev", 2).alias("revenue"),
        F.round(F.col("rev") / F.col("n"), 4).alias("avg_price"),
    )


FORECAST_TRAIN_DAYS = 23


@register(
    "events_seasonal_baseline",
    oracle=f"""
    WITH hourly AS (
      SELECT CAST(ts AS DATE) AS day, extract(hour FROM ts) AS hour,
             count(*) AS n
      FROM events GROUP BY 1, 2
    ),
    cutoff AS (
      SELECT min(day) + {FORECAST_TRAIN_DAYS} AS train_end FROM hourly
    ),
    baseline AS (
      SELECT hour, avg(n) AS expected
      FROM hourly, cutoff WHERE day < train_end
      GROUP BY 1
    )
    SELECT h.day, CAST(h.hour AS BIGINT) AS hour,
           CAST(h.n AS BIGINT) AS actual,
           round(b.expected, 4) AS expected,
           round(h.n - b.expected, 4) AS residual
    FROM hourly h JOIN baseline b ON b.hour = h.hour, cutoff
    WHERE h.day >= train_end
    """,
    doc=f"Seasonal-naive forecast baseline: hour-of-day traffic averaged "
    f"over the first {FORECAST_TRAIN_DAYS} training days, scored against "
    "the holdout days as actual/expected/residual. The train/holdout split "
    "derives from min(day) in BOTH engines (never a hard-coded date, so a "
    "fixture whose range moves cannot silently empty either side). ONE "
    "shuffle reduces events to (day, hour) counts; the 24-row baseline "
    "and 1-row cutoff broadcast back into the holdout probe. The "
    "capacity-planning/anomaly-detection baseline every event pipeline "
    "carries.",
)
def events_seasonal_baseline(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        F.col("ts").cast("date").alias("day"),
        F.hour("ts").alias("hour"),
    ).agg(F.count(F.lit(1)).alias("n"))
    cutoff = hourly.agg(
        F.date_add(F.min("day"), FORECAST_TRAIN_DAYS).alias("train_end")
    )
    train_end = F.col("train_end")
    baseline = (
        hourly.crossJoin(F.broadcast(cutoff))
        .filter(F.col("day") < train_end)
        .groupBy("hour")
        .agg(F.avg("n").alias("expected"))
    )
    return persist_until_collected(hourly, (
        hourly.crossJoin(F.broadcast(cutoff))
        .filter(F.col("day") >= train_end)
        .join(F.broadcast(baseline), "hour")
        .select(
            "day",
            F.col("hour").cast("bigint").alias("hour"),
            F.col("n").cast("bigint").alias("actual"),
            F.round("expected", 4).alias("expected"),
            F.round(F.col("n") - F.col("expected"), 4).alias("residual"),
        )
    ))


@register(
    "agg_chi_square",
    oracle="""
    WITH obs AS (
      SELECT c.c_mktsegment AS seg, o.o_orderpriority AS pri,
             count(*) AS n
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
      GROUP BY 1, 2
    ),
    margins AS (
      SELECT seg, sum(n) AS seg_n FROM obs GROUP BY 1
    ),
    pmargins AS (
      SELECT pri, sum(n) AS pri_n FROM obs GROUP BY 1
    ),
    tot AS (SELECT sum(n) AS total FROM obs)
    SELECT CAST(count(*) AS BIGINT) AS n_cells,
           CAST(min(total) AS BIGINT) AS n_obs,
           round(sum(pow(n - seg_n * pri_n * 1.0 / total, 2)
                     / (seg_n * pri_n * 1.0 / total)), 4) AS chi_square
    FROM obs
    JOIN margins USING (seg)
    JOIN pmargins USING (pri)
    CROSS JOIN tot
    """,
    doc="Chi-square independence test between customer market segment and "
    "order priority: the contingency table is ONE map-combined shuffle "
    "(orders join broadcast customer, groupBy cell), margins and the "
    "grand total derive from the tiny cell relation and broadcast back "
    "for the expected-count arithmetic. The categorical-association "
    "primitive next to agg_welch_ttest's numeric one; at 100 TB the only "
    "fact-sized work is the first aggregation.",
)
def agg_chi_square(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    obs = (
        o.join(maybe_broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy(
            F.col("c_mktsegment").alias("seg"),
            F.col("o_orderpriority").alias("pri"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    margins = obs.groupBy("seg").agg(F.sum("n").alias("seg_n"))
    pmargins = obs.groupBy("pri").agg(F.sum("n").alias("pri_n"))
    tot = obs.agg(F.sum("n").alias("total"))
    # seg_n*pri_n in DOUBLE: the int64 product wraps once margins pass
    # ~3e9 rows (the oracle's *1.0 promotes the same way)
    expected = F.col("seg_n").cast("double") * F.col("pri_n") / F.col("total")
    return persist_until_collected(obs, (
        obs.join(F.broadcast(margins), "seg")
        .join(F.broadcast(pmargins), "pri")
        .crossJoin(F.broadcast(tot))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_cells"),
            F.min("total").cast("bigint").alias("n_obs"),
            F.round(
                F.sum(F.pow(F.col("n") - expected, 2) / expected), 4
            ).alias("chi_square"),
        )
    ))
