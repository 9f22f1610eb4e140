"""Warehouse analytics operators round 4b: time-decay scoring, record
(skyline) frontiers, calendar gap-fill, multi-granularity time rollups, and
column profiling.

Each is a pattern a 100 TB warehouse needs expressed so the wide shuffle is
on a pre-reduced relation:

- ``events_decayed_engagement`` — recency-weighted scoring with NO window at
  all: the exponential weight is a pure function of the row's own timestamp
  (anchor-relative), so the whole query is one partial-aggregated groupBy.
  This is the scale-correct form of "EWMA per user" — per-row decay against
  a fixed anchor commutes with aggregation, while a true row-sequential EWMA
  would force an ordered window per user.
- ``orders_price_records`` — running-record / skyline frontier computed in
  two phases: pre-aggregate to one row per day (bounded key domain), THEN a
  single ordered window over the tiny distinct-day relation. The naive form
  sorts the whole fact table; this form shuffles it once on a bounded key.
- ``events_time_gap_fill`` — dense calendar × dimension scaffold (broadcast)
  left-joined with the sparse daily aggregate, forward-filled with the
  count-partition trick (no IGNORE NULLS dependence, portable to any engine).
- ``events_time_rollup`` — hour/day/month/grand rollup in ONE pass via
  ROLLUP grouping sets on derived time buckets (the hypertable continuous-
  aggregate shape); Catalyst expands + partial-aggregates map-side.
- ``profile_orders_columns`` — per-column profiling (nulls, distincts,
  lexical min/max) by unpivoting column values to (column, value) rows; one
  shuffle keyed by column name, the standard data-quality sweep shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mongodb_nats_connector_spark.registry import register
from mongodb_nats_connector_spark.sources.tables import table

DECAY_ANCHOR = "2024-02-01"
DECAY_BASE = 0.9


@register(
    "events_decayed_engagement",
    oracle=f"""
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_events,
           round(sum(value * pow({DECAY_BASE},
               date_diff('day', CAST(ts AS DATE), DATE '{DECAY_ANCHOR}'))), 4)
             AS decayed_value,
           round(sum(value * pow({DECAY_BASE},
               date_diff('day', CAST(ts AS DATE), DATE '{DECAY_ANCHOR}')))
             / sum(pow({DECAY_BASE},
                   date_diff('day', CAST(ts AS DATE), DATE '{DECAY_ANCHOR}'))), 4)
             AS decayed_avg
    FROM events
    GROUP BY user_id
    """,
    doc=f"Recency-weighted engagement: each event weighted by {DECAY_BASE}^"
    "(days before the anchor date), summed per user. The decay is a pure "
    "per-row function of ts — no ordered window, so the whole query is one "
    "partial-aggregated shuffle on user_id and commutes with any "
    "partitioning. pow(0.9, int) is libm-identical on both engines.",
)
def events_decayed_engagement(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    days = F.datediff(F.lit(DECAY_ANCHOR).cast("date"), F.col("ts").cast("date"))
    w = F.pow(F.lit(DECAY_BASE), days)
    return ev.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.round(F.sum(F.col("value") * w), 4).alias("decayed_value"),
        F.round(F.sum(F.col("value") * w) / F.sum(w), 4).alias("decayed_avg"),
    )


@register(
    "orders_price_records",
    oracle="""
    WITH per_day AS (
      SELECT CAST(o_orderdate AS DATE) AS day, max(o_totalprice) AS best_price
      FROM orders GROUP BY 1
    ),
    runs AS (
      SELECT day, best_price,
             max(best_price) OVER (ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prior_max
      FROM per_day
    )
    SELECT day, best_price
    FROM runs
    WHERE prior_max IS NULL OR best_price > prior_max
    """,
    doc="Running-record skyline: days whose best order price beats every "
    "earlier day. Two-phase so it scales: the fact table pre-aggregates to "
    "one row per day (bounded key domain — a shuffle that partial-aggs "
    "map-side), and only the tiny distinct-day relation flows through the "
    "ordered window. The naive skyline sorts the whole fact table globally; "
    "this never does.",
)
def orders_price_records(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    per_day = o.groupBy(F.col("o_orderdate").cast("date").alias("day")).agg(
        F.max("o_totalprice").alias("best_price")
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, -1)
    runs = per_day.withColumn("prior_max", F.max("best_price").over(w))
    return runs.filter(
        F.col("prior_max").isNull() | (F.col("best_price") > F.col("prior_max"))
    ).select("day", "best_price")


@register(
    "events_time_gap_fill",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day, sum(value) AS day_value
      FROM events GROUP BY 1, 2
    ),
    bounds AS (
      SELECT min(CAST(ts AS DATE)) AS lo, max(CAST(ts AS DATE)) AS hi
      FROM events
    ),
    calendar AS (
      SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE)
               AS day
      FROM bounds
    ),
    scaffold AS (
      SELECT t.event_type, c.day
      FROM (SELECT DISTINCT event_type FROM events) t, calendar c
    ),
    joined AS (
      SELECT s.event_type, s.day, d.day_value,
             count(d.day_value) OVER (PARTITION BY s.event_type
               ORDER BY s.day) AS grp
      FROM scaffold s LEFT JOIN daily d
        ON s.event_type = d.event_type AND s.day = d.day
    )
    SELECT event_type, day,
           day_value IS NOT NULL AS observed,
           coalesce(max(day_value) OVER (PARTITION BY event_type, grp), 0.0)
             AS filled_value
    FROM joined
    """,
    doc="Calendar gap-fill with forward fill: build the dense (event_type × "
    "day) scaffold from the global date bounds (dimension-sized, broadcast), "
    "left-join the sparse daily aggregate, then forward-fill via the "
    "count-over-order partition trick — count(day_value) only advances on "
    "observed rows, so max() within each group propagates the last "
    "observation. Portable (no IGNORE NULLS) and the only fact-table "
    "shuffle is the daily pre-aggregation.",
)
def events_time_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.sum("value").alias("day_value"))
    bounds = ev.agg(
        F.min(F.col("ts").cast("date")).alias("lo"),
        F.max(F.col("ts").cast("date")).alias("hi"),
    )
    calendar = bounds.select(
        F.explode(F.sequence("lo", "hi")).alias("day")
    )
    types = ev.select("event_type").distinct()
    scaffold = types.crossJoin(F.broadcast(calendar))
    w_grp = Window.partitionBy("event_type").orderBy("day")
    joined = scaffold.join(daily, ["event_type", "day"], "left").withColumn(
        "grp", F.count("day_value").over(w_grp)
    )
    w_fill = Window.partitionBy("event_type", "grp")
    return joined.select(
        "event_type",
        "day",
        F.col("day_value").isNotNull().alias("observed"),
        F.coalesce(F.max("day_value").over(w_fill), F.lit(0.0)).alias(
            "filled_value"
        ),
    )


@register(
    "events_time_rollup",
    oracle="""
    SELECT CAST(date_trunc('month', ts) AS DATE) AS bucket_month,
           CAST(date_trunc('day', ts) AS DATE) AS bucket_day,
           CAST(extract(hour FROM ts) AS INT) AS bucket_hour,
           CAST(grouping(date_trunc('month', ts)) AS INT)
             + CAST(grouping(date_trunc('day', ts)) AS INT)
             + CAST(grouping(extract(hour FROM ts)) AS INT) AS grain,
           CAST(count(*) AS BIGINT) AS n_events,
           sum(value) AS sum_value
    FROM events
    GROUP BY ROLLUP (date_trunc('month', ts), date_trunc('day', ts),
                     extract(hour FROM ts))
    """,
    doc="Hypertable-style multi-granularity rollup: hour, day, month, and "
    "grand totals in ONE pass via ROLLUP over derived time buckets (the "
    "continuous-aggregate shape). Catalyst expands the grouping sets and "
    "partial-aggregates each map-side; one shuffle serves all four grains, "
    "where materializing each grain separately would scan the fact table "
    "four times.",
)
def events_time_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    month = F.date_trunc("month", "ts").cast("date")
    day = F.date_trunc("day", "ts").cast("date")
    hour = F.hour("ts").cast("int")
    return (
        ev.select(
            month.alias("bucket_month"), day.alias("bucket_day"), hour.alias("bucket_hour"), "value"
        )
        .rollup("bucket_month", "bucket_day", "bucket_hour")
        .agg(
            (
                F.grouping("bucket_month").cast("int")
                + F.grouping("bucket_day").cast("int")
                + F.grouping("bucket_hour").cast("int")
            ).alias("grain"),
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.sum("value").alias("sum_value"),
        )
        .select(
            "bucket_month", "bucket_day", "bucket_hour", "grain", "n_events", "sum_value"
        )
    )


_PROFILE_COLS = [
    "o_orderkey",
    "o_custkey",
    "o_orderstatus",
    "o_totalprice",
    "o_orderdate",
    "o_orderpriority",
]


def _profile_sql_str(c: str) -> str:
    # Uniform stringification that both engines render identically: doubles
    # via printf %.2f (Java's Double.toString flips to scientific notation
    # where DuckDB's cast does not), timestamps via second-precision ISO.
    if c == "o_totalprice":
        return f"printf('%.2f', {c})"
    if c == "o_orderdate":
        return f"strftime({c}, '%Y-%m-%d %H:%M:%S')"
    return f"CAST({c} AS VARCHAR)"


def _profile_oracle() -> str:
    parts = [
        f"""
        SELECT '{c}' AS column_name,
               CAST(count(*) AS BIGINT) AS n_rows,
               CAST(count(*) - count({c}) AS BIGINT) AS n_nulls,
               CAST(count(DISTINCT {_profile_sql_str(c)}) AS BIGINT)
                 AS n_distinct,
               min({_profile_sql_str(c)}) AS min_value,
               max({_profile_sql_str(c)}) AS max_value
        FROM orders
        """
        for c in _PROFILE_COLS
    ]
    return " UNION ALL ".join(parts)


@register(
    "profile_orders_columns",
    oracle=_profile_oracle(),
    doc="Column profiling sweep (the data-quality step before any pipeline "
    "run): per column — row count, null count, exact distinct count, lexical "
    "min/max. Implemented by unpivoting to (column_name, value) rows so ONE "
    "aggregation keyed by column name profiles every column in a single "
    "scan; values are stringified uniformly (timestamps to ISO 'yyyy-MM-dd "
    "HH:mm:ss' form on both engines) so one schema carries all types. At "
    "100 TB this is a scan + a shuffle whose key domain equals the column "
    "count.",
)
def profile_orders_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    # Stringification must be identical on both engines: %.2f for doubles
    # (Java's Double.toString flips to scientific notation, DuckDB's cast
    # doesn't), second-precision ISO for timestamps.
    def as_str(c: str):
        dt = dict(o.dtypes)[c]
        if dt == "timestamp":
            return F.date_format(c, "yyyy-MM-dd HH:mm:ss")
        if dt == "double":
            return F.format_string("%.2f", F.col(c))
        return F.col(c).cast("string")

    stacked = o.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("column_name"), as_str(c).alias("value")
                    )
                    for c in _PROFILE_COLS
                ]
            )
        ).alias("kv")
    ).select("kv.column_name", "kv.value")
    return stacked.groupBy("column_name").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum(F.col("value").isNull().cast("int")).cast("bigint").alias("n_nulls"),
        F.count_distinct(F.col("value")).cast("bigint").alias("n_distinct"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
    )


Z_BITS = 8  # per-dimension bits: 16-bit Morton key over a 256x256 key grid
Z_TILE_SHIFT = 8  # aggregate stats per z >> 8 tile (256 tiles)


def _morton_sql(x: str, y: str) -> str:
    terms = []
    for i in range(Z_BITS):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return " + ".join(terms)


@register(
    "layout_zorder_tiles",
    oracle=f"""
    WITH keyed AS (
      SELECT (l_partkey % 256) AS px, (l_suppkey % 256) AS sx,
             {_morton_sql("(l_partkey % 256)", "(l_suppkey % 256)")} AS z
      FROM lineitem
    )
    SELECT CAST(z >> {Z_TILE_SHIFT} AS BIGINT) AS z_tile,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(DISTINCT px) AS BIGINT) AS n_part_buckets,
           CAST(count(DISTINCT sx) AS BIGINT) AS n_supp_buckets,
           CAST(min(z) AS BIGINT) AS z_min,
           CAST(max(z) AS BIGINT) AS z_max
    FROM keyed
    GROUP BY z_tile
    """,
    doc="Z-order (Morton) clustering key over the (partkey, suppkey) bucket "
    "grid — the data-layout primitive behind multi-dimensional file "
    "clustering (Delta/Iceberg OPTIMIZE ZORDER): interleaving the bucket "
    "bits makes each contiguous z-range cover a small 2-D tile of the key "
    "grid, so a scan filtered on EITHER dimension prunes most files. The "
    "interleave is 32 shift-mask-or terms — pure JVM expressions, map-only; "
    "per-tile stats (distinct buckets touched per 256-key z-tile) quantify "
    "the locality a writer would get sorting files by z.",
)
def layout_zorder_tiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    keyed = li.select(
        (F.col("l_partkey") % 256).alias("px"),
        (F.col("l_suppkey") % 256).alias("sx"),
    ).withColumn("z", F.expr(_morton_sql("px", "sx")))
    return keyed.groupBy(
        F.shiftright("z", Z_TILE_SHIFT).cast("bigint").alias("z_tile")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.count_distinct("px").cast("bigint").alias("n_part_buckets"),
        F.count_distinct("sx").cast("bigint").alias("n_supp_buckets"),
        F.min("z").cast("bigint").alias("z_min"),
        F.max("z").cast("bigint").alias("z_max"),
    )
