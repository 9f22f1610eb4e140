"""Join-strategy operators round 4: the scale-path rewrites for non-equi
joins, plus a Bloom-filter pre-join sketch.

Three patterns a 100 TB engine needs beyond plain equi-joins:

- ``join_range_bucketed`` — turn a band/range join into an EQUI join by
  bucketing the continuous key (floor(x/width)); Catalyst gets a hash join
  where a naive range predicate would nest-loop. The oracle keeps the
  textbook BETWEEN form to prove the rewrite exact.
- ``join_point_in_interval`` — point-in-interval joins (event ts inside a
  validity window) equi-ized by exploding each interval into its covered
  days; the probe side joins on the day key. Interval tables are small
  (dimension-like); the fact side never shuffles on a range predicate.
- ``join_bloom_semi`` — a 2-hash Bloom filter built from the build side's
  keys (md5-derived positions, portable to SQL), probed map-side. The query
  measures the filter's confusion matrix against the exact semi-join — the
  pre-shuffle row-reduction sketch Spark itself applies as
  ``spark.sql.optimizer.runtime.bloomFilter`` and engines push before
  expensive shuffles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from mongodb_nats_connector_spark.plans.caching import persist_until_collected
from mongodb_nats_connector_spark.plans.hints import maybe_broadcast
from mongodb_nats_connector_spark.registry import register
from mongodb_nats_connector_spark.sources.tables import table

BAND_LO, BAND_WIDTH, N_BANDS = 900.0, 10.0, 10


@register(
    "join_range_bucketed",
    oracle=f"""
    WITH bands AS (
      SELECT CAST(i AS INT) AS band_id,
             {BAND_LO} + i * {BAND_WIDTH} AS lo,
             {BAND_LO} + (i + 1) * {BAND_WIDTH} AS hi
      FROM range({N_BANDS}) t(i)
    )
    SELECT band_id,
           CAST(count(*) AS BIGINT) AS n_parts,
           round(sum(p_retailprice), 4) AS sum_price,
           avg(p_size * 1.0) AS avg_size
    FROM part JOIN bands
      ON p_retailprice >= lo AND p_retailprice < hi
    GROUP BY band_id
    """,
    doc="Range join equi-ized by bucketing: band_id = floor((price - lo) / "
    "width) replaces the BETWEEN predicate, turning a nested-loop range "
    "join into a map-only computed key + hash aggregation. The oracle runs "
    "the textbook non-equi join against the generated band table to prove "
    "the bucketing exact (half-open bands, width-aligned).",
)
def join_range_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = table(spark, sf_dir, "part")
    band = F.floor((F.col("p_retailprice") - BAND_LO) / BAND_WIDTH).cast("int")
    return (
        part.withColumn("band_id", band)
        .filter((F.col("band_id") >= 0) & (F.col("band_id") < N_BANDS))
        .groupBy("band_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_parts"),
            F.round(F.sum("p_retailprice"), 4).alias("sum_price"),
            F.avg(F.col("p_size") * 1.0).alias("avg_size"),
        )
    )


N_PROMOS, PROMO_STRIDE_DAYS, PROMO_LEN_DAYS = 6, 5, 3
PROMO_START = "2024-01-01"


@register(
    "join_point_in_interval",
    oracle=f"""
    WITH promos AS (
      SELECT CAST(i AS INT) AS promo_id,
             TIMESTAMP '{PROMO_START}' + INTERVAL (i * {PROMO_STRIDE_DAYS}) DAY
               AS start_ts,
             TIMESTAMP '{PROMO_START}'
               + INTERVAL (i * {PROMO_STRIDE_DAYS} + {PROMO_LEN_DAYS}) DAY AS end_ts
      FROM range({N_PROMOS}) t(i)
    )
    SELECT promo_id,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
           round(sum(value), 4) AS sum_value
    FROM events JOIN promos
      ON ts >= start_ts AND ts < end_ts
    GROUP BY promo_id
    """,
    doc="Point-in-interval join equi-ized by day bucketing: each promo "
    "window explodes into its covered calendar days (intervals are "
    "dimension-sized, so the explode is tiny and broadcast), and events "
    "join on the exact day key with a residual ts filter. The fact side "
    "never evaluates a range predicate in a nested loop. Oracle is the "
    "plain BETWEEN join.",
)
def join_point_in_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    promos = spark.range(N_PROMOS).select(
        F.col("id").cast("int").alias("promo_id"),
        F.timestamp_seconds(
            F.unix_timestamp(F.lit(PROMO_START).cast("timestamp"))
            + F.col("id") * (PROMO_STRIDE_DAYS * 86400)
        ).alias("start_ts"),
        F.timestamp_seconds(
            F.unix_timestamp(F.lit(PROMO_START).cast("timestamp"))
            + (F.col("id") * PROMO_STRIDE_DAYS + PROMO_LEN_DAYS) * 86400
        ).alias("end_ts"),
    )
    promo_days = promos.select(
        "promo_id",
        "start_ts",
        "end_ts",
        F.explode(
            F.sequence(
                F.col("start_ts").cast("date"),
                F.date_sub(F.col("end_ts").cast("date"), 0),
            )
        ).alias("day"),
    )
    return (
        ev.withColumn("day", F.col("ts").cast("date"))
        .join(F.broadcast(promo_days), "day")
        .filter((F.col("ts") >= F.col("start_ts")) & (F.col("ts") < F.col("end_ts")))
        .groupBy("promo_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.countDistinct("user_id").cast("bigint").alias("n_users"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
    )


BLOOM_M, PROBE_N = 4096, 3000


def _pos_sql(salt: str, key: str) -> str:
    return (
        f"CAST(CAST('0x' || substr(md5('{salt}' || CAST({key} AS VARCHAR)), 1, 15)"
        f" AS BIGINT) % {BLOOM_M} AS BIGINT)"
    )


def _pos_col(salt: str, key: Column) -> Column:
    h = F.conv(
        F.substring(F.md5(F.encode(F.concat(F.lit(salt), key.cast("string")), "utf-8")), 1, 15),
        16,
        10,
    ).cast("bigint")
    return (h % BLOOM_M).cast("bigint")


@register(
    "join_bloom_semi",
    oracle=f"""
    WITH bits AS (
      SELECT DISTINCT {_pos_sql('b1:', 'o_custkey')} AS pos FROM orders
      UNION
      SELECT DISTINCT {_pos_sql('b2:', 'o_custkey')} AS pos FROM orders
    ),
    probe AS (
      SELECT CAST(i AS BIGINT) AS probe_key,
             {_pos_sql('b1:', 'i')} AS h1,
             {_pos_sql('b2:', 'i')} AS h2
      FROM range({PROBE_N}) t(i)
    ),
    flagged AS (
      SELECT probe_key,
             (h1 IN (SELECT pos FROM bits)
              AND h2 IN (SELECT pos FROM bits)) AS bloom_member,
             probe_key IN (SELECT DISTINCT o_custkey FROM orders) AS actual_member
      FROM probe
    )
    SELECT bloom_member, actual_member,
           CAST(count(*) AS BIGINT) AS n_keys
    FROM flagged
    GROUP BY 1, 2
    """,
    doc="Bloom-filter semi-join sketch with measured confusion matrix: a "
    f"2-hash, {BLOOM_M}-bit filter is built from the orders build side "
    "(md5-derived positions — portable arithmetic, no engine-specific "
    "hash), broadcast, and probed map-side over a key range twice the true "
    "key domain. Output counts true/false positives/negatives — false "
    "negatives must be zero by construction, and the FP rate is what a "
    "runtime bloom pushdown would save before a shuffle. The filter "
    "(distinct positions) is dimension-sized regardless of fact row count.",
)
def join_bloom_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    keys = orders.select("o_custkey").distinct()
    bits = (
        keys.select(_pos_col("b1:", F.col("o_custkey")).alias("pos"))
        .union(keys.select(_pos_col("b2:", F.col("o_custkey")).alias("pos")))
        .distinct()
    )
    probe = spark.range(PROBE_N).select(
        F.col("id").cast("bigint").alias("probe_key"),
        _pos_col("b1:", F.col("id")).alias("h1"),
        _pos_col("b2:", F.col("id")).alias("h2"),
    )
    b1 = bits.select(F.col("pos").alias("p1"))
    b2 = bits.select(F.col("pos").alias("p2"))
    truth = keys.select(F.col("o_custkey").alias("t_key"))
    flagged = (
        probe.join(maybe_broadcast(b1), F.col("h1") == F.col("p1"), "left")
        .join(maybe_broadcast(b2), F.col("h2") == F.col("p2"), "left")
        .join(maybe_broadcast(truth), F.col("probe_key") == F.col("t_key"), "left")
        .select(
            (F.col("p1").isNotNull() & F.col("p2").isNotNull()).alias("bloom_member"),
            F.col("t_key").isNotNull().alias("actual_member"),
        )
    )
    return persist_until_collected(
        keys,
        flagged.groupBy("bloom_member", "actual_member").agg(
            F.count(F.lit(1)).cast("bigint").alias("n_keys")
        ),
    )
