"""Source-format coverage: JSON and CSV scans (SURVEY.md §2.3 sources rows).

The driver only ships parquet, so each query materializes a deterministic
JSON/CSV copy of a table under /tmp (keyed by scale dir, written once) and
reads it back with an explicit schema — never inferSchema in the read path.
The oracle runs over the original parquet views, so the comparison proves
the format round-trip is lossless.
"""

from __future__ import annotations

import hashlib
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mongodb_nats_connector_spark.registry import register
from mongodb_nats_connector_spark.sources.tables import table

_NATION_DDL = "n_nationkey INT, n_name STRING, n_regionkey INT"
_ORDERS_DDL = (
    "o_orderkey BIGINT, o_custkey BIGINT, o_orderstatus STRING, "
    "o_totalprice DOUBLE, o_orderdate TIMESTAMP, o_orderpriority STRING"
)


def _format_dir(sf_dir: str, name: str, fmt: str) -> str:
    tag = hashlib.sha1(sf_dir.encode()).hexdigest()[:10]
    return f"/tmp/mnc_spark_formats/{tag}/{name}.{fmt}"


def _ensure_json_orders(spark: SparkSession, sf_dir: str) -> str:
    path = _format_dir(sf_dir, "orders", "json")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        table(spark, sf_dir, "orders").write.mode("overwrite").json(path)
    return path


def _ensure_csv_nation(spark: SparkSession, sf_dir: str) -> str:
    path = _format_dir(sf_dir, "nation", "csv")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        table(spark, sf_dir, "nation").write.mode("overwrite").option(
            "header", True
        ).csv(path)
    return path


@register(
    "source_json_scan",
    oracle="""
    SELECT o_orderstatus, count(*) AS n, round(sum(o_totalprice), 2) AS total
    FROM orders GROUP BY o_orderstatus
    """,
    doc="JSON source scan (explicit schema, no inferSchema): write-once JSON "
    "copy of orders, read back, aggregate; oracle runs on the parquet "
    "original — proves the JSON round-trip is lossless.",
)
def source_json_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = _ensure_json_orders(spark, sf_dir)
    o = spark.read.schema(_ORDERS_DDL).json(path)
    return o.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"), F.round(F.sum("o_totalprice"), 2).alias("total")
    )


@register(
    "source_csv_scan",
    oracle="""
    SELECT n_regionkey, count(*) AS n_nations
    FROM nation GROUP BY n_regionkey
    """,
    doc="CSV source scan with header + explicit schema.",
)
def source_csv_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = _ensure_csv_nation(spark, sf_dir)
    n = spark.read.schema(_NATION_DDL).option("header", True).csv(path)
    return n.groupBy("n_regionkey").agg(F.count(F.lit(1)).alias("n_nations"))


def _ensure_partitioned_lineitem(spark: SparkSession, sf_dir: str) -> str:
    path = _format_dir(sf_dir, "lineitem_by_flag", "parquet")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        table(spark, sf_dir, "lineitem").write.mode("overwrite").partitionBy(
            "l_returnflag"
        ).parquet(path)
    return path


@register(
    "sink_parquet_partitioned",
    oracle="""
    SELECT l_linestatus, count(*) AS n, round(sum(l_extendedprice), 2) AS revenue
    FROM lineitem WHERE l_returnflag = 'R'
    GROUP BY l_linestatus
    """,
    doc="Partitioned parquet sink + partition-pruned re-read: write lineitem "
    "hive-partitioned by l_returnflag (write-once), read it back filtered "
    "to one partition — the scan touches only that directory "
    "(PartitionFilters, asserted in tests/test_plans.py). This is the "
    "standard 100 TB layout move: partition by the hot filter column so "
    "queries read 1/N of the files.",
)
def sink_parquet_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = _ensure_partitioned_lineitem(spark, sf_dir)
    li = spark.read.parquet(path).filter(F.col("l_returnflag") == "R")
    return li.groupBy("l_linestatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("l_extendedprice"), 2).alias("revenue"),
    )


def _ensure_orc_events(spark: SparkSession, sf_dir: str) -> str:
    path = _format_dir(sf_dir, "events", "orc")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        table(spark, sf_dir, "events").write.mode("overwrite").orc(path)
    return path


@register(
    "source_orc_roundtrip",
    oracle="""
    SELECT event_type, CAST(count(*) AS BIGINT) AS n,
           round(sum(value), 2) AS total_value
    FROM events GROUP BY event_type
    """,
    doc="ORC write + re-read (the second columnar format Spark ships "
    "natively): events round-trip through ORC, then aggregate — proving "
    "schema, timestamp micros, and predicate/column pushdown survive the "
    "format boundary (ORC scans support the same PushedFilters/ReadSchema "
    "pruning as parquet). Oracle runs on the original parquet, so any "
    "round-trip value drift fails the hash.",
)
def source_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = _ensure_orc_events(spark, sf_dir)
    e = spark.read.orc(path)
    return e.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )
