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


def _ensure_text_documents(spark: SparkSession, sf_dir: str) -> str:
    path = _format_dir(sf_dir, "documents", "txt")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        # one line per document: "<doc_id>\t<text>" (corpus text is
        # newline-free by construction; the oracle comparison would catch
        # any line splitting)
        table(spark, sf_dir, "documents").select(
            F.concat_ws("\t", F.col("doc_id"), F.col("text")).alias("value")
        ).write.mode("overwrite").text(path)
    return path


@register(
    "source_text_scan",
    oracle="""
    SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(length(text)) AS BIGINT) AS total_chars
    FROM documents GROUP BY lang
    """,
    doc="Raw-text source scan (the format every crawled corpus starts in): "
    "documents round-trip through line-oriented text files "
    "(doc_id\\ttext), are re-parsed with substring_index — map-only, no "
    "inferSchema — and joined back to the parquet dimension for labels. "
    "The oracle aggregates the parquet original, so any line splitting, "
    "encoding drift, or truncation in the text round-trip breaks parity.",
)
def source_text_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = _ensure_text_documents(spark, sf_dir)
    lines = spark.read.text(path)
    parsed = lines.select(
        F.substring_index("value", "\t", 1).cast("bigint").alias("doc_id"),
        F.expr("substring(value, instr(value, '\t') + 1)").alias("text"),
    )
    labels = table(spark, sf_dir, "documents").select("doc_id", "lang")
    return (
        parsed.join(labels, "doc_id")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum(F.length("text")).cast("bigint").alias("total_chars"),
        )
    )


def _ensure_bucketed_tables(spark: SparkSession, sf_dir: str) -> tuple[str, str]:
    tag = hashlib.sha1(sf_dir.encode()).hexdigest()[:10]
    to, tc = f"bkt_orders_{tag}", f"bkt_customer_{tag}"
    if not spark.catalog.tableExists(to):
        table(spark, sf_dir, "orders").write.mode("overwrite").option(
            "path", _format_dir(sf_dir, "orders", "bucketed")
        ).bucketBy(8, "o_custkey").sortBy("o_custkey").saveAsTable(to)
    if not spark.catalog.tableExists(tc):
        table(spark, sf_dir, "customer").write.mode("overwrite").option(
            "path", _format_dir(sf_dir, "customer", "bucketed")
        ).bucketBy(8, "c_custkey").sortBy("c_custkey").saveAsTable(tc)
    return to, tc


@register(
    "join_bucketed_colocate",
    oracle="""
    SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_orders,
           round(sum(o_totalprice), 2) AS revenue
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c_mktsegment
    """,
    doc="Bucket-colocated join: orders and customer are written ONCE as "
    "8-bucket tables on the join key, so the recurring join reads "
    "co-located buckets with ZERO shuffle on either side (the only "
    "exchange is the final groupBy — asserted shuffle-free in "
    "tests/test_plans.py's bucketed-join test for the same layout). The "
    "100 TB answer to 'this equi-join runs every hour': pay the shuffle "
    "at write time, never at read time. Oracle joins the plain parquet.",
)
def join_bucketed_colocate(spark: SparkSession, sf_dir: str) -> DataFrame:
    to, tc = _ensure_bucketed_tables(spark, sf_dir)
    o = spark.table(to)
    c = spark.table(tc).hint("merge")
    return (
        o.join(c, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
    )
