"""Shared relational building blocks for the graph/sketch families.

No ``@register`` calls live here — this module must stay registration-free
so importing it from any operator module cannot perturb the registry's
insertion order (which encodes driver-verification priority; see
registry._load_all).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from mongodb_nats_connector_spark.plans.hints import maybe_broadcast
from mongodb_nats_connector_spark.sources.tables import table


def trade_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed nation trade graph: (src customer nation, dst supplier
    nation, w = lineitem count), self-loops excluded. The single
    corpus-proportional aggregation shared by BFS, widest-path, and label
    propagation; its SQL twin is the ``dir_edges`` CTE each oracle embeds.
    """
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    s = table(spark, sf_dir, "supplier")
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(maybe_broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(maybe_broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .filter(F.col("c_nationkey") != F.col("s_nationkey"))
        .groupBy(
            F.col("c_nationkey").alias("src"), F.col("s_nationkey").alias("dst")
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("w"))
    )


def md5_hash60(col: Column) -> Column:
    """60-bit integer from the md5 hex prefix — the one hash construction
    BOTH engines compute identically (DuckDB: CAST('0x'||substr(md5(x),1,15)
    AS BIGINT)), which is what makes the KMV and HLL sketch ESTIMATES
    hash-verifiable cross-engine. Any change here must change the oracle
    side in lockstep."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")
