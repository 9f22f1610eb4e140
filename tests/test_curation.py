"""Curation operators: determinism properties the docstrings promise."""

from __future__ import annotations

from pyspark.sql import functions as F

from mongodb_nats_connector_spark.operators.curation import sample_hash_split

SF = "/root/testdata/sf0.001"


def test_split_deterministic_under_repartitioning(spark):
    """The salted-hash split must be a pure function of doc_id: identical
    assignment regardless of partitioning — the property df.sample() lacks
    and the reason this operator exists."""
    a = sample_hash_split(spark, SF)
    b = sample_hash_split(spark, SF).repartition(17, "doc_id")
    merged = a.alias("a").join(b.alias("b"), F.col("a.doc_id") == F.col("b.doc_id"))
    diff = merged.filter(
        (F.col("a.split") != F.col("b.split"))
        | (F.col("a.in_10pct_sample") != F.col("b.in_10pct_sample"))
    )
    assert diff.count() == 0


def test_split_partitions_are_exhaustive_and_disjoint(spark):
    df = sample_hash_split(spark, SF)
    n = df.count()
    by_split = {r["split"]: r["n"] for r in df.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert set(by_split) <= {"train", "val", "test"}
    assert sum(by_split.values()) == n
    # rough proportions at n=100: generous bounds, deterministic data
    assert by_split.get("train", 0) > n * 0.6
    assert by_split.get("train", 0) < n * 0.95
