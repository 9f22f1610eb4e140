"""Embedding-matrix preparation operators round 4: per-dimension statistics
and min-max feature normalization — the standardize/whiten step that precedes
quantization, clustering, or index training over an embedding corpus.

Scale notes: dimension statistics shuffle on the dimension index (a key
domain equal to the vector width, 64 here — tiny for any model), with
map-side partial aggregation doing the heavy reduction. Normalization
broadcasts the per-dim stats row back and is then map-only. Checksums are
integers (floor(x+0.5) quantization, min/max-based scaling) so both engines
produce bit-identical values — the same discipline as embedding_quantize_int8.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mongodb_nats_connector_spark.registry import register
from mongodb_nats_connector_spark.sources.tables import table


@register(
    "embedding_dim_stats",
    oracle="""
    WITH flat AS (
      SELECT CAST(unnest(range(len(embedding))) AS INT) AS dim,
             CAST(unnest(embedding) AS DOUBLE) AS v
      FROM embeddings
    )
    SELECT dim,
           CAST(count(*) AS BIGINT) AS n,
           avg(v) AS mean_v,
           round(stddev_samp(v), 4) AS std_v,
           min(v) AS min_v,
           max(v) AS max_v
    FROM flat
    GROUP BY dim
    """,
    doc="Per-dimension embedding statistics (the fit step for feature "
    "scaling / PCA preconditioning): posexplode to (dim, value), aggregate "
    "count/mean/std/min/max per dimension. Shuffle key domain = vector "
    "width; partial aggregation reduces each partition to width rows before "
    "the exchange.",
)
def embedding_dim_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "embeddings", parallel=True)
    flat = e.select(
        F.posexplode(F.transform("embedding", lambda x: x.cast("double")))
        .alias("dim", "v")
    )
    return flat.groupBy(F.col("dim").cast("int").alias("dim")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.avg("v").alias("mean_v"),
        F.round(F.stddev_samp("v"), 4).alias("std_v"),
        F.min("v").alias("min_v"),
        F.max("v").alias("max_v"),
    )


@register(
    "embedding_minmax_normalize",
    oracle="""
    WITH flat AS (
      SELECT vec_id,
             CAST(unnest(range(len(embedding))) AS INT) AS dim,
             CAST(unnest(embedding) AS DOUBLE) AS v
      FROM embeddings
    ),
    stats AS (
      SELECT dim, min(v) AS lo, max(v) AS hi FROM flat GROUP BY dim
    ),
    quant AS (
      SELECT vec_id, dim,
             CAST(floor((v - lo) / (hi - lo) * 1000.0 + 0.5) AS BIGINT) AS q
      FROM flat JOIN stats USING (dim)
    )
    SELECT vec_id,
           CAST(sum(q) AS BIGINT) AS q_sum,
           CAST(sum(q * (dim + 1)) AS BIGINT) AS q_dot_idx,
           CAST(min(q) AS BIGINT) AS q_min,
           CAST(max(q) AS BIGINT) AS q_max
    FROM quant
    GROUP BY vec_id
    """,
    doc="Min-max feature normalization to [0, 1] per dimension, verified "
    "via integer checksums: per-dim min/max are exact doubles (unlike "
    "mean/std, which carry summation-order noise), so the scaled value and "
    "its floor(x*1000+0.5) quantization are bit-identical across engines. "
    "Spark plan: per-dim extrema (width-sized shuffle) broadcast back as a "
    "64-row map join, then map-only scaling — at 100 TB the fit pass is "
    "the only shuffle and the transform streams.",
)
def embedding_minmax_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "embeddings", parallel=True)
    flat = e.select(
        "vec_id",
        F.posexplode(F.transform("embedding", lambda x: x.cast("double")))
        .alias("dim", "v"),
    ).withColumn("dim", F.col("dim").cast("int"))
    stats = flat.groupBy("dim").agg(
        F.min("v").alias("lo"), F.max("v").alias("hi")
    )
    quant = (
        flat.join(F.broadcast(stats), "dim")
        .withColumn(
            "q",
            F.floor(
                (F.col("v") - F.col("lo")) / (F.col("hi") - F.col("lo")) * 1000.0 + 0.5
            ).cast("bigint"),
        )
    )
    return quant.groupBy("vec_id").agg(
        F.sum("q").cast("bigint").alias("q_sum"),
        F.sum(F.col("q") * (F.col("dim") + 1)).cast("bigint").alias("q_dot_idx"),
        F.min("q").cast("bigint").alias("q_min"),
        F.max("q").cast("bigint").alias("q_max"),
    )
