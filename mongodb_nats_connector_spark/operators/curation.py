"""Training-corpus curation operators: reproducible sampling/splits and the
composed filter→dedup pipeline a pre-training data flow runs end-to-end.

Sampling and split assignment are DETERMINISTIC (hash of a salted doc_id, no
RNG): re-running on any cluster size, partition layout, or engine yields the
same assignment — the property training pipelines actually need from a
sampler, and the reason this is not `df.sample()` (whose output depends on
partitioning). Comparison across engines uses the md5 hex prefix ordered
lexicographically, which is identical in Spark and DuckDB without any
hex->int conversion.

The curation pipeline composes the text-quality heuristics (operators/text.py)
with exact dedup (operators/dedup.py semantics): language/length/punctuation/
quality filters, then one group-by on the full text keeping the smallest
doc_id. At 100 TB the group-by key becomes the sha256 of the text (see
dedup_exact_hash) — the filters are map-only and cost no shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mongodb_nats_connector_spark.operators.text import QUALITY_STOPWORDS
from mongodb_nats_connector_spark.registry import register
from mongodb_nats_connector_spark.sources.tables import table

SALT = "split-v1:"
# md5-hex 4-char prefixes, compared lexicographically: 'cccc' =~ 80%,
# 'e666' =~ 90%, '1999' =~ 10% of the uniform hash space
TRAIN_UB, VAL_UB, SAMPLE_UB = "cccc", "e666", "1999"


@register(
    "sample_hash_split",
    oracle=f"""
    SELECT doc_id,
           substr(md5('{SALT}' || CAST(doc_id AS VARCHAR)), 1, 4) AS hash_prefix,
           CASE WHEN substr(md5('{SALT}' || CAST(doc_id AS VARCHAR)), 1, 4) < '{TRAIN_UB}'
                  THEN 'train'
                WHEN substr(md5('{SALT}' || CAST(doc_id AS VARCHAR)), 1, 4) < '{VAL_UB}'
                  THEN 'val'
                ELSE 'test' END AS split,
           CAST(CASE WHEN substr(md5('{SALT}' || CAST(doc_id AS VARCHAR)), 1, 4)
                          < '{SAMPLE_UB}' THEN 1 ELSE 0 END AS BIGINT) AS in_10pct_sample
    FROM documents
    """,
    doc="Deterministic train/val/test split (80/10/10) + reproducible 10% "
    "subsample, assigned by salted md5 of the doc id. Pure projection — "
    "map-only at any scale; stable under repartitioning (unlike "
    "df.sample()).",
)
def sample_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    h4 = F.substring(
        F.md5(F.encode(F.concat(F.lit(SALT), F.col("doc_id").cast("string")), "utf-8")),
        1,
        4,
    )
    split = (
        F.when(h4 < TRAIN_UB, "train").when(h4 < VAL_UB, "val").otherwise("test")
    )
    return docs.select(
        "doc_id",
        h4.alias("hash_prefix"),
        split.alias("split"),
        (h4 < SAMPLE_UB).cast("bigint").alias("in_10pct_sample"),
    )


@register(
    "curate_training_set",
    oracle=f"""
    WITH scored AS (
      SELECT doc_id, text,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
             length(regexp_replace(text, '[a-zA-Z0-9 ]', '', 'g')) * 1.0
               / length(text) AS punct_ratio,
             len(list_filter(string_split(text, ' '),
                 w -> list_contains({QUALITY_STOPWORDS!r}, lower(w)))) * 1.0
               / len(string_split(text, ' ')) AS stopword_ratio
      FROM documents
    ), filtered AS (
      SELECT * FROM scored
      WHERE n_words >= 10 AND punct_ratio <= 0.2 AND stopword_ratio >= 0.05
    )
    SELECT CAST(min(doc_id) AS BIGINT) AS doc_id,
           CAST(min(n_words) AS BIGINT) AS n_words,
           round(min(stopword_ratio), 4) AS stopword_ratio,
           CAST(count(*) AS BIGINT) AS n_copies
    FROM filtered GROUP BY text
    """,
    doc="End-to-end corpus curation: C4/Gopher-style filters (min length, "
    "max punctuation ratio, min stopword ratio — all map-only column "
    "expressions) then exact dedup keeping the smallest doc_id. The only "
    "shuffle is the final dedup group-by (on sha256 of the text at 100 TB, "
    "see dedup_exact_hash).",
)
def curate_training_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    words = F.split("text", " ")
    stop_arr = F.array(*[F.lit(w) for w in QUALITY_STOPWORDS])
    n_stop = F.size(F.filter(words, lambda w: F.array_contains(stop_arr, F.lower(w))))
    scored = docs.select(
        "doc_id",
        "text",
        F.size(words).cast("bigint").alias("n_words"),
        (
            F.length(F.regexp_replace("text", "[a-zA-Z0-9 ]", "")) / F.length("text")
        ).alias("punct_ratio"),
        (n_stop / F.size(words)).alias("stopword_ratio"),
    )
    filtered = scored.filter(
        (F.col("n_words") >= 10)
        & (F.col("punct_ratio") <= 0.2)
        & (F.col("stopword_ratio") >= 0.05)
    )
    return filtered.groupBy("text").agg(
        F.min("doc_id").alias("doc_id"),
        F.min("n_words").alias("n_words"),
        F.round(F.min("stopword_ratio"), 4).alias("stopword_ratio"),
        F.count(F.lit(1)).alias("n_copies"),
    ).drop("text")
