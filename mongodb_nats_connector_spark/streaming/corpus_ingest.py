"""Continuous training-corpus ingestion: the streaming composition of the
curation operators.

A stream of raw documents becomes an append-only curated corpus:

1. quality filter — the same C4/Gopher-style column expressions as
   ``operators/curation.curate_training_set`` (map-only, no shuffle);
2. in-batch exact dedup — keep the smallest doc_id per sha256(text);
3. cross-epoch dedup — anti-join the batch against every hash already in
   the corpus, so a document ever admitted is never admitted again;
4. epoch-idempotent append — each epoch writes (overwrites) its OWN
   ``epoch=<id>`` partition, so a replayed epoch after a crash lands in the
   same place instead of duplicating. The cross-epoch anti-join excludes the
   current epoch's partition for the same reason: a replay must not see its
   own partial previous write as "already ingested".

Scale notes: the only corpus-sized shuffle is the anti-join on the 32-byte
text hash. At 100 TB the accumulated-hash side becomes a bucketed hash table
(bucketed by text_sha) so the anti-join co-locates, with a bloom-filter
prefilter dropping the obvious novelties before the shuffle; the epoch
partition layout is unchanged. This mirrors how the reference's consumers
build derived state from the event stream (SURVEY.md §3) — the connector
itself stops at publish; this is the canonical downstream.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mongodb_nats_connector_spark.operators.text import QUALITY_STOPWORDS

INGEST_SCHEMA = "doc_id bigint, text string, lang string, source string"

MIN_WORDS = 10
MAX_PUNCT_RATIO = 0.2
MIN_STOPWORD_RATIO = 0.05

_CORPUS_COLUMNS = ("text_sha", "doc_id", "text", "lang", "source", "n_words")


def quality_filter(docs: DataFrame) -> DataFrame:
    """The map-only curation filter: length, punctuation and stopword gates
    (identical arithmetic to curate_training_set's oracle)."""
    words = F.split("text", " ")
    stop_arr = F.array(*[F.lit(w) for w in QUALITY_STOPWORDS])
    n_stop = F.size(F.filter(words, lambda w: F.array_contains(stop_arr, F.lower(w))))
    scored = docs.withColumn("n_words", F.size(words).cast("bigint")).withColumn(
        "punct_ratio",
        F.length(F.regexp_replace("text", "[a-zA-Z0-9 ]", "")) / F.length("text"),
    ).withColumn("stopword_ratio", n_stop / F.size(words))
    return scored.filter(
        (F.col("n_words") >= MIN_WORDS)
        & (F.col("punct_ratio") <= MAX_PUNCT_RATIO)
        & (F.col("stopword_ratio") >= MIN_STOPWORD_RATIO)
    ).drop("punct_ratio", "stopword_ratio")


class CorpusIngestSink:
    """foreachBatch sink maintaining the curated, exact-deduped corpus."""

    def __init__(self, spark: SparkSession, corpus_dir: str) -> None:
        self.spark = spark
        self.corpus_dir = corpus_dir

    def _epoch_dirs(self) -> list[str]:
        if not os.path.isdir(self.corpus_dir):
            return []
        return sorted(
            e for e in os.listdir(self.corpus_dir) if e.startswith("epoch=")
        )

    def corpus(self, exclude_epoch: int | None = None) -> DataFrame:
        """Everything admitted so far (optionally excluding one epoch's
        partition — used during that epoch's own apply/replay)."""
        dirs = [
            os.path.join(self.corpus_dir, e)
            for e in self._epoch_dirs()
            if exclude_epoch is None or e != f"epoch={exclude_epoch}"
        ]
        if not dirs:
            return self.spark.createDataFrame(
                [], f"text_sha string, {INGEST_SCHEMA}, n_words bigint"
            ).select(*_CORPUS_COLUMNS)
        return (
            self.spark.read.option("basePath", self.corpus_dir)
            .parquet(*dirs)
            .select(*_CORPUS_COLUMNS)
        )

    # foreachBatch body
    def ingest_batch(self, batch: DataFrame, epoch_id: int) -> None:
        if batch.isEmpty():
            return
        kept = quality_filter(batch)
        hashed = kept.withColumn("text_sha", F.sha2("text", 256))
        # in-batch exact dedup: smallest doc_id wins, deterministically
        in_batch = (
            hashed.groupBy("text_sha")
            .agg(
                F.min("doc_id").alias("doc_id"),
                F.min_by("text", "doc_id").alias("text"),
                F.min_by("lang", "doc_id").alias("lang"),
                F.min_by("source", "doc_id").alias("source"),
                F.min_by("n_words", "doc_id").alias("n_words"),
            )
        )
        # cross-epoch dedup: drop anything some earlier epoch admitted.
        # The current epoch's own partition is excluded so crash-replay is
        # idempotent (it will be overwritten below anyway).
        existing = self.corpus(exclude_epoch=epoch_id).select("text_sha")
        novel = in_batch.join(existing, "text_sha", "left_anti").select(
            *_CORPUS_COLUMNS
        )
        (
            novel.write.mode("overwrite").parquet(
                os.path.join(self.corpus_dir, f"epoch={epoch_id}")
            )
        )

    def attach(self, stream_df: DataFrame, checkpoint_dir: str, query_name: str):
        return (
            stream_df.writeStream.foreachBatch(self.ingest_batch)
            .option("checkpointLocation", checkpoint_dir)
            .queryName(query_name)
            .trigger(availableNow=True)
            .start()
        )
