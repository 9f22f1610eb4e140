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

from mongodb_nats_connector_spark.functions.texthash import (
    band_key_array,
    minhash_signature,
    hashed_word_shingles,
)
from mongodb_nats_connector_spark.operators.text import QUALITY_STOPWORDS
from mongodb_nats_connector_spark.plans.hints import maybe_broadcast

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


NEAR_DUP_JACCARD = 0.7


def _with_shingles(df: DataFrame) -> DataFrame:
    """Add h64 (hashed shingle set) to a (…, text) relation; docs under 3
    words get an empty set (they can never near-dup match). Shares
    ``hashed_word_shingles`` with the batch LSH operator so the streaming
    band index and any batch-computed signatures agree on the definition."""
    return df.withColumn("h64", hashed_word_shingles(F.split("text", " ")))


class CorpusIngestSink:
    """foreachBatch sink maintaining the curated, exact-deduped corpus.

    With ``near_dedup=True`` the sink ALSO rejects near-duplicates
    (word-3-gram Jaccard >= 0.7) of anything already admitted, maintaining a
    MinHash band-key index incrementally beside the corpus: each admitted
    epoch writes its docs' band keys to ``bands/epoch=<id>``, incoming docs
    LSH-probe that index, and only band-collision candidates get exact
    Jaccard verification (against just the collided corpus docs). The
    corpus-sized relation never shuffles per batch — candidate doc_ids are
    semi-joined out of it — which is the same discipline as the batch LSH
    operator and holds at any corpus size."""

    def __init__(
        self, spark: SparkSession, corpus_dir: str, near_dedup: bool = False
    ) -> None:
        self.spark = spark
        self.corpus_dir = corpus_dir
        self.near_dedup = near_dedup
        self.bands_dir = os.path.join(corpus_dir, "bands")

    def _epoch_dirs(self, root: str) -> list[str]:
        if not os.path.isdir(root):
            return []
        return sorted(e for e in os.listdir(root) if e.startswith("epoch="))

    def _read_epochs(
        self, root: str, schema: str, exclude_epoch: int | None
    ) -> DataFrame:
        dirs = [
            os.path.join(root, e)
            for e in self._epoch_dirs(root)
            if exclude_epoch is None or e != f"epoch={exclude_epoch}"
        ]
        if not dirs:
            return self.spark.createDataFrame([], schema)
        return self.spark.read.option("basePath", root).parquet(*dirs)

    def corpus(self, exclude_epoch: int | None = None) -> DataFrame:
        """Everything admitted so far (optionally excluding one epoch's
        partition — used during that epoch's own apply/replay)."""
        return self._read_epochs(
            self.corpus_dir,
            f"text_sha string, {INGEST_SCHEMA}, n_words bigint",
            exclude_epoch,
        ).select(*_CORPUS_COLUMNS)

    def band_index(self, exclude_epoch: int | None = None) -> DataFrame:
        return self._read_epochs(
            self.bands_dir, "doc_id bigint, band_key bigint", exclude_epoch
        ).select("doc_id", "band_key")

    def _reject_near_dups(self, novel: DataFrame, epoch_id: int) -> DataFrame:
        """Drop docs near-duplicating the admitted corpus or a smaller-id
        batchmate. LSH-probe the band index; verify candidates exactly."""
        novel = _with_shingles(novel).withColumn(
            "bands", band_key_array(minhash_signature(F.col("h64")))
        )
        novel_bands = novel.select(
            "doc_id", F.explode("bands").alias("band_key")
        )
        # candidates vs corpus: collide in any band -> (new doc, corpus doc)
        idx = self.band_index(exclude_epoch=epoch_id).select(
            F.col("doc_id").alias("old_id"), "band_key"
        )
        cand = (
            novel_bands.join(idx, "band_key")
            .select(F.col("doc_id").alias("new_id"), "old_id")
            .distinct()
        )
        # corpus shingle sets ONLY for collided docs (semi-join pruned scan)
        old_sets = _with_shingles(
            self.corpus(exclude_epoch=epoch_id).join(
                maybe_broadcast(cand.select(F.col("old_id").alias("doc_id")).distinct()),
                "doc_id",
                "left_semi",
            )
        ).select(F.col("doc_id").alias("old_id"), F.col("h64").alias("h_old"))
        new_sets = novel.select(F.col("doc_id").alias("new_id"), "h64")
        jac = F.size(F.array_intersect("h64", "h_old")) / F.size(
            F.array_union("h64", "h_old")
        )
        dup_vs_corpus = (
            new_sets.join(maybe_broadcast(cand), "new_id")
            .join(old_sets, "old_id")
            .filter(jac >= NEAR_DUP_JACCARD)
            .select(F.col("new_id").alias("doc_id"))
            .distinct()
        )
        # in-batch near-dups: band collisions within the batch, smaller
        # doc_id wins (pairwise — a rare A~B~C chain admits A and drops B,
        # C; the periodic batch dedup_clusters compaction owns chains)
        nb = novel_bands
        pair = (
            nb.alias("x")
            .join(nb.alias("y"), "band_key")
            .filter(F.col("x.doc_id") < F.col("y.doc_id"))
            .select(
                F.col("x.doc_id").alias("a_id"), F.col("y.doc_id").alias("b_id")
            )
            .distinct()
        )
        sets_a = new_sets.select(F.col("new_id").alias("a_id"), F.col("h64").alias("h_a"))
        jac_ab = F.size(F.array_intersect("h_a", "h64")) / F.size(
            F.array_union("h_a", "h64")
        )
        dup_in_batch = (
            new_sets.select(F.col("new_id").alias("b_id"), "h64")
            .join(maybe_broadcast(pair), "b_id")
            .join(sets_a, "a_id")
            .filter(jac_ab >= NEAR_DUP_JACCARD)
            .select(F.col("b_id").alias("doc_id"))
            .distinct()
        )
        rejected = dup_vs_corpus.unionByName(dup_in_batch).distinct()
        return novel.join(rejected, "doc_id", "left_anti").drop("bands")

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
        novel = in_batch.join(existing, "text_sha", "left_anti")
        if self.near_dedup:
            novel = self._reject_near_dups(novel, epoch_id)
        admitted = novel.select(*_CORPUS_COLUMNS)
        (
            admitted.write.mode("overwrite").parquet(
                os.path.join(self.corpus_dir, f"epoch={epoch_id}")
            )
        )
        if self.near_dedup:
            # the admitted docs' band keys extend the index for later epochs
            bands = (
                _with_shingles(
                    self.spark.read.parquet(
                        os.path.join(self.corpus_dir, f"epoch={epoch_id}")
                    )
                )
                .withColumn("bands", band_key_array(minhash_signature(F.col("h64"))))
                .select("doc_id", F.explode("bands").alias("band_key"))
            )
            bands.write.mode("overwrite").parquet(
                os.path.join(self.bands_dir, f"epoch={epoch_id}")
            )

    def attach(self, stream_df: DataFrame, checkpoint_dir: str, query_name: str):
        return (
            stream_df.writeStream.foreachBatch(self.ingest_batch)
            .option("checkpointLocation", checkpoint_dir)
            .queryName(query_name)
            .trigger(availableNow=True)
            .start()
        )
