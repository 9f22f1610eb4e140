"""Streaming corpus ingestion: quality gate, cross-epoch dedup, idempotent
replay, and end-to-end file-stream drains across restarts."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mongodb_nats_connector_spark.streaming.corpus_ingest import (
    INGEST_SCHEMA,
    CorpusIngestSink,
    quality_filter,
)

GOOD = "the quick brown fox jumps over the lazy dog and runs far away home"
GOOD2 = "a stream of new documents arrives and the pipeline must keep the good ones"
SHORT = "too short"
PUNCTY = "!!! ??? ### $$$ %%% ^^^ &&& *** ((( ))) !!! ??? ### $$$ %%%"


def _df(spark, rows):
    return spark.createDataFrame(rows, INGEST_SCHEMA)


def test_quality_filter_gates(spark):
    rows = [
        (1, GOOD, "en", "src0"),
        (2, SHORT, "en", "src0"),
        (3, PUNCTY, "en", "src0"),
    ]
    kept = quality_filter(_df(spark, rows)).select("doc_id").collect()
    assert [r["doc_id"] for r in kept] == [1]


def test_in_batch_and_cross_epoch_dedup(spark, tmp_path):
    sink = CorpusIngestSink(spark, str(tmp_path / "corpus"))
    # epoch 0: two copies of GOOD (different ids) + one unique
    sink.ingest_batch(
        _df(spark, [(1, GOOD, "en", "src0"), (7, GOOD, "en", "src1"),
                    (2, GOOD2, "en", "src0")]),
        epoch_id=0,
    )
    got = {r["doc_id"] for r in sink.corpus().collect()}
    assert got == {1, 2}, "in-batch dedup keeps the smallest doc_id"
    # epoch 1: replays GOOD (already admitted) + brings one new doc
    new_text = GOOD2 + " with a genuinely different tail of words"
    sink.ingest_batch(
        _df(spark, [(9, GOOD, "en", "src2"), (10, new_text, "en", "src0")]),
        epoch_id=1,
    )
    got = {r["doc_id"] for r in sink.corpus().collect()}
    assert got == {1, 2, 10}, "cross-epoch dedup drops re-arrivals"


def test_epoch_replay_is_idempotent(spark, tmp_path):
    sink = CorpusIngestSink(spark, str(tmp_path / "corpus"))
    batch = _df(spark, [(1, GOOD, "en", "src0"), (2, GOOD2, "en", "src0")])
    sink.ingest_batch(batch, epoch_id=5)
    first = sorted(r["doc_id"] for r in sink.corpus().collect())
    # crash-replay: the SAME epoch applies again — must converge, not dup
    sink.ingest_batch(batch, epoch_id=5)
    again = sorted(r["doc_id"] for r in sink.corpus().collect())
    assert first == again == [1, 2]
    assert sink.corpus().count() == 2


def test_stream_drain_and_restart(spark, tmp_path):
    """End-to-end: file stream -> ingest, then new files + a fresh query on
    the same checkpoint (restart) — each doc admitted exactly once."""
    src = tmp_path / "incoming"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")
    sink = CorpusIngestSink(spark, str(tmp_path / "corpus"))

    _df(spark, [(1, GOOD, "en", "src0"), (2, SHORT, "en", "src0")]).write.mode(
        "overwrite"
    ).parquet(str(src / "f0"))
    stream = spark.readStream.schema(INGEST_SCHEMA).parquet(str(src / "*"))
    q = sink.attach(stream, ckpt, "corpus_ingest_t1")
    q.awaitTermination(120)
    assert {r["doc_id"] for r in sink.corpus().collect()} == {1}

    # more files: one duplicate of an admitted doc, one novel
    _df(spark, [(3, GOOD, "en", "src1"), (4, GOOD2, "en", "src0")]).write.mode(
        "overwrite"
    ).parquet(str(src / "f1"))
    stream2 = spark.readStream.schema(INGEST_SCHEMA).parquet(str(src / "*"))
    q2 = sink.attach(stream2, ckpt, "corpus_ingest_t2")
    q2.awaitTermination(120)
    corpus = sink.corpus()
    assert {r["doc_id"] for r in corpus.collect()} == {1, 4}
    # and the corpus itself stays exactly-deduped by content hash
    n_sha = corpus.select("text_sha").distinct().count()
    assert n_sha == corpus.count() == 2


@pytest.mark.parametrize("n_docs", [50])
def test_bulk_ingest_matches_batch_curation(spark, tmp_path, n_docs):
    """Streaming the fixture corpus through the sink must equal the batch
    curate pipeline's (filter + exact-dedup) keeper set."""
    from mongodb_nats_connector_spark.sources.tables import table

    sf = "/root/testdata/sf0.001"
    docs = (
        table(spark, sf, "documents")
        .select("doc_id", "text", "lang", "source")
        .limit(n_docs)
    )
    sink = CorpusIngestSink(spark, str(tmp_path / "corpus"))
    sink.ingest_batch(docs, epoch_id=0)
    streamed = {r["doc_id"] for r in sink.corpus().collect()}
    expected = {
        r["doc_id"]
        for r in quality_filter(docs)
        .groupBy(F.sha2("text", 256))
        .agg(F.min("doc_id").alias("doc_id"))
        .collect()
    }
    assert streamed == expected


# changing only the LAST word alters exactly 1 of 12 trigram shingles:
# Jaccard 11/13 = 0.846 >= 0.7 (a middle-word change alters 3 -> 0.6, below)
NEAR = GOOD.replace("away home", "away house")


def test_near_dup_rejected_across_epochs(spark, tmp_path):
    """A near-duplicate (not byte-identical) of an admitted doc must be
    rejected by the LSH probe + exact Jaccard verify; unrelated docs pass."""
    sink = CorpusIngestSink(spark, str(tmp_path / "corpus"), near_dedup=True)
    sink.ingest_batch(_df(spark, [(1, GOOD, "en", "src0")]), epoch_id=0)
    assert {r["doc_id"] for r in sink.corpus().collect()} == {1}

    sink.ingest_batch(
        _df(spark, [(2, NEAR, "en", "src1"), (3, GOOD2, "en", "src0")]),
        epoch_id=1,
    )
    got = {r["doc_id"] for r in sink.corpus().collect()}
    assert got == {1, 3}, f"near-dup must be rejected: {got}"


def test_near_dup_rejected_within_batch(spark, tmp_path):
    """Two near-dups arriving in the SAME batch: smaller doc_id wins."""
    sink = CorpusIngestSink(spark, str(tmp_path / "corpus"), near_dedup=True)
    sink.ingest_batch(
        _df(spark, [(9, NEAR, "en", "src1"), (4, GOOD, "en", "src0"),
                    (5, GOOD2, "en", "src0")]),
        epoch_id=0,
    )
    got = {r["doc_id"] for r in sink.corpus().collect()}
    assert got == {4, 5}, f"in-batch near-dup must keep the smaller id: {got}"


def test_near_dedup_replay_idempotent(spark, tmp_path):
    """Replaying an epoch with near-dedup on must converge: the epoch's own
    band-index partition is excluded from its probe, like the corpus."""
    sink = CorpusIngestSink(spark, str(tmp_path / "corpus"), near_dedup=True)
    sink.ingest_batch(_df(spark, [(1, GOOD, "en", "src0")]), epoch_id=0)
    batch = _df(spark, [(2, NEAR, "en", "src1"), (3, GOOD2, "en", "src0")])
    sink.ingest_batch(batch, epoch_id=1)
    first = sorted(r["doc_id"] for r in sink.corpus().collect())
    sink.ingest_batch(batch, epoch_id=1)  # crash-replay
    again = sorted(r["doc_id"] for r in sink.corpus().collect())
    assert first == again == [1, 3]
    # band index mirrors the corpus (one band set per admitted doc)
    assert (
        sink.band_index().select("doc_id").distinct().count() == 2
    )
