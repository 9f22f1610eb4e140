"""Custom Python Data Source: change-stream format with op-type pushdown."""

from __future__ import annotations

import uuid

import pytest
from pyspark.sql import functions as F

from mongodb_nats_connector_spark.sources.changestream_datasource import (
    register_changestream_source,
)


def _collect_stream(spark, reader_df):
    name = "cs" + uuid.uuid4().hex[:10]
    q = (
        reader_df.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = spark.sql(f"SELECT * FROM {name}").toPandas()
    q.stop()
    return out


def test_changestream_source_streams_all_events(spark):
    register_changestream_source(spark)
    df = (
        spark.readStream.format("mongo_changestream")
        .option("nDocs", 10)
        .option("batchSize", 16)
        .load()
    )
    out = _collect_stream(spark, df)
    # 10 docs x 4 ops + 3 noise events
    assert len(out) == 43
    assert out["_id_data"].is_unique
    assert set(out["operation_type"]) == {
        "insert", "update", "replace", "delete", "drop", "rename", "invalidate"
    }


def test_changestream_source_optype_pushdown(spark):
    """The server-side $match the reference missed (SURVEY.md §4.1): with the
    operationTypes option, filtered ops never enter the stream."""
    register_changestream_source(spark)
    df = (
        spark.readStream.format("mongo_changestream")
        .option("nDocs", 10)
        .option("operationTypes", "insert,update,replace,delete")
        .load()
    )
    out = _collect_stream(spark, df)
    assert len(out) == 40
    assert set(out["operation_type"]) == {"insert", "update", "replace", "delete"}


def test_latest_offset_monotonic_through_read_failure(tmp_path):
    """A transient feedstate read failure must NOT regress latestOffset to 0
    (the engine would replan from seq 0 and republish the whole feed): the
    reader reports the last successfully observed offset until the file is
    readable again, and clamps any backwards jump."""
    from mongodb_nats_connector_spark.sources.changestream_datasource import (
        ChangeStreamReader,
    )

    feed = tmp_path / "feed_state"
    feed.write_text("7")
    r = ChangeStreamReader({"ndocs": 10, "feedstate": str(feed)})
    assert r.latestOffset() == {"seq": 7}

    feed.unlink()  # transient failure: hold at 7, not 0
    assert r.latestOffset() == {"seq": 7}
    feed.write_text("not a number")  # corrupt read is also transient
    assert r.latestOffset() == {"seq": 7}

    feed.write_text("3")  # a backwards server value violates the contract
    assert r.latestOffset() == {"seq": 7}

    feed.write_text("12")  # progress resumes once readable again
    assert r.latestOffset() == {"seq": 12}


def test_restart_mid_stream_exactly_once_in_order(spark, tmp_path):
    """restart_connector_test.go:30-38 ported onto the custom DataSource
    offset path: the live feed produces 40 events, the query is killed, the
    feed grows to all 103, a fresh query resumes from the CHECKPOINTED
    sequence (not from zero) and every publishable event arrives exactly
    once, in token order."""
    from mongodb_nats_connector_spark.streaming.pipeline import (
        transform_change_events,
    )
    from mongodb_nats_connector_spark.streaming.sink import JetStreamLikeSink

    register_changestream_source(spark)
    feed_state = str(tmp_path / "feed_state")
    with open(feed_state, "w") as f:
        f.write("40")
    sink = JetStreamLikeSink(
        spark, stream_dir=str(tmp_path / "sink/COLL1"), stream_name="COLL1"
    )
    sink.add_stream()
    ckpt = str(tmp_path / "ckpt")

    def start():
        events = (
            spark.readStream.format("mongo_changestream")
            .option("nDocs", 25)  # 100 publishable + 3 noise
            .option("batchSize", 10)
            .option("feedState", feed_state)
            .option("operationTypes", "insert,update,replace,delete")
            .load()
        )
        out = transform_change_events(events, "COLL1")
        return (
            out.writeStream.outputMode("append")
            .option("checkpointLocation", ckpt)
            .foreachBatch(sink.publish_batch)
            .start()
        )

    q = start()
    q.processAllAvailable()
    q.stop()  # kill mid-stream
    assert sink.message_count() == 40, "first segment should be published"

    with open(feed_state, "w") as f:
        f.write("103")  # the stream kept producing while the connector was down

    q2 = start()
    q2.processAllAvailable()
    q2.stop()

    ids = [
        r.msg_id
        for r in sink.read_messages().orderBy("epoch", "seq_in_epoch").collect()
    ]
    assert len(ids) == 100, f"expected all 100 publishable events, got {len(ids)}"
    assert len(set(ids)) == 100, "duplicates after restart"
    assert ids == sorted(ids), "token order broken across restart"


def test_source_pause_resume_zero_loss(spark, tmp_path):
    """restart_mongo_test.go:30-38 analogue: the event source goes quiet
    (database down produces nothing), the connector query STAYS RUNNING, the
    source resumes, and all 100 events are delivered exactly once in order —
    zero loss across the outage, no restart needed."""
    from mongodb_nats_connector_spark.streaming.pipeline import (
        transform_change_events,
    )
    from mongodb_nats_connector_spark.streaming.sink import JetStreamLikeSink

    register_changestream_source(spark)
    feed_state = str(tmp_path / "feed_state")
    with open(feed_state, "w") as f:
        f.write("30")
    sink = JetStreamLikeSink(
        spark, stream_dir=str(tmp_path / "sink/COLL1"), stream_name="COLL1"
    )
    sink.add_stream()
    events = (
        spark.readStream.format("mongo_changestream")
        .option("nDocs", 25)
        .option("batchSize", 10)
        .option("feedState", feed_state)
        .option("operationTypes", "insert,update,replace,delete")
        .load()
    )
    q = (
        transform_change_events(events, "COLL1")
        .writeStream.outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .foreachBatch(sink.publish_batch)
        .start()
    )
    try:
        q.processAllAvailable()
        assert sink.message_count() == 30
        # outage: the source produces nothing; extra trigger cycles are no-ops
        q.processAllAvailable()
        assert sink.message_count() == 30
        # recovery: the stream resumes producing
        with open(feed_state, "w") as f:
            f.write("103")
        q.processAllAvailable()
    finally:
        q.stop()
    ids = [
        r.msg_id
        for r in sink.read_messages().orderBy("epoch", "seq_in_epoch").collect()
    ]
    assert len(ids) == 100 and len(set(ids)) == 100
    assert ids == sorted(ids), "order broken across the outage"


def test_jetstream_sink_datasource_end_to_end(spark, tmp_path):
    """format('jetstream_sink') writer: publish-then-manifest-commit per
    epoch, consumer dedup by msg_id — the O9/O10 protocol as a first-class
    Data Source sink, chained after the custom change-stream source."""
    from mongodb_nats_connector_spark.sources.jetstream_sink_datasource import (
        read_jetstream_sink,
        register_jetstream_sink,
    )
    from mongodb_nats_connector_spark.streaming.pipeline import (
        transform_change_events,
    )

    register_changestream_source(spark)
    register_jetstream_sink(spark)

    events = (
        spark.readStream.format("mongo_changestream")
        .option("ndocs", 20)
        .option("batchSize", 7)
        .load()
    )
    out = transform_change_events(events, "COLL1")
    sink_dir = str(tmp_path / "jetsink")
    q = (
        out.writeStream.format("jetstream_sink")
        .option("path", sink_dir)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    q.stop()

    from mongodb_nats_connector_spark.sources.change_events import (
        generate_change_event_rows,
    )

    publishable = {"insert", "update", "replace", "delete"}
    expected = sum(
        1
        for r in generate_change_event_rows(
            n_docs=20, with_noise_tail=True, with_duplicates=False
        )
        if r[1] in publishable
    )
    msgs = read_jetstream_sink(spark, sink_dir)
    rows = msgs.orderBy("msg_id").collect()
    assert len(rows) == expected  # noise ops filtered at the source
    assert all(r.subject in {f"COLL1.{op}" for op in publishable} for r in rows)
    assert len({r.msg_id for r in rows}) == expected

    # replay the same epochs (fresh checkpoint, same sink dir): manifests
    # are overwritten, consumer still sees exactly 20 (idempotent commit)
    q2 = (
        out.writeStream.format("jetstream_sink")
        .option("path", sink_dir)
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(120)
    q2.stop()
    assert read_jetstream_sink(spark, sink_dir).count() == expected
