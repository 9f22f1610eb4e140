"""Port of the reference's acceptance + fault-injection suites (SURVEY.md §5).

Scenario sources (reference files under /root/reference/):
  insert/update/replace/delete golden specs: test/acceptance/*_test.go
  drop/rename/invalidate negatives:          drop_test.go / rename_test.go
  exactly-once + order under restart:        test/faultinjection/*_test.go,
                                             harness MustVerifyMessageCorrectness
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from mongodb_nats_connector_spark.config import CollectionConfig, ConnectorConfig
from mongodb_nats_connector_spark.functions.extjson import (
    envelope_to_extjson,
    extjson_get_date,
    extjson_get_oid,
)
from mongodb_nats_connector_spark.sources.change_events import (
    generate_change_events,
    write_change_event_feed,
)
from mongodb_nats_connector_spark.streaming.pipeline import (
    Connector,
    detect_invalidate,
    transform_change_events,
)


def _connector(spark, tmp_path, n_docs=10, **feed_kw):
    feed = str(tmp_path / "feed")
    write_change_event_feed(spark, feed, n_docs=n_docs, **feed_kw)
    cfg = ConnectorConfig(
        collections=[CollectionConfig(db_name="test-connector-db", coll_name="coll1")]
    )
    conn = Connector(
        spark,
        cfg,
        source_paths={"test-connector-db.coll1": feed},
        sink_root=str(tmp_path / "sink"),
    )
    return conn


def test_insert_event_published_once(spark, tmp_path):
    """insert_test.go:36-53: one insert -> one message on COLL1.insert with
    msg id == resume token and an ExtJSON body that round-trips."""
    conn = _connector(spark, tmp_path, n_docs=1, with_noise_tail=False, with_duplicates=False)
    conn.start()
    conn.process_all_available()
    conn.stop()
    sink = conn.handles[0].sink
    msgs = sink.read_messages().filter(F.col("subject") == "COLL1.insert").collect()
    assert len(msgs) == 1
    m = msgs[0]
    body = json.loads(m.data)
    assert m.msg_id == body["_id"]["_data"]
    assert body["operationType"] == "insert"
    assert body["ns"] == {"db": "test-connector-db", "coll": "coll1"}
    assert body["fullDocument"]["message"] == "test 0"
    assert body["fullDocumentBeforeChange"] is None
    assert set(body["documentKey"]["_id"].keys()) == {"$oid"}


def test_update_delete_images(spark, tmp_path):
    """update_test.go:51-56 / delete_test.go:50-55: update carries both
    images; delete has no post-image but a pre-image."""
    conn = _connector(spark, tmp_path, n_docs=1, with_noise_tail=False, with_duplicates=False)
    conn.start()
    conn.process_all_available()
    conn.stop()
    sink = conn.handles[0].sink
    upd = json.loads(
        sink.read_messages().filter(F.col("subject") == "COLL1.update").first().data
    )
    assert upd["fullDocument"]["message"] == "bye 0"
    assert upd["fullDocumentBeforeChange"]["message"] == "test 0"
    dele = json.loads(
        sink.read_messages().filter(F.col("subject") == "COLL1.delete").first().data
    )
    assert dele["fullDocument"] is None
    assert dele["fullDocumentBeforeChange"]["message"] == "replaced 0"


def test_noise_ops_not_published(spark, tmp_path):
    """drop_test.go:32-42 / rename_test.go: drop/rename/invalidate produce NO
    messages and do not crash the pipeline."""
    conn = _connector(spark, tmp_path, n_docs=5, with_noise_tail=True, with_duplicates=False)
    conn.start()
    conn.process_all_available()
    conn.stop()
    sink = conn.handles[0].sink
    subjects = {r.subject for r in sink.read_messages().select("subject").distinct().collect()}
    assert subjects == {"COLL1.insert", "COLL1.update", "COLL1.replace", "COLL1.delete"}
    assert conn.health()["components"][0]["name"] == "pipeline-COLL1"


def test_duplicate_tokens_deduped(spark, tmp_path):
    """README.md:121-127 crash matrix: replayed events with the same resume
    token are dropped by msg-id dedup (consumer side), like Nats-Msg-Id."""
    conn = _connector(spark, tmp_path, n_docs=5, with_noise_tail=False, with_duplicates=True)
    conn.start()
    conn.process_all_available()
    conn.stop()
    sink = conn.handles[0].sink
    total = sink.message_count(deduped=True)
    raw = sink.message_count(deduped=False)
    assert total == 5 * 4  # 4 ops per doc, duplicates dropped
    assert raw >= total  # at-least-once underneath


def test_order_preserved_and_exactly_once_across_restart(spark, tmp_path):
    """faultinjection/restart_connector_test.go:30-38 +
    MustVerifyMessageCorrectness (harness.go:274-294): kill the query
    mid-stream, restart from the checkpoint, then verify every event arrived
    exactly once and in token order."""
    feed = str(tmp_path / "feed")
    n1 = write_change_event_feed(
        spark, feed, n_docs=25, with_noise_tail=False, with_duplicates=False
    )
    cfg = ConnectorConfig(
        collections=[CollectionConfig(db_name="test-connector-db", coll_name="coll1")]
    )
    conn = Connector(
        spark, cfg, {"test-connector-db.coll1": feed}, sink_root=str(tmp_path / "sink")
    )
    conn.start()
    conn.process_all_available()
    conn.stop()  # "restart the connector"

    # more events arrive while the connector is down
    extra = generate_change_events(
        spark, n_docs=50, with_noise_tail=False, with_duplicates=False
    ).filter(F.col("document_key_id") >= F.lpad(F.lit("19"), 24, "0"))  # docs 25..49
    extra.orderBy("_id_data").coalesce(1).write.mode("append").parquet(feed)

    conn2 = Connector(
        spark, cfg, {"test-connector-db.coll1": feed}, sink_root=str(tmp_path / "sink")
    )
    conn2.start()
    conn2.process_all_available()
    conn2.stop()

    sink = conn2.handles[0].sink
    msgs = sink.read_messages().orderBy("epoch", "seq_in_epoch").collect()
    # exactly once: no duplicate msg ids
    ids = [m.msg_id for m in msgs]
    assert len(ids) == len(set(ids)), "duplicate messages after restart"
    assert len(ids) == n1 + extra.count()
    # in-order per collection: token order == arrival order
    assert ids == sorted(ids), "messages out of order"


def test_invalidate_stops_pipeline_siblings_keep_running(spark, tmp_path):
    """O6 end-to-end (client.go:232-235 + drop_test.go:32-42): an invalidate
    marker stops THAT pipeline's StreamingQuery gracefully after its epoch —
    no invalidate message is published, the sibling pipeline keeps running,
    and the connector itself stays healthy."""
    import time

    feeds = {}
    for coll, noise in (("coll1", True), ("coll2", False)):
        path = str(tmp_path / f"feed_{coll}")
        write_change_event_feed(
            spark, path, n_docs=3, ns_coll=coll,
            with_noise_tail=noise, with_duplicates=False,
        )
        feeds[f"db1.{coll}"] = path
    cfg = ConnectorConfig(
        collections=[
            CollectionConfig(db_name="db1", coll_name="coll1"),
            CollectionConfig(db_name="db1", coll_name="coll2"),
        ]
    )
    conn = Connector(spark, cfg, feeds, sink_root=str(tmp_path / "sink"))
    h1, h2 = conn.start()
    conn.process_all_available()

    deadline = time.monotonic() + 30
    while time.monotonic() < deadline and h1.query.isActive:
        time.sleep(0.2)
    assert h1.invalidated, "invalidate marker not detected"
    assert not h1.query.isActive, "invalidated pipeline should stop"
    assert h1.query.exception() is None, "stop must be graceful, not a failure"
    assert h2.query.isActive, "sibling pipeline must keep running"
    assert not h2.invalidated

    # the dropped collection's events before the invalidate were published;
    # drop/rename/invalidate themselves were not
    subjects = {r.subject for r in h1.sink.read_messages().select("subject").distinct().collect()}
    assert subjects == {"COLL1.insert", "COLL1.update", "COLL1.replace", "COLL1.delete"}
    assert h1.sink.message_count() == 12

    health = conn.health()
    assert health["status"] == "UP", "connector stays alive after a drop"
    by_name = {c["name"]: c["status"] for c in health["components"]}
    assert by_name["pipeline-COLL1"] == "COMPLETED"
    assert by_name["pipeline-COLL2"] == "UP"

    # the serve loop must not busy-spin on the terminated handle: the first
    # wait observes the termination and resets, so the next wait BLOCKS for
    # its full timeout instead of returning immediately forever
    assert conn.await_any_termination(timeout=1.0) is True
    t0 = time.monotonic()
    assert conn.await_any_termination(timeout=0.5) is False
    assert time.monotonic() - t0 >= 0.4, "second wait returned immediately"
    conn.stop()


def test_order_within_key_mode_exactly_once_per_key_order(spark, tmp_path):
    """Per-key-ordered sink mode: the epoch write parallelizes (no global
    coalesce) while each document's events stay in token order — the
    guarantee consumers key on (NATS subjects partition per document)."""
    feed = str(tmp_path / "feed")
    n = write_change_event_feed(
        spark, feed, n_docs=20, with_noise_tail=False, with_duplicates=False
    )
    cfg = ConnectorConfig(
        collections=[CollectionConfig(db_name="test-connector-db", coll_name="coll1")]
    )
    conn = Connector(
        spark, cfg, {"test-connector-db.coll1": feed},
        sink_root=str(tmp_path / "sink"), order_within_key=True,
    )
    conn.start()
    conn.process_all_available()
    conn.stop()
    sink = conn.handles[0].sink
    msgs = sink.read_messages().orderBy("document_key", "epoch", "seq_in_epoch").collect()
    ids = [m.msg_id for m in msgs]
    assert len(ids) == n and len(set(ids)) == n, "not exactly-once"
    per_key: dict = {}
    for m in msgs:
        per_key.setdefault(m.document_key, []).append(m.msg_id)
    for key, toks in per_key.items():
        assert toks == sorted(toks), f"per-key order violated for {key}"
    assert len(per_key) == 20


def test_nats_publish_metrics_exposed(spark, tmp_path):
    """The reference's NATS exposition (prometheus.go NatsRegisterer):
    per-subject published counters + duration histogram come from the sink."""
    from mongodb_nats_connector_spark.streaming.observability import MetricsRegistry

    registry = MetricsRegistry()
    feed = str(tmp_path / "feed")
    write_change_event_feed(
        spark, feed, n_docs=3, with_noise_tail=False, with_duplicates=False
    )
    cfg = ConnectorConfig(
        collections=[CollectionConfig(db_name="test-connector-db", coll_name="coll1")]
    )
    conn = Connector(
        spark, cfg, {"test-connector-db.coll1": feed},
        sink_root=str(tmp_path / "sink"), metrics=registry,
    )
    conn.start()
    conn.process_all_available()
    conn.stop()

    text = registry.render_prometheus()
    for op in ("insert", "update", "replace", "delete"):
        assert f'nats_messages_published_total{{subject="COLL1.{op}"}} 3' in text, text
    assert 'nats_message_duration_seconds_bucket{subject="COLL1.insert",le="+Inf"}' in text
    assert "nats_messages_failed_total" not in text  # nothing failed


def test_invalidate_detected(spark):
    """O6: invalidate markers are detectable for stream termination
    (client.go:232-235)."""
    ev = generate_change_events(spark, n_docs=2, with_noise_tail=True)
    inv = detect_invalidate(ev)
    assert inv.count() == 1
    assert inv.first().operation_type == "invalidate"


def test_extjson_envelope_roundtrip(spark):
    """O7 fidelity: serialize the envelope to relaxed ExtJSON and parse the
    typed fields back out ($oid / $date / $timestamp), insert_test.go:45-52."""
    ev = generate_change_events(spark, n_docs=3, with_noise_tail=False, with_duplicates=False)
    doc = ev.select(
        "_id_data",
        "document_key_id",
        "wall_time",
        envelope_to_extjson().alias("j"),
    )
    parsed = doc.select(
        "_id_data",
        "document_key_id",
        "wall_time",
        F.get_json_object("j", "$._id._data").alias("token"),
        extjson_get_oid(F.col("j"), "$.documentKey._id").alias("oid"),
        extjson_get_date(F.col("j"), "$.wallTime").alias("wall"),
    )
    for r in parsed.collect():
        assert r.token == r._id_data
        assert r.oid == r.document_key_id
        assert r.wall == r.wall_time


def test_multi_pipeline_fanout(spark, tmp_path):
    """O14: two watched collections -> two concurrent StreamingQueries, one
    stream each (connector.go:155-174; config fixture FIXTURES.md §5)."""
    feeds = {}
    for coll in ("coll1", "coll2"):
        path = str(tmp_path / f"feed_{coll}")
        write_change_event_feed(
            spark, path, n_docs=3, ns_coll=coll,
            with_noise_tail=False, with_duplicates=False,
        )
        feeds[f"db1.{coll}"] = path
    cfg = ConnectorConfig(
        collections=[
            CollectionConfig(db_name="db1", coll_name="coll1",
                             tokens_coll_capped=True, tokens_coll_size_in_bytes=4096),
            CollectionConfig(db_name="db1", coll_name="coll2"),
        ]
    )
    conn = Connector(spark, cfg, feeds, sink_root=str(tmp_path / "sink"))
    handles = conn.start()
    assert len(handles) == 2
    conn.process_all_available()
    health = conn.health()
    assert health["status"] == "UP"
    conn.stop()
    for h in handles:
        assert h.sink.message_count() == 12
        subs = {r.subject for r in h.sink.read_messages().select("subject").distinct().collect()}
        assert all(s.startswith(h.config.stream_name + ".") for s in subs)


@pytest.mark.parametrize("order_within_key", [False, True])
def test_publish_failure_then_replay_no_duplicates(spark, tmp_path, order_within_key):
    """README.md:118-127 crash matrix row 2: publish fails mid-epoch -> the
    query fails, a restart replays the SAME epoch, and the sink stays
    effectively-once (epoch-keyed idempotent write + msg-id dedup). Runs in
    both ordering modes: reference-faithful total order and the parallel
    per-key-ordered mode."""
    from mongodb_nats_connector_spark.streaming.sink import JetStreamLikeSink

    feed = str(tmp_path / "feed")
    n = write_change_event_feed(
        spark, feed, n_docs=10, with_noise_tail=False, with_duplicates=False
    )

    class FlakySink(JetStreamLikeSink):
        def __init__(self, *a, fail_marker: str, **kw):
            super().__init__(*a, **kw)
            self.fail_marker = fail_marker

        def publish_batch(self, batch, epoch_id):
            super().publish_batch(batch, epoch_id)  # publish happened ...
            import os
            if not os.path.exists(self.fail_marker):
                open(self.fail_marker, "w").close()
                raise RuntimeError("injected NATS publish failure")  # ... then die

    marker = str(tmp_path / "failed_once")
    sink = FlakySink(
        spark,
        stream_dir=str(tmp_path / "sink/streams/COLL1"),
        stream_name="COLL1",
        fail_marker=marker,
        order_within_key=order_within_key,
    )
    sink.add_stream()
    checkpoint = str(tmp_path / "sink/checkpoints/c1")

    from mongodb_nats_connector_spark.sources.change_events import (
        read_change_event_stream,
    )
    from mongodb_nats_connector_spark.streaming.pipeline import (
        transform_change_events,
    )

    def start():
        return (
            transform_change_events(
                read_change_event_stream(spark, feed), "COLL1",
                keep_document_key=order_within_key,
            )
            .writeStream.outputMode("append")
            .option("checkpointLocation", checkpoint)
            .foreachBatch(sink.publish_batch)
            .start()
        )

    q = start()
    with pytest.raises(Exception):
        q.processAllAvailable()  # injected failure surfaces here
    q.stop()

    q2 = start()  # restart: checkpoint replays the uncommitted epoch
    q2.processAllAvailable()
    q2.stop()

    assert sink.message_count(deduped=True) == n
    if order_within_key:
        msgs = sink.read_messages().orderBy("document_key", "epoch", "seq_in_epoch").collect()
        assert len({m.msg_id for m in msgs}) == n
        per_key: dict = {}
        for m in msgs:
            per_key.setdefault(m.document_key, []).append(m.msg_id)
        for toks in per_key.values():
            assert toks == sorted(toks)
    else:
        ids = [r.msg_id for r in sink.read_messages().orderBy("epoch", "seq_in_epoch").collect()]
        assert ids == sorted(ids) and len(set(ids)) == n


@pytest.mark.parametrize("order_within_key", [False, True])
def test_throughput_floor_100_events(spark, tmp_path, order_within_key):
    """BASELINE.md row 1 (harness.go:284 + base_test.go:30): 100 events must
    flow source->transform->publish end-to-end within the reference's 10 s
    subscribe window (>= 10 events/s sustained), exactly once — in BOTH
    ordering modes: the reference-faithful total order and the parallel
    per-key write path."""
    import time

    feed = str(tmp_path / "feed")
    n = write_change_event_feed(
        spark, feed, n_docs=100, with_noise_tail=False, with_duplicates=False
    )
    cfg = ConnectorConfig(
        collections=[CollectionConfig(db_name="test-connector-db", coll_name="coll1")]
    )
    conn = Connector(
        spark, cfg, {"test-connector-db.coll1": feed},
        sink_root=str(tmp_path / "sink"), order_within_key=order_within_key,
    )
    conn.start()  # startup is covered by the cold-start bound, not this one
    t0 = time.perf_counter()
    conn.process_all_available()
    elapsed = time.perf_counter() - t0
    conn.stop()

    sink = conn.handles[0].sink
    if order_within_key:
        msgs = sink.read_messages().orderBy("document_key", "epoch", "seq_in_epoch").collect()
        ids = [m.msg_id for m in msgs]
        assert len(ids) == n and len(set(ids)) == n
        per_key: dict = {}
        for m in msgs:
            per_key.setdefault(m.document_key, []).append(m.msg_id)
        for toks in per_key.values():
            assert toks == sorted(toks)
    else:
        ids = [r.msg_id for r in sink.read_messages().orderBy("epoch", "seq_in_epoch").collect()]
        assert len(ids) == n and ids == sorted(ids)
    assert elapsed < 10.0, f"100 events took {elapsed:.1f}s (floor is 10s)"
