"""Materialized current-state table: incremental CDC apply (upsert/delete),
bucketed partition-pruned rewrites, idempotent epoch replay."""

from __future__ import annotations

import datetime as dt
import os

from pyspark.sql import functions as F

from mongodb_nats_connector_spark.functions.extjson import CHANGE_EVENT_SCHEMA
from mongodb_nats_connector_spark.streaming.materialized import MaterializedTableSink

_TS = dt.datetime(2024, 3, 1)


def _ev(seq: int, op: str, key: str, doc: str | None):
    return (f"82{seq:022x}", op, _TS, _TS, doc, None, "db1", "coll1", key)


def _events(spark, rows):
    return spark.createDataFrame(rows, CHANGE_EVENT_SCHEMA)


def _state(sink):
    return {
        r.document_key_id: r.full_document
        for r in sink.current().select("document_key_id", "full_document").collect()
    }


def test_apply_upserts_and_deletes_one_epoch(spark, tmp_path):
    sink = MaterializedTableSink(spark, str(tmp_path / "table"))
    batch = _events(
        spark,
        [
            _ev(0, "insert", "k0", '{"v":"base0"}'),
            _ev(1, "insert", "k1", '{"v":"base1"}'),
            _ev(2, "update", "k1", '{"v":"upd1"}'),
            _ev(3, "insert", "k2", '{"v":"base2"}'),
            _ev(4, "delete", "k2", None),
            _ev(5, "drop", "k0", None),  # non-publishable ops are ignored
        ],
    )
    sink.apply_batch(batch, 0)
    assert _state(sink) == {"k0": '{"v":"base0"}', "k1": '{"v":"upd1"}'}


def test_multi_epoch_apply_and_idempotent_replay(spark, tmp_path):
    sink = MaterializedTableSink(spark, str(tmp_path / "table"))
    e0 = _events(
        spark,
        [_ev(i, "insert", f"k{i}", f'{{"v":{i}}}') for i in range(6)],
    )
    sink.apply_batch(e0, 0)
    assert len(_state(sink)) == 6

    e1 = _events(
        spark,
        [
            _ev(10, "update", "k1", '{"v":"new1"}'),
            _ev(11, "delete", "k2", None),
            _ev(12, "replace", "k3", '{"v":"rep3"}'),
        ],
    )
    sink.apply_batch(e1, 1)
    want = {
        "k0": '{"v":0}',
        "k1": '{"v":"new1"}',
        "k3": '{"v":"rep3"}',
        "k4": '{"v":4}',
        "k5": '{"v":5}',
    }
    assert _state(sink) == want

    # crash-replay of the SAME epoch converges to the same state
    sink.apply_batch(e1, 1)
    assert _state(sink) == want


def test_untouched_buckets_not_rewritten(spark, tmp_path):
    """Epoch cost scales with the touched key range: bucket dirs whose keys
    are absent from the epoch keep their exact files (partition-pruned read +
    dynamic partition overwrite)."""
    table_dir = str(tmp_path / "table")
    sink = MaterializedTableSink(spark, table_dir, n_buckets=8)
    e0 = _events(
        spark, [_ev(i, "insert", f"k{i}", f'{{"v":{i}}}') for i in range(32)]
    )
    sink.apply_batch(e0, 0)

    def files_per_bucket():
        out = {}
        for d in os.listdir(table_dir):
            if d.startswith("bucket="):
                out[d] = sorted(os.listdir(os.path.join(table_dir, d)))
        return out

    before = files_per_bucket()
    assert len(before) > 1, "need multiple buckets for the pruning assertion"

    touched_bucket = sink._bucket(F.lit("k1"))
    b1 = spark.range(1).select(touched_bucket.alias("b")).first()["b"]
    sink.apply_batch(_events(spark, [_ev(100, "update", "k1", '{"v":"X"}')]), 1)
    after = files_per_bucket()
    for d in before:
        if d != f"bucket={b1}":
            assert after[d] == before[d], f"untouched {d} was rewritten"
    assert after[f"bucket={b1}"] != before[f"bucket={b1}"]
    assert _state(sink)["k1"] == '{"v":"X"}'


def test_bucket_emptied_by_deletes_is_cleared(spark, tmp_path):
    sink = MaterializedTableSink(spark, str(tmp_path / "table"), n_buckets=4)
    sink.apply_batch(
        _events(spark, [_ev(0, "insert", "solo", '{"v":1}')]), 0
    )
    assert _state(sink) == {"solo": '{"v":1}'}
    sink.apply_batch(_events(spark, [_ev(1, "delete", "solo", None)]), 1)
    assert _state(sink) == {}


def test_streaming_apply_matches_batch_compaction(spark, tmp_path):
    """Wired as foreachBatch over the change feed, the incremental table
    equals applying the whole feed as one batch (same last-writer-wins)."""
    from mongodb_nats_connector_spark.sources.change_events import (
        generate_change_events,
        write_change_event_feed,
    )
    from mongodb_nats_connector_spark.sources.change_events import (
        read_change_event_stream,
    )

    feed = str(tmp_path / "feed")
    write_change_event_feed(
        spark, feed, n_docs=8, with_noise_tail=False, with_duplicates=False
    )
    sink = MaterializedTableSink(spark, str(tmp_path / "inc"))
    q = (
        read_change_event_stream(spark, feed)
        .writeStream.outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .foreachBatch(sink.apply_batch)
        .start()
    )
    q.processAllAvailable()
    q.stop()

    ref = MaterializedTableSink(spark, str(tmp_path / "one_shot"))
    ref.apply_batch(
        generate_change_events(
            spark, n_docs=8, with_noise_tail=False, with_duplicates=False
        ),
        0,
    )
    assert _state(sink) == _state(ref)  # every doc's cycle ends in delete -> {}
    assert _state(sink) == {}
