"""The CDC streaming pipeline — the reference connector, Spark-first.

Reference dataflow (SURVEY.md §2.1, internal/mongo/client.go:177-266):

  change-stream scan (O1) -> offset recovery/resume (O2/O3, cursor token)
  -> extract token + op type (O4) -> filter publishable ops (O5)
  -> invalidate handling (O6) -> ExtJSON serialize (O7)
  -> subject = <STREAM>.<opType> (O8)
  -> publish with Nats-Msg-Id = token (O9) -> commit token (O10)

Spark mapping: Structured Streaming owns O1/O2/O3/O10 via the checkpoint
(offset + commit logs — the whole resume-token subsystem disappears), O4-O8
are column expressions, and O9 is a `foreachBatch` idempotent sink
(streaming/sink.py). Delivery semantics match the reference's crash matrix
(README.md:118-127): at-least-once publish + msg-id dedup = effectively once.

Ordering: the reference is strictly ordered per collection because its loop
is single-threaded (client.go:217-257). Here each micro-batch is sorted by
resume token and written atomically per epoch; batch N+1 only commits after
N (epoch serialization) — the same per-collection total order with batch
granularity.
"""

from __future__ import annotations

import threading
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from mongodb_nats_connector_spark.config import (
    INVALIDATE_OPERATION_TYPE,
    PUBLISHABLE_OPERATION_TYPES,
    CollectionConfig,
    ConnectorConfig,
)
from mongodb_nats_connector_spark.functions.extjson import envelope_to_extjson
from mongodb_nats_connector_spark.sources.change_events import read_change_event_stream
from mongodb_nats_connector_spark.streaming.sink import JetStreamLikeSink


def transform_change_events(
    events: DataFrame, stream_name: str, keep_document_key: bool = False
) -> DataFrame:
    """O4-O8: the whole per-event transform as one narrow projection.

    Filter to publishable op types (O5; drop/rename/invalidate silently
    dropped like client.go:231-237), derive the routing subject (O8), and
    serialize the envelope to relaxed ExtJSON (O7). No shuffle — this is a
    map-only stage at any scale. ``keep_document_key`` carries the document
    key through for the sink's per-key-ordered mode.
    """
    cols = [
        F.col("_id_data").alias("msg_id"),  # Nats-Msg-Id (nats/client.go:124)
        F.concat(
            F.lit(stream_name), F.lit("."), F.col("operation_type")
        ).alias("subject"),
        envelope_to_extjson().alias("data"),
        F.col("cluster_time"),
    ]
    if keep_document_key:
        cols.append(F.col("document_key_id").alias("document_key"))
    return events.filter(
        F.col("operation_type").isin(*PUBLISHABLE_OPERATION_TYPES)
    ).select(*cols)


def detect_invalidate(events: DataFrame) -> DataFrame:
    """O6: invalidate markers terminate the stream (client.go:232-235)."""
    return events.filter(F.col("operation_type") == INVALIDATE_OPERATION_TYPE)


@dataclass
class PipelineHandle:
    config: CollectionConfig
    query: StreamingQuery
    sink: JetStreamLikeSink
    # set by the batch handler when an invalidate marker is observed; the
    # query is then stopped gracefully (reference client.go:232-235 returns
    # from the watch loop without error — the connector stays alive)
    lifecycle: dict = field(default_factory=dict)

    @property
    def invalidated(self) -> bool:
        return bool(self.lifecycle.get("invalidated"))


def _stop_after_epoch(query: StreamingQuery, timeout: float = 30.0) -> None:
    """Stop a StreamingQuery once its in-flight trigger (if any) finishes.

    Runs on a helper thread: stop() from inside foreachBatch would interrupt
    the very epoch that carried the invalidate marker before its commit.
    Waiting for the trigger to go idle lets the final publishable events of
    that epoch commit; if the wait races the next trigger, the epoch-keyed
    idempotent sink makes the replay harmless.
    """
    deadline = time.monotonic() + timeout
    while time.monotonic() < deadline:
        try:
            if not query.isActive:
                return
            if not query.status.get("isTriggerActive", False):
                break
        except Exception:
            break
        time.sleep(0.1)
    try:
        query.stop()
    except Exception:
        pass  # already terminated


class Connector:
    """Pipeline fan-out + lifecycle (O14): one StreamingQuery per watched
    collection, mirroring pkg/connector/connector.go:125-186 (goroutine per
    collection under errgroup -> concurrent StreamingQueries under one
    SparkSession; awaitAnyTermination ≡ errgroup semantics)."""

    def __init__(
        self,
        spark: SparkSession,
        config: ConnectorConfig,
        source_paths: dict[str, str],
        sink_root: str,
        order_within_key: bool = False,
        metrics=None,
    ) -> None:
        """``source_paths`` maps '<db>.<coll>' -> change-event feed dir (the
        file-backed stand-in for a Mongo change stream; a real Mongo source
        would plug in via the Python Data Source API with the same schema).
        ``order_within_key`` selects the sink's parallel per-document-order
        mode over the reference-faithful total order (see JetStreamLikeSink).
        """
        self.spark = spark
        self.config = config
        self.source_paths = source_paths
        self.sink_root = sink_root
        self.order_within_key = order_within_key
        self.metrics = metrics  # optional MetricsRegistry for NATS counters
        self.handles: list[PipelineHandle] = []

    def _batch_handler(self, sink: JetStreamLikeSink, stream_name: str, lifecycle: dict):
        """foreachBatch body: publish the batch's publishable events, then —
        O6 — if the batch carries an invalidate marker, flag the pipeline and
        stop its query after the epoch (client.go:232-235: the reference
        stops resuming the dropped collection; siblings keep running)."""

        def handle(batch: DataFrame, epoch_id: int) -> None:
            out = transform_change_events(
                batch, stream_name, keep_document_key=self.order_within_key
            )
            sink.publish_batch(out, epoch_id)
            if not detect_invalidate(batch).isEmpty():
                lifecycle["invalidated"] = True
                query = lifecycle.get("query")
                if query is not None:
                    threading.Thread(
                        target=_stop_after_epoch, args=(query,), daemon=True
                    ).start()

        return handle

    def start(self) -> list[PipelineHandle]:
        for coll in self.config.collections:
            key = f"{coll.db_name}.{coll.coll_name}"
            if key not in self.source_paths:
                raise KeyError(f"no source feed for {key}")
            sink = JetStreamLikeSink(
                self.spark,
                stream_dir=f"{self.sink_root}/streams/{coll.stream_name}",
                stream_name=coll.stream_name,
                order_within_key=self.order_within_key,
                metrics=self.metrics,
            )
            sink.add_stream()  # DDL bootstrap, idempotent (O13)
            events = read_change_event_stream(self.spark, self.source_paths[key])
            checkpoint = f"{self.sink_root}/checkpoints/{coll.checkpoint_name}"
            lifecycle: dict = {}
            query = (
                events.writeStream.outputMode("append")
                .option("checkpointLocation", checkpoint)
                .foreachBatch(self._batch_handler(sink, coll.stream_name, lifecycle))
                .queryName(f"cdc-{coll.stream_name}")
                .start()
            )
            lifecycle["query"] = query
            if lifecycle.get("invalidated"):
                # the first trigger raced us and already saw the invalidate
                threading.Thread(
                    target=_stop_after_epoch, args=(query,), daemon=True
                ).start()
            self.handles.append(PipelineHandle(coll, query, sink, lifecycle))
        return self.handles

    def process_all_available(self) -> None:
        for h in self.handles:
            try:
                h.query.processAllAvailable()
            except Exception:
                # a query stopped mid-wait by the invalidate handler is a
                # graceful completion, not a failure
                if not h.invalidated:
                    raise

    def await_any_termination(self, timeout: float | None = None):
        terminated = self.spark.streams.awaitAnyTermination(timeout)
        if terminated and any(h.query.isActive for h in self.handles):
            # One terminated handle (e.g. an invalidated collection) would
            # otherwise make every later call return immediately and the
            # serve loop busy-spin at full CPU while siblings keep running:
            # clear the manager's terminated set so the next wait blocks.
            # A query that failed with an exception has already raised out
            # of awaitAnyTermination above, before the reset.
            self.spark.streams.resetTerminated()
        return terminated

    def stop(self) -> None:
        for h in self.handles:
            if h.query.isActive:
                h.query.stop()

    # -- observability (O15): /healthz response shape,
    #    internal/server/health.go:31-45 --
    def health(self) -> dict:
        components = []
        for h in self.handles:
            if h.invalidated and not h.query.isActive:
                # graceful completion after a collection drop/rename: the
                # reference's watch loop returns nil on invalidate and the
                # connector keeps serving (client.go:232-235, drop_test.go)
                status = "COMPLETED"
            elif h.query.isActive and h.query.exception() is None:
                status = "UP"
            else:
                status = "DOWN"
            components.append(
                {"name": f"pipeline-{h.config.stream_name}", "status": status}
            )
        status = (
            "UP"
            if components and all(c["status"] in ("UP", "COMPLETED") for c in components)
            else "DOWN"
        )
        return {"status": status, "components": components}
