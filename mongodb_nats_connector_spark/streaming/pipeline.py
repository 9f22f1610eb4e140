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


def transform_change_events(events: DataFrame, stream_name: str) -> DataFrame:
    """O4-O8: the whole per-event transform as one narrow projection.

    Filter to publishable op types (O5; drop/rename/invalidate silently
    dropped like client.go:231-237), derive the routing subject (O8), and
    serialize the envelope to relaxed ExtJSON (O7). No shuffle — this is a
    map-only stage at any scale.
    """
    return (
        events.filter(F.col("operation_type").isin(*PUBLISHABLE_OPERATION_TYPES))
        .select(
            F.col("_id_data").alias("msg_id"),  # Nats-Msg-Id (nats/client.go:124)
            F.concat(
                F.lit(stream_name), F.lit("."), F.col("operation_type")
            ).alias("subject"),
            envelope_to_extjson().alias("data"),
            F.col("cluster_time"),
        )
    )


def detect_invalidate(events: DataFrame) -> DataFrame:
    """O6: invalidate markers terminate the stream (client.go:232-235)."""
    return events.filter(F.col("operation_type") == INVALIDATE_OPERATION_TYPE)


@dataclass
class PipelineHandle:
    config: CollectionConfig
    query: StreamingQuery
    sink: JetStreamLikeSink


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
    ) -> None:
        """``source_paths`` maps '<db>.<coll>' -> change-event feed dir (the
        file-backed stand-in for a Mongo change stream; a real Mongo source
        would plug in via the Python Data Source API with the same schema)."""
        self.spark = spark
        self.config = config
        self.source_paths = source_paths
        self.sink_root = sink_root
        self.handles: list[PipelineHandle] = []

    def start(self) -> list[PipelineHandle]:
        for coll in self.config.collections:
            key = f"{coll.db_name}.{coll.coll_name}"
            if key not in self.source_paths:
                raise KeyError(f"no source feed for {key}")
            sink = JetStreamLikeSink(
                self.spark,
                stream_dir=f"{self.sink_root}/streams/{coll.stream_name}",
                stream_name=coll.stream_name,
            )
            sink.add_stream()  # DDL bootstrap, idempotent (O13)
            events = read_change_event_stream(self.spark, self.source_paths[key])
            out = transform_change_events(events, coll.stream_name)
            checkpoint = f"{self.sink_root}/checkpoints/{coll.checkpoint_name}"
            query = (
                out.writeStream.outputMode("append")
                .option("checkpointLocation", checkpoint)
                .foreachBatch(sink.publish_batch)
                .queryName(f"cdc-{coll.stream_name}")
                .start()
            )
            self.handles.append(PipelineHandle(coll, query, sink))
        return self.handles

    def process_all_available(self) -> None:
        for h in self.handles:
            h.query.processAllAvailable()

    def await_any_termination(self, timeout: float | None = None):
        return self.spark.streams.awaitAnyTermination(timeout)

    def stop(self) -> None:
        for h in self.handles:
            if h.query.isActive:
                h.query.stop()

    # -- observability (O15): /healthz response shape,
    #    internal/server/health.go:31-45 --
    def health(self) -> dict:
        components = []
        for h in self.handles:
            up = h.query.isActive and h.query.exception() is None
            components.append(
                {"name": f"pipeline-{h.config.stream_name}", "status": "UP" if up else "DOWN"}
            )
        status = "UP" if components and all(c["status"] == "UP" for c in components) else "DOWN"
        return {"status": status, "components": components}
