"""Custom streaming source via the Python Data Source API (Spark 4).

The reference's O1 is a MongoDB change-stream cursor
(`watchedColl.Watch(...)`, internal/mongo/client.go:177-266). This data
source plays that role natively in Spark: `format("mongo_changestream")`
yields the change-event envelope as an unbounded stream with proper
offset/commit semantics (initialOffset/latestOffset/read/commit), so the
checkpoint gives resume-after-crash exactly like the reference's stored
resume token (O2/O3) — but managed by the engine.

It also implements the pushdown the reference *missed* (SURVEY.md §4.1): the
reference filters op types client-side while passing an EMPTY `$match`
pipeline to the server (client.go:211 vs :231-237). Here the
`operationTypes` option filters inside the source — the analogue of pushing
`$match: {operationType: {$in: [...]}}` into the change stream — so dropped
events never enter the DataFrame at all.

Against a real MongoDB this reader would hold a cursor per partition; the
offset model (monotonic event sequence = resume token) is identical. The
demo implementation synthesizes the deterministic fixture feed
(sources/change_events.py) capped at `maxEvents`.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)

from mongodb_nats_connector_spark.sources.change_events import (
    generate_change_event_rows,
)

FORMAT_NAME = "mongo_changestream"

_SCHEMA_DDL = (
    "_id_data STRING, operation_type STRING, cluster_time TIMESTAMP, "
    "wall_time TIMESTAMP, full_document STRING, "
    "full_document_before_change STRING, ns_db STRING, ns_coll STRING, "
    "document_key_id STRING"
)


@dataclass
class _Range(InputPartition):
    start: int
    end: int


class ChangeStreamReader(DataSourceStreamReader):
    def __init__(self, options: dict) -> None:
        self.n_docs = int(options.get("ndocs", 25))
        self.batch_size = int(options.get("batchsize", 40))
        ops = options.get("operationtypes", "")
        self.op_filter = {o.strip() for o in ops.split(",") if o.strip()}
        # Optional live-cursor simulation: a file holding the count of events
        # the "server" has produced so far. latestOffset tracks it, so the
        # stream grows over time and a killed/restarted query resumes from
        # the checkpointed sequence — the restart_connector_test.go scenario
        # on the DataSource offset path. The count is monotonic by contract
        # (a change stream never un-produces events).
        self.feed_state = options.get("feedstate")
        # the full deterministic feed, materialized once per reader; a real
        # implementation would hold the Mongo cursor here instead
        self.rows = generate_change_event_rows(
            n_docs=self.n_docs, with_noise_tail=True, with_duplicates=False
        )
        self.max_events = len(self.rows)
        # last offset successfully read from feed_state: latestOffset must be
        # monotonic (a change stream never un-produces events), so a transient
        # read failure reports this instead of regressing to 0 — which would
        # make the engine replan from seq 0 and republish the whole feed
        self._last_seen_seq = 0

    # -- offset protocol: offsets are event sequence numbers (the resume
    #    token analogue, client.go:219) --
    def initialOffset(self) -> dict:  # noqa: N802 (Spark API name)
        return {"seq": 0}

    def latestOffset(self) -> dict:  # noqa: N802
        if self.feed_state:
            try:
                with open(self.feed_state) as f:
                    produced = int(f.read().strip() or 0)
            except (OSError, ValueError):
                produced = self._last_seen_seq
            seq = min(max(produced, self._last_seen_seq), self.max_events)
            self._last_seen_seq = seq
            return {"seq": seq}
        return {"seq": self.max_events}

    def partitions(self, start: dict, end: dict) -> list[InputPartition]:
        lo, hi = start["seq"], end["seq"]
        parts = []
        for s in range(lo, hi, self.batch_size):
            parts.append(_Range(s, min(s + self.batch_size, hi)))
        return parts or [_Range(lo, lo)]

    def read(self, partition: _Range):
        for row in self.rows[partition.start : partition.end]:
            # operationTypes pushdown: filter AT THE SOURCE (the $match the
            # reference never sent server-side)
            if self.op_filter and row[1] not in self.op_filter:
                continue
            yield row

    def commit(self, end: dict) -> None:
        # checkpoint has durably recorded `end` — the O10 token commit;
        # a real source would release server resources up to this point
        pass


class ChangeStreamDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return FORMAT_NAME

    def schema(self) -> str:
        return _SCHEMA_DDL

    def streamReader(self, schema) -> ChangeStreamReader:  # noqa: N802
        return ChangeStreamReader({k.lower(): v for k, v in self.options.items()})


def register_changestream_source(spark) -> None:
    """Idempotently register format('mongo_changestream') on this session."""
    spark.dataSource.register(ChangeStreamDataSource)
