"""Custom streaming SINK via the Python Data Source API (Spark 4).

The reference's O9 publishes each event to NATS JetStream with the resume
token as `Nats-Msg-Id` (internal/nats/client.go:120-140), and O10 commits
the token only after a successful publish (internal/mongo/client.go:248-254)
— publish-then-commit, at-least-once, consumer dedup by msg id. This sink
reproduces that protocol as a first-class `format("jetstream_sink")`
streaming writer with a manifest-based epoch commit:

- executors append each partition's messages to uniquely-named JSONL files
  (the "publish"),
- the driver's `commit(batchId)` atomically writes `manifest/epoch-N.json`
  listing exactly the files of that epoch (the "token commit"),
- a replayed epoch (crash between publish and commit — the README.md:118-127
  crash-matrix row) overwrites the manifest; orphaned files from the failed
  attempt are not referenced and therefore never read,
- readers (`read_jetstream_sink`) union the manifested files and drop
  duplicate msg_ids, the consumer-side `Nats-Msg-Id` dedup.

Scale note: data moves executor->disk only; the driver sees file PATHS, not
rows. One manifest write per epoch is the same O(1) driver-side commit that
checkpointing itself performs.

DEPLOYMENT REQUIREMENT — shared filesystem: executors write data files with
local `open()`/`os.makedirs`, and the driver's commit/readers assume those
paths are visible to them. That holds in local mode and whenever `path` is
on a filesystem mounted by driver AND executors (NFS, Lustre, a FUSE-mounted
object store). On a generic cluster with executor-local disks, point `path`
at a shared mount or swap the `open()` calls for an fsspec/Hadoop-FS client
— the protocol (uniquely-named files + manifest commit) is unchanged.

Expected input columns: subject STRING, msg_id STRING, data STRING
(the O8 routing subject, the O2 resume token, the O7 ExtJSON body).
"""

from __future__ import annotations

import json
import os
import uuid
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamWriter,
    WriterCommitMessage,
)

SINK_FORMAT_NAME = "jetstream_sink"


@dataclass
class _FileCommit(WriterCommitMessage):
    path: str
    n: int


class JetStreamStreamWriter(DataSourceStreamWriter):
    def __init__(self, options: dict) -> None:
        self.root = options.get("path")
        if not self.root:
            raise ValueError("jetstream_sink requires .option('path', ...)")

    # -- executor side: the "publish" --
    def write(self, iterator) -> _FileCommit:
        data_dir = os.path.join(self.root, "data")
        os.makedirs(data_dir, exist_ok=True)
        path = os.path.join(data_dir, uuid.uuid4().hex + ".jsonl")
        n = 0
        with open(path, "w") as f:
            for row in iterator:
                f.write(
                    json.dumps(
                        {
                            "subject": row["subject"],
                            "msg_id": row["msg_id"],
                            "data": row["data"],
                        }
                    )
                    + "\n"
                )
                n += 1
        return _FileCommit(path=path, n=n)

    # -- driver side: the epoch "token commit" (atomic rename) --
    def commit(self, messages, batchId) -> None:  # noqa: N803 (Spark API name)
        man_dir = os.path.join(self.root, "manifest")
        os.makedirs(man_dir, exist_ok=True)
        manifest = {
            "epoch": batchId,
            "files": [m.path for m in messages if m is not None],
            "n": sum(m.n for m in messages if m is not None),
        }
        tmp = os.path.join(man_dir, f".epoch-{batchId}.tmp")
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, os.path.join(man_dir, f"epoch-{batchId}.json"))

    def abort(self, messages, batchId) -> None:  # noqa: N803
        for m in messages:
            if m is not None and os.path.exists(m.path):
                os.remove(m.path)


class JetStreamSinkDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return SINK_FORMAT_NAME

    def streamWriter(self, schema, overwrite) -> JetStreamStreamWriter:  # noqa: N802
        return JetStreamSinkDataSource._make_writer(
            {k.lower(): v for k, v in self.options.items()}
        )

    @staticmethod
    def _make_writer(options: dict) -> JetStreamStreamWriter:
        return JetStreamStreamWriter(options)


def register_jetstream_sink(spark: SparkSession) -> None:
    """Idempotently register format('jetstream_sink') on this session."""
    spark.dataSource.register(JetStreamSinkDataSource)


def read_jetstream_sink(spark: SparkSession, root: str) -> DataFrame:
    """Consumer view of the sink: manifested messages, deduped by msg_id
    (the NATS consumer-side `Nats-Msg-Id` dedup window, client.go:124).
    Orphaned data files from aborted/replayed epochs are ignored because
    only manifest-listed files are read."""
    from pyspark.sql import functions as F

    man_dir = os.path.join(root, "manifest")
    by_epoch: dict[int, list[str]] = {}
    if os.path.isdir(man_dir):
        for name in sorted(os.listdir(man_dir)):
            if name.startswith("epoch-") and name.endswith(".json"):
                with open(os.path.join(man_dir, name)) as f:
                    man = json.load(f)
                if man["files"]:
                    by_epoch[man["epoch"]] = man["files"]
    ddl = "subject STRING, msg_id STRING, data STRING"
    if not by_epoch:
        return spark.createDataFrame([], ddl + ", epoch LONG")
    out = None
    for epoch in sorted(by_epoch):
        d = (
            spark.read.schema(ddl)
            .json(by_epoch[epoch])
            .withColumn("epoch", F.lit(epoch).cast("long"))
        )
        out = d if out is None else out.unionByName(d)
    return out.dropDuplicates(["msg_id"])
