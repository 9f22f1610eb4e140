"""Materialized current-state table: the 'apply changes' half of CDC.

The reference connector stops at publishing change events; its consumers
typically maintain a materialized view of the collection (the same compaction
`operators/cdc.py:cdc_apply_latest` performs in batch). This sink maintains
that view INCREMENTALLY from the change stream: upsert insert/update/replace,
remove delete, last-writer-wins by resume token within an epoch.

Scale design — this is a Delta/Iceberg MERGE re-expressed on plain parquet:

- The table is hash-bucketed on the document key (`bucket=pmod(xxhash64(key),
  n_buckets)` partition column). An epoch rewrites ONLY the buckets its keys
  touch: the read is partition-pruned to those buckets and the write uses
  dynamic partition overwrite, so epoch cost scales with the CHANGED key
  range, not the table size. At 100 TB, n_buckets grows to thousands and the
  same plan holds; swapping the storage layer for Delta's MERGE keeps every
  caller identical.
- Idempotent replay: the merge is last-writer-wins by key, so re-applying an
  epoch to a partially-updated table converges to the same state (set/delete
  operations are idempotent; nothing increments). A crash between partition
  writes is healed by the checkpoint replaying the epoch.
- Requires a driver+executor-shared filesystem like every parquet sink here.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from mongodb_nats_connector_spark.config import PUBLISHABLE_OPERATION_TYPES
from mongodb_nats_connector_spark.plans.hints import maybe_broadcast

STATE_COLUMNS = ("document_key_id", "full_document", "_id_data", "bucket")


class MaterializedTableSink:
    def __init__(self, spark: SparkSession, table_dir: str, n_buckets: int = 16) -> None:
        self.spark = spark
        self.table_dir = table_dir
        self.n_buckets = n_buckets

    def _bucket(self, key_col):
        return F.pmod(F.xxhash64(key_col), F.lit(self.n_buckets)).cast("int")

    def current(self) -> DataFrame:
        """The materialized collection state (empty before the first epoch)."""
        if not os.path.isdir(self.table_dir) or not any(
            e.startswith("bucket=") for e in os.listdir(self.table_dir)
        ):
            return self.spark.createDataFrame(
                [],
                "document_key_id string, full_document string, _id_data string, bucket int",
            )
        return self.spark.read.option("basePath", self.table_dir).parquet(
            os.path.join(self.table_dir, "bucket=*")
        )

    # foreachBatch body: apply one epoch of change events
    def apply_batch(self, batch: DataFrame, epoch_id: int) -> None:
        if batch.isEmpty():
            return
        # last event per key within the epoch, by resume token order
        w = Window.partitionBy("document_key_id").orderBy(F.desc("_id_data"))
        latest = (
            batch.filter(F.col("operation_type").isin(*PUBLISHABLE_OPERATION_TYPES))
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select(
                "document_key_id",
                "operation_type",
                "full_document",
                "_id_data",
                self._bucket(F.col("document_key_id")).alias("bucket"),
            )
        )
        if latest.isEmpty():
            return
        touched = [r["bucket"] for r in latest.select("bucket").distinct().collect()]
        # partition-pruned read of ONLY the touched buckets; keep rows whose
        # key is not superseded in this epoch (latest is epoch-sized: size-gated broadcast)
        cur = self.current().filter(F.col("bucket").isin(touched))
        keep = cur.join(
            maybe_broadcast(latest.select("document_key_id")), "document_key_id", "left_anti"
        )
        upserts = latest.filter(F.col("operation_type") != "delete").select(
            "document_key_id", "full_document", "_id_data", "bucket"
        )
        out = keep.select(*STATE_COLUMNS).unionByName(upserts)
        # Write the merged epoch to a STAGING dir, then swap bucket dirs in.
        # Writing straight over the table would put the files being replaced
        # in the write's own lineage: if a cached block were lost mid-write,
        # Spark would recompute the plan against already-overwritten files
        # and corrupt the epoch. The staged write is the only Spark job that
        # reads the current table; the swap is pure directory renames.
        # (A production deployment uses Delta/Iceberg MERGE — same shape.)
        staging = self.table_dir.rstrip("/") + f".staging-{epoch_id}"
        shutil.rmtree(staging, ignore_errors=True)
        (
            out.repartition("bucket")
            .write.partitionBy("bucket")
            .mode("overwrite")
            .parquet(staging)
        )
        # swap: every touched bucket is replaced by its staged dir; a bucket
        # with no staged dir was emptied by deletes and its dir is removed.
        # Crash mid-swap is healed by checkpoint replay — the merge is
        # last-writer-wins by key, so re-applying the epoch to a partially
        # swapped table converges.
        os.makedirs(self.table_dir, exist_ok=True)
        for b in set(touched):
            src = os.path.join(staging, f"bucket={b}")
            dst = os.path.join(self.table_dir, f"bucket={b}")
            shutil.rmtree(dst, ignore_errors=True)
            if os.path.isdir(src):
                os.replace(src, dst)
        shutil.rmtree(staging, ignore_errors=True)
