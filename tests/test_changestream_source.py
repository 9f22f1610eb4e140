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
