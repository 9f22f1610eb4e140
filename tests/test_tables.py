"""Table loader behavior: the events nanos read must not leak session conf."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.types import TimestampType

from mongodb_nats_connector_spark.sources.tables import table

SF = "/root/testdata/sf0.001"


def test_events_nanos_conf_scoped_to_read(spark):
    """table() scopes spark.sql.legacy.parquet.nanosAsLong to the events
    read: the session value is restored immediately, so a concurrent reader
    of a DIFFERENT nanos table keeps its own semantics — and the events
    DataFrame still executes correctly afterwards."""
    key = "spark.sql.legacy.parquet.nanosAsLong"
    before = spark.conf.get(key)
    ev = table(spark, SF, "events")
    assert spark.conf.get(key) == before, "conf leaked past the events read"
    # the captured schema (not the live conf) drives execution
    assert isinstance(ev.schema["ts"].dataType, TimestampType)
    rows = ev.select("event_id", "ts").orderBy("event_id").limit(3).collect()
    assert len(rows) == 3 and rows[0].ts is not None

    # interleaved reads of other tables in the same session are unaffected
    li = table(spark, SF, "lineitem")
    assert li.filter(F.col("l_quantity") > 0).count() > 0
    assert spark.conf.get(key) == before
