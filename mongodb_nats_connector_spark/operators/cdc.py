"""CDC operator surface — the reference connector's semantics, batch-checkable.

The reference pipeline (internal/mongo/client.go:177-266) is: change-event
scan -> op-type filter (client.go:33-38,231-237) -> subject derivation
`<STREAM>.<operationType>` (client.go:239) -> serialize (client.go:222) ->
publish keyed by resume token (internal/nats/client.go:124) -> offset commit
(client.go:248-254).

These queries express each step over the driver's `events` table, treating
`event_id` as the resume token and `event_type` as the operation type, so the
DuckDB oracle can check them. The true streaming pipeline (same operators on
an unbounded stream + checkpointing) lives in streaming/pipeline.py and is
exercised by tests/test_cdc_pipeline.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from mongodb_nats_connector_spark.registry import register
from mongodb_nats_connector_spark.sources.tables import table

# events stand-in for publishable op types: 4 of the 5 event_types are
# "publishable", `error` plays the role of drop/rename/invalidate (filtered
# out, never published — drop_test.go:32-42).
PUBLISHABLE_EVENT_TYPES = ("click", "purchase", "signup", "view")
STREAM_NAME = "EVENTS"  # default stream naming: UPPER(coll) (connector.go:337)


@register(
    "cdc_filter_publishable",
    oracle="""
    SELECT event_id, event_type, ts, user_id
    FROM events
    WHERE event_type IN ('click', 'purchase', 'signup', 'view')
    """,
    doc="O5 op-type filter: set-membership predicate, pushed to the scan "
    "(internal/mongo/client.go:33-38,231-237).",
)
def cdc_filter_publishable(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "events")
        .filter(F.col("event_type").isin(*PUBLISHABLE_EVENT_TYPES))
        .select("event_id", "event_type", "ts", "user_id")
    )


@register(
    "cdc_subject_route",
    oracle="""
    SELECT 'EVENTS' || '.' || event_type AS subject, count(*) AS n_messages
    FROM events
    WHERE event_type IN ('click', 'purchase', 'signup', 'view')
    GROUP BY subject
    """,
    doc="O8 computed routing column: subject = stream || '.' || opType "
    "(internal/mongo/client.go:239), aggregated per subject.",
)
def cdc_subject_route(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "events")
        .filter(F.col("event_type").isin(*PUBLISHABLE_EVENT_TYPES))
        .withColumn("subject", F.concat(F.lit(STREAM_NAME), F.lit("."), F.col("event_type")))
        .groupBy("subject")
        .agg(F.count(F.lit(1)).alias("n_messages"))
    )


@register(
    "cdc_dedup_by_key",
    oracle="""
    SELECT user_id, event_type, event_id AS first_event_id, ts AS first_ts
    FROM (
      SELECT user_id, event_type, event_id, ts,
             row_number() OVER (PARTITION BY user_id, event_type
                                ORDER BY ts, event_id) AS rn
      FROM events WHERE ts IS NOT NULL
    ) WHERE rn = 1
    """,
    doc="O9/Nats-Msg-Id dedup generalized: keep the first event per key — "
    "deterministic dropDuplicates via row_number (the consumer-side dedup "
    "the reference delegates to NATS, internal/nats/client.go:124). NULL "
    "event times are filtered on both engines: Spark orders NULLs first, "
    "DuckDB last, which would flip which event counts as 'first'.",
)
def cdc_dedup_by_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            "event_type",
            F.col("event_id").alias("first_event_id"),
            F.col("ts").alias("first_ts"),
        )
    )


@register(
    "cdc_latest_offset",
    oracle="""
    SELECT event_id AS resume_token, ts AS token_ts
    FROM events ORDER BY event_id DESC LIMIT 1
    """,
    doc="O2 offset recovery: newest stored token via sort-desc + limit 1 "
    "(internal/mongo/client.go:186-199). Spark plans TakeOrderedAndProject — "
    "no global sort.",
)
def cdc_latest_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "events")
        .orderBy(F.desc("event_id"))
        .limit(1)
        .select(F.col("event_id").alias("resume_token"), F.col("ts").alias("token_ts"))
    )


@register(
    "cdc_serialize_envelope",
    oracle="""
    SELECT event_id AS msg_id,
           'EVENTS' || '.' || event_type AS subject,
           '{"event_id":' || CAST(event_id AS VARCHAR)
             || ',"event_type":"' || event_type
             || '","user_id":' || CAST(user_id AS VARCHAR) || '}' AS data
    FROM events
    WHERE event_type IN ('click', 'purchase', 'signup', 'view')
    """,
    doc="O7 serialization transform: envelope -> JSON message body with "
    "subject + idempotency key (internal/mongo/client.go:222-239). Built by "
    "deterministic concat so the oracle is byte-identical; to_json round-trip "
    "fidelity is covered in tests/test_cdc_pipeline.py.",
)
def cdc_serialize_envelope(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").filter(
        F.col("event_type").isin(*PUBLISHABLE_EVENT_TYPES)
    )
    data = F.concat(
        F.lit('{"event_id":'),
        F.col("event_id").cast("string"),
        F.lit(',"event_type":"'),
        F.col("event_type"),
        F.lit('","user_id":'),
        F.col("user_id").cast("string"),
        F.lit("}"),
    )
    return ev.select(
        F.col("event_id").alias("msg_id"),
        F.concat(F.lit(STREAM_NAME), F.lit("."), F.col("event_type")).alias("subject"),
        data.alias("data"),
    )


@register(
    "cdc_apply_latest",
    oracle="""
    SELECT user_id, event_type AS last_event_type, value AS last_value, ts AS last_ts
    FROM (
      SELECT user_id, event_type, value, ts,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ) WHERE rn = 1
    """,
    doc="CDC state materialization (MERGE INTO emulation): replay the ordered "
    "event log and keep the newest row per key — the batch form of applying "
    "a change stream to a table. One shuffle on the key; at scale this is "
    "the standard upsert-compaction pattern (no Delta required).",
)
def cdc_apply_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    return latest_state_per_key(ev)


def latest_state_per_key(ev: DataFrame) -> DataFrame:
    """Newest row per user_id (ts DESC, event_id DESC tiebreak) projected to
    the materialized-state schema. The upsert-compaction core shared by
    ``cdc_apply_latest`` (full log) and ``cdc_apply_asof`` (log pre-filtered
    to a snapshot ts): one shuffle on the key; Catalyst rewrites the
    rank-1 filter to WindowGroupLimit so each map task keeps one candidate
    row per key before shuffling."""
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("event_type").alias("last_event_type"),
            F.col("value").alias("last_value"),
            F.col("ts").alias("last_ts"),
        )
    )


@register(
    "cdc_payload_variant",
    oracle="""
    SELECT event_type,
           count(*) AS n,
           CAST(sum(CAST(props->>'$.k' AS INT)) AS BIGINT) AS sum_k,
           CAST(max(CAST(props->>'$.k' AS INT)) AS INT)    AS max_k
    FROM events GROUP BY event_type
    """,
    doc="Schemaless payload via Spark 4 VariantType: parse_json the opaque "
    "props blob once into a variant column, then typed variant_get "
    "extraction — the engine-native way to carry the reference's "
    "schemaless fullDocument (internal/mongo/client.go:222, SURVEY.md "
    "§1.2) without committing to a schema at ingest. Unlike per-query "
    "get_json_object, the variant encodes once and every later extraction "
    "is a binary field read — the 100 TB answer to JSON-heavy scans.",
)
def cdc_payload_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    v = ev.withColumn("pv", F.parse_json("props"))
    return v.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.variant_get("pv", "$.k", "int")).cast("bigint").alias("sum_k"),
        F.max(F.variant_get("pv", "$.k", "int")).alias("max_k"),
    )
