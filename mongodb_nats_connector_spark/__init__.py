"""mongodb_nats_connector_spark — a PySpark-native analytics engine with the
capabilities of damianiandrea/mongodb-nats-connector (reference snapshot at
/root/reference/, read-only).

The reference is a Go CDC connector: MongoDB change streams -> filter to four
operation types -> Extended-JSON serialize -> subject-routed publish to NATS
JetStream with resume-token idempotency (see SURVEY.md). This package
re-expresses that pipeline on Structured Streaming and adds the declared batch
relational + LLM-data-pipeline operator surface (SURVEY.md §2.3), all
DataFrame-first so Catalyst/Tungsten own the physical plan.

Layout:
  session       SparkSession factory (AQE, UTC, Arrow, local tuning)
  config        pipeline config + validation (port of pkg/connector options)
  registry      query registry powering __spark_entry__.queries()/oracle_sql()
  sources/      parquet table loaders, change-event fixtures, stream replay
  operators/    batch relational, CDC, windowed, dedup, similarity, text ops
  functions/    ExtJSON helpers, vector math, deterministic text hashing
  streaming/    the CDC pipeline: source -> transform -> idempotent sink
  plans/        plan-inspection helpers (pushdown / broadcast assertions)
"""

__version__ = "0.1.0"

from mongodb_nats_connector_spark.session import get_spark  # noqa: F401
