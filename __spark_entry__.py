"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (TPC-H-style pricing summary) at
sf0.001. ``queries()`` / ``oracle_sql()`` expose the full operator registry
(mongodb_nats_connector_spark.registry): every implemented operator from
SURVEY.md §2.3 has a named query, and every SQL-expressible one has a DuckDB
oracle with identically-aliased columns.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

SF_SMOKE_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from mongodb_nats_connector_spark.operators.relational import q1_pricing_summary
    from mongodb_nats_connector_spark.session import tune_existing

    tune_existing(spark)
    return q1_pricing_summary(spark, SF_SMOKE_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from mongodb_nats_connector_spark import registry

    return registry.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query; omitted for non-SQL-expressible ops
    (approx sketches, LSH ANN, stubbed multimodal decode) -> rows-only check."""
    from mongodb_nats_connector_spark import registry

    return registry.oracle_sql()
