from mongodb_nats_connector_spark.sources.tables import TABLES, table  # noqa: F401
