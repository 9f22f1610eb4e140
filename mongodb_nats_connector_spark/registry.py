"""Central query registry.

Every implemented operator registers a named query here; ``__spark_entry__``
exposes the registry to the driver. A query is a callable
``(SparkSession, sf_dir) -> DataFrame`` plus (when SQL-expressible) a DuckDB
oracle SQL string over the same parquet tables. Column names are aliased
identically on both sides — the driver's comparator sorts columns by name
before hashing values.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class RegisteredQuery:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL; None => rows-only check (non-SQL op)
    doc: str = ""


_REGISTRY: dict[str, RegisteredQuery] = {}


def register(name: str, oracle: str | None = None, doc: str = ""):
    """Decorator: register a query (and optionally its DuckDB oracle)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = RegisteredQuery(name, fn, oracle, doc or (fn.__doc__ or ""))
        return fn

    return deco


def _load_all() -> None:
    """Import every operator module for its registration side effects."""
    from mongodb_nats_connector_spark.operators import (  # noqa: F401
        cdc,
        dedup,
        formats,
        multimodal,
        relational,
        similarity,
        text,
        udfs,
        windows_batch,
    )


def all_queries() -> dict[str, RegisteredQuery]:
    _load_all()
    return dict(_REGISTRY)


def queries() -> dict[str, QueryFn]:
    return {n: q.fn for n, q in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    return {n: q.oracle for n, q in all_queries().items() if q.oracle is not None}
