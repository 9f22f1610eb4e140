"""Central query registry.

Every implemented operator registers a named query here; ``__spark_entry__``
exposes the registry to the driver. A query is a callable
``(SparkSession, sf_dir) -> DataFrame`` plus (when SQL-expressible) a DuckDB
oracle SQL string over the same parquet tables. Column names are aliased
identically on both sides — the driver's comparator sorts columns by name
before hashing values.
"""

from __future__ import annotations

import hashlib
import inspect
import json
from collections.abc import Callable
from dataclasses import dataclass
from pathlib import Path

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
        analytics2,
        analytics3,
        cdc,
        corpus2,
        embeddings2,
        joins2,
        curation,
        dedup,
        formats,
        graph2,
        mining5,
        multimodal,
        # similarity must import BEFORE pipeline6: pipeline6's embedding-LSH
        # oracle builder imports it at module level, so listing it later
        # would silently register its queries here anyway — the list order
        # now matches the true insertion order the verify window relies on
        similarity,
        pipeline6,
        pipeline6b,
        quality5,
        relational,
        text,
        tpch2,
        udfs,
        windows_batch,
    )
    # pipeline7 then pipeline8 then pipeline9 import LAST (newest module
    # last): brand-new queries must rank behind every already-pending rank-0
    # query so a full driver window never displaces an edited query awaiting
    # re-proof (see all_queries() ordering).
    from mongodb_nats_connector_spark.operators import pipeline7  # noqa: F401
    from mongodb_nats_connector_spark.operators import pipeline8  # noqa: F401
    from mongodb_nats_connector_spark.operators import pipeline9  # noqa: F401
    from mongodb_nats_connector_spark.operators import pipeline10  # noqa: F401
    from mongodb_nats_connector_spark.operators import pipeline11  # noqa: F401
    from mongodb_nats_connector_spark.operators import pipeline12  # noqa: F401
    from mongodb_nats_connector_spark.operators import pipeline13  # noqa: F401
    from mongodb_nats_connector_spark.operators import pipeline14  # noqa: F401
    from mongodb_nats_connector_spark.operators import pipeline15  # noqa: F401
    # Round-12 window: the pipeline16/17/18 bank (13 + 32 + 4 = 49
    # pre-verified queries, three-SF bit-exact before banking) moves into
    # the driver-facing registry this round, filling 49 of the 50 window
    # slots; the 50th is this round's single new in-window query.
    from mongodb_nats_connector_spark.operators import pipeline16  # noqa: F401
    from mongodb_nats_connector_spark.operators import pipeline17  # noqa: F401
    from mongodb_nats_connector_spark.operators import pipeline18  # noqa: F401
    # Round-13 window: the pipeline19 bank (50 pre-verified queries,
    # three-SF bit-exact + identity-pinned in tests/test_round19.py before
    # banking) moves into the driver-facing registry this round — exactly
    # one full driver window.
    from mongodb_nats_connector_spark.operators import pipeline19  # noqa: F401
    # Round-14 window: the pipeline20 bank (50 pre-verified queries,
    # three-SF bit-exact + identity-pinned in tests/test_round19.py before
    # banking) moves into the driver-facing registry this round — exactly
    # one full driver window.
    from mongodb_nats_connector_spark.operators import pipeline20  # noqa: F401


def _load_deferred() -> None:
    """Import the round-15 bank modules (registration side effects).

    The driver proves at most 50 queries per round, so new tranches beyond
    the current window are staged here, OUT of the driver-facing registry,
    until their round's window opens — ``tools/verify_window.py`` flags an
    over-budget window otherwise, and a spilled query sits unproven at
    round end. The bank is still fully linted and unit-tested: registry-wide
    lint tests call ``_load_deferred()`` so plan/determinism discipline is
    enforced from day one, and the per-tranche round test files pin the
    statistics. Round 15: move these imports into ``_load_all`` (bank order
    is registration order).

    Loads the MAIN registry first: registration order is rank-tiebreak
    order, so bank queries must always append AFTER the driver-facing
    surface — a session that imports the parity suite (which calls this
    at module import) before anything touches ``_load_all`` would
    otherwise register the bank at positions 1-50 and push an edited
    mainline query out of the 50-row window (caught by
    test_stale_digest_demotes_verified_name in round 12).
    """
    _load_all()
    # pipeline21 is the ROUND-15 bank: pipeline20 fills round 14's window
    # exactly, so these queue one further round out
    from mongodb_nats_connector_spark.operators import pipeline21  # noqa: F401

    # pipeline22 is the ROUND-16 bank seed (pipeline21 fills round 15's
    # window exactly at 50)
    from mongodb_nats_connector_spark.operators import pipeline22  # noqa: F401


_DIGESTS_FILE = Path(__file__).resolve().parent / "verified_digests.json"


def query_digest(q: RegisteredQuery) -> str:
    """Fingerprint of what the driver actually verified: the oracle SQL plus
    the query function's own source. If either changes, any past green row no
    longer proves the current implementation and the query must re-rank into
    the driver's verification window. (Transitive helpers are deliberately
    not hashed — folding whole modules in would churn the 50-query window on
    every unrelated edit.)"""
    try:
        src = inspect.getsource(q.fn)
    except (OSError, TypeError):
        src = q.fn.__name__
    body = (q.oracle or "") + "\n" + src
    return hashlib.sha256(body.encode()).hexdigest()[:16]


def _verified_digests() -> dict[str, str]:
    """name -> digest recorded when the driver last verified it."""
    try:
        data = json.loads(_DIGESTS_FILE.read_text())
    except (OSError, ValueError):
        return {}
    return {k: v for k, v in data.items() if isinstance(v, str)}


def refresh_verified_digests(artifact: Path) -> dict[str, str]:
    """Record current digests for every name the given (newest) CORRECTNESS
    artifact marked green or rows-only-executed.

    Run this at ROUND START, before editing any operator: the artifact was
    produced against the round-end commit, so the current digest equals the
    digest of what the driver verified. Names verified in older rounds keep
    their previously recorded digests.
    """
    _load_all()
    rows = json.loads(Path(artifact).read_text())
    digests = _verified_digests()
    for name, row in rows.items():
        if not isinstance(row, dict) or name not in _REGISTRY:
            continue
        if row.get("hash_match") is True or row.get("err") == "no_oracle":
            digests[name] = query_digest(_REGISTRY[name])
    _DIGESTS_FILE.write_text(json.dumps(digests, indent=1, sort_keys=True) + "\n")
    return digests


def _driver_verified(root: Path | None = None) -> tuple[set[str], set[str]]:
    """Names already proven by past driver rounds.

    The driver's per-round correctness run covers the first 50 queries in
    ``queries()`` order. To converge on full coverage across rounds, we read
    past ``CORRECTNESS_r*.json`` artifacts and return:

    - ``hash_verified``: names with a green rows+schema+hash row, and
    - ``rows_only_seen``: names the driver executed with ``err: no_oracle``
      (the weaker rows-only record for non-SQL-expressible ops).
    """
    root = root or Path(__file__).resolve().parent.parent
    hash_verified: set[str] = set()
    rows_only_seen: set[str] = set()
    for artifact in sorted(root.glob("CORRECTNESS_r*.json")):
        try:
            rows = json.loads(artifact.read_text())
        except (OSError, ValueError):
            continue
        for name, row in rows.items():
            if not isinstance(row, dict):
                continue
            if row.get("hash_match") is True:
                hash_verified.add(name)
            elif row.get("err") == "no_oracle":
                rows_only_seen.add(name)
    return hash_verified, rows_only_seen


def all_queries() -> dict[str, RegisteredQuery]:
    """All registered queries, ordered so unverified ones come first.

    Rank 0: has an oracle but no green driver hash row yet (the driver's
    next 50-query window should spend its budget here). Rank 1: no oracle
    and never executed by the driver (gets a rows-only record). Rank 2:
    already driver-verified (hash-matched, or rows-only and still
    oracle-less). Stable registration order within each rank.

    A past green row only counts while the implementation it proved is the
    current one: verification is keyed by ``query_digest`` (oracle SQL +
    function source) recorded in ``verified_digests.json`` at the round the
    driver checked it. Editing a verified query's code or oracle changes its
    digest, demoting it back to rank 0/1 so the next driver window re-proves
    it instead of silently trusting a stale artifact.
    """
    _load_all()
    hash_verified, rows_only_seen = _driver_verified()
    digests = _verified_digests()

    def current(name: str) -> bool:
        return digests.get(name) == query_digest(_REGISTRY[name])

    def rank(q: RegisteredQuery) -> int:
        if q.name in hash_verified and current(q.name):
            return 2
        if q.oracle is None:
            return 2 if q.name in rows_only_seen and current(q.name) else 1
        return 0

    ordered = sorted(_REGISTRY.values(), key=lambda q: rank(q))
    return {q.name: q for q in ordered}


def queries() -> dict[str, QueryFn]:
    return {n: q.fn for n, q in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    return {n: q.oracle for n, q in all_queries().items() if q.oracle is not None}


if __name__ == "__main__":  # pragma: no cover
    # Round-start maintenance: record digests for the newest driver
    # artifact's greens BEFORE editing any operator, e.g.
    #   python -m mongodb_nats_connector_spark.registry CORRECTNESS_r03.json
    # Delegate to the canonical package-module instance: under `-m` this file
    # executes as `__main__`, whose module-level _REGISTRY is a DIFFERENT dict
    # from the one operator modules register into — calling our own
    # refresh_verified_digests here would skip every name.
    import sys

    from mongodb_nats_connector_spark import registry as _canonical

    updated = _canonical.refresh_verified_digests(Path(sys.argv[1]))
    print(f"verified_digests.json: {len(updated)} names recorded")
