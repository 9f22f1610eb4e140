"""Result-scoped persist: cache an intermediate for exactly as long as the
query's returned DataFrame is alive.

Several operators persist() an intermediate that the returned lazy plan
references more than once (pruned edge lists, per-key pre-aggregates). The
caller can't unpersist it — it never sees the intermediate — so a plain
persist() leaks a CacheManager entry for the life of the session (the
SQL cache holds strong references; it is NOT GC-reclaimed). In the
long-lived shared-session mode this repo supports, every invocation of
such a query would pin more block-manager memory.

``persist_until_collected`` keeps the persist (lineage stays intact, the
full child plan stays visible to the plan tests, recompute-on-executor-loss
still works at cluster scale — all things a localCheckpoint would give up)
and attaches a weakref finalizer to the RESULT frame: the moment the caller
drops its reference (CPython refcounting makes that deterministic — right
after .collect()/.toPandas() in the driver loop), the intermediate is
unpersisted. If the caller instead keeps deriving from the result and drops
the original, the cache is released early and the derived plan recomputes —
a performance fallback, never a correctness one.
"""

from __future__ import annotations

import weakref

from pyspark.sql import DataFrame


def persist_until_collected(
    intermediate: DataFrame, result: DataFrame
) -> DataFrame:
    """persist() ``intermediate``; unpersist it when ``result`` is GC'd."""
    intermediate.persist()
    return release_on_gc(intermediate, result)


def release_on_gc(intermediate: DataFrame, result: DataFrame) -> DataFrame:
    """Attach only the finalizer half of ``persist_until_collected``: the
    caller already persisted ``intermediate`` (because a driver-side
    bounded-collect loop needed the cache DURING query construction, before
    the result plan existed); this releases that cache when ``result`` is
    GC'd, with the same lifetime contract."""
    jdf = intermediate._jdf

    def _release() -> None:
        try:
            jdf.unpersist(False)
        except Exception:
            # JVM already gone (interpreter shutdown) — nothing to leak
            pass

    weakref.finalize(result, _release)
    return result
