"""Distributed exact global ranking without a single-partition sort.

A global ``row_number()``/``ntile()`` window funnels the whole relation
through ONE task — fine for a bounded series (months, buckets), fatal for a
data-proportional relation (per-customer, per-document) at 100 TB. The
standard fix is the two-pass range-partitioned rank every distributed sort
uses (TeraSort, Spark's own RangePartitioner):

pass 1  sketch value-quantile boundaries and broadcast them (a few dozen
        doubles); each row's bucket = number of boundaries below its value.
        ANY boundary set yields the SAME final ranks — boundaries only
        balance work — so the cheap ``percentile_approx`` sketch is safe
        even though its merge order is not deterministic.
pass 2  per-bucket counts (a bucket-count-sized relation) prefix-sum into
        bucket offsets; global rank = bucket offset + row_number within
        the bucket.

Exchanges: one broadcast of the boundary array, one shuffle on the bucket
key, plus the bucket-count-sized offset window (bounded by ``n_buckets``,
never by the data). Every window that touches row-proportional data
partitions by bucket.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _bucketize(
    df: DataFrame,
    value_col: str,
    n_buckets: int,
    accuracy: int,
    boundaries: list | None = None,
) -> DataFrame:
    """Drop NULL ``value_col`` rows, sketch quantile boundaries, collect
    them to the driver (~``n_buckets`` scalars, bounded) and assign each
    row an ``_bkt`` range-bucket via the embedded literal array — the
    shared pass-1 of every two-pass global-order helper below. Literals
    (not a re-evaluated sketch) guarantee every consumer of ``_bkt`` sees
    the identical bucketization. Explicit ``boundaries`` skip the sketch
    job entirely — ANY boundary set yields the same final ranks
    (boundaries only balance work), so a caller that can derive balanced
    cut points analytically (e.g. a rank sum over a known total) saves
    one construction-time pass over the input lineage."""
    df = df.filter(F.col(value_col).isNotNull())
    if boundaries is not None:
        bvals = list(boundaries)
    else:
        fracs = F.array(
            *[F.lit((i + 1) / n_buckets) for i in range(n_buckets - 1)]
        )
        row = df.agg(
            F.percentile_approx(value_col, fracs, F.lit(accuracy)).alias("_bs")
        ).first()
        bvals = list(row["_bs"] or [])  # native types preserved
    bounds_lit = (
        F.array(*[F.lit(b) for b in bvals])
        if bvals
        else F.array().cast("array<double>")
    )
    return df.withColumn("_bs", bounds_lit).withColumn(
        "_bkt",
        F.size(F.filter("_bs", lambda x: F.col(value_col) > x)).cast("int"),
    )


def two_pass_global_rank(
    df: DataFrame,
    value_col: str,
    tie_col: str,
    *,
    descending: bool = True,
    n_buckets: int = 32,
    accuracy: int = 10_000,
    rank_col: str = "_rank",
    total_col: str = "_n",
    collected_offsets: bool = False,
    boundaries: list | None = None,
) -> DataFrame:
    """Return ``df`` plus an exact 1-based global ``rank_col`` over
    ``(value_col {DESC|ASC}, tie_col ASC)`` and the total row count
    ``total_col``, computed without any data-proportional single-partition
    window. ``tie_col`` must make the order total (unique per value group)
    for the rank to be deterministic.

    NULL ``value_col`` rows are dropped here (explicit ``isNotNull``
    filter): a NULL would otherwise land in bucket 0 — ``size(filter(...))``
    of a NULL comparison is 0, not NULL — silently taking trailing ranks
    and inflating ``total_col``. Callers that must keep NULL rows should
    rank the non-NULL subset and re-join. A single dominant value degrades
    gracefully to one big bucket (correct ranks, one loaded task) — the
    same behavior as any range partitioner under total key skew.

    Boundaries come from a ``percentile_approx`` sketch whose merge order
    is non-deterministic, and the bucketization feeds TWO plan branches
    (counts→offsets and the final join). They are therefore collected to
    the driver (~``n_buckets`` doubles, bounded) and embedded as literals,
    so both branches provably see the identical array instead of relying
    on Spark's exchange-reuse to keep two sketch evaluations in sync.
    ANY boundary set yields the same final ranks, but only if it is the
    SAME set in both branches.

    ``collected_offsets=True`` additionally collects the per-bucket counts
    (<= ``n_buckets`` rows, bounded) to the driver at CONSTRUCTION time and
    embeds the bucket offsets + total as literals, keeping the offset
    branch out of the executed plan entirely (the broadcast-join
    formulation re-runs the counts aggregation as a serial broadcast-build
    job inside every execution). Identical ranks by construction. Opt in
    only when ``df`` is already persisted — otherwise the extra
    construction-time pass recomputes the input lineage from scratch.

    ``boundaries`` (optional) bypasses the sketch with explicit literal
    cut points — see ``_bucketize``; ranks are identical for any set.
    """
    assigned = _bucketize(df, value_col, n_buckets, accuracy, boundaries)
    value_order_c: Column = (
        F.col(value_col).desc() if descending else F.col(value_col).asc()
    )
    within_w = Window.partitionBy("_bkt").orderBy(value_order_c, F.col(tie_col))
    if collected_offsets:
        rows = assigned.groupBy("_bkt").agg(
            F.count(F.lit(1)).alias("_cnt")
        ).collect()
        cnts = {r["_bkt"]: r["_cnt"] for r in rows}
        off: dict[int, int] = {}
        acc = 0
        for k in sorted(cnts, reverse=descending):
            off[k] = acc
            acc += cnts[k]
        om = (
            F.create_map(
                *[
                    c
                    for k, v in sorted(off.items())
                    for c in (F.lit(k).cast("int"), F.lit(v).cast("bigint"))
                ]
            )
            if off
            else F.create_map().cast("map<int,bigint>")
        )
        return (
            assigned.withColumn(
                rank_col,
                (om[F.col("_bkt")] + F.row_number().over(within_w)).cast(
                    "bigint"
                ),
            )
            .withColumn(total_col, F.lit(acc).cast("bigint"))
            .drop("_bs", "_bkt")
        )
    counts = assigned.groupBy("_bkt").agg(F.count(F.lit(1)).alias("_cnt"))
    bkt_order = F.col("_bkt").desc() if descending else F.col("_bkt").asc()
    before = Window.orderBy(bkt_order).rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = counts.select(
        "_bkt",
        F.coalesce(F.sum("_cnt").over(before), F.lit(0)).alias("_off"),
        F.sum("_cnt").over(Window.partitionBy()).alias(total_col),
    )
    value_order: Column = (
        F.col(value_col).desc() if descending else F.col(value_col).asc()
    )
    within = Window.partitionBy("_bkt").orderBy(value_order, F.col(tie_col))
    return (
        assigned.join(F.broadcast(offsets), "_bkt")
        .withColumn(
            rank_col,
            (F.col("_off") + F.row_number().over(within)).cast("bigint"),
        )
        .drop("_bs", "_bkt", "_off")
    )


def two_pass_prefix_sum(
    df: DataFrame,
    value_col: str,
    tie_col: str,
    sum_col: str,
    *,
    descending: bool = True,
    n_buckets: int = 32,
    accuracy: int = 10_000,
    cum_col: str = "_cum",
) -> DataFrame:
    """Return ``df`` plus the exact running total ``cum_col`` of
    ``sum_col`` over rows ordered ``(value_col {DESC|ASC}, tie_col ASC)``,
    inclusive of the current row — the distributed prefix sum: per-bucket
    running sums partitioned by range-bucket, plus a bucket-count-sized
    offset window of the per-bucket totals. Same NULL/boundary contract as
    ``two_pass_global_rank`` (shared ``_bucketize`` pass 1). ``sum_col``
    should be exact-integer for cross-engine bit parity — the bucket-total
    offsets re-order the summation, which is only safe when addition is
    associative (ints), not for raw doubles."""
    assigned = _bucketize(df, value_col, n_buckets, accuracy)
    totals = assigned.groupBy("_bkt").agg(F.sum(sum_col).alias("_bsum"))
    bkt_order = F.col("_bkt").desc() if descending else F.col("_bkt").asc()
    before = Window.orderBy(bkt_order).rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = totals.select(
        "_bkt",
        F.coalesce(F.sum("_bsum").over(before), F.lit(0)).alias("_soff"),
    )
    value_order: Column = (
        F.col(value_col).desc() if descending else F.col(value_col).asc()
    )
    within = Window.partitionBy("_bkt").orderBy(
        value_order, F.col(tie_col)
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        assigned.join(F.broadcast(offsets), "_bkt")
        .withColumn(cum_col, F.col("_soff") + F.sum(sum_col).over(within))
        .drop("_bs", "_bkt", "_soff")
    )


def two_pass_prefix_max(
    df: DataFrame,
    value_col: str,
    tie_col: str,
    max_col: str,
    *,
    descending: bool = True,
    n_buckets: int = 32,
    accuracy: int = 10_000,
    cum_col: str = "_runmax",
    exclusive: bool = False,
) -> DataFrame:
    """Return ``df`` plus the running maximum ``cum_col`` of ``max_col``
    over rows ordered ``(value_col {DESC|ASC}, tie_col ASC)`` — the
    prefix-max analogue of ``two_pass_prefix_sum``: per-bucket running
    maxima partitioned by range-bucket, combined with the max over all
    strictly-earlier buckets via ``greatest`` (NULL-skipping, so an empty
    prefix yields NULL exactly like a window's empty frame).
    ``exclusive=True`` uses a ``ROWS ... 1 PRECEDING`` frame; since a ROWS
    frame among equal sort keys is order-dependent, exclusive mode
    requires ``(value_col, tie_col)`` to be a total order (e.g. distinct
    values). Max is idempotent and associative, so the bucket
    decomposition is exact for any comparable type."""
    assigned = _bucketize(df, value_col, n_buckets, accuracy)
    totals = assigned.groupBy("_bkt").agg(F.max(max_col).alias("_bmax"))
    bkt_order = F.col("_bkt").desc() if descending else F.col("_bkt").asc()
    before = Window.orderBy(bkt_order).rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = totals.select(
        "_bkt", F.max("_bmax").over(before).alias("_moff")
    )
    value_order: Column = (
        F.col(value_col).desc() if descending else F.col(value_col).asc()
    )
    within = Window.partitionBy("_bkt").orderBy(
        value_order, F.col(tie_col)
    ).rowsBetween(Window.unboundedPreceding, -1 if exclusive else 0)
    return (
        assigned.join(F.broadcast(offsets), "_bkt")
        .withColumn(
            cum_col,
            F.greatest(F.col("_moff"), F.max(max_col).over(within)),
        )
        .drop("_bs", "_bkt", "_moff")
    )


def ntile_from_rank(rank: Column, n: Column, k: int) -> Column:
    """SQL ``ntile(k)`` reconstructed from an exact 1-based global rank and
    the total row count — the remainder-first allocation (the first
    ``n % k`` tiles get one extra row), as exact integer arithmetic.
    Integer quotients stay below 2^53, so the double-valued division is
    exact before ``floor``.
    """
    base = F.floor(n / k)
    rem = n % k
    cut = rem * (base + 1)
    return (
        F.when(rank <= cut, F.floor((rank - 1) / (base + 1)) + 1)
        .otherwise(
            rem + F.floor((rank - 1 - cut) / F.greatest(base, F.lit(1))) + 1
        )
        .cast("int")
    )
