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
) -> DataFrame:
    """Return ``df`` plus an exact 1-based global ``rank_col`` over
    ``(value_col {DESC|ASC}, tie_col ASC)`` and the total row count
    ``total_col``, computed without any data-proportional single-partition
    window. ``tie_col`` must make the order total (unique per value group)
    for the rank to be deterministic.

    ``value_col`` must be non-NULL (a NULL value gets a NULL bucket and
    silently drops out of the inner offset join — filter first, exactly as
    the NULL-ordering discipline already requires). A single dominant value
    degrades gracefully to one big bucket (correct ranks, one loaded task)
    — the same behavior as any range partitioner under total key skew.
    """
    fracs = F.array(
        *[F.lit((i + 1) / n_buckets) for i in range(n_buckets - 1)]
    )
    bounds = df.agg(
        F.percentile_approx(value_col, fracs, F.lit(accuracy)).alias("_bs")
    )
    assigned = df.crossJoin(F.broadcast(bounds)).withColumn(
        "_bkt",
        F.size(F.filter("_bs", lambda x: F.col(value_col) > x)).cast("int"),
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
