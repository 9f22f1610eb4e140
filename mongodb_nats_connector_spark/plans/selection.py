"""Two-pass exact order-statistic selection (construction-time).

``F.percentile``/``F.median`` are exact but their aggregation state is a
value->count map of every distinct value in the group: at 100 TB a
fact-proportional value domain (prices, totals in cents) funnels a
fact-sized sorted map through ONE reducer per group — §2.2's skew shape
with extra memory pressure. The sketch-variant queries are registered
separately; for the queries whose CONTRACT is the exact statistic, this
module removes the single-reducer value map with the classic two-pass
range-partitioned selection:

job 1  per-group min/max (one cheap codegen'd aggregation) fixes a
       UNIFORM value grid of ``n_buckets`` cells per group. Cell
       assignment is O(1) arithmetic per row — measured ~20x cheaper
       than a boundary-array higher-order filter, which is interpreted
       per row — and ANY monotone binning is correct: the grid only
       balances work, every rank is located from EXACT counts.
job 2  count rows per (group, cell): a BOUNDED relation
       (groups x n_buckets), collected to the driver, which locates the
       cell + local offset of each requested global rank.
job 3  one filtered pass extracts exactly those rows (a row_number
       window over the ~1/n_buckets target cells only, never a group)
       and collects the <= 2 x fracs x groups values.

The percentile VALUE is then recomposed on the driver by replaying
Spark's own interpolation (Percentile.getPercentile) in IEEE doubles:

    position = (n - 1) * p                       # double multiply
    lower, higher = floor(position), ceil(position)
    if higher == lower or v[lower] == v[higher]: value = float(v[lower])
    else: value = (higher - position) * float(v[lower]) \
                  + (position - lower) * float(v[higher])

Python floats ARE IEEE doubles and +,-,* are correctly rounded, so the
replay is bit-identical to the JVM evaluation — pinned by the property
test in tests/test_r15_selection.py, which compares the replay against
``F.percentile`` bit-for-bit on adversarial random multisets. For the
doubled-median integer family (``med2 = round(percentile(x, .5) * 2)``
over BIGINTs) no float ever appears: position's fraction is exactly 0 or
0.5, both interpolation weights are exactly 0.5, the midpoint of two
int64s well under 2^52 is exactly representable, so
``round(percentile*2) == v[lower] + v[higher]`` in exact integer
arithmetic (same-key branch included: 2*v == v + v).

Boundedness: every collect here is <= groups x n_buckets rows —
``group_cols`` must be a domain-bounded key (returnflag, priority, or
None for a global statistic), never a data-proportional one. A
degenerate distribution (all mass in one cell) degrades to one loaded
select-window task — the same graceful behavior as any range
partitioner under total key skew; raise ``n_buckets`` with the data.
The selection runs at query-construction time (billed to the bench's
build window) and re-runs on every construction — nothing is memoized.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window


def _median_ranks(n: int) -> list[int]:
    """0-based ranks Spark's percentile(x, 0.5) touches: floor/ceil of
    0.5 * (n - 1)."""
    return sorted({(n - 1) // 2, n // 2})


def _grid_expr(
    value_col: str,
    group_cols: list[str],
    ranges: dict[tuple, tuple[float, float]],
    n_buckets: int,
) -> Column:
    """Deterministic O(1)-per-row cell index: clamp(floor((x - lo)/step)).
    lo/step are per-group literals (create_map lookup for grouped input),
    so the counts job and the select job provably bin identically."""
    los = {k: float(lo) for k, (lo, _hi) in ranges.items()}
    steps = {
        k: ((float(hi) - float(lo)) / n_buckets) if hi > lo else 1.0
        for k, (lo, hi) in ranges.items()
    }
    if group_cols:
        def lut(vals: dict) -> Column:
            return F.create_map(
                *[
                    c
                    for k, v in sorted(vals.items())
                    for c in (F.lit(k[0]), F.lit(v))
                ]
            )[F.col(group_cols[0])]

        lo_e, step_e = lut(los), lut(steps)
    else:
        lo_e, step_e = F.lit(los[()]), F.lit(steps[()])
    idx = F.floor((F.col(value_col) - lo_e) / step_e).cast("int")
    return F.least(F.greatest(idx, F.lit(0)), F.lit(n_buckets - 1))


def selected_order_stats(
    df: DataFrame,
    value_col: str,
    ranks_for_n,
    group_cols: list[str] | None = None,
    *,
    n_buckets: int = 1024,
    ranges: dict | None = None,
    internals: dict | None = None,
) -> dict[tuple, tuple[int, dict[int, object]]]:
    """Exact order statistics by two-pass range selection.

    ``ranks_for_n(n) -> iterable of 0-based ranks`` names which order
    statistics each group needs once its row count ``n`` is known.
    Returns ``{group_key_tuple: (n, {rank: value})}`` with native Python
    values (ints stay exact ints; doubles stay the parquet doubles).
    NULL ``value_col`` rows are dropped, matching Percentile's semantics.
    Only a single group column is supported (the family's shapes).

    ``ranges`` ({group_key_tuple: (lo, hi)}) skips the min/max job when
    the caller can bound the values analytically (e.g. the |x - median|
    pass is bounded by max(hi - med, med - lo) of the first pass); ANY
    covering range is correct — the clamp keeps out-of-range values in
    the edge cells. ``internals`` (optional dict) is filled with the
    observed per-group (lo, hi) ranges and bucket counts for such
    derivations.
    """
    group_cols = list(group_cols or [])
    assert len(group_cols) <= 1, "selection supports at most one group col"
    df = df.filter(F.col(value_col).isNotNull())
    if ranges is None:
        stats = (
            df.groupBy(*group_cols)
            .agg(F.min(value_col).alias("_lo"), F.max(value_col).alias("_hi"))
            .collect()
        )
        ranges = {
            tuple(r[c] for c in group_cols): (r["_lo"], r["_hi"])
            for r in stats
        }
    if not ranges:
        return {}
    bkt = _grid_expr(value_col, group_cols, ranges, n_buckets)
    assigned = df.withColumn("_bkt", bkt)
    cnt_rows = (
        assigned.groupBy(*(group_cols + ["_bkt"]))
        .agg(F.count(F.lit(1)).alias("_cnt"))
        .collect()
    )
    per_group: dict[tuple, dict[int, int]] = {}
    for r in cnt_rows:
        key = tuple(r[c] for c in group_cols)
        per_group.setdefault(key, {})[r["_bkt"]] = r["_cnt"]
    if internals is not None:
        internals["ranges"] = dict(ranges)
        internals["counts"] = per_group
    # driver: locate (cell, local 0-based rank) for each requested rank
    targets: dict[tuple, dict[int, list[tuple[int, int]]]] = {}
    totals: dict[tuple, int] = {}
    for key, buckets in per_group.items():
        n = sum(buckets.values())
        totals[key] = n
        want: dict[int, list[tuple[int, int]]] = {}
        offset = 0
        ranks = sorted(set(ranks_for_n(n)))
        i = 0
        for b in sorted(buckets):
            c = buckets[b]
            while i < len(ranks) and ranks[i] < offset + c:
                want.setdefault(b, []).append((ranks[i] - offset, ranks[i]))
                i += 1
            offset += c
        targets[key] = want
    # one filtered pass: only the needed (group, cell) slices are
    # windowed — each window partition holds ~1/n_buckets of one group
    slice_conds = []
    pick_conds = []
    locs = []  # (key, cell, local_rank, global_rank)
    for key, want in targets.items():
        for b, pairs in want.items():
            cond = F.col("_bkt") == F.lit(b)
            for c, v in zip(group_cols, key):
                cond = cond & (F.col(c) == F.lit(v))
            slice_conds.append(cond)
            local_ranks = [lc for lc, _ in pairs]
            pick_conds.append(cond & F.col("_rn").isin(local_ranks))
            locs.extend((key, b, lc, gr) for lc, gr in pairs)
    out: dict[tuple, tuple[int, dict[int, object]]] = {
        key: (totals[key], {}) for key in per_group
    }
    if slice_conds:
        any_cond = slice_conds[0]
        for c in slice_conds[1:]:
            any_cond = any_cond | c
        w = Window.partitionBy(*(group_cols + ["_bkt"])).orderBy(
            F.col(value_col).asc()
        )
        picked = (
            assigned.filter(any_cond)
            .withColumn("_rn", F.row_number().over(w) - 1)
            .select(*(group_cols + ["_bkt", "_rn", value_col]))
        )
        any_pick = pick_conds[0]
        for c in pick_conds[1:]:
            any_pick = any_pick | c
        rows = picked.filter(any_pick).collect()
        val_at: dict[tuple, object] = {}
        for r in rows:
            key = tuple(r[c] for c in group_cols)
            val_at[(key, r["_bkt"], r["_rn"])] = r[value_col]
        for key, b, lc, gr in locs:
            out[key][1][gr] = val_at[(key, b, lc)]
    return out


def spark_percentile_replay(
    n: int, values_at: dict[int, object], p: float
) -> float:
    """Replay Percentile.getPercentile for fraction ``p`` over a group of
    ``n`` rows given the values at ranks floor/ceil of ``(n-1)*p`` —
    bit-identical to the JVM (property-pinned, see module docstring)."""
    position = float(n - 1) * p
    lower = math.floor(position)
    higher = math.ceil(position)
    lo = float(values_at[lower])
    if higher == lower:
        return lo
    hi = float(values_at[higher])
    if hi == lo:
        return lo
    return (higher - position) * lo + (position - lower) * hi


def percentile_ranks(n: int, fracs: list[float]) -> list[int]:
    """All 0-based ranks percentile(x, fracs) touches for group size n."""
    ranks = set()
    for p in fracs:
        position = float(n - 1) * p
        ranks.add(math.floor(position))
        ranks.add(math.ceil(position))
    return sorted(ranks)


def doubled_median2(n: int, values_at: dict[int, object]) -> int:
    """``round(percentile(x, 0.5) * 2)`` over BIGINTs as exact integer
    arithmetic: v[lower] + v[higher] (see module docstring for the
    exactness argument)."""
    return int(values_at[(n - 1) // 2]) + int(values_at[n // 2])
