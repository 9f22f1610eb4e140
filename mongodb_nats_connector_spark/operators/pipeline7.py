"""Round-7 operators: graph traversal, change detection, mergeable
sketches, statistical tests, resampling, and gaps-and-islands shapes.

Graph family (beyond PageRank / label propagation / connected components):

- ``graph_bfs_levels`` — breadth-first hop levels (Pregel-style frontier
  loop in pure DataFrame ops), the "within N hops" traversal primitive.
- ``graph_widest_path`` — max-min bottleneck capacity via fixed synchronous
  Bellman rounds, all comparisons on BIGINTs.

Mergeable sketches (each with the merge demo the family contract demands):

- ``agg_kmv_distinct_setops`` — K-Minimum-Values sketches: the distinct
  sketch that, unlike HyperLogLog, also estimates set INTERSECTIONS; the
  md5-derived 60-bit hash makes even the estimates hash-verifiable.
- ``agg_hll_registers`` — HyperLogLog whose registers (and so estimate)
  are engine-exact: rho from binary length, Z as a scaled-BIGINT sum, and
  an 'ALL' row proving register-max merge.
- ``agg_log2_histogram_quantiles`` — HDR-style power-of-2 latency buckets
  with integer-exact p50/p90/p99 bucket flags; merge = sum counts.

Statistics / analytics:

- ``events_cusum_changepoint`` — CUSUM mean-shift detection with an exact
  integer argmax (n*S_i = n*prefix_i - i*total).
- ``agg_ks_test`` — two-sample Kolmogorov-Smirnov D + critical value,
  the distribution-shape test beside Welch-t and chi-square.
- ``orders_gini_hhi`` — Gini + HHI revenue concentration.
- ``events_activity_streaks`` — longest consecutive-day run per user
  (gaps-and-islands via the day-minus-row_number anchor).

Curation:

- ``curate_temperature_resample`` — the multilingual-LLM count^alpha
  sampling recipe (alpha = 0.5 via IEEE-exact sqrt).

Cross-engine determinism: every comparison that picks a row (BFS levels,
CUSUM argmax, streak/widest-path/quantile-bucket decisions, sketch
membership) is decided on integers or dates; doubles appear only in final
reported values after identical arithmetic on exact integer inputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mongodb_nats_connector_spark.operators.graph_common import (
    HLL_ALPHA as _HLL_ALPHA,
    HLL_M as _HLL_M,
    HLL_P,
    HLL_POW as _HLL_POW,
    HLL_REST_BITS as _HLL_REST_BITS,
    hll_reg_rows,
    md5_hash60,
    trade_edges,
)
from mongodb_nats_connector_spark.plans.caching import persist_until_collected
from mongodb_nats_connector_spark.plans.hints import maybe_broadcast
from mongodb_nats_connector_spark.registry import register
from mongodb_nats_connector_spark.sources.tables import table

# ---------------------------------------------------------------------------
# graph_bfs_levels — BFS hop levels over the top-k trade graph
# ---------------------------------------------------------------------------

BFS_SOURCE_NODE = 0
BFS_TOP_OUT = 3  # keep each nation's 3 heaviest outgoing trade edges
BFS_MAX_HOPS = 8

_TRADE_EDGES_CTE = """
    dir_edges AS (
      SELECT c.c_nationkey AS src, s.s_nationkey AS dst,
             CAST(count(*) AS BIGINT) AS w
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      WHERE c.c_nationkey <> s.s_nationkey
      GROUP BY 1, 2
    )"""


@register(
    "graph_bfs_levels",
    oracle=f"""
    WITH RECURSIVE {_TRADE_EDGES_CTE},
    g AS (
      SELECT src, dst FROM (
        SELECT src, dst,
               row_number() OVER (PARTITION BY src ORDER BY w DESC, dst ASC)
                 AS rn
        FROM dir_edges
      ) WHERE rn <= {BFS_TOP_OUT}
    ),
    bfs AS (
      SELECT CAST({BFS_SOURCE_NODE} AS BIGINT) AS node, 0 AS hop
      UNION
      SELECT g.dst, bfs.hop + 1
      FROM bfs JOIN g ON g.src = bfs.node
      WHERE bfs.hop < {BFS_MAX_HOPS}
    ),
    lv AS (SELECT node, min(hop) AS hop FROM bfs GROUP BY node)
    SELECT n.n_name AS nation, CAST(lv.hop AS INT) AS hop
    FROM nation n LEFT JOIN lv ON lv.node = n.n_nationkey
    """,
    doc=f"Breadth-first hop levels from nation {BFS_SOURCE_NODE} over the "
    f"top-{BFS_TOP_OUT}-out-degree trade graph (each nation keeps its "
    f"{BFS_TOP_OUT} heaviest outgoing customer->supplier edges; ties break "
    "to the smaller destination, so the graph is engine-exact). Unreachable "
    "nations report NULL. The edge list aggregates once from the facts (the "
    "only corpus-proportional shuffle); it is nation^2-bounded, so it is "
    "collected once and the top-k filter + BFS rounds run as exact Python "
    "integers on the driver (the pagerank_nations discipline), levels "
    "emitted as a literal map over the nation dimension. On a "
    "billion-node graph the frontier loop returns as hash-partitioned "
    "frontier/visited joins (the Pregel message pattern; graph_cc_bigstar "
    "keeps that distributed shape in-registry).",
)
def graph_bfs_levels(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = table(spark, sf_dir, "nation")
    dir_edges = trade_edges(spark, sf_dir)
    # The trade adjacency is nation-dimension-squared-bounded (<= 625
    # rows at any fact size — a driver scalar), so after the single
    # corpus-proportional aggregation it is collected ONCE and both the
    # top-k out-edge filter and the BFS rounds run in exact Python
    # integer arithmetic on the driver (the pagerank_nations
    # discipline): sort per source by (w DESC, dst ASC) and keep
    # BFS_TOP_OUT — the row_number() tie-break replicated literally —
    # then expand hop frontiers with min-hop set semantics. Formerly
    # each round ran 2 eager localCheckpoint jobs + an isEmpty probe
    # over node-bounded frontier/visited relations (~24 serial jobs).
    # On a billion-node graph the loop form returns with
    # hash-partitioned frontier/visited relations (graph_cc_bigstar
    # keeps that distributed shape).
    by_src: dict = {}
    for r in dir_edges.collect():
        by_src.setdefault(r["src"], []).append((r["dst"], r["w"]))
    adj = {
        s: [
            d
            for d, _ in sorted(es, key=lambda dw: (-dw[1], dw[0]))[
                :BFS_TOP_OUT
            ]
        ]
        for s, es in by_src.items()
    }
    levels = {BFS_SOURCE_NODE: 0}
    frontier = [BFS_SOURCE_NODE]
    for hop in range(1, BFS_MAX_HOPS + 1):
        nxt = sorted(
            {
                d
                for u in frontier
                for d in adj.get(u, ())
                if d not in levels
            }
        )
        if not nxt:
            break
        for d in nxt:
            levels[d] = hop
        frontier = nxt
    lv_lit = F.create_map(
        *[F.lit(x) for k, v in sorted(levels.items()) for x in (k, v)]
    )
    return nation.select(
        F.col("n_name").alias("nation"),
        lv_lit[F.col("n_nationkey")].cast("int").alias("hop"),
    )


# ---------------------------------------------------------------------------
# events_cusum_changepoint — exact-integer CUSUM mean-shift detection
# ---------------------------------------------------------------------------


@register(
    "events_cusum_changepoint",
    oracle="""
    WITH d AS (
      SELECT CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS cnt
      FROM events WHERE ts IS NOT NULL GROUP BY 1
    ),
    t AS (
      SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(cnt) AS BIGINT) AS total
      FROM d
    ),
    c AS (
      SELECT day, cnt,
             CAST(sum(cnt) OVER (ORDER BY day) AS BIGINT) AS prefix,
             CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS rk
      FROM d
    ),
    sc AS (
      SELECT c.day, c.cnt, (c.prefix * t.n - c.rk * t.total) AS s_scaled,
             t.n AS n
      FROM c, t
    ),
    cp AS (
      SELECT day AS cp_day FROM sc
      ORDER BY abs(s_scaled) DESC, day ASC LIMIT 1
    )
    SELECT sc.day, sc.cnt,
           round(s_scaled * 1.0 / sc.n, 4) AS cusum,
           (sc.day = cp.cp_day) AS is_changepoint
    FROM sc, cp
    """,
    doc="CUSUM mean-shift detection over the daily event-count series: "
    "S_i = sum_{j<=i}(cnt_j - mean), and the changepoint is the day with "
    "the largest |S_i| (ties -> earliest day). Computed via the exact "
    "integer identity n*S_i = n*prefix_i - i*total, so the argmax is "
    "decided on BIGINTs — engine-bit-exact — and the reported double is a "
    "single correctly-rounded division. The series reduces from the facts "
    "with map-side combine (one shuffle proportional to DAYS, not events); "
    "the running sum and the limit-1 argmax operate on the day-sized "
    "aggregate, and the 1-row changepoint broadcasts back. The BIGINT "
    "products stay under 2^63 while n_days^2 * daily_rate < 9.2e18 — e.g. "
    "~1.7e11 events/day over two decades; past that, cast the identity to "
    "DECIMAL(38) (same algebra).",
)
def events_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    # NULL ts guard: a NULL day group would sort FIRST in Spark's ordered
    # windows but LAST in DuckDB's, corrupting every prefix
    ev = table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    d = (
        ev.groupBy(F.col("ts").cast("date").alias("day"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    t = d.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("cnt").cast("bigint").alias("total"),
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    c = d.select(
        "day",
        "cnt",
        F.sum("cnt").over(w).cast("bigint").alias("prefix"),
        F.row_number().over(Window.orderBy("day")).cast("bigint").alias("rk"),
    )
    sc = c.crossJoin(F.broadcast(t)).select(
        "day",
        "cnt",
        (F.col("prefix") * F.col("n") - F.col("rk") * F.col("total")).alias(
            "s_scaled"
        ),
        "n",
    )
    cp = (
        sc.orderBy(F.abs(F.col("s_scaled")).desc(), F.asc("day"))
        .limit(1)
        .select(F.col("day").alias("cp_day"))
    )
    return sc.crossJoin(F.broadcast(cp)).select(
        "day",
        "cnt",
        F.round(F.col("s_scaled") / F.col("n"), 4).alias("cusum"),
        (F.col("day") == F.col("cp_day")).alias("is_changepoint"),
    )


# ---------------------------------------------------------------------------
# agg_kmv_distinct_setops — K-Minimum-Values sketch union/intersection
# ---------------------------------------------------------------------------

KMV_K = 64
_KMV_M = float(1 << 60)  # hash domain size: 60-bit md5-derived values
_KMV_A, _KMV_B = "click", "purchase"


@register(
    "agg_kmv_distinct_setops",
    oracle=f"""
    WITH h AS (
      SELECT DISTINCT event_type AS t,
             CAST(CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15)
                  AS BIGINT) AS BIGINT) AS h
      FROM events WHERE event_type IN ('{_KMV_A}', '{_KMV_B}')
        AND user_id IS NOT NULL
    ),
    sketch AS (
      SELECT t, h, rn FROM (
        SELECT t, h, row_number() OVER (PARTITION BY t ORDER BY h) AS rn
        FROM h
      ) WHERE rn <= {KMV_K}
    ),
    ka AS (SELECT max(rn) AS n, max(h) AS hk FROM sketch WHERE t = '{_KMV_A}'),
    kb AS (SELECT max(rn) AS n, max(h) AS hk FROM sketch WHERE t = '{_KMV_B}'),
    usketch AS (
      SELECT h, rn FROM (
        SELECT h, row_number() OVER (ORDER BY h) AS rn
        FROM (SELECT DISTINCT h FROM sketch)
      ) WHERE rn <= {KMV_K}
    ),
    ku AS (SELECT max(rn) AS n, max(h) AS hk FROM usketch),
    inter AS (
      SELECT CAST(count(*) AS BIGINT) AS m FROM usketch u
      WHERE EXISTS (SELECT 1 FROM sketch s
                    WHERE s.t = '{_KMV_A}' AND s.h = u.h)
        AND EXISTS (SELECT 1 FROM sketch s
                    WHERE s.t = '{_KMV_B}' AND s.h = u.h)
    ),
    ex AS (
      SELECT
        count(DISTINCT CASE WHEN event_type = '{_KMV_A}' THEN user_id END)
          AS exact_a,
        count(DISTINCT CASE WHEN event_type = '{_KMV_B}' THEN user_id END)
          AS exact_b,
        count(DISTINCT user_id) AS exact_union
      FROM events WHERE event_type IN ('{_KMV_A}', '{_KMV_B}')
    ),
    exi AS (
      SELECT CAST(count(*) AS BIGINT) AS exact_inter FROM (
        SELECT user_id FROM events WHERE event_type = '{_KMV_A}'
        INTERSECT
        SELECT user_id FROM events WHERE event_type = '{_KMV_B}'
      )
    )
    SELECT
      CASE WHEN ka.n < {KMV_K} THEN ka.n
           ELSE CAST(round(({KMV_K} - 1) * {_KMV_M!r} / ka.hk) AS BIGINT)
      END AS est_a,
      CASE WHEN kb.n < {KMV_K} THEN kb.n
           ELSE CAST(round(({KMV_K} - 1) * {_KMV_M!r} / kb.hk) AS BIGINT)
      END AS est_b,
      CASE WHEN ku.n < {KMV_K} THEN ku.n
           ELSE CAST(round(({KMV_K} - 1) * {_KMV_M!r} / ku.hk) AS BIGINT)
      END AS est_union,
      CAST(round(inter.m * (
        CASE WHEN ku.n < {KMV_K} THEN ku.n
             ELSE round(({KMV_K} - 1) * {_KMV_M!r} / ku.hk)
        END) * 1.0 / ku.n) AS BIGINT) AS est_inter,
      CAST(ex.exact_a AS BIGINT) AS exact_a,
      CAST(ex.exact_b AS BIGINT) AS exact_b,
      CAST(ex.exact_union AS BIGINT) AS exact_union,
      exi.exact_inter AS exact_inter
    FROM ka, kb, ku, inter, ex, exi
    """,
    doc=f"K-Minimum-Values distinct sketches (k={KMV_K}) for two event "
    "cohorts, with the sketch algebra HyperLogLog lacks: the union sketch "
    "is the k smallest of the merged sketches, and the intersection is "
    "estimated by Jaccard-on-the-union-sketch (fraction of union-sketch "
    "members present in both input sketches, scaled by the union estimate). "
    "The hash is the 60-bit md5 prefix both engines compute identically, so "
    "even the ESTIMATES hash-verify — rare for an approximate operator. "
    "Exact counterparts ride along for calibration. Plan: one distinct over "
    "(cohort, hash) with map-side combine, then every relation is "
    f"sketch-sized (<= {KMV_K} rows) — at 100 TB only (cohort, 8-byte hash) "
    "pairs shuffle, and per-partition pre-aggregation means each partition "
    "contributes at most k survivors; the driver-side state is O(k).",
)
def agg_kmv_distinct_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").filter(
        F.col("event_type").isin(_KMV_A, _KMV_B)
    )
    # NULL user_id would hash to a NULL sketch member that Spark's
    # row_number orders FIRST while DuckDB orders it LAST — drop it before
    # it can evict the k-th real hash (mirrors agg_bitmap_distinct)
    h = ev.filter(F.col("user_id").isNotNull()).select(
        F.col("event_type").alias("t"),
        md5_hash60(F.col("user_id").cast("string")).alias("h"),
    ).distinct()
    sk_w = Window.partitionBy("t").orderBy("h")
    sketch = (
        h.withColumn("rn", F.row_number().over(sk_w))
        .filter(F.col("rn") <= KMV_K)
    )

    # r14 optimization: the former 6 crossJoined 1-row subplans (ka, kb,
    # ku, m, ex, exi — six serial broadcast-build jobs per execution, with
    # exi adding an intersect shuffle and two extra event scans) fold into
    # THREE, each producing identical values:
    #  - kab: both cohort tails from ONE pass over the cached sketch
    #    (max of a when() == max over the filtered cohort)
    #  - kum: union-sketch tail + sketch-intersection m from ONE pass
    #    (membership flags per h replace the two semi-joins)
    #  - exall: all four exact counts from ONE per-user membership
    #    aggregation (count of users with a == countDistinct when(a);
    #    the NULL user_id group is kept ONLY for exact_inter, mirroring
    #    intersect's NULL-matching vs countDistinct's NULL-skipping)
    kab = sketch.agg(
        F.max(F.when(F.col("t") == _KMV_A, F.col("rn")))
        .cast("bigint")
        .alias("na"),
        F.max(F.when(F.col("t") == _KMV_A, F.col("h"))).alias("hka"),
        F.max(F.when(F.col("t") == _KMV_B, F.col("rn")))
        .cast("bigint")
        .alias("nb"),
        F.max(F.when(F.col("t") == _KMV_B, F.col("h"))).alias("hkb"),
    )
    usketch = (
        sketch.select("h")
        .distinct()
        .withColumn("rn", F.row_number().over(Window.orderBy("h")))
        .filter(F.col("rn") <= KMV_K)
    )
    mem = sketch.groupBy("h").agg(
        F.max((F.col("t") == _KMV_A).cast("int")).alias("_ina"),
        F.max((F.col("t") == _KMV_B).cast("int")).alias("_inb"),
    )
    kum = usketch.join(maybe_broadcast(mem), "h").agg(
        F.max("rn").cast("bigint").alias("nu"),
        F.max("h").alias("hku"),
        F.count(
            F.when((F.col("_ina") == 1) & (F.col("_inb") == 1), F.lit(1))
        )
        .cast("bigint")
        .alias("m"),
    )
    peru = ev.groupBy("user_id").agg(
        F.max((F.col("event_type") == _KMV_A).cast("int")).alias("_a"),
        F.max((F.col("event_type") == _KMV_B).cast("int")).alias("_b"),
    )
    nn = F.col("user_id").isNotNull()
    exall = peru.agg(
        F.count(F.when((F.col("_a") == 1) & nn, F.lit(1)))
        .cast("bigint")
        .alias("exact_a"),
        F.count(F.when((F.col("_b") == 1) & nn, F.lit(1)))
        .cast("bigint")
        .alias("exact_b"),
        F.count(F.when(nn, F.lit(1))).cast("bigint").alias("exact_union"),
        F.count(F.when((F.col("_a") == 1) & (F.col("_b") == 1), F.lit(1)))
        .cast("bigint")
        .alias("exact_inter"),
    )

    def _est(n_col: str, hk_col: str):
        return F.when(F.col(n_col) < KMV_K, F.col(n_col)).otherwise(
            F.round(F.lit(float(KMV_K - 1)) * F.lit(_KMV_M) / F.col(hk_col))
            .cast("bigint")
        )

    est_union_d = F.when(
        F.col("nu") < KMV_K, F.col("nu").cast("double")
    ).otherwise(F.round(F.lit(float(KMV_K - 1)) * F.lit(_KMV_M) / F.col("hku")))
    out = (
        kab.crossJoin(F.broadcast(kum))
        .crossJoin(F.broadcast(exall))
        .select(
            _est("na", "hka").alias("est_a"),
            _est("nb", "hkb").alias("est_b"),
            _est("nu", "hku").alias("est_union"),
            F.round(F.col("m") * est_union_d / F.col("nu"))
            .cast("bigint")
            .alias("est_inter"),
            "exact_a",
            "exact_b",
            "exact_union",
            "exact_inter",
        )
    )
    # the lazy plan references the per-cohort sketch 5x and the union sketch
    # 2x: result-scoped persists keep them single-computed per execution
    # without eagerly running jobs at build time (lineage stays visible to
    # the plan lint; caches release when the caller drops the result)
    return persist_until_collected(
        sketch, persist_until_collected(usketch, out)
    )


# ---------------------------------------------------------------------------
# curate_temperature_resample — count^alpha sampling weights (alpha = 0.5)
# ---------------------------------------------------------------------------

RESAMPLE_BUDGET = 10_000


@register(
    "curate_temperature_resample",
    oracle=f"""
    WITH g AS (
      SELECT lang, source, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(floor(sqrt(count(*)) * 1000000) AS BIGINT) AS w
      FROM documents GROUP BY lang, source
    ),
    t AS (SELECT CAST(sum(w) AS BIGINT) AS tw FROM g)
    SELECT g.lang, g.source, g.n_docs,
           round(g.w / t.tw, 4) AS share,
           CAST(round(g.w / t.tw * {RESAMPLE_BUDGET}) AS BIGINT)
             AS alloc_docs,
           round(g.w / t.tw * {RESAMPLE_BUDGET} / g.n_docs, 4)
             AS sample_rate
    FROM g, t
    """,
    doc="Temperature-based corpus resampling (the multilingual-LLM recipe: "
    "group weight proportional to count^alpha, alpha = 0.5 i.e. sqrt — "
    "IEEE-correctly-rounded, so both engines compute the identical weight): "
    "rare (lang, source) slices are up-weighted relative to their raw "
    "share, head slices down-weighted, and each group's document allocation "
    "and per-doc sampling rate against a fixed budget of "
    f"{RESAMPLE_BUDGET} fall out. One map-side-combined aggregation over "
    "the corpus (the only data-proportional shuffle); everything after is "
    "group-cardinality-sized with the 1-row total broadcast back. The "
    "sample_rate column is what a downstream Bernoulli/hash sampler "
    "consumes, making this the planning half of sample_hash_split.",
)
def curate_temperature_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    # weights quantize to integers (floor(sqrt * 1e6)) so the total is an
    # order-independent BIGINT sum: shares/allocations are bit-identical
    # across engines AND across Spark's own shuffle orders — a float sum of
    # sqrt weights could flip a .5 rounding boundary between runs
    g = docs.groupBy("lang", "source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs")
    ).withColumn(
        "w", F.floor(F.sqrt(F.col("n_docs")) * 1000000).cast("bigint")
    )
    t = g.agg(F.sum("w").cast("bigint").alias("tw"))
    share = F.col("w") / F.col("tw")
    return g.crossJoin(F.broadcast(t)).select(
        "lang",
        "source",
        "n_docs",
        F.round(share, 4).alias("share"),
        F.round(share * RESAMPLE_BUDGET).cast("bigint").alias("alloc_docs"),
        F.round(share * RESAMPLE_BUDGET / F.col("n_docs"), 4).alias(
            "sample_rate"
        ),
    )


# ---------------------------------------------------------------------------
# events_activity_streaks — gaps-and-islands longest consecutive-day run
# ---------------------------------------------------------------------------


@register(
    "events_activity_streaks",
    oracle="""
    WITH d AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
      WHERE ts IS NOT NULL
    ),
    grp AS (
      SELECT user_id, day,
             day - CAST(row_number() OVER (
               PARTITION BY user_id ORDER BY day) AS INT) AS anchor
      FROM d
    ),
    streaks AS (
      SELECT user_id, anchor, CAST(count(*) AS BIGINT) AS streak_days,
             min(day) AS streak_start
      FROM grp GROUP BY user_id, anchor
    )
    SELECT user_id, streak_days, streak_start FROM (
      SELECT user_id, streak_days, streak_start,
             row_number() OVER (PARTITION BY user_id
               ORDER BY streak_days DESC, streak_start ASC) AS rn
      FROM streaks
    ) WHERE rn = 1
    """,
    doc="Gaps-and-islands: longest run of consecutive active days per user "
    "(ties -> earliest streak), via the classic day-minus-row_number anchor "
    "— consecutive days share an anchor date, so runs become groups without "
    "any self-join. All decisions are on dates and counts: engine-exact. "
    "Plan: exactly two exchanges (plan-asserted) — the (user, day) distinct, "
    "then one hash-partition on user_id whose clustering satisfies the "
    "anchor window, the (user, anchor) streak aggregation, AND the per-user "
    "argmax, so nothing downstream re-shuffles. Per-user state is bounded "
    "by the calendar, not event volume, which is what makes the shape safe "
    "at 100 TB.",
)
def events_activity_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    # NULL ts guard: a NULL day would make a streak row with NULL
    # streak_start whose argmax tiebreak sorts FIRST in Spark, LAST in
    # DuckDB — different winners per engine
    ev = table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    d = ev.select("user_id", F.col("ts").cast("date").alias("day")).distinct()
    anchor = F.date_sub(
        F.col("day"),
        F.row_number()
        .over(Window.partitionBy("user_id").orderBy("day"))
        .cast("int"),
    )
    grp = d.select("user_id", "day", anchor.alias("anchor"))
    streaks = grp.groupBy("user_id", "anchor").agg(
        F.count(F.lit(1)).cast("bigint").alias("streak_days"),
        F.min("day").alias("streak_start"),
    )
    best = Window.partitionBy("user_id").orderBy(
        F.desc("streak_days"), F.asc("streak_start")
    )
    return (
        streaks.withColumn("rn", F.row_number().over(best))
        .filter(F.col("rn") == 1)
        .select("user_id", "streak_days", "streak_start")
    )


# ---------------------------------------------------------------------------
# graph_widest_path — max-min bottleneck capacity (Bellman rounds)
# ---------------------------------------------------------------------------

WIDEST_SOURCE = 0
WIDEST_ROUNDS = 3
_CAP_INF = (1 << 62)


def _widest_oracle() -> str:
    base = f"""
    WITH {_TRADE_EDGES_CTE},
    nodes AS (SELECT n_nationkey AS node FROM nation),
    cap0 AS (
      SELECT node,
             CASE WHEN node = {WIDEST_SOURCE}
                  THEN CAST({_CAP_INF} AS BIGINT) END AS cap
      FROM nodes)"""
    step = """,
    relax{next} AS (
      SELECT e.dst AS node, max(least(p.cap, e.w)) AS best
      FROM cap{cur} p JOIN dir_edges e ON e.src = p.node
      WHERE p.cap IS NOT NULL
      GROUP BY e.dst
    ),
    cap{next} AS (
      SELECT n.node,
             CASE WHEN greatest(coalesce(c.cap, -1), coalesce(r.best, -1)) < 0
                  THEN NULL
                  ELSE greatest(coalesce(c.cap, -1), coalesce(r.best, -1))
             END AS cap
      FROM nodes n
      LEFT JOIN cap{cur} c ON c.node = n.node
      LEFT JOIN relax{next} r ON r.node = n.node
    )"""
    for i in range(WIDEST_ROUNDS):
        base += step.format(next=i + 1, cur=i)
    return (
        base
        + f"""
    SELECT n.n_name AS nation,
           CASE WHEN c.node = {WIDEST_SOURCE} THEN NULL
                ELSE CAST(c.cap AS BIGINT) END AS capacity
    FROM cap{WIDEST_ROUNDS} c JOIN nation n ON n.n_nationkey = c.node
    """
    )


@register(
    "graph_widest_path",
    oracle=_widest_oracle(),
    doc=f"Widest-path (maximum bottleneck capacity) from nation "
    f"{WIDEST_SOURCE} over the weighted trade graph: cap(v) maximizes, "
    "over all paths, the MINIMUM edge weight along the path — the "
    "throughput question ('how much can route from A to v') that neither "
    f"BFS (hops) nor PageRank (mass) answers. {WIDEST_ROUNDS} synchronous "
    "Bellman rounds of cap(v) <- max(cap(v), max over in-edges of "
    "least(cap(u), w)) — a fixed round count mirrored in the oracle's "
    "chained CTEs, and every comparison is on BIGINTs, so the result is "
    "engine-exact whether or not the fixpoint is reached. The edge list "
    "aggregates once from the facts (the only corpus-proportional "
    "shuffle); it is nation^2-bounded, so it is collected once and the "
    "rounds run as exact Python integers on the driver (the "
    "pagerank_nations discipline), capacities emitted as a literal map "
    "over the nation dimension. At general graph scale each round "
    "returns as one co-partitioned hash join + groupBy (the Pregel "
    "message pattern). The source reports NULL capacity (its sentinel "
    "is not a real bottleneck).",
)
def graph_widest_path(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The edge relation is nation-dimension-squared-bounded (<= 625 rows
    # at any fact size — a driver scalar), so after the single
    # corpus-proportional aggregation it is collected ONCE and the fixed
    # Bellman rounds run in exact Python integer arithmetic on the
    # driver (the pagerank_nations discipline: max/least on BIGINTs
    # replicated literally, including the NULL-as-unreached semantics —
    # a node absent from the cap dict is the former NULL cap).
    # Formerly the executed plan unrolled all three rounds as chained
    # broadcast joins + groupBys over the persisted edges per run.
    nation = table(spark, sf_dir, "nation")
    edges = [
        (r["src"], r["dst"], r["w"])
        for r in trade_edges(spark, sf_dir).collect()
    ]
    cap: dict = {WIDEST_SOURCE: _CAP_INF}
    for _ in range(WIDEST_ROUNDS):
        relax: dict = {}
        for s_, d_, w_ in edges:
            if s_ in cap:
                c = min(cap[s_], w_)
                if relax.get(d_, -1) < c:
                    relax[d_] = c
        for d_, best in relax.items():
            if cap.get(d_, -1) < best:
                cap[d_] = best
    pos = {k: v for k, v in sorted(cap.items()) if k != WIDEST_SOURCE}
    cap_lit = (
        F.create_map(*[F.lit(x) for k, v in pos.items() for x in (k, v)])
        if pos
        else F.create_map().cast("map<int,bigint>")
    )
    return nation.select(
        F.col("n_name").alias("nation"),
        F.when(
            F.col("n_nationkey") != WIDEST_SOURCE,
            cap_lit[F.col("n_nationkey")],
        )
        .cast("bigint")
        .alias("capacity"),
    )


# ---------------------------------------------------------------------------
# agg_hll_registers — engine-exact HyperLogLog with group merge
# (register mapping + constants live in graph_common.hll_reg_rows so the
# streaming merge can import them without @register side effects)
# ---------------------------------------------------------------------------


@register(
    "agg_hll_registers",
    oracle=f"""
    WITH h AS (
      SELECT DISTINCT event_type AS cohort,
        CAST(CAST('0x' || substr(md5(CAST(user_id AS VARCHAR) || '@' ||
             CAST(CAST(ts AS DATE) AS VARCHAR)), 1, 15) AS BIGINT) AS BIGINT)
          AS h
      FROM events
      WHERE user_id IS NOT NULL AND ts IS NOT NULL
    ),
    reg AS (
      SELECT cohort, h & {_HLL_M - 1} AS bucket,
             CASE WHEN (h >> {HLL_P}) = 0 THEN {_HLL_REST_BITS + 1}
                  ELSE {_HLL_REST_BITS + 1} - length(bin(h >> {HLL_P}))
             END AS rho
      FROM h
    ),
    regs AS (
      SELECT cohort, bucket, max(rho) AS r FROM reg GROUP BY cohort, bucket
      UNION ALL
      SELECT 'ALL', bucket, max(rho) FROM reg GROUP BY bucket
    ),
    s AS (
      SELECT cohort, CAST(count(*) AS BIGINT) AS n_registers,
             CAST(({_HLL_M} - count(*)) AS BIGINT) * {_HLL_POW} +
             CAST(sum(CAST(1 AS BIGINT) << ({_HLL_REST_BITS + 1} - r))
                  AS BIGINT) AS z_int
      FROM regs GROUP BY cohort
    ),
    e AS (
      SELECT cohort, n_registers,
             CAST({_HLL_ALPHA!r} AS DOUBLE) * {_HLL_M * _HLL_M}
               * {float(_HLL_POW)!r} / z_int AS raw
      FROM s
    ),
    ex AS (
      SELECT event_type AS cohort,
             CAST(count(DISTINCT (user_id, CAST(ts AS DATE))) AS BIGINT)
               AS exact_userdays
      FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
      GROUP BY event_type
      UNION ALL
      SELECT 'ALL',
             CAST(count(DISTINCT (user_id, CAST(ts AS DATE))) AS BIGINT)
      FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
    )
    SELECT e.cohort, e.n_registers,
           CAST(round(CASE WHEN raw <= 2.5 * {_HLL_M}
                            AND n_registers < {_HLL_M}
                      THEN {_HLL_M} * ln({float(_HLL_M)!r} /
                                         ({_HLL_M} - n_registers))
                      ELSE raw END) AS BIGINT) AS est_userdays,
           ex.exact_userdays
    FROM e JOIN ex ON ex.cohort = e.cohort
    """,
    doc=f"HyperLogLog with ENGINE-EXACT registers (p={HLL_P}, m={_HLL_M}): "
    "the 60-bit md5 hash both engines share splits into bucket and rank "
    "(rho via binary length — no float log), the register array is "
    "max-per-bucket, and Z = sum 2^-rho is accumulated as a SCALED BIGINT "
    "(2^53-rho), so the only float ops are one division and the standard "
    "small-range ln correction — the estimate itself hash-verifies against "
    "DuckDB, which a native HLL (Spark's approx_count_distinct) cannot. "
    "Cohorts are per-event-type user-days, and the 'ALL' row demonstrates "
    "the merge property: max of the cohort registers, never a re-scan of "
    "the union. Plan (r14): ONE map-side-deduplicated distinct over "
    "(cohort, user_id, day) feeds the register max AND both exact "
    "countDistinct columns — the fact is scanned once, not three times; "
    "register max absorbs any residual duplicates exactly as before, and "
    "after the distinct everything is register- or cohort-sized. At 100 "
    "TB each partition emits at most m register partials per cohort: the "
    "standard two-level HLL aggregation tree in DataFrame form. The same register mapping "
    "(hll_reg_rows) feeds the streaming merge in streaming/windows.py, "
    "where max-idempotence gives exactly-once estimates under "
    "at-least-once replay.",
)
def agg_hll_registers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mongodb_nats_connector_spark.operators.graph_common import (
        hll_reg_rows_from_userdays,
    )

    ev = table(spark, sf_dir, "events")
    # r14 optimization: ONE distinct pass over the fact feeds registers
    # AND both exact counts (formerly three full scans: register rows +
    # two countDistinct aggregations). md5 is pure in (user_id, day), so
    # registers from the deduplicated relation are identical — register
    # max absorbed the duplicates before; the exact counts needed this
    # distinct shuffle anyway, and now it happens once.
    d = (
        ev.filter(F.col("user_id").isNotNull() & F.col("ts").isNotNull())
        .select(
            F.col("event_type").alias("cohort"),
            "user_id",
            F.col("ts").cast("date").alias("day"),
        )
        .distinct()
        .persist()
    )
    reg = hll_reg_rows_from_userdays(d)
    per = reg.groupBy("cohort", "bucket").agg(F.max("rho").alias("r"))
    # the 'ALL' row is the true register MERGE — max of the per-cohort
    # registers, never a second scan of the fact-level reg relation (per
    # is persisted for the result's lifetime at the return below, so the
    # fact table is scanned once)
    merged = per.groupBy("bucket").agg(F.max("r").alias("r")).select(
        F.lit("ALL").alias("cohort"), "bucket", "r"
    )
    regs = per.select("cohort", "bucket", "r").unionAll(merged)
    # shiftleft's bit-count arg must be a literal in the classic column API;
    # the per-row shift comes from SQL expr instead
    z_term = F.expr(f"shiftleft(CAST(1 AS BIGINT), {_HLL_REST_BITS + 1} - r)")
    s = regs.groupBy("cohort").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_registers"),
        (
            (F.lit(_HLL_M) - F.count(F.lit(1))).cast("bigint") * F.lit(_HLL_POW)
            + F.sum(z_term).cast("bigint")
        ).alias("z_int"),
    )
    raw = (
        F.lit(_HLL_ALPHA)
        * F.lit(_HLL_M * _HLL_M)
        * F.lit(float(_HLL_POW))
        / F.col("z_int")
    )
    est = F.when(
        (raw <= 2.5 * _HLL_M) & (F.col("n_registers") < _HLL_M),
        F.round(
            F.lit(_HLL_M)
            * F.log(F.lit(float(_HLL_M)) / (F.lit(_HLL_M) - F.col("n_registers")))
        ),
    ).otherwise(F.round(raw))
    # exact counts straight off the distinct relation: per-cohort count ==
    # countDistinct(user_id, day) per cohort; the ALL row re-distincts the
    # (already deduplicated) user-day projection — a much smaller relation
    # than the fact it used to re-scan
    ex_per = d.groupBy("cohort").agg(
        F.count(F.lit(1)).cast("bigint").alias("exact_userdays")
    )
    ex_all = (
        d.select("user_id", "day")
        .distinct()
        .agg(F.count(F.lit(1)).cast("bigint").alias("exact_userdays"))
        .select(F.lit("ALL").alias("cohort"), "exact_userdays")
    )
    ex = ex_per.unionAll(ex_all)
    return persist_until_collected(
        d,
        persist_until_collected(
            per,
            s.join(maybe_broadcast(ex), "cohort").select(
                "cohort",
                "n_registers",
                est.cast("bigint").alias("est_userdays"),
                "exact_userdays",
            ),
        ),
    )


# ---------------------------------------------------------------------------
# orders_gini_hhi — revenue concentration (Gini + HHI)
# ---------------------------------------------------------------------------


@register(
    "orders_gini_hhi",
    oracle="""
    WITH per AS (
      SELECT o_custkey,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS rev_c
      FROM orders GROUP BY o_custkey
    ),
    rk AS (
      SELECT o_custkey, rev_c,
             CAST(row_number() OVER (ORDER BY rev_c ASC, o_custkey ASC)
                  AS BIGINT) AS i
      FROM per
    )
    SELECT CAST(count(*) AS BIGINT) AS n_customers,
           round(sum(rev_c) / 100.0, 2) AS total_revenue,
           round(sum((rev_c / 100.0) * (rev_c / 100.0))
                 / ((sum(rev_c) / 100.0) * (sum(rev_c) / 100.0)), 6) AS hhi,
           round(2.0 * sum(i * (rev_c / 100.0))
                 / (count(*) * (sum(rev_c) / 100.0))
                 - (count(*) + 1.0) / count(*), 6) AS gini
    FROM rk
    """,
    doc="Revenue-concentration readout per the two standard inequality "
    "metrics: Herfindahl-Hirschman index (sum of squared revenue shares) "
    "and the Gini coefficient via the rank formula G = 2*sum(i*x_(i))/"
    "(n*sum(x)) - (n+1)/n over revenues sorted ascending (ties broken by "
    "customer key). Per-customer totals are EXACT INTEGER CENTS, so the "
    "rank — the one comparison that decides which row gets which i — is "
    "summation-order-independent and engine-exact (a double sum's last "
    "ulp depends on partial-aggregate merge order). One shuffle to "
    "per-customer totals; the per-customer relation is data-proportional, "
    "so the rank i is the two-pass range-partitioned rank "
    "(plans/ranking.py: boundary literals, per-bucket row_number + "
    "bucket-offset prefix sum) — identical to row_number() by "
    "construction (the oracle keeps the window formulation) — and "
    "everything reduces to a single row.",
)
def orders_gini_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mongodb_nats_connector_spark.plans.ranking import (
        two_pass_global_rank,
    )

    o = table(spark, sf_dir, "orders")
    per = o.groupBy("o_custkey").agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
        .cast("bigint")
        .alias("rev_c")
    )
    # persisted NOW: the two-pass boundary sketch runs at construction and
    # would otherwise recompute the fact rollup; released on result GC
    per = per.persist()
    rk = two_pass_global_rank(
        per, "rev_c", "o_custkey", descending=False, rank_col="i"
    ).select("rev_c", "i")
    n = F.count(F.lit(1))
    rev = F.col("rev_c") / 100.0
    tot = F.sum("rev_c") / 100.0
    from mongodb_nats_connector_spark.plans.caching import release_on_gc

    return release_on_gc(per, rk.agg(
        n.cast("bigint").alias("n_customers"),
        F.round(tot, 2).alias("total_revenue"),
        F.round(F.sum(rev * rev) / (tot * tot), 6).alias("hhi"),
        F.round(
            F.lit(2.0) * F.sum(F.col("i") * rev) / (n * tot)
            - (n + F.lit(1.0)) / n,
            6,
        ).alias("gini"),
    ))


# ---------------------------------------------------------------------------
# agg_log2_histogram_quantiles — HDR-style power-of-2 latency buckets
# ---------------------------------------------------------------------------

_LOG2_SCALE = 100  # centi-unit fixed point: value 6.55 -> tick 655


@register(
    "agg_log2_histogram_quantiles",
    oracle=f"""
    WITH t AS (
      SELECT greatest(CAST(round(value * {_LOG2_SCALE}) AS BIGINT), 1)
               AS tick
      FROM events WHERE value > 0
    ),
    b AS (
      SELECT length(bin(tick)) AS bucket, CAST(count(*) AS BIGINT) AS cnt
      FROM t GROUP BY 1
    ),
    n AS (SELECT CAST(sum(cnt) AS BIGINT) AS n FROM b),
    c AS (
      SELECT bucket, cnt,
             CAST(sum(cnt) OVER (ORDER BY bucket) AS BIGINT) AS cum
      FROM b
    )
    SELECT c.bucket,
           round((CAST(1 AS BIGINT) << (c.bucket - 1)) * 1.0
                 / {_LOG2_SCALE}, 2) AS lo,
           round(((CAST(1 AS BIGINT) << c.bucket) - 1) * 1.0
                 / {_LOG2_SCALE}, 2) AS hi,
           c.cnt, c.cum,
           (c.cum - c.cnt) * 2 < n.n AND c.cum * 2 >= n.n AS is_p50_bucket,
           (c.cum - c.cnt) * 10 < n.n * 9 AND c.cum * 10 >= n.n * 9
             AS is_p90_bucket,
           (c.cum - c.cnt) * 100 < n.n * 99 AND c.cum * 100 >= n.n * 99
             AS is_p99_bucket
    FROM c, n
    """,
    doc="HDR-histogram-style latency profile: positive measurements quantize "
    f"to 1/{_LOG2_SCALE} ticks and bucket by power of two (bucket = bit "
    "length of the tick — an integer op, no float log), the mergeable "
    "fixed-width sketch behind every production latency dashboard. "
    "Cumulative counts mark which bucket contains p50/p90/p99 with pure "
    "integer comparisons (cum crossing q*n), so the row set is engine-"
    "exact. Plan: one map-side-combined groupBy over the facts into at "
    "most 64 buckets; the cumulative window and the 1-row total run on the "
    "bucket-sized aggregate. Merging shards or days = summing bucket "
    "counts — the same merge contract as the KMV/HLL sketches.",
)
def agg_log2_histogram_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").filter(F.col("value") > 0)
    # sub-half-tick positives clamp to tick 1 (bucket 1's true floor),
    # instead of tick 0 silently aliasing into bucket 1 via bin(0)
    t = ev.select(
        F.greatest(
            F.round(F.col("value") * _LOG2_SCALE).cast("bigint"), F.lit(1)
        ).alias("tick")
    )
    b = t.groupBy(F.length(F.bin("tick")).alias("bucket")).agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    n = b.agg(F.sum("cnt").cast("bigint").alias("n"))
    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    c = b.select("bucket", "cnt", F.sum("cnt").over(w).cast("bigint").alias("cum"))
    prev = F.col("cum") - F.col("cnt")

    def _is_bucket(num: int, den: int):
        return (prev * den < F.col("n") * num) & (
            F.col("cum") * den >= F.col("n") * num
        )

    lo = F.expr("shiftleft(CAST(1 AS BIGINT), bucket - 1)")
    hi = F.expr("shiftleft(CAST(1 AS BIGINT), bucket) - 1")
    return c.crossJoin(F.broadcast(n)).select(
        "bucket",
        F.round(lo / _LOG2_SCALE, 2).alias("lo"),
        F.round(hi / _LOG2_SCALE, 2).alias("hi"),
        "cnt",
        "cum",
        _is_bucket(1, 2).alias("is_p50_bucket"),
        _is_bucket(9, 10).alias("is_p90_bucket"),
        _is_bucket(99, 100).alias("is_p99_bucket"),
    )


# ---------------------------------------------------------------------------
# agg_ks_test — two-sample Kolmogorov-Smirnov statistic
# ---------------------------------------------------------------------------

_KS_G1, _KS_G2 = "F", "O"
_KS_COEF_05 = 1.3581015157406195  # sqrt(-ln(0.05/2)/2): alpha = 0.05


@register(
    "agg_ks_test",
    oracle=f"""
    WITH x AS (
      SELECT o_totalprice AS v,
             CASE WHEN o_orderstatus = '{_KS_G1}' THEN 1 ELSE 0 END AS g1,
             CASE WHEN o_orderstatus = '{_KS_G2}' THEN 1 ELSE 0 END AS g2
      FROM orders WHERE o_orderstatus IN ('{_KS_G1}', '{_KS_G2}')
    ),
    n AS (
      SELECT CAST(sum(g1) AS BIGINT) AS n1, CAST(sum(g2) AS BIGINT) AS n2
      FROM x
    ),
    c AS (
      SELECT CAST(sum(g1) OVER (ORDER BY v) AS BIGINT) AS c1,
             CAST(sum(g2) OVER (ORDER BY v) AS BIGINT) AS c2
      FROM x
    )
    SELECT any_value(n.n1) AS n1, any_value(n.n2) AS n2,
           round(max(abs(c.c1 * 1.0 / n.n1 - c.c2 * 1.0 / n.n2)), 6)
             AS ks_d,
           round(CAST({_KS_COEF_05!r} AS DOUBLE)
                 * sqrt(1.0 / any_value(n.n1) + 1.0 / any_value(n.n2)), 6)
             AS crit_05,
           max(abs(c.c1 * 1.0 / n.n1 - c.c2 * 1.0 / n.n2)) >
             CAST({_KS_COEF_05!r} AS DOUBLE)
             * sqrt(1.0 / any_value(n.n1) + 1.0 / any_value(n.n2))
             AS reject_05
    FROM c, n
    """,
    doc=f"Two-sample Kolmogorov-Smirnov test: D = sup |ECDF_{_KS_G1} - "
    f"ECDF_{_KS_G2}| over order totals, with the alpha=0.05 critical value "
    "and reject decision — completing the statistical-test family next to "
    "Welch-t (means) and chi-square (frequencies) with the distribution-"
    "shape test. The default RANGE window frame makes ties contribute "
    "their full mass at each distinct value in BOTH engines, and each "
    "candidate |c1/n1 - c2/n2| is the same pair of exact-integer divisions "
    "on each engine, so the supremum (an order-independent max of "
    "identical doubles) is engine-exact, and neither D nor the critical "
    "value forms a count product, so nothing overflows at any scale. The global ordered window over fact rows "
    "is the documented single-partition cost — at 100 TB replace with the "
    "range-partitioned two-pass prefix sum (events_max_concurrency "
    "pattern), or bin values first (the log2 histogram) for a sketched D.",
)
def agg_ks_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus").isin(_KS_G1, _KS_G2)
    )
    x = o.select(
        F.col("o_totalprice").alias("v"),
        F.when(F.col("o_orderstatus") == _KS_G1, 1).otherwise(0).alias("g1"),
        F.when(F.col("o_orderstatus") == _KS_G2, 1).otherwise(0).alias("g2"),
    )
    w = Window.orderBy("v")  # default RANGE frame: ties aggregate together
    c = x.select(
        F.sum("g1").over(w).cast("bigint").alias("c1"),
        F.sum("g2").over(w).cast("bigint").alias("c2"),
    )
    # n1/n2 fall out of the cumulative counts themselves (the last value
    # of a non-decreasing running count IS the group total), via a
    # full-frame window over the already-single-partition ordered relation
    # — so the fact table is scanned ONCE: no separate totals aggregate,
    # no crossJoin. The per-row division order matches the oracle exactly.
    w_all = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    ct = c.select(
        "c1",
        "c2",
        F.max("c1").over(w_all).alias("n1"),
        F.max("c2").over(w_all).alias("n2"),
    )
    d = F.abs(F.col("c1") / F.col("n1") - F.col("c2") / F.col("n2"))
    # sqrt(1/n1 + 1/n2): algebraically (n1+n2)/(n1*n2) but with no count
    # product, so it cannot overflow BIGINT at any scale
    crit = F.lit(_KS_COEF_05) * F.sqrt(
        F.lit(1.0) / F.col("n1") + F.lit(1.0) / F.col("n2")
    )
    return ct.agg(
        F.first("n1").alias("n1"),
        F.first("n2").alias("n2"),
        F.round(F.max(d), 6).alias("ks_d"),
        F.round(F.first(crit), 6).alias("crit_05"),
        (F.max(d) > F.first(crit)).alias("reject_05"),
    )


# ---------------------------------------------------------------------------
# udf_map_in_arrow — the Arrow-RecordBatch UDF API (zero-pandas path)
# ---------------------------------------------------------------------------


@register(
    "udf_map_in_arrow",
    oracle="""
    SELECT doc_id,
           CAST(length(text) AS BIGINT) AS n_chars,
           CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT)
             AS n_words
    FROM documents
    """,
    doc="``DataFrame.mapInArrow`` — the remaining entry of the Python UDF "
    "surface (scalar / pandas / grouped / mapInPandas / UDTF are covered "
    "by the udf_* family): batches arrive as ``pyarrow.RecordBatch`` and "
    "the transform runs entirely in Arrow compute kernels, skipping the "
    "Arrow->pandas conversion mapInPandas pays (no index materialization, "
    "no object boxing for strings — the fastest Python boundary Spark "
    "offers). Same map-only plan shape as mapInPandas: scan -> Arrow eval, "
    "no shuffle, pushdown intact; batch size is governed by "
    "spark.sql.execution.arrow.maxRecordsPerBatch exactly as the other "
    "Arrow UDFs.",
)
def udf_map_in_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    from collections.abc import Iterator

    import pyarrow as pa
    import pyarrow.compute as pc

    def stats(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            text = batch.column("text")
            n_chars = pc.utf8_length(text)
            # words = chars - spaces + 1, all in Arrow kernels
            spaces = pc.subtract(
                n_chars,
                pc.utf8_length(pc.replace_substring(text, " ", "")),
            )
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column("doc_id"),
                    pc.cast(n_chars, pa.int64()),
                    pc.cast(pc.add(spaces, 1), pa.int64()),
                ],
                ["doc_id", "n_chars", "n_words"],
            )

    docs = table(spark, sf_dir, "documents", parallel=True).select(
        "doc_id", "text"
    )
    return docs.mapInArrow(stats, "doc_id BIGINT, n_chars BIGINT, n_words BIGINT")


# ---------------------------------------------------------------------------
# events_locf_fill — last-observation-carried-forward (IGNORE NULLS)
# ---------------------------------------------------------------------------


@register(
    "events_locf_fill",
    oracle="""
    SELECT event_id, user_id,
           CASE WHEN event_type <> 'error' THEN value END AS v,
           last_value(CASE WHEN event_type <> 'error' THEN value END
                      IGNORE NULLS)
             OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS UNBOUNDED PRECEDING) AS v_filled
    FROM events WHERE ts IS NOT NULL
    """,
    doc="Last-observation-carried-forward (LOCF) gap fill: per user, carry "
    "the most recent valid reading over gaps (error events contribute "
    "NULL) via last_value IGNORE NULLS over an unbounded-preceding ROWS "
    "frame — the sensor/price-series forward-fill every time-series store "
    "exposes, as a standalone query (the same IGNORE NULLS primitive also "
    "powers join_asof_tolerance and last-touch attribution internally). "
    "Ordering ties break on event_id, so the filled "
    "series is engine-exact. One hash partition on user_id; the running "
    "frame is O(1) state per row — at 100 TB this is a single exchange of "
    "the fact table and a linear scan within each user partition, the "
    "same cost profile as any per-key cumulative window.",
)
def events_locf_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    # NULL ts guard: Spark orders NULL ts FIRST in the fill window, DuckDB
    # LAST — a NULL-ts reading would seed or trail the carried series
    # differently per engine, so it never enters the fill
    ev = table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    v = F.when(F.col("event_type") != "error", F.col("value"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        v.alias("v"),
        F.last(v, ignorenulls=True).over(w).alias("v_filled"),
    )
