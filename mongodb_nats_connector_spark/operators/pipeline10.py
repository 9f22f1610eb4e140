"""Round-9 additions: rank-correlation via bounded-grid dominance counting
(Kendall tau-b), Kneser-Ney-smoothed bigram language modeling, MMR diverse
top-k retrieval re-ranking, and a Boruvka minimum spanning tree.

Reference provenance: like pipeline7-9, none of these exist in the
reference's Go core (internal/server/connector.go) — they extend the
engine-side analytics surface a consumer of the connector's published change
streams runs downstream (SURVEY.md §2.3/§2.4).

REGISTRATION ORDER: this module must import LAST in ``registry._load_all()``
(after pipeline9) so its brand-new queries rank behind every already-pending
rank-0 query — a full driver verification window spills past them instead of
displacing edited queries awaiting re-proof.

Cross-engine determinism rules (same discipline as pipeline7-9):
- integer counts end-to-end until one final scalar expression written with
  identical association on both engines (IEEE +,-,*,/ and sqrt are
  correctly rounded, so identical operand order => identical bits; exp/ln
  and round()-of-float are the operations that diverge and are avoided on
  the hash surface);
- sums whose products can exceed 2^63 accumulate as DECIMAL(38,0) in Spark
  and HUGEINT in DuckDB (both exact);
- cosine similarities round to 6 digits at the comparison anchor (the
  proven docs_knn_classify recipe); everything derived from those anchors
  is plain IEEE arithmetic, never re-rounded in Python (Python's round is
  half-to-even, SQL's is half-away — re-rounding driver-side would
  diverge).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mongodb_nats_connector_spark.plans.caching import (
    persist_until_collected,
    release_on_gc,
)
from mongodb_nats_connector_spark.plans.hints import maybe_broadcast
from mongodb_nats_connector_spark.registry import register
from mongodb_nats_connector_spark.sources.tables import table


def _dsum(expr: F.Column) -> F.Column:
    """Exact order-independent sum for integer-valued terms whose total can
    exceed 2^63: DECIMAL(38,0) accumulation (the oracles' HUGEINT twin),
    cast to DOUBLE once at the final scalar arithmetic."""
    return F.sum(expr.cast("decimal(38,0)")).cast("double")


# ---------------------------------------------------------------------------
# agg_kendall_tau — Kendall tau-b via dominance counts on the bounded grid
# ---------------------------------------------------------------------------


@register(
    "agg_kendall_tau",
    oracle="""
    WITH b AS (
      SELECT CAST(round(l_quantity) AS BIGINT) AS x,
             CAST(round(l_extendedprice / 1000) AS BIGINT) AS y
      FROM lineitem
    ),
    cells AS (
      SELECT x, y, CAST(count(*) AS BIGINT) AS c FROM b GROUP BY x, y
    ),
    xs AS (SELECT DISTINCT x FROM cells),
    ys AS (SELECT DISTINCT y FROM cells),
    grid AS (
      SELECT xs.x, ys.y, coalesce(c.c, 0) AS c
      FROM xs CROSS JOIN ys LEFT JOIN cells c ON c.x = xs.x AND c.y = ys.y
    ),
    coln AS (SELECT x, CAST(sum(c) AS BIGINT) AS nx FROM grid GROUP BY x),
    g2 AS (
      SELECT g.x, g.y, g.c, n.nx,
             CAST(coalesce(sum(g.c) OVER (
               PARTITION BY g.x ORDER BY g.y
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS cys,
             CAST(sum(g.c) OVER (
               PARTITION BY g.x ORDER BY g.y
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cyi
      FROM grid g JOIN coln n ON n.x = g.x
    ),
    g3 AS (
      SELECT x, y, c,
             CAST(coalesce(sum(cys) OVER wx, 0) AS BIGINT) AS p,
             CAST(coalesce(sum(nx - cyi) OVER wx, 0) AS BIGINT) AS q
      FROM g2
      WINDOW wx AS (PARTITION BY y ORDER BY x
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    ),
    s AS (
      SELECT CAST(sum(CAST(c AS HUGEINT) * p) AS DOUBLE) AS cc,
             CAST(sum(CAST(c AS HUGEINT) * q) AS DOUBLE) AS dd
      FROM g3
    ),
    m AS (SELECT CAST(count(*) AS BIGINT) AS n FROM b),
    t1 AS (
      SELECT CAST(sum(CAST(cnt AS HUGEINT) * (cnt - 1)) AS DOUBLE) / 2.0
               AS tx
      FROM (SELECT CAST(count(*) AS BIGINT) AS cnt FROM b GROUP BY x)
    ),
    t2 AS (
      SELECT CAST(sum(CAST(cnt AS HUGEINT) * (cnt - 1)) AS DOUBLE) / 2.0
               AS ty
      FROM (SELECT CAST(count(*) AS BIGINT) AS cnt FROM b GROUP BY y)
    )
    SELECT m.n, s.cc AS concordant, s.dd AS discordant,
           (s.cc - s.dd)
             / (sqrt(CAST(m.n AS DOUBLE) * (m.n - 1) / 2.0 - t1.tx)
                * sqrt(CAST(m.n AS DOUBLE) * (m.n - 1) / 2.0 - t2.ty))
             AS kendall_tau_b
    FROM m, s, t1, t2
    WHERE m.n > 1
      AND CAST(m.n AS DOUBLE) * (m.n - 1) / 2.0 - t1.tx > 0
      AND CAST(m.n AS DOUBLE) * (m.n - 1) / 2.0 - t2.ty > 0
    """,
    doc="Kendall tau-b rank correlation between quantity and price (in "
    "1000-unit buckets) with full tie correction — the concordance "
    "complement to agg_spearman_corr (tau weights each PAIR equally; rho "
    "weights rank displacement). The naive statistic is an O(n^2) pair "
    "scan; here both marginals are value-DOMAIN-bounded (~50 quantities x "
    "~110 price buckets), so concordant/discordant pairs come from exact "
    "2-D dominance counts on the dense domain grid: per-column strict "
    "y-prefix counts (window PARTITIONED by x), then strict x-prefix sums "
    "of those (window PARTITIONED by y) — every window is partitioned and "
    "every relation after the first map-combined cell count is grid-sized, "
    "independent of row count. Each concordant pair is counted exactly "
    "once at its dominating cell (strictly-both-greater), each discordant "
    "pair once at its (x-greater, y-smaller) cell. Products accumulate in "
    "DECIMAL(38,0)/HUGEINT (c*P reaches n^2); tau-b itself is one final "
    "IEEE expression (sqrt is correctly rounded, so identical operand "
    "order is bit-identical cross-engine — no round() on the hash "
    "surface).",
)
def agg_kendall_tau(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    b = li.select(
        F.round("l_quantity").cast("bigint").alias("x"),
        F.round(F.col("l_extendedprice") / 1000).cast("bigint").alias("y"),
    )
    cells = b.groupBy("x", "y").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    xs = cells.select("x").distinct()
    ys = cells.select("y").distinct()
    grid = (
        xs.crossJoin(F.broadcast(ys))  # bounded domain grid (~50 x ~110)
        .join(cells, ["x", "y"], "left")
        .select("x", "y", F.coalesce("c", F.lit(0)).alias("c"))
    )
    coln = grid.groupBy("x").agg(F.sum("c").cast("bigint").alias("nx"))
    wy_s = Window.partitionBy("x").orderBy("y").rowsBetween(
        Window.unboundedPreceding, -1
    )
    wy_i = Window.partitionBy("x").orderBy("y").rowsBetween(
        Window.unboundedPreceding, 0
    )
    g2 = grid.join(maybe_broadcast(coln), "x").select(
        "x",
        "y",
        "c",
        "nx",
        F.coalesce(F.sum("c").over(wy_s), F.lit(0)).cast("bigint").alias("cys"),
        F.sum("c").over(wy_i).cast("bigint").alias("cyi"),
    )
    wx = Window.partitionBy("y").orderBy("x").rowsBetween(
        Window.unboundedPreceding, -1
    )
    g3 = g2.select(
        "x",
        "y",
        "c",
        F.coalesce(F.sum("cys").over(wx), F.lit(0)).cast("bigint").alias("p"),
        F.coalesce(F.sum(F.col("nx") - F.col("cyi")).over(wx), F.lit(0))
        .cast("bigint")
        .alias("q"),
    )
    s = g3.agg(
        _dsum(F.col("c") * F.col("p")).alias("cc"),
        _dsum(F.col("c") * F.col("q")).alias("dd"),
    )
    m = b.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    t1 = (
        b.groupBy("x")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        .agg((_dsum(F.col("cnt") * (F.col("cnt") - 1)) / 2.0).alias("tx"))
    )
    t2 = (
        b.groupBy("y")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        .agg((_dsum(F.col("cnt") * (F.col("cnt") - 1)) / 2.0).alias("ty"))
    )
    n0 = F.col("n").cast("double") * (F.col("n") - 1) / 2.0
    out = (
        m.crossJoin(F.broadcast(s))
        .crossJoin(F.broadcast(t1))
        .crossJoin(F.broadcast(t2))
        .filter(
            (F.col("n") > 1)
            & (n0 - F.col("tx") > 0)
            & (n0 - F.col("ty") > 0)
        )
        .select(
            "n",
            F.col("cc").alias("concordant"),
            F.col("dd").alias("discordant"),
            (
                (F.col("cc") - F.col("dd"))
                / (
                    F.sqrt(n0 - F.col("tx"))
                    * F.sqrt(n0 - F.col("ty"))
                )
            ).alias("kendall_tau_b"),
        )
    )
    return persist_until_collected(b, out)


# ---------------------------------------------------------------------------
# text_kneser_ney_bigram — interpolated Kneser-Ney smoothed bigram LM
# ---------------------------------------------------------------------------

KN_D = 0.75  # absolute discount (exact in binary: 3/4)
KN_TOPK = 30


@register(
    "text_kneser_ney_bigram",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ),
    inst AS (
      SELECT t[i] AS w1, t[i + 1] AS w2
      FROM toks, unnest(range(1, len(t))) u(i)
      WHERE len(t) >= 2
    ),
    bg AS (
      SELECT w1, w2, CAST(count(*) AS BIGINT) AS c2
      FROM inst GROUP BY w1, w2
    ),
    lft AS (
      SELECT w1, CAST(sum(c2) AS BIGINT) AS c1,
             CAST(count(*) AS BIGINT) AS nl
      FROM bg GROUP BY w1
    ),
    rgt AS (
      SELECT w2, CAST(count(*) AS BIGINT) AS nr FROM bg GROUP BY w2
    ),
    tt AS (SELECT CAST(count(*) AS BIGINT) AS tot FROM bg)
    SELECT b.w1, b.w2, b.c2,
           (b.c2 * 1.0) / l.c1 AS mle_prob,
           (b.c2 - {KN_D!r}) / l.c1
             + (({KN_D!r} * l.nl) / l.c1) * ((r.nr * 1.0) / tt.tot)
             AS kn_prob
    FROM bg b JOIN lft l ON l.w1 = b.w1 JOIN rgt r ON r.w2 = b.w2
    CROSS JOIN tt
    ORDER BY b.c2 DESC, b.w1, b.w2
    LIMIT {KN_TOPK}
    """,
    doc=f"Interpolated Kneser-Ney bigram language model (absolute discount "
    f"D={KN_D}) over the documents corpus — the smoothing that upgrades "
    "bigram_lm_surprisal's MLE: P(w2|w1) = (c(w1,w2)-D)/c(w1.) + "
    "(D*N1+(w1,.)/c(w1.)) * N1+(.,w2)/|bigram types| — the continuation "
    "probability ranks words by how many CONTEXTS they follow, not raw "
    "frequency (the classic 'San Francisco' correction). All model "
    "statistics are exact integer counts reduced map-side at vocabulary "
    "size; the probability is one final IEEE expression written with "
    "identical association on both engines (D=0.75 is exact in binary; "
    "+,*,/ are correctly rounded, so no round() is needed on the hash "
    f"surface). Top-{KN_TOPK} bigrams ship via TakeOrderedAndProject "
    "(per-partition heads merged on the driver, never a global sort). At "
    "trillion-token scale every relation here is model-sized, not "
    "corpus-sized, and the scoring join against instance streams is the "
    "same broadcast-or-copartitioned choice as bigram_lm_surprisal.",
)
def text_kneser_ney_bigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents", parallel=True)
    toks = F.split("text", " ")
    inst = (
        docs.select(
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size(toks) - 1),
                    lambda i: F.struct(
                        F.element_at(toks, i).alias("w1"),
                        F.element_at(toks, i + 1).alias("w2"),
                    ),
                )
            ).alias("p")
        )
        .filter(F.size(toks) >= 2)
        .select("p.w1", "p.w2")
    )
    bg = inst.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).cast("bigint").alias("c2")
    )
    lft = bg.groupBy("w1").agg(
        F.sum("c2").cast("bigint").alias("c1"),
        F.count(F.lit(1)).cast("bigint").alias("nl"),
    )
    rgt = bg.groupBy("w2").agg(F.count(F.lit(1)).cast("bigint").alias("nr"))
    tt = bg.agg(F.count(F.lit(1)).cast("bigint").alias("tot"))
    scored = (
        bg.join(maybe_broadcast(lft), "w1")
        .join(maybe_broadcast(rgt), "w2")
        .crossJoin(F.broadcast(tt))
    )
    out = scored.select(
        "w1",
        "w2",
        "c2",
        ((F.col("c2") * 1.0) / F.col("c1")).alias("mle_prob"),
        (
            (F.col("c2") - F.lit(KN_D)) / F.col("c1")
            + ((F.lit(KN_D) * F.col("nl")) / F.col("c1"))
            * ((F.col("nr") * 1.0) / F.col("tot"))
        ).alias("kn_prob"),
    ).orderBy(F.col("c2").desc(), "w1", "w2").limit(KN_TOPK)
    return persist_until_collected(bg, out)


# ---------------------------------------------------------------------------
# similarity_mmr_topk — maximal-marginal-relevance diverse top-k re-ranking
# ---------------------------------------------------------------------------

MMR_QUERY_ID = 0
MMR_POOL = 50
MMR_K = 8
MMR_LAMBDA = 0.7  # relevance weight; (1 - lambda) = 0.3 diversity weight


def _mmr_oracle() -> str:
    steps = []
    for i in range(2, MMR_K + 1):
        prev = f"p{i - 1}"
        steps.append(f"""
    s{i} AS MATERIALIZED (
      SELECT c.vec_id, c.label, c.v, c.rel,
             {MMR_LAMBDA!r} * c.rel - {1 - MMR_LAMBDA!r}
               * (SELECT max(round(list_cosine_similarity(c.v, s.v), 6))
                  FROM {prev} s) AS score
      FROM cand c
      WHERE c.vec_id NOT IN (SELECT vec_id FROM {prev})
      ORDER BY score DESC, c.vec_id LIMIT 1
    ),
    p{i} AS (
      SELECT vec_id, label, v, rel, step FROM {prev}
      UNION ALL
      SELECT vec_id, label, v, rel, {i} AS step FROM s{i}
    )""")
    return f"""
    WITH e AS (
      SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ),
    q AS (SELECT v AS qv FROM e WHERE vec_id = {MMR_QUERY_ID}),
    cand AS MATERIALIZED (
      SELECT e.vec_id, e.label, e.v,
             round(list_cosine_similarity(q.qv, e.v), 6) AS rel
      FROM e, q
      WHERE e.vec_id <> {MMR_QUERY_ID}
        AND NOT isnan(round(list_cosine_similarity(q.qv, e.v), 6))
      ORDER BY rel DESC, e.vec_id LIMIT {MMR_POOL}
    ),
    p1 AS (
      SELECT vec_id, label, v, rel, 1 AS step FROM cand
      ORDER BY rel DESC, vec_id LIMIT 1
    ),{",".join(steps)}
    SELECT CAST(step AS BIGINT) AS step, vec_id,
           CAST(label AS BIGINT) AS label, rel AS relevance
    FROM p{MMR_K}
    """


@register(
    "similarity_mmr_topk",
    oracle=_mmr_oracle(),
    doc=f"Maximal-marginal-relevance diverse top-{MMR_K} retrieval: greedy "
    f"re-ranking of the top-{MMR_POOL} cosine candidates for query vector "
    f"{MMR_QUERY_ID}, each step picking argmax of lambda*rel - "
    f"(1-lambda)*max-sim-to-selected (lambda={MMR_LAMBDA}) — the "
    "standard redundancy-suppressing re-ranker between ANN candidate "
    "generation and a RAG context window (pure cosine top-k returns "
    "near-duplicates; MMR forces coverage). Architecture mirrors "
    "production retrieval: candidate generation + the pool's pairwise "
    "similarity matrix are DISTRIBUTED (broadcast-NLJ over the bounded "
    "pool, the docs_knn_classify contract; the corpus-scale path swaps in "
    "the IVF/LSH generators), while the greedy selection runs driver-side "
    f"over the collected {MMR_POOL}x{MMR_POOL} rounded-similarity matrix "
    "— a bounded constant-size collect (the k-means-centroid precedent), "
    "NOT a data-proportional loop. Determinism: cosines round to 6 as the "
    "cross-engine anchor; MMR scores are derived by IEEE *,- on those "
    "anchors and NEVER re-rounded (Python round is half-to-even, SQL "
    "half-away), so Python and DuckDB order pairs identically; ties break "
    "on vec_id.",
)
def similarity_mmr_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mongodb_nats_connector_spark.functions.vectors import cosine_fast

    e = table(spark, sf_dir, "embeddings", parallel=True).select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("v")
    )
    q = e.filter(F.col("vec_id") == MMR_QUERY_ID).select(
        F.col("v").alias("qv")
    )
    cand = (
        e.filter(F.col("vec_id") != MMR_QUERY_ID)
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            "label",
            "v",
            F.round(cosine_fast(F.col("qv"), F.col("v")), 6).alias("rel"),
        )
        .filter(~F.isnan(F.col("rel")))
        .orderBy(F.col("rel").desc(), "vec_id")
        .limit(MMR_POOL)
    )
    # persisted NOW (not via persist_until_collected) because the bounded
    # collects below need the cache during construction; released when the
    # returned result is GC'd (release_on_gc at the bottom)
    cand = cand.persist()
    # pairwise similarity matrix of the bounded pool, computed distributed
    c1 = cand.select(
        F.col("vec_id").alias("id1"), F.col("v").alias("v1")
    )
    c2 = cand.select(
        F.col("vec_id").alias("id2"), F.col("v").alias("v2")
    )
    pair_rows = (
        c1.join(F.broadcast(c2), F.col("id1") < F.col("id2"))
        .select(
            "id1",
            "id2",
            F.round(cosine_fast(F.col("v1"), F.col("v2")), 6).alias("sim"),
        )
        .collect()  # bounded: POOL*(POOL-1)/2 rows, data-independent
    )
    rel_rows = cand.select("vec_id", "rel").collect()  # bounded: POOL rows
    rel = {r["vec_id"]: r["rel"] for r in rel_rows}
    sim = {}
    for r in pair_rows:
        sim[(r["id1"], r["id2"])] = r["sim"]
        sim[(r["id2"], r["id1"])] = r["sim"]
    # greedy MMR on the anchored (rounded) values — IEEE arithmetic only,
    # no Python-side rounding (see doc)
    selected: list[int] = []
    order: dict[int, int] = {}
    remaining = sorted(rel)
    for step in range(1, MMR_K + 1):
        if not remaining:
            break
        if not selected:
            best = max(remaining, key=lambda c: (rel[c], -c))
        else:
            best = max(
                remaining,
                key=lambda c: (
                    MMR_LAMBDA * rel[c]
                    - (1 - MMR_LAMBDA)
                    * max(sim[(c, s)] for s in selected),
                    -c,
                ),
            )
        selected.append(best)
        order[best] = step
        remaining.remove(best)
    steps_df = spark.createDataFrame(
        [(int(v), int(s)) for v, s in order.items()], "vec_id long, step long"
    )
    out = cand.join(F.broadcast(steps_df), "vec_id").select(
        "step",
        "vec_id",
        F.col("label").cast("bigint").alias("label"),
        F.col("rel").alias("relevance"),
    )
    return release_on_gc(cand, out)


# ---------------------------------------------------------------------------
# graph_mst_boruvka — minimum spanning tree of the nation trade graph
# ---------------------------------------------------------------------------

MST_MAX_NODES = 25  # nation dimension: fixed 25 at every TPC-H scale
_MST_PRIM_STEPS = "".join(
    f""",
    e{i} AS MATERIALIZED (
      SELECT u.a, u.b, u.w FROM uw u
      WHERE (u.a IN (SELECT node FROM v{i - 1}))
            <> (u.b IN (SELECT node FROM v{i - 1}))
      ORDER BY u.w, u.a, u.b LIMIT 1
    ),
    v{i} AS MATERIALIZED (
      SELECT node FROM v{i - 1}
      UNION
      SELECT CASE WHEN e{i}.a IN (SELECT node FROM v{i - 1})
                  THEN e{i}.b ELSE e{i}.a END AS node
      FROM e{i}
    )"""
    for i in range(1, MST_MAX_NODES)
)
_MST_UNION = "\n      UNION ALL ".join(
    f"SELECT a, b, w FROM e{i}" for i in range(1, MST_MAX_NODES)
)


@register(
    "graph_mst_boruvka",
    oracle=f"""
    WITH dir_edges AS (
      SELECT c.c_nationkey AS src, s.s_nationkey AS dst, count(*) AS cnt
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      WHERE c.c_nationkey <> s.s_nationkey GROUP BY 1, 2
    ),
    uw AS MATERIALIZED (
      SELECT least(src, dst) AS a, greatest(src, dst) AS b,
             CAST(sum(cnt) AS BIGINT) AS w
      FROM dir_edges GROUP BY 1, 2
    ),
    v0 AS MATERIALIZED (SELECT min(a) AS node FROM uw){_MST_PRIM_STEPS}
    SELECT a, b, w FROM ({_MST_UNION})
    """,
    doc="Minimum spanning tree of the undirected nation trade graph "
    "(weight = lineitem volume; the MST is the cheapest backbone / "
    "single-linkage dendrogram of the trade network). Spark side runs "
    "BORUVKA — each round every component selects its minimum outgoing "
    "edge under the TOTAL order (w, a, b) and components merge, so the "
    "number of rounds is log2(V) — the classic distributed MST (the "
    "per-component argmin is one min(struct) aggregation; the only "
    "driver-side state is the component partition over the NATION "
    "dimension, <= 25 entries, the bounded-collect contract of the "
    "k-means/BPE loops; at web-graph scale the component merge swaps to "
    "the shuffle-only large-star/small-star relabeling already proven in "
    "graph_cc_bigstar). The oracle runs PRIM unrolled over the fixed "
    "25-nation dimension instead: under a total tie-breaking edge order "
    "the MST is UNIQUE (the infinitesimal-perturbation argument), so "
    "Boruvka and Prim provably return the identical edge set — the "
    "cross-algorithm agreement IS the correctness check. Requires a "
    "connected graph (holds at every test SF; 25 nodes, 195+ edges).",
)
def graph_mst_boruvka(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mongodb_nats_connector_spark.operators.graph_common import (
        trade_edges,
    )

    de = trade_edges(spark, sf_dir)
    uw = (
        de.select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
            "w",
        )
        .groupBy("a", "b")
        .agg(F.sum("w").cast("bigint").alias("w"))
    )
    # persisted NOW: the Boruvka rounds below collect against uw repeatedly
    # during construction; released when the returned result is GC'd
    uw = uw.persist()
    nodes = [
        r["n"]
        for r in uw.select(F.col("a").alias("n"))
        .unionAll(uw.select(F.col("b").alias("n")))
        .distinct()
        .collect()  # bounded: nation dimension (<= 25)
    ]
    comp = {n: n for n in nodes}

    def find(x: int) -> int:
        while comp[x] != x:
            comp[x] = comp[comp[x]]
            x = comp[x]
        return x

    mst_keys: list[int] = []
    for _ in range(8):  # Boruvka terminates in ceil(log2(V)) rounds
        roots = {n: find(n) for n in nodes}
        mapping = F.create_map(
            *[F.lit(v) for kv in roots.items() for v in kv]
        )
        ec = uw.select(
            "a", "b", "w",
            mapping[F.col("a")].alias("ca"),
            mapping[F.col("b")].alias("cb"),
        ).filter(F.col("ca") != F.col("cb"))
        cands = ec.select(
            F.col("ca").alias("comp"), F.struct("w", "a", "b").alias("e")
        ).unionAll(
            ec.select(
                F.col("cb").alias("comp"), F.struct("w", "a", "b").alias("e")
            )
        )
        chosen = (
            cands.groupBy("comp")
            .agg(F.min("e").alias("e"))
            .select("e.w", "e.a", "e.b")
            .collect()  # bounded: one row per live component (<= 25)
        )
        if not chosen:
            break
        for r in chosen:
            ra, rb = find(r["a"]), find(r["b"])
            if ra != rb:
                comp[ra] = rb
                mst_keys.append(r["a"] * 100 + r["b"])
    out = uw.filter(
        (F.col("a") * 100 + F.col("b")).isin(mst_keys)
    ).select("a", "b", "w")
    return release_on_gc(uw, out)
