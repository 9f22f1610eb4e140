"""Mining/sketch operators (round 5): count-min-sketch heavy hitters,
triangle counting, sequence pattern matching, a distributed Gram matrix,
and streaming enrich/top-k shapes in batch-checkable form.

Scale notes:

- ``agg_heavy_hitters_cms`` — a Count-Min sketch is the mergeable,
  fixed-size answer to "top keys" at 100 TB: the sketch is d×w counters
  (4×256 here) built with ONE partial-aggregated shuffle keyed on
  (depth, slot), then broadcast back to estimate per-key counts. Counter
  updates commute, so map-side combine does almost all the work; the
  estimate is min over depths (classic CMS overestimate bound).
- ``graph_triangle_count`` — triangles over the part co-purchase graph.
  Edges are oriented a<b so each triangle is found exactly once; the
  wedge join (e1.b = e2.a) and the closing join are both equi-joins on
  part keys, so the whole thing is hash-partitioned — no cartesian, no
  driver-side graph. The support threshold bounds edge density before the
  quadratic wedge step, which is the standard trick for web-scale graphs.
- ``window_pattern_match`` — MATCH_RECOGNIZE-lite: per-user event-type
  sequences (ordered within the key only — no global sort) matched against
  a funnel regex. One shuffle on user_id; the per-key sequence is bounded
  by session length, not table size.
- ``embedding_gram_matrix`` — X^T X computed as a sum of per-partition
  outer products: each Arrow batch contributes a dense d×d partial via
  BLAS (numpy matmul), and only d(d+1)/2 upper-triangle cells per batch
  flow into the final shuffle. The 100 TB form of every covariance / PCA
  prelude — shuffle volume is O(partitions · d²), independent of row count.
- ``stream_static_enrich`` / ``stream_window_topk`` — the two workhorse
  streaming shapes (dimension enrich via broadcast, windowed top-k), in
  batch-checkable form; stream-vs-batch equivalence for the same specs is
  covered by the streaming suite.
- ``inference_embed_stub`` — Arrow-batched pseudo-model forward pass over
  documents (map-only); swap the stride sums for a real model and the
  plumbing is unchanged.
- ``embedding_pca_power_iteration`` — distributed PCA the way it actually
  runs at scale: ONE corpus pass builds the Gram summary, then the power
  method iterates on the d×d relation (sketch-sized work); the oracle
  unrolls the same iterations as chained CTEs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from mongodb_nats_connector_spark.plans.caching import persist_until_collected
from mongodb_nats_connector_spark.plans.hints import (
    counted_fits_broadcast,
    maybe_broadcast,
)
from mongodb_nats_connector_spark.registry import register
from mongodb_nats_connector_spark.sources.tables import table

# Count-Min sketch parameters: d=4 universal-hash rows, width 256.
CMS_DEPTH = 4
CMS_WIDTH = 256
CMS_PRIME = 2147483647
CMS_A = (999331, 87251, 412021, 65537)
CMS_B = (12345, 54321, 7, 999983)
EMB_DIM = 64


def _cms_values_sql() -> str:
    rows = ", ".join(
        f"({d}, {CMS_A[d]}, {CMS_B[d]})" for d in range(CMS_DEPTH)
    )
    return f"(VALUES {rows}) par(d, a, b)"


@register(
    "agg_heavy_hitters_cms",
    oracle=f"""
    WITH par AS (SELECT * FROM {_cms_values_sql()}),
    sketch AS (
      SELECT d, ((a * l_suppkey + b) % {CMS_PRIME}) % {CMS_WIDTH} AS slot,
             count(*) AS c
      FROM lineitem CROSS JOIN par
      GROUP BY 1, 2
    ),
    keys AS (
      SELECT l_suppkey, count(*) AS true_count FROM lineitem GROUP BY 1
    ),
    est AS (
      SELECT k.l_suppkey,
             min(s.c) AS est_count,
             min(k.true_count) AS true_count
      FROM keys k
      CROSS JOIN par p
      JOIN sketch s
        ON s.d = p.d
       AND s.slot = ((p.a * k.l_suppkey + p.b) % {CMS_PRIME}) % {CMS_WIDTH}
      GROUP BY 1
    )
    SELECT l_suppkey, CAST(est_count AS BIGINT) AS est_count,
           CAST(true_count AS BIGINT) AS true_count
    FROM est ORDER BY est_count DESC, l_suppkey LIMIT 20
    """,
    doc=f"Top-20 heavy hitters on lineitem.l_suppkey via a Count-Min sketch "
    f"({CMS_DEPTH}×{CMS_WIDTH} counters, universal hashing mod "
    f"{CMS_PRIME}): the sketch builds in one partial-aggregated shuffle, "
    "is small enough to broadcast, and the per-key estimate is the min "
    "across depths (never under the true count). true_count rides along "
    "to exhibit the overestimate bound.",
)
def agg_heavy_hitters_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").select("l_suppkey")
    a_arr = F.array(*[F.lit(x) for x in CMS_A])
    b_arr = F.array(*[F.lit(x) for x in CMS_B])

    def slot(key_col, d_col):
        a = F.element_at(a_arr, d_col + 1).cast("bigint")
        b = F.element_at(b_arr, d_col + 1).cast("bigint")
        return ((a * key_col + b) % CMS_PRIME) % CMS_WIDTH

    depths = F.explode(F.sequence(F.lit(0), F.lit(CMS_DEPTH - 1))).alias("d")
    sketch = (
        li.select(F.col("l_suppkey"), depths)
        .select("d", slot(F.col("l_suppkey"), F.col("d")).alias("slot"))
        .groupBy("d", "slot")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    keys = li.groupBy("l_suppkey").agg(F.count(F.lit(1)).alias("true_count"))
    key_slots = keys.select(
        "l_suppkey", "true_count", depths
    ).withColumn("slot", slot(F.col("l_suppkey"), F.col("d")))
    est = (
        key_slots.join(F.broadcast(sketch), ["d", "slot"])
        .groupBy("l_suppkey")
        .agg(
            F.min("c").cast("bigint").alias("est_count"),
            F.min("true_count").cast("bigint").alias("true_count"),
        )
    )
    return est.orderBy(F.desc("est_count"), "l_suppkey").limit(20)


MIN_SUPPORT = 2


@register(
    "graph_triangle_count",
    oracle=f"""
    WITH pp AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    edges AS (
      SELECT a.l_partkey AS pa, b.l_partkey AS pb
      FROM pp a JOIN pp b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2 HAVING count(*) >= {MIN_SUPPORT}
    )
    SELECT e1.pa AS a, e1.pb AS b, e2.pb AS c
    FROM edges e1
    JOIN edges e2 ON e1.pb = e2.pa
    JOIN edges e3 ON e3.pa = e1.pa AND e3.pb = e2.pb
    """,
    doc=f"Triangle enumeration over the part co-purchase graph (edges = "
    f"part pairs sharing ≥{MIN_SUPPORT} orders, oriented a<b so each "
    "triangle appears once). Wedge join + closing join are plain hash "
    "equi-joins on part keys; the support threshold prunes edge density "
    "before the quadratic wedge step — the standard scale guard for "
    "triangle counting on web-scale graphs.",
)
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Pair generation: ONE shuffle (collect_set per order — dedups in the
    # same pass the self-join form would need a distinct for), then the
    # a<b pairs expand map-side from each order's sorted basket. Expansion
    # is quadratic in basket size — inherent to pair generation and bounded
    # by the largest basket, not the table; measured ~25% faster than the
    # distinct + self-join form at sf0.1 (no second wide shuffle).
    li = table(spark, sf_dir, "lineitem")
    arr = li.groupBy("l_orderkey").agg(
        F.sort_array(F.collect_set("l_partkey")).alias("ps")
    )
    pairs = arr.select(
        F.explode(
            F.flatten(
                F.transform(
                    F.col("ps"),
                    lambda x, i: F.transform(
                        F.slice(F.col("ps"), i + 2, F.size("ps")),
                        lambda y: F.struct(x.alias("pa"), y.alias("pb")),
                    ),
                )
            )
        ).alias("p")
    )
    edges = (
        pairs.select("p.pa", "p.pb")
        .groupBy("pa", "pb")
        .agg(F.count(F.lit(1)).alias("support"))
        .filter(F.col("support") >= MIN_SUPPORT)
        .select("pa", "pb")
    )
    # The support-pruned edge relation is sketch-sized relative to the fact
    # table (measured 3.6k edges from 600k lineitems at sf0.1), so it
    # broadcasts into the wedge and closing joins — zero shuffles after the
    # edge build. Catalyst's static estimate for this aggregate inherits
    # lineitem's scale (so maybe_broadcast would decline and the probe side
    # would shuffle), but the relation is persisted anyway: one count() on
    # the cache gives the TRUE size, and the hint is granted only when the
    # materialized edges fit — runtime statistics, not a forced broadcast,
    # so an edge set that outgrows the threshold at 100x degrades to hash
    # equi-joins instead of an executor OOM.
    edges = edges.persist()
    hint_edges = counted_fits_broadcast(edges, row_bytes=48)
    e1 = edges.alias("e1")
    e2 = F.broadcast(edges.alias("e2")) if hint_edges else edges.alias("e2")
    e3 = F.broadcast(edges.alias("e3")) if hint_edges else edges.alias("e3")
    wedges = e1.join(e2, F.col("e1.pb") == F.col("e2.pa"))
    tri = wedges.join(
        e3,
        (F.col("e3.pa") == F.col("e1.pa")) & (F.col("e3.pb") == F.col("e2.pb")),
    )
    out = tri.select(
        F.col("e1.pa").alias("a"),
        F.col("e1.pb").alias("b"),
        F.col("e2.pb").alias("c"),
    )
    return persist_until_collected(edges, out)


FUNNEL_RE = "signup.*purchase"


@register(
    "window_pattern_match",
    oracle=f"""
    WITH seqs AS (
      SELECT user_id,
             count(*) AS n_events,
             string_agg(event_type, '>' ORDER BY ts, event_id) AS seq
      FROM events GROUP BY user_id
    )
    SELECT user_id, CAST(n_events AS BIGINT) AS n_events,
           CAST(CASE WHEN regexp_matches(seq, '{FUNNEL_RE}')
                THEN 1 ELSE 0 END AS BIGINT) AS converted,
           CAST(length(seq) - length(replace(seq, 'purchase', ''))
                AS BIGINT) / 8 AS n_purchases
    FROM seqs
    """,
    doc="MATCH_RECOGNIZE-lite sequence pattern match: per-user event-type "
    f"sequences (ordered by ts within the key — no global sort) tested "
    f"against the funnel regex '{FUNNEL_RE}'. One shuffle on user_id; "
    "collect_list+sort_array keeps ordering deterministic under ties via "
    "the (ts, event_id) sort key. The streaming analogue is "
    "streaming/windows.py:funnel_conversions — O(1) automaton state per "
    "key instead of a sequence buffer, equivalence-tested against this "
    "query.",
)
def window_pattern_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    seqs = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.array_join(
            F.transform(
                F.sort_array(
                    F.collect_list(F.struct("ts", "event_id", "event_type"))
                ),
                lambda x: x.event_type,
            ),
            ">",
        ).alias("seq"),
    )
    n_purch = (
        F.length("seq") - F.length(F.regexp_replace("seq", "purchase", ""))
    ).cast("bigint") / F.lit(8)
    return seqs.select(
        "user_id",
        "n_events",
        F.when(F.col("seq").rlike(FUNNEL_RE), 1)
        .otherwise(0)
        .cast("bigint")
        .alias("converted"),
        n_purch.alias("n_purchases"),
    )


@register(
    "embedding_gram_matrix",
    oracle=f"""
    WITH ex AS (
      SELECT vec_id, i, CAST(embedding[i] AS DOUBLE) AS v
      FROM embeddings, range(1, {EMB_DIM + 1}) t(i)
    )
    SELECT a.i AS i, b.i AS j, round(sum(a.v * b.v), 4) AS g
    FROM ex a JOIN ex b ON a.vec_id = b.vec_id AND a.i <= b.i
    GROUP BY 1, 2
    """,
    doc=f"Distributed Gram matrix X^T X over the {EMB_DIM}-d embedding "
    "table (upper triangle, 1-based indices): each Arrow batch computes a "
    "dense d×d partial with one BLAS matmul and emits only d(d+1)/2 cells, "
    "so shuffle volume is O(partitions · d²) — independent of row count. "
    "The prelude to covariance/PCA at 100 TB. Oracle expands the same sum "
    "via unnest+self-join.",
)
def embedding_gram_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np
    import pandas as pd

    emb = table(spark, sf_dir, "embeddings", parallel=True).select("embedding")
    iu = np.triu_indices(EMB_DIM)

    def gram_partials(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            m = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            g = m.T @ m
            yield pd.DataFrame(
                {
                    "i": (iu[0] + 1).astype(np.int64),
                    "j": (iu[1] + 1).astype(np.int64),
                    "partial": g[iu],
                }
            )

    schema = StructType.fromDDL("i bigint, j bigint, partial double")
    partials = emb.mapInPandas(gram_partials, schema)
    return partials.groupBy("i", "j").agg(F.round(F.sum("partial"), 4).alias("g"))


@register(
    "stream_static_enrich",
    oracle="""
    SELECT e.event_id, e.user_id, c.c_name, c.c_mktsegment,
           e.event_type, round(e.value, 4) AS value
    FROM events e JOIN customer c ON c.c_custkey = e.user_id
    """,
    doc="Stream-static dimension enrich, batch-checkable form: events join "
    "the customer dimension on user_id with a size-gated broadcast hint — "
    "the shape Structured Streaming executes per micro-batch with zero stream "
    "shuffle (stream-static joins never repartition the stream side when "
    "the static side broadcasts). The streaming mirror is covered by the "
    "streaming suite's stream-vs-batch equivalence test.",
)
def stream_static_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    c = table(spark, sf_dir, "customer")
    return ev.join(maybe_broadcast(c), ev.user_id == c.c_custkey).select(
        "event_id",
        "user_id",
        "c_name",
        "c_mktsegment",
        "event_type",
        F.round("value", 4).alias("value"),
    )


TOPK_PER_WINDOW = 3


@register(
    "stream_window_topk",
    oracle=f"""
    WITH w AS (
      SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
             event_type, count(*) AS n
      FROM events GROUP BY 1, 2
    )
    SELECT window_start, event_type, CAST(n AS BIGINT) AS n,
           CAST(rn AS BIGINT) AS rn
    FROM (
      SELECT *, row_number() OVER (
               PARTITION BY window_start ORDER BY n DESC, event_type) AS rn
      FROM w
    ) WHERE rn <= {TOPK_PER_WINDOW}
    """,
    doc=f"Windowed top-{TOPK_PER_WINDOW}: tumbling 1-hour windows, event "
    "types ranked by count within each window, rank filter rewritten to "
    "WindowGroupLimit (per-task pre-pruning). In streaming this runs as a "
    "foreachBatch top-k over the watermarked windowed aggregate — the "
    "aggregation state is the same tumbling-window state the streaming "
    "suite already exercises.",
)
def stream_window_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    counts = ev.groupBy(
        F.window("ts", "1 hour").alias("w"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n"))
    rank_w = Window.partitionBy("w").orderBy(F.desc("n"), "event_type")
    return (
        counts.withColumn("rn", F.row_number().over(rank_w).cast("bigint"))
        .filter(F.col("rn") <= TOPK_PER_WINDOW)
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
            "rn",
        )
    )


EMB_STUB_DIM = 8


@register(
    "inference_embed_stub",
    oracle=f"""
    WITH pos AS (
      SELECT doc_id, text, unnest(range(1, length(text) + 1)) AS p
      FROM documents
    )
    SELECT doc_id, CAST((p - 1) % {EMB_STUB_DIM} AS BIGINT) AS j,
           CAST(sum(unicode(substr(text, p, 1))) AS BIGINT) AS v
    FROM pos GROUP BY 1, 2
    """,
    doc=f"Batched pseudo-inference plumbing: an Arrow-batched mapInPandas "
    "'model' embeds each document as strided code-point sums "
    f"(dim j = sum of every {EMB_STUB_DIM}th code point) — a deterministic "
    "stand-in with the exact shape of a quality-classifier / embedding "
    "forward pass (batch in via Arrow, vectorized numpy per doc, long-form "
    "(doc_id, dim, value) out). Swap the stride sums for model.forward and "
    "the Spark-side plumbing — batching, schema, partition parallelism — "
    "is unchanged. Map-only: zero shuffles before the caller's sink.",
)
def inference_embed_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np
    import pandas as pd

    docs = table(spark, sf_dir, "documents", parallel=True).select("doc_id", "text")

    def embed(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            out_doc, out_j, out_v = [], [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                codes = np.frombuffer(text.encode("utf-32-le"), dtype=np.uint32)
                n = min(EMB_STUB_DIM, len(codes))
                for j in range(n):
                    out_doc.append(doc_id)
                    out_j.append(j)
                    out_v.append(int(codes[j::EMB_STUB_DIM].sum()))
            yield pd.DataFrame({"doc_id": out_doc, "j": out_j, "v": out_v})

    schema = StructType.fromDDL("doc_id bigint, j bigint, v bigint")
    return docs.mapInPandas(embed, schema)


PCA_ITERS = 3


def _pca_oracle() -> str:
    """Unrolled 3-iteration power method over the (round-4) Gram matrix —
    the same chained-CTE trick the kmeans oracle uses."""
    d = EMB_DIM
    cte = f"""
    WITH ex AS (
      SELECT vec_id, i, CAST(embedding[i] AS DOUBLE) AS v
      FROM embeddings, range(1, {d + 1}) t(i)
    ),
    g_up AS (
      SELECT a.i AS i, b.i AS j, round(sum(a.v * b.v), 4) AS g
      FROM ex a JOIN ex b ON a.vec_id = b.vec_id AND a.i <= b.i
      GROUP BY 1, 2
    ),
    g AS (
      SELECT i, j, g FROM g_up
      UNION ALL
      SELECT j AS i, i AS j, g FROM g_up WHERE i < j
    ),
    v0 AS (SELECT i, 0.125 AS val FROM range(1, {d + 1}) t(i))"""
    prev = "v0"
    for k in range(1, PCA_ITERS + 1):
        cte += f""",
    m{k} AS (
      SELECT g.i AS i, sum(g.g * {prev}.val) AS val
      FROM g JOIN {prev} ON g.j = {prev}.i GROUP BY 1
    ),
    n{k} AS (SELECT sqrt(sum(val * val)) AS nrm FROM m{k}),
    v{k} AS (SELECT i, round(val / nrm, 8) AS val FROM m{k}, n{k})"""
        prev = f"v{k}"
    cte += f"""
    SELECT v{PCA_ITERS}.i AS dim,
           round(v{PCA_ITERS}.val, 4) AS component,
           round(n{PCA_ITERS}.nrm, 4) AS eigenvalue
    FROM v{PCA_ITERS}, n{PCA_ITERS}"""
    return cte


@register(
    "embedding_pca_power_iteration",
    oracle=_pca_oracle(),
    doc=f"Top principal component of the embedding corpus by {PCA_ITERS} "
    "power-method iterations over the Gram matrix: the ONE corpus-scale "
    "pass is the BLAS-batched Gram reduction (shuffle volume O(partitions "
    "· d²), row-count-independent); every iteration after that is a "
    "matvec on the d×d relation — sketch-sized work, exactly how "
    "distributed PCA runs at 100 TB (compute X^T X once, iterate on the "
    "summary). Iterates on the 4-decimal Gram and renormalizes to 8 "
    "decimals per step so both engines walk identical fixed points; the "
    "oracle unrolls the same iterations as chained CTEs (the kmeans "
    "trick). Eigenvalue = ||G v|| of the final pre-normalized iterate. "
    "The d×d summary (2080 cells) collects to the driver and the power "
    "method runs there in numpy — the kmeans/PageRank driver-loop "
    "precedent, and how production PCA actually works (collect the "
    "covariance, eig locally); expressing the 64-row matvecs as Spark "
    "jobs measured 12 scheduler round-trips for zero distributed work.",
)
def embedding_pca_power_iteration(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np
    import pandas as pd

    emb = table(spark, sf_dir, "embeddings", parallel=True).select("embedding")
    iu = np.triu_indices(EMB_DIM)

    def gram_partials(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            m = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            g = m.T @ m
            yield pd.DataFrame(
                {
                    "i": (iu[0] + 1).astype(np.int64),
                    "j": (iu[1] + 1).astype(np.int64),
                    "partial": g[iu],
                }
            )

    schema = StructType.fromDDL("i bigint, j bigint, partial double")
    g_up = (
        emb.mapInPandas(gram_partials, schema)
        .groupBy("i", "j")
        .agg(F.round(F.sum("partial"), 4).alias("g"))
        .toPandas()
    )
    g = np.zeros((EMB_DIM, EMB_DIM))
    g[g_up["i"] - 1, g_up["j"] - 1] = g_up["g"]
    g[g_up["j"] - 1, g_up["i"] - 1] = g_up["g"]
    v = np.full(EMB_DIM, 0.125)
    nrm = 0.0
    for _ in range(PCA_ITERS):
        mv = g @ v
        nrm = float(np.sqrt((mv * mv).sum()))
        v = np.round(mv / nrm, 8)
    # NB (r14): a literal-struct formulation (the bpe_learn_merges trick)
    # was measured ~5x SLOWER here — 64 rows x 3 fields is ~200 py4j lit
    # calls, while Arrow-enabled createDataFrame ships one batch
    out = pd.DataFrame(
        {
            "dim": np.arange(1, EMB_DIM + 1, dtype=np.int64),
            "component": np.round(v, 4),
            "eigenvalue": round(nrm, 4),
        }
    )
    return spark.createDataFrame(out)


BPE_ROUNDS = 3


def _duck_merge(w_expr: str, p_expr: str, m_expr: str) -> str:
    """DuckDB expression: greedy left-to-right merge of symbol pair
    ``p_expr`` ('a b') into ``m_expr`` ('ab') within the space-joined
    symbol string ``w_expr`` — merging WHOLE symbols only (a fold over
    the token list, never a substring replace, so a pair can't match
    across a previously-merged symbol boundary)."""
    return (
        f"list_reduce(string_split({w_expr}, ' '), (acc, x) -> "
        f"CASE WHEN regexp_extract(acc, '[^ ]*$') = string_split({p_expr}, ' ')[1] "
        f"AND x = string_split({p_expr}, ' ')[2] "
        f"THEN regexp_replace(acc, '[^ ]*$', '') || {m_expr} "
        f"ELSE acc || ' ' || x END)"
    )


def _merge_pair_arr(arr, p1: str, p2: str, merged: str):
    """Spark expression: greedy left-to-right BPE merge of the adjacent
    symbol pair (p1, p2) -> merged over a symbol array — same whole-symbol
    fold semantics as :func:`_duck_merge` (validated pairwise in tests)."""
    return F.aggregate(
        arr,
        F.slice(arr, 1, 0),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(p1))
            & (x == F.lit(p2)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def _bpe_oracle() -> str:
    cte = r"""
    WITH freq AS (
      SELECT word, CAST(count(*) AS BIGINT) AS c
      FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents) t
      GROUP BY 1
    ),
    lex0 AS (SELECT trim(regexp_replace(word, '(.)', '\1 ', 'g')) AS w, c FROM freq)"""
    for k in range(1, BPE_ROUNDS + 1):
        prev = f"lex{k - 1}"
        # DuckDB forbids subqueries inside lambdas: cross-join the 1-row
        # b{k} so its p/m are plain columns the fold lambda can capture
        merge_expr = _duck_merge("w", "p", "m")
        cte += f""",
    pr{k} AS (
      SELECT toks[i] || ' ' || toks[i + 1] AS p, sum(c) AS pc
      FROM (SELECT string_split(w, ' ') AS toks, c,
                   unnest(range(1, len(string_split(w, ' ')))) AS i
            FROM {prev}) t
      GROUP BY 1
    ),
    b{k} AS (SELECT p, replace(p, ' ', '') AS m, pc
             FROM pr{k} ORDER BY pc DESC, p LIMIT 1),
    lex{k} AS (SELECT {merge_expr} AS w, c FROM {prev}, b{k})"""
    sel = "\n    UNION ALL ".join(
        f"SELECT {k} AS merge_round, p AS pair, m AS merged, "
        f"CAST(pc AS BIGINT) AS pair_count FROM b{k}"
        for k in range(1, BPE_ROUNDS + 1)
    )
    return cte + "\n    " + sel


@register(
    "bpe_learn_merges",
    oracle=_bpe_oracle(),
    doc=f"BPE tokenizer training, {BPE_ROUNDS} merge rounds over the corpus "
    "word lexicon: each round counts adjacent symbol pairs weighted by "
    "word frequency (one shuffle over the DIMENSION-sized lexicon, never "
    "the corpus — the corpus reduces to (word, count) once up front), "
    "collects the argmax pair to the driver as a literal (the kmeans/"
    "PageRank driver-loop precedent: bytes moved per round = one row) and "
    "rewrites the lexicon map-side with a greedy left-to-right WHOLE-"
    "SYMBOL fold (true BPE: a pair never matches across a previously-"
    "merged symbol's boundary). Ties break on (count desc, pair asc). "
    "The oracle unrolls all rounds as chained CTEs whose lexicon rewrite "
    "is the identical fold via list_reduce.",
)
def bpe_learn_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    merges = _bpe_learn(spark, sf_dir)
    # Result rows are driver literals; build them as JVM literal expressions
    # (not createDataFrame, whose local-Python RDD costs a worker spin-up —
    # measured ~1.3 s cold on the bench for 3 rows)
    rows = F.array(
        *[
            F.struct(
                F.lit(k).cast("bigint").alias("merge_round"),
                F.lit(p).alias("pair"),
                F.lit(m).alias("merged"),
                F.lit(c).cast("bigint").alias("pair_count"),
            )
            for k, p, m, c in merges
        ]
    )
    return (
        spark.range(1)
        .select(F.explode(rows).alias("r"))
        .select("r.merge_round", "r.pair", "r.merged", "r.pair_count")
    )


LIFT_TOPK = 10


@register(
    "orders_basket_lift",
    oracle=f"""
    WITH pp AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    n AS (SELECT count(DISTINCT l_orderkey) AS n_orders FROM pp),
    item AS (SELECT l_partkey, count(*) AS cnt FROM pp GROUP BY 1),
    pair AS (
      SELECT a.l_partkey AS pa, b.l_partkey AS pb, count(*) AS pair_n
      FROM pp a JOIN pp b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2 HAVING count(*) >= {MIN_SUPPORT}
    )
    SELECT pa, pb, CAST(pair_n AS BIGINT) AS pair_n,
           round(pair_n * 1.0 * n_orders / (ia.cnt * ib.cnt), 4) AS lift
    FROM pair
    JOIN item ia ON ia.l_partkey = pair.pa
    JOIN item ib ON ib.l_partkey = pair.pb
    CROSS JOIN n
    ORDER BY lift DESC, pa, pb LIMIT {LIFT_TOPK}
    """,
    doc=f"Association-rule lift over order baskets: top-{LIFT_TOPK} part "
    "pairs by lift = P(a,b)/(P(a)·P(b)) among pairs with support ≥ "
    f"{MIN_SUPPORT}. Pair counts expand map-side from per-order baskets "
    "(same one-shuffle shape as the triangle edges); item supports are a "
    "second aggregate over the already-distinct basket relation and "
    "BROADCAST into the lift join along with the 1-row order total. "
    "TakeOrderedAndProject caps the output. The market-basket recommender "
    "primitive at any scale.",
)
def orders_basket_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    arr = li.groupBy("l_orderkey").agg(
        F.sort_array(F.collect_set("l_partkey")).alias("ps")
    )
    n_orders = arr.select(
        F.count(F.lit(1)).cast("bigint").alias("n_orders")
    )
    item = arr.select(F.explode("ps").alias("l_partkey")).groupBy(
        "l_partkey"
    ).agg(F.count(F.lit(1)).alias("cnt"))
    pairs = (
        arr.select(
            F.explode(
                F.flatten(
                    F.transform(
                        F.col("ps"),
                        lambda x, i: F.transform(
                            F.slice(F.col("ps"), i + 2, F.size("ps")),
                            lambda y: F.struct(x.alias("pa"), y.alias("pb")),
                        ),
                    )
                )
            ).alias("p")
        )
        .select("p.pa", "p.pb")
        .groupBy("pa", "pb")
        .agg(F.count(F.lit(1)).alias("pair_n"))
        .filter(F.col("pair_n") >= MIN_SUPPORT)
    )
    # Item supports are part-cardinality-sized — data-proportional, so the
    # static estimate (inherited from lineitem) declines the hint; decide
    # from the materialized count instead (item is persisted and released
    # with the result below).
    item = item.persist()
    hint_items = counted_fits_broadcast(item, row_bytes=32)
    ia = item.select(F.col("l_partkey").alias("pa"), F.col("cnt").alias("cnt_a"))
    ib = item.select(F.col("l_partkey").alias("pb"), F.col("cnt").alias("cnt_b"))
    if hint_items:
        ia, ib = F.broadcast(ia), F.broadcast(ib)
    out = (
        pairs.join(ia, "pa")
        .join(ib, "pb")
        .crossJoin(F.broadcast(n_orders))
        .select(
            "pa",
            "pb",
            F.col("pair_n").cast("bigint").alias("pair_n"),
            F.round(
                F.col("pair_n") * F.col("n_orders") / (F.col("cnt_a") * F.col("cnt_b")),
                4,
            ).alias("lift"),
        )
    )
    return persist_until_collected(
        item,
        persist_until_collected(
            arr, out.orderBy(F.desc("lift"), "pa", "pb").limit(LIFT_TOPK)
        ),
    )


JACCARD_NEIGHBOR_TOPK = 15


@register(
    "graph_jaccard_neighbors",
    oracle=f"""
    WITH pp AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    deg AS (SELECT l_partkey, count(*) AS deg FROM pp GROUP BY 1),
    common AS (
      SELECT a.l_partkey AS pa, b.l_partkey AS pb, count(*) AS both_n
      FROM pp a JOIN pp b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2 HAVING count(*) >= {MIN_SUPPORT}
    )
    SELECT pa, pb, CAST(both_n AS BIGINT) AS both_n,
           round(both_n * 1.0 / (da.deg + db.deg - both_n), 4) AS jaccard
    FROM common
    JOIN deg da ON da.l_partkey = common.pa
    JOIN deg db ON db.l_partkey = common.pb
    ORDER BY jaccard DESC, pa, pb LIMIT {JACCARD_NEIGHBOR_TOPK}
    """,
    doc=f"Neighbor-set Jaccard similarity between parts in the order-"
    "basket bipartite graph — |orders(a)∩orders(b)| / |orders(a)∪orders(b)| "
    f"for pairs co-occurring ≥{MIN_SUPPORT} times — the item-item "
    "collaborative-filtering / link-prediction primitive. Co-occurrence "
    "counts expand map-side from per-order baskets (one shuffle); degrees "
    "are a second aggregate over the distinct basket relation, BROADCAST "
    "into the similarity join; TakeOrderedAndProject caps output. The "
    "union size folds from degrees (inclusion-exclusion) — no second "
    "pass over the graph.",
)
def graph_jaccard_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    arr = li.groupBy("l_orderkey").agg(
        F.sort_array(F.collect_set("l_partkey")).alias("ps")
    )
    deg = arr.select(F.explode("ps").alias("l_partkey")).groupBy(
        "l_partkey"
    ).agg(F.count(F.lit(1)).alias("deg"))
    common = (
        arr.select(
            F.explode(
                F.flatten(
                    F.transform(
                        F.col("ps"),
                        lambda x, i: F.transform(
                            F.slice(F.col("ps"), i + 2, F.size("ps")),
                            lambda y: F.struct(x.alias("pa"), y.alias("pb")),
                        ),
                    )
                )
            ).alias("p")
        )
        .select("p.pa", "p.pb")
        .groupBy("pa", "pb")
        .agg(F.count(F.lit(1)).alias("both_n"))
        .filter(F.col("both_n") >= MIN_SUPPORT)
    )
    # Same runtime-count gate as orders_basket_lift: degrees are
    # part-cardinality-sized, so the static estimate declines; the
    # materialized count decides (deg persisted, released with the result).
    deg = deg.persist()
    hint_deg = counted_fits_broadcast(deg, row_bytes=32)
    da = deg.select(F.col("l_partkey").alias("pa"), F.col("deg").alias("deg_a"))
    db = deg.select(F.col("l_partkey").alias("pb"), F.col("deg").alias("deg_b"))
    if hint_deg:
        da, db = F.broadcast(da), F.broadcast(db)
    out = (
        common.join(da, "pa")
        .join(db, "pb")
        .select(
            "pa",
            "pb",
            F.col("both_n").cast("bigint").alias("both_n"),
            F.round(
                F.col("both_n")
                / (F.col("deg_a") + F.col("deg_b") - F.col("both_n")),
                4,
            ).alias("jaccard"),
        )
    )
    return persist_until_collected(
        deg,
        persist_until_collected(
            arr,
            out.orderBy(F.desc("jaccard"), "pa", "pb").limit(
                JACCARD_NEIGHBOR_TOPK
            ),
        ),
    )


PATHS_TOPK = 10


@register(
    "events_funnel_paths_topk",
    oracle=f"""
    WITH seqs AS (
      SELECT user_id,
             string_agg(event_type, '>' ORDER BY ts, event_id) AS path
      FROM events GROUP BY user_id
    )
    SELECT path, CAST(count(*) AS BIGINT) AS n_users
    FROM seqs GROUP BY path
    ORDER BY n_users DESC, path LIMIT {PATHS_TOPK}
    """,
    doc=f"Top-{PATHS_TOPK} most common full event paths: per-user ordered "
    "event-type sequences (deterministic (ts, event_id) tie-break) counted "
    "corpus-wide — the path-analysis complement to the funnel regex. One "
    "user_id shuffle builds sequences, one path shuffle counts them "
    "(map-combined — identical paths collapse per task first), "
    "TakeOrderedAndProject caps output.",
)
def events_funnel_paths_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    seqs = ev.groupBy("user_id").agg(
        F.array_join(
            F.transform(
                F.sort_array(
                    F.collect_list(F.struct("ts", "event_id", "event_type"))
                ),
                lambda x: x.event_type,
            ),
            ">",
        ).alias("path")
    )
    return (
        seqs.groupBy("path")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_users"))
        .orderBy(F.desc("n_users"), "path")
        .limit(PATHS_TOPK)
    )


def _bpe_merge_word(
    toks: list[str], p1: str, p2: str, merged: str
) -> list[str]:
    """Pure-Python greedy left-to-right whole-symbol BPE merge — the exact
    fold :func:`_merge_pair_arr` (and the oracle's list_reduce) performs:
    append each symbol unless the accumulator tail is p1 and the symbol is
    p2, in which case the tail becomes the merged symbol (so a pair never
    matches across a previously-merged symbol's boundary)."""
    acc: list[str] = []
    for x in toks:
        if acc and acc[-1] == p1 and x == p2:
            acc[-1] = merged
        else:
            acc.append(x)
    return acc


def _bpe_learn(
    spark: SparkSession, sf_dir: str
) -> list[tuple[int, str, str, int]]:
    """The BPE merge-learning loop shared by bpe_learn_merges and
    bpe_apply_merges: returns [(round, pair, merged, pair_count), ...] as
    driver values.

    The corpus reduces to the (word, count) lexicon once up front. When
    the materialized lexicon is broadcast-sized, it is collected ONCE and
    all rounds run on the driver as exact integer counting + the identical
    greedy fold — same argmax tie-break (count DESC, space-joined pair
    string ASC; driver comparison on the joined string mirrors the SQL
    ORDER BY) — instead of paying per round a pair-count shuffle, an
    argmax collect, and a lexicon rewrite + persist churn. Above the
    threshold the distributed per-round loop executes unchanged (the
    lexicon is dimension-sized but unbounded in principle)."""
    docs = table(spark, sf_dir, "documents", parallel=True)
    freq = (
        docs.select(F.explode(F.split("text", " ")).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    lex = freq.select(
        F.trim(F.regexp_replace("word", "(.)", "$1 ")).alias("w"), "c"
    )
    lex.persist()
    merges: list[tuple[int, str, str, int]] = []
    if counted_fits_broadcast(lex, row_bytes=64):
        words = [(r["w"].split(" "), r["c"]) for r in lex.collect()]
        lex.unpersist()
        for k in range(1, BPE_ROUNDS + 1):
            pc: dict[str, int] = {}
            for toks, c in words:
                for i in range(len(toks) - 1):
                    p = toks[i] + " " + toks[i + 1]
                    pc[p] = pc.get(p, 0) + c
            best_p = min(pc, key=lambda p: (-pc[p], p))
            p1, p2 = best_p.split(" ")
            merged = best_p.replace(" ", "")
            merges.append((k, best_p, merged, int(pc[best_p])))
            words = [
                (_bpe_merge_word(toks, p1, p2, merged), c)
                for toks, c in words
            ]
        return merges
    for k in range(1, BPE_ROUNDS + 1):
        toks = F.split("w", " ")
        pairs = (
            lex.filter(F.size(toks) >= 2)
            .select(
                F.explode(
                    # adjacent pairs via zip_with over two shifted
                    # slices — same pairs, same order, ~8x cheaper than
                    # sequence+element_at
                    F.zip_with(
                        F.slice(toks, 1, F.size(toks) - 1),
                        F.slice(toks, 2, F.size(toks) - 1),
                        lambda a, b: F.concat_ws(" ", a, b),
                    )
                ).alias("p"),
                "c",
            )
            .groupBy("p")
            .agg(F.sum("c").alias("pc"))
        )
        best = pairs.orderBy(F.desc("pc"), "p").limit(1).collect()[0]
        merged = best["p"].replace(" ", "")
        p1, p2 = best["p"].split(" ")
        merges.append((k, best["p"], merged, int(best["pc"])))
        nxt = lex.select(
            F.array_join(
                _merge_pair_arr(F.split("w", " "), p1, p2, merged), " "
            ).alias("w"),
            "c",
        )
        nxt.persist()
        lex.unpersist()
        lex = nxt
    lex.unpersist()
    return merges


def _bpe_learned_merges(spark: SparkSession, sf_dir: str) -> list[tuple[str, str]]:
    """Run the merge-learning loop (same arithmetic as bpe_learn_merges)
    and return [(pair, merged), ...] as driver literals."""
    return [(p, m) for _, p, m, _ in _bpe_learn(spark, sf_dir)]


def _bpe_apply_oracle() -> str:
    # reuse the learn CTEs; apply the three merges per word via lambdas that
    # capture the b_k scalars (cross-joined in as plain columns), each merge
    # the same whole-symbol list_reduce fold the learn loop uses
    learn = _bpe_oracle().split("SELECT 1 AS merge_round")[0].rstrip().rstrip(",")
    expr = "trim(regexp_replace(w, '(.)', '\\1 ', 'g'))"
    for k in range(1, BPE_ROUNDS + 1):
        expr = _duck_merge(f"({expr})", f"p{k}", f"m{k}")
    word_expr = f"len(string_split({expr}, ' '))"
    m_cols = ", ".join(
        f"b{k}.p AS p{k}, b{k}.m AS m{k}" for k in range(1, BPE_ROUNDS + 1)
    )
    m_from = ", ".join(f"b{k}" for k in range(1, BPE_ROUNDS + 1))
    return f"""{learn},
    m AS (
      SELECT {m_cols}
      FROM {m_from}
    )
    SELECT doc_id,
           CAST(length(replace(text, ' ', '')) AS BIGINT) AS n_symbols_chars,
           CAST(list_sum(list_transform(string_split(text, ' '),
                w -> {word_expr})) AS BIGINT) AS n_tokens,
           round(length(replace(text, ' ', '')) * 1.0
                 / list_sum(list_transform(string_split(text, ' '),
                      w -> {word_expr})), 4) AS chars_per_token
    FROM documents, m
    """


@register(
    "bpe_apply_merges",
    oracle=_bpe_apply_oracle(),
    doc=f"Tokenizer application: the {BPE_ROUNDS} learned BPE merges are "
    "collected once as driver literals (the learn loop's arithmetic is "
    "shared with bpe_learn_merges) and applied corpus-wide as literal "
    "whole-symbol greedy folds per word — a MAP-ONLY pass at any corpus "
    "size; per-"
    "doc output is the char-level symbol count, the post-merge token "
    "count, and chars-per-token (the compression dial tokenizer teams "
    "actually tune). The oracle re-learns the merges in chained CTEs and "
    "applies them through lambda-captured scalars, so learn AND apply are "
    "verified end-to-end.",
)
def bpe_apply_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    merges = _bpe_learned_merges(spark, sf_dir)
    docs = table(spark, sf_dir, "documents", parallel=True)

    def tokenize(w):
        syms = F.split(F.trim(F.regexp_replace(w, "(.)", "$1 ")), " ")
        for pair, merged in merges:
            p1, p2 = pair.split(" ")
            syms = _merge_pair_arr(syms, p1, p2, merged)
        return F.size(syms)

    per_word = F.transform(F.split("text", " "), tokenize)
    n_tokens = F.aggregate(
        per_word, F.lit(0), lambda acc, x: acc + x
    ).cast("bigint")
    n_chars = F.length(F.replace(F.col("text"), F.lit(" "), F.lit("")))
    return docs.select(
        "doc_id",
        n_chars.cast("bigint").alias("n_symbols_chars"),
        n_tokens.alias("n_tokens"),
        F.round(n_chars / n_tokens, 4).alias("chars_per_token"),
    )


@register(
    "join_asof_nearest",
    oracle="""
    WITH tagged AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN event_type = 'signup' THEN ts END AS signup_ts
      FROM events WHERE event_type IN ('signup', 'purchase')
        AND ts IS NOT NULL
    ), filled AS (
      SELECT user_id, ts, event_id, event_type,
             max(signup_ts) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS prev_signup_ts,
             min(signup_ts) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
               AS next_signup_ts
      FROM tagged
    )
    SELECT event_id, user_id, ts,
           CASE
             WHEN prev_signup_ts IS NULL THEN next_signup_ts
             WHEN next_signup_ts IS NULL THEN prev_signup_ts
             WHEN epoch_us(ts) - epoch_us(prev_signup_ts)
                  <= epoch_us(next_signup_ts) - epoch_us(ts)
               THEN prev_signup_ts
             ELSE next_signup_ts
           END AS nearest_signup_ts,
           CAST(CASE WHEN prev_signup_ts IS NULL AND next_signup_ts IS NULL
                     THEN NULL
                     ELSE least(coalesce(epoch_us(ts) - epoch_us(prev_signup_ts),
                                         9223372036854775807),
                                coalesce(epoch_us(next_signup_ts) - epoch_us(ts),
                                         9223372036854775807))
                END AS BIGINT) AS gap_micros
    FROM filled WHERE event_type = 'purchase'
    """,
    doc="Nearest-direction as-of join (kdb nearest-aj): each purchase "
    "matches its closest signup in EITHER time direction (tie -> the "
    "earlier one). Same union+window trick as join_asof — both the "
    "backward running-max and the forward running-min ride ONE shuffle "
    "and ONE sort on (user_id, ts): no second window sort (Spark reuses "
    "the ordering for the mirrored frame), no range self-join, linear at "
    "any scale. Purchases whose user never signed up get NULL "
    "nearest_signup_ts AND NULL gap_micros (not a Long.MAX sentinel), so "
    "downstream latency aggregates skip them.",
)
def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    # NULL-ts guard on both engines: an unordered-able row would land at
    # opposite partition ends (Spark NULLS FIRST asc, DuckDB NULLS LAST).
    ev = table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("signup", "purchase")
        & F.col("ts").isNotNull()
    )
    tagged = ev.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.when(F.col("event_type") == "signup", F.col("ts")).alias("signup_ts"),
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    filled = tagged.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.max("signup_ts")
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("prev_signup_ts"),
        F.min("signup_ts")
        .over(w.rowsBetween(0, Window.unboundedFollowing))
        .alias("next_signup_ts"),
    )
    prev_gap = F.unix_micros("ts") - F.unix_micros("prev_signup_ts")
    next_gap = F.unix_micros("next_signup_ts") - F.unix_micros("ts")
    big = F.lit(9223372036854775807)
    nearest = (
        F.when(F.col("prev_signup_ts").isNull(), F.col("next_signup_ts"))
        .when(F.col("next_signup_ts").isNull(), F.col("prev_signup_ts"))
        .when(prev_gap <= next_gap, F.col("prev_signup_ts"))
        .otherwise(F.col("next_signup_ts"))
    )
    return filled.filter(F.col("event_type") == "purchase").select(
        "event_id",
        "user_id",
        "ts",
        nearest.alias("nearest_signup_ts"),
        F.when(
            F.col("prev_signup_ts").isNotNull()
            | F.col("next_signup_ts").isNotNull(),
            F.least(F.coalesce(prev_gap, big), F.coalesce(next_gap, big)),
        ).cast("bigint").alias("gap_micros"),
    )
