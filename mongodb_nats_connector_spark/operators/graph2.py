"""Graph + order-statistics operators round 4c.

- ``pagerank_nations`` — iterative weighted PageRank over the nation trade
  graph in FIXED-POINT integer arithmetic: every per-edge contribution is
  ``(pr * w) // outw`` on BIGINT micro-units, so partial sums commute
  exactly and the result is bit-identical on any engine / any partitioning /
  any aggregation order — the same discipline as the int8-quantization and
  minmax-normalize checksum ops (float PageRank would drift per-iteration
  with summation order). Spark runs the iteration as a driver-side loop:
  the node-sized rank vector collects to the driver and re-embeds as a
  literal map each round (the kmeans_embeddings distribution strategy), so
  every iteration is one map-only lookup + aggregation over the cached edge
  relation; the oracle chains one CTE per iteration.
- ``dedup_prefix_boilerplate`` — boilerplate/prefix duplicate detection:
  documents sharing their first K tokens (the news-wire / template header
  case exact-hash dedup misses when tails differ). Hashes the K-token
  prefix, one 8-byte-key shuffle, clusters = groups with >1 member.
- ``agg_weighted_median`` — exact weighted median via the cumulative-weight
  crossing rule, computed scale-safely: pre-aggregate weights per (group,
  value) first (bounded by the value domain), then an ordered window over
  the reduced relation. Weights cast to BIGINT so cumulative sums are exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mongodb_nats_connector_spark.plans.caching import persist_until_collected
from mongodb_nats_connector_spark.plans.hints import maybe_broadcast
from mongodb_nats_connector_spark.registry import register
from mongodb_nats_connector_spark.sources.tables import table

PR_SCALE = 10**12
PR_DAMP_NUM, PR_DAMP_DEN = 85, 100  # damping 0.85 as an exact rational
PR_ITERS = 3


def _pagerank_oracle() -> str:
    base = f"""
    WITH edges AS (
      SELECT c.c_nationkey AS src, s.s_nationkey AS dst,
             CAST(count(*) AS BIGINT) AS w
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      GROUP BY 1, 2
    ),
    outw AS (
      SELECT src, CAST(sum(w) AS BIGINT) AS total_w FROM edges GROUP BY src
    ),
    nodes AS (SELECT n_nationkey AS node, n_name FROM nation),
    ncount AS (SELECT CAST(count(*) AS BIGINT) AS n FROM nodes),
    pr0 AS (
      SELECT node, CAST({PR_SCALE} // n AS BIGINT) AS pr
      FROM nodes, ncount
    )"""
    step = """,
    pr{next} AS (
      SELECT nodes.node,
             CAST(({base_num} // n)
                  + ({damp_num} * coalesce(inflow.s, 0)) // {damp_den}
                  AS BIGINT) AS pr
      FROM nodes
      CROSS JOIN ncount
      LEFT JOIN (
        SELECT e.dst AS node,
               CAST(sum((p.pr * e.w) // o.total_w) AS BIGINT) AS s
        FROM pr{cur} p
        JOIN edges e ON e.src = p.node
        JOIN outw o ON o.src = p.node
        GROUP BY e.dst
      ) inflow ON inflow.node = nodes.node
    )"""
    for i in range(PR_ITERS):
        base += step.format(
            next=i + 1,
            cur=i,
            base_num=PR_SCALE * (PR_DAMP_DEN - PR_DAMP_NUM) // PR_DAMP_DEN,
            damp_num=PR_DAMP_NUM,
            damp_den=PR_DAMP_DEN,
        )
    return (
        base
        + f"""
    SELECT n.n_name AS nation, p.pr AS pr_fixed,
           p.pr / {PR_SCALE}.0 AS pagerank
    FROM pr{PR_ITERS} p JOIN nation n ON n.n_nationkey = p.node
    """
    )


@register(
    "pagerank_nations",
    oracle=_pagerank_oracle(),
    doc=f"Weighted PageRank ({PR_ITERS} iterations, damping "
    f"{PR_DAMP_NUM}/{PR_DAMP_DEN}) over the customer-nation → supplier-"
    "nation trade graph. The edge weights aggregate once from the fact "
    "tables (the only wide shuffle) and cache; the rank vector is "
    "node-sized, so every iteration embeds it as a literal map and runs a "
    "map-only lookup + aggregation over the cached edge relation — the "
    "collect-and-rebroadcast Pregel shape. Fixed-point BIGINT "
    "micro-units make every contribution exact: integer partial sums "
    "commute, so the result is independent of partitioning and engine.",
)
def pagerank_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    s = table(spark, sf_dir, "supplier")
    nation = table(spark, sf_dir, "nation")

    edges = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(maybe_broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(maybe_broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .groupBy(
            F.col("c_nationkey").alias("src"), F.col("s_nationkey").alias("dst")
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("w"))
    )
    # no persist needed (r14): edges feeds outw and the join inside ONE
    # collected plan — the groupBy exchange is reused — and nothing
    # re-scans it afterwards
    outw = edges.groupBy("src").agg(F.sum("w").cast("bigint").alias("total_w"))
    edges_n = edges.join(outw, "src")

    nodes = nation.select(F.col("n_nationkey").alias("node"), "n_name")
    node_ids = [r["node"] for r in nodes.collect()]
    n = len(node_ids)
    base_num = PR_SCALE * (PR_DAMP_DEN - PR_DAMP_NUM) // PR_DAMP_DEN

    # The nation-level edge relation is node^2-bounded (<= |nation|^2 rows
    # — 625 at TPC-H's 25 nations, a driver scalar like the rank vector
    # itself), so ONE collect fetches it and the whole fixed-point runs in
    # exact Python integer arithmetic on the driver (r14 optimization: the
    # former shape re-scanned the cached edges with a literal rank map and
    # collected the inflow once PER ITERATION — PR_ITERS full jobs whose
    # only purpose was 25-row aggregates). The distributed part remains
    # exactly the data-proportional piece: aggregating the fact tables
    # down to the edge weights. Python ints are arbitrary-precision and
    # `//` on positives matches SQL `div`, and integer partial sums
    # commute, so every pr value is bit-identical to the per-iteration
    # job formulation (pr * w reaches ~2.4e17, past double's 2^53 — which
    # is why no float ever touches the ranks on either engine).
    edge_rows = [
        (r["src"], r["dst"], r["w"], r["total_w"]) for r in edges_n.collect()
    ]
    pr_map = {node: PR_SCALE // n for node in node_ids}
    for _ in range(PR_ITERS):
        inflow: dict[int, int] = {}
        for src, dst, w, total_w in edge_rows:
            contrib = pr_map[src] * w // total_w
            inflow[dst] = inflow.get(dst, 0) + contrib
        pr_map = {
            node: base_num // n
            + PR_DAMP_NUM * inflow.get(node, 0) // PR_DAMP_DEN
            for node in node_ids
        }
    pr_final = F.create_map(
        *[F.lit(x) for node, pr_v in pr_map.items() for x in (node, pr_v)]
    )
    return nation.select(
        F.col("n_name").alias("nation"),
        pr_final[F.col("n_nationkey")].cast("bigint").alias("pr_fixed"),
        (pr_final[F.col("n_nationkey")] / PR_SCALE).alias("pagerank"),
    )


PREFIX_K = 8


@register(
    "dedup_prefix_boilerplate",
    oracle=f"""
    WITH pre AS (
      SELECT doc_id,
             md5(array_to_string(string_split(text, ' ')[1:{PREFIX_K}], ' '))
               AS prefix_hash
      FROM documents
    ),
    clusters AS (
      SELECT prefix_hash, CAST(count(*) AS BIGINT) AS cluster_size,
             CAST(min(doc_id) AS BIGINT) AS canonical_doc_id
      FROM pre GROUP BY prefix_hash
      HAVING count(*) > 1
    )
    SELECT p.doc_id, p.prefix_hash, c.cluster_size, c.canonical_doc_id,
           p.doc_id = c.canonical_doc_id AS is_canonical
    FROM pre p JOIN clusters c USING (prefix_hash)
    """,
    doc=f"Boilerplate-prefix duplicate detection: documents sharing their "
    f"first {PREFIX_K} tokens (template headers, wire-copy lead paragraphs) "
    "cluster on an md5 of the prefix — catches near-dups whose tails "
    "diverge, which whole-document exact dedup misses and MinHash may "
    "under-score. One shuffle on the 16-byte hash; the >1-member filter "
    "happens in the same aggregation. Keep-rule: smallest doc_id is "
    "canonical.",
)
def dedup_prefix_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents", parallel=True)
    pre = docs.select(
        "doc_id",
        F.md5(
            F.array_join(F.slice(F.split("text", " "), 1, PREFIX_K), " ")
        ).alias("prefix_hash"),
    )
    clusters = (
        pre.groupBy("prefix_hash")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("cluster_size"),
            F.min("doc_id").cast("bigint").alias("canonical_doc_id"),
        )
        .filter(F.col("cluster_size") > 1)
    )
    return persist_until_collected(
        pre,
        pre.join(clusters, "prefix_hash").select(
            "doc_id",
            "prefix_hash",
            "cluster_size",
            "canonical_doc_id",
            (F.col("doc_id") == F.col("canonical_doc_id")).alias("is_canonical"),
        ),
    )


@register(
    "agg_weighted_median",
    oracle="""
    WITH per_value AS (
      SELECT l_returnflag, l_extendedprice AS price,
             CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS w
      FROM lineitem GROUP BY 1, 2
    ),
    cum AS (
      SELECT l_returnflag, price, w,
             sum(w) OVER (PARTITION BY l_returnflag ORDER BY price
               ROWS UNBOUNDED PRECEDING) AS cw,
             sum(w) OVER (PARTITION BY l_returnflag) AS tw
      FROM per_value
    )
    SELECT l_returnflag,
           min(price) FILTER (WHERE 2 * cw >= tw) AS weighted_median_price,
           CAST(max(tw) AS BIGINT) AS total_weight
    FROM cum
    GROUP BY l_returnflag
    """,
    doc="Exact weighted median (lower weighted median: smallest value whose "
    "cumulative weight reaches half the total) of extended price weighted "
    "by quantity, per return flag. Scale shape: weights pre-aggregate per "
    "(group, value) — bounded by the value domain — BEFORE the ordered "
    "window, so the window sees the reduced relation, not the fact table. "
    "Quantities are integral; casting to BIGINT makes every cumulative sum "
    "exact, so the crossing row is engine-independent.",
)
def agg_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    per_value = li.groupBy(
        "l_returnflag", F.col("l_extendedprice").alias("price")
    ).agg(F.sum(F.col("l_quantity").cast("bigint")).cast("bigint").alias("w"))
    w_cum = (
        Window.partitionBy("l_returnflag")
        .orderBy("price")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_tot = Window.partitionBy("l_returnflag")
    cum = per_value.select(
        "l_returnflag",
        "price",
        F.sum("w").over(w_cum).alias("cw"),
        F.sum("w").over(w_tot).alias("tw"),
    )
    return cum.groupBy("l_returnflag").agg(
        F.min(F.when(2 * F.col("cw") >= F.col("tw"), F.col("price"))).alias(
            "weighted_median_price"
        ),
        F.max("tw").cast("bigint").alias("total_weight"),
    )
