"""Similarity search over the `embeddings` table (`array<float>` column).

Brute-force cosine top-k is the correctness baseline: a broadcast cross join
of the (small) query set against all vectors, dot products computed with
JVM-side higher-order functions (functions/vectors.py) — no Python per row.
The scale path is random-hyperplane LSH (`similarity_ann_lsh`): L hash
tables of B sign bits each; only (vec_id, table, bucket) shuffles and
candidates are scored, not the full cross product.

DuckDB oracle note: cosine values are rounded to 6 decimals on both sides and
ranking ties are broken by vec_id, so float summation-order noise (~1e-15)
cannot flip the comparison.
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from mongodb_nats_connector_spark.functions.vectors import cosine_fast
from mongodb_nats_connector_spark.registry import register
from mongodb_nats_connector_spark.sources.tables import table

N_QUERIES = 5  # query set: vec_id < 5
TOP_K = 5
NEARDUP_COS = 0.45  # chosen so the synthetic data yields a non-empty pair set

# deterministic random hyperplanes for sign-LSH (seeded, dim=64)
_DIM = 64
_L_TABLES = 10
_N_BITS = 8
_rng = random.Random(7)
HYPERPLANES = [
    [[_rng.gauss(0.0, 1.0) for _ in range(_DIM)] for _ in range(_N_BITS)]
    for _ in range(_L_TABLES)
]


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return table(spark, sf_dir, "embeddings", parallel=True).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )


@register(
    "similarity_topk_bruteforce",
    oracle=f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < {N_QUERIES}),
    scored AS (
      SELECT q.query_id, e.vec_id AS neighbor_id,
             round(list_cosine_similarity(q.qv, e.v), 6) AS cos_sim
      FROM q JOIN e ON e.vec_id <> q.query_id
    ), ranked AS (
      SELECT query_id, neighbor_id, cos_sim,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cos_sim DESC, neighbor_id) AS rn
      FROM scored
    )
    SELECT query_id, neighbor_id, cos_sim, CAST(rn AS BIGINT) AS rn
    FROM ranked WHERE rn <= {TOP_K}
    """,
    doc="Brute-force cosine top-k: broadcast the query set, score all "
    "vectors with a JVM-side dot product, per-query top-k via window. The "
    "exact baseline every ANN variant is measured against.",
)
def similarity_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _emb(spark, sf_dir)
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    scored = (
        e.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(cosine_fast(F.col("qv"), F.col("v")), 6).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rn") <= TOP_K)
    )


@register(
    "similarity_neardup_pairs",
    oracle=f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           round(list_cosine_similarity(a.v, b.v), 6) AS cos_sim
    FROM e a JOIN e b ON a.vec_id < b.vec_id
    WHERE round(list_cosine_similarity(a.v, b.v), 6) >= {NEARDUP_COS}
    """,
    doc="Embedding-cosine near-duplicate pairs (threshold), brute force: "
    "Arrow-vectorized cosine per candidate pair. Quadratic by construction "
    "— the correctness baseline for the LSH-bucketed variant. The pair "
    "stream crosses the Python boundary through mapInArrow, reshaping the "
    "flat Arrow list buffers straight into (n, dim) float64 matrices — "
    "the same numpy row-wise kernel as cosine_fast (identical bits: same "
    "C-contiguous float64 input, same pairwise-summation reduce) without "
    "materializing two million per-row ndarray objects.",
)
def similarity_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _emb(spark, sf_dir)
    a = e.select(F.col("vec_id").alias("vec_a"), F.col("v").alias("va"))
    b = e.select(F.col("vec_id").alias("vec_b"), F.col("v").alias("vb"))

    def _cos_batches(batches):
        import numpy as np
        import pyarrow as pa

        def _mat(col, n):
            # uniform-dim, null-free fast path: reshape the flat value
            # buffer — bitwise the same float64 rows np.stack would build
            if col.null_count == 0:
                offs = col.offsets.to_numpy()
                if n and (offs[1:] - offs[:-1] == _DIM).all():
                    vals = col.values.to_numpy(zero_copy_only=False)
                    return np.ascontiguousarray(
                        vals[offs[0]:offs[-1]]
                    ).reshape(n, _DIM)
            return None

        out_schema = pa.schema(
            [
                ("vec_a", pa.int64()),
                ("vec_b", pa.int64()),
                ("cos_raw", pa.float64()),
            ]
        )
        for batch in batches:
            n = batch.num_rows
            ca, cb = batch.column(2), batch.column(3)
            A, B = _mat(ca, n), _mat(cb, n)
            if A is not None and B is not None:
                num = (A * B).sum(axis=1)
                with np.errstate(divide="ignore", invalid="ignore"):
                    den = np.sqrt((A * A).sum(axis=1)) * np.sqrt(
                        (B * B).sum(axis=1)
                    )
                    cos = num / den
            else:
                # ragged/null fallback: the original per-row semantics
                xa, xb = ca.to_pandas(), cb.to_pandas()
                la = xa.map(lambda v: -1 if v is None else len(v))
                lb = xb.map(lambda v: -1 if v is None else len(v))
                ok = (la.values == lb.values) & (la.values > 0)
                cos = np.full(n, np.nan)
                for dim in np.unique(la.values[ok]):
                    m = ok & (la.values == dim)
                    Am = np.stack(xa.values[m])
                    Bm = np.stack(xb.values[m])
                    num = (Am * Bm).sum(axis=1)
                    with np.errstate(divide="ignore", invalid="ignore"):
                        den = np.sqrt((Am * Am).sum(axis=1)) * np.sqrt(
                            (Bm * Bm).sum(axis=1)
                        )
                        cos[m] = num / den
            yield pa.RecordBatch.from_arrays(
                [batch.column(0), batch.column(1), pa.array(cos, pa.float64())],
                schema=out_schema,
            )

    scored = (
        a.join(b, F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b", "va", "vb")
        .mapInArrow(_cos_batches, "vec_a bigint, vec_b bigint, cos_raw double")
    )
    return scored.select(
        "vec_a", "vec_b", F.round("cos_raw", 6).alias("cos_sim")
    ).filter(F.col("cos_sim") >= NEARDUP_COS)


def _bucket_udf(v: F.Column) -> F.Column:
    """All L bucket ids per vector in one Arrow batch op: dots against the
    stacked (L*B, dim) hyperplane matrix, sign bits packed per table."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    planes = np.asarray(HYPERPLANES, dtype=np.float64).reshape(
        _L_TABLES * _N_BITS, _DIM
    )
    weights = (1 << np.arange(_N_BITS, dtype=np.int64))

    @pandas_udf("array<bigint>")
    def _buckets(xs):
        V = np.stack(xs.values)                      # (rows, dim)
        bits = (V @ planes.T) > 0                    # (rows, L*B)
        bits = bits.reshape(len(V), _L_TABLES, _N_BITS)
        ids = (bits * weights).sum(axis=2)           # (rows, L)
        return pd.Series(list(ids))

    return _buckets(v)


def _lsh_oracle() -> str:
    """Exact SQL mirror of the sign-LSH pipeline: the seeded hyperplanes are
    embedded as literal DOUBLE[] rows (Python repr floats round-trip exactly
    through DuckDB's parser), bucket bits are the same dot-sign tests, and
    candidates/scoring/ranking mirror the DataFrame plan. The only
    cross-engine float hazard is a dot product EXACTLY at 0 flipping a sign
    bit between numpy's blocked summation and DuckDB's list_sum — dots here
    have magnitude >> 1e-10, so both engines agree bit-for-bit (pinned by
    the parity suite at two SFs)."""
    plane_rows = ",\n      ".join(
        f"({t}, {b}, [{', '.join(repr(x) for x in HYPERPLANES[t][b])}]::DOUBLE[])"
        for t in range(_L_TABLES)
        for b in range(_N_BITS)
    )
    return f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    planes(tbl, bit, h) AS (VALUES
      {plane_rows}
    ),
    buckets AS (
      SELECT e.vec_id, p.tbl,
             CAST(sum(CASE WHEN list_sum(list_transform(list_zip(e.v, p.h),
                                 x -> x[1] * x[2])) > 0
                           THEN (1 << p.bit) ELSE 0 END) AS BIGINT) AS bucket
      FROM e CROSS JOIN planes p
      GROUP BY e.vec_id, p.tbl
    ),
    qb AS (
      SELECT vec_id AS query_id, tbl, bucket FROM buckets
      WHERE vec_id < {{nq}}
    ),
    cand AS (
      SELECT DISTINCT qb.query_id, b.vec_id AS neighbor_id
      FROM buckets b JOIN qb ON b.tbl = qb.tbl AND b.bucket = qb.bucket
      WHERE b.vec_id <> qb.query_id
    ),
    scored AS (
      SELECT c.query_id, c.neighbor_id,
             round(list_cosine_similarity(eq.v, en.v), 6) AS cos_sim
      FROM cand c
      JOIN e eq ON eq.vec_id = c.query_id
      JOIN e en ON en.vec_id = c.neighbor_id
    ), ranked AS (
      SELECT query_id, neighbor_id, cos_sim,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cos_sim DESC, neighbor_id) AS rn
      FROM scored
    )
    SELECT query_id, neighbor_id, cos_sim, CAST(rn AS BIGINT) AS rn
    FROM ranked WHERE rn <= {{k}}
    """.format(nq=N_QUERIES, k=TOP_K)


@register(
    "similarity_ann_lsh",
    oracle=_lsh_oracle(),
    doc="ANN top-k via random-hyperplane LSH: 10 tables x 8 sign bits; "
    "candidates = vectors sharing a (table, bucket) with the query, scored "
    "exactly, per-query top-k. At 100 TB only (vec_id, table, bucket) "
    "pairs shuffle; recall vs. brute force is asserted in tests. The DuckDB "
    "oracle replays the full pipeline with the hyperplanes as SQL literals, "
    "so the approximate index itself is hash-verified, not just executed.",
)
def similarity_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _emb(spark, sf_dir)
    buckets = e.select(
        "vec_id", "v", F.posexplode(_bucket_udf(F.col("v"))).alias("tbl", "bucket")
    )
    q = buckets.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        "tbl",
        "bucket",
    )
    cand = (
        buckets.join(F.broadcast(q), ["tbl", "bucket"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "qv", F.col("vec_id").alias("neighbor_id"), "v")
        .distinct()
    )
    scored = cand.select(
        "query_id",
        "neighbor_id",
        F.round(cosine_fast(F.col("qv"), F.col("v")), 6).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rn") <= TOP_K)
    )


# IVF parameters: K coarse centroids, N_PROBE probed lists per query.
# Centroids are a deterministic sample of the corpus itself (every 37th
# vector, first K by vec_id) — a stand-in for a k-means codebook that keeps
# the oracle exactly mirrorable in SQL.
K_CENTROIDS = 16
N_PROBE = 4
_CENTROID_STRIDE = 37


def _ivf_oracle() -> str:
    return f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    c AS (
      SELECT vec_id AS cid, v AS cv FROM e
      WHERE vec_id % {_CENTROID_STRIDE} = 1 ORDER BY vec_id LIMIT {K_CENTROIDS}
    ),
    assign AS (
      SELECT vec_id, v, cid,
             row_number() OVER (
               PARTITION BY vec_id
               ORDER BY round(list_cosine_similarity(v, cv), 6) DESC, cid
             ) AS arn
      FROM e CROSS JOIN c
    ),
    lists AS (SELECT vec_id, v, cid FROM assign WHERE arn = 1),
    q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < {N_QUERIES}),
    probe AS (
      SELECT query_id, qv, cid,
             row_number() OVER (
               PARTITION BY query_id
               ORDER BY round(list_cosine_similarity(qv, cv), 6) DESC, cid
             ) AS prn
      FROM q CROSS JOIN c
    ),
    cand AS (
      SELECT p.query_id, p.qv, l.vec_id AS neighbor_id, l.v
      FROM probe p JOIN lists l ON l.cid = p.cid
      WHERE p.prn <= {N_PROBE} AND l.vec_id <> p.query_id
    ),
    ranked AS (
      SELECT query_id, neighbor_id,
             round(list_cosine_similarity(qv, v), 6) AS cos_sim,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY round(list_cosine_similarity(qv, v), 6) DESC,
                                         neighbor_id) AS rn
      FROM cand
    )
    SELECT query_id, neighbor_id, cos_sim, CAST(rn AS BIGINT) AS rn
    FROM ranked WHERE rn <= {TOP_K}
    """


@register(
    "similarity_ann_ivf",
    oracle=_ivf_oracle(),
    doc="ANN top-k via IVF-flat: assign every vector to its nearest of "
    f"{K_CENTROIDS} coarse centroids (build step), probe the {N_PROBE} "
    "centroid lists nearest each query, exact-score only those lists. At "
    "100 TB the inverted lists are partition keys — a probe reads "
    "N_PROBE/K of the corpus instead of all of it, and the centroid table "
    "is broadcast (it is tiny by construction). Deterministic sampled "
    "centroids keep the DuckDB oracle exact; swap in k-means offline for "
    "production recall.",
)
def similarity_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _emb(spark, sf_dir)
    cent = (
        e.filter(F.col("vec_id") % _CENTROID_STRIDE == 1)
        .orderBy("vec_id")
        .limit(K_CENTROIDS)
        .select(F.col("vec_id").alias("cid"), F.col("v").alias("cv"))
    )
    # build: nearest centroid per vector (cosine rounded to 6 so the
    # argmax tie-break matches the oracle bit-for-bit)
    sim = F.round(cosine_fast(F.col("v"), F.col("cv")), 6)
    aw = Window.partitionBy("vec_id").orderBy(F.desc("csim"), F.asc("cid"))
    lists = (
        e.crossJoin(F.broadcast(cent))
        .withColumn("csim", sim)
        .withColumn("arn", F.row_number().over(aw))
        .filter(F.col("arn") == 1)
        .select("vec_id", "v", "cid")
    )
    # probe: N_PROBE nearest centroids per query
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    pw = Window.partitionBy("query_id").orderBy(F.desc("psim"), F.asc("cid"))
    probe = (
        q.crossJoin(F.broadcast(cent))
        .withColumn("psim", F.round(cosine_fast(F.col("qv"), F.col("cv")), 6))
        .withColumn("prn", F.row_number().over(pw))
        .filter(F.col("prn") <= N_PROBE)
        .select("query_id", "qv", "cid")
    )
    cand = (
        lists.join(F.broadcast(probe), "cid")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "qv", F.col("vec_id").alias("neighbor_id"), "v")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        cand.select(
            "query_id",
            "neighbor_id",
            F.round(cosine_fast(F.col("qv"), F.col("v")), 6).alias("cos_sim"),
        )
        .withColumn("rn", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rn") <= TOP_K)
    )


@register(
    "embedding_centroids",
    oracle="""
    WITH ex AS (
      -- parallel unnests zip: (value, 0-based dim index)
      SELECT label,
             CAST(unnest(embedding) AS DOUBLE) AS v,
             unnest(range(len(embedding))) AS idx
      FROM embeddings
    ), cent AS (
      -- + 0.0 folds IEEE -0.0 (a tiny negative mean rounded to zero)
      -- into +0.0 so both engines hash identically
      SELECT label, idx AS dim, round(avg(v), 4) + 0.0 AS c
      FROM ex GROUP BY label, idx
    ), stats AS (
      SELECT label, CAST(count(*) AS BIGINT) AS n_vecs,
             round(avg(sqrt(list_sum(list_transform(embedding,
                   x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))), 4) + 0.0
               AS avg_norm
      FROM embeddings GROUP BY label
    )
    SELECT s.label, s.n_vecs, s.avg_norm, c.dim, c.c
    FROM stats s JOIN cent c USING (label)
    """,
    doc="Per-label embedding centroids + vector-norm statistics: the "
    "codebook-training / dataset-statistics primitive behind IVF. Explode "
    "to (label, dim, value), aggregate per dimension. Output stays in the "
    "exploded (label, dim, c) form — one scalar row per centroid dimension "
    "— because the driver's comparator cannot hash array cells; callers "
    "that want the vector re-assemble with collect_list. Shuffle key is "
    "(label, dim) — 16 bytes — never whole vectors; at 100 TB this is the "
    "standard map-reduce centroid step (k-means iteration = this query + "
    "a broadcast re-assign). Signed zero is normalized (x + 0.0) on both "
    "sides: round(avg) of a tiny negative yields -0.0 in DuckDB, 0.0 in "
    "Spark.",
)
def embedding_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "embeddings", parallel=True)
    ex = e.select("label", F.posexplode("embedding").alias("idx", "v_raw")).select(
        "label", F.col("idx").alias("dim"), F.col("v_raw").cast("double").alias("v")
    )
    cent = ex.groupBy("label", "dim").agg(
        (F.round(F.avg("v"), 4) + F.lit(0.0)).alias("c")
    )
    norm = F.sqrt(
        F.aggregate(
            "embedding",
            F.lit(0.0),
            lambda acc, x: acc + x.cast("double") * x.cast("double"),
        )
    )
    stats = e.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_vecs"),
        (F.round(F.avg(norm), 4) + F.lit(0.0)).alias("avg_norm"),
    )
    return cent.join(F.broadcast(stats), "label").select(
        "label", "n_vecs", "avg_norm", "dim", "c"
    )


KMEANS_K = 8
KMEANS_ITERS = 2  # assignments computed ITERS times; centroids updated between


def _kmeans_assign_cte(cent: str, label: str) -> str:
    """One assignment step vs centroid CTE ``cent`` (argmin L2, ties to the
    smallest cid)."""
    return f"""
    {label} AS (
      SELECT vec_id, cid, dist FROM (
        SELECT e.vec_id, c.cid, list_distance(e.v, c.cv) AS dist,
               row_number() OVER (PARTITION BY e.vec_id
                                  ORDER BY list_distance(e.v, c.cv), c.cid) AS rn
        FROM e CROSS JOIN {cent} c) WHERE rn = 1
    )"""


@register(
    "kmeans_embeddings",
    oracle=f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    c0 AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < {KMEANS_K}),
    {_kmeans_assign_cte('c0', 'a1')},
    x1 AS (
      SELECT a.cid, unnest(e.v) AS val, unnest(range(len(e.v))) AS idx
      FROM a1 a JOIN e ON a.vec_id = e.vec_id
    ),
    c1 AS (
      SELECT cid, list(avg_val ORDER BY idx) AS cv FROM (
        SELECT cid, idx, avg(val) AS avg_val FROM x1 GROUP BY cid, idx)
      GROUP BY cid
    ),
    {_kmeans_assign_cte('c1', 'a2')}
    SELECT vec_id, cid AS cluster_id, round(dist, 4) + 0.0 AS dist
    FROM a2
    """,
    doc=f"Iterative k-means over the embedding corpus ({KMEANS_K} clusters, "
    f"{KMEANS_ITERS} assignment rounds, deterministic first-K init): the "
    "full loop whose single step embedding_centroids isolates, and the "
    "IVF codebook trainer. Spark-side each round collects the (tiny) "
    "K x dim centroid matrix to the driver and embeds it as literal "
    "expressions, so ASSIGNMENT IS A MAP-ONLY PROJECTION — no join, no "
    "shuffle of vectors; the recompute aggregates (cid, dim, value) with "
    "map-side combine. That is exactly MLlib KMeans' distribution "
    "strategy, and the one Spark pattern where a driver collect is the "
    "scalable answer (K*dim doubles, independent of corpus size). Ties "
    "break to the smallest cid on both engines; distances rounded with "
    "signed-zero normalization.",
)
def kmeans_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "embeddings", parallel=True).select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )
    cents: list[tuple[int, list[float]]] = sorted(
        (r["vec_id"], list(r["v"]))
        for r in e.filter(F.col("vec_id") < KMEANS_K).collect()
    )

    def assignment(cents_lit):
        structs = []
        for cid, cv in cents_lit:
            lit_cv = F.array(*[F.lit(float(x)) for x in cv])
            sq = F.aggregate(
                F.zip_with("v", lit_cv, lambda a, b: (a - b) * (a - b)),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            structs.append(
                F.struct(F.sqrt(sq).alias("dist"), F.lit(cid).alias("cid"))
            )
        best = F.array_min(F.array(*structs))
        return e.select(
            "vec_id", "v", best["cid"].alias("cid"), best["dist"].alias("dist")
        )

    assigned = assignment(cents)
    for _ in range(KMEANS_ITERS - 1):
        per_dim = (
            assigned.select("cid", F.posexplode("v").alias("idx", "val"))
            .groupBy("cid", "idx")
            .agg(F.avg("val").alias("avg_val"))
            .collect()
        )
        by_cid: dict[int, dict[int, float]] = {}
        for r in per_dim:
            by_cid.setdefault(r["cid"], {})[r["idx"]] = r["avg_val"]
        cents = sorted(
            (cid, [dims[i] for i in range(len(dims))])
            for cid, dims in by_cid.items()
        )
        assigned = assignment(cents)
    return assigned.select(
        "vec_id",
        F.col("cid").alias("cluster_id"),
        (F.round("dist", 4) + F.lit(0.0)).alias("dist"),
    )


@register(
    "embedding_quantize_int8",
    oracle="""
    WITH scaled AS (
      SELECT vec_id, label,
             greatest(list_max(list_transform(embedding,
                      x -> abs(CAST(x AS DOUBLE)))), 1e-30) AS m,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    ), quant AS (
      SELECT vec_id, label, m,
             list_transform(v, x -> floor((x * 127.0) / m + 0.5)) AS q
      FROM scaled
    )
    SELECT vec_id, label,
           round(m / 127.0, 6) + 0.0 AS scale,
           CAST(list_sum(q) AS BIGINT) AS q_sum,
           CAST(list_sum(list_transform(q, x -> abs(x))) AS BIGINT) AS q_abs_sum,
           CAST(list_sum(list_transform(list_zip(q, range(len(q))),
                t -> t[1] * t[2])) AS BIGINT) AS q_dot_idx,
           CAST(len(list_filter(q, x -> abs(x) = 127)) AS BIGINT) AS n_saturated
    FROM quant
    """,
    doc="Per-vector symmetric int8 quantization (the storage/ANN compression "
    "step for embedding corpora): scale = max|v|/127, q_i = "
    "round-half-up(v_i/scale). Outputs integer checksums of the quantized "
    "vector (sum, |sum|, index-weighted dot) rather than the array itself — "
    "integers are exact across engines and the driver's comparator cannot "
    "hash array cells. floor(x+0.5) is used on both sides because round() "
    "is banker's in DuckDB. Pure map-side higher-order functions over the "
    "vector column — zero shuffles, trivially scales; the int8 payload "
    "would be written back as binary at 1/4 the float32 bytes.",
)
def embedding_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "embeddings", parallel=True)
    v = F.transform("embedding", lambda x: x.cast("double"))
    m = F.greatest(
        F.array_max(F.transform(v, lambda x: F.abs(x))), F.lit(1e-30)
    )
    df = e.select("vec_id", "label", m.alias("m"), v.alias("v"))
    q = F.transform("v", lambda x: F.floor(x * 127.0 / F.col("m") + 0.5))
    df = df.select("vec_id", "label", "m", q.alias("q"))
    lsum = lambda col: F.aggregate(col, F.lit(0).cast("bigint"), lambda a, x: a + x)
    return df.select(
        "vec_id",
        "label",
        (F.round(F.col("m") / 127.0, 6) + F.lit(0.0)).alias("scale"),
        lsum(F.col("q")).alias("q_sum"),
        lsum(F.transform("q", lambda x: F.abs(x))).alias("q_abs_sum"),
        F.aggregate(
            F.zip_with("q", F.sequence(F.lit(0), F.size("q") - 1), lambda q_, i: q_ * i),
            F.lit(0).cast("bigint"),
            lambda a, x: a + x,
        ).alias("q_dot_idx"),
        F.size(F.filter("q", lambda x: F.abs(x) == 127)).cast("bigint").alias("n_saturated"),
    )


@register(
    "similarity_topk_quantized",
    oracle=f"""
    WITH e AS (
      SELECT vec_id,
             greatest(list_max(list_transform(embedding,
                      x -> abs(CAST(x AS DOUBLE)))), 1e-30) AS m,
             list_transform(embedding,
                x -> floor((CAST(x AS DOUBLE) * 127.0) /
                     greatest(list_max(list_transform(embedding,
                              y -> abs(CAST(y AS DOUBLE)))), 1e-30) + 0.5)) AS q
      FROM embeddings
    ),
    qs AS (SELECT vec_id AS query_id, m AS qm, q AS qq FROM e
           WHERE vec_id < {N_QUERIES}),
    scored AS (
      SELECT qs.query_id, e.vec_id AS neighbor_id,
             CAST(list_sum(list_transform(list_zip(qs.qq, e.q),
                  t -> t[1] * t[2])) AS BIGINT) AS int_dot,
             ((qs.qm / 127.0) * (e.m / 127.0)) *
               list_sum(list_transform(list_zip(qs.qq, e.q), t -> t[1] * t[2]))
               AS score
      FROM qs JOIN e ON e.vec_id <> qs.query_id
    ), ranked AS (
      SELECT query_id, neighbor_id, int_dot, score,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY score DESC, neighbor_id) AS rn
      FROM scored
    )
    SELECT query_id, neighbor_id, int_dot,
           round(score, 6) + 0.0 AS approx_dot, CAST(rn AS BIGINT) AS rn
    FROM ranked WHERE rn <= {TOP_K}
    """,
    doc="Asymmetric-distance top-k over int8-quantized vectors (the "
    "PQ/SQ-style compressed-search path: codes live at 1/4 the float32 "
    "bytes, so 4x more index fits per executor): both sides quantize with "
    "the embedding_quantize_int8 scheme, the dot product runs in EXACT "
    "int64 arithmetic (zero cross-engine float-summation-order risk — the "
    "only doubles are two per-vector scales applied in one fixed-order "
    "multiply), and per-query top-k ranks on the rescaled score. Broadcast "
    "query set, JVM-side HOFs, one window shuffle — same plan as the "
    "brute-force baseline but on 8-bit codes.",
)
def similarity_topk_quantized(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "embeddings", parallel=True)
    v = F.transform("embedding", lambda x: x.cast("double"))
    m = F.greatest(F.array_max(F.transform(v, lambda x: F.abs(x))), F.lit(1e-30))
    quant = e.select(
        "vec_id",
        m.alias("m"),
        F.transform(v, lambda x: F.floor(x * 127.0 / m + 0.5)).alias("q"),
    )
    qs = quant.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("m").alias("qm"),
        F.col("q").alias("qq"),
    )
    int_dot = F.aggregate(
        F.zip_with("qq", "q", lambda a, b: a * b),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    scored = quant.join(
        F.broadcast(qs), F.col("vec_id") != F.col("query_id")
    ).select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        int_dot.alias("int_dot"),
        (
            ((F.col("qm") / 127.0) * (F.col("m") / 127.0)) * int_dot
        ).alias("score"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rn") <= TOP_K)
        .select(
            "query_id",
            "neighbor_id",
            "int_dot",
            (F.round("score", 6) + F.lit(0.0)).alias("approx_dot"),
            "rn",
        )
    )
