"""Round-6 operators: the curation / MERGE / interval / community shapes a
training-data platform runs daily, each with an exact DuckDB oracle.

Scale notes (each query's doc covers its own plan; common themes):

- Every corpus-sized relation stays partitioned; the only driver-side
  literals are node-sized (the 25-nation label vector) — the same
  collect-the-summary pattern as ``pagerank_nations``.
- Cross-engine determinism: selection / bucketing decisions are made on
  integers (word counts, md5 hex prefixes, fixed-point cutoffs), never on
  raw floats, so the driver's value-hash comparison is exact by
  construction.
- Reference parity: these extend the engine surface beyond the connector's
  own operator set (reference: damianiandrea/mongodb-nats-connector has no
  batch query engine; see SURVEY.md §2.4) — they are the data-pipeline
  operations the task brief lists as first-class.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mongodb_nats_connector_spark.operators.graph_common import trade_edges
from mongodb_nats_connector_spark.plans.hints import maybe_broadcast
from mongodb_nats_connector_spark.registry import register
from mongodb_nats_connector_spark.sources.tables import table

# ---------------------------------------------------------------------------
# docs_topp_quality — per-source nucleus (top-p) selection
# ---------------------------------------------------------------------------

TOPP_PCT = 80  # keep documents covering the top 80% of per-source score mass


@register(
    "docs_topp_quality",
    oracle=f"""
    WITH scored AS (
      SELECT source, doc_id,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS score
      FROM documents
    ), ranked AS (
      SELECT source, doc_id, score,
             row_number() OVER (PARTITION BY source
                                ORDER BY score DESC, doc_id) AS rn,
             sum(score) OVER (PARTITION BY source
                              ORDER BY score DESC, doc_id
                              ROWS UNBOUNDED PRECEDING) AS cum,
             sum(score) OVER (PARTITION BY source) AS total
      FROM scored
    )
    SELECT source, doc_id, score, CAST(rn AS BIGINT) AS rn
    FROM ranked
    WHERE (cum - score) * 100 < {TOPP_PCT} * total
    """,
    doc="Per-source nucleus (top-p) document selection: rank documents by a "
    "quality score (token count) within each source and keep the smallest "
    "prefix covering the top "
    f"{TOPP_PCT}% of the source's total score mass — the dataset-curation "
    "step that trims each domain's low-quality tail without a fixed count "
    "cutoff. One window partitioning (source) computes rank, running mass "
    "and total in a single shuffle; the keep decision is pure BIGINT "
    "arithmetic ((cum-score)*100 < p*total), so both engines agree exactly "
    "and the plan is one scan + one window at any corpus size.",
)
def docs_topp_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    scored = docs.select(
        "source",
        "doc_id",
        F.size(F.split("text", " ")).cast("bigint").alias("score"),
    )
    w = Window.partitionBy("source").orderBy(F.desc("score"), F.asc("doc_id"))
    ranked = scored.select(
        "source",
        "doc_id",
        "score",
        F.row_number().over(w).cast("bigint").alias("rn"),
        F.sum("score").over(w.rowsBetween(Window.unboundedPreceding, 0)).alias("cum"),
        F.sum("score").over(Window.partitionBy("source")).alias("total"),
    )
    return ranked.filter(
        (F.col("cum") - F.col("score")) * 100 < TOPP_PCT * F.col("total")
    ).select("source", "doc_id", "score", "rn")


# ---------------------------------------------------------------------------
# sample_epoch_upsample — deterministic hash-tiered repetition
# ---------------------------------------------------------------------------

UPSAMPLE_SALT = "epoch6"


@register(
    "sample_epoch_upsample",
    oracle=f"""
    WITH tiered AS (
      SELECT doc_id, source,
             CASE WHEN substr(md5('{UPSAMPLE_SALT}' || CAST(doc_id AS VARCHAR)), 1, 1)
                       < '4' THEN 3
                  WHEN substr(md5('{UPSAMPLE_SALT}' || CAST(doc_id AS VARCHAR)), 1, 1)
                       < '8' THEN 2
                  ELSE 1 END AS n_copies
      FROM documents
    )
    SELECT doc_id, source, CAST(n_copies AS BIGINT) AS n_copies,
           CAST(copy_idx AS BIGINT) AS copy_idx,
           CAST(doc_id * 4 + copy_idx AS BIGINT) AS sample_id
    FROM tiered, unnest(generate_series(1, n_copies)) AS t(copy_idx)
    """,
    doc="Deterministic epoch upsampling: each document draws a repetition "
    "tier (1-3 copies) from a salted md5 of its id — the hex-prefix "
    "bucketing used by the split/sample family, reproducible and identical "
    "in both engines — then explodes into per-epoch copies with a stable "
    "sample_id. This is how high-quality domains get oversampled into a "
    "training mix without materializing a shuffled copy: the explode is "
    "map-side (no shuffle at all), so output cost is proportional to the "
    "emitted copies and the operator composes with downstream packing.",
)
def sample_epoch_upsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    prefix = F.substring(
        F.md5(F.concat(F.lit(UPSAMPLE_SALT), F.col("doc_id").cast("string"))), 1, 1
    )
    tiered = docs.select(
        "doc_id",
        "source",
        F.when(prefix < "4", 3).when(prefix < "8", 2).otherwise(1)
        .cast("bigint")
        .alias("n_copies"),
    )
    return tiered.select(
        "doc_id",
        "source",
        "n_copies",
        F.explode(F.sequence(F.lit(1).cast("bigint"), F.col("n_copies"))).alias(
            "copy_idx"
        ),
    ).withColumn("sample_id", (F.col("doc_id") * 4 + F.col("copy_idx")).cast("bigint"))


# ---------------------------------------------------------------------------
# text_code_detect — code-vs-prose heuristic classifier
# ---------------------------------------------------------------------------

_CODE_SYMBOLS = r"[{}();=<>\[\]]"
_CODE_KEYWORDS = r"\b(def|class|return|import|function|var|const|void|int)\b"


@register(
    "text_code_detect",
    oracle=f"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '{_CODE_SYMBOLS}')) AS BIGINT)
             AS sym_cnt,
           CAST(len(regexp_extract_all(lower(text), '{_CODE_KEYWORDS}'))
             AS BIGINT) AS kw_cnt,
           CAST(CASE WHEN len(regexp_extract_all(text, '{_CODE_SYMBOLS}')) * 50
                          > n_chars
                       OR len(regexp_extract_all(lower(text), '{_CODE_KEYWORDS}'))
                          >= 3
                     THEN 1 ELSE 0 END AS BIGINT) AS is_code
    FROM documents
    """,
    doc="Code-vs-prose heuristic (the corpus-routing step before "
    "code-specific filters): per-document counts of code punctuation and "
    "language keywords, flagged as code when symbol density exceeds 2% of "
    "characters or >=3 keyword hits. Pure row-local regexp counting — "
    "map-only, JVM-side regex, no shuffle — and the decision is integer "
    "arithmetic (sym*50 > n_chars), exact in both engines. The same "
    "patterns compile identically under Java regex and RE2 (simple class "
    "+ \\b alternation).",
)
def text_code_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents", parallel=True)
    sym = F.regexp_count("text", F.lit(_CODE_SYMBOLS)).cast("bigint")
    kw = F.regexp_count(F.lower("text"), F.lit(_CODE_KEYWORDS)).cast("bigint")
    return docs.select(
        "doc_id",
        sym.alias("sym_cnt"),
        kw.alias("kw_cnt"),
        ((sym * 50 > F.col("n_chars")) | (kw >= 3)).cast("bigint").alias("is_code"),
    )


# ---------------------------------------------------------------------------
# text_perplexity_bucket — CCNet-style surprisal tertiles per language
# ---------------------------------------------------------------------------


@register(
    "text_perplexity_bucket",
    oracle="""
    WITH w AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
    ), vocab AS (
      SELECT word, count(*) AS cnt FROM w GROUP BY word
    ), total AS (
      SELECT sum(cnt) AS n FROM vocab
    ), scored AS (
      SELECT w.doc_id,
             round(avg(-ln(vocab.cnt * 1.0 / total.n)), 4) AS avg_surprisal
      FROM w JOIN vocab USING (word) CROSS JOIN total
      GROUP BY w.doc_id
    ), bucketed AS (
      SELECT d.lang, s.doc_id, s.avg_surprisal,
             ntile(3) OVER (PARTITION BY d.lang
                            ORDER BY s.avg_surprisal, s.doc_id) AS tert
      FROM scored s JOIN documents d USING (doc_id)
    )
    SELECT lang, doc_id, avg_surprisal,
           CASE tert WHEN 1 THEN 'head' WHEN 2 THEN 'middle'
                     ELSE 'tail' END AS ppl_bucket
    FROM bucketed
    """,
    doc="CCNet-style perplexity bucketing: score every document with the "
    "corpus unigram-LM mean surprisal (same broadcast-vocab single-shuffle "
    "shape as text_unigram_surprisal), then split each language into "
    "head/middle/tail tertiles by ntile(3). The tertile ordering uses the "
    "ROUNDED surprisal plus doc_id as tiebreak, so bucket assignment is "
    "deterministic across engines despite float scoring. Per-language "
    "windows shuffle only (doc_id, lang, score) — 20 bytes per document "
    "regardless of text size.",
)
def text_perplexity_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents", parallel=True)
    w = docs.select("doc_id", F.explode(F.split("text", " ")).alias("word"))
    vocab = w.groupBy("word").agg(F.count(F.lit(1)).alias("cnt"))
    total = vocab.agg(F.sum("cnt").alias("n"))
    scored = (
        w.join(maybe_broadcast(vocab), "word")
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id")
        .agg(F.round(F.avg(-F.log(F.col("cnt") / F.col("n"))), 4).alias("avg_surprisal"))
    )
    lang = docs.select("doc_id", "lang")
    tert_w = Window.partitionBy("lang").orderBy("avg_surprisal", "doc_id")
    return (
        scored.join(lang, "doc_id")
        .withColumn("tert", F.ntile(3).over(tert_w))
        .select(
            "lang",
            "doc_id",
            "avg_surprisal",
            F.when(F.col("tert") == 1, "head")
            .when(F.col("tert") == 2, "middle")
            .otherwise("tail")
            .alias("ppl_bucket"),
        )
    )


# ---------------------------------------------------------------------------
# dedup_embedding_cosine — LSH-bucketed semantic near-duplicate pairs
# ---------------------------------------------------------------------------


# deterministic per-(table, bucket) membership cap — same defense as the
# text-LSH MAX_BUCKET_MEMBERS: a degenerate cell (e.g. near-zero vectors all
# hashing to one signature) otherwise expands quadratically. Truncation is
# by vec_id, so both engines drop the identical members.
EMB_BUCKET_CAP = 1024


def _emb_dedup_oracle() -> str:
    from mongodb_nats_connector_spark.operators.similarity import (
        HYPERPLANES,
        NEARDUP_COS,
        _L_TABLES,
        _N_BITS,
    )

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
    buckets0 AS (
      SELECT e.vec_id, p.tbl,
             CAST(sum(CASE WHEN list_sum(list_transform(list_zip(e.v, p.h),
                                 x -> x[1] * x[2])) > 0
                           THEN (1 << p.bit) ELSE 0 END) AS BIGINT) AS bucket
      FROM e CROSS JOIN planes p
      GROUP BY e.vec_id, p.tbl
    ),
    buckets AS (
      SELECT vec_id, tbl, bucket FROM (
        SELECT vec_id, tbl, bucket,
               row_number() OVER (PARTITION BY tbl, bucket
                                  ORDER BY vec_id) AS rn
        FROM buckets0
      ) WHERE rn <= {EMB_BUCKET_CAP}
    ),
    cand AS (
      SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
      FROM buckets a JOIN buckets b
        ON a.tbl = b.tbl AND a.bucket = b.bucket AND a.vec_id < b.vec_id
    )
    SELECT c.vec_a, c.vec_b,
           round(list_cosine_similarity(ea.v, eb.v), 6) AS cos_sim
    FROM cand c
    JOIN e ea ON ea.vec_id = c.vec_a
    JOIN e eb ON eb.vec_id = c.vec_b
    WHERE NOT isnan(list_cosine_similarity(ea.v, eb.v))
      AND round(list_cosine_similarity(ea.v, eb.v), 6) >= {NEARDUP_COS}
    """


@register(
    "dedup_embedding_cosine",
    oracle=_emb_dedup_oracle(),
    doc="Embedding-cosine near-duplicate pairs, LSH-bucketed (the SCALE "
    "path for similarity_neardup_pairs' quadratic baseline): vectors are "
    "sign-hashed into 10x8-bit buckets by the same seeded hyperplanes as "
    "similarity_ann_lsh, candidate pairs are generated only WITHIN a "
    "(table, bucket) cell, then verified with an exact cosine at the "
    "threshold. Only (vec_id, tbl, bucket) triples shuffle — never the "
    "vectors, which re-join by id for the verify step; the candidate "
    "volume tracks true duplicate density, not n², and a deterministic "
    f"per-cell membership cap ({EMB_BUCKET_CAP}, truncated by vec_id — the "
    "same defense as the text-LSH bucket cap) bounds the worst degenerate "
    "cell. The oracle replays the hyperplanes AND the cap as SQL literals, "
    "so the approximate index is itself hash-verified. Every emitted pair is exact-verified (precision 1.0, "
    "asserted as a subset of the quadratic baseline); recall is the "
    "standard sign-LSH amplification curve — >=0.95 for true near-dups "
    "(cos >= 0.95, asserted on planted duplicates in tests/test_round6.py) "
    "while the synthetic corpus's max pair similarity of ~0.5 sits in the "
    "regime the bucketing intentionally prunes.",
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mongodb_nats_connector_spark.functions.vectors import cosine_fast
    from mongodb_nats_connector_spark.operators.similarity import (
        NEARDUP_COS,
        _bucket_udf,
        _emb,
    )

    e = _emb(spark, sf_dir)
    buckets = e.select(
        "vec_id", F.posexplode(_bucket_udf(F.col("v"))).alias("tbl", "bucket")
    )
    cap_w = Window.partitionBy("tbl", "bucket").orderBy("vec_id")
    buckets = (
        buckets.withColumn("rn", F.row_number().over(cap_w))
        .filter(F.col("rn") <= EMB_BUCKET_CAP)
        .drop("rn")
    )
    a = buckets.select(
        F.col("vec_id").alias("vec_a"), F.col("tbl"), F.col("bucket")
    )
    b = buckets.select(
        F.col("vec_id").alias("vec_b"), F.col("tbl"), F.col("bucket")
    )
    cand = (
        a.join(b, ["tbl", "bucket"])
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b")
        .distinct()
    )
    ea = e.select(F.col("vec_id").alias("vec_a"), F.col("v").alias("va"))
    eb = e.select(F.col("vec_id").alias("vec_b"), F.col("v").alias("vb"))
    return (
        cand.join(ea, "vec_a")
        .join(eb, "vec_b")
        .select(
            "vec_a",
            "vec_b",
            F.round(cosine_fast(F.col("va"), F.col("vb")), 6).alias("cos_sim"),
        )
        # NaN (zero-norm/degenerate vectors) compares greater-than in both
        # engines' float ordering — guard explicitly or garbage pairs leak
        .filter(~F.isnan(F.col("cos_sim")) & (F.col("cos_sim") >= NEARDUP_COS))
    )


# ---------------------------------------------------------------------------
# window_rolling_median — exact trailing-frame median per key
# ---------------------------------------------------------------------------

ROLL_FRAME = 6  # trailing 7-row frame (6 preceding + current)


@register(
    "window_rolling_median",
    oracle=f"""
    SELECT user_id, event_id,
           round(median(value) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN {ROLL_FRAME} PRECEDING AND CURRENT ROW), 6)
             AS rolling_median
    FROM events
    WHERE user_id < 25 AND ts IS NOT NULL
    """,
    doc="Exact rolling median (robust smoother for metric streams): per "
    "user, the interpolated median of the trailing 7-row frame. Spark's "
    "percentile(value, 0.5) as a frame-bounded window aggregate matches "
    "DuckDB's median() (both interpolate the even-count midpoint). One "
    "window shuffle on the partition key; the frame is O(1) rows so state "
    "per row is constant — the shape survives any fact-table scale, and "
    "the user_id pushdown predicate reaches the parquet scan.",
)
def window_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    # NULL-ts guard on both engines (Spark NULLS FIRST asc vs DuckDB LAST
    # would put such rows in different frames).
    ev = table(spark, sf_dir, "events").filter(
        (F.col("user_id") < 25) & F.col("ts").isNotNull()
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-ROLL_FRAME, 0)
    )
    med = F.expr("percentile(value, 0.5)").over(w)
    return ev.select(
        "user_id", "event_id", F.round(med, 6).alias("rolling_median")
    )


# ---------------------------------------------------------------------------
# join_interval_overlap — interval-overlap join via day tiles
# ---------------------------------------------------------------------------


@register(
    "join_interval_overlap",
    oracle="""
    WITH sess AS (
      SELECT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
             min(ts) AS s_start, max(ts) AS s_end
      FROM events GROUP BY 1, 2
    ), promos AS (
      SELECT day,
             CASE slot WHEN 0 THEN 'am' ELSE 'pm' END AS promo,
             day + CASE slot WHEN 0 THEN INTERVAL 9 HOUR
                             ELSE INTERVAL 14 HOUR END AS p_start,
             day + CASE slot WHEN 0 THEN INTERVAL 12 HOUR
                             ELSE INTERVAL 18 HOUR END AS p_end
      FROM (SELECT DISTINCT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day
            FROM events),
           unnest([0, 1]) AS t(slot)
    )
    SELECT s.user_id, s.day, p.promo,
           CAST(epoch_us(least(s.s_end, p.p_end))
                - epoch_us(greatest(s.s_start, p.p_start)) AS BIGINT)
             AS overlap_micros
    FROM sess s JOIN promos p ON s.day = p.day
    WHERE s.s_start < p.p_end AND p.p_start < s.s_end
    """,
    doc="Interval-overlap join (the ad-exposure / maintenance-window "
    "attribution shape): per-user daily activity intervals joined to "
    "promo windows on the shared DAY TILE (equi key), with the actual "
    "overlap predicate and exact microsecond overlap length as a "
    "post-filter — so Catalyst plans a hash join on the tile, never a "
    "cartesian range join. Intervals here are day-contained by "
    "construction; multi-day intervals generalize by exploding each into "
    "its covering tiles (the standard tiling decomposition), keeping the "
    "join equi-keyed at any scale.",
)
def join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    sess = ev.groupBy(
        "user_id", F.date_trunc("day", "ts").alias("day")
    ).agg(F.min("ts").alias("s_start"), F.max("ts").alias("s_end"))
    days = ev.select(F.date_trunc("day", "ts").alias("day")).distinct()
    slots = days.select(
        "day", F.explode(F.array(F.lit(0), F.lit(1))).alias("slot")
    )
    promos = slots.select(
        "day",
        F.when(F.col("slot") == 0, "am").otherwise("pm").alias("promo"),
        F.when(
            F.col("slot") == 0, F.col("day") + F.expr("INTERVAL 9 HOURS")
        ).otherwise(F.col("day") + F.expr("INTERVAL 14 HOURS")).alias("p_start"),
        F.when(
            F.col("slot") == 0, F.col("day") + F.expr("INTERVAL 12 HOURS")
        ).otherwise(F.col("day") + F.expr("INTERVAL 18 HOURS")).alias("p_end"),
    )
    joined = sess.join(maybe_broadcast(promos), "day").filter(
        (F.col("s_start") < F.col("p_end")) & (F.col("p_start") < F.col("s_end"))
    )
    return joined.select(
        "user_id",
        "day",
        "promo",
        (
            F.unix_micros(F.least("s_end", "p_end"))
            - F.unix_micros(F.greatest("s_start", "p_start"))
        ).cast("bigint").alias("overlap_micros"),
    )


# ---------------------------------------------------------------------------
# merge_upsert_snapshot — MERGE (upsert + delete + insert) semantics
# ---------------------------------------------------------------------------

# insert keys shift past the snapshot's max key (computed from the data,
# never a constant: a fixed shift collides with real o_orderkey values at
# large scale factors and would silently overwrite unrelated orders)


@register(
    "merge_upsert_snapshot",
    oracle=f"""
    WITH base AS (
      SELECT o_orderkey, o_orderstatus, round(o_totalprice, 2) AS o_totalprice
      FROM orders
    ), changes AS (
      SELECT o_orderkey AS key,
             CASE WHEN o_orderkey % 10 = 0 THEN 'D' ELSE 'U' END AS op,
             'UPDATED' AS status, round(o_totalprice + 100.0, 2) AS total
      FROM orders WHERE o_orderkey % 10 < 3
      UNION ALL
      SELECT o_orderkey + mx.shift, 'I', 'NEW',
             round(o_totalprice, 2)
      FROM orders, (SELECT max(o_orderkey) + 1 AS shift FROM orders) mx
      WHERE o_orderkey % 10 = 7
    )
    SELECT coalesce(b.o_orderkey, c.key) AS o_orderkey,
           CASE WHEN c.op IN ('U', 'I') THEN c.status
                ELSE b.o_orderstatus END AS o_orderstatus,
           CASE WHEN c.op IN ('U', 'I') THEN c.total
                ELSE b.o_totalprice END AS o_totalprice
    FROM base b FULL OUTER JOIN changes c ON b.o_orderkey = c.key
    WHERE c.op IS NULL OR c.op <> 'D'
    """,
    doc="MERGE INTO semantics (the Delta/Iceberg upsert shape) expressed "
    "as one full-outer join: a change batch of updates (keys %10 in 1..2), "
    "deletes (%10 = 0) and inserts (%10 = 7 keys shifted past the snapshot max — disjoint at every scale factor by construction) applies "
    "onto the orders snapshot — matched+U rewrites, matched+D drops, "
    "unmatched+I appends, untouched rows pass through. The join is "
    "co-partitioned on the natural key (both sides shuffle once; AQE "
    "handles skew), which is exactly how table-format MERGE executes at "
    "100 TB — no broadcast, no driver-side diffing. Change-capture "
    "semantics mirror the reference's insert/update/delete event model "
    "(reference: internal/mongo/watcher.go operationType handling).",
)
def merge_upsert_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    base = o.select(
        "o_orderkey", "o_orderstatus", F.round("o_totalprice", 2).alias("o_totalprice")
    )
    src = o.filter(F.col("o_orderkey") % 10 < 3).select(
        F.col("o_orderkey").alias("key"),
        F.when(F.col("o_orderkey") % 10 == 0, "D").otherwise("U").alias("op"),
        F.lit("UPDATED").alias("status"),
        F.round(F.col("o_totalprice") + 100.0, 2).alias("total"),
    )
    mx = o.agg((F.max("o_orderkey") + 1).alias("shift"))
    ins = (
        o.filter(F.col("o_orderkey") % 10 == 7)
        .crossJoin(F.broadcast(mx))
        .select(
            (F.col("o_orderkey") + F.col("shift")).alias("key"),
            F.lit("I").alias("op"),
            F.lit("NEW").alias("status"),
            F.round("o_totalprice", 2).alias("total"),
        )
    )
    changes = src.unionAll(ins)
    merged = base.join(changes, base["o_orderkey"] == changes["key"], "full_outer")
    upserted = F.col("op").isin("U", "I")
    return merged.filter(F.col("op").isNull() | (F.col("op") != "D")).select(
        F.coalesce(base["o_orderkey"], F.col("key")).alias("o_orderkey"),
        F.when(upserted, F.col("status"))
        .otherwise(base["o_orderstatus"])
        .alias("o_orderstatus"),
        F.when(upserted, F.col("total"))
        .otherwise(base["o_totalprice"])
        .alias("o_totalprice"),
    )


# ---------------------------------------------------------------------------
# events_ab_uplift — deterministic A/B assignment + conversion uplift
# ---------------------------------------------------------------------------

AB_SALT = "exp42"


@register(
    "events_ab_uplift",
    oracle=f"""
    WITH assigned AS (
      SELECT user_id,
             CASE WHEN substr(md5('{AB_SALT}' || CAST(user_id AS VARCHAR)), 1, 1)
                       < '8' THEN 'A' ELSE 'B' END AS bucket,
             event_type, value
      FROM events
    )
    SELECT bucket,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(count(DISTINCT CASE WHEN event_type = 'purchase'
                                    THEN user_id END) AS BIGINT) AS converters,
           round(count(DISTINCT CASE WHEN event_type = 'purchase'
                                     THEN user_id END) * 1.0
                 / count(DISTINCT user_id), 6) AS conv_rate,
           round(sum(CASE WHEN event_type = 'purchase' THEN value END), 2)
             AS purchase_value
    FROM assigned GROUP BY bucket
    """,
    doc="A/B experiment readout with deterministic assignment: users hash "
    "into arms by salted-md5 hex prefix (reproducible, engine-identical — "
    "the industry-standard bucketing that needs no assignment table), then "
    "per-arm distinct users, converters, conversion rate and purchase "
    "value in ONE aggregation pass (conditional count-distincts expand to "
    "Spark's standard distinct-aggregate rewrite). Everything reduces "
    "map-side to per-arm partials; output is 2 rows at any scale.",
)
def events_ab_uplift(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    bucket = F.when(
        F.substring(
            F.md5(F.concat(F.lit(AB_SALT), F.col("user_id").cast("string"))), 1, 1
        )
        < "8",
        "A",
    ).otherwise("B")
    purchase_user = F.when(F.col("event_type") == "purchase", F.col("user_id"))
    return (
        ev.select(
            bucket.alias("bucket"),
            "user_id",
            "event_type",
            "value",
            purchase_user.alias("p_user"),
        )
        .groupBy("bucket")
        .agg(
            F.count_distinct("user_id").cast("bigint").alias("n_users"),
            F.count_distinct("p_user").cast("bigint").alias("converters"),
            F.round(
                F.count_distinct("p_user") / F.count_distinct("user_id"), 6
            ).alias("conv_rate"),
            F.round(
                F.sum(F.when(F.col("event_type") == "purchase", F.col("value"))), 2
            ).alias("purchase_value"),
        )
    )


# ---------------------------------------------------------------------------
# graph_label_propagation — weighted-majority community detection
# ---------------------------------------------------------------------------

LP_ROUNDS = 2


def _lp_oracle() -> str:
    base = """
    WITH dir_edges AS (
      SELECT c.c_nationkey AS src, s.s_nationkey AS dst,
             CAST(count(*) AS BIGINT) AS w
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      WHERE c.c_nationkey <> s.s_nationkey
      GROUP BY 1, 2
    ),
    edges AS (
      SELECT src, dst, sum(w) AS w FROM (
        SELECT src, dst, w FROM dir_edges
        UNION ALL SELECT dst, src, w FROM dir_edges
      ) GROUP BY src, dst
    ),
    nodes AS (SELECT n_nationkey AS node FROM nation),
    lab0 AS (SELECT node, node AS label FROM nodes)"""
    step = """,
    vote{next} AS (
      SELECT e.dst AS node, p.label, sum(e.w) AS mass
      FROM lab{cur} p JOIN edges e ON e.src = p.node
      GROUP BY e.dst, p.label
    ),
    lab{next} AS (
      SELECT n.node,
             coalesce(
               (SELECT v.label FROM vote{next} v WHERE v.node = n.node
                ORDER BY v.mass DESC, v.label LIMIT 1),
               n.node) AS label
      FROM nodes n
    )"""
    for i in range(LP_ROUNDS):
        base += step.format(next=i + 1, cur=i)
    return (
        base
        + f"""
    SELECT n.n_name AS nation, CAST(l.label AS BIGINT) AS community
    FROM lab{LP_ROUNDS} l JOIN nation n ON n.n_nationkey = l.node
    """
    )


@register(
    "graph_label_propagation",
    oracle=_lp_oracle(),
    doc=f"Community detection by synchronous weighted label propagation "
    f"({LP_ROUNDS} rounds) over the undirected customer-supplier trade "
    "graph: each round every node adopts the label with the largest "
    "incident edge-weight mass (ties break to the smaller label — fully "
    "deterministic, so the fixed-round result is engine-exact). The edge "
    "list aggregates once from the facts (the only wide shuffle) and is "
    "nation-bounded, so it is collected once and the rounds run as the "
    "identical exact-integer vote/argmax recurrence on the driver. At "
    "billions of edges the same rounds run distributed — the node-sized "
    "label relation joins the hash-partitioned edges and reduces by "
    "(node, label), the Pregel message pattern; rounds are fixed, not "
    "data-dependent.",
)
def graph_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = table(spark, sf_dir, "nation")
    dir_edges = trade_edges(spark, sf_dir)
    edges = (
        dir_edges.unionAll(
            dir_edges.select(
                F.col("dst").alias("src"), F.col("src").alias("dst"), "w"
            )
        )
        .groupBy("src", "dst")
        .agg(F.sum("w").alias("w"))
    )
    # The weighted symmetric edge list is nation-dimension-bounded
    # (<= 625 rows — a driver scalar, like the node/label/vote relations
    # already were), so after the single corpus-proportional aggregation
    # it is collected ONCE and the LP_ROUNDS synchronous rounds run in
    # exact Python integer arithmetic on the driver (the pagerank_nations
    # discipline: masses are BIGINT edge-weight sums — partial sums
    # commute — and the (mass DESC, label ASC) argmax is replicated
    # literally, so every label is bit-identical to the per-round
    # broadcast-join formulation the oracle unrolls). Formerly each
    # build replayed LP_ROUNDS broadcast joins + rank windows over the
    # persisted edges into an eager localCheckpoint.
    edge_rows = [(r["src"], r["dst"], r["w"]) for r in edges.collect()]
    node_ids = [r["node"] for r in
                nation.select(F.col("n_nationkey").alias("node")).collect()]
    labels = {node: node for node in node_ids}
    for _ in range(LP_ROUNDS):
        votes: dict = {}
        for src, dst, w in edge_rows:
            lab = labels.get(src)
            if lab is None:
                continue
            key = (dst, lab)
            votes[key] = votes.get(key, 0) + w
        by_node: dict = {}
        for (nd, lab), mass in votes.items():
            by_node.setdefault(nd, []).append((mass, lab))
        labels = {
            node: (
                min(by_node[node], key=lambda ml: (-ml[0], ml[1]))[1]
                if node in by_node
                else node
            )
            for node in node_ids
        }
    lab_lit = F.create_map(
        *[F.lit(v) for node, lab in labels.items() for v in (node, lab)]
    )
    return nation.select(
        F.col("n_name").alias("nation"),
        lab_lit[F.col("n_nationkey")].cast("bigint").alias("community"),
    )


# ---------------------------------------------------------------------------
# events_stickiness_dau_wau — rolling distinct actives via tile explode
# ---------------------------------------------------------------------------

WAU_DAYS = 7


@register(
    "events_stickiness_dau_wau",
    oracle=f"""
    WITH ud AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
    ), days AS (
      SELECT DISTINCT day FROM ud
    ), covered AS (
      SELECT ud.user_id,
             CAST(unnest(generate_series(
               ud.day, ud.day + INTERVAL {WAU_DAYS - 1} DAY,
               INTERVAL 1 DAY)) AS DATE) AS rday
      FROM ud
    ), wau AS (
      SELECT c.rday AS day, count(DISTINCT c.user_id) AS wau
      FROM covered c JOIN days d ON d.day = c.rday
      GROUP BY 1
    ), dau AS (
      SELECT day, count(DISTINCT user_id) AS dau FROM ud GROUP BY 1
    )
    SELECT dau.day, CAST(dau.dau AS BIGINT) AS dau,
           CAST(wau.wau AS BIGINT) AS wau,
           round(dau.dau * 1.0 / wau.wau, 6) AS stickiness
    FROM dau JOIN wau ON dau.day = wau.day
    """,
    doc=f"DAU/WAU stickiness per day: daily actives over trailing-"
    f"{WAU_DAYS}-day actives. Exact rolling COUNT(DISTINCT) does not "
    "decompose over window frames, so the scale formulation is the TILE "
    "EXPLODE: each (user, active-day) row fans out map-side to the "
    f"{WAU_DAYS} report days it supports, then one distinct-aggregate per "
    "report day — shuffle volume is exactly (user, day) pairs x window/"
    "granularity, never raw events, and the fan-out factor is a constant "
    "chosen by the report (7 here, 30 for MAU). Early days aggregate their "
    "partial window, identically in both engines.",
)
def events_stickiness_dau_wau(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    ud = ev.select("user_id", F.to_date("ts").alias("day")).distinct()
    days = ud.select("day").distinct()
    covered = ud.select(
        "user_id",
        F.explode(
            F.sequence(
                F.col("day"),
                F.date_add(F.col("day"), WAU_DAYS - 1),
                F.expr("INTERVAL 1 DAY"),
            )
        ).alias("rday"),
    )
    wau = (
        covered.join(maybe_broadcast(days), covered["rday"] == days["day"])
        .groupBy("rday")
        .agg(F.count_distinct("user_id").cast("bigint").alias("wau"))
    )
    dau = ud.groupBy("day").agg(
        F.count_distinct("user_id").cast("bigint").alias("dau")
    )
    return dau.join(wau, dau["day"] == wau["rday"]).select(
        dau["day"],
        "dau",
        "wau",
        F.round(F.col("dau") / F.col("wau"), 6).alias("stickiness"),
    )


# ---------------------------------------------------------------------------
# docs_ngram_novelty — first-occurrence novelty scoring
# ---------------------------------------------------------------------------


@register(
    "docs_ngram_novelty",
    oracle="""
    WITH d AS (
      SELECT doc_id,
             list_distinct(list_transform(
               range(len(string_split(text, ' ')) - 2),
               i -> string_split(text, ' ')[i+1] || ' ' ||
                    string_split(text, ' ')[i+2] || ' ' ||
                    string_split(text, ' ')[i+3])) AS sh
      FROM documents
      WHERE len(string_split(text, ' ')) >= 3
    ), u AS (
      SELECT doc_id, unnest(sh) AS g FROM d
    ), first_seen AS (
      SELECT g, min(doc_id) AS first_doc FROM u GROUP BY g
    )
    SELECT u.doc_id,
           CAST(count(*) AS BIGINT) AS n_grams,
           CAST(sum(CASE WHEN f.first_doc = u.doc_id THEN 1 ELSE 0 END)
                AS BIGINT) AS novel_grams,
           round(sum(CASE WHEN f.first_doc = u.doc_id THEN 1 ELSE 0 END)
                 * 1.0 / count(*), 6) AS novelty_ratio
    FROM u JOIN first_seen f USING (g)
    GROUP BY u.doc_id
    """,
    doc="First-occurrence n-gram novelty (dedup-aware quality signal, the "
    "per-document form of RefinedWeb's repeated-span accounting): the "
    "fraction of a document's distinct word-3-grams whose FIRST corpus "
    "occurrence (min doc_id — deterministic under any partitioning) is "
    "this document. Low novelty = mostly-boilerplate/near-dup content "
    "even when no single pair crosses a dedup threshold. Two keyed "
    "aggregations (gram, then doc_id); at 100 TB the gram key hashes to "
    "64-bit ints exactly as the shared shingle relation in dedup.py does "
    "(string grams here keep the oracle engine-identical).",
)
def docs_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents", parallel=True)
    words = docs.select("doc_id", F.split("text", " ").alias("ws")).filter(
        F.size("ws") >= 3
    )
    grams = words.select(
        "doc_id",
        F.explode(
            F.array_distinct(
                F.transform(
                    F.slice(F.col("ws"), 1, F.size("ws") - 2),
                    lambda x, i: F.concat_ws(
                        " ",
                        x,
                        F.element_at(F.col("ws"), i + 2),
                        F.element_at(F.col("ws"), i + 3),
                    ),
                )
            )
        ).alias("g"),
    )
    first_seen = grams.groupBy("g").agg(F.min("doc_id").alias("first_doc"))
    return (
        grams.join(first_seen, "g")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_grams"),
            F.sum((F.col("first_doc") == F.col("doc_id")).cast("int"))
            .cast("bigint")
            .alias("novel_grams"),
            F.round(
                F.sum((F.col("first_doc") == F.col("doc_id")).cast("int"))
                / F.count(F.lit(1)),
                6,
            ).alias("novelty_ratio"),
        )
    )


# ---------------------------------------------------------------------------
# events_max_concurrency — sweep-line concurrent-session counting
# ---------------------------------------------------------------------------


@register(
    "events_max_concurrency",
    oracle="""
    WITH marked AS (
      SELECT user_id, ts, event_id,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR ts - lag(ts) OVER w > INTERVAL '30 minutes'
                  THEN 1 ELSE 0 END AS is_new
      FROM events WHERE ts IS NOT NULL
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sess AS (
      SELECT user_id,
             sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS UNBOUNDED PRECEDING) AS sid,
             ts
      FROM marked
    ), intervals AS (
      SELECT user_id, sid, min(ts) AS s_start, max(ts) AS s_end
      FROM sess GROUP BY user_id, sid
    ), pts AS (
      SELECT s_start AS t, 1 AS delta, 0 AS tie FROM intervals
      UNION ALL
      SELECT s_end, -1, 1 FROM intervals
    ), swept AS (
      SELECT CAST(date_trunc('day', t) AS TIMESTAMP) AS day,
             sum(delta) OVER (ORDER BY t, tie ROWS UNBOUNDED PRECEDING)
               AS live
      FROM pts
    )
    SELECT day, CAST(max(live) AS BIGINT) AS max_concurrent
    FROM swept GROUP BY day
    """,
    doc="Peak concurrency per day by SWEEP LINE: user sessions (30-min "
    "inactivity gap) become +1/-1 endpoint events; one global running sum "
    "ordered by time gives the live-session count at every boundary, and "
    "the daily max is the capacity-planning number (peak concurrent users/"
    "connections/streams). Ends sort after coincident starts (tie column), "
    "so a session ending exactly when another starts counts both as "
    "concurrent — the inclusive convention, identical in both engines. "
    "Session building shuffles once on user_id; the sweep runs over 2 "
    "rows per session (NOT per event), decomposed BY DAY — the output "
    "grain (r14 optimization, replacing the generic two-pass range "
    "bucketizer: the day is a natural range partition, so no quantile "
    "sketch, no bucket-offset branch, no persist): a day-partitioned "
    "running sum gives the within-day prefix, the following per-day "
    "groupBy reuses the same exchange, and the cross-day carry-in is a "
    "cumulative over the per-day delta totals (a bounded daily series). "
    "Integer +1/-1 addition is associative, so the decomposition equals "
    "the oracle's single ordered window; rows "
    "sharing an exact (t, tie) key all carry the same delta, so the "
    "per-day MAX is invariant to their relative order on both engines.",
)
def events_max_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    # NULL-ts guard on both engines: unordered-able rows would land at
    # opposite partition ends and corrupt the sweep's +1/-1 endpoints.
    ev = table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    order = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(order)
    marked = ev.withColumn(
        "is_new", F.when(gap.isNull() | (gap > 30 * 60 * 1_000_000), 1).otherwise(0)
    )
    # one ordering spec: the running frame derives from `order` so the gap
    # detection and session-id sum can never use different orderings
    run = order.rowsBetween(Window.unboundedPreceding, 0)
    sess = marked.withColumn("sid", F.sum("is_new").over(run))
    intervals = sess.groupBy("user_id", "sid").agg(
        F.min("ts").alias("s_start"), F.max("ts").alias("s_end")
    )
    pts = intervals.select(
        F.col("s_start").alias("t"), F.lit(1).alias("delta"), F.lit(0).alias("tie")
    ).unionAll(
        intervals.select(
            F.col("s_end").alias("t"), F.lit(-1).alias("delta"), F.lit(1).alias("tie")
        )
    )
    # the sweep's sort key (t, tie) collapses to one bigint — micros are
    # far below 2^62, so (tus * 2 + tie) is an exact, order-preserving
    # composite; the global prefix sum splits exactly at day boundaries
    # because every endpoint belongs to exactly one day and the day order
    # is consistent with _sk order
    keyed = pts.select(
        F.date_trunc("day", "t").alias("day"),
        (F.unix_micros("t") * 2 + F.col("tie")).alias("_sk"),
        "delta",
    )
    in_day = Window.partitionBy("day").orderBy("_sk").rowsBetween(
        Window.unboundedPreceding, 0
    )
    per_day = (
        keyed.withColumn("_run", F.sum("delta").over(in_day))
        .groupBy("day")
        .agg(
            F.max("_run").alias("_mx"),
            F.sum("delta").alias("_tot"),
        )
    )
    carry = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, -1
    )
    return per_day.select(
        "day",
        (F.coalesce(F.sum("_tot").over(carry), F.lit(0)) + F.col("_mx"))
        .cast("bigint")
        .alias("max_concurrent"),
    )
