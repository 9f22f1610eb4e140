"""Training-corpus curation operators: reproducible sampling/splits and the
composed filter→dedup pipeline a pre-training data flow runs end-to-end.

Sampling and split assignment are DETERMINISTIC (hash of a salted doc_id, no
RNG): re-running on any cluster size, partition layout, or engine yields the
same assignment — the property training pipelines actually need from a
sampler, and the reason this is not `df.sample()` (whose output depends on
partitioning). Comparison across engines uses the md5 hex prefix ordered
lexicographically, which is identical in Spark and DuckDB without any
hex->int conversion.

The curation pipeline composes the text-quality heuristics (operators/text.py)
with exact dedup (operators/dedup.py semantics): language/length/punctuation/
quality filters, then one group-by on the full text keeping the smallest
doc_id. At 100 TB the group-by key becomes the sha256 of the text (see
dedup_exact_hash) — the filters are map-only and cost no shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mongodb_nats_connector_spark.operators.text import QUALITY_STOPWORDS
from mongodb_nats_connector_spark.registry import register
from mongodb_nats_connector_spark.sources.tables import table

SALT = "split-v1:"
# md5-hex 4-char prefixes, compared lexicographically: 'cccc' =~ 80%,
# 'e666' =~ 90%, '1999' =~ 10% of the uniform hash space
TRAIN_UB, VAL_UB, SAMPLE_UB = "cccc", "e666", "1999"


@register(
    "sample_hash_split",
    oracle=f"""
    SELECT doc_id,
           substr(md5('{SALT}' || CAST(doc_id AS VARCHAR)), 1, 4) AS hash_prefix,
           CASE WHEN substr(md5('{SALT}' || CAST(doc_id AS VARCHAR)), 1, 4) < '{TRAIN_UB}'
                  THEN 'train'
                WHEN substr(md5('{SALT}' || CAST(doc_id AS VARCHAR)), 1, 4) < '{VAL_UB}'
                  THEN 'val'
                ELSE 'test' END AS split,
           CAST(CASE WHEN substr(md5('{SALT}' || CAST(doc_id AS VARCHAR)), 1, 4)
                          < '{SAMPLE_UB}' THEN 1 ELSE 0 END AS BIGINT) AS in_10pct_sample
    FROM documents
    """,
    doc="Deterministic train/val/test split (80/10/10) + reproducible 10% "
    "subsample, assigned by salted md5 of the doc id. Pure projection — "
    "map-only at any scale; stable under repartitioning (unlike "
    "df.sample()).",
)
def sample_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    h4 = F.substring(
        F.md5(F.encode(F.concat(F.lit(SALT), F.col("doc_id").cast("string")), "utf-8")),
        1,
        4,
    )
    split = (
        F.when(h4 < TRAIN_UB, "train").when(h4 < VAL_UB, "val").otherwise("test")
    )
    return docs.select(
        "doc_id",
        h4.alias("hash_prefix"),
        split.alias("split"),
        (h4 < SAMPLE_UB).cast("bigint").alias("in_10pct_sample"),
    )


@register(
    "curate_training_set",
    oracle=f"""
    WITH scored AS (
      SELECT doc_id, text,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
             length(regexp_replace(text, '[a-zA-Z0-9 ]', '', 'g')) * 1.0
               / length(text) AS punct_ratio,
             len(list_filter(string_split(text, ' '),
                 w -> list_contains({QUALITY_STOPWORDS!r}, lower(w)))) * 1.0
               / len(string_split(text, ' ')) AS stopword_ratio
      FROM documents
    ), filtered AS (
      SELECT * FROM scored
      WHERE n_words >= 10 AND punct_ratio <= 0.2 AND stopword_ratio >= 0.05
    )
    SELECT CAST(min(doc_id) AS BIGINT) AS doc_id,
           CAST(min(n_words) AS BIGINT) AS n_words,
           round(min(stopword_ratio), 4) AS stopword_ratio,
           CAST(count(*) AS BIGINT) AS n_copies
    FROM filtered GROUP BY text
    """,
    doc="End-to-end corpus curation: C4/Gopher-style filters (min length, "
    "max punctuation ratio, min stopword ratio — all map-only column "
    "expressions) then exact dedup keeping the smallest doc_id. The only "
    "shuffle is the final dedup group-by (on sha256 of the text at 100 TB, "
    "see dedup_exact_hash).",
)
def curate_training_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    words = F.split("text", " ")
    stop_arr = F.array(*[F.lit(w) for w in QUALITY_STOPWORDS])
    n_stop = F.size(F.filter(words, lambda w: F.array_contains(stop_arr, F.lower(w))))
    scored = docs.select(
        "doc_id",
        "text",
        F.size(words).cast("bigint").alias("n_words"),
        (
            F.length(F.regexp_replace("text", "[a-zA-Z0-9 ]", "")) / F.length("text")
        ).alias("punct_ratio"),
        (n_stop / F.size(words)).alias("stopword_ratio"),
    )
    filtered = scored.filter(
        (F.col("n_words") >= 10)
        & (F.col("punct_ratio") <= 0.2)
        & (F.col("stopword_ratio") >= 0.05)
    )
    return filtered.groupBy("text").agg(
        F.min("doc_id").alias("doc_id"),
        F.min("n_words").alias("n_words"),
        F.round(F.min("stopword_ratio"), 4).alias("stopword_ratio"),
        F.count(F.lit(1)).alias("n_copies"),
    ).drop("text")


# ---------------------------------------------------------------------------
# Round 3: stratified sampling, dataset mixing, sequence packing
# ---------------------------------------------------------------------------

STRAT_SALT = "strat-v1:"
STRAT_QUOTA = 20  # docs kept per language stratum

MIX_SALT = "mix-v1:"
# relative mixing weights by source (training-mixture recipe): src0 is
# upsampled 3x, src1/src2 2x, everything else 1x
MIX_WEIGHT_SQL = (
    "CASE WHEN source = 'src0' THEN 3 "
    "WHEN source IN ('src1', 'src2') THEN 2 ELSE 1 END"
)

PACK_BUDGET = 256  # tokens per packed training sequence


def _hash8(col):
    """Salted md5 hex prefix — the deterministic, engine-portable rank key."""
    return F.substring(
        F.md5(F.encode(F.concat(F.lit(MIX_SALT), col.cast("string")), "utf-8")), 1, 8
    )


@register(
    "sample_stratified",
    oracle=f"""
    WITH r AS (
      SELECT doc_id, lang,
             row_number() OVER (
               PARTITION BY lang
               ORDER BY substr(md5('{STRAT_SALT}' || CAST(doc_id AS VARCHAR)), 1, 8),
                        doc_id) AS rn
      FROM documents
    )
    SELECT doc_id, lang, CAST(rn AS BIGINT) AS sel_rank
    FROM r WHERE rn <= {STRAT_QUOTA}
    """,
    doc=f"Stratified sampling: exactly {STRAT_QUOTA} documents per language, "
    "chosen by salted-hash rank — deterministic across engines, cluster "
    "sizes and partition layouts (df.sample() is none of those). One "
    "window shuffle keyed by the stratum; with millions of strata this is "
    "a plain hash shuffle, and for few-strata/huge-corpus cases the scale "
    "path is hash-threshold selection (accept h < quantile estimate) "
    "which needs no per-stratum total order.",
)
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    docs = table(spark, sf_dir, "documents")
    h = F.substring(
        F.md5(
            F.encode(
                F.concat(F.lit(STRAT_SALT), F.col("doc_id").cast("string")), "utf-8"
            )
        ),
        1,
        8,
    )
    w = Window.partitionBy("lang").orderBy(h.asc(), F.col("doc_id").asc())
    return (
        docs.select("doc_id", "lang", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= STRAT_QUOTA)
        .select("doc_id", "lang", F.col("rn").cast("bigint").alias("sel_rank"))
    )


@register(
    "curate_dataset_mix",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, source,
             substr(md5('{MIX_SALT}' || CAST(doc_id AS VARCHAR)), 1, 8) AS h,
             {MIX_WEIGHT_SQL} AS wt
      FROM documents
    ), q AS (
      SELECT source, max(wt) AS wt, count(*) AS n FROM d GROUP BY source
    ), u AS (
      SELECT min(CAST(floor(n * 1.0 / wt) AS BIGINT)) AS units FROM q
    ), r AS (
      SELECT doc_id, source, wt,
             row_number() OVER (PARTITION BY source ORDER BY h, doc_id) AS rn
      FROM d
    )
    SELECT r.doc_id, r.source,
           CAST(r.rn AS BIGINT) AS sel_rank,
           CAST(r.wt * u.units AS BIGINT) AS quota
    FROM r, u WHERE r.rn <= r.wt * u.units
    """,
    doc="Dataset mixing: select a maximal corpus with sources in exact "
    "3:2:2:1... ratio (the domain-reweighting step of pre-training data "
    "prep). Per-source doc counts set the achievable units "
    "(min over floor(n_s/w_s)); each source contributes w_s*units docs "
    "chosen by salted-hash rank. The counts aggregate is tiny and "
    "broadcast; the only data-sized shuffle is the per-source ranking "
    "window, whose scale path is the same hash-threshold trick as "
    "stratified sampling.",
)
def curate_dataset_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    docs = table(spark, sf_dir, "documents")
    wt = (
        F.when(F.col("source") == "src0", 3)
        .when(F.col("source").isin("src1", "src2"), 2)
        .otherwise(1)
    )
    d = docs.select("doc_id", "source", _hash8(F.col("doc_id")).alias("h"), wt.alias("wt"))
    units = (
        d.groupBy("source")
        .agg(F.max("wt").alias("wt"), F.count(F.lit(1)).alias("n"))
        .select(
            F.min(F.floor(F.col("n") / F.col("wt")).cast("bigint")).alias("units")
        )
    )
    w = Window.partitionBy("source").orderBy(F.asc("h"), F.asc("doc_id"))
    r = d.select("doc_id", "source", "wt", F.row_number().over(w).alias("rn"))
    return (
        r.crossJoin(F.broadcast(units))
        .filter(F.col("rn") <= F.col("wt") * F.col("units"))
        .select(
            "doc_id",
            "source",
            F.col("rn").cast("bigint").alias("sel_rank"),
            (F.col("wt") * F.col("units")).cast("bigint").alias("quota"),
        )
    )


@register(
    "pack_sequences",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, source,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
      FROM documents
    ), c AS (
      SELECT doc_id, source, n_tokens,
             sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id) AS cum
      FROM t
    )
    SELECT doc_id, source, n_tokens,
           CAST(floor((cum - n_tokens) * 1.0 / {PACK_BUDGET}) AS BIGINT) AS bin_id,
           CAST(cum - n_tokens
                - floor((cum - n_tokens) * 1.0 / {PACK_BUDGET}) * {PACK_BUDGET}
                AS BIGINT) AS bin_offset
    FROM c
    """,
    doc=f"Sequence packing: assign documents to fixed {PACK_BUDGET}-token "
    "training bins by cumulative token count in stable doc order — the "
    "contiguous-packing step that turns a corpus into equal-budget "
    "context windows. One window shuffle partitioned by source; at 100 TB "
    "the partition key becomes (source, shard) so no single ordering "
    "task sees more than a shard, which only moves bin boundaries at "
    "shard edges.",
)
def pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    # parallel=True: tokenization happens BEFORE the window shuffle, so a
    # single-file scan would otherwise split every document on one core.
    docs = table(spark, sf_dir, "documents", parallel=True)
    t = docs.select(
        "doc_id",
        "source",
        F.size(F.split("text", " ")).cast("bigint").alias("n_tokens"),
    )
    w = Window.partitionBy("source").orderBy("doc_id")
    c = t.withColumn("cum", F.sum("n_tokens").over(w))
    start = F.col("cum") - F.col("n_tokens")
    bin_id = F.floor(start / PACK_BUDGET)
    return c.select(
        "doc_id",
        "source",
        "n_tokens",
        bin_id.cast("bigint").alias("bin_id"),
        (start - bin_id * PACK_BUDGET).cast("bigint").alias("bin_offset"),
    )


N_SHARDS = 32


@register(
    "corpus_shard_plan",
    oracle=f"""
    WITH assigned AS (
      SELECT doc_id, n_chars,
             CAST(CAST('0x' || substr(md5('{SALT}' || CAST(doc_id AS VARCHAR)), 1, 6)
                       AS BIGINT) % {N_SHARDS} AS BIGINT) AS shard
      FROM documents
    ), tot AS (
      SELECT count(*) AS n FROM assigned
    )
    SELECT shard,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars,
           CAST(min(doc_id) AS BIGINT) AS min_doc_id,
           CAST(max(doc_id) AS BIGINT) AS max_doc_id,
           round(count(*) * {N_SHARDS} * 1.0 / tot.n, 4) AS skew_vs_ideal
    FROM assigned CROSS JOIN tot
    GROUP BY shard, tot.n
    """,
    doc="Deterministic output-shard planner: every document is assigned to "
    "one of 32 shards by salted md5 (stable across engines, cluster sizes "
    "and re-runs — unlike hash-partitioning, which is engine-private), and "
    "the plan reports per-shard row/byte totals plus the skew ratio vs the "
    "ideal uniform share. This is the write planner for a 100 TB export: "
    "`repartition(N_SHARDS, shard)` then partitioned write produces "
    "bounded, evenly sized output files, and the skew column is the "
    "pre-flight check that no shard will straggle.",
)
def corpus_shard_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    h6 = F.substring(
        F.md5(F.encode(F.concat(F.lit(SALT), F.col("doc_id").cast("string")), "utf-8")),
        1,
        6,
    )
    shard = (F.conv(h6, 16, 10).cast("bigint") % N_SHARDS).cast("bigint")
    assigned = docs.select(
        shard.alias("shard"), "doc_id", "n_chars"
    )
    total = assigned.agg(F.count(F.lit(1)).alias("n"))
    return (
        assigned.groupBy("shard")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
            F.min("doc_id").cast("bigint").alias("min_doc_id"),
            F.max("doc_id").cast("bigint").alias("max_doc_id"),
        )
        .crossJoin(F.broadcast(total))
        .select(
            "shard",
            "n_docs",
            "total_chars",
            "min_doc_id",
            "max_doc_id",
            F.round(F.col("n_docs") * N_SHARDS / F.col("n"), 4).alias("skew_vs_ideal"),
        )
    )


@register(
    "sample_weighted",
    oracle="""
    SELECT o_orderkey, o_totalprice,
           CAST(CAST('0x' || substr(md5('ws:' || CAST(o_orderkey AS VARCHAR)), 1, 15)
                AS BIGINT) AS DOUBLE) / o_totalprice AS priority
    FROM orders
    ORDER BY priority, o_orderkey
    LIMIT 100
    """,
    doc="Deterministic weighted sampling (hash-priority family): priority = "
    "hash(key)/weight, keep the 100 smallest — high-value orders are "
    "proportionally more likely to be kept, and the sample is reproducible "
    "on any partitioning/engine (unlike rand()-based weighted sampling). "
    "The md5-derived 60-bit hash and the division are IEEE-deterministic on "
    "both engines. Spark plans this as TakeOrderedAndProject — per-"
    "partition top-100 then a 100-row merge, never a global sort of the "
    "fact table.",
)
def sample_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    h = F.conv(
        F.substring(
            F.md5(F.encode(F.concat(F.lit("ws:"), F.col("o_orderkey").cast("string")), "utf-8")),
            1,
            15,
        ),
        16,
        10,
    ).cast("bigint")
    return (
        orders.select(
            "o_orderkey",
            "o_totalprice",
            (h.cast("double") / F.col("o_totalprice")).alias("priority"),
        )
        .orderBy("priority", "o_orderkey")
        .limit(100)
    )


@register(
    "curate_gate_report",
    oracle=f"""
    WITH scored AS (
      SELECT doc_id, text,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
             length(regexp_replace(text, '[a-zA-Z0-9 ]', '', 'g')) * 1.0
               / length(text) AS punct_ratio,
             len(list_filter(string_split(text, ' '),
                 w -> list_contains({QUALITY_STOPWORDS!r}, lower(w)))) * 1.0
               / len(string_split(text, ' ')) AS stopword_ratio
      FROM documents
    ),
    flags AS (
      SELECT *,
             CASE WHEN n_words >= 10 THEN 1 ELSE 0 END AS p1,
             CASE WHEN n_words >= 10 AND punct_ratio <= 0.2
                  THEN 1 ELSE 0 END AS p2,
             CASE WHEN n_words >= 10 AND punct_ratio <= 0.2
                       AND stopword_ratio >= 0.05 THEN 1 ELSE 0 END AS p3
      FROM scored
    ),
    agg AS (
      SELECT count(*) AS total, sum(p1) AS s1, sum(p2) AS s2, sum(p3) AS s3,
             count(DISTINCT CASE WHEN p3 = 1 THEN text END) AS s4
      FROM flags
    )
    SELECT gate, CAST(survivors AS BIGINT) AS survivors,
           CAST(rejected AS BIGINT) AS rejected,
           round(survivors * 1.0 / total, 4) AS survival_rate
    FROM (
      SELECT 1 AS ord, 'input' AS gate, total AS survivors, 0 AS rejected, total FROM agg
      UNION ALL SELECT 2, 'min_length', s1, total - s1, total FROM agg
      UNION ALL SELECT 3, 'max_punct', s2, s1 - s2, total FROM agg
      UNION ALL SELECT 4, 'min_stopwords', s3, s2 - s3, total FROM agg
      UNION ALL SELECT 5, 'exact_dedup', s4, s3 - s4, total FROM agg
    )
    """,
    doc="Curation-funnel observability: per-gate survivor/rejected counts "
    "and survival rate for the same gate sequence curate_training_set "
    "applies (length -> punctuation -> stopwords -> exact dedup). All "
    "row-local gates fold into ONE conditional-aggregation scan (the "
    "cumulative flags are nested CASEs, so each doc is scanned once); the "
    "dedup stage is the one count-distinct. The report every production "
    "corpus pipeline emits per snapshot — at 100 TB it costs one read.",
)
def curate_gate_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    words = F.split("text", " ")
    stop_arr = F.array(*[F.lit(w) for w in QUALITY_STOPWORDS])
    n_stop = F.size(F.filter(words, lambda w: F.array_contains(stop_arr, F.lower(w))))
    scored = docs.select(
        "text",
        F.size(words).cast("bigint").alias("n_words"),
        (
            F.length(F.regexp_replace("text", "[a-zA-Z0-9 ]", "")) / F.length("text")
        ).alias("punct_ratio"),
        (n_stop / F.size(words)).alias("stopword_ratio"),
    )
    p1 = F.col("n_words") >= 10
    p2 = p1 & (F.col("punct_ratio") <= 0.2)
    p3 = p2 & (F.col("stopword_ratio") >= 0.05)
    agg = scored.agg(
        F.count(F.lit(1)).alias("total"),
        F.sum(p1.cast("int")).alias("s1"),
        F.sum(p2.cast("int")).alias("s2"),
        F.sum(p3.cast("int")).alias("s3"),
        F.count_distinct(F.when(p3, F.col("text"))).alias("s4"),
    )

    def row(gate, survivors, rejected):
        return F.struct(
            F.lit(gate).alias("gate"),
            survivors.cast("bigint").alias("survivors"),
            rejected.cast("bigint").alias("rejected"),
            F.round(survivors / F.col("total"), 4).alias("survival_rate"),
        )

    return agg.select(
        F.explode(
            F.array(
                row("input", F.col("total"), F.lit(0)),
                row("min_length", F.col("s1"), F.col("total") - F.col("s1")),
                row("max_punct", F.col("s2"), F.col("s1") - F.col("s2")),
                row("min_stopwords", F.col("s3"), F.col("s2") - F.col("s3")),
                row("exact_dedup", F.col("s4"), F.col("s3") - F.col("s4")),
            )
        ).alias("r")
    ).select("r.*")
