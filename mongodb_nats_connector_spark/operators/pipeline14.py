"""Round-11 window fill: driver-verified real media-header parsing, vendor
and process-control business operators, extreme-value / autocorrelation
diagnostics, rank statistics, and text-readability/diversity signals.

This module imports LAST in ``registry._load_all()`` (after pipeline13) so
its brand-new queries rank behind every already-pending query and fill the
remaining driver-window slots without displacing earlier edits.

Reference provenance: like pipeline7-13, none of these operators exist in
the reference's Go core (a MongoDB change-stream -> NATS connector,
/root/reference/internal/server/connector.go) — they extend the engine-side
analytics surface documented in SURVEY.md §2.3/§2.4 downstream of the
connector's change streams.

Cross-engine determinism rules (the pipeline11-13 discipline):
- exact integers end-to-end on the hash surface; doubled midranks over
  value DOMAINS (never row-proportional rank windows);
- any total that can cross 2^53 stays DECIMAL(38,0)/HUGEINT and
  floor-divides (`div` / ``//``) to a sub-2^53 integer before the ONE
  double conversion;
- `div` on NEGATIVES differs between engines (Spark truncates, DuckDB
  floors) — every integer division here is applied to a provably
  non-negative numerator (abs + explicit sign column where needed);
- no exp/ln/round-of-float anywhere on the hash surface; +,-,*,/,sqrt
  are IEEE-correctly-rounded and bit-portable in fixed operand order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mongodb_nats_connector_spark.registry import register
from mongodb_nats_connector_spark.sources.tables import table


def _dsum(expr: F.Column) -> F.Column:
    """Exact order-independent sum for integer terms whose total can cross
    2^63: DECIMAL(38,0) accumulation (the oracles' HUGEINT twin). The
    caller must floor-divide below 2^53 before any double conversion."""
    return F.sum(expr.cast("decimal(38,0)"))


def _le_hex(col: F.Column, nbytes: int) -> F.Column:
    """Little-endian fixed-width hex encoding of a non-negative integer
    column (byte i of the value becomes hex chars 2i..2i+1)."""
    parts = [
        F.lpad(F.hex(F.pmod((col / F.lit(1 << (8 * i))).cast("bigint"),
                            F.lit(256))), 2, "0")
        for i in range(nbytes)
    ]
    return F.concat(*parts)


# ---------------------------------------------------------------------------
# multimodal_image_header_parse — REAL PNG/GIF/JPEG dimension sniffing,
# driver-hash-verified (VERDICT r10 item 5)
# ---------------------------------------------------------------------------


@register(
    "multimodal_image_header_parse",
    # The payloads are REAL image-container headers constructed column-side
    # (deterministic dims derived from doc_id), parsed back by the REAL
    # stdlib header sniffer (multimodal.sniff_image_dims) inside
    # mapInPandas. The oracle states the golden expectation arithmetically
    # — the driver hash therefore verifies the full construct->Arrow->
    # real-parse pipeline, closing the gap where the real codec path was
    # only pytest-pinned (the fixture corpus is all text).
    oracle="""
    WITH d AS (
      SELECT doc_id,
             doc_id % 1920 + 16       AS w,
             (doc_id * 7) % 1080 + 16 AS h,
             doc_id % 3               AS m
      FROM documents
    )
    SELECT doc_id,
           CAST(CASE m WHEN 0 THEN 24 WHEN 1 THEN 10 ELSE 12 END
                AS BIGINT) AS n_bytes,
           CAST(w AS BIGINT) AS width,
           CAST(h AS BIGINT) AS height,
           CASE m WHEN 0 THEN 'png' WHEN 1 THEN 'gif' ELSE 'jpeg' END
             AS codec
    FROM d
    """,
    doc="REAL image-header parsing under the driver's hash check: per doc, "
    "construct a valid PNG IHDR / GIF logical-screen / JPEG SOF0 header "
    "(width/height derived from doc_id, binary built with pure column "
    "expressions — unhex of a composed hex string), then recover the "
    "dimensions with the REAL stdlib sniffer (multimodal.sniff_image_dims: "
    "magic check + big-endian IHDR fields / little-endian GIF u16s / JPEG "
    "marker walk to SOF) over Arrow-batched mapInPandas. This is the "
    "petabyte-scale image-metadata path — header peek, never a pixel "
    "decode — and the one multimodal query where the REAL parse (not the "
    "stub) sits on the oracle-verified hash surface. Zero shuffles; "
    "per-partition Arrow batches.",
)
def multimodal_image_header_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mongodb_nats_connector_spark.operators.multimodal import (
        DECODED_SCHEMA,
        _decode_batches,
    )

    d = table(spark, sf_dir, "documents", parallel=True).select(
        "doc_id",
        (F.col("doc_id") % 1920 + 16).alias("w"),
        ((F.col("doc_id") * 7) % 1080 + 16).alias("h"),
        (F.col("doc_id") % 3).alias("m"),
    )
    png_hex = F.concat(
        F.lit("89504E470D0A1A0A0000000D49484452"),
        F.lpad(F.hex("w"), 8, "0"),
        F.lpad(F.hex("h"), 8, "0"),
    )
    gif_hex = F.concat(
        F.lit("474946383961"),
        _le_hex(F.col("w"), 2),
        _le_hex(F.col("h"), 2),
    )
    jpeg_hex = F.concat(
        F.lit("FFD8FFC0001108"),
        F.lpad(F.hex("h"), 4, "0"),
        F.lpad(F.hex("w"), 4, "0"),
        F.lit("00"),
    )
    payload = F.unhex(
        F.when(F.col("m") == 0, png_hex)
        .when(F.col("m") == 1, gif_hex)
        .otherwise(jpeg_hex)
    )
    parsed = d.select("doc_id", payload.alias("payload")).mapInPandas(
        _decode_batches, DECODED_SCHEMA
    )
    return parsed.select(
        "doc_id",
        "n_bytes",
        F.col("fake_width").alias("width"),
        F.col("fake_height").alias("height"),
        "codec",
    )


# ---------------------------------------------------------------------------
# multimodal_wav_header_parse — REAL RIFF/WAV metadata extraction
# ---------------------------------------------------------------------------


@register(
    "multimodal_wav_header_parse",
    oracle="""
    WITH d AS (
      SELECT doc_id,
             CASE doc_id % 5 WHEN 0 THEN 8000 WHEN 1 THEN 16000
                  WHEN 2 THEN 22050 WHEN 3 THEN 44100 ELSE 48000 END AS rate,
             1 + doc_id % 2       AS channels,
             doc_id % 4096 + 64   AS n_frames
      FROM documents
    )
    SELECT doc_id,
           CAST(rate AS BIGINT)      AS sample_rate,
           CAST(channels AS BIGINT)  AS channels,
           CAST(16 AS BIGINT)        AS bits,
           CAST(n_frames AS BIGINT)  AS n_samples,
           CAST(n_frames * 1000 // rate AS BIGINT) AS duration_ms
    FROM d
    """,
    doc="REAL WAV/RIFF header parsing under the driver's hash check: per "
    "doc, construct the canonical 44-byte RIFF/fmt/data header (sample "
    "rate from a 5-value grid, 1-2 channels, 16-bit PCM, frame count from "
    "doc_id — all little-endian fields composed as hex column expressions "
    "and unhex'd to binary), then recover sample rate / channels / bit "
    "depth / sample count / duration with the REAL stdlib RIFF parser "
    "(multimodal.sniff_wav_meta) over Arrow-batched mapInPandas — the "
    "audio twin of multimodal_image_header_parse: container-header "
    "metadata without decoding a single sample. duration_ms is an exact "
    "non-negative integer floor-division in both engines. Zero shuffles.",
)
def multimodal_wav_header_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mongodb_nats_connector_spark.operators.multimodal import (
        WAV_SCHEMA,
        _wav_meta_batches,
    )

    d = table(spark, sf_dir, "documents", parallel=True).select(
        "doc_id",
        F.element_at(
            F.array(
                F.lit(8000), F.lit(16000), F.lit(22050),
                F.lit(44100), F.lit(48000),
            ),
            (F.col("doc_id") % 5 + 1).cast("int"),
        ).alias("rate"),
        (F.lit(1) + F.col("doc_id") % 2).alias("channels"),
        (F.col("doc_id") % 4096 + 64).alias("n_frames"),
    )
    block_align = F.col("channels") * 2
    data_size = F.col("n_frames") * block_align
    byte_rate = F.col("rate") * block_align
    wav_hex = F.concat(
        F.lit("52494646"),                      # 'RIFF'
        _le_hex(data_size + 36, 4),             # riff chunk size
        F.lit("57415645666D7420"),              # 'WAVE' + 'fmt '
        F.lit("10000000"),                      # fmt chunk size = 16
        F.lit("0100"),                          # PCM
        _le_hex(F.col("channels"), 2),
        _le_hex(F.col("rate"), 4),
        _le_hex(byte_rate, 4),
        _le_hex(block_align, 2),
        F.lit("1000"),                          # bits = 16
        F.lit("64617461"),                      # 'data'
        _le_hex(data_size, 4),
    )
    return d.select(
        "doc_id", F.unhex(wav_hex).alias("payload")
    ).mapInPandas(_wav_meta_batches, WAV_SCHEMA)


# ---------------------------------------------------------------------------
# orders_taguchi_loss — quadratic quality-loss function per priority class
# ---------------------------------------------------------------------------


@register(
    "orders_taguchi_loss",
    oracle="""
    WITH b AS (
      SELECT o_orderpriority,
             CAST(round(o_totalprice * 100) AS BIGINT) - 15000000 AS dev
      FROM orders
    )
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(CAST(sum(CAST(dev AS HUGEINT) * dev) AS HUGEINT)
                // (count(*) * 100000000) AS BIGINT) AS avg_loss_dollars2,
           CAST((CASE WHEN sum(dev) >= 0 THEN 1 ELSE -1 END)
                * (abs(CAST(sum(dev) AS HUGEINT)) // (count(*) * 100))
                AS BIGINT) AS avg_bias_dollars
    FROM b
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    doc="Taguchi quadratic quality loss per order-priority class: with a "
    "150k-dollar target order value, the expected loss E[(y-T)^2] and the "
    "signed bias E[y-T] — the loss-function view of process quality that "
    "penalizes ANY deviation from target (unlike orders_cpk_capability's "
    "in/out-of-spec step function). Deviations stay integer cents; the "
    "sum of squares accumulates in DECIMAL(38,0)/HUGEINT (a single cent "
    "deviation squares to ~2.5e15 — thousands of rows cross 2^63) and "
    "floor-divides by n*1e8 to whole dollars-squared, far below 2^53; "
    "the bias divides |sum| (non-negative numerator — engine-portable "
    "div) and restores the sign explicitly. One hash aggregation over "
    "five groups; map-side partials do the heavy lifting.",
)
def orders_taguchi_loss(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    b = o.select(
        "o_orderpriority",
        (
            F.round(F.col("o_totalprice") * 100).cast("bigint") - 15000000
        ).alias("dev"),
    )
    g = b.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        _dsum(F.col("dev").cast("decimal(38,0)") * F.col("dev")).alias("ss"),
        F.sum("dev").cast("decimal(38,0)").alias("sdev"),
    )
    return g.select(
        "o_orderpriority",
        "n_orders",
        F.expr("CAST(ss div (n_orders * 100000000) AS BIGINT)").alias(
            "avg_loss_dollars2"
        ),
        F.expr(
            "CAST((CASE WHEN sdev >= 0 THEN 1 ELSE -1 END)"
            " * (abs(sdev) div (n_orders * 100)) AS BIGINT)"
        ).alias("avg_bias_dollars"),
    ).orderBy("o_orderpriority")


# ---------------------------------------------------------------------------
# orders_vendor_scorecard — supplier composite score (on-time, defect, mix)
# ---------------------------------------------------------------------------


@register(
    "orders_vendor_scorecard",
    oracle="""
    WITH l AS (
      SELECT l_suppkey,
             CAST(count(*) AS BIGINT) AS n_lines,
             CAST(sum(CASE WHEN date_diff('day', CAST(o.o_orderdate AS DATE),
                                          CAST(li.l_shipdate AS DATE)) <= 60
                      THEN 1 ELSE 0 END) AS BIGINT) AS on_time,
             CAST(sum(CASE WHEN l_returnflag = 'R'
                      THEN 1 ELSE 0 END) AS BIGINT) AS returns,
             CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                  AS BIGINT) AS rev_cents
      FROM lineitem li JOIN orders o ON o.o_orderkey = li.l_orderkey
      GROUP BY l_suppkey
    ),
    s AS (
      SELECT l.l_suppkey AS suppkey, sp.s_name, l.n_lines,
             1000000000 * l.on_time // l.n_lines  AS on_time_ppb,
             1000000000 * l.returns // l.n_lines  AS return_ppb,
             l.rev_cents // 100                   AS revenue_dollars,
             (600000000 * l.on_time
              + 400000000 * (l.n_lines - l.returns)) // l.n_lines
               AS composite_ppb
      FROM l JOIN supplier sp ON sp.s_suppkey = l.l_suppkey
    )
    SELECT suppkey, s_name, n_lines,
           CAST(on_time_ppb AS BIGINT)     AS on_time_ppb,
           CAST(return_ppb AS BIGINT)      AS return_ppb,
           CAST(revenue_dollars AS BIGINT) AS revenue_dollars,
           CAST(composite_ppb AS BIGINT)   AS composite_ppb
    FROM s
    ORDER BY composite_ppb DESC, suppkey
    LIMIT 25
    """,
    doc="Supplier scorecard: per-vendor on-time fulfillment rate (shipped "
    "within 60 days of order placement), return/defect rate, revenue, and "
    "a 60/40-weighted composite — the procurement ranking every "
    "supply-chain team runs weekly. All rates are exact ppb integer "
    "floor-divisions on non-negative counts; the top-25 is a "
    "TakeOrderedAndProject with a deterministic (composite DESC, "
    "suppkey) tie-break, so no global sort materializes. One "
    "lineitem-orders equi-join (co-partitioned on the order key), one "
    "supplier-sized aggregation, and a broadcast join to the small "
    "supplier dim.",
)
def orders_vendor_scorecard(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    sp = table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    j = li.join(o, li.l_orderkey == o.o_orderkey)
    l = j.groupBy("l_suppkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_lines"),
        F.sum(
            F.when(
                F.datediff(
                    F.col("l_shipdate").cast("date"),
                    F.col("o_orderdate").cast("date"),
                )
                <= 60,
                1,
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("on_time"),
        F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0))
        .cast("bigint")
        .alias("returns"),
        F.sum(F.round(F.col("l_extendedprice") * 100).cast("bigint"))
        .cast("bigint")
        .alias("rev_cents"),
    )
    s = l.join(F.broadcast(sp), l.l_suppkey == sp.s_suppkey).select(
        F.col("l_suppkey").alias("suppkey"),
        "s_name",
        "n_lines",
        F.expr("1000000000 * on_time div n_lines").alias("on_time_ppb"),
        F.expr("1000000000 * returns div n_lines").alias("return_ppb"),
        F.expr("rev_cents div 100").alias("revenue_dollars"),
        F.expr(
            "(600000000 * on_time + 400000000 * (n_lines - returns))"
            " div n_lines"
        ).alias("composite_ppb"),
    )
    return s.orderBy(F.desc("composite_ppb"), "suppkey").limit(25)


# ---------------------------------------------------------------------------
# orders_cusum_control — two-sided CUSUM control chart via the prefix-min
# identity (no recursion: max(0, S+x) == prefix - running-min of prefix)
# ---------------------------------------------------------------------------


@register(
    "orders_cusum_control",
    oracle="""
    WITH d AS (
      SELECT o_orderdate AS day,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) // 100000
                  AS BIGINT) AS x
      FROM orders WHERE o_orderdate IS NOT NULL GROUP BY 1
    ),
    t AS (
      SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS sx
      FROM d
    ),
    s AS (
      SELECT d.day, d.x, t.n,
             t.n * d.x - t.sx - t.n      AS up_inc,
             t.sx - t.n * d.x - t.n      AS dn_inc
      FROM d CROSS JOIN t
    ),
    p AS (
      SELECT day, x, n,
             sum(up_inc) OVER w AS pu,
             sum(dn_inc) OVER w AS pd
      FROM s
      WINDOW w AS (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING
                   AND CURRENT ROW)
    ),
    c AS (
      SELECT day, x, n,
             pu - least(0, min(pu) OVER w) AS cu,
             pd - least(0, min(pd) OVER w) AS cd
      FROM p
      WINDOW w AS (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING
                   AND CURRENT ROW)
    ),
    h AS (
      SELECT CAST(4 * (t.n * sum(abs(s2.up_inc + s2.n))
                       // (t.n * t.n)) AS BIGINT) AS hlim
      FROM s s2 CROSS JOIN t GROUP BY t.n
    )
    SELECT c.day, c.x,
           CAST(c.cu AS BIGINT) AS cusum_up_scaled,
           CAST(c.cd AS BIGINT) AS cusum_dn_scaled,
           CAST(h.hlim AS BIGINT) AS h_scaled,
           CAST(CASE WHEN c.cu > h.hlim OR c.cd > h.hlim
                THEN 1 ELSE 0 END AS BIGINT) AS alarm
    FROM c CROSS JOIN h
    ORDER BY c.day
    """,
    doc="Two-sided CUSUM control chart on daily revenue with a one-unit "
    "allowance and a 4*MAD-style decision limit. The textbook recursion "
    "S_i = max(0, S_(i-1) + inc_i) is NOT window-expressible directly; "
    "this uses the exact prefix-min identity S_i = P_i - min(0, "
    "min_(j<=i) P_j) with P the plain prefix sum — two cumulative "
    "windows over the BOUNDED daily series (a few thousand rows at any "
    "SF; the heavy lifting is the one daily rollup shuffle before it). "
    "Everything is integer: deviations are scaled by n (n*x - Sx avoids "
    "materializing the rational mean), the allowance is n (one "
    "kilodollar in scaled units), and the limit is a floor-divided mean "
    "absolute deviation — no negative ever meets an integer division "
    "(abs first). Complements orders_shewhart_control (point rule) and "
    "events_cusum_changepoint (retrospective argmax locator): CUSUM "
    "accumulates small persistent shifts a Shewhart chart misses.",
)
def orders_cusum_control(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderdate").isNotNull())
    d = o.groupBy(F.col("o_orderdate").alias("day")).agg(
        F.expr(
            "CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))"
            " div 100000 AS BIGINT)"
        ).alias("x")
    )
    d = d.persist()
    t = d.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
    )
    s = d.crossJoin(F.broadcast(t)).select(
        "day",
        "x",
        "n",
        (F.col("n") * F.col("x") - F.col("sx") - F.col("n")).alias("up_inc"),
        (F.col("sx") - F.col("n") * F.col("x") - F.col("n")).alias("dn_inc"),
    )
    s = s.persist()
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    p = s.select(
        "day",
        "x",
        "n",
        F.sum("up_inc").over(w).alias("pu"),
        F.sum("dn_inc").over(w).alias("pd"),
    )
    c = p.select(
        "day",
        "x",
        "n",
        (F.col("pu") - F.least(F.lit(0), F.min("pu").over(w))).alias("cu"),
        (F.col("pd") - F.least(F.lit(0), F.min("pd").over(w))).alias("cd"),
    )
    h = (
        s.groupBy("n")
        .agg(
            F.expr(
                "CAST(4 * (n * sum(abs(up_inc + n)) div (n * n)) AS BIGINT)"
            ).alias("hlim")
        )
        .select("hlim")
    )
    return (
        c.crossJoin(F.broadcast(h))
        .select(
            "day",
            "x",
            F.col("cu").cast("bigint").alias("cusum_up_scaled"),
            F.col("cd").cast("bigint").alias("cusum_dn_scaled"),
            F.col("hlim").cast("bigint").alias("h_scaled"),
            F.when(
                (F.col("cu") > F.col("hlim")) | (F.col("cd") > F.col("hlim")),
                1,
            )
            .otherwise(0)
            .cast("bigint")
            .alias("alarm"),
        )
        .orderBy("day")
    )


# ---------------------------------------------------------------------------
# text_lix_rix — LIX / RIX readability (long-word based, language-agnostic)
# ---------------------------------------------------------------------------


@register(
    "text_lix_rix",
    oracle="""
    WITH f AS (
      SELECT doc_id, lang,
             CAST(len(list_filter(string_split(text, ' '), t -> t != ''))
                  AS BIGINT) AS n_words,
             CAST(greatest(1, len(regexp_extract_all(text, '[.!?]')))
                  AS BIGINT) AS n_sentences,
             CAST(len(list_filter(string_split(text, ' '), w -> len(w) > 6))
                  AS BIGINT) AS n_long
      FROM documents
    )
    SELECT doc_id, lang, n_words, n_sentences, n_long,
           CAST(n_words AS DOUBLE) / n_sentences
             + 100.0 * n_long / n_words AS lix,
           CAST(n_long AS DOUBLE) / n_sentences AS rix
    FROM f
    WHERE n_words > 0
    """,
    doc="LIX and RIX readability per document: Bjornsson's LIX = "
    "words/sentence + 100*longwords/words and Anderson's RIX = "
    "longwords/sentence, with 'long' = more than 6 characters — the "
    "language-AGNOSTIC readability family (no syllable heuristic at "
    "all), which is why multilingual corpus pipelines prefer it over "
    "Flesch/fog for non-English shards. Counts are exact integers from "
    "one map-side projection (JVM higher-order filter over the "
    "whitespace split — no UDF); each index is a fixed-order IEEE "
    "expression over exact sub-2^53 integers. Zero shuffles.",
)
def text_lix_rix(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents", parallel=True)
    f = docs.select(
        "doc_id",
        "lang",
        F.size(F.filter(F.split("text", " "), lambda t: t != ""))
        .cast("bigint")
        .alias("n_words"),
        F.greatest(
            F.lit(1),
            F.size(F.expr("regexp_extract_all(text, '[.!?]', 0)")),
        )
        .cast("bigint")
        .alias("n_sentences"),
        F.size(F.expr("filter(split(text, ' '), w -> length(w) > 6)"))
        .cast("bigint")
        .alias("n_long"),
    )
    return f.filter(F.col("n_words") > 0).select(
        "doc_id",
        "lang",
        "n_words",
        "n_sentences",
        "n_long",
        (
            F.col("n_words").cast("double") / F.col("n_sentences")
            + F.lit(100.0) * F.col("n_long") / F.col("n_words")
        ).alias("lix"),
        (F.col("n_long").cast("double") / F.col("n_sentences")).alias("rix"),
    )


# ---------------------------------------------------------------------------
# agg_matthews_corr — Matthews correlation coefficient per ship-year
# ---------------------------------------------------------------------------


@register(
    "agg_matthews_corr",
    oracle="""
    WITH b AS (
      SELECT CAST(year(CAST(l_shipdate AS DATE)) AS BIGINT) AS yr,
             CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y,
             CASE WHEN round(l_discount * 100) >= 6 THEN 1 ELSE 0 END AS p
      FROM lineitem WHERE l_shipdate IS NOT NULL
    ),
    c AS (
      SELECT yr,
             CAST(sum(y * p) AS BIGINT)             AS tp,
             CAST(sum((1 - y) * (1 - p)) AS BIGINT) AS tn,
             CAST(sum((1 - y) * p) AS BIGINT)       AS fp,
             CAST(sum(y * (1 - p)) AS BIGINT)       AS fn
      FROM b GROUP BY yr
    )
    SELECT yr, tp, tn, fp, fn,
           CAST(tp * tn - fp * fn AS DOUBLE)
             / (sqrt(CAST((tp + fp) * (tp + fn) AS DOUBLE))
                * sqrt(CAST((tn + fp) * (tn + fn) AS DOUBLE))) AS mcc
    FROM c
    WHERE (tp + fp) * (tp + fn) > 0 AND (tn + fp) * (tn + fn) > 0
    ORDER BY yr
    """,
    doc="Matthews correlation coefficient of a discount-based return "
    "predictor, per ship-year: the single-number binary-classifier "
    "summary that stays honest under class imbalance (unlike accuracy "
    "or F1, MCC uses all four confusion cells symmetrically). The "
    "confusion matrix is one map-side aggregation of 0/1 products; the "
    "marginal products stay below 2^53 through sf10 (documented bound "
    "— each marginal is at most the row count), so the two sqrt's see "
    "exactly-converted integers and the MCC is one fixed-order IEEE "
    "expression. Complements agg_roc_auc (threshold-free rank view) "
    "and agg_cohen_kappa (chance-corrected agreement).",
)
def agg_matthews_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate").isNotNull()
    )
    b = li.select(
        F.year(F.col("l_shipdate").cast("date")).cast("bigint").alias("yr"),
        F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("y"),
        F.when(F.round(F.col("l_discount") * 100) >= 6, 1)
        .otherwise(0)
        .alias("p"),
    )
    c = b.groupBy("yr").agg(
        F.sum(F.col("y") * F.col("p")).cast("bigint").alias("tp"),
        F.sum((1 - F.col("y")) * (1 - F.col("p")))
        .cast("bigint")
        .alias("tn"),
        F.sum((1 - F.col("y")) * F.col("p")).cast("bigint").alias("fp"),
        F.sum(F.col("y") * (1 - F.col("p"))).cast("bigint").alias("fn"),
    )
    return (
        c.filter(
            ((F.col("tp") + F.col("fp")) * (F.col("tp") + F.col("fn")) > 0)
            & ((F.col("tn") + F.col("fp")) * (F.col("tn") + F.col("fn")) > 0)
        )
        .select(
            "yr",
            "tp",
            "tn",
            "fp",
            "fn",
            (
                (
                    F.col("tp") * F.col("tn") - F.col("fp") * F.col("fn")
                ).cast("double")
                / (
                    F.sqrt(
                        (
                            (F.col("tp") + F.col("fp"))
                            * (F.col("tp") + F.col("fn"))
                        ).cast("double")
                    )
                    * F.sqrt(
                        (
                            (F.col("tn") + F.col("fp"))
                            * (F.col("tn") + F.col("fn"))
                        ).cast("double")
                    )
                )
            ).alias("mcc"),
        )
        .orderBy("yr")
    )


# ---------------------------------------------------------------------------
# agg_brier_score — probabilistic-forecast calibration per ship-year
# ---------------------------------------------------------------------------


@register(
    "agg_brier_score",
    oracle="""
    WITH b AS (
      SELECT CAST(year(CAST(l_shipdate AS DATE)) AS BIGINT) AS yr,
             CAST(round(l_discount * 100) AS BIGINT) AS p10,
             CASE WHEN l_returnflag = 'R' THEN 10 ELSE 0 END AS y10
      FROM lineitem WHERE l_shipdate IS NOT NULL
    )
    SELECT yr,
           CAST(count(*) AS BIGINT) AS n,
           CAST(1000000000 * CAST(sum(CAST((p10 - y10) * (p10 - y10)
                  AS HUGEINT)) AS HUGEINT) // (100 * count(*))
                AS BIGINT) AS brier_ppb,
           CAST(1000000000 * CAST(sum(y10 // 10) AS HUGEINT) // count(*)
                AS BIGINT) AS base_rate_ppb
    FROM b GROUP BY yr ORDER BY yr
    """,
    doc="Brier score of the discount-as-return-probability forecast, per "
    "ship-year, with the base rate alongside — the proper scoring rule "
    "that grades PROBABILITIES where agg_roc_auc grades only ranks and "
    "agg_matthews_corr grades one thresholded cut. The forecast lives "
    "on a tenths grid (discount percents 0..10), so each squared error "
    "(p - y)^2 = ((p10 - 10y)/10)^2 is an exact integer over 100: the "
    "sum accumulates in DECIMAL(38,0)/HUGEINT and one non-negative "
    "floor-division lands the ppb score — no float ever touches the "
    "hash surface. One map-side aggregation over seven year groups.",
)
def agg_brier_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate").isNotNull()
    )
    b = li.select(
        F.year(F.col("l_shipdate").cast("date")).cast("bigint").alias("yr"),
        F.round(F.col("l_discount") * 100).cast("bigint").alias("p10"),
        F.when(F.col("l_returnflag") == "R", 10).otherwise(0).alias("y10"),
    )
    g = b.groupBy("yr").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        _dsum((F.col("p10") - F.col("y10")) * (F.col("p10") - F.col("y10")))
        .alias("se"),
        F.sum(F.expr("y10 div 10")).cast("decimal(38,0)").alias("pos"),
    )
    return g.select(
        "yr",
        "n",
        F.expr("CAST(1000000000 * se div (100 * n) AS BIGINT)").alias(
            "brier_ppb"
        ),
        F.expr("CAST(1000000000 * pos div n AS BIGINT)").alias(
            "base_rate_ppb"
        ),
    ).orderBy("yr")


# ---------------------------------------------------------------------------
# agg_sign_test — paired-period spend comparison (exact nonparametric)
# ---------------------------------------------------------------------------


@register(
    "agg_sign_test",
    oracle="""
    WITH per AS (
      SELECT o_custkey,
             CAST(sum(CASE WHEN o_orderdate < DATE '1995-01-01'
                      THEN CAST(round(o_totalprice * 100) AS BIGINT)
                      ELSE 0 END) AS BIGINT) AS early,
             CAST(sum(CASE WHEN o_orderdate >= DATE '1995-01-01'
                      THEN CAST(round(o_totalprice * 100) AS BIGINT)
                      ELSE 0 END) AS BIGINT) AS late
      FROM orders WHERE o_orderdate IS NOT NULL
      GROUP BY o_custkey
    ),
    c AS (
      SELECT CAST(sum(CASE WHEN late > early THEN 1 ELSE 0 END) AS BIGINT)
               AS n_pos,
             CAST(sum(CASE WHEN late < early THEN 1 ELSE 0 END) AS BIGINT)
               AS n_neg,
             CAST(sum(CASE WHEN late = early THEN 1 ELSE 0 END) AS BIGINT)
               AS n_tie
      FROM per
    )
    SELECT n_pos, n_neg, n_tie,
           CAST(least(n_pos, n_neg) AS BIGINT) AS s_statistic,
           (abs(CAST(n_pos - n_neg AS DOUBLE)) - 1.0)
             / sqrt(CAST(n_pos + n_neg AS DOUBLE)) AS z_approx
    FROM c
    """,
    doc="Exact sign test on paired per-customer spend (pre-1995 vs from-"
    "1995): the assumption-free sibling of events_wilcoxon_signed_rank "
    "(which adds rank weights) and events_paired_ttest (which assumes "
    "normality) — the sign test needs ONLY the direction of each pair, "
    "so it survives arbitrary spend skew. Counts are one hash "
    "aggregation over the customer rollup; the continuity-corrected "
    "normal z is a fixed-order IEEE expression over exact integers "
    "(|pos-neg| built with abs-of-double to keep every integer "
    "division non-negative-free). Two shuffles total, both keyed.",
)
def agg_sign_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderdate").isNotNull())
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    per = o.groupBy("o_custkey").agg(
        F.sum(
            F.when(F.col("o_orderdate") < F.lit("1995-01-01").cast("date"),
                   cents).otherwise(0)
        )
        .cast("bigint")
        .alias("early"),
        F.sum(
            F.when(F.col("o_orderdate") >= F.lit("1995-01-01").cast("date"),
                   cents).otherwise(0)
        )
        .cast("bigint")
        .alias("late"),
    )
    c = per.agg(
        F.sum(F.when(F.col("late") > F.col("early"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_pos"),
        F.sum(F.when(F.col("late") < F.col("early"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_neg"),
        F.sum(F.when(F.col("late") == F.col("early"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_tie"),
    )
    return c.select(
        "n_pos",
        "n_neg",
        "n_tie",
        F.least("n_pos", "n_neg").cast("bigint").alias("s_statistic"),
        (
            (
                F.abs((F.col("n_pos") - F.col("n_neg")).cast("double"))
                - F.lit(1.0)
            )
            / F.sqrt((F.col("n_pos") + F.col("n_neg")).cast("double"))
        ).alias("z_approx"),
    )


# ---------------------------------------------------------------------------
# agg_dixon_q — single-outlier screen per nation (extreme-gap ratio)
# ---------------------------------------------------------------------------


@register(
    "agg_dixon_q",
    oracle="""
    WITH v AS (
      SELECT c_nationkey,
             CAST(round(c_acctbal * 100) AS BIGINT) AS bal,
             row_number() OVER (PARTITION BY c_nationkey
                                ORDER BY round(c_acctbal * 100) DESC,
                                         c_custkey) AS rd,
             row_number() OVER (PARTITION BY c_nationkey
                                ORDER BY round(c_acctbal * 100) ASC,
                                         c_custkey) AS ra,
             count(*) OVER (PARTITION BY c_nationkey) AS n
      FROM customer
    ),
    g AS (
      SELECT c_nationkey,
             CAST(min(n) AS BIGINT) AS n,
             CAST(max(CASE WHEN rd = 1 THEN bal END) AS BIGINT) AS x_max,
             CAST(max(CASE WHEN rd = 2 THEN bal END) AS BIGINT) AS x_max2,
             CAST(max(CASE WHEN ra = 1 THEN bal END) AS BIGINT) AS x_min,
             CAST(max(CASE WHEN ra = 2 THEN bal END) AS BIGINT) AS x_min2
      FROM v GROUP BY c_nationkey
    )
    SELECT c_nationkey, n, x_min, x_max,
           CAST(1000000000 * (x_max - x_max2) // (x_max - x_min)
                AS BIGINT) AS q_high_ppb,
           CAST(1000000000 * (x_min2 - x_min) // (x_max - x_min)
                AS BIGINT) AS q_low_ppb
    FROM g
    WHERE n >= 3 AND x_max > x_min
    ORDER BY c_nationkey
    """,
    doc="Dixon's Q outlier screen per nation on customer balances: the "
    "extreme-gap-to-range ratio at BOTH tails — the small-sample "
    "single-outlier test that needs only four order statistics, no "
    "moments (agg_grubbs_test is its variance-based sibling; "
    "agg_mad_outliers the robust bulk screen). The four extremes come "
    "from two per-nation rank windows (partitioned — never global) "
    "with a deterministic custkey tie-break; balances are exact cents "
    "and both Q ratios are non-negative ppb floor-divisions (gap <= "
    "range by construction). Everything after the one keyed shuffle "
    "is nation-cardinality-sized.",
)
def agg_dixon_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    bal = F.round(F.col("c_acctbal") * 100).cast("bigint")
    wd = Window.partitionBy("c_nationkey").orderBy(
        F.desc("bal"), F.col("c_custkey")
    )
    wa = Window.partitionBy("c_nationkey").orderBy(
        F.asc("bal"), F.col("c_custkey")
    )
    wn = Window.partitionBy("c_nationkey")
    v = c.select(
        "c_nationkey", bal.alias("bal"), "c_custkey"
    ).select(
        "c_nationkey",
        "bal",
        F.row_number().over(wd).alias("rd"),
        F.row_number().over(wa).alias("ra"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    g = v.groupBy("c_nationkey").agg(
        F.min("n").cast("bigint").alias("n"),
        F.max(F.when(F.col("rd") == 1, F.col("bal")))
        .cast("bigint")
        .alias("x_max"),
        F.max(F.when(F.col("rd") == 2, F.col("bal")))
        .cast("bigint")
        .alias("x_max2"),
        F.max(F.when(F.col("ra") == 1, F.col("bal")))
        .cast("bigint")
        .alias("x_min"),
        F.max(F.when(F.col("ra") == 2, F.col("bal")))
        .cast("bigint")
        .alias("x_min2"),
    )
    return (
        g.filter((F.col("n") >= 3) & (F.col("x_max") > F.col("x_min")))
        .select(
            "c_nationkey",
            "n",
            "x_min",
            "x_max",
            F.expr(
                "1000000000 * (x_max - x_max2) div (x_max - x_min)"
            ).alias("q_high_ppb"),
            F.expr(
                "1000000000 * (x_min2 - x_min) div (x_max - x_min)"
            ).alias("q_low_ppb"),
        )
        .orderBy("c_nationkey")
    )


# ---------------------------------------------------------------------------
# agg_cliff_delta — ordinal effect size over the quantity domain grid
# ---------------------------------------------------------------------------


@register(
    "agg_cliff_delta",
    oracle="""
    WITH b AS (
      SELECT CAST(l_quantity AS BIGINT) AS v,
             CASE WHEN round(l_discount * 100) >= 6 THEN 1 ELSE 0 END AS g
      FROM lineitem
    ),
    cells AS (
      SELECT v,
             CAST(sum(g) AS BIGINT)     AS n1,
             CAST(sum(1 - g) AS BIGINT) AS n2
      FROM b GROUP BY v
    ),
    cum AS (
      SELECT v, n1, n2,
             coalesce(sum(n2) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED
               PRECEDING AND 1 PRECEDING), 0) AS n2_below,
             coalesce(sum(n2) OVER (ORDER BY v DESC ROWS BETWEEN UNBOUNDED
               PRECEDING AND 1 PRECEDING), 0) AS n2_above
      FROM cells
    ),
    t AS (
      SELECT CAST(sum(n1) AS BIGINT) AS t1,
             CAST(sum(n2) AS BIGINT) AS t2,
             CAST(sum(CAST(n1 AS HUGEINT) * n2_below) AS HUGEINT) AS gt,
             CAST(sum(CAST(n1 AS HUGEINT) * n2_above) AS HUGEINT) AS lt
      FROM cum
    )
    SELECT t1 AS n_treat, t2 AS n_control,
           CAST(gt AS BIGINT) AS pairs_gt,
           CAST(lt AS BIGINT) AS pairs_lt,
           CAST((CASE WHEN gt >= lt THEN 1 ELSE -1 END)
                * ((1000000000 * abs(gt - lt))
                   // (CAST(t1 AS HUGEINT) * t2)) AS BIGINT)
             AS cliff_delta_ppb
    FROM t
    """,
    doc="Cliff's delta between discounted (>=6%) and low-discount line "
    "quantities: the ordinal effect size P(X>Y) - P(X<Y) that "
    "agg_mann_whitney's U statistic tests but does not report — delta "
    "is what you quote when 'significant' needs a MAGNITUDE. The "
    "pair counts never materialize pairs: quantities collapse to the "
    "~50-value domain grid, and gt/lt are sums of n1_v times the "
    "cumulative opposite-group mass strictly below/above v (two "
    "bounded cumulative windows over the grid). Counts multiply into "
    "HUGEINT/DECIMAL(38,0); the signed delta divides |gt - lt| (non-"
    "negative) and restores the sign explicitly. One domain-sized "
    "shuffle; the window inputs are ~50 rows at any SF.",
)
def agg_cliff_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    b = li.select(
        F.col("l_quantity").cast("bigint").alias("v"),
        F.when(F.round(F.col("l_discount") * 100) >= 6, 1)
        .otherwise(0)
        .alias("g"),
    )
    cells = b.groupBy("v").agg(
        F.sum("g").cast("bigint").alias("n1"),
        F.sum(1 - F.col("g")).cast("bigint").alias("n2"),
    )
    w_lo = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    w_hi = Window.orderBy(F.desc("v")).rowsBetween(
        Window.unboundedPreceding, -1
    )
    cum = cells.select(
        "v",
        "n1",
        "n2",
        F.coalesce(F.sum("n2").over(w_lo), F.lit(0)).alias("n2_below"),
        F.coalesce(F.sum("n2").over(w_hi), F.lit(0)).alias("n2_above"),
    )
    t = cum.agg(
        F.sum("n1").cast("bigint").alias("t1"),
        F.sum("n2").cast("bigint").alias("t2"),
        _dsum(F.col("n1").cast("decimal(38,0)") * F.col("n2_below")).alias(
            "gt"
        ),
        _dsum(F.col("n1").cast("decimal(38,0)") * F.col("n2_above")).alias(
            "lt"
        ),
    )
    return t.select(
        F.col("t1").alias("n_treat"),
        F.col("t2").alias("n_control"),
        F.col("gt").cast("bigint").alias("pairs_gt"),
        F.col("lt").cast("bigint").alias("pairs_lt"),
        F.expr(
            "CAST((CASE WHEN gt >= lt THEN 1 ELSE -1 END)"
            " * ((1000000000 * abs(gt - lt))"
            "    div (CAST(t1 AS DECIMAL(38,0)) * t2)) AS BIGINT)"
        ).alias("cliff_delta_ppb"),
    )


# ---------------------------------------------------------------------------
# orders_turning_points — randomness test on the daily revenue series
# ---------------------------------------------------------------------------


@register(
    "orders_turning_points",
    oracle="""
    WITH d AS (
      SELECT o_orderdate AS day,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) // 100000
                  AS BIGINT) AS x
      FROM orders WHERE o_orderdate IS NOT NULL GROUP BY 1
    ),
    s AS (
      SELECT day, x,
             lag(x)  OVER (ORDER BY day) AS xp,
             lead(x) OVER (ORDER BY day) AS xn
      FROM d
    ),
    t AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CASE WHEN (x > xp AND x > xn)
                             OR (x < xp AND x < xn)
                      THEN 1 ELSE 0 END) AS BIGINT) AS tp
      FROM s WHERE xp IS NOT NULL AND xn IS NOT NULL
    )
    SELECT n + 2 AS n_days, tp AS turning_points,
           2.0 * CAST(n AS DOUBLE) / 3.0 AS expected_tp,
           (CAST(tp AS DOUBLE) - 2.0 * CAST(n AS DOUBLE) / 3.0)
             / sqrt((16.0 * CAST(n + 2 AS DOUBLE) - 29.0) / 90.0)
             AS z_score
    FROM t
    """,
    doc="Turning-points randomness test on the daily revenue series: count "
    "strict local maxima/minima among interior days; under an i.i.d. "
    "series the count is asymptotically normal with mean 2(n-2)/3 and "
    "variance (16n-29)/90, so too FEW turning points exposes trend/"
    "persistence and too MANY exposes negative autocorrelation — the "
    "oldest nonparametric complement to agg_runs_test (which needs a "
    "median cut) and agg_autocorrelation (which needs moments). "
    "Neighbor comparison is one lag/lead pass over the BOUNDED daily "
    "series; the z-score is a fixed-order IEEE expression over exact "
    "integers. Ties (equal neighbors) count as non-turning, "
    "identically in both engines — no float ever enters the count.",
)
def orders_turning_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderdate").isNotNull())
    d = o.groupBy(F.col("o_orderdate").alias("day")).agg(
        F.expr(
            "CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))"
            " div 100000 AS BIGINT)"
        ).alias("x")
    )
    w = Window.orderBy("day")
    s = d.select(
        "day",
        "x",
        F.lag("x").over(w).alias("xp"),
        F.lead("x").over(w).alias("xn"),
    )
    t = s.filter(F.col("xp").isNotNull() & F.col("xn").isNotNull()).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(
            F.when(
                ((F.col("x") > F.col("xp")) & (F.col("x") > F.col("xn")))
                | ((F.col("x") < F.col("xp")) & (F.col("x") < F.col("xn"))),
                1,
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("tp"),
    )
    return t.select(
        (F.col("n") + 2).alias("n_days"),
        F.col("tp").alias("turning_points"),
        (F.lit(2.0) * F.col("n").cast("double") / F.lit(3.0)).alias(
            "expected_tp"
        ),
        (
            (
                F.col("tp").cast("double")
                - F.lit(2.0) * F.col("n").cast("double") / F.lit(3.0)
            )
            / F.sqrt(
                (
                    F.lit(16.0) * (F.col("n") + 2).cast("double")
                    - F.lit(29.0)
                )
                / F.lit(90.0)
            )
        ).alias("z_score"),
    )
