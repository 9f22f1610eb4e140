"""Round-16 bank (seed): loaded by ``registry._load_deferred()`` AFTER
pipeline21 — round 15's window is exactly filled by pipeline21's 50
operators, so these queue one further round out, fully linted and
identity-pinned from day one like every earlier tranche.

Reference provenance: like pipeline7-21, none of these operators exist in
the reference's Go core (a MongoDB change-stream -> NATS connector,
/root/reference/internal/mongo/client.go) — they extend the engine-side
analytics surface documented in SURVEY.md §2.3/§2.4.

Cross-engine determinism rules: the pipeline11-21 discipline — exact
integers on the hash surface, DECIMAL(38,0)/HUGEINT widening before
multiplication, floor(x+0.5) instead of round() on doubles, every
oracle-side fractional constant CAST(c AS DOUBLE) (bare DuckDB decimal
literals are exact DECIMALs), ln/exp only as floor-quantized micro-nat
integers per bounded DOMAIN cell or per bounded top-k member (never per
row), truncating div only on non-negative operands (sign-split
otherwise).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mongodb_nats_connector_spark.operators.pipeline20 import _dsum
from mongodb_nats_connector_spark.operators.pipeline21 import (
    _REV8_CONST_MASK,
    _REV8_CONST_MUL,
    _deflate_rev_code,
)
from mongodb_nats_connector_spark.registry import register
from mongodb_nats_connector_spark.sources.tables import table


# ---------------------------------------------------------------------------
# multimodal_deflate_lz77_decode — DEFLATE with a real back-reference
# ---------------------------------------------------------------------------


@register(
    "multimodal_deflate_lz77_decode",
    oracle="""
    WITH d AS (
      SELECT doc_id, 12 + doc_id % 13 AS k FROM documents
    ),
    lits AS (
      SELECT doc_id, k,
             list_transform(range(0, k),
                            i -> (doc_id * 7 + i * 31) % 144) AS ls
      FROM d
    ),
    full_out AS (
      SELECT doc_id, k,
             list_concat(ls, list_slice(ls, k - 2, k)) AS os
      FROM lits
    )
    SELECT doc_id,
           CAST(k + 3 AS BIGINT) AS n_bytes,
           CAST(list_sum(os) AS BIGINT) AS byte_sum,
           CAST(list_min(os) AS BIGINT) AS byte_min,
           CAST(list_max(os) AS BIGINT) AS byte_max,
           CAST(list_sum(list_transform(range(0, k + 3),
                i -> (i + 1) * os[i + 1])) AS BIGINT) AS stream_checksum
    FROM full_out
    ORDER BY doc_id
    """,
    doc="REAL LZ77 back-reference decompression on the hash surface: "
    "the stream extends multimodal_deflate_fixed_decode's literal-only "
    "fixed-Huffman composition with an actual LENGTH/DISTANCE pair — "
    "length code 257 (7-bit fixed code, length 3) and distance code 2 "
    "(5-bit, distance 3) — so zlib's inflate must execute the "
    "sliding-WINDOW COPY (the 'LZ' in DEFLATE), reproducing the last "
    "three literals; the closed-form byte layout puts the 19 post-"
    "literal bits at V = rev7(len)|rev5(dist)<<7 = 1088, whose low 5 "
    "bits are 0 — bytes k..k+2 collapse to [R_{k-1} div 32, 34, 0] "
    "(pinned against zlib in tests). The oracle predicts the "
    "decompressed bytes as literals + their own last-3 slice, never "
    "seeing DEFLATE. The stats batcher is shared with the fixed-"
    "Huffman op. Map-only; zero shuffles at any scale.",
)
def multimodal_deflate_lz77_decode(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from mongodb_nats_connector_spark.operators.multimodal import (
        DEFLATE_STATS_SCHEMA,
        _deflate_stats_batches,
    )

    r0 = _deflate_rev_code("0")
    ri = _deflate_rev_code("i")
    rim1 = _deflate_rev_code("i - 1")
    rkm1 = _deflate_rev_code("k - 1")
    payload_hex = F.expr(
        "concat_ws('', transform(sequence(0, k + 2), i -> lpad(hex("
        "CASE WHEN i = 0 THEN 3 + (" + r0 + " % 32) * 8 "
        "WHEN i < k THEN (" + rim1 + " div 32) + (" + ri + " % 32) * 8 "
        "WHEN i = k THEN (" + rkm1 + " div 32) "
        "WHEN i = k + 1 THEN 34 "
        "ELSE 0 END), 2, '0')))"
    )
    d = table(spark, sf_dir, "documents", parallel=True).select(
        "doc_id", (F.lit(12) + F.col("doc_id") % 13).alias("k")
    )
    return (
        d.select("doc_id", F.unhex(payload_hex).alias("payload"))
        .mapInPandas(_deflate_stats_batches, DEFLATE_STATS_SCHEMA)
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# multimodal_crc32_check — CRC-32 as two independent implementations
# ---------------------------------------------------------------------------


@register(
    "multimodal_crc32_check",
    oracle="""
    WITH d AS (
      SELECT doc_id, 8 + doc_id % 9 AS n FROM documents
    ),
    payload AS (
      SELECT doc_id, n,
             list_transform(range(0, n),
                            i -> (doc_id * 17 + i * 29) % 256) AS bs
      FROM d
    ),
    crc AS (
      SELECT doc_id, n, bs,
             list_reduce(
               list_prepend(4294967295, bs),
               (crc, b) -> list_reduce(
                 list_prepend(xor(CAST(crc AS BIGINT), CAST(b AS BIGINT)),
                              range(0, 8)),
                 (c, s) -> CASE WHEN c % 2 = 1
                           THEN xor(c // 2, 3988292384)
                           ELSE c // 2 END)
             ) AS crc_raw
      FROM payload
    )
    SELECT doc_id,
           CAST(n AS BIGINT) AS n_bytes,
           CAST(list_sum(bs) AS BIGINT) AS byte_sum,
           CAST(xor(crc_raw, 4294967295) AS BIGINT) AS crc32
    FROM crc
    ORDER BY doc_id
    """,
    doc="CRC-32 (the zlib/PNG/gzip polynomial 0xEDB88320) computed by "
    "TWO INDEPENDENT implementations meeting on the hash surface: the "
    "Spark side runs the real zlib.crc32 over Arrow-batched "
    "mapInPandas; the oracle implements the bitwise LSB-first "
    "reduction itself — an 8-step inner reduce per byte over the "
    "column-composed payload, pure integer xor/halving arithmetic. "
    "Any disagreement in reflection, initial value, final complement "
    "or polynomial breaks parity on every row. This is the checksum "
    "the gzip/PNG walkers carry as opaque fields elsewhere — here the "
    "VALUE itself is verified, closing the integrity-check axis of "
    "the multimodal surface. Map-only; zero shuffles at any scale.",
)
def multimodal_crc32_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mongodb_nats_connector_spark.operators.multimodal import (
        CRC32_SCHEMA,
        _crc32_batches,
    )

    d = table(spark, sf_dir, "documents", parallel=True).select(
        "doc_id", (F.lit(8) + F.col("doc_id") % 9).alias("n")
    )
    payload_hex = F.expr(
        "concat_ws('', transform(sequence(0, n - 1), i ->"
        " lpad(hex((doc_id * 17 + i * 29) % 256), 2, '0')))"
    )
    return (
        d.select("doc_id", F.unhex(payload_hex).alias("payload"))
        .mapInPandas(_crc32_batches, CRC32_SCHEMA)
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# multimodal_utf8_validate — byte-level UTF-8 well-formedness walk
# ---------------------------------------------------------------------------


@register(
    "multimodal_utf8_validate",
    oracle="""
    WITH d AS (
      SELECT doc_id, 6 + doc_id % 7 AS k, doc_id % 5 AS variant
      FROM documents
    ),
    pred AS (
      SELECT doc_id, k, variant,
             -- codepoints: k ASCII 'a'+i%26, then one 2-byte (U+00A2+d%32),
             -- one 3-byte (U+20AC+d%64), one 4-byte (U+10348+d%128)
             k + 3 AS n_codepoints_good,
             CAST(list_sum(list_transform(range(0, k),
                  i -> 97 + i % 26)) AS BIGINT)
               + (162 + doc_id % 32) + (8364 + doc_id % 64)
               + (66376 + doc_id % 128) AS cp_sum_good,
             k + 2 + 3 + 4 AS n_bytes_good
      FROM d
    )
    SELECT doc_id,
           CAST(CASE WHEN variant = 0 THEN 1 ELSE 0 END AS BIGINT)
             AS is_valid,
           CAST(CASE WHEN variant = 0 THEN n_codepoints_good END
                AS BIGINT) AS n_codepoints,
           CAST(CASE WHEN variant = 0 THEN cp_sum_good END AS BIGINT)
             AS codepoint_sum,
           CAST(n_bytes_good
                + CASE WHEN variant = 2 THEN -1 ELSE 0 END
                AS BIGINT) AS n_bytes
    FROM pred
    ORDER BY doc_id
    """,
    doc="Byte-level UTF-8 validation on the hash surface — the text-"
    "encoding gate every corpus-ingest pipeline runs before anything "
    "else: per doc, compose a byte sequence covering all four "
    "encoding lengths (ASCII run + 2-byte U+00A2-range + 3-byte "
    "U+20AC-range + 4-byte U+10348-range), then MUTATE it by doc_id "
    "mod 5 — 0: valid; 1: overlong encoding of '/' (C0 AF, the "
    "classic smuggling vector); 2: truncated trailing sequence; 3: "
    "bare continuation byte; 4: CESU-style surrogate (ED A0 80). The "
    "decoder (multimodal.validate_utf8) is a strict structural walk "
    "(continuation counts, overlong minimality, surrogate range, "
    "U+10FFFF cap) — NOT python str.decode, so the test suite can pin "
    "it AGAINST codecs.utf_8 on random corpora; valid docs emit "
    "codepoint count/sum (predicted arithmetically by the oracle), "
    "invalid ones typed NULLs with is_valid = 0. Map-only; zero "
    "shuffles at any scale.",
)
def multimodal_utf8_validate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mongodb_nats_connector_spark.operators.multimodal import (
        UTF8_SCHEMA,
        _utf8_batches,
    )

    d = table(spark, sf_dir, "documents", parallel=True).select(
        "doc_id",
        (F.lit(6) + F.col("doc_id") % 7).alias("k"),
        (F.col("doc_id") % 5).alias("variant"),
    )
    ascii_hex = F.expr(
        "concat_ws('', transform(sequence(0, k - 1), i ->"
        " lpad(hex(97 + i % 26), 2, '0')))"
    )
    # 2-byte: U+00A2 + d%32  -> C2/C3 xx ; 3-byte: U+20AC + d%64 ->
    # E2 82/83 xx ; 4-byte: U+10348 + d%128 -> F0 90 8D/8E xx
    two = F.expr(
        "concat(lpad(hex(192 + ((162 + doc_id % 32) div 64)), 2, '0'),"
        " lpad(hex(128 + ((162 + doc_id % 32) % 64)), 2, '0'))"
    )
    three = F.expr(
        "concat(lpad(hex(224 + ((8364 + doc_id % 64) div 4096)), 2, '0'),"
        " lpad(hex(128 + (((8364 + doc_id % 64) div 64) % 64)), 2, '0'),"
        " lpad(hex(128 + ((8364 + doc_id % 64) % 64)), 2, '0'))"
    )
    four = F.expr(
        "concat(lpad(hex(240 + ((66376 + doc_id % 128) div 262144)), 2, '0'),"
        " lpad(hex(128 + (((66376 + doc_id % 128) div 4096) % 64)), 2, '0'),"
        " lpad(hex(128 + (((66376 + doc_id % 128) div 64) % 64)), 2, '0'),"
        " lpad(hex(128 + ((66376 + doc_id % 128) % 64)), 2, '0'))"
    )
    good = F.concat(ascii_hex, two, three, four)
    payload_hex = F.expr(
        "CASE"
        " WHEN variant = 1 THEN concat(substring(good, 1, 2 * k), 'C0AF',"
        "   substring(good, 2 * k + 5))"           # overlong '/'
        " WHEN variant = 2 THEN substring(good, 1, length(good) - 2)"
        " WHEN variant = 3 THEN concat('80', substring(good, 3))"
        " WHEN variant = 4 THEN concat(substring(good, 1, 2 * k),"
        "   'EDA080', substring(good, 2 * k + 7))"  # surrogate D800
        " ELSE good END"
    )
    return (
        d.withColumn("good", good)
        .select("doc_id", F.unhex(payload_hex).alias("payload"))
        .mapInPandas(_utf8_batches, UTF8_SCHEMA)
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# orders_expected_shortfall — VaR / ES risk report at two confidence levels
# ---------------------------------------------------------------------------


@register(
    "orders_expected_shortfall",
    oracle="""
    WITH b AS (
      SELECT CAST(round(o_totalprice * 100) AS BIGINT) // 100 AS v
      FROM orders
    ),
    cells AS (
      SELECT v, CAST(count(*) AS BIGINT) AS c FROM b GROUP BY v
    ),
    tot AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM cells),
    pos AS (
      SELECT v, c, t.n,
             coalesce(sum(c) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED
               PRECEDING AND 1 PRECEDING), 0) AS lo
      FROM cells CROSS JOIN tot t
    ),
    lvl AS (
      SELECT max(n) AS n,
             min(CASE WHEN (lo + c) * 20 >= 19 * n THEN v END) AS var95,
             min(CASE WHEN (lo + c) * 100 >= 99 * n THEN v END) AS var99,
             CAST(sum(CAST(greatest(least(c, (lo + c) - (19 * n) // 20),
                  0) AS HUGEINT) * v) AS HUGEINT) AS tail5_sum,
             CAST(sum(CAST(greatest(least(c, (lo + c) - (99 * n) // 100),
                  0) AS HUGEINT) * v) AS HUGEINT) AS tail1_sum
      FROM pos
    )
    SELECT n AS n_orders,
           CAST(var95 AS BIGINT) AS var95_dollars,
           CAST(var99 AS BIGINT) AS var99_dollars,
           CAST(tail5_sum // greatest(n - (19 * n) // 20, 1) AS BIGINT)
             AS es95_dollars,
           CAST(tail1_sum // greatest(n - (99 * n) // 100, 1) AS BIGINT)
             AS es99_dollars
    FROM lvl
    """,
    doc="Value-at-Risk and Expected Shortfall of the order-value "
    "distribution at the 95% and 99% levels on the whole-dollar value "
    "grid: VaR_q = the empirical q-quantile, ES_q = the mean of the "
    "upper (1-q) tail — the coherent risk measure (subadditive, "
    "unlike VaR) that Basel III moved to, reported at two levels so "
    "the tail-thickness gradient ES99/ES95 is visible; the risk-"
    "reporting companion of agg_hogg_tail_weight (which CLASSIFIES "
    "the tail) and orders_sharpe_sortino (central-moment ratios). "
    "Tail sums clear exactly via the palma-style top-k prefix trick "
    "(count above the quantile cut = n - ceil(q n), both sides "
    "integer); the grid window is bounded by the price DOMAIN, not "
    "the row count.",
)
def orders_expected_shortfall(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders", parallel=True)
    cells = o.select(
        F.expr(
            "CAST(round(o_totalprice * 100) AS BIGINT) div 100"
        ).alias("v")
    ).groupBy("v").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    tot = cells.agg(F.sum("c").cast("bigint").alias("n"))
    w_lo = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    pos = cells.crossJoin(F.broadcast(tot)).select(
        "v", "c", "n",
        F.coalesce(F.sum("c").over(w_lo), F.lit(0)).alias("lo"),
    )
    lvl = pos.agg(
        F.max("n").alias("n"),
        F.min(
            F.when((F.col("lo") + F.col("c")) * 20 >= 19 * F.col("n"),
                   F.col("v"))
        ).alias("var95"),
        F.min(
            F.when((F.col("lo") + F.col("c")) * 100 >= 99 * F.col("n"),
                   F.col("v"))
        ).alias("var99"),
        _dsum(
            F.expr(
                "CAST(greatest(least(c, (lo + c) - (19 * n) div 20), 0)"
                " AS DECIMAL(38,0)) * v"
            )
        ).alias("tail5_sum"),
        _dsum(
            F.expr(
                "CAST(greatest(least(c, (lo + c) - (99 * n) div 100), 0)"
                " AS DECIMAL(38,0)) * v"
            )
        ).alias("tail1_sum"),
    )
    return lvl.select(
        F.col("n").alias("n_orders"),
        F.col("var95").cast("bigint").alias("var95_dollars"),
        F.col("var99").cast("bigint").alias("var99_dollars"),
        F.expr(
            "CAST(tail5_sum div greatest(n - (19 * n) div 20, 1)"
            " AS BIGINT)"
        ).alias("es95_dollars"),
        F.expr(
            "CAST(tail1_sum div greatest(n - (99 * n) div 100, 1)"
            " AS BIGINT)"
        ).alias("es99_dollars"),
    )


# ---------------------------------------------------------------------------
# orders_omega_ratio — gain/loss ratio of monthly revenue changes
# ---------------------------------------------------------------------------


@register(
    "orders_omega_ratio",
    oracle="""
    WITH m AS (
      SELECT year(o_orderdate) * 12 + month(o_orderdate) AS ym,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                  AS BIGINT) AS rc
      FROM orders GROUP BY 1
    ),
    d AS (
      SELECT ym, rc - lag(rc) OVER (ORDER BY ym) AS chg FROM m
    ),
    s AS (
      SELECT CAST(count(chg) AS BIGINT) AS n_changes,
             CAST(sum(CASE WHEN chg > 0 THEN chg ELSE 0 END)
                  AS HUGEINT) AS gains,
             CAST(sum(CASE WHEN chg < 0 THEN -chg ELSE 0 END)
                  AS HUGEINT) AS losses,
             CAST(sum(CASE WHEN chg > 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_up
      FROM d
    )
    SELECT n_changes,
           CAST(gains AS BIGINT) AS gains_cents,
           CAST(losses AS BIGINT) AS losses_cents,
           n_up,
           CAST((1000 * gains) // greatest(losses, 1) AS BIGINT)
             AS omega_milli,
           CAST((1000000 * n_up) // greatest(n_changes, 1) AS BIGINT)
             AS win_rate_ppm
    FROM s
    """,
    doc="Omega ratio (threshold 0) of month-over-month revenue changes: "
    "sum of gains over sum of losses — the full-distribution "
    "performance ratio that, unlike orders_sharpe_sortino's moment "
    "ratios, uses every change's actual magnitude with no normality "
    "assumption (Omega = 1 exactly when up-mass equals down-mass). "
    "Win rate rides along. Monthly rollup, one bounded calendar-"
    "series lag window, exact integer cents; single milli/ppm floors.",
)
def orders_omega_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders", parallel=True)
    m = o.groupBy(
        (F.year("o_orderdate") * 12 + F.month("o_orderdate")).alias("ym")
    ).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
        .cast("bigint")
        .alias("rc")
    )
    d = m.select(
        "ym",
        (F.col("rc") - F.lag("rc").over(Window.orderBy("ym"))).alias("chg"),
    )
    s = d.agg(
        F.count("chg").cast("bigint").alias("n_changes"),
        _dsum(
            F.when(F.col("chg") > 0, F.col("chg")).otherwise(0)
        ).alias("gains"),
        _dsum(
            F.when(F.col("chg") < 0, -F.col("chg")).otherwise(0)
        ).alias("losses"),
        F.sum(F.when(F.col("chg") > 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_up"),
    )
    return s.select(
        "n_changes",
        F.col("gains").cast("bigint").alias("gains_cents"),
        F.col("losses").cast("bigint").alias("losses_cents"),
        "n_up",
        F.expr(
            "CAST((1000 * gains) div greatest(losses, 1) AS BIGINT)"
        ).alias("omega_milli"),
        F.expr(
            "CAST((1000000 * n_up) div greatest(n_changes, 1) AS BIGINT)"
        ).alias("win_rate_ppm"),
    )


# ---------------------------------------------------------------------------
# orders_ulcer_index — RMS percentage drawdown of the monthly series
# ---------------------------------------------------------------------------


@register(
    "orders_ulcer_index",
    oracle="""
    WITH m AS (
      SELECT year(o_orderdate) * 12 + month(o_orderdate) AS ym,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                  AS BIGINT) AS rc
      FROM orders GROUP BY 1
    ),
    dd AS (
      SELECT ym, rc,
             max(rc) OVER (ORDER BY ym ROWS BETWEEN UNBOUNDED PRECEDING
                           AND CURRENT ROW) AS peak
      FROM m
    ),
    q AS (
      SELECT ym,
             (1000000 * (peak - rc)) // peak AS dd_ppm
      FROM dd
    ),
    s AS (
      SELECT CAST(count(*) AS BIGINT) AS n_months,
             CAST(max(dd_ppm) AS BIGINT) AS max_dd_ppm,
             CAST(sum(CAST(dd_ppm AS HUGEINT) * dd_ppm) AS HUGEINT)
               AS ss
      FROM q
    )
    SELECT n_months, max_dd_ppm,
           CAST(ss // n_months AS BIGINT) AS ulcer2_ppm2
    FROM s
    """,
    doc="Ulcer index of the monthly revenue series: the RMS of the "
    "percentage drawdown from the running peak — the depth-AND-"
    "duration pain measure (a long shallow slump scores like a short "
    "crash) that orders_max_drawdown's single worst-dip number cannot "
    "see. Each month's drawdown is ONE ppm floor against its exact "
    "integer running peak (bounded calendar cells); the emitted "
    "statistic is the exact mean of the squared ppm drawdowns "
    "(UI = sqrt(ulcer2_ppm2)/1e6 off-surface, keeping sqrt out of "
    "both engines). Monthly rollup + bounded prefix-max window.",
)
def orders_ulcer_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders", parallel=True)
    m = o.groupBy(
        (F.year("o_orderdate") * 12 + F.month("o_orderdate")).alias("ym")
    ).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
        .cast("bigint")
        .alias("rc")
    )
    dd = m.select(
        "ym", "rc",
        F.max("rc")
        .over(
            Window.orderBy("ym").rowsBetween(
                Window.unboundedPreceding, Window.currentRow
            )
        )
        .alias("peak"),
    )
    q = dd.select(
        "ym",
        F.expr("(1000000 * (peak - rc)) div peak").alias("dd_ppm"),
    )
    s = q.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_months"),
        F.max("dd_ppm").cast("bigint").alias("max_dd_ppm"),
        _dsum(F.col("dd_ppm") * F.col("dd_ppm")).alias("ss"),
    )
    return s.select(
        "n_months",
        "max_dd_ppm",
        F.expr("CAST(ss div n_months AS BIGINT)").alias("ulcer2_ppm2"),
    )


# ---------------------------------------------------------------------------
# events_visibility_graph — natural visibility graph of the daily series
# ---------------------------------------------------------------------------


@register(
    "events_visibility_graph",
    oracle="""
    WITH d AS (
      SELECT CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS x
      FROM events WHERE ts IS NOT NULL GROUP BY 1
    ),
    pairs AS (
      SELECT a.day AS da, b.day AS db, a.x AS xa, b.x AS xb
      FROM d a JOIN d b ON a.day < b.day
    ),
    blocked AS (
      SELECT p.da, p.db
      FROM pairs p JOIN d c ON c.day > p.da AND c.day < p.db
      WHERE (c.x - p.xa) * datediff('day', p.da, p.db)
            >= (p.xb - p.xa) * datediff('day', p.da, c.day)
      GROUP BY 1, 2
    ),
    edges AS (
      SELECT p.da, p.db FROM pairs p
      ANTI JOIN blocked bl ON bl.da = p.da AND bl.db = p.db
    ),
    deg AS (
      SELECT day, CAST(count(*) AS BIGINT) AS k FROM (
        SELECT da AS day FROM edges
        UNION ALL SELECT db AS day FROM edges
      ) GROUP BY 1
    )
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM d) AS n_days,
           (SELECT CAST(count(*) AS BIGINT) FROM edges) AS n_edges,
           (SELECT CAST(max(k) AS BIGINT) FROM deg) AS max_degree,
           (SELECT CAST((2000 * count(*))
                // (SELECT count(*) FROM d) AS BIGINT) FROM edges)
             AS mean_degree_milli
    """,
    doc="Natural visibility graph of the daily event-volume series "
    "(Lacasa et al.): days a < b are connected iff every day c "
    "between them sits strictly below the sight line from (a, x_a) "
    "to (b, x_b) — the time-series-to-network transform whose degree "
    "statistics separate periodic, random and fractal dynamics "
    "(hubs = record peaks), complementing the scalar dynamics panel "
    "(permutation entropy, extremal index, DFA) with a structural "
    "view. The sight-line test clears to an exact integer cross-"
    "multiplication over calendar day offsets (no division, gap-"
    "robust); all joins are over the bounded ~30-day calendar census "
    "(O(days^3) worst case, calendar-bounded, broadcast). Emits edge "
    "count, max degree (the dominant peak's reach) and milli mean "
    "degree.",
)
def events_visibility_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events", parallel=True)
    d = (
        e.filter(F.col("ts").isNotNull())
        .groupBy(F.col("ts").cast("date").alias("day"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("x"))
    )
    from mongodb_nats_connector_spark.plans.caching import (
        persist_until_collected,
    )

    a, b, c = d.alias("a"), d.alias("b"), d.alias("c")
    pairs = a.join(
        F.broadcast(b), F.col("a.day") < F.col("b.day")
    ).select(
        F.col("a.day").alias("da"),
        F.col("b.day").alias("db"),
        F.col("a.x").alias("xa"),
        F.col("b.x").alias("xb"),
    )
    blocked = (
        pairs.alias("p")
        .join(
            F.broadcast(c),
            (F.col("c.day") > F.col("p.da"))
            & (F.col("c.day") < F.col("p.db")),
        )
        .filter(
            (F.col("c.x") - F.col("p.xa"))
            * F.datediff(F.col("p.db"), F.col("p.da"))
            >= (F.col("p.xb") - F.col("p.xa"))
            * F.datediff(F.col("c.day"), F.col("p.da"))
        )
        .select("p.da", "p.db")
        .distinct()
    )
    edges = pairs.join(
        F.broadcast(blocked), ["da", "db"], "left_anti"
    ).select("da", "db")
    deg = (
        edges.select(F.col("da").alias("day"))
        .unionAll(edges.select(F.col("db").alias("day")))
        .groupBy("day")
        .agg(F.count(F.lit(1)).cast("bigint").alias("k"))
    )
    n_days = d.agg(F.count(F.lit(1)).cast("bigint").alias("n_days"))
    n_edges = edges.agg(F.count(F.lit(1)).cast("bigint").alias("n_edges"))
    maxdeg = deg.agg(F.max("k").cast("bigint").alias("max_degree"))
    out = (
        n_days.crossJoin(F.broadcast(n_edges))
        .crossJoin(F.broadcast(maxdeg))
        .select(
            "n_days",
            "n_edges",
            "max_degree",
            F.expr(
                "CAST((2000 * n_edges) div n_days AS BIGINT)"
            ).alias("mean_degree_milli"),
        )
    )
    return persist_until_collected(d, out)


# ---------------------------------------------------------------------------
# events_cross_correlation — lagged CCF between two event-type series
# ---------------------------------------------------------------------------


@register(
    "events_cross_correlation",
    oracle="""
    WITH d AS (
      SELECT CAST(ts AS DATE) AS day,
             CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                  AS BIGINT) AS x,
             CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                  AS BIGINT) AS y
      FROM events WHERE ts IS NOT NULL GROUP BY 1
    ),
    lags AS (SELECT CAST(l AS BIGINT) AS lag FROM range(-7, 8) t(l)),
    ali AS (
      SELECT lg.lag,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(a.x) AS HUGEINT) AS sx,
             CAST(sum(b.y) AS HUGEINT) AS sy,
             CAST(sum(a.x * a.x) AS HUGEINT) AS sxx,
             CAST(sum(b.y * b.y) AS HUGEINT) AS syy,
             CAST(sum(a.x * b.y) AS HUGEINT) AS sxy
      FROM lags lg
      JOIN d a ON TRUE
      JOIN d b ON b.day = a.day + CAST(lg.lag AS INTEGER)
      GROUP BY 1
    )
    SELECT lag, n,
           CAST(sign(n * sxy - sx * sy) AS BIGINT) AS r_sign,
           CAST((1000000 * (n * sxy - sx * sy) * (n * sxy - sx * sy))
                // greatest((n * sxx - sx * sx) * (n * syy - sy * sy), 1)
                AS BIGINT) AS r2_ppm
    FROM ali
    ORDER BY lag
    """,
    doc="Cross-correlation function between the daily click and "
    "purchase series at lags -7..+7: does click volume LEAD purchase "
    "volume, and by how many days? — the lag-structure diagnostic "
    "that agg_autocorrelation (one series with itself) and "
    "events_type_cooccurrence (same-day only) cannot answer; the "
    "argmax lag is the input to any lead-lag feature in a forecast "
    "stack. Per lag, the aligned-day join is calendar-bounded and "
    "every Pearson moment is an exact HUGEINT-widened integer; r is "
    "emitted as sign + squared ppm (cross-engine sqrt stays off-"
    "surface). 15 bounded lag cells; one scan + calendar self-joins.",
)
def events_cross_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events", parallel=True)
    d = (
        e.filter(F.col("ts").isNotNull())
        .groupBy(F.col("ts").cast("date").alias("day"))
        .agg(
            F.sum(
                F.when(F.col("event_type") == "click", 1).otherwise(0)
            )
            .cast("bigint")
            .alias("x"),
            F.sum(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            )
            .cast("bigint")
            .alias("y"),
        )
    )
    from mongodb_nats_connector_spark.plans.caching import (
        persist_until_collected,
    )

    lags = spark.range(-7, 8).select(F.col("id").cast("bigint").alias("lag"))
    a, b = d.alias("a"), d.alias("b")
    ali = (
        a.crossJoin(F.broadcast(lags))
        .join(
            F.broadcast(b),
            F.col("b.day")
            == F.expr("date_add(a.day, CAST(lag AS INT))"),
        )
        .groupBy("lag")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            _dsum(F.col("a.x")).alias("sx"),
            _dsum(F.col("b.y")).alias("sy"),
            _dsum(F.col("a.x") * F.col("a.x")).alias("sxx"),
            _dsum(F.col("b.y") * F.col("b.y")).alias("syy"),
            _dsum(F.col("a.x") * F.col("b.y")).alias("sxy"),
        )
    )
    out = ali.select(
        "lag",
        "n",
        F.expr("CAST(sign(n * sxy - sx * sy) AS BIGINT)").alias("r_sign"),
        F.expr(
            "CAST((1000000 * (n * sxy - sx * sy) * (n * sxy - sx * sy))"
            " div greatest((n * sxx - sx * sx) * (n * syy - sy * sy), 1)"
            " AS BIGINT)"
        ).alias("r2_ppm"),
    ).orderBy("lag")
    return persist_until_collected(d, out)


# ---------------------------------------------------------------------------
# events_granger_causality_1lag — closed-form VAR(1) Granger F statistic
# ---------------------------------------------------------------------------


@register(
    "events_granger_causality_1lag",
    oracle="""
    WITH d AS (
      SELECT CAST(ts AS DATE) AS day,
             CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                  AS BIGINT) AS x,
             CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                  AS BIGINT) AS y
      FROM events WHERE ts IS NOT NULL GROUP BY 1
    ),
    ali AS (
      SELECT cur.y AS yv, prv.y AS z, prv.x AS w
      FROM d cur JOIN d prv ON prv.day = cur.day - 1
    ),
    mo AS (
      SELECT CAST(count(*) AS HUGEINT) AS n,
             CAST(sum(yv) AS HUGEINT) AS sy,
             CAST(sum(z) AS HUGEINT) AS sz,
             CAST(sum(w) AS HUGEINT) AS sw,
             CAST(sum(yv * yv) AS HUGEINT) AS syy,
             CAST(sum(z * z) AS HUGEINT) AS szz,
             CAST(sum(w * w) AS HUGEINT) AS sww,
             CAST(sum(yv * z) AS HUGEINT) AS syz,
             CAST(sum(yv * w) AS HUGEINT) AS syw,
             CAST(sum(z * w) AS HUGEINT) AS szw
      FROM ali
    ),
    c AS (
      SELECT n,
             n * syy - sy * sy AS cyy,
             n * szz - sz * sz AS dzz,
             n * sww - sw * sw AS dww,
             n * syz - sy * sz AS nyz,
             n * syw - sy * sw AS nyw,
             n * szw - sz * sw AS czw
      FROM mo
    ),
    rss AS (
      SELECT n,
             (1000000 * (cyy * dzz - nyz * nyz))
               // greatest(n * dzz, 1) AS rssr_micro,
             (1000000 * (cyy * (dzz * dww - czw * czw)
               - (nyz * nyz * dww - 2 * nyz * nyw * czw
                  + nyw * nyw * dzz)))
               // greatest(n * (dzz * dww - czw * czw), 1) AS rssu_micro
      FROM c
    )
    SELECT CAST(n AS BIGINT) AS n_days,
           CAST(rssr_micro AS BIGINT) AS rss_restricted_micro,
           CAST(rssu_micro AS BIGINT) AS rss_unrestricted_micro,
           CAST((1000 * (n - 3) * greatest(rssr_micro - rssu_micro, 0))
                // greatest(rssu_micro, 1) AS BIGINT) AS granger_f_milli
    FROM rss
    """,
    doc="Granger causality (1 lag) from daily clicks to daily "
    "purchases: does yesterday's click volume improve today's "
    "purchase forecast beyond yesterday's purchases alone? F = "
    "(n-3)(RSS_r - RSS_u)/RSS_u comparing the restricted AR(1) "
    "against the unrestricted VAR row — the directed complement of "
    "events_cross_correlation's symmetric lead-lag scan. Both "
    "residual sums come from CLOSED-FORM normal equations on exact "
    "HUGEINT-widened centered moments (1-regressor: Cyy - Nyz^2/Dzz; "
    "2-regressor: the 2x2 determinant expansion), micro-quantized "
    "once per 1-row frame before the final cleared F ratio "
    "(documented two-layer floor; the quantization-epsilon guard "
    "keeps the numerator nonnegative). One calendar-bounded lag "
    "join + one rollup.",
)
def events_granger_causality_1lag(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    e = table(spark, sf_dir, "events", parallel=True)
    d = (
        e.filter(F.col("ts").isNotNull())
        .groupBy(F.col("ts").cast("date").alias("day"))
        .agg(
            F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
            .cast("bigint")
            .alias("x"),
            F.sum(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            )
            .cast("bigint")
            .alias("y"),
        )
    )
    cur, prv = d.alias("cur"), d.alias("prv")
    ali = cur.join(
        F.broadcast(prv),
        F.col("prv.day") == F.expr("date_add(cur.day, -1)"),
    ).select(
        F.col("cur.y").alias("yv"),
        F.col("prv.y").alias("z"),
        F.col("prv.x").alias("w"),
    )
    mo = ali.agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        _dsum(F.col("yv")).alias("sy"),
        _dsum(F.col("z")).alias("sz"),
        _dsum(F.col("w")).alias("sw"),
        _dsum(F.col("yv") * F.col("yv")).alias("syy"),
        _dsum(F.col("z") * F.col("z")).alias("szz"),
        _dsum(F.col("w") * F.col("w")).alias("sww"),
        _dsum(F.col("yv") * F.col("z")).alias("syz"),
        _dsum(F.col("yv") * F.col("w")).alias("syw"),
        _dsum(F.col("z") * F.col("w")).alias("szw"),
    )
    c = mo.select(
        "n",
        F.expr("n * syy - sy * sy").alias("cyy"),
        F.expr("n * szz - sz * sz").alias("dzz"),
        F.expr("n * sww - sw * sw").alias("dww"),
        F.expr("n * syz - sy * sz").alias("nyz"),
        F.expr("n * syw - sy * sw").alias("nyw"),
        F.expr("n * szw - sz * sw").alias("czw"),
    )
    rss = c.select(
        "n",
        F.expr(
            "(1000000 * (cyy * dzz - nyz * nyz))"
            " div greatest(n * dzz, 1)"
        ).alias("rssr_micro"),
        F.expr(
            "(1000000 * (cyy * (dzz * dww - czw * czw)"
            " - (nyz * nyz * dww - 2 * nyz * nyw * czw"
            " + nyw * nyw * dzz)))"
            " div greatest(n * (dzz * dww - czw * czw), 1)"
        ).alias("rssu_micro"),
    )
    return rss.select(
        F.col("n").cast("bigint").alias("n_days"),
        F.col("rssr_micro").cast("bigint").alias("rss_restricted_micro"),
        F.col("rssu_micro").cast("bigint").alias("rss_unrestricted_micro"),
        F.expr(
            "CAST((1000 * (n - 3) * greatest(rssr_micro - rssu_micro, 0))"
            " div greatest(rssu_micro, 1) AS BIGINT)"
        ).alias("granger_f_milli"),
    )


# ---------------------------------------------------------------------------
# agg_rousseeuw_qn — the Qn robust scale via the pairwise-distance census
# ---------------------------------------------------------------------------


@register(
    "agg_rousseeuw_qn",
    oracle="""
    WITH b AS (
      SELECT CAST(round(l_quantity) AS BIGINT) AS v FROM lineitem
    ),
    cells AS (
      SELECT v, CAST(count(*) AS BIGINT) AS c FROM b GROUP BY v
    ),
    tot AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM cells),
    dist AS (
      SELECT a.v - bb.v AS delta,
             CAST(sum(CASE WHEN a.v = bb.v
                  THEN CAST(a.c AS HUGEINT) * (a.c - 1) // 2
                  ELSE CAST(a.c AS HUGEINT) * bb.c END) AS HUGEINT) AS pc
      FROM cells a JOIN cells bb ON a.v >= bb.v
      GROUP BY 1
    ),
    cum AS (
      SELECT delta, pc,
             CAST(sum(pc) OVER (ORDER BY delta) AS HUGEINT) AS cpc
      FROM dist
    ),
    ks AS (
      SELECT t.n,
             CAST((t.n // 2 + 1) * CAST(t.n // 2 AS HUGEINT) // 2
                  AS HUGEINT) AS k_qn,
             CAST((CAST(t.n AS HUGEINT) * (t.n - 1) // 2 + 1) // 2
                  AS HUGEINT) AS k_med
      FROM tot t
    )
    SELECT ks.n AS n_rows,
           CAST(ks.k_qn AS BIGINT) AS k_order,
           CAST((SELECT min(delta) FROM cum WHERE cpc >= ks.k_qn)
                AS BIGINT) AS qn_raw,
           CAST((SELECT min(delta) FROM cum WHERE cpc >= ks.k_med)
                AS BIGINT) AS median_pairwise_distance
    FROM ks
    """,
    doc="Rousseeuw-Croux Qn robust scale of line quantities: the "
    "k-th order statistic of all pairwise distances |x_i - x_j| with "
    "k = C(h, 2), h = n/2 + 1 — 82% Gaussian efficiency (vs MAD's "
    "37%) with the same 50% breakdown, and no location estimate "
    "needed; the O(n^2) pairwise census that makes Qn 'impossible' "
    "at scale collapses onto the bounded quantity grid: the count of "
    "pairs at each distance delta is an exact convolution of the "
    "<= 51-cell value census (within-cell pairs C(c,2) at delta 0), "
    "so the order statistic is a bounded cumulative lookup. The "
    "median pairwise distance rides along. One scan + grid census; "
    "exact integers at any scale (consistency constant 2.2219 "
    "off-surface).",
)
def agg_rousseeuw_qn(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem", parallel=True)
    cells = li.select(
        F.round("l_quantity").cast("bigint").alias("v")
    ).groupBy("v").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    from mongodb_nats_connector_spark.plans.caching import (
        persist_until_collected,
    )

    tot = cells.agg(F.sum("c").cast("bigint").alias("n"))
    a, b = cells.alias("a"), cells.alias("b")
    dist = (
        a.join(F.broadcast(b), F.col("a.v") >= F.col("b.v"))
        .groupBy((F.col("a.v") - F.col("b.v")).alias("delta"))
        .agg(
            F.sum(
                F.when(
                    F.col("a.v") == F.col("b.v"),
                    F.expr("CAST(a.c AS DECIMAL(38,0)) * (a.c - 1) div 2"),
                ).otherwise(F.expr("CAST(a.c AS DECIMAL(38,0)) * b.c"))
            ).alias("pc")
        )
    )
    cum = dist.select(
        "delta", "pc",
        F.sum("pc").over(Window.orderBy("delta")).alias("cpc"),
    )
    ks = tot.select(
        "n",
        F.expr(
            "CAST((n div 2 + 1) AS DECIMAL(38,0)) * (n div 2) div 2"
        ).alias("k_qn"),
        F.expr(
            "(CAST(n AS DECIMAL(38,0)) * (n - 1) div 2 + 1) div 2"
        ).alias("k_med"),
    )
    qn = (
        cum.crossJoin(F.broadcast(ks))
        .filter(F.col("cpc") >= F.col("k_qn"))
        .agg(F.min("delta").cast("bigint").alias("qn_raw"))
    )
    med = (
        cum.crossJoin(F.broadcast(ks))
        .filter(F.col("cpc") >= F.col("k_med"))
        .agg(
            F.min("delta").cast("bigint").alias(
                "median_pairwise_distance"
            )
        )
    )
    out = (
        ks.crossJoin(F.broadcast(qn))
        .crossJoin(F.broadcast(med))
        .select(
            F.col("n").alias("n_rows"),
            F.col("k_qn").cast("bigint").alias("k_order"),
            "qn_raw",
            "median_pairwise_distance",
        )
    )
    return persist_until_collected(cells, out)


# ---------------------------------------------------------------------------
# agg_biweight_midvariance — Tukey biweight robust scale, fully cleared
# ---------------------------------------------------------------------------


@register(
    "agg_biweight_midvariance",
    oracle="""
    WITH b AS (
      SELECT CAST(round(l_quantity) AS BIGINT) AS v FROM lineitem
    ),
    cells AS (
      SELECT v, CAST(count(*) AS BIGINT) AS c FROM b GROUP BY v
    ),
    tot AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM cells),
    med AS (
      SELECT min(a.v) AS m FROM cells a, tot t
      WHERE (SELECT sum(bb.c) FROM cells bb WHERE bb.v <= a.v) * 2
            >= t.n + 1
    ),
    devs AS (
      SELECT abs(cells.v - med.m) AS av, CAST(sum(c) AS BIGINT) AS c
      FROM cells, med GROUP BY 1
    ),
    mad AS (
      SELECT min(a.av) AS mv FROM devs a, tot t
      WHERE (SELECT sum(bb.c) FROM devs bb WHERE bb.av <= a.av) * 2
            >= t.n + 1
    ),
    terms AS (
      SELECT t.n, med.m, mad.mv,
             CAST(sum(CASE WHEN (cells.v - med.m) * (cells.v - med.m)
                      < 81 * mad.mv * mad.mv
                  THEN CAST(cells.c AS HUGEINT)
                       * ((cells.v - med.m) * (cells.v - med.m))
                       * (81 * CAST(mad.mv AS HUGEINT) * mad.mv
                          - (cells.v - med.m) * (cells.v - med.m))
                       * (81 * CAST(mad.mv AS HUGEINT) * mad.mv
                          - (cells.v - med.m) * (cells.v - med.m))
                       * (81 * CAST(mad.mv AS HUGEINT) * mad.mv
                          - (cells.v - med.m) * (cells.v - med.m))
                       * (81 * CAST(mad.mv AS HUGEINT) * mad.mv
                          - (cells.v - med.m) * (cells.v - med.m))
                  ELSE 0 END) AS HUGEINT) AS num,
             CAST(sum(CASE WHEN (cells.v - med.m) * (cells.v - med.m)
                      < 81 * mad.mv * mad.mv
                  THEN CAST(cells.c AS HUGEINT)
                       * (81 * mad.mv * mad.mv
                          - (cells.v - med.m) * (cells.v - med.m))
                       * (81 * mad.mv * mad.mv
                          - 5 * (cells.v - med.m) * (cells.v - med.m))
                  ELSE 0 END) AS HUGEINT) AS den
      FROM cells, tot t, med, mad
      GROUP BY 1, 2, 3
    )
    SELECT CAST(n AS BIGINT) AS n_rows,
           CAST(m AS BIGINT) AS median_qty,
           CAST(mv AS BIGINT) AS mad_qty,
           CAST(1000 * ((n * num) // (den * den))
                + (1000 * ((n * num) % (den * den))) // (den * den)
                AS BIGINT) AS bwmv_milli
    FROM terms
    """,
    doc="Tukey biweight midvariance of line quantities: the smoothly-"
    "downweighting robust scale (84% Gaussian efficiency) completing "
    "the robust-scale ladder MAD (37%) -> Qn (82%, agg_rousseeuw_qn) "
    "-> BWMV — observations beyond 9 MAD get weight zero, inliers a "
    "quartic taper, so one corrupted shipment cannot move the spread "
    "estimate the classical variance would chase. The u = d/(9 MAD) "
    "rationals share the single denominator 81 MAD^2, which CANCELS "
    "between numerator and squared denominator: BWMV = n sum c d^2 "
    "(81M^2 - d^2)^4 / (sum c (81M^2 - d^2)(81M^2 - 5 d^2))^2 is "
    "EXACT integer arithmetic on the bounded quantity grid, milli-"
    "quantized through the overflow-safe split quantizer. Median and "
    "MAD come from grid cumulative self-joins (no data-proportional "
    "window); one scan + bounded grid reduces.",
)
def agg_biweight_midvariance(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem", parallel=True)
    cells = li.select(
        F.round("l_quantity").cast("bigint").alias("v")
    ).groupBy("v").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    from mongodb_nats_connector_spark.plans.caching import (
        persist_until_collected,
    )

    tot = cells.agg(F.sum("c").cast("bigint").alias("n"))

    def grid_median(m: DataFrame, col: str) -> DataFrame:
        a, b = m.alias("a"), m.alias("b")
        cum = (
            a.crossJoin(F.broadcast(b))
            .filter(F.col(f"b.{col}") <= F.col(f"a.{col}"))
            .groupBy(F.col(f"a.{col}").alias(col))
            .agg(F.sum(F.col("b.c")).cast("bigint").alias("cum"))
        )
        return (
            cum.crossJoin(F.broadcast(tot))
            .filter(F.col("cum") * 2 >= F.col("n") + 1)
            .agg(F.min(col).alias("m"))
        )

    med = grid_median(cells, "v")
    devs = (
        cells.crossJoin(F.broadcast(med))
        .groupBy(F.abs(F.col("v") - F.col("m")).alias("av"))
        .agg(F.sum("c").cast("bigint").alias("c"))
    )
    mad = grid_median(devs, "av").withColumnRenamed("m", "mv")
    d2 = "(CAST(v AS DECIMAL(38,0)) - m) * (v - m)"
    w = f"(81 * CAST(mv AS DECIMAL(38,0)) * mv - {d2})"
    terms = (
        cells.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(med))
        .crossJoin(F.broadcast(mad))
        .groupBy("n", "m", "mv")
        .agg(
            F.sum(
                F.expr(
                    f"CASE WHEN {d2} < 81 * CAST(mv AS DECIMAL(38,0)) * mv"
                    f" THEN CAST(c AS DECIMAL(38,0)) * {d2}"
                    f" * {w} * {w} * {w} * {w}"
                    " ELSE 0 END"
                )
            ).alias("num"),
            F.sum(
                F.expr(
                    f"CASE WHEN {d2} < 81 * CAST(mv AS DECIMAL(38,0)) * mv"
                    f" THEN CAST(c AS DECIMAL(38,0)) * {w}"
                    f" * (81 * CAST(mv AS DECIMAL(38,0)) * mv - 5 * {d2})"
                    " ELSE 0 END"
                )
            ).alias("den"),
        )
    )
    out = terms.select(
        F.col("n").cast("bigint").alias("n_rows"),
        F.col("m").cast("bigint").alias("median_qty"),
        F.col("mv").cast("bigint").alias("mad_qty"),
        F.expr(
            "CAST(1000 * ((n * num) div (den * den))"
            " + (1000 * ((n * num) % (den * den))) div (den * den)"
            " AS BIGINT)"
        ).alias("bwmv_milli"),
    )
    return persist_until_collected(cells, out)


# ---------------------------------------------------------------------------
# orders_quantile_trend — Theil-Sen on the monthly upper quantile
# ---------------------------------------------------------------------------


@register(
    "orders_quantile_trend",
    oracle="""
    WITH b AS (
      SELECT year(o_orderdate) * 12 + month(o_orderdate) AS ym,
             CAST(round(o_totalprice * 100) AS BIGINT) // 100 AS v
      FROM orders
    ),
    cells AS (
      SELECT ym, v, CAST(count(*) AS BIGINT) AS c FROM b GROUP BY 1, 2
    ),
    mtot AS (
      SELECT ym, CAST(sum(c) AS BIGINT) AS n FROM cells GROUP BY 1
    ),
    cum AS (
      SELECT ym, v,
             sum(c) OVER (PARTITION BY ym ORDER BY v
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND CURRENT ROW) AS cumc
      FROM cells
    ),
    q90 AS (
      SELECT cum.ym, min(cum.v) AS q
      FROM cum JOIN mtot t ON t.ym = cum.ym
      WHERE cum.cumc * 10 >= 9 * t.n
      GROUP BY 1
    ),
    slopes AS (
      SELECT (1000 * (b2.q - b1.q)) / (b2.ym - b1.ym) AS s_milli,
             row_number() OVER (ORDER BY
               (1000.0 * (b2.q - b1.q)) / (b2.ym - b1.ym),
               b1.ym, b2.ym) AS rn,
             count(*) OVER () AS np
      FROM q90 b1 JOIN q90 b2 ON b2.ym > b1.ym
    )
    SELECT CAST((SELECT count(*) FROM q90) AS BIGINT) AS n_months,
           CAST((SELECT max(np) FROM slopes) AS BIGINT) AS n_pairs,
           CAST((SELECT sum(CAST(floor(s_milli) AS BIGINT))
                 FROM slopes WHERE rn IN ((np + 1) // 2, (np + 2) // 2))
                / 2 AS BIGINT) AS median_slope_x2_floor
    FROM (SELECT 1)
    """,
    doc="Theil-Sen median slope of the MONTHLY 90th-PERCENTILE order "
    "value: is the premium segment growing — a trend the mean/median "
    "trends (agg_theil_sen fits values) cannot see when the body is "
    "flat but the tail drifts; the time-axis companion of "
    "orders_expected_shortfall's static tail report. Per-month P90s "
    "come from bounded dollar-grid cumulative self-joins; the slope "
    "set over bounded month PAIRS is ranked exactly (milli slopes "
    "floor-quantized per bounded pair cell; ties broken by month "
    "pair), and the median is the floor-average of the two middle "
    "order statistics. All grids calendar- or domain-bounded; one "
    "scan + bounded reduces.",
)
def orders_quantile_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders", parallel=True)
    b = o.select(
        (F.year("o_orderdate") * 12 + F.month("o_orderdate")).alias("ym"),
        F.expr(
            "CAST(round(o_totalprice * 100) AS BIGINT) div 100"
        ).alias("v"),
    )
    cells = b.groupBy("ym", "v").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    from mongodb_nats_connector_spark.plans.caching import (
        persist_until_collected,
    )

    mtot = cells.groupBy("ym").agg(F.sum("c").cast("bigint").alias("n"))
    # per-month prefix over the bounded dollar grid: a PARTITIONED window
    # (partition = one month's distinct dollar values, domain-bounded) —
    # the grid self-join this replaces was quadratic in grid size and
    # read 6 s at sf0.1 (r14 scale probe)
    cum = cells.select(
        "ym", "v",
        F.sum("c")
        .over(
            Window.partitionBy("ym")
            .orderBy("v")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        .cast("bigint")
        .alias("cumc"),
    )
    q90 = (
        cum.join(mtot, "ym")
        .filter(F.col("cumc") * 10 >= 9 * F.col("n"))
        .groupBy("ym")
        .agg(F.min("v").alias("q"))
    )
    b1, b2 = q90.alias("b1"), q90.alias("b2")
    slopes = (
        b1.join(F.broadcast(b2), F.col("b2.ym") > F.col("b1.ym"))
        .select(
            F.expr(
                "CAST(floor((1000.0 * (b2.q - b1.q)) / (b2.ym - b1.ym))"
                " AS BIGINT)"
            ).alias("s_milli"),
            F.col("b1.ym").alias("y1"),
            F.col("b2.ym").alias("y2"),
        )
        .select(
            "s_milli",
            F.row_number()
            .over(Window.orderBy("s_milli", "y1", "y2"))
            .alias("rn"),
            F.count(F.lit(1)).over(Window.partitionBy()).alias("np"),
        )
    )
    n_months = q90.agg(F.count(F.lit(1)).cast("bigint").alias("n_months"))
    medslope = slopes.filter(
        (F.col("rn") == F.expr("(np + 1) div 2"))
        | (F.col("rn") == F.expr("(np + 2) div 2"))
    ).agg(
        F.expr("CAST(sum(s_milli) div 2 AS BIGINT)").alias(
            "median_slope_x2_floor"
        ),
        F.max("np").cast("bigint").alias("n_pairs"),
    )
    out = n_months.crossJoin(F.broadcast(medslope)).select(
        "n_months", "n_pairs", "median_slope_x2_floor"
    )
    return persist_until_collected(cells, out)


# ---------------------------------------------------------------------------
# events_spectral_entropy — entropy of the hourly-profile power spectrum
# ---------------------------------------------------------------------------

# micro-scaled cos/sin literals for frequencies k = 1..8 over the 24-hour
# grid (round(1e6 * trig(2 pi k h / 24))): both engines consume the SAME
# integer tables, so no libm trig enters either plan (the
# orders_dft_annual_power discipline).
_SPEC_COS = (
    (1000000, 965926, 866025, 707107, 500000, 258819, 0, -258819, -500000, -707107, -866025, -965926, -1000000, -965926, -866025, -707107, -500000, -258819, 0, 258819, 500000, 707107, 866025, 965926,),
    (1000000, 866025, 500000, 0, -500000, -866025, -1000000, -866025, -500000, 0, 500000, 866025, 1000000, 866025, 500000, 0, -500000, -866025, -1000000, -866025, -500000, 0, 500000, 866025,),
    (1000000, 707107, 0, -707107, -1000000, -707107, 0, 707107, 1000000, 707107, 0, -707107, -1000000, -707107, 0, 707107, 1000000, 707107, 0, -707107, -1000000, -707107, 0, 707107,),
    (1000000, 500000, -500000, -1000000, -500000, 500000, 1000000, 500000, -500000, -1000000, -500000, 500000, 1000000, 500000, -500000, -1000000, -500000, 500000, 1000000, 500000, -500000, -1000000, -500000, 500000,),
    (1000000, 258819, -866025, -707107, 500000, 965926, 0, -965926, -500000, 707107, 866025, -258819, -1000000, -258819, 866025, 707107, -500000, -965926, 0, 965926, 500000, -707107, -866025, 258819,),
    (1000000, 0, -1000000, 0, 1000000, 0, -1000000, 0, 1000000, 0, -1000000, 0, 1000000, 0, -1000000, 0, 1000000, 0, -1000000, 0, 1000000, 0, -1000000, 0,),
    (1000000, -258819, -866025, 707107, 500000, -965926, 0, 965926, -500000, -707107, 866025, 258819, -1000000, 258819, 866025, -707107, -500000, 965926, 0, -965926, 500000, 707107, -866025, -258819,),
    (1000000, -500000, -500000, 1000000, -500000, -500000, 1000000, -500000, -500000, 1000000, -500000, -500000, 1000000, -500000, -500000, 1000000, -500000, -500000, 1000000, -500000, -500000, 1000000, -500000, -500000,)
)
_SPEC_SIN = (
    (0, 258819, 500000, 707107, 866025, 965926, 1000000, 965926, 866025, 707107, 500000, 258819, 0, -258819, -500000, -707107, -866025, -965926, -1000000, -965926, -866025, -707107, -500000, -258819,),
    (0, 500000, 866025, 1000000, 866025, 500000, 0, -500000, -866025, -1000000, -866025, -500000, 0, 500000, 866025, 1000000, 866025, 500000, 0, -500000, -866025, -1000000, -866025, -500000,),
    (0, 707107, 1000000, 707107, 0, -707107, -1000000, -707107, 0, 707107, 1000000, 707107, 0, -707107, -1000000, -707107, 0, 707107, 1000000, 707107, 0, -707107, -1000000, -707107,),
    (0, 866025, 866025, 0, -866025, -866025, 0, 866025, 866025, 0, -866025, -866025, 0, 866025, 866025, 0, -866025, -866025, 0, 866025, 866025, 0, -866025, -866025,),
    (0, 965926, 500000, -707107, -866025, 258819, 1000000, 258819, -866025, -707107, 500000, 965926, 0, -965926, -500000, 707107, 866025, -258819, -1000000, -258819, 866025, 707107, -500000, -965926,),
    (0, 1000000, 0, -1000000, 0, 1000000, 0, -1000000, 0, 1000000, 0, -1000000, 0, 1000000, 0, -1000000, 0, 1000000, 0, -1000000, 0, 1000000, 0, -1000000,),
    (0, 965926, -500000, -707107, 866025, 258819, -1000000, 258819, 866025, -707107, -500000, 965926, 0, -965926, 500000, 707107, -866025, -258819, 1000000, -258819, -866025, 707107, 500000, -965926,),
    (0, 866025, -866025, 0, 866025, -866025, 0, 866025, -866025, 0, 866025, -866025, 0, 866025, -866025, 0, 866025, -866025, 0, 866025, -866025, 0, 866025, -866025,)
)



@register(
    "events_spectral_entropy",
    oracle="""
    WITH h AS (
      SELECT CAST(hour(ts) AS BIGINT) AS hr, CAST(count(*) AS BIGINT) AS x
      FROM events WHERE ts IS NOT NULL GROUP BY 1
    ),
    ck AS (
      SELECT k.k,
             CAST(sum(h.x * ([[1000000, 965926, 866025, 707107, 500000, 258819, 0, -258819, -500000, -707107, -866025, -965926, -1000000, -965926, -866025, -707107, -500000, -258819, 0, 258819, 500000, 707107, 866025, 965926], [1000000, 866025, 500000, 0, -500000, -866025, -1000000, -866025, -500000, 0, 500000, 866025, 1000000, 866025, 500000, 0, -500000, -866025, -1000000, -866025, -500000, 0, 500000, 866025], [1000000, 707107, 0, -707107, -1000000, -707107, 0, 707107, 1000000, 707107, 0, -707107, -1000000, -707107, 0, 707107, 1000000, 707107, 0, -707107, -1000000, -707107, 0, 707107], [1000000, 500000, -500000, -1000000, -500000, 500000, 1000000, 500000, -500000, -1000000, -500000, 500000, 1000000, 500000, -500000, -1000000, -500000, 500000, 1000000, 500000, -500000, -1000000, -500000, 500000], [1000000, 258819, -866025, -707107, 500000, 965926, 0, -965926, -500000, 707107, 866025, -258819, -1000000, -258819, 866025, 707107, -500000, -965926, 0, 965926, 500000, -707107, -866025, 258819], [1000000, 0, -1000000, 0, 1000000, 0, -1000000, 0, 1000000, 0, -1000000, 0, 1000000, 0, -1000000, 0, 1000000, 0, -1000000, 0, 1000000, 0, -1000000, 0], [1000000, -258819, -866025, 707107, 500000, -965926, 0, 965926, -500000, -707107, 866025, 258819, -1000000, 258819, 866025, -707107, -500000, 965926, 0, -965926, 500000, 707107, -866025, -258819], [1000000, -500000, -500000, 1000000, -500000, -500000, 1000000, -500000, -500000, 1000000, -500000, -500000, 1000000, -500000, -500000, 1000000, -500000, -500000, 1000000, -500000, -500000, 1000000, -500000, -500000]])[k.k][h.hr + 1])
                  AS HUGEINT) AS cs,
             CAST(sum(h.x * ([[0, 258819, 500000, 707107, 866025, 965926, 1000000, 965926, 866025, 707107, 500000, 258819, 0, -258819, -500000, -707107, -866025, -965926, -1000000, -965926, -866025, -707107, -500000, -258819], [0, 500000, 866025, 1000000, 866025, 500000, 0, -500000, -866025, -1000000, -866025, -500000, 0, 500000, 866025, 1000000, 866025, 500000, 0, -500000, -866025, -1000000, -866025, -500000], [0, 707107, 1000000, 707107, 0, -707107, -1000000, -707107, 0, 707107, 1000000, 707107, 0, -707107, -1000000, -707107, 0, 707107, 1000000, 707107, 0, -707107, -1000000, -707107], [0, 866025, 866025, 0, -866025, -866025, 0, 866025, 866025, 0, -866025, -866025, 0, 866025, 866025, 0, -866025, -866025, 0, 866025, 866025, 0, -866025, -866025], [0, 965926, 500000, -707107, -866025, 258819, 1000000, 258819, -866025, -707107, 500000, 965926, 0, -965926, -500000, 707107, 866025, -258819, -1000000, -258819, 866025, 707107, -500000, -965926], [0, 1000000, 0, -1000000, 0, 1000000, 0, -1000000, 0, 1000000, 0, -1000000, 0, 1000000, 0, -1000000, 0, 1000000, 0, -1000000, 0, 1000000, 0, -1000000], [0, 965926, -500000, -707107, 866025, 258819, -1000000, 258819, 866025, -707107, -500000, 965926, 0, -965926, 500000, 707107, -866025, -258819, 1000000, -258819, -866025, 707107, 500000, -965926], [0, 866025, -866025, 0, 866025, -866025, 0, 866025, -866025, 0, 866025, -866025, 0, 866025, -866025, 0, 866025, -866025, 0, 866025, -866025, 0, 866025, -866025]])[k.k][h.hr + 1])
                  AS HUGEINT) AS sn
      FROM h, range(1, 9) k(k) GROUP BY 1
    ),
    pw AS (
      SELECT k, (cs // 1000000) * (cs // 1000000)
               + (sn // 1000000) * (sn // 1000000) AS p
      FROM ck
    ),
    tot AS (SELECT CAST(sum(p) AS HUGEINT) AS pt FROM pw),
    ent AS (
      SELECT CAST(sum(CASE WHEN pw.p > 0 THEN
               (1000000 * pw.p) // t.pt
               * CAST(floor(1000000.0 * ln(CAST(t.pt AS DOUBLE) / pw.p))
                      AS BIGINT)
             ELSE 0 END) AS HUGEINT) AS e_scaled,
             CAST(max(CASE WHEN pw.p = (SELECT max(p) FROM pw)
                  THEN pw.k END) AS BIGINT) AS peak_k
      FROM pw, tot t GROUP BY t.pt
    )
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM h) AS n_hours,
           (SELECT CAST(max(p) AS BIGINT) FROM pw) AS peak_power,
           peak_k AS dominant_frequency,
           CAST(e_scaled // 1000000 AS BIGINT) AS spectral_entropy_micro
    FROM ent
    """,
    doc="Spectral entropy of the 24-hour event-volume profile over "
    "harmonics k = 1..8: DFT power through SHARED micro-scaled "
    "integer cos/sin literal tables (no libm trig in either engine - "
    "the orders_dft_annual_power discipline), powers de-scaled to "
    "exact integers, and Shannon entropy of the normalized power "
    "distribution via ONE floor-quantized micro-nat ln of an exact "
    "integer ratio per bounded 8-frequency cell. Low entropy = one "
    "dominant periodicity (the circadian k=1 line), high = broadband "
    "activity; the frequency-domain complement of "
    "events_hourly_uniformity_chi2 (which only tests flatness) and "
    "events_circular_stats (first harmonic only). The dominant "
    "frequency rides along. One 24-cell rollup; bounded everything.",
)
def events_spectral_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events", parallel=True)
    h = (
        e.filter(F.col("ts").isNotNull())
        .groupBy(F.hour("ts").cast("bigint").alias("hr"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("x"))
    )
    cos_arr = (
        "array("
        + ", ".join(
            "array(" + ", ".join(str(v) + "L" for v in row) + ")"
            for row in _SPEC_COS
        )
        + ")"
    )
    sin_arr = (
        "array("
        + ", ".join(
            "array(" + ", ".join(str(v) + "L" for v in row) + ")"
            for row in _SPEC_SIN
        )
        + ")"
    )
    ks = spark.range(1, 9).select(F.col("id").cast("int").alias("k"))
    ck = (
        h.crossJoin(F.broadcast(ks))
        .groupBy("k")
        .agg(
            _dsum(
                F.expr(f"x * element_at(element_at({cos_arr}, k),"
                       " CAST(hr + 1 AS INT))")
            ).alias("cs"),
            _dsum(
                F.expr(f"x * element_at(element_at({sin_arr}, k),"
                       " CAST(hr + 1 AS INT))")
            ).alias("sn"),
        )
    )
    pw = ck.select(
        "k",
        F.expr(
            "(cs div 1000000) * (cs div 1000000)"
            " + (sn div 1000000) * (sn div 1000000)"
        ).alias("p"),
    )
    from mongodb_nats_connector_spark.plans.caching import (
        persist_until_collected,
    )

    tot = pw.agg(F.sum("p").cast("decimal(38,0)").alias("pt"))
    mx = pw.agg(F.max("p").alias("pmax"))
    ent = (
        pw.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(mx))
        .agg(
            _dsum(
                F.expr(
                    "CASE WHEN p > 0 THEN"
                    " ((1000000 * CAST(p AS DECIMAL(38,0))) div pt)"
                    " * CAST(floor(1000000.0 * ln(CAST(pt AS DOUBLE) / p))"
                    " AS BIGINT) ELSE 0 END"
                )
            ).alias("e_scaled"),
            F.max(
                F.when(F.col("p") == F.col("pmax"), F.col("k"))
            ).cast("bigint").alias("peak_k"),
        )
    )
    n_hours = h.agg(F.count(F.lit(1)).cast("bigint").alias("n_hours"))
    out = (
        n_hours.crossJoin(F.broadcast(mx))
        .crossJoin(F.broadcast(ent))
        .select(
            "n_hours",
            F.col("pmax").cast("bigint").alias("peak_power"),
            F.col("peak_k").alias("dominant_frequency"),
            F.expr(
                "CAST(e_scaled div 1000000 AS BIGINT)"
            ).alias("spectral_entropy_micro"),
        )
    )
    return persist_until_collected(pw, out)


# ---------------------------------------------------------------------------
# events_ordpattern_transitions — ordinal-pattern transition entropy
# ---------------------------------------------------------------------------


@register(
    "events_ordpattern_transitions",
    oracle="""
    WITH d AS (
      SELECT CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS x
      FROM events WHERE ts IS NOT NULL GROUP BY 1
    ),
    tri AS (
      SELECT a.day,
             CASE
               WHEN a.x <= b.x AND b.x <= c.x THEN 0
               WHEN a.x <= c.x AND c.x < b.x THEN 1
               WHEN b.x < a.x AND a.x <= c.x THEN 2
               WHEN b.x <= c.x AND c.x < a.x THEN 3
               WHEN c.x < a.x AND a.x <= b.x THEN 4
               ELSE 5
             END AS pat
      FROM d a JOIN d b ON b.day = a.day + 1
               JOIN d c ON c.day = a.day + 2
    ),
    pairs AS (
      SELECT t1.pat AS p1, t2.pat AS p2, CAST(count(*) AS BIGINT) AS c
      FROM tri t1 JOIN tri t2 ON t2.day = t1.day + 1
      GROUP BY 1, 2
    ),
    tot AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM pairs),
    ent AS (
      SELECT CAST(sum(p.c * CAST(floor(1000000.0 *
               ln(CAST(t.n AS DOUBLE) / p.c)) AS BIGINT)) AS HUGEINT)
               AS hn
      FROM pairs p, tot t
    )
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM tri) AS n_patterns,
           (SELECT CAST(count(*) AS BIGINT) FROM pairs)
             AS n_distinct_transitions,
           tot.n AS n_transitions,
           CAST(ent.hn // tot.n AS BIGINT) AS transition_entropy_micro
    FROM tot, ent
    """,
    doc="Ordinal-pattern TRANSITION entropy of the daily series: map "
    "each consecutive day-triple to its order-3 permutation pattern "
    "(6 classes, ties broken toward ascending — documented), then "
    "measure the Shannon entropy of consecutive PATTERN PAIRS — the "
    "transition-network statistic that detects temporal structure "
    "events_permutation_entropy's marginal distribution cannot (a "
    "series can have uniform pattern frequencies yet deterministic "
    "pattern SEQUENCING). Patterns via calendar-bounded self-joins "
    "(gap days break triples naturally); entropy as one floor-"
    "quantized micro-nat ln per bounded <=36-cell transition census. "
    "One rollup + bounded joins.",
)
def events_ordpattern_transitions(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    e = table(spark, sf_dir, "events", parallel=True)
    d = (
        e.filter(F.col("ts").isNotNull())
        .groupBy(F.col("ts").cast("date").alias("day"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("x"))
    )
    from mongodb_nats_connector_spark.plans.caching import (
        persist_until_collected,
    )

    a, b, c = d.alias("a"), d.alias("b"), d.alias("c")
    tri = (
        a.join(F.broadcast(b), F.col("b.day") == F.expr("date_add(a.day, 1)"))
        .join(F.broadcast(c), F.col("c.day") == F.expr("date_add(a.day, 2)"))
        .select(
            F.col("a.day").alias("day"),
            F.expr(
                "CASE"
                " WHEN a.x <= b.x AND b.x <= c.x THEN 0"
                " WHEN a.x <= c.x AND c.x < b.x THEN 1"
                " WHEN b.x < a.x AND a.x <= c.x THEN 2"
                " WHEN b.x <= c.x AND c.x < a.x THEN 3"
                " WHEN c.x < a.x AND a.x <= b.x THEN 4"
                " ELSE 5 END"
            ).alias("pat"),
        )
    )
    t1, t2 = tri.alias("t1"), tri.alias("t2")
    pairs = (
        t1.join(
            F.broadcast(t2),
            F.col("t2.day") == F.expr("date_add(t1.day, 1)"),
        )
        .groupBy(F.col("t1.pat").alias("p1"), F.col("t2.pat").alias("p2"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    tot = pairs.agg(F.sum("c").cast("bigint").alias("n"))
    ent = pairs.crossJoin(F.broadcast(tot)).agg(
        _dsum(
            F.expr(
                "c * CAST(floor(1000000.0 * ln(CAST(n AS DOUBLE) / c))"
                " AS BIGINT)"
            )
        ).alias("hn")
    )
    n_pat = tri.agg(F.count(F.lit(1)).cast("bigint").alias("n_patterns"))
    n_dist = pairs.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_distinct_transitions")
    )
    out = (
        n_pat.crossJoin(F.broadcast(n_dist))
        .crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(ent))
        .select(
            "n_patterns",
            "n_distinct_transitions",
            F.col("n").alias("n_transitions"),
            F.expr("CAST(hn div n AS BIGINT)").alias(
                "transition_entropy_micro"
            ),
        )
    )
    return persist_until_collected(tri, out)


# ---------------------------------------------------------------------------
# events_peak_prominence — topographic prominence of daily-volume peaks
# ---------------------------------------------------------------------------


@register(
    "events_peak_prominence",
    oracle="""
    WITH d AS (
      SELECT CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS x
      FROM events WHERE ts IS NOT NULL GROUP BY 1
    ),
    peaks AS (
      SELECT a.day, a.x FROM d a
      WHERE coalesce((SELECT x FROM d l WHERE l.day = a.day - 1), -1) < a.x
        AND coalesce((SELECT x FROM d r WHERE r.day = a.day + 1), -1) < a.x
    ),
    prom AS (
      SELECT p.day, p.x,
             p.x - greatest(
               coalesce((SELECT min(d2.x) FROM d d2
                 WHERE d2.day < p.day AND d2.day >
                   coalesce((SELECT max(h.day) FROM d h
                     WHERE h.day < p.day AND h.x > p.x), DATE '1900-01-01')
               ), 0),
               coalesce((SELECT min(d2.x) FROM d d2
                 WHERE d2.day > p.day AND d2.day <
                   coalesce((SELECT min(h.day) FROM d h
                     WHERE h.day > p.day AND h.x > p.x), DATE '2999-12-31')
               ), 0)
             ) AS prominence
      FROM peaks p
    )
    SELECT CAST((SELECT count(*) FROM peaks) AS BIGINT) AS n_peaks,
           CAST(max(prominence) AS BIGINT) AS max_prominence,
           CAST(sum(prominence) AS BIGINT) AS prominence_sum,
           CAST(max(x) AS BIGINT) AS tallest_peak
    FROM prom
    """,
    doc="Topographic prominence of daily-volume peaks: for each strict "
    "local maximum, prominence = height minus the higher of the two "
    "key saddles (the minimum on the path toward the nearest "
    "higher ground on each side, the series edge counting as ground "
    "0) — the peak-RANKING measure that separates genuine traffic "
    "events from ripples riding a trend, which threshold pickers "
    "(events_peak_over_threshold) and changepoint tests cannot do. "
    "All saddle lookups are calendar-bounded census joins (exact "
    "integers, no windows); emits peak count, max/sum prominence and "
    "the tallest peak for calibration.",
)
def events_peak_prominence(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events", parallel=True)
    d = (
        e.filter(F.col("ts").isNotNull())
        .groupBy(F.col("ts").cast("date").alias("day"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("x"))
    )
    from mongodb_nats_connector_spark.plans.caching import (
        persist_until_collected,
    )

    a, l, r = d.alias("a"), d.alias("l"), d.alias("r")
    peaks = (
        a.join(
            F.broadcast(l),
            F.col("l.day") == F.expr("date_add(a.day, -1)"),
            "left",
        )
        .join(
            F.broadcast(r),
            F.col("r.day") == F.expr("date_add(a.day, 1)"),
            "left",
        )
        .filter(
            (F.coalesce(F.col("l.x"), F.lit(-1)) < F.col("a.x"))
            & (F.coalesce(F.col("r.x"), F.lit(-1)) < F.col("a.x"))
        )
        .select(F.col("a.day").alias("pday"), F.col("a.x").alias("px"))
    )
    # nearest higher ground on each side (NULL -> series edge)
    h = d.alias("h")
    left_higher = (
        peaks.join(
            F.broadcast(h),
            (F.col("h.day") < F.col("pday"))
            & (F.col("h.x") > F.col("px")),
            "left",
        )
        .groupBy("pday", "px")
        .agg(F.max(F.col("h.day")).alias("lh"))
    )
    right_higher = (
        peaks.join(
            F.broadcast(h),
            (F.col("h.day") > F.col("pday"))
            & (F.col("h.x") > F.col("px")),
            "left",
        )
        .groupBy("pday", "px")
        .agg(F.min(F.col("h.day")).alias("rh"))
    )
    d2 = d.alias("d2")
    left_saddle = (
        left_higher.join(
            F.broadcast(d2),
            (F.col("d2.day") < F.col("pday"))
            & (
                F.col("lh").isNull()
                | (F.col("d2.day") > F.col("lh"))
            ),
            "left",
        )
        .groupBy("pday", "px")
        .agg(F.coalesce(F.min(F.col("d2.x")), F.lit(0)).alias("ls"))
    )
    right_saddle = (
        right_higher.join(
            F.broadcast(d2),
            (F.col("d2.day") > F.col("pday"))
            & (
                F.col("rh").isNull()
                | (F.col("d2.day") < F.col("rh"))
            ),
            "left",
        )
        .groupBy("pday", "px")
        .agg(F.coalesce(F.min(F.col("d2.x")), F.lit(0)).alias("rs"))
    )
    prom = (
        left_saddle.join(right_saddle, ["pday", "px"])
        .select(
            "pday", "px",
            (F.col("px") - F.greatest("ls", "rs")).alias("prominence"),
        )
    )
    n_peaks = peaks.agg(F.count(F.lit(1)).cast("bigint").alias("n_peaks"))
    s = prom.agg(
        F.max("prominence").cast("bigint").alias("max_prominence"),
        F.sum("prominence").cast("bigint").alias("prominence_sum"),
        F.max("px").cast("bigint").alias("tallest_peak"),
    )
    out = n_peaks.crossJoin(F.broadcast(s)).select(
        "n_peaks", "max_prominence", "prominence_sum", "tallest_peak"
    )
    return persist_until_collected(d, out)


# ---------------------------------------------------------------------------
# agg_shapley_r2 — Shapley decomposition of explained variance
# ---------------------------------------------------------------------------


@register(
    "agg_shapley_r2",
    oracle="""
    WITH base AS (
      SELECT CAST(round(l_extendedprice * 100) AS BIGINT) // 100 AS y,
             CAST(round(l_quantity) AS BIGINT) AS z,
             CAST(round(l_discount * 100) AS BIGINT) AS w
      FROM lineitem
    ),
    mo AS (
      SELECT CAST(count(*) AS HUGEINT) AS n,
             CAST(sum(y) AS HUGEINT) AS sy,
             CAST(sum(z) AS HUGEINT) AS sz,
             CAST(sum(w) AS HUGEINT) AS sw,
             CAST(sum(CAST(y AS HUGEINT) * y) AS HUGEINT) AS syy,
             CAST(sum(z * z) AS HUGEINT) AS szz,
             CAST(sum(w * w) AS HUGEINT) AS sww,
             CAST(sum(CAST(y AS HUGEINT) * z) AS HUGEINT) AS syz,
             CAST(sum(CAST(y AS HUGEINT) * w) AS HUGEINT) AS syw,
             CAST(sum(z * w) AS HUGEINT) AS szw
      FROM base
    ),
    c AS (
      SELECT n * syy - sy * sy AS cyy,
             n * szz - sz * sz AS dzz,
             n * sww - sw * sw AS dww,
             n * syz - sy * sz AS nyz,
             n * syw - sy * sw AS nyw,
             n * szw - sz * sw AS czw
      FROM mo
    ),
    mic AS (
      SELECT (1000000 * cyy) // (n2.nn) AS vyy,
             (1000000 * dzz) // (n2.nn) AS vzz,
             (1000000 * dww) // (n2.nn) AS vww,
             CASE WHEN nyz >= 0 THEN (1000000 * nyz) // n2.nn
                  ELSE -((1000000 * (-nyz)) // n2.nn) END AS uyz,
             CASE WHEN nyw >= 0 THEN (1000000 * nyw) // n2.nn
                  ELSE -((1000000 * (-nyw)) // n2.nn) END AS uyw,
             CASE WHEN czw >= 0 THEN (1000000 * czw) // n2.nn
                  ELSE -((1000000 * (-czw)) // n2.nn) END AS uzw
      FROM c, (SELECT n * n AS nn FROM mo) n2
    ),
    r2 AS (
      SELECT (1000000 * uyz * uyz) // greatest(vyy * vzz, 1) AS r2z,
             (1000000 * uyw * uyw) // greatest(vyy * vww, 1) AS r2w,
             (1000000 * (uyz * uyz * vww + uyw * uyw * vzz
                         - 2 * uyz * uyw * uzw))
               // greatest(vyy * (vzz * vww - uzw * uzw), 1) AS r2zw
      FROM mic
    )
    SELECT CAST(r2z AS BIGINT) AS r2_qty_ppm,
           CAST(r2w AS BIGINT) AS r2_disc_ppm,
           CAST(r2zw AS BIGINT) AS r2_both_ppm,
           CAST((r2z + r2zw - r2w) // 2 AS BIGINT) AS shapley_qty_ppm,
           CAST((r2w + r2zw - r2z) // 2 AS BIGINT) AS shapley_disc_ppm
    FROM r2
    """,
    doc="Shapley decomposition of the R^2 of extended price on quantity "
    "and discount: each regressor's Shapley value averages its "
    "marginal R^2 contribution over both entry orders — phi_z = "
    "(R2({z}) + R2({z,w}) - R2({w}))/2 — the game-theoretic "
    "attribution (the linear-model exact case of SHAP) that "
    "agg_partial_corr and orders_ols_multifactor's raw coefficients "
    "cannot provide when regressors correlate: the two Shapley "
    "shares sum EXACTLY to the joint R^2 by construction. All three "
    "R^2 values are closed-form ppm ratios of HUGEINT-widened "
    "centered moments (the 2x2 determinant expansion); the Shapley "
    "combination is integer arithmetic on the quantized ppms "
    "(documented second layer). One scan, map-side combine to one "
    "row.",
)
def agg_shapley_r2(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem", parallel=True)
    base = li.select(
        F.expr(
            "CAST(round(l_extendedprice * 100) AS BIGINT) div 100"
        ).alias("y"),
        F.round("l_quantity").cast("bigint").alias("z"),
        F.round(F.col("l_discount") * 100).cast("bigint").alias("w"),
    )
    mo = base.agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        _dsum(F.col("y")).alias("sy"),
        _dsum(F.col("z")).alias("sz"),
        _dsum(F.col("w")).alias("sw"),
        _dsum(F.col("y").cast("decimal(38,0)") * F.col("y")).alias("syy"),
        _dsum(F.col("z") * F.col("z")).alias("szz"),
        _dsum(F.col("w") * F.col("w")).alias("sww"),
        _dsum(F.col("y").cast("decimal(38,0)") * F.col("z")).alias("syz"),
        _dsum(F.col("y").cast("decimal(38,0)") * F.col("w")).alias("syw"),
        _dsum(F.col("z") * F.col("w")).alias("szw"),
    )
    c = mo.select(
        F.expr("n * syy - sy * sy").alias("cyy"),
        F.expr("n * szz - sz * sz").alias("dzz"),
        F.expr("n * sww - sw * sw").alias("dww"),
        F.expr("n * syz - sy * sz").alias("nyz"),
        F.expr("n * syw - sy * sw").alias("nyw"),
        F.expr("n * szw - sz * sw").alias("czw"),
    )
    # SCALE-STABLE micro moments: each variance/covariance is quantized
    # at 1e6/n^2 scale (sign-split for the covariances), so every later
    # product is SF-INDEPENDENT and fits int64/DECIMAL at any scale —
    # the naive cleared triple products overflow DECIMAL(38,0) already
    # at sf0.001, and pre-divided intermediates exceed Spark's silent
    # int64 div-result wrap (hazard #4). One documented quantizer layer.
    sgn = (
        "CASE WHEN {v} >= 0 THEN (1000000 * {v}) div nn"
        " ELSE -((1000000 * (-({v}))) div nn) END"
    )
    mic = c.crossJoin(
        F.broadcast(mo.select(F.expr("n * n").alias("nn")))
    ).select(
        F.expr("(1000000 * cyy) div nn").alias("vyy"),
        F.expr("(1000000 * dzz) div nn").alias("vzz"),
        F.expr("(1000000 * dww) div nn").alias("vww"),
        F.expr(sgn.format(v="nyz")).alias("uyz"),
        F.expr(sgn.format(v="nyw")).alias("uyw"),
        F.expr(sgn.format(v="czw")).alias("uzw"),
    )
    dec = lambda col: F.col(col).cast("decimal(38,0)")
    mic = mic.select(*[dec(c_).alias(c_) for c_ in
                       ("vyy", "vzz", "vww", "uyz", "uyw", "uzw")])
    r2 = mic.select(
        F.expr(
            "(1000000 * uyz * uyz) div greatest(vyy * vzz, 1)"
        ).alias("r2z"),
        F.expr(
            "(1000000 * uyw * uyw) div greatest(vyy * vww, 1)"
        ).alias("r2w"),
        F.expr(
            "(1000000 * (uyz * uyz * vww + uyw * uyw * vzz"
            " - 2 * uyz * uyw * uzw))"
            " div greatest(vyy * (vzz * vww - uzw * uzw), 1)"
        ).alias("r2zw"),
    )
    return r2.select(
        F.col("r2z").cast("bigint").alias("r2_qty_ppm"),
        F.col("r2w").cast("bigint").alias("r2_disc_ppm"),
        F.col("r2zw").cast("bigint").alias("r2_both_ppm"),
        F.expr("CAST((r2z + r2zw - r2w) div 2 AS BIGINT)").alias(
            "shapley_qty_ppm"
        ),
        F.expr("CAST((r2w + r2zw - r2z) div 2 AS BIGINT)").alias(
            "shapley_disc_ppm"
        ),
    )


# ---------------------------------------------------------------------------
# agg_ratio_estimator_ci — delta-method variance of the ratio estimator
# ---------------------------------------------------------------------------


@register(
    "agg_ratio_estimator_ci",
    oracle="""
    WITH base AS (
      SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS y,
             CAST(round(l_quantity) AS BIGINT) AS x
      FROM lineitem
    ),
    mo AS (
      SELECT CAST(count(*) AS HUGEINT) AS n,
             CAST(sum(y) AS HUGEINT) AS sy,
             CAST(sum(x) AS HUGEINT) AS sx,
             CAST(sum(CAST(y AS HUGEINT) * y) AS HUGEINT) AS syy,
             CAST(sum(x * x) AS HUGEINT) AS sxx,
             CAST(sum(CAST(y AS HUGEINT) * x) AS HUGEINT) AS sxy
      FROM base
    )
    SELECT CAST(n AS BIGINT) AS n_rows,
           CAST((1000 * sy) // sx AS BIGINT) AS ratio_milli,
           CAST((1000000 * (n * syy - sy * sy)
                 - 2000 * ((1000 * sy) // sx) * (n * sxy - sy * sx)
                 + ((1000 * sy) // sx) * ((1000 * sy) // sx)
                   * (n * sxx - sx * sx))
                // greatest(n * sx * sx, 1) AS BIGINT)
             AS var_ratio_scaled
    FROM mo
    """,
    doc="Delta-method variance of the ratio estimator R = sum y / sum x "
    "(average unit price as total revenue over total quantity — the "
    "RATIO estimator survey statistics uses when x is a known size "
    "measure): var(R) ~ (S_yy - 2 R S_xy + R^2 S_xx) / (n xbar^2), "
    "the uncertainty companion to sample_horvitz_thompson's point "
    "estimate — an estimate without its delta-method variance is not "
    "reportable. R is milli-quantized once (single floor), then the "
    "variance numerator combines exact HUGEINT centered moments with "
    "the quantized R (documented two-layer floor; the /1000 and "
    "/1000000 de-scalings are exact integer divisions of "
    "already-scaled terms). One scan, map-side combine to one row.",
)
def agg_ratio_estimator_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem", parallel=True)
    base = li.select(
        F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("y"),
        F.round("l_quantity").cast("bigint").alias("x"),
    )
    mo = base.agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        _dsum(F.col("y")).alias("sy"),
        _dsum(F.col("x")).alias("sx"),
        _dsum(F.col("y").cast("decimal(38,0)") * F.col("y")).alias("syy"),
        _dsum(F.col("x") * F.col("x")).alias("sxx"),
        _dsum(F.col("y").cast("decimal(38,0)") * F.col("x")).alias("sxy"),
    )
    return mo.select(
        F.col("n").cast("bigint").alias("n_rows"),
        F.expr("CAST((1000 * sy) div sx AS BIGINT)").alias("ratio_milli"),
        # single common 1e6 denominator, NO intermediate div: a div whose
        # RESULT exceeds int64 silently wraps in Spark (hazard #4), which
        # the first draft hit on the de-scaled R^2 S_xx term
        F.expr(
            "CAST((1000000 * (n * syy - sy * sy)"
            " - 2000 * ((1000 * sy) div sx) * (n * sxy - sy * sx)"
            " + ((1000 * sy) div sx) * ((1000 * sy) div sx)"
            " * (n * sxx - sx * sx))"
            " div greatest(n * sx * sx, 1) AS BIGINT)"
        ).alias("var_ratio_scaled"),
    )


# ---------------------------------------------------------------------------
# multimodal_tar_ustar_parse — POSIX ustar archive with a live checksum
# ---------------------------------------------------------------------------

# sum of every FIXED header byte: 'doc' + '.txt', mode/uid/gid octals,
# zero mtime, the 8-space checksum placeholder, typeflag '0', the
# "ustar\\0" magic and "00" version (pinned against a constructed header
# in tests/test_round22.py)
_TAR_FIXED_SUM = 3217
# 8^10 .. 8^0 for the 11-digit octal size field
_OCT_POWS = "array(1073741824, 134217728, 16777216, 2097152, 262144, " \
    "32768, 4096, 512, 64, 8, 1)"


@register(
    "multimodal_tar_ustar_parse",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, 100 + doc_id % 900 AS n FROM documents
    ),
    cks AS (
      SELECT doc_id, n,
             {_TAR_FIXED_SUM}
             + 48 * length(CAST(doc_id AS VARCHAR))
             + CAST(list_sum(list_transform(
                 range(1, length(CAST(doc_id AS VARCHAR)) + 1),
                 p -> CAST(substr(CAST(doc_id AS VARCHAR), p, 1)
                           AS BIGINT))) AS BIGINT)
             + 48 * 11
             + CAST(list_sum(list_transform(range(0, 11),
                 p -> (n // ([1073741824, 134217728, 16777216, 2097152,
                              262144, 32768, 4096, 512, 64, 8, 1])[p + 1])
                      % 8)) AS BIGINT) AS checksum
      FROM d
    )
    SELECT doc_id,
           CAST(n AS BIGINT) AS member_size,
           CAST(checksum AS BIGINT) AS header_checksum,
           CAST(list_sum(list_transform(range(0, n),
                i -> (doc_id * 3 + i * 11) % 256)) AS BIGINT)
             AS content_sum,
           CAST(list_sum(list_transform(range(0, n),
                i -> (i + 1) * ((doc_id * 3 + i * 11) % 256)))
                AS BIGINT) AS content_checksum
    FROM cks
    ORDER BY doc_id
    """,
    doc="POSIX ustar archive parsing through the REAL stdlib tarfile "
    "module: per doc, compose a complete single-member tar archive as "
    "column expressions — the 512-byte ustar header with name, octal "
    "mode/size/mtime fields and the LIVE header checksum (sum of all "
    "header bytes with the checksum field as spaces) computed "
    "ARITHMETICALLY column-side from the fixed-byte constant plus the "
    "doc-id decimal digit sum and the 11-digit octal size digit sum — "
    "then parse with tarfile, which VALIDATES that checksum before "
    "yielding the member (a wrong sum is a typed NULL miss, the "
    "adler32/zlib pattern for archives). Content bytes and their "
    "weighted checksum are predicted by the oracle from the "
    "generation formula. The archive-container capstone of the "
    "multimodal axis (zip walks the grammar; tar validates an "
    "arithmetic integrity field). Map-only; zero shuffles at any "
    "scale.",
)
def multimodal_tar_ustar_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mongodb_nats_connector_spark.operators.multimodal import (
        TAR_SCHEMA,
        _tar_batches,
    )

    d = table(spark, sf_dir, "documents", parallel=True).select(
        "doc_id", (F.lit(100) + F.col("doc_id") % 900).alias("n")
    )
    cks = (
        f"{_TAR_FIXED_SUM}"
        " + 48 * length(CAST(doc_id AS STRING))"
        " + aggregate(sequence(1, length(CAST(doc_id AS STRING))),"
        "   CAST(0 AS BIGINT), (a, p) -> a +"
        "   CAST(substr(CAST(doc_id AS STRING), p, 1) AS BIGINT))"
        " + 48 * 11"
        f" + aggregate(sequence(0, 10), CAST(0 AS BIGINT), (a, p) ->"
        f"   a + (n div element_at({_OCT_POWS}, p + 1)) % 8)"
    )
    oct11 = (
        f"concat_ws('', transform(sequence(0, 10), p -> lpad(hex("
        f"48 + (n div element_at({_OCT_POWS}, p + 1)) % 8), 2, '0')))"
    )
    oct6_cks = (
        "concat_ws('', transform(sequence(0, 5), p -> lpad(hex("
        "48 + (cks div element_at(array(32768, 4096, 512, 64, 8, 1),"
        " p + 1)) % 8), 2, '0')))"
    )
    content_hex = F.expr(
        "rpad(concat_ws('', transform(sequence(0, n - 1), i ->"
        " lpad(hex((doc_id * 3 + i * 11) % 256), 2, '0'))),"
        " CAST(((n + 511) div 512) * 1024 AS INT), '0')"
    )
    header_hex = F.expr(
        "concat("
        " rpad(hex(concat('doc', CAST(doc_id AS STRING), '.txt')),"
        "      200, '0'),"                      # name, NUL-padded
        " hex('0000644'), '00',"                # mode
        " hex('0000000'), '00',"                # uid
        " hex('0000000'), '00',"                # gid
        f" {oct11}, '00',"                      # size octal + NUL
        " hex('00000000000'), '00',"            # mtime octal + NUL
        f" {oct6_cks}, '0020',"                 # checksum + NUL + space
        " hex('0'),"                            # typeflag
        " repeat('00', 100),"                   # linkname
        " hex('ustar'), '00', hex('00'),"       # magic + version
        " repeat('00', 247))"                   # remaining fields
    )
    payload_hex = F.concat(
        header_hex, content_hex, F.lit("00" * 1024)
    )
    return (
        d.withColumn("cks", F.expr(cks))
        .select("doc_id", F.unhex(payload_hex).alias("payload"))
        .mapInPandas(_tar_batches, TAR_SCHEMA)
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# multimodal_base32_decode — RFC 4648 base32 through the stdlib codec
# ---------------------------------------------------------------------------


@register(
    "multimodal_base32_decode",
    oracle="""
    WITH d AS (
      SELECT doc_id, 10 + doc_id % 9 AS n FROM documents
    ),
    pred AS (
      SELECT doc_id, n,
             list_transform(range(0, n),
                            i -> (doc_id * 19 + i * 23) % 256) AS bs
      FROM d
    )
    SELECT doc_id,
           CAST(n AS BIGINT) AS n_bytes,
           CAST(list_sum(bs) AS BIGINT) AS byte_sum,
           CAST(list_sum(list_transform(range(0, n),
                i -> (i + 1) * bs[i + 1])) AS BIGINT) AS stream_checksum
    FROM pred
    ORDER BY doc_id
    """,
    doc="RFC 4648 base32 decoding through the REAL stdlib codec: the "
    "column side ENCODES the formula bytes itself — each 5-byte group "
    "becomes a 40-bit integer sliced into eight 5-bit alphabet "
    "indices, with the exact '=' padding table for the five partial-"
    "group layouts (n mod 5 spans all five across docs) — and "
    "base64.b32decode in STRICT mode decodes it back; any slip in "
    "bit packing, alphabet or padding raises and becomes a typed NULL "
    "miss. The oracle predicts the decoded bytes from the generation "
    "formula, never seeing base32. Completes the text-transport axis "
    "(UTF-8 validation covers the character layer; this covers the "
    "binary-to-text armor layer used by tokens/keys in real corpora). "
    "Map-only; zero shuffles at any scale.",
)
def multimodal_base32_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mongodb_nats_connector_spark.operators.multimodal import (
        BASE32_SCHEMA,
        _base32_batches,
    )

    d = table(spark, sf_dir, "documents", parallel=True).select(
        "doc_id", (F.lit(10) + F.col("doc_id") % 9).alias("n")
    )
    byte_f = "((doc_id * 19 + ({i}) * 23) % 256)"
    # 40-bit group value: bytes g*5 .. g*5+4, zero-padded past n
    bits = (
        "("
        + " + ".join(
            f"(CASE WHEN g * 5 + {j} < n THEN "
            + byte_f.format(i=f"g * 5 + {j}")
            + f" ELSE 0 END) * {256 ** (4 - j)}"
            for j in range(5)
        )
        + ")"
    )
    # chars kept per partial-group length: 1->2, 2->4, 3->5, 4->7, 5->8
    keep = (
        "(CASE least(n - g * 5, 5)"
        " WHEN 1 THEN 2 WHEN 2 THEN 4 WHEN 3 THEN 5 WHEN 4 THEN 7"
        " ELSE 8 END)"
    )
    text32 = F.expr(
        "concat_ws('', transform(sequence(0, (n + 4) div 5 - 1), g ->"
        " concat("
        "  concat_ws('', transform(sequence(0, 7), j ->"
        f"   CASE WHEN j < {keep} THEN"
        f"    substr('ABCDEFGHIJKLMNOPQRSTUVWXYZ234567',"
        f"     CAST(({bits} div"
        "      element_at(array(34359738368, 1073741824, 33554432,"
        "       1048576, 32768, 1024, 32, 1), CAST(j + 1 AS INT))) % 32"
        "      AS INT) + 1, 1)"
        "    ELSE '' END)),"
        f"  repeat('=', 8 - {keep}))))"
    )
    return (
        d.select("doc_id", text32.alias("text32"))
        .mapInPandas(_base32_batches, BASE32_SCHEMA)
        .orderBy("doc_id")
    )
