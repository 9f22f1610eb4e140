"""Round-15 bank (seed): loaded by ``registry._load_deferred()`` AFTER
pipeline20 — round 14's window is exactly filled by pipeline20's 50
operators, so these queue one further round out, fully linted and
identity-pinned from day one like every earlier tranche.

Reference provenance: like pipeline7-20, none of these operators exist in
the reference's Go core (a MongoDB change-stream -> NATS connector,
/root/reference/internal/mongo/client.go) — they extend the engine-side
analytics surface documented in SURVEY.md §2.3/§2.4.

Cross-engine determinism rules: the pipeline11-20 discipline — exact
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

from mongodb_nats_connector_spark.operators.pipeline20 import (
    _dsum,
    _hex_le16,
    _hex_le32,
)
from mongodb_nats_connector_spark.registry import register
from mongodb_nats_connector_spark.sources.tables import table


# ---------------------------------------------------------------------------
# text_witten_bell — Witten-Bell smoothing panel per language
# ---------------------------------------------------------------------------


@register(
    "text_witten_bell",
    oracle="""
    WITH w AS (
      SELECT lang, unnest(string_split(text, ' ')) AS word
      FROM documents
    ),
    wc AS (
      SELECT lang, word, CAST(count(*) AS BIGINT) AS c
      FROM w GROUP BY 1, 2
    ),
    s AS (
      SELECT lang,
             CAST(count(*) AS BIGINT) AS t,
             CAST(sum(c) AS BIGINT) AS n,
             CAST(max(c) AS BIGINT) AS cmax
      FROM wc GROUP BY 1
    ),
    topw AS (
      SELECT wc.lang, min(wc.word) AS top_word
      FROM wc JOIN s ON s.lang = wc.lang AND wc.c = s.cmax
      GROUP BY 1
    )
    SELECT s.lang, s.n AS n_tokens, s.t AS n_types,
           CAST((1000000000 * s.t) // (s.n + s.t) AS BIGINT)
             AS unseen_mass_ppb,
           tw.top_word,
           CAST((1000000000 * s.cmax) // (s.n + s.t) AS BIGINT)
             AS top_word_p_ppb
    FROM s JOIN topw tw ON tw.lang = s.lang
    ORDER BY s.lang
    """,
    doc="Witten-Bell smoothing panel per language: the unseen-event mass "
    "T/(N + T) (types-over-tokens-plus-types — WB's 'probability of "
    "seeing something new is the rate you HAVE been seeing new things') "
    "and the discounted top-word probability c_max/(N + T) — the "
    "diversity-driven discount family beside text_good_turing's "
    "count-count estimates and text_kneser_ney_bigram's absolute "
    "discounting. Pure integer ratios of the (lang, word) rollup; the "
    "modal word ties break to the lexicographic minimum for "
    "determinism. One map-combined rollup + one tiny argmax join.",
)
def text_witten_bell(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    w = docs.select("lang", F.explode(F.split("text", " ")).alias("word"))
    wc = w.groupBy("lang", "word").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    s = wc.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("t"),
        F.sum("c").cast("bigint").alias("n"),
        F.max("c").cast("bigint").alias("cmax"),
    )
    topw = (
        wc.join(
            F.broadcast(s.select("lang", "cmax")),
            ["lang"],
        )
        .filter(F.col("c") == F.col("cmax"))
        .groupBy("lang")
        .agg(F.min("word").alias("top_word"))
    )
    return (
        s.join(F.broadcast(topw), "lang")
        .select(
            "lang",
            F.col("n").alias("n_tokens"),
            F.col("t").alias("n_types"),
            F.expr(
                "CAST((1000000000 * t) div (n + t) AS BIGINT)"
            ).alias("unseen_mass_ppb"),
            "top_word",
            F.expr(
                "CAST((1000000000 * cmax) div (n + t) AS BIGINT)"
            ).alias("top_word_p_ppb"),
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# text_log_odds_monroe — informative Dirichlet log-odds (src0 vs src1)
# ---------------------------------------------------------------------------


@register(
    "text_log_odds_monroe",
    oracle="""
    WITH w AS (
      SELECT source, unnest(string_split(text, ' ')) AS word
      FROM documents WHERE source IN ('src0', 'src1')
    ),
    wc AS (
      SELECT word,
             CAST(sum(CASE WHEN source = 'src0' THEN 1 ELSE 0 END)
                  AS BIGINT) AS y1,
             CAST(sum(CASE WHEN source = 'src1' THEN 1 ELSE 0 END)
                  AS BIGINT) AS y2
      FROM w GROUP BY 1
    ),
    tot AS (
      SELECT CAST(sum(y1) AS BIGINT) AS n1,
             CAST(sum(y2) AS BIGINT) AS n2,
             CAST(count(*) AS BIGINT) AS v
      FROM wc
    ),
    lo AS (
      SELECT wc.word, wc.y1, wc.y2,
             CAST(floor(1000000.0 * (
               ln((wc.y1 + 1.0) / (t.n1 + t.v - wc.y1 - 1.0))
               - ln((wc.y2 + 1.0) / (t.n2 + t.v - wc.y2 - 1.0))))
               AS BIGINT) AS delta_micro
      FROM wc, tot t
    )
    SELECT word, y1 AS count_src0, y2 AS count_src1, delta_micro
    FROM lo
    ORDER BY delta_micro DESC, word
    LIMIT 25
    """,
    doc="Monroe-Colaresi-Quinn informative-Dirichlet log-odds ratio "
    "between src0 and src1 word usage (uniform alpha = 1 prior): "
    "delta_w = ln[(y1+a)/(n1+aV-y1-a)] - ln[(y2+a)/(n2+aV-y2-a)] — the "
    "corpus-comparison statistic that, unlike raw TF-IDF deltas "
    "(text_source_vocab_overlap, text_keywords_topk), regularizes rare "
    "words instead of letting them dominate. Top-25 most src0-"
    "distinctive words; the delta is floor-quantized to micro-nats per "
    "(word) cell — one deterministic ln pair per distinct word, never "
    "per token (the text_kl_divergence precedent) — with a "
    "lexicographic tiebreak. One (word) rollup, 1-row totals broadcast "
    "(allowlisted), TakeOrderedAndProject top-k.",
)
def text_log_odds_monroe(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents").filter(
        F.col("source").isin("src0", "src1")
    )
    w = docs.select(
        "source", F.explode(F.split("text", " ")).alias("word")
    )
    wc = w.groupBy("word").agg(
        F.sum(F.when(F.col("source") == "src0", 1).otherwise(0))
        .cast("bigint")
        .alias("y1"),
        F.sum(F.when(F.col("source") == "src1", 1).otherwise(0))
        .cast("bigint")
        .alias("y2"),
    )
    tot = wc.agg(
        F.sum("y1").cast("bigint").alias("n1"),
        F.sum("y2").cast("bigint").alias("n2"),
        F.count(F.lit(1)).cast("bigint").alias("v"),
    )
    lo = wc.crossJoin(F.broadcast(tot)).select(
        "word",
        "y1",
        "y2",
        F.floor(
            1000000.0
            * (
                F.log(
                    (F.col("y1") + 1.0)
                    / (F.col("n1") + F.col("v") - F.col("y1") - 1.0)
                )
                - F.log(
                    (F.col("y2") + 1.0)
                    / (F.col("n2") + F.col("v") - F.col("y2") - 1.0)
                )
            )
        )
        .cast("bigint")
        .alias("delta_micro"),
    )
    return (
        lo.orderBy(F.col("delta_micro").desc(), "word")
        .limit(25)
        .select(
            "word",
            F.col("y1").alias("count_src0"),
            F.col("y2").alias("count_src1"),
            "delta_micro",
        )
    )


# ---------------------------------------------------------------------------
# orders_blau_diversity — Blau/Gini-Simpson priority-mix diversity per nation
# ---------------------------------------------------------------------------


@register(
    "orders_blau_diversity",
    oracle="""
    WITH cells AS (
      SELECT c.c_nationkey AS nation, o.o_orderpriority AS pri,
             CAST(count(*) AS HUGEINT) AS c
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY 1, 2
    ),
    s AS (
      SELECT nation,
             CAST(sum(c) AS HUGEINT) AS n,
             CAST(sum(c * c) AS HUGEINT) AS c2
      FROM cells GROUP BY 1
    )
    SELECT nation, CAST(n AS BIGINT) AS n_orders,
           CAST((1000000000 * (n * n - c2)) // (n * n) AS BIGINT)
             AS blau_ppb,
           CAST((CAST(5000000000 AS HUGEINT) * (n * n - c2)) // (4 * n * n) AS BIGINT)
             AS iqv_ppb
    FROM s ORDER BY nation
    """,
    doc="Blau index (Gini-Simpson diversity) of each nation's order-"
    "priority mix: B = 1 - sum p_i^2 — the probability two random "
    "orders differ in priority — plus the IQV normalization B k/(k-1) "
    "(k = 5 categories) that makes nations comparable at the [0,1] "
    "ceiling; the categorical-mix diversity beside events_user_type_"
    "entropy's Shannon form (Blau is log-free, hence EXACT here). One "
    "integer ratio (n^2 - sum c^2)/n^2 per nation, ppb floor-div; one "
    "fact join + bounded 125-cell rollup.",
)
def orders_blau_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    cells = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy(
            F.col("c_nationkey").alias("nation"),
            F.col("o_orderpriority").alias("pri"),
        )
        .agg(F.count(F.lit(1)).cast("decimal(38,0)").alias("c"))
    )
    s = cells.groupBy("nation").agg(
        F.sum("c").alias("n"),
        F.sum(F.col("c") * F.col("c")).alias("c2"),
    )
    return s.select(
        "nation",
        F.col("n").cast("bigint").alias("n_orders"),
        F.expr(
            "CAST((1000000000 * (n * n - c2)) div (n * n) AS BIGINT)"
        ).alias("blau_ppb"),
        F.expr(
            "CAST((CAST(5000000000 AS DECIMAL(38,0)) * (n * n - c2))"
            " div (4 * n * n) AS BIGINT)"
        ).alias("iqv_ppb"),
    ).orderBy("nation")


# ---------------------------------------------------------------------------
# orders_capability_cpm — Taguchi Cpm process-capability per priority
# ---------------------------------------------------------------------------


@register(
    "orders_capability_cpm",
    oracle="""
    WITH g AS (
      SELECT o_orderpriority AS pri,
             CAST(count(*) AS HUGEINT) AS n,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                  AS HUGEINT) AS s,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)
                      * CAST(round(o_totalprice * 100) AS HUGEINT))
                  AS HUGEINT) AS s2
      FROM orders GROUP BY 1
    )
    SELECT pri, CAST(n AS BIGINT) AS n_orders,
           CAST(CASE WHEN s >= n * 25000000 THEN 1 ELSE -1 END AS BIGINT)
             AS bias_sign,
           CAST((1000000 * CAST(2500000000000000 AS HUGEINT) * n * n)
                // (36 * (n * s2 - s * s
                          + (s - n * 25000000) * (s - n * 25000000)))
             AS BIGINT) AS cpm2_ppm
    FROM g ORDER BY pri
    """,
    doc="Taguchi Cpm process capability of order value per priority "
    "against target T = $250,000 cents-exact with specs LSL = 0, USL = "
    "$500,000 (width 5e7 cents, squared literal 2.5e15): Cpm^2 = (USL - LSL)^2 / (36 "
    "(sigma^2 + (mu - T)^2)) — the capability index that, unlike "
    "orders_cpk_capability, penalizes being OFF TARGET even when "
    "variation is small (the loss-function view shared with orders_"
    "taguchi_loss). Cleared to one exact integer ratio via sigma^2 + "
    "(mu-T)^2 = (n sum x^2 - S^2 + (S - nT)^2)/n^2; squared, so no "
    "square root; ppm sign-free plus the off-target bias sign. One "
    "5-group integer-moment rollup.",
)
def orders_capability_cpm(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    g = o.groupBy(F.col("o_orderpriority").alias("pri")).agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.sum(cents).cast("decimal(38,0)").alias("s"),
        F.sum(cents.cast("decimal(38,0)") * cents).alias("s2"),
    )
    return g.select(
        "pri",
        F.col("n").cast("bigint").alias("n_orders"),
        F.expr(
            "CAST(CASE WHEN s >= n * 25000000 THEN 1 ELSE -1 END"
            " AS BIGINT)"
        ).alias("bias_sign"),
        F.expr(
            "CAST((1000000 * CAST(2500000000000000 AS DECIMAL(38,0))"
            " * n * n)"
            " div (36 * (n * s2 - s * s"
            " + (s - n * 25000000) * (s - n * 25000000))) AS BIGINT)"
        ).alias("cpm2_ppm"),
    ).orderBy("pri")


# ---------------------------------------------------------------------------
# agg_huber_one_step — one-step Huber M-estimate of location
# ---------------------------------------------------------------------------


@register(
    "agg_huber_one_step",
    oracle="""
    WITH g AS (
      SELECT CAST(round(l_quantity) AS BIGINT) AS v,
             CAST(count(*) AS HUGEINT) AS cnt
      FROM lineitem GROUP BY 1
    ),
    tot AS (SELECT CAST(sum(cnt) AS HUGEINT) AS n FROM g),
    med AS (
      SELECT min(v) AS med FROM (
        SELECT v, 2 * sum(cnt) OVER (ORDER BY v) AS cum2, t.n
        FROM g, tot t
      ) WHERE cum2 >= n
    ),
    madg AS (
      SELECT abs(g.v - m.med) AS av, CAST(sum(g.cnt) AS HUGEINT) AS cnt
      FROM g, med m GROUP BY 1
    ),
    mad AS (
      SELECT min(av) AS mad FROM (
        SELECT av, 2 * sum(cnt) OVER (ORDER BY av) AS cum2, t.n
        FROM madg, tot t
      ) WHERE cum2 >= n
    ),
    clip AS (
      SELECT CAST(sum(g.cnt * greatest(
               10000000 * m.med - 19940970 * d.mad,
               least(10000000 * m.med + 19940970 * d.mad,
                     10000000 * g.v))) AS HUGEINT) AS csum,
             CAST(sum(CASE WHEN 10000000 * g.v
                           > 10000000 * m.med + 19940970 * d.mad
                           OR 10000000 * g.v
                           < 10000000 * m.med - 19940970 * d.mad
                      THEN g.cnt ELSE 0 END) AS HUGEINT) AS nclip
      FROM g, med m, mad d
    )
    SELECT CAST(t.n AS BIGINT) AS n_lines,
           CAST(m.med AS BIGINT) AS median_qty,
           CAST(d.mad AS BIGINT) AS mad_qty,
           CAST(c.csum // t.n AS BIGINT) AS huber_mean_x1e7,
           CAST(c.nclip AS BIGINT) AS n_clipped
    FROM tot t, med m, mad d, clip c
    """,
    doc="One-step Huber M-estimate of the quantity location: start at the "
    "(lower) median, clip every value into [med - c MAD, med + c MAD] "
    "with the standard c = 1.345 * 1.4826 = 1.9940970 (95% Gaussian "
    "efficiency; the constant carried as the EXACT integer 19940970 "
    "at 1e7 scale), and average the clipped values — the bounded-"
    "influence location between the fragile mean and the fully-"
    "discarding agg_trimmed_mean / agg_winsorized_mean (Huber clips by "
    "ROBUST distance, not by rank). Median and MAD come exactly off "
    "the bounded ~50-value census grid; the clipped sum is one pass of "
    "integer clamps; output is the floor mean at 1e7 scale. Bounded "
    "grid windows + 1-row scalars broadcast (allowlisted).",
)
def agg_huber_one_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    g = li.groupBy(
        F.round("l_quantity").cast("bigint").alias("v")
    ).agg(F.count(F.lit(1)).cast("decimal(38,0)").alias("cnt"))
    tot = g.agg(F.sum("cnt").alias("n"))
    w = Window.orderBy("v")
    cum = g.crossJoin(F.broadcast(tot)).select(
        "v", (2 * F.sum("cnt").over(w)).alias("cum2"), "n"
    )
    med = cum.filter(F.col("cum2") >= F.col("n")).agg(
        F.min("v").alias("med")
    )
    madg = (
        g.crossJoin(F.broadcast(med))
        .groupBy(F.abs(F.col("v") - F.col("med")).alias("av"))
        .agg(F.sum("cnt").alias("cnt"))
    )
    wa = Window.orderBy("av")
    madcum = madg.crossJoin(F.broadcast(tot)).select(
        "av", (2 * F.sum("cnt").over(wa)).alias("cum2"), "n"
    )
    mad = madcum.filter(F.col("cum2") >= F.col("n")).agg(
        F.min("av").alias("mad")
    )
    clip = (
        g.crossJoin(F.broadcast(med))
        .crossJoin(F.broadcast(mad))
        .agg(
            F.sum(
                F.col("cnt")
                * F.greatest(
                    10000000 * F.col("med") - 19940970 * F.col("mad"),
                    F.least(
                        10000000 * F.col("med")
                        + 19940970 * F.col("mad"),
                        10000000 * F.col("v"),
                    ),
                )
            ).alias("csum"),
            F.sum(
                F.when(
                    (
                        10000000 * F.col("v")
                        > 10000000 * F.col("med")
                        + 19940970 * F.col("mad")
                    )
                    | (
                        10000000 * F.col("v")
                        < 10000000 * F.col("med")
                        - 19940970 * F.col("mad")
                    ),
                    F.col("cnt"),
                ).otherwise(0)
            ).alias("nclip"),
        )
    )
    return (
        tot.crossJoin(F.broadcast(med))
        .crossJoin(F.broadcast(mad))
        .crossJoin(F.broadcast(clip))
        .select(
            F.col("n").cast("bigint").alias("n_lines"),
            F.col("med").cast("bigint").alias("median_qty"),
            F.col("mad").cast("bigint").alias("mad_qty"),
            F.expr("CAST(csum div n AS BIGINT)").alias(
                "huber_mean_x1e7"
            ),
            F.col("nclip").cast("bigint").alias("n_clipped"),
        )
    )


# ---------------------------------------------------------------------------
# agg_contraharmonic_mean — exact Pythagorean-mean chain on the bounded grid
# ---------------------------------------------------------------------------

# lcm(1..50): makes every 1/v an exact integer L/v on the quantity grid
_L50 = 3099044504245996706400


@register(
    "agg_contraharmonic_mean",
    oracle=f"""
    WITH g AS (
      SELECT CAST(round(l_quantity) AS BIGINT) AS v,
             CAST(count(*) AS HUGEINT) AS cnt
      FROM lineitem WHERE round(l_quantity) >= 1 GROUP BY 1
    ),
    s AS (
      SELECT CAST(sum(cnt) AS HUGEINT) AS n,
             CAST(sum(cnt * v) AS HUGEINT) AS s1,
             CAST(sum(cnt * v * v) AS HUGEINT) AS s2,
             CAST(sum(cnt * (CAST({_L50} AS HUGEINT) // v)) AS HUGEINT)
               AS sinv
      FROM g
    )
    SELECT CAST(n AS BIGINT) AS n_lines,
           CAST((1000000 * n * CAST({_L50} AS HUGEINT)) // sinv AS BIGINT)
             AS harmonic_ppm,
           CAST((1000000 * s1) // n AS BIGINT) AS arithmetic_ppm,
           CAST((1000000 * s2) // s1 AS BIGINT) AS contraharmonic_ppm,
           CAST(CASE WHEN sinv * s1 >= n * n * CAST({_L50} AS HUGEINT)
                      AND n * s2 >= s1 * s1
                THEN 1 ELSE 0 END AS BIGINT) AS mean_chain_holds
    FROM s
    """,
    doc="Exact Pythagorean-mean chain of rounded quantities: harmonic "
    "H = n / sum(1/v) made EXACT by clearing with L = lcm(1..50) "
    "(every 1/v becomes the integer L/v on the bounded domain — no "
    "float reciprocal anywhere), arithmetic A, and the contraharmonic "
    "(Lehmer-2) C = sum v^2 / sum v, the mean that weights by "
    "magnitude (C - A = variance/mean, so C is A plus the "
    "overdispersion premium). The H <= A <= C chain is verified by "
    "exact cross-multiplications (sum(1/v) sum(v) >= n^2 is "
    "Cauchy-Schwarz). All ppm floor-divs of HUGEINT/DECIMAL(38,0) "
    "integers; one grid rollup, no windows, no joins.",
)
def agg_contraharmonic_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").filter(
        F.round("l_quantity") >= 1
    )
    g = li.groupBy(
        F.round("l_quantity").cast("bigint").alias("v")
    ).agg(F.count(F.lit(1)).cast("decimal(38,0)").alias("cnt"))
    s = g.agg(
        F.sum("cnt").alias("n"),
        F.sum(F.col("cnt") * F.col("v")).alias("s1"),
        F.sum(F.col("cnt") * F.col("v") * F.col("v")).alias("s2"),
        # L/v wraps Spark's integral div (result > 2^63), so the 50
        # exact quotients ship as literals indexed by v
        F.sum(
            F.col("cnt")
            * F.element_at(
                F.array(
                    *[
                        F.lit(str(_L50 // vv)).cast("decimal(38,0)")
                        for vv in range(1, 51)
                    ]
                ),
                F.col("v").cast("int"),
            )
        ).alias("sinv"),
    )
    return s.select(
        F.col("n").cast("bigint").alias("n_lines"),
        F.expr(
            f"CAST((1000000 * n * CAST('{_L50}' AS DECIMAL(38,0)))"
            " div sinv AS BIGINT)"
        ).alias("harmonic_ppm"),
        F.expr("CAST((1000000 * s1) div n AS BIGINT)").alias(
            "arithmetic_ppm"
        ),
        F.expr("CAST((1000000 * s2) div s1 AS BIGINT)").alias(
            "contraharmonic_ppm"
        ),
        F.expr(
            f"CAST(CASE WHEN sinv * s1 >= n * n *"
            f" CAST('{_L50}' AS DECIMAL(38,0))"
            " AND n * s2 >= s1 * s1 THEN 1 ELSE 0 END AS BIGINT)"
        ).alias("mean_chain_holds"),
    )


# ---------------------------------------------------------------------------
# agg_tarone_overdispersion — Tarone's Z for binomial clustering
# ---------------------------------------------------------------------------


@register(
    "agg_tarone_overdispersion",
    oracle="""
    WITH o4 AS (
      SELECT l_orderkey,
             CAST(sum(CASE WHEN round(l_quantity) > 25 THEN 1 ELSE 0 END)
                  AS BIGINT) AS y
      FROM lineitem GROUP BY 1 HAVING count(*) = 4
    ),
    cells AS (
      SELECT y, CAST(count(*) AS HUGEINT) AS ny FROM o4 GROUP BY 1
    ),
    t AS (
      SELECT CAST(sum(ny) AS HUGEINT) AS g,
             CAST(4 * sum(ny) AS HUGEINT) AS m,
             CAST(sum(ny * y) AS HUGEINT) AS yy
      FROM cells
    ),
    s AS (
      SELECT t.g, t.m, t.yy,
             CAST(sum(c.ny * (t.m * c.y - 4 * t.yy)
                      * (t.m * c.y - 4 * t.yy)) AS HUGEINT) AS q
      FROM cells c, t GROUP BY 1, 2, 3
    )
    SELECT CAST(g AS BIGINT) AS n_orders,
           CAST(yy AS BIGINT) AS n_successes,
           CAST(CASE WHEN q >= m * yy * (m - yy) THEN 1 ELSE -1 END
                AS BIGINT) AS z_sign,
           CAST((1000 * (q - m * yy * (m - yy))
                 * (q - m * yy * (m - yy)))
                // greatest(24 * g * yy * yy * (m - yy) * (m - yy), 1)
             AS BIGINT) AS z2_milli
    FROM s
    """,
    doc="Tarone's Z test for beta-binomial overdispersion of the per-"
    "order 'heavy line' count (y = lines with quantity > 25 out of "
    "m_i = 4): are orders internally CORRELATED (basket-level taste) "
    "or are lines independent coin flips? S = sum (y_i - m p)^2 / "
    "(p q), Z = (S - M) / sqrt(2 sum m_i(m_i-1)) — the clustered-"
    "binomial complement of agg_dispersion_test's Poisson form and "
    "the formal null behind agg_cronbach_alpha's same-frame "
    "consistency. With p = Y/M everything clears: Z^2 = (Q - M Y "
    "(M-Y))^2 / (24 G Y^2 (M-Y)^2) with Q = sum n_y (M y - 4Y)^2 over "
    "the bounded 5-cell y-census — one exact integer ratio, milli, "
    "sign-split. One order rollup + 5-cell reduce.",
)
def agg_tarone_overdispersion(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    o4 = (
        li.groupBy("l_orderkey")
        .agg(
            F.sum(
                F.when(F.round("l_quantity") > 25, 1).otherwise(0)
            ).alias("y"),
            F.count(F.lit(1)).alias("k"),
        )
        .filter(F.col("k") == 4)
    )
    cells = o4.groupBy("y").agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("ny")
    )
    t = cells.agg(
        F.sum("ny").alias("g"),
        (4 * F.sum("ny")).alias("m"),
        F.sum(F.col("ny") * F.col("y")).alias("yy"),
    )
    s = cells.crossJoin(F.broadcast(t)).groupBy("g", "m", "yy").agg(
        F.sum(
            F.col("ny")
            * (F.col("m") * F.col("y") - 4 * F.col("yy"))
            * (F.col("m") * F.col("y") - 4 * F.col("yy"))
        ).alias("q")
    )
    return s.select(
        F.col("g").cast("bigint").alias("n_orders"),
        F.col("yy").cast("bigint").alias("n_successes"),
        F.expr(
            "CAST(CASE WHEN q >= m * yy * (m - yy) THEN 1 ELSE -1 END"
            " AS BIGINT)"
        ).alias("z_sign"),
        F.expr(
            "CAST((1000 * (q - m * yy * (m - yy))"
            " * (q - m * yy * (m - yy)))"
            " div greatest(24 * g * yy * yy * (m - yy) * (m - yy), 1)"
            " AS BIGINT)"
        ).alias("z2_milli"),
    )


# ---------------------------------------------------------------------------
# docs_hill_tail_index — Hill estimator of the doc-length tail exponent
# ---------------------------------------------------------------------------


@register(
    "docs_hill_tail_index",
    oracle="""
    WITH top51 AS (
      SELECT n_chars, doc_id,
             row_number() OVER (ORDER BY n_chars DESC, doc_id) AS r
      FROM documents QUALIFY r <= 51
    ),
    thr AS (SELECT n_chars AS x51 FROM top51 WHERE r = 51),
    hill AS (
      SELECT CAST(sum(CAST(floor(1000000.0 *
               ln(CAST(t.n_chars AS DOUBLE) / th.x51)) AS BIGINT))
               AS BIGINT) AS inv_alpha_micro_sum,
             CAST(count(*) AS BIGINT) AS k
      FROM top51 t, thr th WHERE t.r <= 50
    )
    SELECT k AS k_top, CAST(th.x51 AS BIGINT) AS threshold_chars,
           h.inv_alpha_micro_sum,
           CAST((50 * 1000000000000) // greatest(h.inv_alpha_micro_sum, 1)
                AS BIGINT) AS alpha_hat_micro
    FROM hill h, thr th
    """,
    doc="Hill estimator of the document-length tail index over the top "
    "k = 50 order statistics: 1/alpha = (1/k) sum ln(x_(i)/x_(k+1)) — "
    "the standard heavy-tail exponent (alpha < 2 means infinite "
    "variance: length-weighted sampling and shard packing must cap) "
    "complementing docs_length_lognormal_fit's body fit with a tail "
    "law. Each of the 50 bounded top-k members contributes ONE floor-"
    "quantized micro-nat ln of an exact integer ratio (the quantized-"
    "ln discipline); alpha_hat = k / sum inverts on the quantized "
    "integer. Top-51 via one rank window (TakeOrdered-sized), "
    "threshold broadcast back.",
)
def docs_hill_tail_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    w = Window.orderBy(F.col("n_chars").desc(), "doc_id")
    top51 = (
        d.select("n_chars", "doc_id")
        .withColumn("r", F.row_number().over(w))
        .filter(F.col("r") <= 51)
    )
    thr = top51.filter(F.col("r") == 51).select(
        F.col("n_chars").alias("x51")
    )
    hill = (
        top51.filter(F.col("r") <= 50)
        .crossJoin(F.broadcast(thr))
        .agg(
            F.sum(
                F.floor(
                    1000000.0
                    * F.log(
                        F.col("n_chars").cast("double") / F.col("x51")
                    )
                ).cast("bigint")
            )
            .cast("bigint")
            .alias("inv_alpha_micro_sum"),
            F.count(F.lit(1)).cast("bigint").alias("k"),
        )
    )
    return hill.crossJoin(F.broadcast(thr)).select(
        F.col("k").alias("k_top"),
        F.col("x51").cast("bigint").alias("threshold_chars"),
        "inv_alpha_micro_sum",
        F.expr(
            "CAST((50 * 1000000000000)"
            " div greatest(inv_alpha_micro_sum, 1) AS BIGINT)"
        ).alias("alpha_hat_micro"),
    )


# ---------------------------------------------------------------------------
# events_sax_symbols — SAX symbolization of daily volumes (alphabet 4)
# ---------------------------------------------------------------------------


@register(
    "events_sax_symbols",
    oracle="""
    WITH d AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(count(*) AS BIGINT) AS x
      FROM events GROUP BY 1, 2
    ),
    t AS (
      SELECT event_type, CAST(count(*) AS HUGEINT) AS n,
             CAST(sum(x) AS HUGEINT) AS s,
             CAST(count(*) AS HUGEINT) * sum(x * x)
               - CAST(sum(x) AS HUGEINT) * sum(x) AS v2
      FROM d GROUP BY 1
    ),
    z AS (
      SELECT d.event_type, d.day,
             CASE
               WHEN t.n * d.x - t.s < 0
                    AND 100000000 * (t.n * d.x - t.s) * (t.n * d.x - t.s)
                        > 45495025 * t.v2 THEN 'a'
               WHEN t.n * d.x - t.s < 0 THEN 'b'
               WHEN 100000000 * (t.n * d.x - t.s) * (t.n * d.x - t.s)
                    > 45495025 * t.v2 THEN 'd'
               ELSE 'c'
             END AS letter
      FROM d JOIN t ON t.event_type = d.event_type
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_days,
           string_agg(letter, '' ORDER BY day) AS sax,
           CAST(sum(CASE WHEN letter = 'a' THEN 1 ELSE 0 END) AS BIGINT)
             AS n_a,
           CAST(sum(CASE WHEN letter = 'b' THEN 1 ELSE 0 END) AS BIGINT)
             AS n_b,
           CAST(sum(CASE WHEN letter = 'c' THEN 1 ELSE 0 END) AS BIGINT)
             AS n_c,
           CAST(sum(CASE WHEN letter = 'd' THEN 1 ELSE 0 END) AS BIGINT)
             AS n_d
    FROM z GROUP BY 1 ORDER BY 1
    """,
    doc="SAX (Symbolic Aggregate approXimation) symbolization of each "
    "event type's daily-volume series, alphabet size 4: z-normalize and "
    "bucket at the Gaussian quartile breakpoints -0.6745 / 0 / +0.6745 "
    "— the discretization under iSAX indexing, symbolic motif mining "
    "and the events_permutation_entropy alphabet's amplitude-aware "
    "sibling (ordinal patterns see shape, SAX sees level). Every "
    "breakpoint test is the exact integer cross-multiplication 1e8 "
    "(n x - S)^2 vs 6745^2 (n sum x^2 - S^2) with the sign split "
    "first (boundary z = ±0.6745 deterministically folds inward), so "
    "no float z-score exists; the symbol string assembles in day "
    "order. One rollup + per-type totals broadcast.",
)
def events_sax_symbols(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    d = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("x"))
    t = d.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.sum("x").cast("decimal(38,0)").alias("s"),
        (
            F.count(F.lit(1)).cast("decimal(38,0)")
            * F.sum(F.col("x") * F.col("x"))
            - F.sum("x").cast("decimal(38,0)") * F.sum("x")
        ).alias("v2"),
    )
    dev = F.col("n") * F.col("x") - F.col("s")
    beyond = 100000000 * dev * dev > 45495025 * F.col("v2")
    z = d.join(F.broadcast(t), "event_type").select(
        "event_type",
        "day",
        F.when((dev < 0) & beyond, "a")
        .when(dev < 0, "b")
        .when(beyond, "d")
        .otherwise("c")
        .alias("letter"),
    )
    return (
        z.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_days"),
            F.concat_ws(
                "",
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("day", "letter"))
                    ),
                    lambda s: s.getField("letter"),
                ),
            ).alias("sax"),
            *[
                F.sum(F.when(F.col("letter") == c, 1).otherwise(0))
                .cast("bigint")
                .alias(f"n_{c}")
                for c in ("a", "b", "c", "d")
            ],
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# events_recurrence_quantification — RQA recurrence rate + determinism
# ---------------------------------------------------------------------------


@register(
    "events_recurrence_quantification",
    oracle="""
    WITH d AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(count(*) AS BIGINT) AS x
      FROM events GROUP BY 1, 2
    ),
    ix AS (
      SELECT event_type, x,
             CAST(row_number() OVER (PARTITION BY event_type
                                     ORDER BY day) AS BIGINT) AS i
      FROM d
    ),
    t AS (
      SELECT event_type, CAST(count(*) AS HUGEINT) AS n,
             CAST(count(*) AS HUGEINT) * sum(x * x)
               - CAST(sum(x) AS HUGEINT) * sum(x) AS v2
      FROM ix GROUP BY 1
    ),
    rec AS (
      SELECT a.event_type, a.i AS i1, b.i AS i2
      FROM ix a JOIN ix b ON b.event_type = a.event_type AND b.i > a.i
           JOIN t ON t.event_type = a.event_type
      WHERE 25 * t.n * t.n * (a.x - b.x) * (a.x - b.x) < t.v2
    ),
    np AS (
      SELECT event_type, CAST(n * (n - 1) / 2 AS BIGINT) AS n_pairs
      FROM t
    ),
    diag AS (
      SELECT r.event_type, r.i1, r.i2,
             CASE WHEN s.i1 IS NOT NULL OR p.i1 IS NOT NULL
                  THEN 1 ELSE 0 END AS on_diag
      FROM rec r
      LEFT JOIN rec s ON s.event_type = r.event_type
           AND s.i1 = r.i1 + 1 AND s.i2 = r.i2 + 1
      LEFT JOIN rec p ON p.event_type = r.event_type
           AND p.i1 = r.i1 - 1 AND p.i2 = r.i2 - 1
    )
    SELECT np.event_type, np.n_pairs,
           CAST(count(dg.i1) AS BIGINT) AS n_recurrent,
           CAST((1000000 * count(dg.i1)) // np.n_pairs AS BIGINT)
             AS rr_ppm,
           CAST(coalesce(sum(dg.on_diag), 0) AS BIGINT) AS n_on_diagonal,
           CAST((1000000 * coalesce(sum(dg.on_diag), 0))
                // greatest(count(dg.i1), 1) AS BIGINT) AS det_ppm
    FROM np LEFT JOIN diag dg ON dg.event_type = np.event_type
    GROUP BY 1, 2 ORDER BY 1
    """,
    doc="Recurrence quantification (RQA) of each event type's daily-"
    "volume series: recurrence rate RR = fraction of day pairs whose "
    "volumes fall within eps = 0.2 sigma of each other (the exact "
    "integer test 25 n^2 (x_i - x_j)^2 < n sum x^2 - S^2), and a "
    "determinism proxy DET = fraction of recurrent pairs lying on a "
    "diagonal of length >= 2 (the (i+1, j+1) neighbor also recurrent) "
    "— high RR + high DET marks rule-driven dynamics, high RR + low "
    "DET marks a noisy plateau: structure the variance-based monitors "
    "(events_vmr_windows) and even permutation entropy cannot "
    "separate. Pairs live on the BOUNDED per-type calendar grid "
    "(<= 30 x 30), joined equi on type; all-integer.",
)
def events_recurrence_quantification(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    d = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("x"))
    w = Window.partitionBy("event_type").orderBy("day")
    ix = d.select(
        "event_type", "x", F.row_number().over(w).cast("bigint").alias("i")
    )
    t = ix.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        (
            F.count(F.lit(1)).cast("decimal(38,0)")
            * F.sum(F.col("x") * F.col("x"))
            - F.sum("x").cast("decimal(38,0)") * F.sum("x")
        ).alias("v2"),
    )
    a = ix.select("event_type", F.col("i").alias("i1"), F.col("x").alias("x1"))
    b = ix.select("event_type", F.col("i").alias("i2"), F.col("x").alias("x2"))
    rec = (
        a.join(b, "event_type")
        .filter(F.col("i2") > F.col("i1"))
        .join(F.broadcast(t), "event_type")
        .filter(
            25
            * F.col("n")
            * F.col("n")
            * (F.col("x1") - F.col("x2"))
            * (F.col("x1") - F.col("x2"))
            < F.col("v2")
        )
        .select("event_type", "i1", "i2")
    )
    np_ = t.select(
        "event_type",
        (F.col("n") * (F.col("n") - 1) / 2)
        .cast("bigint")
        .alias("n_pairs"),
    )
    s = rec.select(
        "event_type",
        (F.col("i1") + 1).alias("i1"),
        (F.col("i2") + 1).alias("i2"),
        F.lit(1).alias("succ"),
    )
    p = rec.select(
        "event_type",
        (F.col("i1") - 1).alias("i1"),
        (F.col("i2") - 1).alias("i2"),
        F.lit(1).alias("pred"),
    )
    diag = (
        rec.join(s, ["event_type", "i1", "i2"], "left")
        .join(p, ["event_type", "i1", "i2"], "left")
        .select(
            "event_type",
            "i1",
            F.when(
                F.col("succ").isNotNull() | F.col("pred").isNotNull(), 1
            )
            .otherwise(0)
            .alias("on_diag"),
        )
    )
    return (
        np_.join(diag, "event_type", "left")
        .groupBy("event_type", "n_pairs")
        .agg(
            F.count("i1").cast("bigint").alias("n_recurrent"),
            F.expr(
                "CAST((1000000 * count(i1)) div n_pairs AS BIGINT)"
            ).alias("rr_ppm"),
            F.coalesce(F.sum("on_diag"), F.lit(0))
            .cast("bigint")
            .alias("n_on_diagonal"),
            F.expr(
                "CAST((1000000 * coalesce(sum(on_diag), 0))"
                " div greatest(count(i1), 1) AS BIGINT)"
            ).alias("det_ppm"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# events_sample_entropy — SampEn(m=1, r=0.2 sigma) of daily volumes
# ---------------------------------------------------------------------------


@register(
    "events_sample_entropy",
    oracle="""
    WITH d AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(count(*) AS BIGINT) AS x
      FROM events GROUP BY 1, 2
    ),
    ix AS (
      SELECT event_type, x,
             lead(x) OVER (PARTITION BY event_type ORDER BY day) AS xn,
             CAST(row_number() OVER (PARTITION BY event_type
                                     ORDER BY day) AS BIGINT) AS i
      FROM d
    ),
    t AS (
      SELECT event_type, CAST(count(*) AS HUGEINT) AS n,
             CAST(count(*) AS HUGEINT) * sum(x * x)
               - CAST(sum(x) AS HUGEINT) * sum(x) AS v2
      FROM ix GROUP BY 1
    ),
    prs AS (
      SELECT a.event_type,
             CASE WHEN 25 * t.n * t.n * (a.x - b.x) * (a.x - b.x)
                       <= t.v2 THEN 1 ELSE 0 END AS b_match,
             CASE WHEN 25 * t.n * t.n * (a.x - b.x) * (a.x - b.x)
                       <= t.v2
                   AND 25 * t.n * t.n * (a.xn - b.xn) * (a.xn - b.xn)
                       <= t.v2 THEN 1 ELSE 0 END AS a_match
      FROM ix a JOIN ix b ON b.event_type = a.event_type AND b.i > a.i
           JOIN t ON t.event_type = a.event_type
      WHERE a.xn IS NOT NULL AND b.xn IS NOT NULL
    )
    SELECT event_type,
           CAST(sum(b_match) AS BIGINT) AS b_count,
           CAST(sum(a_match) AS BIGINT) AS a_count,
           CAST(CASE WHEN sum(a_match) > 0 THEN
                floor(1000000.0 * ln(CAST(sum(b_match) AS DOUBLE)
                                     / sum(a_match)))
                END AS BIGINT) AS sampen_micro
    FROM prs GROUP BY 1 ORDER BY 1
    """,
    doc="Sample entropy SampEn(m = 1, r = 0.2 sigma) of each event "
    "type's daily-volume series: -ln(A/B) where B counts template "
    "pairs matching at length 1 and A those still matching at length "
    "2 — the regularity statistic (low SampEn = predictable next "
    "step) designed to be length-unbiased where approximate entropy "
    "double-counts self-matches; the amplitude-domain complement of "
    "events_permutation_entropy and the formal statistic behind the "
    "RQA determinism proxy. The tolerance test is the same exact "
    "cross-multiplication as the RQA eps (<=, per Richman-Moorman); "
    "one quantized ln of the exact integer ratio B/A per type. "
    "Bounded per-type pair grid, equi-joined on type.",
)
def events_sample_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    d = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("x"))
    w = Window.partitionBy("event_type").orderBy("day")
    ix = d.select(
        "event_type",
        "x",
        F.lead("x").over(w).alias("xn"),
        F.row_number().over(w).cast("bigint").alias("i"),
    )
    t = ix.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        (
            F.count(F.lit(1)).cast("decimal(38,0)")
            * F.sum(F.col("x") * F.col("x"))
            - F.sum("x").cast("decimal(38,0)") * F.sum("x")
        ).alias("v2"),
    )
    a = ix.select(
        "event_type",
        F.col("i").alias("i1"),
        F.col("x").alias("x1"),
        F.col("xn").alias("xn1"),
    )
    b = ix.select(
        "event_type",
        F.col("i").alias("i2"),
        F.col("x").alias("x2"),
        F.col("xn").alias("xn2"),
    )
    near = (
        lambda u, v: 25
        * F.col("n")
        * F.col("n")
        * (F.col(u) - F.col(v))
        * (F.col(u) - F.col(v))
        <= F.col("v2")
    )
    prs = (
        a.join(b, "event_type")
        .filter(
            (F.col("i2") > F.col("i1"))
            & F.col("xn1").isNotNull()
            & F.col("xn2").isNotNull()
        )
        .join(F.broadcast(t), "event_type")
        .select(
            "event_type",
            F.when(near("x1", "x2"), 1).otherwise(0).alias("b_match"),
            F.when(
                near("x1", "x2") & near("xn1", "xn2"), 1
            )
            .otherwise(0)
            .alias("a_match"),
        )
    )
    return (
        prs.groupBy("event_type")
        .agg(
            F.sum("b_match").cast("bigint").alias("b_count"),
            F.sum("a_match").cast("bigint").alias("a_count"),
            F.expr(
                "CAST(CASE WHEN sum(a_match) > 0 THEN"
                " floor(1000000.0 * ln(CAST(sum(b_match) AS DOUBLE)"
                " / sum(a_match))) END AS BIGINT)"
            ).alias("sampen_micro"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# events_transfer_entropy — directed information flow click -> purchase
# ---------------------------------------------------------------------------


@register(
    "events_transfer_entropy",
    oracle="""
    WITH d AS (
      SELECT CAST(ts AS DATE) AS day,
             CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                  AS BIGINT) AS y,
             CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                  AS BIGINT) AS x
      FROM events WHERE event_type IN ('purchase', 'click')
      GROUP BY 1
    ),
    u AS (
      SELECT CASE WHEN y > lag(y) OVER w THEN 1 ELSE 0 END AS yu,
             CASE WHEN x > lag(x) OVER w THEN 1 ELSE 0 END AS xu,
             CASE WHEN lead(y) OVER w > y THEN 1 ELSE 0 END AS ynu,
             lag(y) OVER w AS yp, lead(y) OVER w AS yn
      FROM d WINDOW w AS (ORDER BY day)
    ),
    tri AS (
      SELECT ynu, yu, xu, CAST(count(*) AS BIGINT) AS c
      FROM u WHERE yp IS NOT NULL AND yn IS NOT NULL
      GROUP BY 1, 2, 3
    ),
    m AS (
      SELECT t.ynu, t.yu, t.xu, t.c,
             CAST(sum(t.c) OVER (PARTITION BY t.yu, t.xu) AS BIGINT)
               AS c_yx,
             CAST(sum(t.c) OVER (PARTITION BY t.ynu, t.yu) AS BIGINT)
               AS c_yny,
             CAST(sum(t.c) OVER (PARTITION BY t.yu) AS BIGINT) AS c_y,
             CAST(sum(t.c) OVER () AS BIGINT) AS n
      FROM tri t
    )
    SELECT CAST(max(n) AS BIGINT) AS n_days,
           CAST(count(*) AS BIGINT) AS n_cells,
           CAST(sum(CAST(floor(1000000.0 * c *
                ln((CAST(c AS DOUBLE) * c_y)
                   / (CAST(c_yx AS DOUBLE) * c_yny))) AS BIGINT))
                AS BIGINT) AS te_nscaled_micro
    FROM m
    """,
    doc="Transfer entropy (Schreiber) from click direction to purchase "
    "direction over the shared daily calendar: TE(X->Y) = sum p(y', y, "
    "x) ln[ p(y'|y,x) / p(y'|y) ] on the binary up/down state space — "
    "the DIRECTED dependence measure that is zero when click history "
    "adds nothing beyond purchase's own history (Granger causality's "
    "information-theoretic form; the asymmetric upgrade of events_"
    "type_cooccurrence). The <= 8 bounded state cells each floor-"
    "quantize c ln(c c_y / (c_yx c_y'y)) to integer micro-nats (the "
    "agg_mutual_information precedent — the marginal identity makes "
    "the conditional ratio a pure count ratio), then sum exactly; "
    "te_nscaled_micro = n*TE. One day rollup + bounded grid windows.",
)
def events_transfer_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("purchase", "click")
    )
    d = ev.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("bigint")
        .alias("y"),
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
        .cast("bigint")
        .alias("x"),
    )
    w = Window.orderBy("day")
    u = d.select(
        F.when(F.col("y") > F.lag("y").over(w), 1).otherwise(0).alias("yu"),
        F.when(F.col("x") > F.lag("x").over(w), 1).otherwise(0).alias("xu"),
        F.when(F.lead("y").over(w) > F.col("y"), 1)
        .otherwise(0)
        .alias("ynu"),
        F.lag("y").over(w).alias("yp"),
        F.lead("y").over(w).alias("yn"),
    )
    tri = (
        u.filter(F.col("yp").isNotNull() & F.col("yn").isNotNull())
        .groupBy("ynu", "yu", "xu")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    m = tri.select(
        "ynu",
        "yu",
        "xu",
        "c",
        F.sum("c").over(Window.partitionBy("yu", "xu")).alias("c_yx"),
        F.sum("c").over(Window.partitionBy("ynu", "yu")).alias("c_yny"),
        F.sum("c").over(Window.partitionBy("yu")).alias("c_y"),
        F.sum("c").over(Window.partitionBy()).alias("n"),
    )
    return m.agg(
        F.max("n").cast("bigint").alias("n_days"),
        F.count(F.lit(1)).cast("bigint").alias("n_cells"),
        F.sum(
            F.floor(
                1000000.0
                * F.col("c")
                * F.log(
                    (F.col("c").cast("double") * F.col("c_y"))
                    / (F.col("c_yx").cast("double") * F.col("c_yny"))
                )
            ).cast("bigint")
        )
        .cast("bigint")
        .alias("te_nscaled_micro"),
    )


# ---------------------------------------------------------------------------
# multimodal_zip_central_dir — EOCD backward scan + central-record walk
# ---------------------------------------------------------------------------


@register(
    "multimodal_zip_central_dir",
    oracle="""
    WITH d AS (
      SELECT doc_id, 1 + doc_id % 3 AS n FROM documents
    )
    SELECT doc_id,
           CAST(n AS BIGINT) AS n_entries,
           CAST(list_sum(list_transform(range(n), i ->
                (doc_id + i) % 2)) AS BIGINT) AS n_deflated,
           CAST(list_sum(list_transform(range(n), i ->
                100 + (doc_id + i) % 1000)) AS BIGINT)
             AS total_compressed,
           CAST(list_sum(list_transform(range(n), i ->
                100 + (doc_id + i) % 1000
                + 500 * ((doc_id + i) % 3))) AS BIGINT)
             AS total_uncompressed,
           CAST(6 * n AS BIGINT) AS name_bytes
    FROM d ORDER BY doc_id
    """,
    doc="REAL ZIP central-directory walking under the driver's hash "
    "check: per doc, construct a central directory of 1-3 46-byte "
    "file headers (PK\\x01\\x02 records with method/sizes/name-length "
    "fields and 'fN.txt' names) plus the end-of-central-directory "
    "record, then recover the entry census, deflate count, declared "
    "compressed/uncompressed totals and name bytes with the real "
    "stdlib walker (multimodal.walk_zip_central_dir) — whose EOCD "
    "BACKWARD scan from the file tail is the grammar feature no other "
    "walker here has (every real unzipper starts at the end, comment-"
    "tolerant). Map-only; zero shuffles.",
)
def multimodal_zip_central_dir(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mongodb_nats_connector_spark.operators.multimodal import (
        ZIP_CDIR_SCHEMA,
        _zip_cdir_batches,
    )

    d = table(spark, sf_dir, "documents", parallel=True).select(
        "doc_id", (1 + F.col("doc_id") % 3).alias("n")
    )
    entries = F.expr(
        "concat_ws('', transform(sequence(0, CAST(n - 1 AS INT)), i ->"
        " concat("
        "  '504B0102', '14001400', '0000',"
        # method LE16
        "  concat(lpad(hex((doc_id + i) % 2 * 8), 2, '0'), '00'),"
        "  '00000000',"                      # time + date
        "  '00000000',"                      # crc32 (declared only)
        # compressed size LE32
        "  concat(substring(lpad(hex(100 + (doc_id + i) % 1000), 8, '0'),"
        "           7, 2),"
        "         substring(lpad(hex(100 + (doc_id + i) % 1000), 8, '0'),"
        "           5, 2),"
        "         substring(lpad(hex(100 + (doc_id + i) % 1000), 8, '0'),"
        "           3, 2),"
        "         substring(lpad(hex(100 + (doc_id + i) % 1000), 8, '0'),"
        "           1, 2)),"
        # uncompressed size LE32
        "  concat(substring(lpad(hex(100 + (doc_id + i) % 1000"
        "           + 500 * ((doc_id + i) % 3)), 8, '0'), 7, 2),"
        "         substring(lpad(hex(100 + (doc_id + i) % 1000"
        "           + 500 * ((doc_id + i) % 3)), 8, '0'), 5, 2),"
        "         substring(lpad(hex(100 + (doc_id + i) % 1000"
        "           + 500 * ((doc_id + i) % 3)), 8, '0'), 3, 2),"
        "         substring(lpad(hex(100 + (doc_id + i) % 1000"
        "           + 500 * ((doc_id + i) % 3)), 8, '0'), 1, 2)),"
        "  '0600', '0000', '0000',"          # name/extra/comment len
        "  '0000', '0000', '00000000', '00000000',"  # disk/attrs/offset
        "  '66', lpad(hex(48 + i), 2, '0'), '2E747874')))"  # fN.txt
    )
    eocd = F.concat(
        F.lit("504B0506"),
        F.lit("00000000"),
        _hex_le16(F.col("n")),
        _hex_le16(F.col("n")),
        _hex_le32(52 * F.col("n")),
        _hex_le32(F.lit(0)),
        F.lit("0000"),
    )
    return (
        d.select(
            "doc_id", F.unhex(F.concat(entries, eocd)).alias("payload")
        )
        .mapInPandas(_zip_cdir_batches, ZIP_CDIR_SCHEMA)
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# multimodal_flac_streaminfo — bit-packed STREAMINFO field group
# ---------------------------------------------------------------------------


@register(
    "multimodal_flac_streaminfo",
    oracle="""
    WITH d AS (
      SELECT doc_id,
             8000 + (doc_id % 9) * 4000 AS rate,
             1 + doc_id % 8 AS ch,
             8 + doc_id % 25 AS bps,
             (doc_id * 1000) % 68719476736 AS total
      FROM documents
    )
    SELECT doc_id,
           CAST(rate AS BIGINT) AS sample_rate,
           CAST(ch AS BIGINT) AS channels,
           CAST(bps AS BIGINT) AS bits_per_sample,
           CAST(total AS BIGINT) AS total_samples,
           CAST((1000 * total) // rate AS BIGINT) AS duration_ms
    FROM d ORDER BY doc_id
    """,
    doc="REAL FLAC STREAMINFO parsing under the driver's hash check: per "
    "doc, construct a fLaC container (marker, last-block type-0 header "
    "of length 34, STREAMINFO with the packed 64-bit field group "
    "rate<<44 | (ch-1)<<41 | (bps-1)<<36 | total_samples assembled as "
    "one hex bigint) and recover rate / channels / bit depth / total "
    "samples / duration with the real bit-unpacking parser "
    "(multimodal.parse_flac_streaminfo) — the one grammar here whose "
    "fields do NOT align to bytes (20/3/5/36-bit packing), covering "
    "the bit-level decode class beside the byte-aligned WAV/mp4/TIFF "
    "walkers. duration_ms = 1000 total // rate is overflow-free by "
    "construction (total < 2^36). Map-only; zero shuffles.",
)
def multimodal_flac_streaminfo(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mongodb_nats_connector_spark.operators.multimodal import (
        FLAC_INFO_SCHEMA,
        _flac_info_batches,
    )

    d = table(spark, sf_dir, "documents", parallel=True).select(
        "doc_id",
        (8000 + (F.col("doc_id") % 9) * 4000).alias("rate"),
        (1 + F.col("doc_id") % 8).alias("ch"),
        (8 + F.col("doc_id") % 25).alias("bps"),
        ((F.col("doc_id") * 1000) % F.lit(68719476736)).alias("total"),
    )
    packed = (
        F.col("rate") * F.lit(17592186044416)  # << 44
        + (F.col("ch") - 1) * F.lit(2199023255552)  # << 41
        + (F.col("bps") - 1) * F.lit(68719476736)  # << 36
        + F.col("total")
    )
    flac_hex = F.concat(
        F.lit("664C6143"),                  # 'fLaC'
        F.lit("80000022"),                  # last block, type 0, len 34
        F.lit("10001000"),                  # min/max blocksize 4096
        F.lit("000000000000"),              # min/max framesize (unknown)
        F.lpad(F.hex(packed), 16, "0"),
        F.lit("00000000000000000000000000000000"),  # MD5 (declared)
    )
    return (
        d.select("doc_id", F.unhex(flac_hex).alias("payload"))
        .mapInPandas(_flac_info_batches, FLAC_INFO_SCHEMA)
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# similarity_rank_biased_overlap — RBO@10 between full and truncated ANN
# ---------------------------------------------------------------------------

from mongodb_nats_connector_spark.operators.pipeline20 import (  # noqa: E402
    _QV,
    _QV_SQL,
)


@register(
    "similarity_rank_biased_overlap",
    oracle=f"""
    WITH q AS (
      SELECT vec_id, {_QV_SQL} AS qv FROM embeddings
    ),
    panel AS (SELECT vec_id AS qid, qv AS qqv FROM q WHERE vec_id < 20),
    scored AS (
      SELECT p.qid, c.vec_id AS cid,
             CAST(list_sum(list_transform(range(64), i ->
               p.qqv[CAST(i AS INT) + 1] * c.qv[CAST(i AS INT) + 1]))
               AS BIGINT) AS s_full,
             CAST(list_sum(list_transform(range(32), i ->
               p.qqv[CAST(i AS INT) + 1] * c.qv[CAST(i AS INT) + 1]))
               AS BIGINT) AS s_half
      FROM panel p, q c WHERE c.vec_id <> p.qid
    ),
    rk AS (
      SELECT qid, cid,
             row_number() OVER (PARTITION BY qid
                                ORDER BY s_full DESC, cid) AS rf,
             row_number() OVER (PARTITION BY qid
                                ORDER BY s_half DESC, cid) AS rt
      FROM scored
    ),
    mc AS (
      SELECT qid, greatest(rf, rt) AS m, CAST(count(*) AS BIGINT) AS cnt
      FROM rk WHERE rf <= 10 AND rt <= 10 GROUP BY 1, 2
    ),
    dd AS (
      SELECT * FROM (VALUES
        (1, 1, 10), (2, 9, 200), (3, 81, 3000), (4, 729, 40000),
        (5, 6561, 500000), (6, 59049, 6000000), (7, 531441, 70000000),
        (8, 4782969, 800000000), (9, 43046721, 9000000000),
        (10, 387420489, 100000000000)) AS t(d, pnum, pden)
    ),
    ov AS (
      SELECT p.qid, dd.d, dd.pnum, dd.pden,
             CAST(coalesce(sum(mc.cnt), 0) AS BIGINT) AS ov_d
      FROM panel p CROSS JOIN dd
      LEFT JOIN mc ON mc.qid = p.qid AND mc.m <= dd.d
      GROUP BY 1, 2, 3, 4
    )
    SELECT qid AS vec_id,
           CAST(sum((1000000 * CAST(pnum AS BIGINT) * ov_d)
                    // pden) AS BIGINT)
             AS rbo10_micro,
           CAST(max(CASE WHEN d = 10 THEN ov_d END) AS BIGINT)
             AS overlap_at_10
    FROM ov GROUP BY 1 ORDER BY 1
    """,
    doc="Rank-biased overlap (Webber et al., p = 0.9, truncated at depth "
    "10) between each panel query's FULL 64-dim top-10 neighbors and "
    "its Matryoshka-truncated 32-dim top-10: RBO = (1-p) sum p^(d-1) "
    "|A_d n B_d| / d — the top-weighted set-overlap that grades HOW a "
    "truncated index disagrees (rank 1 swaps cost more than rank 10), "
    "upgrading embedding_truncation_fidelity's top-1 agreement and "
    "similarity_recall_at_k's unweighted recall. Exact integer dot "
    "products over the shared deci-milli quantization, deterministic "
    "(score, id) ties; each bounded depth term floor-quantizes "
    "(1e6 9^(d-1) ov_d) / (10^d d) with the geometric weights carried "
    "as exact integer literal pairs. Bounded 20-query panel NLJ "
    "(allowlisted) + per-query rank windows.",
)
def similarity_rank_biased_overlap(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    e = table(spark, sf_dir, "embeddings", parallel=True).select(
        "vec_id", F.expr(_QV).alias("qv")
    )
    panel = e.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("qid"), F.col("qv").alias("qqv")
    )
    dot = lambda n: F.aggregate(  # noqa: E731
        F.zip_with(
            F.slice("qqv", 1, n), F.slice("qv", 1, n), lambda a, b: a * b
        ),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    scored = (
        e.crossJoin(F.broadcast(panel))
        .filter(F.col("vec_id") != F.col("qid"))
        .select(
            "qid",
            F.col("vec_id").alias("cid"),
            dot(64).alias("s_full"),
            dot(32).alias("s_half"),
        )
    )
    wf = Window.partitionBy("qid").orderBy(F.col("s_full").desc(), "cid")
    wt = Window.partitionBy("qid").orderBy(F.col("s_half").desc(), "cid")
    rk = scored.select(
        "qid",
        "cid",
        F.row_number().over(wf).alias("rf"),
        F.row_number().over(wt).alias("rt"),
    )
    mc = (
        rk.filter((F.col("rf") <= 10) & (F.col("rt") <= 10))
        .groupBy("qid", F.greatest("rf", "rt").alias("m"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    dd = spark.createDataFrame(
        [(d, 9 ** (d - 1), 10**d * d) for d in range(1, 11)],
        "d int, pnum bigint, pden bigint",
    )
    # theta join (m <= d) on the bounded 200-row scaffold
    grid = panel.select("qid").crossJoin(F.broadcast(dd))
    ov = (
        grid.join(
            F.broadcast(mc.withColumnRenamed("qid", "mqid")),
            (F.col("mqid") == F.col("qid")) & (F.col("m") <= F.col("d")),
            "left",
        )
        .groupBy("qid", "d", "pnum", "pden")
        .agg(F.coalesce(F.sum("cnt"), F.lit(0)).alias("ov_d"))
    )
    return (
        ov.groupBy(F.col("qid").alias("vec_id"))
        .agg(
            F.sum(
                F.expr("(1000000 * pnum * ov_d) div pden")
            )
            .cast("bigint")
            .alias("rbo10_micro"),
            F.max(F.when(F.col("d") == 10, F.col("ov_d")))
            .cast("bigint")
            .alias("overlap_at_10"),
        )
        .orderBy("vec_id")
    )


# ---------------------------------------------------------------------------
# embedding_kcenter_coreset — greedy Gonzalez k-center selection (k = 4)
# ---------------------------------------------------------------------------


@register(
    "embedding_kcenter_coreset",
    oracle=f"""
    WITH q AS (
      SELECT vec_id, {_QV_SQL} AS qv FROM embeddings
    ),
    c1 AS (SELECT vec_id, qv FROM q ORDER BY vec_id LIMIT 1),
    d1 AS (
      SELECT p.vec_id, p.qv,
             CAST(list_sum(list_transform(range(64), i ->
               (p.qv[CAST(i AS INT) + 1] - c.qv[CAST(i AS INT) + 1])
               * (p.qv[CAST(i AS INT) + 1] - c.qv[CAST(i AS INT) + 1])))
               AS BIGINT) AS dm
      FROM q p, c1 c
    ),
    n2 AS (SELECT vec_id, qv FROM d1 ORDER BY dm DESC, vec_id LIMIT 1),
    d2 AS (
      SELECT p.vec_id, p.qv,
             least(p.dm, CAST(list_sum(list_transform(range(64), i ->
               (p.qv[CAST(i AS INT) + 1] - c.qv[CAST(i AS INT) + 1])
               * (p.qv[CAST(i AS INT) + 1] - c.qv[CAST(i AS INT) + 1])))
               AS BIGINT)) AS dm
      FROM d1 p, n2 c
    ),
    n3 AS (SELECT vec_id, qv FROM d2 ORDER BY dm DESC, vec_id LIMIT 1),
    d3 AS (
      SELECT p.vec_id, p.qv,
             least(p.dm, CAST(list_sum(list_transform(range(64), i ->
               (p.qv[CAST(i AS INT) + 1] - c.qv[CAST(i AS INT) + 1])
               * (p.qv[CAST(i AS INT) + 1] - c.qv[CAST(i AS INT) + 1])))
               AS BIGINT)) AS dm
      FROM d2 p, n3 c
    ),
    n4 AS (SELECT vec_id, qv FROM d3 ORDER BY dm DESC, vec_id LIMIT 1),
    d4 AS (
      SELECT least(p.dm, CAST(list_sum(list_transform(range(64), i ->
               (p.qv[CAST(i AS INT) + 1] - c.qv[CAST(i AS INT) + 1])
               * (p.qv[CAST(i AS INT) + 1] - c.qv[CAST(i AS INT) + 1])))
               AS BIGINT)) AS dm
      FROM d3 p, n4 c
    )
    SELECT 1 AS step, (SELECT vec_id FROM c1) AS center_id,
           (SELECT CAST(max(dm) AS BIGINT) FROM d1)
             AS coverage_radius_sq
    UNION ALL SELECT 2, (SELECT vec_id FROM n2),
           (SELECT CAST(max(dm) AS BIGINT) FROM d2)
    UNION ALL SELECT 3, (SELECT vec_id FROM n3),
           (SELECT CAST(max(dm) AS BIGINT) FROM d3)
    UNION ALL SELECT 4, (SELECT vec_id FROM n4),
           (SELECT CAST(max(dm) AS BIGINT) FROM d4)
    ORDER BY step
    """,
    doc="Greedy k-center (Gonzalez) coreset selection over the embedding "
    "corpus, k = 4: start at the lowest vec_id, then repeatedly take "
    "the point FARTHEST from its nearest chosen center (exact integer "
    "squared L2 over the shared deci-milli quantization, (distance, "
    "id) ties deterministic) — the 2-approximation to optimal k-center "
    "whose selected points are the classic diversity coreset for "
    "curation and the robust seeding for kmeans_embeddings (farthest-"
    "point beats random init on separated data). Per round ONE "
    "argmax row collects to the driver and re-enters as a literal "
    "(the kmeans/bpe_learn_merges driver-loop precedent — 4 bounded "
    "rounds, never data-proportional); coverage_radius_sq after each "
    "round is the max min-distance, i.e. the NEXT center's distance. "
    "Oracle unrolls the rounds as chained CTEs.",
)
def embedding_kcenter_coreset(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "embeddings", parallel=True).select(
        "vec_id", F.expr(_QV).alias("qv")
    )

    def d2_to(center_vals: list[int]) -> F.Column:
        lits = F.array(*[F.lit(int(v)).cast("bigint") for v in center_vals])
        return F.aggregate(
            F.zip_with("qv", lits, lambda a, b: (a - b) * (a - b)),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + x,
        )

    first = (
        e.orderBy("vec_id").limit(1).select("vec_id", "qv").collect()[0]
    )
    rows = []
    df = e.withColumn("dm", d2_to(list(first["qv"])))
    center_id = int(first["vec_id"])
    for step in (1, 2, 3):
        far = (
            df.orderBy(F.col("dm").desc(), "vec_id")
            .limit(1)
            .select("vec_id", "qv", "dm")
            .collect()[0]
        )
        rows.append((step, center_id, int(far["dm"])))
        center_id = int(far["vec_id"])
        df = df.withColumn(
            "dm", F.least(F.col("dm"), d2_to(list(far["qv"])))
        )
    last_radius = df.agg(F.max("dm").alias("r")).collect()[0]["r"]
    rows.append((4, center_id, int(last_radius)))
    return spark.createDataFrame(
        rows, "step int, center_id bigint, coverage_radius_sq bigint"
    ).orderBy("step")


# ---------------------------------------------------------------------------
# multimodal_webp_vp8x_parse — 24-bit LE minus-one canvas dimensions
# ---------------------------------------------------------------------------


def _hex_le24(c: F.Column) -> F.Column:
    b = F.lpad(F.hex(c), 6, "0")
    return F.concat(
        F.substring(b, 5, 2), F.substring(b, 3, 2), F.substring(b, 1, 2)
    )


@register(
    "multimodal_webp_vp8x_parse",
    oracle="""
    SELECT doc_id,
           CAST(doc_id % 2048 + 1 AS BIGINT) AS width,
           CAST((doc_id * 5) % 1536 + 1 AS BIGINT) AS height,
           CAST(doc_id % 2 AS BIGINT) AS has_alpha,
           CAST((doc_id // 2) % 2 AS BIGINT) AS has_animation,
           CAST(22 AS BIGINT) AS riff_size
    FROM documents ORDER BY doc_id
    """,
    doc="REAL WebP VP8X extended-header parsing under the driver's hash "
    "check: per doc, construct a RIFF/WEBP container with a VP8X chunk "
    "(feature-flag byte with the alpha/animation bits, canvas "
    "dimensions stored as 24-BIT LITTLE-ENDIAN MINUS-ONE integers — "
    "the one dimension encoding in the walker suite that is neither "
    "byte-width-standard nor value-literal) and recover dimensions, "
    "feature flags and the RIFF size with the real parser "
    "(multimodal.parse_webp_vp8x). Map-only; zero shuffles.",
)
def multimodal_webp_vp8x_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mongodb_nats_connector_spark.operators.multimodal import (
        WEBP_VP8X_SCHEMA,
        _webp_vp8x_batches,
    )

    d = table(spark, sf_dir, "documents", parallel=True).select(
        "doc_id",
        (F.col("doc_id") % 2048 + 1).alias("w"),
        ((F.col("doc_id") * 5) % 1536 + 1).alias("h"),
        (F.col("doc_id") % 2).alias("alpha"),
        ((F.col("doc_id") / 2).cast("bigint") % 2).alias("anim"),
    )
    flags = F.lpad(
        F.hex(F.col("alpha") * 16 + F.col("anim") * 2), 2, "0"
    )
    webp_hex = F.concat(
        F.lit("52494646"),              # RIFF
        _hex_le32(F.lit(22)),
        F.lit("57454250"),              # WEBP
        F.lit("56503858"),              # VP8X
        _hex_le32(F.lit(10)),
        flags,
        F.lit("000000"),                # reserved
        _hex_le24(F.col("w") - 1),
        _hex_le24(F.col("h") - 1),
    )
    return (
        d.select("doc_id", F.unhex(webp_hex).alias("payload"))
        .mapInPandas(_webp_vp8x_batches, WEBP_VP8X_SCHEMA)
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# multimodal_id3v2_syncsafe — 7-bit syncsafe sizes + frame walk
# ---------------------------------------------------------------------------


@register(
    "multimodal_id3v2_syncsafe",
    oracle="""
    WITH d AS (
      SELECT doc_id, 1 + doc_id % 3 AS nf FROM documents
    )
    SELECT doc_id,
           CAST(3 AS BIGINT) AS version_major,
           CAST(list_sum(list_transform(range(nf), i ->
                10 + 5 + (doc_id + i) % 20)) AS BIGINT) AS tag_size,
           CAST(nf AS BIGINT) AS n_frames,
           CAST(list_sum(list_transform(range(nf), i ->
                5 + (doc_id + i) % 20)) AS BIGINT) AS frame_bytes
    FROM d ORDER BY doc_id
    """,
    doc="REAL ID3v2.3 tag parsing under the driver's hash check: per doc, "
    "construct an ID3 header whose 28-bit tag size is SYNCSAFE-encoded "
    "(7 useful bits per byte, MSBs forced 0 — the unsynchronization-"
    "proof integer grammar unique to MP3 metadata) followed by 1-3 "
    "TITn frames with big-endian sizes, then recover version, decoded "
    "tag size, frame census and frame payload bytes with the real "
    "parser (multimodal.parse_id3v2) — which validates every syncsafe "
    "MSB and every frame-id character class. Map-only; zero shuffles.",
)
def multimodal_id3v2_syncsafe(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mongodb_nats_connector_spark.operators.multimodal import (
        ID3V2_SCHEMA,
        _id3v2_batches,
    )

    d = table(spark, sf_dir, "documents", parallel=True).select(
        "doc_id", (1 + F.col("doc_id") % 3).alias("nf")
    )
    # total payload size of all frames (10-byte frame headers included)
    tag_size = F.expr(
        "aggregate(sequence(0, CAST(nf - 1 AS INT)),"
        " CAST(0 AS BIGINT), (a, i) -> a + 15 + (doc_id + i) % 20)"
    )
    syncsafe = F.concat(
        F.lpad(F.hex((tag_size / 2097152).cast("bigint") % 128), 2, "0"),
        F.lpad(F.hex((tag_size / 16384).cast("bigint") % 128), 2, "0"),
        F.lpad(F.hex((tag_size / 128).cast("bigint") % 128), 2, "0"),
        F.lpad(F.hex(tag_size % 128), 2, "0"),
    )
    frames = F.expr(
        "concat_ws('', transform(sequence(0, CAST(nf - 1 AS INT)), i ->"
        " concat("
        "  '544954', lpad(hex(49 + i), 2, '0'),"       # 'TIT1'..'TIT3'
        "  lpad(hex(5 + (doc_id + i) % 20), 8, '0'),"  # BE32 frame size
        "  '0000',"                                    # flags
        "  repeat('41', CAST(5 + (doc_id + i) % 20 AS INT)))))"
    )
    id3_hex = F.concat(
        F.lit("494433"),                # 'ID3'
        F.lit("030000"),                # v2.3, flags 0
        syncsafe,
        frames,
    )
    return (
        d.select("doc_id", F.unhex(id3_hex).alias("payload"))
        .mapInPandas(_id3v2_batches, ID3V2_SCHEMA)
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# customer_hill_diversity — Hill-number diversity profile per nation
# ---------------------------------------------------------------------------


@register(
    "customer_hill_diversity",
    oracle="""
    WITH cells AS (
      SELECT c_nationkey AS nation, c_mktsegment AS seg,
             CAST(count(*) AS HUGEINT) AS c
      FROM customer GROUP BY 1, 2
    ),
    t AS (
      SELECT nation, CAST(sum(c) AS HUGEINT) AS n,
             CAST(count(*) AS BIGINT) AS k,
             CAST(sum(c * c) AS HUGEINT) AS c2
      FROM cells GROUP BY 1
    )
    SELECT t.nation, CAST(t.n AS BIGINT) AS n_customers,
           t.k AS hill0_richness,
           CAST(sum(CAST(floor(1000000.0 * cl.c *
                ln(CAST(t.n AS DOUBLE) / cl.c)) AS BIGINT)) AS BIGINT)
             AS h_nscaled_micro,
           CAST((1000000 * t.n * t.n) // t.c2 AS BIGINT)
             AS hill2_invsimpson_ppm
    FROM cells cl JOIN t ON t.nation = cl.nation
    GROUP BY 1, 2, 3, 5
    ORDER BY 1
    """,
    doc="Hill-number diversity profile of each nation's market-segment "
    "mix: q = 0 (richness, the segment count), q = 1 (Shannon, emitted "
    "as the exact n-scaled micro-nat entropy like events_permutation_"
    "entropy) and q = 2 (inverse Simpson n^2 / sum c^2, EXACT in ppm) "
    "— the one-parameter family that unifies the diversity zoo "
    "(orders_blau_diversity is 1 - 1/hill2 rescaled; the Hill ordering "
    "hill0 >= exp(H) >= hill2 is pinned in tests). Per-cell quantized "
    "ln only on the <= 5 bounded segment cells; one rollup + 125-cell "
    "reduce.",
)
def customer_hill_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    cells = c.groupBy(
        F.col("c_nationkey").alias("nation"),
        F.col("c_mktsegment").alias("seg"),
    ).agg(F.count(F.lit(1)).cast("decimal(38,0)").alias("c"))
    t = cells.groupBy("nation").agg(
        F.sum("c").alias("n"),
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum(F.col("c") * F.col("c")).alias("c2"),
    )
    return (
        cells.join(F.broadcast(t), "nation")
        .groupBy(
            "nation",
            F.col("n").cast("bigint").alias("n_customers"),
            F.col("k").alias("hill0_richness"),
            F.expr(
                "CAST((1000000 * n * n) div c2 AS BIGINT)"
            ).alias("hill2_invsimpson_ppm"),
        )
        .agg(
            F.sum(
                F.floor(
                    1000000.0
                    * F.col("c")
                    * F.log(F.col("n").cast("double") / F.col("c"))
                ).cast("bigint")
            )
            .cast("bigint")
            .alias("h_nscaled_micro")
        )
        .select(
            "nation",
            "n_customers",
            "hill0_richness",
            "h_nscaled_micro",
            "hill2_invsimpson_ppm",
        )
        .orderBy("nation")
    )


# ---------------------------------------------------------------------------
# events_extremal_index — runs-declustered extremal index of daily spikes
# ---------------------------------------------------------------------------


@register(
    "events_extremal_index",
    oracle="""
    WITH d AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(count(*) AS BIGINT) AS x
      FROM events GROUP BY 1, 2
    ),
    t AS (
      SELECT event_type, CAST(count(*) AS HUGEINT) AS n,
             CAST(sum(x) AS HUGEINT) AS s,
             CAST(count(*) AS HUGEINT) * sum(x * x)
               - CAST(sum(x) AS HUGEINT) * sum(x) AS v2
      FROM d GROUP BY 1
    ),
    e AS (
      SELECT d.event_type, d.day,
             CASE WHEN t.n * d.x - t.s > 0
                   AND (t.n * d.x - t.s) * (t.n * d.x - t.s) > t.v2
                  THEN 1 ELSE 0 END AS exc
      FROM d JOIN t ON t.event_type = d.event_type
    ),
    r AS (
      SELECT event_type, exc,
             lag(exc, 1, 0) OVER (PARTITION BY event_type ORDER BY day)
               AS prev
      FROM e
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_days,
           CAST(sum(exc) AS BIGINT) AS n_exceedances,
           CAST(sum(CASE WHEN exc = 1 AND prev = 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_clusters,
           CAST((1000000 * sum(CASE WHEN exc = 1 AND prev = 0
                               THEN 1 ELSE 0 END))
                // greatest(sum(exc), 1) AS BIGINT) AS theta_ppm
    FROM r GROUP BY 1 ORDER BY 1
    """,
    doc="Runs-declustered extremal index of each event type's daily "
    "volume spikes: exceedances are days more than one population sigma "
    "above the mean (the exact integer test (n x - S)^2 > n sum x^2 - "
    "S^2 with the positive sign required), clusters are maximal runs "
    "of consecutive exceedance days, and theta = clusters / "
    "exceedances estimates the extremal index — theta ~ 1 means "
    "spikes arrive independently, theta << 1 means they CLUSTER (one "
    "incident spanning days), the quantity that corrects events_peak_"
    "over_threshold's effective sample size and return periods. All-"
    "integer; one rollup, totals broadcast, one partitioned lag.",
)
def events_extremal_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    d = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("x"))
    t = d.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.sum("x").cast("decimal(38,0)").alias("s"),
        (
            F.count(F.lit(1)).cast("decimal(38,0)")
            * F.sum(F.col("x") * F.col("x"))
            - F.sum("x").cast("decimal(38,0)") * F.sum("x")
        ).alias("v2"),
    )
    dev = F.col("n") * F.col("x") - F.col("s")
    e = d.join(F.broadcast(t), "event_type").select(
        "event_type",
        "day",
        F.when((dev > 0) & (dev * dev > F.col("v2")), 1)
        .otherwise(0)
        .alias("exc"),
    )
    w = Window.partitionBy("event_type").orderBy("day")
    r = e.select(
        "event_type", "exc", F.lag("exc", 1, 0).over(w).alias("prev")
    )
    return (
        r.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_days"),
            F.sum("exc").cast("bigint").alias("n_exceedances"),
            F.sum(
                F.when((F.col("exc") == 1) & (F.col("prev") == 0), 1)
                .otherwise(0)
            )
            .cast("bigint")
            .alias("n_clusters"),
            F.expr(
                "CAST((1000000 * sum(CASE WHEN exc = 1 AND prev = 0"
                " THEN 1 ELSE 0 END)) div greatest(sum(exc), 1)"
                " AS BIGINT)"
            ).alias("theta_ppm"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# agg_moment_ratio_diagram — Pearson (b1, b2) plane per priority
# ---------------------------------------------------------------------------


@register(
    "agg_moment_ratio_diagram",
    oracle="""
    WITH g AS (
      SELECT o_orderpriority AS pri,
             CAST(round(l_quantity) AS HUGEINT) AS v
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    ),
    m AS (
      SELECT pri,
             CAST(count(*) AS HUGEINT) AS n,
             CAST(sum(v) AS HUGEINT) AS s1,
             CAST(sum(v * v) AS HUGEINT) AS s2,
             CAST(sum(v * v * v) AS HUGEINT) AS s3,
             CAST(sum(v * v * v * v) AS HUGEINT) AS s4
      FROM g GROUP BY 1
    ),
    q AS (
      SELECT pri, n,
             (1000000 * (n * s2 - s1 * s1)) // (n * n) AS m2_micro,
             CASE WHEN n * n * s3 - 3 * n * s1 * s2 + 2 * s1 * s1 * s1
                       >= 0
                  THEN (1000 * (n * n * s3 - 3 * n * s1 * s2
                                + 2 * s1 * s1 * s1)) // (n * n * n)
                  ELSE -((1000 * (3 * n * s1 * s2 - n * n * s3
                                  - 2 * s1 * s1 * s1)) // (n * n * n))
             END AS m3_milli,
             1000000 * ((n * n * n * s4 - 4 * n * n * s1 * s3
                         + 6 * n * s1 * s1 * s2 - 3 * s1 * s1 * s1 * s1)
                        // (n * n * n * n))
               + (1000000 * ((n * n * n * s4 - 4 * n * n * s1 * s3
                              + 6 * n * s1 * s1 * s2
                              - 3 * s1 * s1 * s1 * s1)
                             % (n * n * n * n)))
                 // (n * n * n * n) AS m4_micro
      FROM m
    )
    SELECT pri, CAST(n AS BIGINT) AS n_lines,
           CAST(m3_milli AS BIGINT) AS m3_milli,
           CAST((1000000000000000000 * m3_milli * m3_milli)
                // (m2_micro * m2_micro * m2_micro) AS BIGINT)
             AS skew2_b1_ppm,
           CAST((1000000000000 * m4_micro) // (m2_micro * m2_micro)
                AS BIGINT) AS kurtosis_b2_ppm,
           CAST(CASE WHEN (1000000000000 * m4_micro)
                          // (m2_micro * m2_micro)
                          >= (1000000000000000000 * m3_milli * m3_milli)
                             // (m2_micro * m2_micro * m2_micro)
                          + 1000000
                     THEN 1 ELSE 0 END AS BIGINT) AS pearson_bound_holds
    FROM q ORDER BY pri
    """,
    doc="Pearson moment-ratio diagram coordinates (b1 = skewness^2, b2 = "
    "kurtosis) of rounded quantities per order priority — the (b1, b2) "
    "plane that classifies candidate distributions (uniform at (0, "
    "1.8), normal at (0, 3), the impossible region b2 < b1 + 1 below "
    "the boundary, emitted as a flag) — the distribution-shape "
    "companion that places agg_jarque_bera's two inputs on the map "
    "instead of collapsing them to one test. Central moments come "
    "from the exact integer identities n^2 m2 = n S2 - S^2, n^3 m3 = "
    "n^2 S3 - 3 n S S2 + 2 S^3, n^4 m4 = n^3 S4 - 4 n^2 S S3 + "
    "6 n S^2 S2 - 3 S^4, each floor-quantized once (micro/milli, "
    "sign-split m3), then the ratios are integer divisions of the "
    "quantized values. The m4 quantizer uses the exact split "
    "floor(1e6*a/b) = 1e6*(a div b) + (1e6*(a mod b)) div b so no "
    "intermediate exceeds the raw numerator — integer headroom holds "
    "through ~sf40 per priority group (n^3*s4 reaches 1e38 at ~5e7 "
    "rows/group); beyond that the pre-aggregated-cube swap applies. "
    "One fact join + 5-group moment rollup.",
)
def agg_moment_ratio_diagram(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    g = li.join(o, li.l_orderkey == o.o_orderkey).select(
        F.col("o_orderpriority").alias("pri"),
        F.round("l_quantity").cast("decimal(38,0)").alias("v"),
    )
    m = g.groupBy("pri").agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.sum("v").alias("s1"),
        F.sum(F.col("v") * F.col("v")).alias("s2"),
        F.sum(F.col("v") * F.col("v") * F.col("v")).alias("s3"),
        F.sum(
            F.col("v") * F.col("v") * F.col("v") * F.col("v")
        ).alias("s4"),
    )
    q = m.select(
        "pri",
        "n",
        F.expr(
            "CAST((1000000 * (n * s2 - s1 * s1)) div (n * n)"
            " AS DECIMAL(38,0))"
        ).alias("m2_micro"),
        F.expr(
            "CASE WHEN n * n * s3 - 3 * n * s1 * s2"
            " + 2 * s1 * s1 * s1 >= 0"
            " THEN (1000 * (n * n * s3 - 3 * n * s1 * s2"
            " + 2 * s1 * s1 * s1)) div (n * n * n)"
            " ELSE -((1000 * (3 * n * s1 * s2 - n * n * s3"
            " - 2 * s1 * s1 * s1)) div (n * n * n)) END"
        ).cast("decimal(38,0)").alias("m3_milli"),
        # Exact split of floor(1e6*a/b) as 1e6*(a div b) + (1e6*(a mod b))
        # div b (a >= 0 since a = n^4*m4): 1e6*a itself would exceed
        # DECIMAL(38,0)/HUGEINT near sf10 (ADVICE r13); the split form's
        # largest intermediate is the numerator itself, pushing the
        # documented headroom to ~sf40 per priority group (n^3*s4 ~
        # 1.25e6*n^4 hits 1e38 at n ~ 5e7 rows/group).
        F.expr(
            "CAST(1000000 AS DECIMAL(38,0))"
            " * ((n * n * n * s4 - 4 * n * n * s1 * s3"
            " + 6 * n * s1 * s1 * s2 - 3 * s1 * s1 * s1 * s1)"
            " div (n * n * n * n))"
            " + (CAST(1000000 AS DECIMAL(38,0))"
            " * ((n * n * n * s4 - 4 * n * n * s1 * s3"
            " + 6 * n * s1 * s1 * s2 - 3 * s1 * s1 * s1 * s1)"
            " % (n * n * n * n)))"
            " div (n * n * n * n)"
        ).cast("decimal(38,0)").alias("m4_micro"),
    )
    b1 = (
        "(CAST(1000000000000000000 AS DECIMAL(38,0)) * m3_milli"
        " * m3_milli) div (m2_micro * m2_micro * m2_micro)"
    )
    b2 = (
        "(CAST(1000000000000 AS DECIMAL(38,0)) * m4_micro)"
        " div (m2_micro * m2_micro)"
    )
    return q.select(
        "pri",
        F.col("n").cast("bigint").alias("n_lines"),
        F.col("m3_milli").cast("bigint").alias("m3_milli"),
        F.expr(f"CAST({b1} AS BIGINT)").alias("skew2_b1_ppm"),
        F.expr(f"CAST({b2} AS BIGINT)").alias("kurtosis_b2_ppm"),
        F.expr(
            f"CAST(CASE WHEN {b2} >= {b1} + 1000000 THEN 1 ELSE 0 END"
            " AS BIGINT)"
        ).alias("pearson_bound_holds"),
    ).orderBy("pri")


# ---------------------------------------------------------------------------
# events_hourly_uniformity_chi2 — chi-square GOF vs the uniform clock
# ---------------------------------------------------------------------------


@register(
    "events_hourly_uniformity_chi2",
    oracle="""
    WITH h AS (
      SELECT event_type, hour(ts) AS hr,
             CAST(count(*) AS HUGEINT) AS c
      FROM events GROUP BY 1, 2
    ),
    t AS (
      SELECT event_type, CAST(sum(c) AS HUGEINT) AS n,
             CAST(count(*) AS BIGINT) AS k
      FROM h GROUP BY 1
    )
    SELECT t.event_type, CAST(t.n AS BIGINT) AS n_events,
           t.k AS n_hours_observed,
           CAST((1000 * sum((24 * h.c - t.n) * (24 * h.c - t.n))
                 + CASE WHEN t.k < 24
                        THEN 1000 * (24 - t.k) * t.n * t.n ELSE 0 END)
                // (24 * t.n) AS BIGINT) AS chi2_milli
    FROM h JOIN t ON t.event_type = h.event_type
    GROUP BY t.event_type, t.n, t.k
    ORDER BY 1
    """,
    doc="Pearson chi-square goodness-of-fit of each event type's hour-of-"
    "day distribution against the uniform clock: chi2 = sum_h (c_h - "
    "n/24)^2 / (n/24), cleared to the exact integer form sum (24 c_h "
    "- n)^2 / (24 n) with absent hours contributing their full n^2 "
    "expectation term — the formal 23-df test behind events_hourly_"
    "profile's descriptive panel and the chi-square-family sibling of "
    "the sup-based agg_ks_uniform_gof (chi2 sees diffuse lumpiness, "
    "KS sees one displaced mass). All-integer, milli; one bounded "
    "24-cell rollup per type.",
)
def events_hourly_uniformity_chi2(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    h = ev.groupBy(
        "event_type", F.hour("ts").alias("hr")
    ).agg(F.count(F.lit(1)).cast("decimal(38,0)").alias("c"))
    t = h.groupBy("event_type").agg(
        F.sum("c").alias("n"),
        F.count(F.lit(1)).cast("bigint").alias("k"),
    )
    return (
        h.join(F.broadcast(t), "event_type")
        .groupBy("event_type", "n", "k")
        .agg(
            F.expr(
                "CAST((1000 * sum((24 * c - n) * (24 * c - n))"
                " + CASE WHEN k < 24"
                " THEN 1000 * (24 - k) * n * n ELSE 0 END)"
                " div (24 * n) AS BIGINT)"
            ).alias("chi2_milli")
        )
        .select(
            "event_type",
            F.col("n").cast("bigint").alias("n_events"),
            F.col("k").alias("n_hours_observed"),
            "chi2_milli",
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# agg_multiclass_mcc — Gorodkin R_K correlation on the 5x5 confusion
# ---------------------------------------------------------------------------


@register(
    "agg_multiclass_mcc",
    oracle="""
    WITH c AS (
      SELECT CAST(substring(o_orderpriority, 1, 1) AS BIGINT) AS actual,
             least(5, 1 + CAST(round(o_totalprice * 100) AS BIGINT)
                          // 10000000) AS pred
      FROM orders
    ),
    cells AS (
      SELECT actual, pred, CAST(count(*) AS HUGEINT) AS n
      FROM c GROUP BY 1, 2
    ),
    t AS (
      SELECT CAST(sum(n) AS HUGEINT) AS nn,
             CAST(sum(CASE WHEN actual = pred THEN n ELSE 0 END)
                  AS HUGEINT) AS tr
      FROM cells
    ),
    marg AS (
      SELECT CAST(sum(a.ta * p.pa) AS HUGEINT) AS tp,
             CAST(sum(a.ta * a.ta) AS HUGEINT) AS t2,
             CAST(sum(p.pa * p.pa) AS HUGEINT) AS p2
      FROM (SELECT actual AS k, sum(n) AS ta FROM cells GROUP BY 1) a
      FULL JOIN (SELECT pred AS k, sum(n) AS pa FROM cells GROUP BY 1) p
        ON p.k = a.k
    ),
    f AS (
      SELECT t.nn, t.tr,
             t.nn * t.tr - coalesce(m.tp, 0) AS num,
             t.nn * t.nn - coalesce(m.t2, 0) AS dt,
             t.nn * t.nn - coalesce(m.p2, 0) AS dp
      FROM t, (SELECT sum(tp) AS tp, sum(t2) AS t2, sum(p2) AS p2
               FROM (SELECT coalesce(tp, 0) AS tp, coalesce(t2, 0) AS t2,
                            coalesce(p2, 0) AS p2 FROM marg)) m
    )
    SELECT CAST(nn AS BIGINT) AS n_orders,
           CAST(tr AS BIGINT) AS n_diagonal,
           CAST(CASE WHEN num >= 0 THEN 1 ELSE -1 END AS BIGINT)
             AS mcc_sign,
           CAST((1000000 * num * num) // greatest(dt * dp, 1) AS BIGINT)
             AS mcc2_ppm
    FROM f
    """,
    doc="Multiclass Matthews correlation (Gorodkin's R_K) between the "
    "5-level order priority and a totalprice band prediction ($100k "
    "bands, capped at 5): R_K = (N tr(C) - sum_k t_k p_k) / "
    "sqrt((N^2 - sum t^2)(N^2 - sum p^2)) — the chance-corrected "
    "multiclass accuracy that agg_matthews_corr provides only for the "
    "binary case and agg_cohen_kappa approximates with a different "
    "chance model. Squared and sign-split to one exact integer ratio "
    "over the bounded 5x5 confusion's marginals (FULL-joined so a "
    "class absent on either side still contributes its square). One "
    "conditional-projection rollup, bounded reduces.",
)
def agg_multiclass_mcc(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    c = o.select(
        F.substring("o_orderpriority", 1, 1).cast("bigint").alias("actual"),
        F.least(
            F.lit(5),
            1
            + F.expr(
                "CAST(round(o_totalprice * 100) AS BIGINT) div 10000000"
            ),
        ).alias("pred"),
    )
    cells = c.groupBy("actual", "pred").agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n")
    )
    t = cells.agg(
        F.sum("n").alias("nn"),
        F.sum(
            F.when(F.col("actual") == F.col("pred"), F.col("n")).otherwise(
                0
            )
        ).alias("tr"),
    )
    ta = cells.groupBy(F.col("actual").alias("k")).agg(
        F.sum("n").alias("ta")
    )
    pa = cells.groupBy(F.col("pred").alias("k")).agg(
        F.sum("n").alias("pa")
    )
    marg = (
        ta.join(pa, "k", "full")
        .select(
            F.coalesce(F.col("ta"), F.lit(0).cast("decimal(38,0)")).alias(
                "ta"
            ),
            F.coalesce(F.col("pa"), F.lit(0).cast("decimal(38,0)")).alias(
                "pa"
            ),
        )
        .agg(
            F.sum(F.col("ta") * F.col("pa")).alias("tp"),
            F.sum(F.col("ta") * F.col("ta")).alias("t2"),
            F.sum(F.col("pa") * F.col("pa")).alias("p2"),
        )
    )
    return t.crossJoin(F.broadcast(marg)).select(
        F.col("nn").cast("bigint").alias("n_orders"),
        F.col("tr").cast("bigint").alias("n_diagonal"),
        F.expr(
            "CAST(CASE WHEN nn * tr - tp >= 0 THEN 1 ELSE -1 END"
            " AS BIGINT)"
        ).alias("mcc_sign"),
        F.expr(
            "CAST((1000000 * (nn * tr - tp) * (nn * tr - tp))"
            " div greatest((nn * nn - t2) * (nn * nn - p2), 1)"
            " AS BIGINT)"
        ).alias("mcc2_ppm"),
    )


# ---------------------------------------------------------------------------
# multimodal_gzip_member_header — flag-conditional optional fields
# ---------------------------------------------------------------------------


@register(
    "multimodal_gzip_member_header",
    oracle="""
    WITH d AS (
      SELECT doc_id, doc_id % 2 AS hn,
             CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END AS hc,
             1 + doc_id % 7 AS clen
      FROM documents
    )
    SELECT doc_id,
           CAST(doc_id % 4294967296 AS BIGINT) AS mtime,
           CAST(hn AS BIGINT) AS has_name,
           CAST(hn * 9 AS BIGINT) AS name_len,
           CAST(hc AS BIGINT) AS has_comment,
           CAST(hc * clen AS BIGINT) AS comment_len,
           CAST(10 + hn * 10 + hc * (clen + 1) AS BIGINT) AS header_len
    FROM d ORDER BY doc_id
    """,
    doc="REAL gzip member-header parsing (RFC 1952) under the driver's "
    "hash check: per doc, construct a header whose FLG byte makes the "
    "FNAME ('fileN.txt', null-terminated) and FCOMMENT fields "
    "conditionally PRESENT — the flag-conditional optional-field "
    "grammar none of the fixed-layout walkers exercise — and recover "
    "mtime, the presence flags, the field lengths and the total "
    "header length with the real parser (multimodal."
    "parse_gzip_header), which skips optionals in spec order. The "
    "deflate payload itself stays undecoded (the declared codec-stub "
    "boundary). Map-only; zero shuffles.",
)
def multimodal_gzip_member_header(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from mongodb_nats_connector_spark.operators.multimodal import (
        GZIP_HDR_SCHEMA,
        _gzip_hdr_batches,
    )

    d = table(spark, sf_dir, "documents", parallel=True).select(
        "doc_id",
        (F.col("doc_id") % 2).alias("hn"),
        F.when(F.col("doc_id") % 3 == 0, 1).otherwise(0).alias("hc"),
        (1 + F.col("doc_id") % 7).alias("clen"),
    )
    flg = F.lpad(F.hex(8 * F.col("hn") + 16 * F.col("hc")), 2, "0")
    name_hex = F.when(
        F.col("hn") == 1,
        F.concat(
            F.lit("66696C65"),                       # 'file'
            F.lpad(F.hex(48 + F.col("doc_id") % 10), 2, "0"),
            F.lit("2E74787400"),                     # '.txt\0'
        ),
    ).otherwise("")
    comment_hex = F.when(
        F.col("hc") == 1,
        F.concat(
            F.expr("repeat('63', CAST(clen AS INT))"), F.lit("00")
        ),
    ).otherwise("")
    gz_hex = F.concat(
        F.lit("1F8B08"),
        flg,
        _hex_le32(F.col("doc_id") % F.lit(4294967296)),
        F.lit("00FF"),                               # XFL, OS=unknown
        name_hex,
        comment_hex,
    )
    return (
        d.select("doc_id", F.unhex(gz_hex).alias("payload"))
        .mapInPandas(_gzip_hdr_batches, GZIP_HDR_SCHEMA)
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# multimodal_bson_doc_walk — the reference connector's native payload
# ---------------------------------------------------------------------------


def _hex_le64(c: F.Column) -> F.Column:
    b = F.lpad(F.hex(c), 16, "0")
    return F.concat(
        *[F.substring(b, 17 - 2 * i, 2) for i in range(1, 9)]
    )


@register(
    "multimodal_bson_doc_walk",
    oracle="""
    WITH d AS (
      SELECT doc_id, 1 + doc_id % 3 AS n FROM documents
    )
    SELECT doc_id,
           CAST(n AS BIGINT) AS n_elements,
           CAST(1 AS BIGINT) AS n_int32,
           CAST(CASE WHEN n >= 2 THEN 1 ELSE 0 END AS BIGINT) AS n_int64,
           CAST(CASE WHEN n >= 3 THEN 1 ELSE 0 END AS BIGINT)
             AS n_strings,
           CAST(doc_id % 100000
                + CASE WHEN n >= 2 THEN 7 * doc_id + 1 ELSE 0 END
                AS BIGINT) AS int_value_sum,
           CAST(CASE WHEN n >= 3 THEN 1 + (doc_id + 2) % 5 ELSE 0 END
                AS BIGINT) AS string_bytes
    FROM d ORDER BY doc_id
    """,
    doc="REAL BSON document walking under the driver's hash check — the "
    "wire format of the reference connector's own change events "
    "(/root/reference/internal/mongo/client.go streams BSON documents "
    "that this repo's functions/extjson.py serializes; this operator "
    "parses the binary itself): per doc, construct a BSON document "
    "with 1-3 elements of the int32 (0x10), int64 (0x12) and string "
    "(0x02) element types — little-endian total size, cstring names, "
    "length-prefixed null-terminated strings, 0x00 terminator — and "
    "recover the element census by type, the integer value sum and "
    "the string payload bytes with the real walker "
    "(multimodal.walk_bson_doc), which validates the size frame, the "
    "type bytes and every terminator. Map-only; zero shuffles.",
)
def multimodal_bson_doc_walk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mongodb_nats_connector_spark.operators.multimodal import (
        BSON_DOC_SCHEMA,
        _bson_doc_batches,
    )

    d = table(spark, sf_dir, "documents", parallel=True).select(
        "doc_id",
        (1 + F.col("doc_id") % 3).alias("n"),
        (F.col("doc_id") % 100000).alias("v32"),
        (7 * F.col("doc_id") + 1).alias("v64"),
        (1 + (F.col("doc_id") + 2) % 5).alias("slen"),
    )
    # element sizes: int32 = 8, int64 = 12, string = 9 + slen
    total = (
        F.lit(5)
        + F.lit(8)
        + F.when(F.col("n") >= 2, 12).otherwise(0)
        + F.when(F.col("n") >= 3, 9 + F.col("slen")).otherwise(0)
    )
    e0 = F.concat(
        F.lit("10"), F.lit("6B3000"), _hex_le32(F.col("v32"))
    )
    e1 = F.when(
        F.col("n") >= 2,
        F.concat(F.lit("12"), F.lit("6B3100"), _hex_le64(F.col("v64"))),
    ).otherwise("")
    e2 = F.when(
        F.col("n") >= 3,
        F.concat(
            F.lit("02"),
            F.lit("6B3200"),
            _hex_le32(F.col("slen") + 1),
            F.expr("repeat('76', CAST(slen AS INT))"),
            F.lit("00"),
        ),
    ).otherwise("")
    bson_hex = F.concat(_hex_le32(total), e0, e1, e2, F.lit("00"))
    return (
        d.select("doc_id", F.unhex(bson_hex).alias("payload"))
        .mapInPandas(_bson_doc_batches, BSON_DOC_SCHEMA)
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# multimodal_deflate_fixed_decode — REAL DEFLATE (fixed-Huffman) inflate
# ---------------------------------------------------------------------------

# reverse8(c) for 0 <= c <= 255 via the classic multiply-mask-mod identity
# (0x0202020202 / 0x010884422010 / 1023), exact in 64-bit on both engines.
_REV8_CONST_MUL = 8623620610        # 0x0202020202
_REV8_CONST_MASK = 1136090292240    # 0x010884422010


def _deflate_rev_code(i_expr: str) -> str:
    """SQL for reverse8(fixed-Huffman code of literal L(i)) where
    L(i) = (doc_id*7 + i*31) % 144 and the 8-bit code is 0x30 + L
    (RFC 1951 fixed table, literals 0..143). Emitting an MSB-first
    Huffman code into DEFLATE's LSB-first bit stream is exactly a
    little-endian write of the bit-reversed code."""
    c = f"(48 + ((doc_id * 7 + ({i_expr}) * 31) % 144))"
    return (
        f"((({c} * {_REV8_CONST_MUL}) & {_REV8_CONST_MASK}) % 1023)"
    )


@register(
    "multimodal_deflate_fixed_decode",
    oracle="""
    WITH d AS (
      SELECT doc_id, 16 + doc_id % 17 AS n FROM documents
    ),
    lits AS (
      SELECT doc_id, n,
             list_transform(range(0, n),
                            i -> (doc_id * 7 + i * 31) % 144) AS ls
      FROM d
    )
    SELECT doc_id,
           CAST(n AS BIGINT) AS n_bytes,
           CAST(list_sum(ls) AS BIGINT) AS byte_sum,
           CAST(list_min(ls) AS BIGINT) AS byte_min,
           CAST(list_max(ls) AS BIGINT) AS byte_max,
           CAST(list_sum(list_transform(range(0, n),
                i -> (i + 1) * ls[i + 1])) AS BIGINT) AS stream_checksum
    FROM lits
    ORDER BY doc_id
    """,
    doc="REAL DEFLATE decompression on the hash surface (the round-14 "
    "payload-decode order): per doc, compose an actual RFC 1951 "
    "fixed-Huffman bit stream AS COLUMN EXPRESSIONS — each literal L in "
    "0..143 becomes the 8-bit code 0x30+L, bit-reversed via the "
    "multiply-mask-mod reverse8 identity (MSB-first Huffman emission "
    "into the LSB-first DEFLATE stream IS a little-endian write of the "
    "reversed code), packed after the 3-bit BFINAL/BTYPE header with the "
    "7-bit zero EOB appended — then inflate the payload with zlib's REAL "
    "inflate (wbits=-15, canonical Huffman table walk) over Arrow-batched "
    "mapInPandas and emit decompressed-byte statistics. The weighted "
    "checksum sum((i+1)*b_i) pins the decoded byte ORDER; any bit-packing "
    "error either kills the inflate (typed NULL miss) or scrambles the "
    "checksum. The oracle predicts the decompressed bytes arithmetically "
    "from the literal formula - it never sees DEFLATE. Extends the "
    "payload-decode axis (PCM samples, BMP pixels) to entropy-coded "
    "compression. Map-only; zero shuffles at any scale.",
)
def multimodal_deflate_fixed_decode(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from mongodb_nats_connector_spark.operators.multimodal import (
        DEFLATE_STATS_SCHEMA,
        _deflate_stats_batches,
    )

    r0 = _deflate_rev_code("0")
    rk = _deflate_rev_code("k")
    rkm1 = _deflate_rev_code("k - 1")
    rnm1 = _deflate_rev_code("n - 1")
    # stream bytes (n+2 total): byte0 = header(3 bits)=3 | low5(R0)<<3;
    # byte k = high3(R_{k-1}) | low5(R_k)<<3; byte n = high3(R_{n-1});
    # byte n+1 = EOB/pad zeros.
    payload_hex = F.expr(
        "concat_ws('', transform(sequence(0, n + 1), k -> lpad(hex("
        "CASE WHEN k = 0 THEN 3 + (" + r0 + " % 32) * 8 "
        "WHEN k < n THEN (" + rkm1 + " div 32) + (" + rk + " % 32) * 8 "
        "WHEN k = n THEN (" + rnm1 + " div 32) "
        "ELSE 0 END), 2, '0')))"
    )
    d = table(spark, sf_dir, "documents", parallel=True).select(
        "doc_id", (F.lit(16) + F.col("doc_id") % 17).alias("n")
    )
    return (
        d.select("doc_id", F.unhex(payload_hex).alias("payload"))
        .mapInPandas(_deflate_stats_batches, DEFLATE_STATS_SCHEMA)
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# multimodal_gif_lzw_pixel_decode — full GIF-LZW decompression of pixels
# ---------------------------------------------------------------------------

# 128-entry global color table, entry j = ((5j+1)%256, (3j)%256, (7j)%256):
# doc-independent, so the hex is a module-level literal.
_GIF_GCT_HEX = "".join(
    f"{(j * 5 + 1) % 256:02X}{(j * 3) % 256:02X}{(j * 7) % 256:02X}"
    for j in range(128)
)


@register(
    "multimodal_gif_lzw_pixel_decode",
    oracle="""
    WITH d AS (
      SELECT doc_id,
             CASE WHEN doc_id % 7 = 0 THEN 9
                  ELSE 7 + doc_id % 4 END AS w,
             CASE WHEN doc_id % 7 = 0 THEN 14
                  ELSE 9 + doc_id % 4 END AS h
      FROM documents
    ),
    px AS (
      SELECT doc_id, w, h,
             list_transform(range(0, w * h), i ->
               (doc_id * 11 + 3 * (i % w) + 7 * (i // w)) % 128) AS ps
      FROM d
    )
    SELECT doc_id,
           CAST(w AS BIGINT) AS width,
           CAST(h AS BIGINT) AS height,
           CAST(w * h AS BIGINT) AS n_pixels,
           CAST(list_sum(ps) AS BIGINT) AS index_sum,
           CAST(list_sum(list_transform(range(0, w * h), i ->
                (i + 1) * ps[i + 1])) AS BIGINT) AS raster_checksum,
           CAST(list_sum(list_transform(ps, p ->
                (p * 5 + 1) % 256)) AS BIGINT) AS palette_r_sum
    FROM px
    ORDER BY doc_id
    """,
    doc="REAL GIF-LZW pixel decompression on the hash surface: per doc, "
    "compose a complete GIF89a (logical screen descriptor, 128-entry "
    "global color table, image descriptor, min-code-size 7, LZW data in "
    "sub-blocks) as column expressions; with 8-bit codes the LSB-first "
    "LZW packing is byte-aligned, so the literal-coded stream "
    "[CLEAR, p_0..p_{n-1}, EOI] is column-composable - but the DECODER "
    "(multimodal.lzw_decode_gif) is a complete LZW implementation "
    "(variable width to 12 bits, CLEAR resets, KwKwK case, dictionary "
    "growth) pinned in tests against an independent compressing encoder. "
    "Every 7th doc is sized 9x14 = 126 pixels, driving next_code to "
    "exactly 255: a decoder with an off-by-one in the width-bump "
    "condition reads EOI at 9 bits and scrambles - the boundary sits ON "
    "the oracle surface. The palette-mapped red-channel sum additionally "
    "pins the color-table read. Map-only; zero shuffles at any scale.",
)
def multimodal_gif_lzw_pixel_decode(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from mongodb_nats_connector_spark.operators.multimodal import (
        GIF_PIXEL_SCHEMA,
        _gif_pixel_batches,
    )

    d = table(spark, sf_dir, "documents", parallel=True).select(
        "doc_id",
        F.expr(
            "CASE WHEN doc_id % 7 = 0 THEN 9 ELSE 7 + doc_id % 4 END"
        ).alias("w"),
        F.expr(
            "CASE WHEN doc_id % 7 = 0 THEN 14 ELSE 9 + doc_id % 4 END"
        ).alias("h"),
    ).withColumn("n", F.col("w") * F.col("h"))
    pixels_hex = F.expr(
        "concat_ws('', transform(sequence(0, n - 1), i -> lpad(hex("
        "(doc_id * 11 + 3 * (i % w) + 7 * (i div w)) % 128), 2, '0')))"
    )
    gif_hex = F.concat(
        F.lit("474946383961"),          # 'GIF89a'
        _hex_le16(F.col("w")),
        _hex_le16(F.col("h")),
        F.lit("F60000"),                # GCT present, 128 entries; bg; aspect
        F.lit(_GIF_GCT_HEX),
        F.lit("2C00000000"),            # image descriptor, left=0 top=0
        _hex_le16(F.col("w")),
        _hex_le16(F.col("h")),
        F.lit("00"),                    # no local color table
        F.lit("07"),                    # LZW min code size
        F.lpad(F.hex(F.col("n") + 2), 2, "0"),  # one sub-block: n+2 bytes
        F.lit("80"),                    # CLEAR
        pixels_hex,
        F.lit("81"),                    # EOI
        F.lit("003B"),                  # block terminator + trailer
    )
    return (
        d.select("doc_id", F.unhex(gif_hex).alias("payload"))
        .mapInPandas(_gif_pixel_batches, GIF_PIXEL_SCHEMA)
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# multimodal_png_idat_decode — zlib-wrapped IDAT + filter reconstruction
# ---------------------------------------------------------------------------


@register(
    "multimodal_png_idat_decode",
    oracle="""
    WITH d AS (
      SELECT doc_id, 5 + doc_id % 4 AS w, 4 + doc_id % 3 AS h
      FROM documents
    ),
    px AS (
      SELECT doc_id, w, h,
             flatten(list_transform(range(0, h), y ->
               list_transform(range(0, w), x ->
                 CASE WHEN y % 2 = 0
                      THEN (doc_id * 9 + 5 * x + 3 * y) % 256
                      ELSE CAST(list_sum(list_transform(range(0, x + 1),
                           t -> (doc_id * 9 + 5 * t + 3 * y) % 256)) % 256
                           AS BIGINT)
                 END))) AS rs
      FROM d
    )
    SELECT doc_id,
           CAST(w AS BIGINT) AS width,
           CAST(h AS BIGINT) AS height,
           CAST(w * h AS BIGINT) AS n_pixels,
           CAST(list_sum(rs) AS BIGINT) AS gray_sum,
           CAST(list_sum(list_transform(range(0, w * h), i ->
                (i + 1) * rs[i + 1])) AS BIGINT) AS raster_checksum
    FROM px
    ORDER BY doc_id
    """,
    doc="REAL PNG IDAT decode on the hash surface: per doc, compose a "
    "complete 8-bit grayscale PNG as column expressions - chunk grammar "
    "(IHDR/IDAT/IEND), a zlib-WRAPPED stored-DEFLATE stream whose "
    "adler32 is computed ARITHMETICALLY column-side (s1 = 1+sum, "
    "s2 = N + sum((N-i) b_i), mod 65521), and scanlines alternating "
    "filter 0 (None) and filter 1 (Sub) with the FILTERED bytes "
    "generated by formula. The decoder (multimodal.decode_png_gray8) "
    "inflates with wbits=15 - zlib itself VERIFIES the column-computed "
    "adler32 - then runs the per-scanline filter reconstruction "
    "(Recon(x) = Filt(x) + Recon(x-1) mod 256 on Sub rows). The oracle "
    "predicts the reconstructed pixels as prefix sums mod 256, never "
    "seeing zlib: a wrong adler32, a stored-block framing slip, or an "
    "unapplied Sub filter each break parity. Chunk CRC32 fields carry "
    "sentinel bytes (decoder walks by chunk length; CRC verification is "
    "out of scope and documented). Map-only; zero shuffles at any "
    "scale.",
)
def multimodal_png_idat_decode(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from mongodb_nats_connector_spark.operators.multimodal import (
        PNG_PIXEL_SCHEMA,
        _png_pixel_batches,
    )
    from mongodb_nats_connector_spark.operators.pipeline20 import _hex_be32

    d = table(spark, sf_dir, "documents", parallel=True).select(
        "doc_id",
        (F.lit(5) + F.col("doc_id") % 4).alias("w"),
        (F.lit(4) + F.col("doc_id") % 3).alias("h"),
    ).withColumn("nraw", F.col("h") * (F.col("w") + 1))
    g = "((doc_id * 9 + 5 * {x} + 3 * {y}) % 256)"
    # raw stream: per row, the filter-type byte (y%2) then w filtered bytes
    raw_hex = F.expr(
        "concat_ws('', transform(sequence(0, h - 1), y -> concat("
        "lpad(hex(y % 2), 2, '0'),"
        "concat_ws('', transform(sequence(0, w - 1), x -> lpad(hex("
        + g.format(x="x", y="y") + "), 2, '0'))))))"
    )
    # adler32 of the raw stream, arithmetically: positions i = y*(w+1) for
    # the filter byte, y*(w+1)+1+x for data bytes; all-integer, tiny bounds
    s1 = F.expr(
        "(1 + aggregate(sequence(0, h - 1), CAST(0 AS BIGINT), (acc, y) ->"
        " acc + y % 2 + aggregate(sequence(0, w - 1), CAST(0 AS BIGINT),"
        " (a2, x) -> a2 + " + g.format(x="x", y="y") + "))) % 65521"
    )
    s2 = F.expr(
        "(nraw + aggregate(sequence(0, h - 1), CAST(0 AS BIGINT),"
        " (acc, y) -> acc + (nraw - y * (w + 1)) * (y % 2)"
        " + aggregate(sequence(0, w - 1), CAST(0 AS BIGINT), (a2, x) ->"
        " a2 + (nraw - (y * (w + 1) + 1 + x)) * "
        + g.format(x="x", y="y") + "))) % 65521"
    )
    zlib_hex = F.concat(
        F.lit("7801"),                            # CMF/FLG (31-check ok)
        F.lit("01"),                              # stored, BFINAL=1
        _hex_le16(F.col("nraw")),
        _hex_le16(F.expr("nraw ^ 65535")),        # NLEN
        raw_hex,
        _hex_be32(s2 * F.lit(65536) + s1),        # adler32, big-endian
    )
    png_hex = F.concat(
        F.lit("89504E470D0A1A0A"),                # signature
        F.lit("0000000D49484452"),                # IHDR length + type
        _hex_be32(F.col("w")),
        _hex_be32(F.col("h")),
        F.lit("0800000000"),                      # depth 8, gray, no interlace
        F.lit("DEADBEEF"),                        # IHDR crc sentinel
        _hex_be32(F.col("nraw") + 11),            # IDAT length
        F.lit("49444154"),
        zlib_hex,
        F.lit("DEADBEEF"),                        # IDAT crc sentinel
        F.lit("0000000049454E44DEADBEEF"),        # IEND
    )
    return (
        d.select("doc_id", F.unhex(png_hex).alias("payload"))
        .mapInPandas(_png_pixel_batches, PNG_PIXEL_SCHEMA)
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# orders_fisher_price_index — Laspeyres / Paasche / Fisher chained indices
# ---------------------------------------------------------------------------


@register(
    "orders_fisher_price_index",
    oracle="""
    WITH cell AS (
      SELECT l_partkey AS pk, year(l_shipdate) AS yr,
             CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                  AS BIGINT) AS rc,
             CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS q
      FROM lineitem GROUP BY 1, 2
    ),
    p AS (
      SELECT pk, yr, q, (1000 * rc) // q AS p_mc FROM cell WHERE q > 0
    ),
    pair AS (
      SELECT c1.yr AS yr,
             CAST(sum(CAST(c1.p_mc AS HUGEINT) * c0.q) AS HUGEINT) AS l_num,
             CAST(sum(CAST(c0.p_mc AS HUGEINT) * c0.q) AS HUGEINT) AS l_den,
             CAST(sum(CAST(c1.p_mc AS HUGEINT) * c1.q) AS HUGEINT) AS p_num,
             CAST(sum(CAST(c0.p_mc AS HUGEINT) * c1.q) AS HUGEINT) AS p_den,
             CAST(count(*) AS BIGINT) AS n_parts
      FROM p c1 JOIN p c0 ON c0.pk = c1.pk AND c0.yr = c1.yr - 1
      GROUP BY 1
    )
    SELECT yr, n_parts,
           CAST((1000000 * l_num) // l_den AS BIGINT) AS laspeyres_ppm,
           CAST((1000000 * p_num) // p_den AS BIGINT) AS paasche_ppm,
           CAST(floor(sqrt(CAST(((1000000 * l_num) // l_den)
                * ((1000000 * p_num) // p_den) AS DOUBLE))) AS BIGINT)
             AS fisher_ppm
    FROM pair
    ORDER BY yr
    """,
    doc="Chained Laspeyres / Paasche / Fisher price indices per ship "
    "year: unit values quantized to exact integer milli-cents per "
    "(part, year) cell BEFORE the cross-part sums, so every index "
    "numerator/denominator is an exact HUGEINT-widened integer and the "
    "ppm ratios are single floor divisions; Fisher is the geometric "
    "mean of the two ppm integers (floor-sqrt of an exact sub-2^53 "
    "product — the one documented double op). The year-over-year join "
    "is co-partitioned on partkey (the same key as the cell rollup: "
    "one shuffle, reused); output is bounded by the ~7-year calendar. "
    "Deleted/entered parts drop out pairwise (matched-sample index, "
    "documented).",
)
def orders_fisher_price_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    cell = li.groupBy(
        F.col("l_partkey").alias("pk"),
        F.year("l_shipdate").alias("yr"),
    ).agg(
        F.sum(F.round(F.col("l_extendedprice") * 100).cast("bigint"))
        .cast("bigint")
        .alias("rc"),
        F.sum(F.round("l_quantity").cast("bigint"))
        .cast("bigint")
        .alias("q"),
    )
    p = cell.filter(F.col("q") > 0).select(
        "pk", "yr", "q", F.expr("(1000 * rc) div q").alias("p_mc")
    )
    c1, c0 = p.alias("c1"), p.alias("c0")
    d = F.expr  # decimal-widened products
    pair = (
        c1.join(
            c0,
            (F.col("c0.pk") == F.col("c1.pk"))
            & (F.col("c0.yr") == F.col("c1.yr") - 1),
        )
        .groupBy(F.col("c1.yr").alias("yr"))
        .agg(
            F.sum(d("CAST(c1.p_mc AS DECIMAL(38,0)) * c0.q")).alias("l_num"),
            F.sum(d("CAST(c0.p_mc AS DECIMAL(38,0)) * c0.q")).alias("l_den"),
            F.sum(d("CAST(c1.p_mc AS DECIMAL(38,0)) * c1.q")).alias("p_num"),
            F.sum(d("CAST(c0.p_mc AS DECIMAL(38,0)) * c1.q")).alias("p_den"),
            F.count(F.lit(1)).cast("bigint").alias("n_parts"),
        )
    )
    return pair.select(
        "yr",
        "n_parts",
        F.expr("CAST((1000000 * l_num) div l_den AS BIGINT)").alias(
            "laspeyres_ppm"
        ),
        F.expr("CAST((1000000 * p_num) div p_den AS BIGINT)").alias(
            "paasche_ppm"
        ),
        F.expr(
            "CAST(floor(sqrt(CAST(CAST((1000000 * l_num) div l_den AS"
            " BIGINT) * CAST((1000000 * p_num) div p_den AS BIGINT)"
            " AS DOUBLE))) AS BIGINT)"
        ).alias("fisher_ppm"),
    ).orderBy("yr")


# ---------------------------------------------------------------------------
# agg_mmd_quadratic — maximum mean discrepancy with the quadratic kernel
# ---------------------------------------------------------------------------


@register(
    "agg_mmd_quadratic",
    oracle="""
    WITH g AS (
      SELECT l_linestatus AS grp,
             CAST(count(*) AS HUGEINT) AS n,
             CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS HUGEINT) AS s1,
             CAST(sum(CAST(round(l_quantity) AS BIGINT)
                      * CAST(round(l_quantity) AS BIGINT)) AS HUGEINT) AS s2
      FROM lineitem WHERE l_linestatus IN ('O', 'F') GROUP BY 1
    ),
    ab AS (
      SELECT max(CASE WHEN grp = 'O' THEN n END) AS na,
             max(CASE WHEN grp = 'O' THEN s1 END) AS s1a,
             max(CASE WHEN grp = 'O' THEN s2 END) AS s2a,
             max(CASE WHEN grp = 'F' THEN n END) AS nb,
             max(CASE WHEN grp = 'F' THEN s1 END) AS s1b,
             max(CASE WHEN grp = 'F' THEN s2 END) AS s2b
      FROM g
    )
    SELECT CAST(na AS BIGINT) AS n_open,
           CAST(nb AS BIGINT) AS n_filled,
           CAST((1000 * (nb * nb * (na * na + 2 * s1a * s1a + s2a * s2a)
                 + na * na * (nb * nb + 2 * s1b * s1b + s2b * s2b)
                 - 2 * na * nb * (na * nb + 2 * s1a * s1b + s2a * s2b)))
                // (na * na * nb * nb) AS BIGINT) AS mmd2_milli
    FROM ab
    """,
    doc="Maximum mean discrepancy between the open ('O') and filled "
    "('F') line-status quantity distributions under the quadratic "
    "polynomial kernel k(x,y) = (1 + xy)^2 — the kernel two-sample "
    "distance that, unlike a mean/variance t-test, is zero iff the "
    "first TWO moments agree, and unlike agg_energy_distance needs no "
    "pairwise |x-y| census: (1+xy)^2 = 1 + 2xy + x^2 y^2 factorizes "
    "the double sums into pure moment products, so the biased "
    "V-statistic MMD^2 = E_aa k + E_bb k - 2 E_ab k clears to ONE "
    "exact integer ratio of HUGEINT-widened power sums (n, S1, S2 per "
    "group). Map-side combine to 2 rows; the 100 TB cost is one scan.",
)
def agg_mmd_quadratic(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem", parallel=True)
    q = F.round("l_quantity").cast("bigint")
    g = (
        li.filter(F.col("l_linestatus").isin("O", "F"))
        .groupBy(F.col("l_linestatus").alias("grp"))
        .agg(
            F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
            _dsum(q).alias("s1"),
            _dsum(q * q).alias("s2"),
        )
    )
    ab = g.agg(
        F.max(F.when(F.col("grp") == "O", F.col("n"))).alias("na"),
        F.max(F.when(F.col("grp") == "O", F.col("s1"))).alias("s1a"),
        F.max(F.when(F.col("grp") == "O", F.col("s2"))).alias("s2a"),
        F.max(F.when(F.col("grp") == "F", F.col("n"))).alias("nb"),
        F.max(F.when(F.col("grp") == "F", F.col("s1"))).alias("s1b"),
        F.max(F.when(F.col("grp") == "F", F.col("s2"))).alias("s2b"),
    )
    return ab.select(
        F.col("na").cast("bigint").alias("n_open"),
        F.col("nb").cast("bigint").alias("n_filled"),
        F.expr(
            "CAST((1000 * (nb * nb * (na * na + 2 * s1a * s1a + s2a * s2a)"
            " + na * na * (nb * nb + 2 * s1b * s1b + s2b * s2b)"
            " - 2 * na * nb * (na * nb + 2 * s1a * s1b + s2a * s2b)))"
            " div (na * na * nb * nb) AS BIGINT)"
        ).alias("mmd2_milli"),
    )


# ---------------------------------------------------------------------------
# agg_distance_correlation — exact dCor via bounded-domain pair censuses
# ---------------------------------------------------------------------------


@register(
    "agg_distance_correlation",
    oracle="""
    WITH base AS (
      SELECT CAST(round(l_quantity) AS BIGINT) AS x,
             CAST(round(l_discount * 100) AS BIGINT) AS y
      FROM lineitem
    ),
    cells AS (
      SELECT x, y, CAST(count(*) AS HUGEINT) AS c FROM base GROUP BY 1, 2
    ),
    n_t AS (SELECT CAST(sum(c) AS HUGEINT) AS n FROM cells),
    pair AS (
      SELECT CAST(sum(a.c * b.c * abs(a.x - b.x) * abs(a.y - b.y))
                  AS HUGEINT) AS t1,
             CAST(sum(a.c * b.c * (a.x - b.x) * (a.x - b.x))
                  AS HUGEINT) AS t1x,
             CAST(sum(a.c * b.c * (a.y - b.y) * (a.y - b.y))
                  AS HUGEINT) AS t1y,
             CAST(sum(a.c * b.c * abs(a.x - b.x)) AS HUGEINT) AS sa,
             CAST(sum(a.c * b.c * abs(a.y - b.y)) AS HUGEINT) AS sb
      FROM cells a, cells b
    ),
    rowm AS (
      SELECT a.x, a.y, a.c,
             CAST(sum(b.c * abs(a.x - b.x)) AS HUGEINT) AS ai,
             CAST(sum(b.c * abs(a.y - b.y)) AS HUGEINT) AS bi
      FROM cells a, cells b GROUP BY 1, 2, 3
    ),
    t3s AS (
      SELECT CAST(sum(c * ai * bi) AS HUGEINT) AS t3,
             CAST(sum(c * ai * ai) AS HUGEINT) AS t3x,
             CAST(sum(c * bi * bi) AS HUGEINT) AS t3y
      FROM rowm
    ),
    raw AS (
      SELECT n_t.n * n_t.n * pair.t1 + pair.sa * pair.sb
               - 2 * n_t.n * t3s.t3 AS av,
             n_t.n * n_t.n * pair.t1x + pair.sa * pair.sa
               - 2 * n_t.n * t3s.t3x AS ax,
             n_t.n * n_t.n * pair.t1y + pair.sb * pair.sb
               - 2 * n_t.n * t3s.t3y AS ay,
             n_t.n * n_t.n * n_t.n AS n3, n_t.n AS n
      FROM n_t, pair, t3s
    ),
    v AS (
      SELECT 1000 * (av // n3) + (1000 * (av % n3)) // n3 AS v_milli,
             1000 * (ax // n3) + (1000 * (ax % n3)) // n3 AS vx_milli,
             1000 * (ay // n3) + (1000 * (ay % n3)) // n3 AS vy_milli,
             n
      FROM raw
    )
    SELECT CAST(n AS BIGINT) AS n_rows,
           CAST(v_milli AS BIGINT) AS dcov2_n_milli,
           CAST(vx_milli AS BIGINT) AS dvarx_n_milli,
           CAST(vy_milli AS BIGINT) AS dvary_n_milli,
           CAST((1000000 * v_milli * v_milli)
                // greatest(vx_milli * vy_milli, 1) AS BIGINT)
             AS dcor4_ppm
    FROM v
    """,
    doc="EXACT distance correlation between line quantity and discount "
    "— the Szekely dCor that detects ARBITRARY (not just monotone) "
    "dependence, zero iff independent. The O(n^2) pairwise-distance "
    "double sums that make dCor infamous at scale collapse onto the "
    "bounded joint value grid (<= 51 x 11 = 561 cells): every "
    "V-statistic term is a census-weighted cell-pair sum (561^2 "
    "bounded broadcast cross join), so the statistic is EXACT integer "
    "arithmetic at any row count — n^4-cleared dCov^2/dVar "
    "numerators, milli-quantized at n^3 scale via the exact split "
    "1000*(a div b) + (1000*(a mod b)) div b so the quantizer never "
    "multiplies the n^4-scale numerator (DECIMAL(38,0)/HUGEINT "
    "headroom to ~sf4 / 3e8 lineitem rows; beyond that, swap the raw "
    "double sums for per-cell pre-divided partials — documented "
    "candidate-generator swap), and dcor^4 as a second-layer ppm "
    "ratio (squares avoid the cross-engine sqrt; dCor^2 = "
    "sqrt(dcor4_ppm/1e6) off-surface). One scan + 561-cell census; "
    "everything after is bounded.",
)
def agg_distance_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem", parallel=True)
    base = li.select(
        F.round("l_quantity").cast("bigint").alias("x"),
        F.round(F.col("l_discount") * 100).cast("bigint").alias("y"),
    )
    cells = base.groupBy("x", "y").agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("c")
    )
    from mongodb_nats_connector_spark.plans.caching import (
        persist_until_collected,
    )

    cells = cells
    a, b = cells.alias("a"), cells.alias("b")
    n_t = cells.agg(F.sum("c").alias("n"))
    pair = a.crossJoin(F.broadcast(b)).agg(
        _dsum(
            F.col("a.c") * F.col("b.c")
            * F.abs(F.col("a.x") - F.col("b.x"))
            * F.abs(F.col("a.y") - F.col("b.y"))
        ).alias("t1"),
        _dsum(
            F.col("a.c") * F.col("b.c")
            * (F.col("a.x") - F.col("b.x"))
            * (F.col("a.x") - F.col("b.x"))
        ).alias("t1x"),
        _dsum(
            F.col("a.c") * F.col("b.c")
            * (F.col("a.y") - F.col("b.y"))
            * (F.col("a.y") - F.col("b.y"))
        ).alias("t1y"),
        _dsum(
            F.col("a.c") * F.col("b.c")
            * F.abs(F.col("a.x") - F.col("b.x"))
        ).alias("sa"),
        _dsum(
            F.col("a.c") * F.col("b.c")
            * F.abs(F.col("a.y") - F.col("b.y"))
        ).alias("sb"),
    )
    rowm = (
        a.crossJoin(F.broadcast(b))
        .groupBy(F.col("a.x").alias("x"), F.col("a.y").alias("y"),
                 F.col("a.c").alias("c"))
        .agg(
            _dsum(F.col("b.c") * F.abs(F.col("a.x") - F.col("b.x"))).alias(
                "ai"
            ),
            _dsum(F.col("b.c") * F.abs(F.col("a.y") - F.col("b.y"))).alias(
                "bi"
            ),
        )
    )
    t3s = rowm.agg(
        _dsum(F.col("c") * F.col("ai") * F.col("bi")).alias("t3"),
        _dsum(F.col("c") * F.col("ai") * F.col("ai")).alias("t3x"),
        _dsum(F.col("c") * F.col("bi") * F.col("bi")).alias("t3y"),
    )
    raw = (
        n_t.crossJoin(F.broadcast(pair))
        .crossJoin(F.broadcast(t3s))
        .select(
            F.col("n"),
            F.expr("n * n * t1 + sa * sb - 2 * n * t3").alias("av"),
            F.expr("n * n * t1x + sa * sa - 2 * n * t3x").alias("ax"),
            F.expr("n * n * t1y + sb * sb - 2 * n * t3y").alias("ay"),
            F.expr("CAST(n AS DECIMAL(38,0)) * n * n").alias("n3"),
        )
    )
    # quantize AFTER the n^3 division via the exact split
    # 1000*floor(a/b) + floor(1000*(a mod b)/b): identical value, but the
    # 1000x multiplier never rides the n^4-scale numerator (headroom to
    # ~sf4; beyond that the pre-aggregated-grid swap in the docstring).
    v = raw.select(
        "n",
        F.expr(
            "1000 * (av div n3) + (1000 * (av % n3)) div n3"
        ).cast("decimal(38,0)").alias("v_milli"),
        F.expr(
            "1000 * (ax div n3) + (1000 * (ax % n3)) div n3"
        ).cast("decimal(38,0)").alias("vx_milli"),
        F.expr(
            "1000 * (ay div n3) + (1000 * (ay % n3)) div n3"
        ).cast("decimal(38,0)").alias("vy_milli"),
    )
    out = v.select(
        F.col("n").cast("bigint").alias("n_rows"),
        F.col("v_milli").cast("bigint").alias("dcov2_n_milli"),
        F.col("vx_milli").cast("bigint").alias("dvarx_n_milli"),
        F.col("vy_milli").cast("bigint").alias("dvary_n_milli"),
        F.expr(
            "CAST((1000000 * v_milli * v_milli)"
            " div greatest(vx_milli * vy_milli, 1) AS BIGINT)"
        ).alias("dcor4_ppm"),
    )
    return persist_until_collected(cells, out)


# ---------------------------------------------------------------------------
# agg_crps_empirical — continuous ranked probability score on the grid
# ---------------------------------------------------------------------------


@register(
    "agg_crps_empirical",
    oracle="""
    WITH fx AS (
      SELECT CAST(round(l_quantity) AS BIGINT) AS x,
             CAST(count(*) AS HUGEINT) AS c
      FROM lineitem WHERE l_linestatus = 'F' GROUP BY 1
    ),
    oy AS (
      SELECT CAST(round(l_quantity) AS BIGINT) AS y,
             CAST(count(*) AS HUGEINT) AS c
      FROM lineitem WHERE l_linestatus = 'O' GROUP BY 1
    ),
    nn AS (
      SELECT (SELECT CAST(sum(c) AS HUGEINT) FROM fx) AS n,
             (SELECT CAST(sum(c) AS HUGEINT) FROM oy) AS m
    ),
    txy AS (
      SELECT CAST(sum(fx.c * oy.c * abs(fx.x - oy.y)) AS HUGEINT) AS t
      FROM fx, oy
    ),
    axx AS (
      SELECT CAST(sum(a.c * b.c * abs(a.x - b.x)) AS HUGEINT) AS t
      FROM fx a, fx b
    )
    SELECT CAST(nn.n AS BIGINT) AS n_forecast,
           CAST(nn.m AS BIGINT) AS n_outcomes,
           CAST((1000 * (2 * nn.n * txy.t - nn.m * axx.t))
                // (2 * nn.n * nn.n * nn.m) AS BIGINT) AS crps_milli
    FROM nn, txy, axx
    """,
    doc="Continuous ranked probability score of the filled-status "
    "quantity distribution used as a probabilistic forecast for the "
    "open-status outcomes: CRPS = E|X - y| - (1/2) E|X - X'| averaged "
    "over outcomes y — the PROPER scoring rule for full predictive "
    "distributions (pinball/orders_pinball_loss scores one quantile; "
    "CRPS integrates over all of them). Both expectation double sums "
    "collapse onto the bounded <= 51-value quantity grid (51 x 51 "
    "cell-pair censuses), so the score is ONE exact integer ratio "
    "cleared over 2 n^2 m, milli floor. One scan + two bounded "
    "broadcast grid joins; exact at any scale.",
)
def agg_crps_empirical(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem", parallel=True)
    q = F.round("l_quantity").cast("bigint")
    fx = (
        li.filter(F.col("l_linestatus") == "F")
        .groupBy(q.alias("x"))
        .agg(F.count(F.lit(1)).cast("decimal(38,0)").alias("c"))
    )
    oy = (
        li.filter(F.col("l_linestatus") == "O")
        .groupBy(q.alias("y"))
        .agg(F.count(F.lit(1)).cast("decimal(38,0)").alias("c"))
    )
    nn = fx.agg(F.sum("c").alias("n")).crossJoin(
        F.broadcast(oy.agg(F.sum("c").alias("m")))
    )
    txy = (
        fx.alias("fx")
        .crossJoin(F.broadcast(oy.alias("oy")))
        .agg(
            _dsum(
                F.col("fx.c") * F.col("oy.c")
                * F.abs(F.col("fx.x") - F.col("oy.y"))
            ).alias("t")
        )
    )
    axx = (
        fx.alias("a")
        .crossJoin(F.broadcast(fx.alias("b")))
        .agg(
            _dsum(
                F.col("a.c") * F.col("b.c")
                * F.abs(F.col("a.x") - F.col("b.x"))
            ).alias("t")
        )
    )
    return (
        nn.crossJoin(F.broadcast(txy.withColumnRenamed("t", "txy")))
        .crossJoin(F.broadcast(axx.withColumnRenamed("t", "axx")))
        .select(
            F.col("n").cast("bigint").alias("n_forecast"),
            F.col("m").cast("bigint").alias("n_outcomes"),
            F.expr(
                "CAST((1000 * (2 * n * txy - m * axx))"
                " div (2 * n * n * m) AS BIGINT)"
            ).alias("crps_milli"),
        )
    )


# ---------------------------------------------------------------------------
# agg_kendall_partial_tau — partial rank correlation, grid-exact
# ---------------------------------------------------------------------------

_TAU_MICRO = (
    "CASE WHEN {u} >= 0 THEN (1000000 * {u}) {div} {d}"
    " ELSE -((1000000 * (-({u}))) {div} {d}) END"
)


@register(
    "agg_kendall_partial_tau",
    oracle=f"""
    WITH base AS (
      SELECT CAST(round(l_quantity) AS BIGINT) AS x,
             CAST(round(l_discount * 100) AS BIGINT) AS y,
             CAST(round(l_tax * 100) AS BIGINT) AS z
      FROM lineitem
    ),
    n_t AS (SELECT CAST(count(*) AS HUGEINT) AS n FROM base),
    cxy AS (SELECT x, y, CAST(count(*) AS HUGEINT) AS c FROM base GROUP BY 1, 2),
    cxz AS (SELECT x, z, CAST(count(*) AS HUGEINT) AS c FROM base GROUP BY 1, 2),
    cyz AS (SELECT y, z, CAST(count(*) AS HUGEINT) AS c FROM base GROUP BY 1, 2),
    uxy AS (
      SELECT CAST(sum(a.c * b.c * sign(a.x - b.x) * sign(a.y - b.y))
                  AS HUGEINT) AS u2
      FROM cxy a, cxy b
    ),
    uxz AS (
      SELECT CAST(sum(a.c * b.c * sign(a.x - b.x) * sign(a.z - b.z))
                  AS HUGEINT) AS u2
      FROM cxz a, cxz b
    ),
    uyz AS (
      SELECT CAST(sum(a.c * b.c * sign(a.y - b.y) * sign(a.z - b.z))
                  AS HUGEINT) AS u2
      FROM cyz a, cyz b
    ),
    taus AS (
      SELECT {_TAU_MICRO.format(u='uxy.u2', d='(n_t.n * (n_t.n - 1))', div='//')} AS txy,
             {_TAU_MICRO.format(u='uxz.u2', d='(n_t.n * (n_t.n - 1))', div='//')} AS txz,
             {_TAU_MICRO.format(u='uyz.u2', d='(n_t.n * (n_t.n - 1))', div='//')} AS tyz,
             n_t.n AS n
      FROM n_t, uxy, uxz, uyz
    )
    SELECT CAST(n AS BIGINT) AS n_rows,
           CAST(txy AS BIGINT) AS tau_xy_micro,
           CAST(txz AS BIGINT) AS tau_xz_micro,
           CAST(tyz AS BIGINT) AS tau_yz_micro,
           CAST(sign(1000000 * txy - txz * tyz) AS BIGINT) AS partial_sign,
           CAST((1000000 * (1000000 * txy - txz * tyz)
                 * (1000000 * txy - txz * tyz))
                // greatest((1000000000000 - txz * txz)
                            * (1000000000000 - tyz * tyz), 1)
                AS BIGINT) AS partial_tau2_ppm
    FROM taus
    """,
    doc="Partial Kendall tau between quantity and discount CONTROLLING "
    "for tax: tau_xy.z = (tau_xy - tau_xz tau_yz) / sqrt((1-tau_xz^2)"
    "(1-tau_yz^2)) — the rank-based conditional-dependence complement "
    "of agg_partial_corr (which is Pearson/linear). Each tau-a comes "
    "from an EXACT concordance census: 2(C-D) = sum over bounded "
    "joint-grid cell pairs of c_a c_b sgn(dx) sgn(dy) (grids <= 51x11,"
    " 51x9, 11x9 — the double sums are bounded broadcast joins at any "
    "row count), micro-quantized with sign-split truncation; the "
    "partial is emitted as sign + squared ppm ratio of the micro "
    "integers (second documented floor layer; sqrt stays off-surface)."
    " One scan + three bounded censuses.",
)
def agg_kendall_partial_tau(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem", parallel=True)
    base = li.select(
        F.round("l_quantity").cast("bigint").alias("x"),
        F.round(F.col("l_discount") * 100).cast("bigint").alias("y"),
        F.round(F.col("l_tax") * 100).cast("bigint").alias("z"),
    )
    from mongodb_nats_connector_spark.plans.caching import (
        persist_until_collected,
    )

    base = base
    n_t = base.agg(F.count(F.lit(1)).cast("decimal(38,0)").alias("n"))

    def u2(c1: str, c2: str) -> DataFrame:
        cells = base.groupBy(c1, c2).agg(
            F.count(F.lit(1)).cast("decimal(38,0)").alias("c")
        )
        a, b = cells.alias("a"), cells.alias("b")
        return a.crossJoin(F.broadcast(b)).agg(
            _dsum(
                F.col("a.c")
                * F.col("b.c")
                * F.signum(F.col(f"a.{c1}") - F.col(f"b.{c1}")).cast(
                    "decimal(38,0)"
                )
                * F.signum(F.col(f"a.{c2}") - F.col(f"b.{c2}")).cast(
                    "decimal(38,0)"
                )
            ).alias("u2")
        )

    t = (
        n_t.crossJoin(F.broadcast(u2("x", "y").withColumnRenamed("u2", "uxy")))
        .crossJoin(F.broadcast(u2("x", "z").withColumnRenamed("u2", "uxz")))
        .crossJoin(F.broadcast(u2("y", "z").withColumnRenamed("u2", "uyz")))
    )
    tau = lambda u: _TAU_MICRO.format(u=u, d="(n * (n - 1))", div="div")
    taus = t.select(
        F.col("n"),
        F.expr(tau("uxy")).cast("decimal(38,0)").alias("txy"),
        F.expr(tau("uxz")).cast("decimal(38,0)").alias("txz"),
        F.expr(tau("uyz")).cast("decimal(38,0)").alias("tyz"),
    )
    out = taus.select(
        F.col("n").cast("bigint").alias("n_rows"),
        F.col("txy").cast("bigint").alias("tau_xy_micro"),
        F.col("txz").cast("bigint").alias("tau_xz_micro"),
        F.col("tyz").cast("bigint").alias("tau_yz_micro"),
        F.expr(
            "CAST(sign(1000000 * txy - txz * tyz) AS BIGINT)"
        ).alias("partial_sign"),
        F.expr(
            "CAST((1000000 * (1000000 * txy - txz * tyz)"
            " * (1000000 * txy - txz * tyz))"
            " div greatest((1000000000000 - txz * txz)"
            " * (1000000000000 - tyz * tyz), 1) AS BIGINT)"
        ).alias("partial_tau2_ppm"),
    )
    return persist_until_collected(base, out)


# ---------------------------------------------------------------------------
# agg_tail_dependence — empirical upper-tail dependence on the grid
# ---------------------------------------------------------------------------


@register(
    "agg_tail_dependence",
    oracle="""
    WITH base AS (
      SELECT CAST(round(l_quantity) AS BIGINT) AS x,
             CAST(round(l_extendedprice * 100) AS BIGINT) // 100000 AS y
      FROM lineitem
    ),
    cells AS (
      SELECT x, y, CAST(count(*) AS BIGINT) AS c FROM base GROUP BY 1, 2
    ),
    n_t AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM cells),
    mx AS (SELECT x, CAST(sum(c) AS BIGINT) AS c FROM cells GROUP BY 1),
    my AS (SELECT y, CAST(sum(c) AS BIGINT) AS c FROM cells GROUP BY 1),
    tx AS (
      SELECT min(a.x) AS thr FROM mx a, n_t
      WHERE (SELECT sum(b.c) FROM mx b WHERE b.x <= a.x) * 10 >= 9 * n_t.n
    ),
    ty AS (
      SELECT min(a.y) AS thr FROM my a, n_t
      WHERE (SELECT sum(b.c) FROM my b WHERE b.y <= a.y) * 10 >= 9 * n_t.n
    ),
    ex AS (
      SELECT CAST(sum(CASE WHEN cells.x > tx.thr THEN cells.c ELSE 0 END)
                  AS BIGINT) AS nx,
             CAST(sum(CASE WHEN cells.y > ty.thr THEN cells.c ELSE 0 END)
                  AS BIGINT) AS ny,
             CAST(sum(CASE WHEN cells.x > tx.thr AND cells.y > ty.thr
                      THEN cells.c ELSE 0 END) AS BIGINT) AS nj
      FROM cells, tx, ty
    )
    SELECT n_t.n AS n_rows,
           CAST(tx.thr AS BIGINT) AS x_threshold,
           CAST(ty.thr AS BIGINT) AS y_threshold_hcents,
           ex.nx AS n_exceed_x, ex.ny AS n_exceed_y,
           ex.nj AS n_joint_exceed,
           CAST((1000000 * ex.nj) // greatest(ex.nx, 1) AS BIGINT)
             AS lambda_u_ppm,
           CAST((1000000 * ex.ny) // n_t.n AS BIGINT)
             AS independence_ppm
    FROM n_t, tx, ty, ex
    """,
    doc="Empirical upper-tail dependence between line quantity and "
    "extended price (bucketed to whole thousands of dollars, keeping "
    "the domain bounded): lambda_U = P(Y > t_y | X > t_x) at the "
    "empirical 90th-percentile thresholds, against the independence "
    "baseline P(Y > t_y) — the copula-tail diagnostic that Pearson/"
    "Kendall coefficients miss (two variables can be uncorrelated yet "
    "tail-dependent, the joint-extremes case that breaks outlier "
    "capping). Thresholds come from bounded-grid marginal cumulative "
    "censuses (a grid self-join, no data-proportional window); every "
    "count is exact and the ratios are single ppm floors. One scan + "
    "bounded grid reduces.",
)
def agg_tail_dependence(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem", parallel=True)
    base = li.select(
        F.round("l_quantity").cast("bigint").alias("x"),
        F.expr(
            "CAST(round(l_extendedprice * 100) AS BIGINT) div 100000"
        ).alias("y"),
    )
    cells = base.groupBy("x", "y").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    from mongodb_nats_connector_spark.plans.caching import (
        persist_until_collected,
    )

    n_t = cells.agg(F.sum("c").cast("bigint").alias("n"))
    mx = cells.groupBy("x").agg(F.sum("c").cast("bigint").alias("c"))
    my = cells.groupBy("y").agg(F.sum("c").cast("bigint").alias("c"))

    def thr(m: DataFrame, col: str) -> DataFrame:
        a, b = m.alias("a"), m.alias("b")
        cum = (
            a.crossJoin(F.broadcast(b))
            .filter(F.col(f"b.{col}") <= F.col(f"a.{col}"))
            .groupBy(F.col(f"a.{col}").alias(col))
            .agg(F.sum(F.col("b.c")).cast("bigint").alias("cum"))
        )
        return (
            cum.crossJoin(F.broadcast(n_t))
            .filter(F.col("cum") * 10 >= 9 * F.col("n"))
            .agg(F.min(col).alias("thr"))
        )

    tx = thr(mx, "x").withColumnRenamed("thr", "tx")
    ty = thr(my, "y").withColumnRenamed("thr", "ty")
    ex = (
        cells.crossJoin(F.broadcast(tx))
        .crossJoin(F.broadcast(ty))
        .agg(
            F.sum(F.when(F.col("x") > F.col("tx"), F.col("c")).otherwise(0))
            .cast("bigint")
            .alias("nx"),
            F.sum(F.when(F.col("y") > F.col("ty"), F.col("c")).otherwise(0))
            .cast("bigint")
            .alias("ny"),
            F.sum(
                F.when(
                    (F.col("x") > F.col("tx")) & (F.col("y") > F.col("ty")),
                    F.col("c"),
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("nj"),
            F.max("tx").alias("txv"),
            F.max("ty").alias("tyv"),
        )
    )
    out = ex.crossJoin(F.broadcast(n_t)).select(
        F.col("n").alias("n_rows"),
        F.col("txv").cast("bigint").alias("x_threshold"),
        F.col("tyv").cast("bigint").alias("y_threshold_hcents"),
        F.col("nx").alias("n_exceed_x"),
        F.col("ny").alias("n_exceed_y"),
        F.col("nj").alias("n_joint_exceed"),
        F.expr(
            "CAST((1000000 * nj) div greatest(nx, 1) AS BIGINT)"
        ).alias("lambda_u_ppm"),
        F.expr("CAST((1000000 * ny) div n AS BIGINT)").alias(
            "independence_ppm"
        ),
    )
    return persist_until_collected(cells, out)


# ---------------------------------------------------------------------------
# agg_hogg_tail_weight — Hogg's Q tail-weight classifier on the dollar grid
# ---------------------------------------------------------------------------


@register(
    "agg_hogg_tail_weight",
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
    reg AS (
      SELECT max(n) AS n,
             CAST(sum(CAST(greatest(least(n // 20 - lo, c), 0)
                      AS HUGEINT) * v) AS HUGEINT) AS b05,
             CAST(sum(CAST(greatest(least(n // 2 - lo, c), 0)
                      AS HUGEINT) * v) AS HUGEINT) AS b50,
             CAST(sum(CAST(greatest(least(c, n - n // 20 - lo), 0)
                      AS HUGEINT) * v) AS HUGEINT) AS below_t5,
             CAST(sum(CAST(greatest(least(c, n - n // 2 - lo), 0)
                      AS HUGEINT) * v) AS HUGEINT) AS below_t50,
             CAST(sum(CAST(c AS HUGEINT) * v) AS HUGEINT) AS s
      FROM pos
    )
    SELECT n AS n_orders,
           CAST(n // 20 AS BIGINT) AS n_tail,
           CAST((1000 * (n // 2) * ((s - below_t5) - b05))
                // greatest((n // 20) * ((s - below_t50) - b50), 1)
                AS BIGINT) AS hogg_q_milli
    FROM reg
    """,
    doc="Hogg's Q tail-weight statistic of the order-value distribution "
    "on the whole-dollar value grid: Q = (mean of the top 5% - mean of "
    "the bottom 5%) / (mean of the top 50% - mean of the bottom 50%) "
    "— the order-statistic classifier (light / normal-ish / heavy "
    "tails by Q bands) that picks trimming levels for adaptive "
    "robust estimators; complements agg_bowley_moors (quantile skew/"
    "kurtosis) with REGION MEANS rather than point quantiles. Region "
    "sums clear exactly over the value census: bottom-k sums via the "
    "palma-style greatest(least(k - lo, c), 0) prefix trick, top "
    "sums by complement, counts n/20 and n/2 equal on both sides so "
    "Q is one integer ratio (milli floor). The grid window is bounded "
    "by the fixed price DOMAIN (dollar values), not the row count.",
)
def agg_hogg_tail_weight(spark: SparkSession, sf_dir: str) -> DataFrame:
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
    reg = pos.agg(
        F.max("n").alias("n"),
        _dsum(
            F.expr(
                "CAST(greatest(least(n div 20 - lo, c), 0)"
                " AS DECIMAL(38,0)) * v"
            )
        ).alias("b05"),
        _dsum(
            F.expr(
                "CAST(greatest(least(n div 2 - lo, c), 0)"
                " AS DECIMAL(38,0)) * v"
            )
        ).alias("b50"),
        _dsum(
            F.expr(
                "CAST(greatest(least(c, n - n div 20 - lo), 0)"
                " AS DECIMAL(38,0)) * v"
            )
        ).alias("below_t5"),
        _dsum(
            F.expr(
                "CAST(greatest(least(c, n - n div 2 - lo), 0)"
                " AS DECIMAL(38,0)) * v"
            )
        ).alias("below_t50"),
        _dsum(F.expr("CAST(c AS DECIMAL(38,0)) * v")).alias("s"),
    )
    return reg.select(
        F.col("n").alias("n_orders"),
        F.expr("CAST(n div 20 AS BIGINT)").alias("n_tail"),
        F.expr(
            "CAST((1000 * (n div 2) * ((s - below_t5) - b05))"
            " div greatest((n div 20) * ((s - below_t50) - b50), 1)"
            " AS BIGINT)"
        ).alias("hogg_q_milli"),
    )


# ---------------------------------------------------------------------------
# agg_median_of_means — the MoM robust mean over 16 hash buckets
# ---------------------------------------------------------------------------


@register(
    "agg_median_of_means",
    oracle="""
    WITH b AS (
      SELECT CAST(CAST('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)),
                  1, 7) AS BIGINT) % 16 AS BIGINT) AS bkt,
             CAST(round(o_totalprice * 100) AS BIGINT) AS v
      FROM orders
    ),
    m AS (
      SELECT bkt, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(v AS HUGEINT)) AS HUGEINT) AS s,
             CAST(sum(CAST(v AS HUGEINT)) // count(*) AS BIGINT) AS mean_c
      FROM b GROUP BY 1
    ),
    r AS (
      SELECT mean_c, row_number() OVER (ORDER BY mean_c, bkt) AS rn,
             count(*) OVER () AS k
      FROM m
    ),
    agg AS (
      SELECT CAST(max(k) AS BIGINT) AS k,
             CAST(sum(CASE WHEN rn IN (k // 2, k // 2 + 1)
                      THEN mean_c ELSE 0 END) AS BIGINT) AS midsum
      FROM r
    ),
    ex AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                  AS HUGEINT) AS s
      FROM orders
    )
    SELECT agg.k AS n_buckets,
           CAST(agg.midsum / 2 AS BIGINT) AS mom_cents,
           CAST(ex.s // ex.n AS BIGINT) AS mean_cents
    FROM agg, ex
    """,
    doc="Median-of-means estimator of the mean order value: rows are "
    "hashed into k = 16 buckets by the cross-engine md5 uniform (the "
    "agg_bootstrap_poisson hash discipline), each bucket's mean is "
    "floor-quantized to exact integer cents, and the estimate is the "
    "median of the 16 bucket means (even k: floor-average of the two "
    "middle order statistics) — the sub-Gaussian-deviation mean "
    "estimator under heavy tails, the modern robust-statistics "
    "primitive behind bandit and streaming bounds, set beside the "
    "plain mean for calibration. Map-side combine to 16 rows before "
    "the bounded 16-row rank; exact at any scale.",
)
def agg_median_of_means(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders", parallel=True)
    b = o.select(
        (
            F.conv(
                F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 7),
                16,
                10,
            ).cast("bigint")
            % 16
        ).alias("bkt"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("v"),
    )
    m = b.groupBy("bkt").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        _dsum(F.col("v")).alias("s"),
    ).select(
        "bkt", F.expr("CAST(s div n AS BIGINT)").alias("mean_c")
    )
    r = m.select(
        "mean_c",
        F.row_number().over(Window.orderBy("mean_c", "bkt")).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("k"),
    )
    agg = r.agg(
        F.max("k").cast("bigint").alias("k"),
        F.sum(
            F.when(
                (F.col("rn") == F.expr("k div 2"))
                | (F.col("rn") == F.expr("k div 2 + 1")),
                F.col("mean_c"),
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("midsum"),
    )
    ex = o.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        _dsum(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias(
            "s"
        ),
    )
    return agg.crossJoin(F.broadcast(ex)).select(
        F.col("k").alias("n_buckets"),
        F.expr("CAST(midsum div 2 AS BIGINT)").alias("mom_cents"),
        F.expr("CAST(s div n AS BIGINT)").alias("mean_cents"),
    )


# ---------------------------------------------------------------------------
# agg_bangdiwala_b — Bangdiwala's B agreement statistic
# ---------------------------------------------------------------------------


@register(
    "agg_bangdiwala_b",
    oracle="""
    WITH per_order AS (
      SELECT l_orderkey,
             max(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS r1,
             max(CASE WHEN l_discount >= 0.06 THEN 1 ELSE 0 END) AS r2
      FROM lineitem GROUP BY 1
    ),
    ct AS (
      SELECT CAST(sum(CASE WHEN r1 = 1 AND r2 = 1 THEN 1 ELSE 0 END)
                  AS HUGEINT) AS a11,
             CAST(sum(CASE WHEN r1 = 0 AND r2 = 0 THEN 1 ELSE 0 END)
                  AS HUGEINT) AS a00,
             CAST(sum(r1) AS HUGEINT) AS row1,
             CAST(sum(r2) AS HUGEINT) AS col1,
             CAST(count(*) AS HUGEINT) AS n
      FROM per_order
    )
    SELECT CAST(n AS BIGINT) AS n_orders,
           CAST(a11 AS BIGINT) AS both_yes,
           CAST(a00 AS BIGINT) AS both_no,
           CAST((1000000 * (a11 * a11 + a00 * a00))
                // greatest(row1 * col1 + (n - row1) * (n - col1), 1)
                AS BIGINT) AS bangdiwala_b_ppm
    FROM ct
    """,
    doc="Bangdiwala's B agreement statistic between two binary 'raters' "
    "per order — any-line-returned vs any-deep-discount: B = "
    "sum a_kk^2 / sum (r_k c_k), the ratio of the squared diagonal "
    "blocks to the marginal rectangles of the agreement chart. "
    "Distinct from the chance-corrected kappa family already present "
    "(cohen/scott/fleiss/gwet/krippendorff): B is the GEOMETRIC "
    "agreement measure that stays defined and well-behaved under "
    "extreme prevalence, where kappa collapses (the kappa-paradox "
    "case). One order rollup to a 2x2 census; one exact ppm ratio.",
)
def agg_bangdiwala_b(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem", parallel=True)
    per_order = li.groupBy("l_orderkey").agg(
        F.max(
            F.when(F.col("l_returnflag") == "R", 1).otherwise(0)
        ).alias("r1"),
        F.max(
            F.when(F.col("l_discount") >= 0.06, 1).otherwise(0)
        ).alias("r2"),
    )
    ct = per_order.agg(
        F.sum(
            F.when((F.col("r1") == 1) & (F.col("r2") == 1), 1).otherwise(0)
        )
        .cast("decimal(38,0)")
        .alias("a11"),
        F.sum(
            F.when((F.col("r1") == 0) & (F.col("r2") == 0), 1).otherwise(0)
        )
        .cast("decimal(38,0)")
        .alias("a00"),
        F.sum("r1").cast("decimal(38,0)").alias("row1"),
        F.sum("r2").cast("decimal(38,0)").alias("col1"),
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
    )
    return ct.select(
        F.col("n").cast("bigint").alias("n_orders"),
        F.col("a11").cast("bigint").alias("both_yes"),
        F.col("a00").cast("bigint").alias("both_no"),
        F.expr(
            "CAST((1000000 * (a11 * a11 + a00 * a00))"
            " div greatest(row1 * col1 + (n - row1) * (n - col1), 1)"
            " AS BIGINT)"
        ).alias("bangdiwala_b_ppm"),
    )


# ---------------------------------------------------------------------------
# sample_kish_deff — Kish effective sample size / design effect
# ---------------------------------------------------------------------------


@register(
    "sample_kish_deff",
    oracle="""
    WITH w AS (
      SELECT 6 - CAST(substr(o_orderpriority, 1, 1) AS BIGINT) AS w
      FROM orders
    ),
    s AS (
      SELECT CAST(count(*) AS HUGEINT) AS n,
             CAST(sum(w) AS HUGEINT) AS sw,
             CAST(sum(CAST(w AS HUGEINT) * w) AS HUGEINT) AS sw2
      FROM w
    )
    SELECT CAST(n AS BIGINT) AS n_rows,
           CAST(sw AS BIGINT) AS sum_w,
           CAST(sw2 AS BIGINT) AS sum_w2,
           CAST((sw * sw) // sw2 AS BIGINT) AS kish_n_eff,
           CAST((1000 * n * sw2) // (sw * sw) AS BIGINT) AS deff_milli
    FROM s
    """,
    doc="Kish effective sample size and design effect of the priority-"
    "derived importance weights (w = 6 - priority digit, the urgency-"
    "upweighting a curation pipeline would apply before training-mix "
    "sampling): n_eff = (sum w)^2 / sum w^2 and deff = n sum w^2 / "
    "(sum w)^2 — the variance-inflation audit for ANY weighted "
    "estimate downstream. Complements sample_neyman_allocation "
    "(which designs strata budgets) by scoring the weights actually "
    "in hand. Exact integer weights, HUGEINT-widened power sums, two "
    "floor divisions; one map-combined rollup.",
)
def sample_kish_deff(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders", parallel=True)
    w = o.select(
        (
            F.lit(6)
            - F.substring("o_orderpriority", 1, 1).cast("bigint")
        ).alias("w")
    )
    s = w.agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        _dsum(F.col("w")).alias("sw"),
        _dsum(F.col("w") * F.col("w")).alias("sw2"),
    )
    return s.select(
        F.col("n").cast("bigint").alias("n_rows"),
        F.col("sw").cast("bigint").alias("sum_w"),
        F.col("sw2").cast("bigint").alias("sum_w2"),
        F.expr("CAST((sw * sw) div sw2 AS BIGINT)").alias("kish_n_eff"),
        F.expr(
            "CAST((1000 * n * sw2) div (sw * sw) AS BIGINT)"
        ).alias("deff_milli"),
    )


# ---------------------------------------------------------------------------
# sample_horvitz_thompson — unequal-probability sampling + HT estimator
# ---------------------------------------------------------------------------


@register(
    "sample_horvitz_thompson",
    oracle="""
    WITH b AS (
      SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS v,
             CAST(substr(o_orderpriority, 1, 1) AS BIGINT) AS p,
             CAST(CAST('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)
                  || ':ht'), 1, 7) AS BIGINT) AS BIGINT) AS h
      FROM orders
    ),
    s AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(v AS HUGEINT)) AS HUGEINT) AS truth,
             CAST(sum(CASE WHEN h * (1 << p) < 268435456
                      THEN 1 ELSE 0 END) AS BIGINT) AS n_samp,
             CAST(sum(CASE WHEN h * (1 << p) < 268435456
                      THEN CAST(v AS HUGEINT) * (1 << p)
                      ELSE 0 END) AS HUGEINT) AS ht
      FROM b
    )
    SELECT n AS n_rows, n_samp AS n_sampled,
           CAST(truth AS BIGINT) AS truth_cents,
           CAST(ht AS BIGINT) AS ht_estimate_cents,
           CAST((1000000 * abs(ht - truth)) // truth AS BIGINT)
             AS abs_err_ppm
    FROM s
    """,
    doc="Horvitz-Thompson total estimation under unequal-probability "
    "deterministic sampling: each order's inclusion probability is "
    "pi = 2^-p by priority digit (urgent orders kept at 1/2, low at "
    "1/32), realized by the cross-engine md5 28-bit uniform (the "
    "agg_bootstrap_poisson hash discipline: include iff u * 2^p < "
    "2^28), and the HT estimator reweights each sampled order by "
    "1/pi = 2^p — EXACT integers because the probabilities are dyadic."
    " Emitted beside the true total and the ppm absolute error: the "
    "estimation-stage companion of curate_pps_systematic (which draws "
    "the sample) and sample_kish_deff (which scores the weights). One "
    "scan, map-side combine to one row.",
)
def sample_horvitz_thompson(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders", parallel=True)
    b = o.select(
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("v"),
        F.substring("o_orderpriority", 1, 1).cast("bigint").alias("p"),
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("o_orderkey").cast("string"),
                               F.lit(":ht"))),
                1,
                7,
            ),
            16,
            10,
        )
        .cast("bigint")
        .alias("h"),
    )
    incl = F.expr("h * shiftleft(1, CAST(p AS INT)) < 268435456")
    s = b.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        _dsum(F.col("v")).alias("truth"),
        F.sum(F.when(incl, 1).otherwise(0)).cast("bigint").alias("n_samp"),
        F.sum(
            F.when(
                incl,
                F.expr(
                    "CAST(v AS DECIMAL(38,0))"
                    " * shiftleft(1, CAST(p AS INT))"
                ),
            ).otherwise(F.lit(0).cast("decimal(38,0)"))
        ).alias("ht"),
    )
    return s.select(
        F.col("n").alias("n_rows"),
        F.col("n_samp").alias("n_sampled"),
        F.col("truth").cast("bigint").alias("truth_cents"),
        F.col("ht").cast("bigint").alias("ht_estimate_cents"),
        F.expr(
            "CAST((1000000 * abs(ht - truth)) div truth AS BIGINT)"
        ).alias("abs_err_ppm"),
    )


# ---------------------------------------------------------------------------
# customer_capture_recapture — Lincoln-Petersen / Chapman population size
# ---------------------------------------------------------------------------


@register(
    "customer_capture_recapture",
    oracle="""
    WITH span AS (
      SELECT min(o_orderdate) AS lo, max(o_orderdate) AS hi FROM orders
    ),
    marks AS (
      SELECT o.o_custkey,
             max(CASE WHEN datediff('day', s.lo, o.o_orderdate) * 3
                      < datediff('day', s.lo, s.hi) + 1
                      THEN 1 ELSE 0 END) AS c1,
             max(CASE WHEN datediff('day', o.o_orderdate, s.hi) * 3
                      < datediff('day', s.lo, s.hi) + 1
                      THEN 1 ELSE 0 END) AS c2
      FROM orders o, span s GROUP BY 1
    ),
    ct AS (
      SELECT CAST(count(*) AS BIGINT) AS n_true,
             CAST(sum(c1) AS BIGINT) AS n1,
             CAST(sum(c2) AS BIGINT) AS n2,
             CAST(sum(c1 * c2) AS BIGINT) AS m
      FROM marks
    )
    SELECT n_true AS n_customers_true, n1 AS n_first_window,
           n2 AS n_second_window, m AS n_recaptured,
           CAST((n1 * n2) // greatest(m, 1) AS BIGINT)
             AS lincoln_petersen,
           CAST(((n1 + 1) * (n2 + 1)) // (m + 1) - 1 AS BIGINT)
             AS chapman_estimate
    FROM ct
    """,
    doc="Capture-recapture estimation of the active customer "
    "population: 'capture' = ordered in the first third of the "
    "calendar span, 'recapture' = ordered in the last third; the "
    "Lincoln-Petersen estimator n1 n2 / m and Chapman's bias-"
    "corrected (n1+1)(n2+1)/(m+1) - 1 are emitted BESIDE the true "
    "distinct-customer count, so the closure-assumption bias is "
    "measurable — the mark-recapture design used to size populations "
    "one cannot enumerate (deduplicated entities across corpus "
    "snapshots being the pipeline use). Exact integer floors; one "
    "customer rollup + 1-row span scalar broadcast.",
)
def customer_capture_recapture(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders", parallel=True)
    span = o.agg(
        F.min("o_orderdate").alias("lo"), F.max("o_orderdate").alias("hi")
    )
    marks = (
        o.crossJoin(F.broadcast(span))
        .groupBy("o_custkey")
        .agg(
            F.max(
                F.when(
                    F.datediff(F.col("o_orderdate"), F.col("lo")) * 3
                    < F.datediff(F.col("hi"), F.col("lo")) + 1,
                    1,
                ).otherwise(0)
            ).alias("c1"),
            F.max(
                F.when(
                    F.datediff(F.col("hi"), F.col("o_orderdate")) * 3
                    < F.datediff(F.col("hi"), F.col("lo")) + 1,
                    1,
                ).otherwise(0)
            ).alias("c2"),
        )
    )
    ct = marks.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_true"),
        F.sum("c1").cast("bigint").alias("n1"),
        F.sum("c2").cast("bigint").alias("n2"),
        F.sum(F.col("c1") * F.col("c2")).cast("bigint").alias("m"),
    )
    return ct.select(
        F.col("n_true").alias("n_customers_true"),
        F.col("n1").alias("n_first_window"),
        F.col("n2").alias("n_second_window"),
        F.col("m").alias("n_recaptured"),
        F.expr("CAST((n1 * n2) div greatest(m, 1) AS BIGINT)").alias(
            "lincoln_petersen"
        ),
        F.expr(
            "CAST(((n1 + 1) * (n2 + 1)) div (m + 1) - 1 AS BIGINT)"
        ).alias("chapman_estimate"),
    )


# ---------------------------------------------------------------------------
# agg_richness_indices — Menhinick / Margalef part-assortment richness
# ---------------------------------------------------------------------------


@register(
    "agg_richness_indices",
    oracle="""
    WITH cell AS (
      SELECT s.s_nationkey AS nk,
             CAST(count(*) AS BIGINT) AS n,
             CAST(count(DISTINCT l.l_partkey) AS BIGINT) AS s_rich
      FROM lineitem l JOIN supplier s ON s.s_suppkey = l.l_suppkey
      GROUP BY 1
    )
    SELECT CAST(nk AS BIGINT) AS nation, n AS n_lines,
           s_rich AS n_distinct_parts,
           CAST((1000 * s_rich * s_rich) // n AS BIGINT)
             AS menhinick2_milli,
           CAST((1000000 * (s_rich - 1))
                // CAST(floor(1000000.0 * ln(CAST(n AS DOUBLE)))
                        AS BIGINT) AS BIGINT) AS margalef_milli
    FROM cell
    ORDER BY nation
    """,
    doc="Ecological richness indices of each supplier nation's part "
    "assortment: Menhinick D = S/sqrt(n) emitted as the exact squared "
    "form 1000 S^2/n (sqrt stays off-surface), and Margalef "
    "D = (S-1)/ln(n) with ONE floor-quantized micro-nat ln per "
    "bounded 25-nation cell (quantized-ln discipline) — the "
    "assortment-diversity pair that, unlike the abundance-weighted "
    "Hill/Blau/Simpson family already present, measures RICHNESS "
    "(distinct types vs effort) and so catches catalog collapse that "
    "evenness metrics miss. One fact join (broadcast supplier dim) + "
    "25-cell rollup.",
)
def agg_richness_indices(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem", parallel=True)
    s = table(spark, sf_dir, "supplier")
    cell = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .groupBy(F.col("s_nationkey").alias("nk"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.countDistinct("l_partkey").cast("bigint").alias("s_rich"),
        )
    )
    return cell.select(
        F.col("nk").cast("bigint").alias("nation"),
        F.col("n").alias("n_lines"),
        F.col("s_rich").alias("n_distinct_parts"),
        F.expr(
            "CAST((1000 * s_rich * s_rich) div n AS BIGINT)"
        ).alias("menhinick2_milli"),
        F.expr(
            "CAST((1000000 * (s_rich - 1))"
            " div CAST(floor(1000000.0 * ln(CAST(n AS DOUBLE)))"
            " AS BIGINT) AS BIGINT)"
        ).alias("margalef_milli"),
    ).orderBy("nation")


# ---------------------------------------------------------------------------
# agg_v_measure — homogeneity / completeness / V on the quantized-ln surface
# ---------------------------------------------------------------------------


@register(
    "agg_v_measure",
    oracle="""
    WITH joint AS (
      SELECT o.o_orderpriority AS k, l.l_returnflag AS c,
             CAST(count(*) AS BIGINT) AS n_kc
      FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
      GROUP BY 1, 2
    ),
    tot AS (SELECT CAST(sum(n_kc) AS BIGINT) AS n FROM joint),
    mk AS (SELECT k, CAST(sum(n_kc) AS BIGINT) AS n_k FROM joint GROUP BY 1),
    mc AS (SELECT c, CAST(sum(n_kc) AS BIGINT) AS n_c FROM joint GROUP BY 1),
    hc AS (
      SELECT CAST(sum(n_c * CAST(floor(1000000.0 *
               ln(CAST(t.n AS DOUBLE) / n_c)) AS BIGINT)) AS HUGEINT) AS h
      FROM mc, tot t
    ),
    hk AS (
      SELECT CAST(sum(n_k * CAST(floor(1000000.0 *
               ln(CAST(t.n AS DOUBLE) / n_k)) AS BIGINT)) AS HUGEINT) AS h
      FROM mk, tot t
    ),
    hck AS (
      SELECT CAST(sum(j.n_kc * CAST(floor(1000000.0 *
               ln(CAST(mk.n_k AS DOUBLE) / j.n_kc)) AS BIGINT))
               AS HUGEINT) AS h
      FROM joint j JOIN mk ON mk.k = j.k
    ),
    hkc AS (
      SELECT CAST(sum(j.n_kc * CAST(floor(1000000.0 *
               ln(CAST(mc.n_c AS DOUBLE) / j.n_kc)) AS BIGINT))
               AS HUGEINT) AS h
      FROM joint j JOIN mc ON mc.c = j.c
    ),
    hcv AS (
      SELECT 1000000 - (1000000 * hck.h) // greatest(hc.h, 1) AS h_ppm,
             1000000 - (1000000 * hkc.h) // greatest(hk.h, 1) AS c_ppm,
             t.n
      FROM hck, hc, hkc, hk, tot t
    )
    SELECT CAST(n AS BIGINT) AS n_rows,
           CAST(h_ppm AS BIGINT) AS homogeneity_ppm,
           CAST(c_ppm AS BIGINT) AS completeness_ppm,
           CAST((2 * h_ppm * c_ppm) // greatest(h_ppm + c_ppm, 1)
                AS BIGINT) AS v_measure_ppm
    FROM hcv
    """,
    doc="V-measure of the order-priority 'clustering' against the "
    "return-flag 'classes': homogeneity h = 1 - H(C|K)/H(C), "
    "completeness c = 1 - H(K|C)/H(K), V = their harmonic mean — the "
    "entropy-based external clustering validation that, unlike "
    "agg_mutual_information (raw MI) or agg_rand_adjusted (pair "
    "counting), separates the two failure directions. Every entropy "
    "is a sum of n_cell * floor-quantized micro-nat ln of an EXACT "
    "integer ratio over the bounded 15-cell contingency and its "
    "marginals (quantized-ln discipline), and h, c, V are ppm floor "
    "ratios of those integers (documented two-layer floor). One "
    "co-partitioned fact join + 15-cell census.",
)
def agg_v_measure(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem", parallel=True)
    o = table(spark, sf_dir, "orders")
    joint = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(
            F.col("o_orderpriority").alias("k"),
            F.col("l_returnflag").alias("c"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_kc"))
    )
    from mongodb_nats_connector_spark.plans.caching import (
        persist_until_collected,
    )

    tot = joint.agg(F.sum("n_kc").cast("bigint").alias("n"))
    mk = joint.groupBy("k").agg(F.sum("n_kc").cast("bigint").alias("n_k"))
    mc = joint.groupBy("c").agg(F.sum("n_kc").cast("bigint").alias("n_c"))

    def lnq(num: str, den: str) -> str:
        return (
            f"CAST(floor(1000000.0 * ln(CAST({num} AS DOUBLE) / {den}))"
            " AS BIGINT)"
        )

    hc = mc.crossJoin(F.broadcast(tot)).agg(
        _dsum(F.expr(f"n_c * {lnq('n', 'n_c')}")).alias("h")
    )
    hk = mk.crossJoin(F.broadcast(tot)).agg(
        _dsum(F.expr(f"n_k * {lnq('n', 'n_k')}")).alias("h")
    )
    hck = joint.join(F.broadcast(mk), "k").agg(
        _dsum(F.expr(f"n_kc * {lnq('n_k', 'n_kc')}")).alias("h")
    )
    hkc = joint.join(F.broadcast(mc), "c").agg(
        _dsum(F.expr(f"n_kc * {lnq('n_c', 'n_kc')}")).alias("h")
    )
    hcv = (
        hck.withColumnRenamed("h", "hck")
        .crossJoin(F.broadcast(hc.withColumnRenamed("h", "hc")))
        .crossJoin(F.broadcast(hkc.withColumnRenamed("h", "hkc")))
        .crossJoin(F.broadcast(hk.withColumnRenamed("h", "hk")))
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("n"),
            F.expr(
                "1000000 - (1000000 * hck) div greatest(hc, 1)"
            ).alias("h_ppm"),
            F.expr(
                "1000000 - (1000000 * hkc) div greatest(hk, 1)"
            ).alias("c_ppm"),
        )
    )
    out = hcv.select(
        F.col("n").cast("bigint").alias("n_rows"),
        F.col("h_ppm").cast("bigint").alias("homogeneity_ppm"),
        F.col("c_ppm").cast("bigint").alias("completeness_ppm"),
        F.expr(
            "CAST((2 * h_ppm * c_ppm) div greatest(h_ppm + c_ppm, 1)"
            " AS BIGINT)"
        ).alias("v_measure_ppm"),
    )
    return persist_until_collected(joint, out)


# ---------------------------------------------------------------------------
# orders_gompertz_3point — closed-form Gompertz growth fit at 3 anchors
# ---------------------------------------------------------------------------


@register(
    "orders_gompertz_3point",
    oracle="""
    WITH m AS (
      SELECT year(o_orderdate) * 12 + month(o_orderdate) AS ym,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                  AS HUGEINT) AS rc
      FROM orders GROUP BY 1
    ),
    sp AS (
      SELECT min(ym) AS lo, max(ym) AS hi FROM m
    ),
    anchors AS (
      SELECT sp.lo + ((sp.hi - sp.lo + 1) // 3) - 1 AS t1,
             sp.lo + (2 * (sp.hi - sp.lo + 1) // 3) - 1 AS t2,
             sp.hi AS t3
      FROM sp
    ),
    ys AS (
      SELECT CAST(sum(CASE WHEN m.ym <= a.t1 THEN m.rc ELSE 0 END)
                  AS BIGINT) AS y1,
             CAST(sum(CASE WHEN m.ym <= a.t2 THEN m.rc ELSE 0 END)
                  AS BIGINT) AS y2,
             CAST(sum(m.rc) AS BIGINT) AS y3,
             CAST(a.t2 - a.t1 AS BIGINT) AS step
      FROM m, anchors a
      GROUP BY a.t1, a.t2, a.t3
    ),
    ls AS (
      SELECT y1, y2, y3, step,
             CAST(floor(1000000.0 * ln(CAST(y1 AS DOUBLE))) AS BIGINT) AS l1,
             CAST(floor(1000000.0 * ln(CAST(y2 AS DOUBLE))) AS BIGINT) AS l2,
             CAST(floor(1000000.0 * ln(CAST(y3 AS DOUBLE))) AS BIGINT) AS l3
      FROM ys
    )
    SELECT y3 AS cum_revenue_cents, step AS anchor_step_months,
           l1 AS ln_y1_micro, l2 AS ln_y2_micro, l3 AS ln_y3_micro,
           CASE WHEN l2 - l1 > l3 - l2 AND l3 > l2 THEN
             CAST(floor(1000000.0 * ln(CAST(l2 - l1 AS DOUBLE)
                  / (l3 - l2))) AS BIGINT) ELSE NULL END
             AS decay_ln_micro,
           CASE WHEN l2 - l1 > l3 - l2 THEN
             CAST(l1 + ((l2 - l1) * (l2 - l1))
                  // ((l2 - l1) - (l3 - l2)) AS BIGINT) ELSE NULL END
             AS ln_k_micro
    FROM ls
    """,
    doc="Closed-form 3-point Gompertz growth fit of cumulative order "
    "revenue: with equally spaced anchors t1, t2, t3, the log-"
    "cumulative increments d1 = lnY2 - lnY1 and d2 = lnY3 - lnY2 of a "
    "Gompertz curve Y = K exp(-b e^(-ct)) form a geometric sequence "
    "with ratio e^(-c step), so c = ln(d1/d2)/step and the carrying "
    "capacity satisfies lnK = lnY1 + d1^2/(d1 - d2) — the saturation-"
    "forecast complement of orders_bass_diffusion (Bass fits adopter "
    "interaction; Gompertz fits asymmetric saturation). Anchor "
    "cumulative sums are exact integer cents selected by conditional "
    "aggregation against 1-row anchor scalars (no month window); the "
    "three lnY and the decay ln are floor-quantized micro-nat lns of "
    "exact integers, and lnK clears as one integer floor ratio of "
    "ln-micro differences. Non-Gompertz shapes (d1 <= d2) emit typed "
    "NULLs rather than a bogus fit.",
)
def orders_gompertz_3point(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders", parallel=True)
    m = o.groupBy(
        (F.year("o_orderdate") * 12 + F.month("o_orderdate")).alias("ym")
    ).agg(
        _dsum(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias(
            "rc"
        )
    )
    sp = m.agg(F.min("ym").alias("lo"), F.max("ym").alias("hi"))
    anchors = sp.select(
        F.expr("lo + ((hi - lo + 1) div 3) - 1").alias("t1"),
        F.expr("lo + (2 * (hi - lo + 1) div 3) - 1").alias("t2"),
        F.col("hi").alias("t3"),
    )
    ys = (
        m.crossJoin(F.broadcast(anchors))
        .groupBy("t1", "t2", "t3")
        .agg(
            F.sum(F.when(F.col("ym") <= F.col("t1"), F.col("rc")).otherwise(
                F.lit(0).cast("decimal(38,0)")
            ))
            .cast("bigint")
            .alias("y1"),
            F.sum(F.when(F.col("ym") <= F.col("t2"), F.col("rc")).otherwise(
                F.lit(0).cast("decimal(38,0)")
            ))
            .cast("bigint")
            .alias("y2"),
            F.sum("rc").cast("bigint").alias("y3"),
        )
        .select(
            "y1", "y2", "y3",
            (F.col("t2") - F.col("t1")).cast("bigint").alias("step"),
        )
    )
    lnm = (
        "CAST(floor(1000000.0 * ln(CAST({v} AS DOUBLE))) AS BIGINT)"
    )
    ls = ys.select(
        "y1", "y2", "y3", "step",
        F.expr(lnm.format(v="y1")).alias("l1"),
        F.expr(lnm.format(v="y2")).alias("l2"),
        F.expr(lnm.format(v="y3")).alias("l3"),
    )
    return ls.select(
        F.col("y3").alias("cum_revenue_cents"),
        F.col("step").alias("anchor_step_months"),
        F.col("l1").alias("ln_y1_micro"),
        F.col("l2").alias("ln_y2_micro"),
        F.col("l3").alias("ln_y3_micro"),
        F.expr(
            "CASE WHEN l2 - l1 > l3 - l2 AND l3 > l2 THEN"
            " CAST(floor(1000000.0 * ln(CAST(l2 - l1 AS DOUBLE)"
            " / (l3 - l2))) AS BIGINT) ELSE NULL END"
        ).alias("decay_ln_micro"),
        F.expr(
            "CASE WHEN l2 - l1 > l3 - l2 THEN"
            " CAST(l1 + ((l2 - l1) * (l2 - l1))"
            " div ((l2 - l1) - (l3 - l2)) AS BIGINT) ELSE NULL END"
        ).alias("ln_k_micro"),
    )


# ---------------------------------------------------------------------------
# orders_tornqvist_index — chained Törnqvist over the top-20 basket
# ---------------------------------------------------------------------------


@register(
    "orders_tornqvist_index",
    oracle="""
    WITH cell AS (
      SELECT l_partkey AS pk, year(l_shipdate) AS yr,
             CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                  AS BIGINT) AS rc,
             CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS q
      FROM lineitem GROUP BY 1, 2
    ),
    top20 AS (
      SELECT pk FROM (
        SELECT pk, CAST(sum(rc) AS HUGEINT) AS tot,
               row_number() OVER (ORDER BY sum(rc) DESC, pk) AS r
        FROM cell GROUP BY 1
      ) WHERE r <= 20
    ),
    p AS (
      SELECT c.pk, c.yr, c.rc, (1000 * c.rc) // c.q AS p_mc
      FROM cell c JOIN top20 t ON t.pk = c.pk WHERE c.q > 0
    ),
    yr_tot AS (
      SELECT yr, CAST(sum(rc) AS HUGEINT) AS rtot FROM p GROUP BY 1
    ),
    pair AS (
      SELECT c1.yr,
             CAST(count(*) AS BIGINT) AS n_parts,
             CAST(sum(
               ((1000000 * CAST(c1.rc AS HUGEINT) * t0.rtot
                 + 1000000 * CAST(c0.rc AS HUGEINT) * t1.rtot)
                // (2 * t1.rtot * t0.rtot))
               * CAST(floor(1000000.0 * ln(CAST(c1.p_mc AS DOUBLE)
                     / c0.p_mc)) AS BIGINT)) AS HUGEINT) AS t_scaled
      FROM p c1
      JOIN p c0 ON c0.pk = c1.pk AND c0.yr = c1.yr - 1
      JOIN yr_tot t1 ON t1.yr = c1.yr
      JOIN yr_tot t0 ON t0.yr = c1.yr - 1
      GROUP BY 1
    )
    SELECT yr, n_parts,
           CAST(t_scaled AS BIGINT) AS tornqvist_scaled,
           CAST(CASE WHEN t_scaled >= 0 THEN t_scaled // 1000000
                ELSE -((-t_scaled) // 1000000) END AS BIGINT)
             AS ln_index_micro
    FROM pair
    ORDER BY yr
    """,
    doc="Chained Törnqvist price index over the top-20-revenue part "
    "basket: ln I_t = sum_i wbar_i ln(p_it / p_i,t-1) with wbar the "
    "average of the part's revenue shares in the two years — the "
    "superlative index (exact for translog preferences) completing "
    "the index-number trio beside the fixed-base orders_price_index "
    "and the chained orders_fisher_price_index. The basket is bounded "
    "top-k by construction, so each (part, year-pair) member "
    "contributes ONE floor-quantized micro-nat ln of the exact "
    "integer milli-cent price ratio (quantized-ln discipline), "
    "weighted by the single-floor cleared average share in ppm "
    "(r1 R0 + r0 R1)/(2 R1 R0); the emitted index is the exact "
    "integer sum of ppm x micro terms. Basket selection is one "
    "TakeOrdered top-20; everything after is bounded.",
)
def orders_tornqvist_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem", parallel=True)
    cell = li.groupBy(
        F.col("l_partkey").alias("pk"),
        F.year("l_shipdate").alias("yr"),
    ).agg(
        F.sum(F.round(F.col("l_extendedprice") * 100).cast("bigint"))
        .cast("bigint")
        .alias("rc"),
        F.sum(F.round("l_quantity").cast("bigint"))
        .cast("bigint")
        .alias("q"),
    )
    from mongodb_nats_connector_spark.plans.caching import (
        persist_until_collected,
    )

    top20 = (
        cell.groupBy("pk")
        .agg(_dsum(F.col("rc")).alias("tot"))
        .orderBy(F.col("tot").desc(), "pk")
        .limit(20)
        .select("pk")
    )
    p = (
        cell.join(F.broadcast(top20), "pk")
        .filter(F.col("q") > 0)
        .select("pk", "yr", "rc", F.expr("(1000 * rc) div q").alias("p_mc"))
    )
    yr_tot = p.groupBy("yr").agg(_dsum(F.col("rc")).alias("rtot"))
    c1, c0 = p.alias("c1"), p.alias("c0")
    t1 = yr_tot.alias("t1")
    t0 = yr_tot.alias("t0")
    pair = (
        c1.join(
            c0,
            (F.col("c0.pk") == F.col("c1.pk"))
            & (F.col("c0.yr") == F.col("c1.yr") - 1),
        )
        .join(F.broadcast(t1), F.col("t1.yr") == F.col("c1.yr"))
        .join(F.broadcast(t0), F.col("t0.yr") == F.col("c1.yr") - 1)
        .groupBy(F.col("c1.yr").alias("yr"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_parts"),
            _dsum(
                F.expr(
                    "((1000000 * CAST(c1.rc AS DECIMAL(38,0)) * t0.rtot"
                    " + 1000000 * CAST(c0.rc AS DECIMAL(38,0)) * t1.rtot)"
                    " div (2 * t1.rtot * t0.rtot))"
                    " * CAST(floor(1000000.0 * ln(CAST(c1.p_mc AS DOUBLE)"
                    " / c0.p_mc)) AS BIGINT)"
                )
            ).alias("t_scaled"),
        )
    )
    out = pair.select(
        "yr",
        "n_parts",
        F.col("t_scaled").cast("bigint").alias("tornqvist_scaled"),
        F.expr(
            "CAST(CASE WHEN t_scaled >= 0 THEN t_scaled div 1000000"
            " ELSE -((-t_scaled) div 1000000) END AS BIGINT)"
        ).alias("ln_index_micro"),
    ).orderBy("yr")
    return persist_until_collected(p, out)


# ---------------------------------------------------------------------------
# embedding_mahalanobis_diag — diagonal-whitened nearest neighbors
# ---------------------------------------------------------------------------

_Q8 = (
    "list_transform(embedding, x -> CAST(floor((CAST(x AS DOUBLE) * 127.0)"
    " / greatest(list_max(list_transform(embedding,"
    " y -> abs(CAST(y AS DOUBLE)))), 1e-30) + 0.5) AS BIGINT))"
)
# the same int8 quantization as Spark SQL (transform/array_max HOFs)
_Q8_SPARK = (
    "transform(embedding, x -> CAST(floor((CAST(x AS DOUBLE) * 127.0D)"
    " / greatest(array_max(transform(embedding,"
    " y -> abs(CAST(y AS DOUBLE)))), 1e-30D) + 0.5D) AS BIGINT))"
)


@register(
    "embedding_mahalanobis_diag",
    oracle=f"""
    WITH e AS (
      SELECT vec_id, {_Q8} AS q FROM embeddings
    ),
    dims AS (
      SELECT t.i,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(e.q[t.i + 1]) AS BIGINT) AS s,
             CAST(sum(e.q[t.i + 1] * e.q[t.i + 1]) AS BIGINT) AS s2
      FROM e, range(64) t(i) GROUP BY 1
    ),
    wts AS (
      SELECT list((1000000000 * n * n)
                  // greatest(n * s2 - s * s, 1) ORDER BY i) AS w
      FROM dims
    ),
    qs AS (SELECT vec_id AS query_id, q AS qq FROM e WHERE vec_id < 8),
    scored AS (
      SELECT qs.query_id, e.vec_id AS neighbor_id,
             CAST(list_sum(list_transform(range(64), i ->
                  w.w[i + 1] * (qs.qq[i + 1] - e.q[i + 1])
                            * (qs.qq[i + 1] - e.q[i + 1])))
                  AS BIGINT) AS wd2
      FROM qs, wts w, e
      WHERE e.vec_id <> qs.query_id
    ),
    ranked AS (
      SELECT query_id, neighbor_id, wd2,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY wd2, neighbor_id) AS rn
      FROM scored
    )
    SELECT query_id, neighbor_id, wd2 AS whitened_d2,
           CAST(rn AS BIGINT) AS rn
    FROM ranked WHERE rn <= 5
    ORDER BY query_id, rn
    """,
    doc="Diagonal-Mahalanobis top-5 nearest neighbors over the int8-"
    "quantized embeddings: each dimension's squared difference is "
    "whitened by the inverse per-dimension population variance, "
    "floor-quantized once per bounded 64-dim cell as w_d = 1e9 n^2 / "
    "(n S2_d - S_d^2) — the anisotropy-corrected metric that stops "
    "high-variance dimensions from dominating the bruteforce/"
    "quantized cosine rankings already present. The per-dim variance "
    "frame is an exact-integer 64-row rollup built IN-PLAN (posexplode"
    " + sort_array collect, no driver collect); distances are exact "
    "int64 weighted sums via JVM array HOFs; per-query top-5 ranks on "
    "integers. Broadcast 8-query set + broadcast 1-row weight array; "
    "one topk window.",
)
def embedding_mahalanobis_diag(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "embeddings", parallel=True).select(
        "vec_id", F.expr(_Q8_SPARK).alias("q")
    )
    from mongodb_nats_connector_spark.plans.caching import (
        persist_until_collected,
    )

    dims = (
        e.select(F.posexplode("q").alias("i", "v"))
        .groupBy("i")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("v").cast("bigint").alias("s"),
            F.sum(F.col("v") * F.col("v")).cast("bigint").alias("s2"),
        )
    )
    wts = dims.select(
        F.struct(
            "i",
            F.expr(
                "(1000000000 * n * n) div greatest(n * s2 - s * s, 1)"
            ).alias("w"),
        ).alias("iw")
    ).agg(
        F.expr(
            "transform(array_sort(collect_list(iw)), t -> t.w)"
        ).alias("w")
    )
    qs = e.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), F.col("q").alias("qq")
    )
    scored = (
        e.crossJoin(F.broadcast(qs))
        .filter(F.col("vec_id") != F.col("query_id"))
        .crossJoin(F.broadcast(wts))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.expr(
                "CAST(aggregate(zip_with(zip_with(qq, q, (a, b) ->"
                " (a - b) * (a - b)), w, (d, ww) -> d * ww),"
                " CAST(0 AS BIGINT), (acc, x) -> acc + x) AS BIGINT)"
            ).alias("wd2"),
        )
    )
    ranked = scored.withColumn(
        "rn",
        F.row_number()
        .over(
            Window.partitionBy("query_id").orderBy("wd2", "neighbor_id")
        )
        .cast("bigint"),
    )
    out = (
        ranked.filter(F.col("rn") <= 5)
        .select(
            "query_id",
            "neighbor_id",
            F.col("wd2").alias("whitened_d2"),
            "rn",
        )
        .orderBy("query_id", "rn")
    )
    return persist_until_collected(e, out)


# ---------------------------------------------------------------------------
# embedding_hopkins_statistic — clusterability vs a deterministic lattice
# ---------------------------------------------------------------------------


@register(
    "embedding_hopkins_statistic",
    oracle=f"""
    WITH e AS (
      SELECT vec_id, {_Q8} AS q FROM embeddings
    ),
    synth AS (
      SELECT j, list_transform(range(64), d ->
               CAST((j * 37 + d * 11) % 255 - 127 AS BIGINT)) AS s
      FROM range(16) t(j)
    ),
    u AS (
      SELECT synth.j,
             CAST(min(list_sum(list_transform(range(64), i ->
                  (synth.s[i + 1] - e.q[i + 1])
                  * (synth.s[i + 1] - e.q[i + 1])))) AS BIGINT) AS nn2
      FROM synth, e GROUP BY 1
    ),
    w AS (
      SELECT a.vec_id,
             CAST(min(list_sum(list_transform(range(64), i ->
                  (a.q[i + 1] - b.q[i + 1])
                  * (a.q[i + 1] - b.q[i + 1])))) AS BIGINT) AS nn2
      FROM e a, e b
      WHERE a.vec_id < 16 AND b.vec_id <> a.vec_id
      GROUP BY 1
    ),
    s AS (
      SELECT (SELECT CAST(sum(nn2) AS BIGINT) FROM u) AS su,
             (SELECT CAST(sum(nn2) AS BIGINT) FROM w) AS sw
    )
    SELECT su AS synthetic_nn2_sum, sw AS real_nn2_sum,
           CAST((1000000 * su) // (su + sw) AS BIGINT) AS hopkins_ppm
    FROM s
    """,
    doc="Hopkins clusterability statistic of the embedding cloud in "
    "int8-quantized space: compare nearest-neighbor distances of 16 "
    "REAL probe points against 16 DETERMINISTIC lattice probes "
    "spanning the int8 cube ((37j + 11d) mod 255 - 127 — the "
    "determinism-preserving stand-in for Hopkins' uniform draws), "
    "H = sum u / (sum u + sum w): H near 1/2 means the cloud is "
    "indistinguishable from uniform (clustering output would be "
    "meaningless), H near 1 means strong cluster structure — the "
    "PREcondition check for kmeans_embeddings / embedding_centroids "
    "that the validity indices (silhouette, dunn, calinski) assume. "
    "All distances are exact int64 squared sums over JVM HOFs; two "
    "bounded 16-probe broadcast sweeps; one ppm floor.",
)
def embedding_hopkins_statistic(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "embeddings", parallel=True).select(
        "vec_id", F.expr(_Q8_SPARK).alias("q")
    )
    from mongodb_nats_connector_spark.plans.caching import (
        persist_until_collected,
    )

    synth = spark.range(16).select(
        F.col("id").alias("j"),
        F.expr(
            "transform(sequence(0, 63), d ->"
            " CAST((id * 37 + d * 11) % 255 - 127 AS BIGINT))"
        ).alias("s"),
    )
    d2 = (
        "aggregate(zip_with({a}, {b}, (x, y) -> (x - y) * (x - y)),"
        " CAST(0 AS BIGINT), (acc, v) -> acc + v)"
    )
    u = (
        e.crossJoin(F.broadcast(synth))
        .groupBy("j")
        .agg(
            F.min(F.expr(d2.format(a="s", b="q"))).cast("bigint").alias(
                "nn2"
            )
        )
    )
    probes = e.filter(F.col("vec_id") < 16).select(
        F.col("vec_id").alias("pid"), F.col("q").alias("p")
    )
    w = (
        e.crossJoin(F.broadcast(probes))
        .filter(F.col("vec_id") != F.col("pid"))
        .groupBy("pid")
        .agg(
            F.min(F.expr(d2.format(a="p", b="q"))).cast("bigint").alias(
                "nn2"
            )
        )
    )
    su = u.agg(F.sum("nn2").cast("bigint").alias("su"))
    sw = w.agg(F.sum("nn2").cast("bigint").alias("sw"))
    out = su.crossJoin(F.broadcast(sw)).select(
        F.col("su").alias("synthetic_nn2_sum"),
        F.col("sw").alias("real_nn2_sum"),
        F.expr(
            "CAST((1000000 * su) div (su + sw) AS BIGINT)"
        ).alias("hopkins_ppm"),
    )
    return persist_until_collected(e, out)


# ---------------------------------------------------------------------------
# graph_butterfly_count — bipartite 4-cycle census on the part-supplier graph
# ---------------------------------------------------------------------------


@register(
    "graph_butterfly_count",
    oracle="""
    WITH edges AS (
      SELECT DISTINCT l_partkey AS p, l_suppkey AS s FROM lineitem
    ),
    wedge AS (
      SELECT a.s AS s1, b.s AS s2, CAST(count(*) AS BIGINT) AS q
      FROM edges a JOIN edges b ON b.p = a.p AND a.s < b.s
      GROUP BY 1, 2
    ),
    deg AS (
      SELECT p, CAST(count(*) AS BIGINT) AS d FROM edges GROUP BY 1
    )
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM edges) AS n_edges,
           (SELECT CAST(sum(d * (d - 1) / 2) AS BIGINT) FROM deg)
             AS n_wedges,
           (SELECT CAST(count(*) AS BIGINT) FROM wedge)
             AS n_coparticipating_pairs,
           (SELECT CAST(sum(q * (q - 1) / 2) AS BIGINT) FROM wedge)
             AS n_butterflies
    """,
    doc="Butterfly (bipartite 4-cycle) census of the part-supplier "
    "incidence graph: a butterfly is two suppliers sharing two parts "
    "— the bipartite analogue of the triangle, the motif underlying "
    "bipartite clustering coefficients and dense-bicluster detection "
    "(co-supply rings here; co-click fraud blocks in the general "
    "pipeline). Counted exactly via the wedge decomposition: "
    "same-part supplier pairs from the part-co-partitioned self-join "
    "(the SCALING.md wedge-join shape: cost sum_p d_p^2, bounded by "
    "the supplier fan-out per part, never all-pairs), then "
    "sum C(q, 2) over pair co-occurrence counts q. d(d-1) and q(q-1) "
    "are even so the halved counts stay exact integers. One distinct "
    "+ one co-partitioned self-join + two rollups.",
)
def graph_butterfly_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem", parallel=True)
    edges = li.select(
        F.col("l_partkey").alias("p"), F.col("l_suppkey").alias("s")
    ).distinct()
    from mongodb_nats_connector_spark.plans.caching import (
        persist_until_collected,
    )

    a, b = edges.alias("a"), edges.alias("b")
    wedge = (
        a.join(
            b,
            (F.col("b.p") == F.col("a.p")) & (F.col("a.s") < F.col("b.s")),
        )
        .groupBy(F.col("a.s").alias("s1"), F.col("b.s").alias("s2"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("q"))
    )
    deg = edges.groupBy("p").agg(F.count(F.lit(1)).cast("bigint").alias("d"))
    n_edges = edges.agg(F.count(F.lit(1)).cast("bigint").alias("n_edges"))
    n_wedges = deg.agg(
        F.sum(F.expr("d * (d - 1) div 2")).cast("bigint").alias("n_wedges")
    )
    pairs = wedge.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_coparticipating_pairs"),
        F.sum(F.expr("q * (q - 1) div 2"))
        .cast("bigint")
        .alias("n_butterflies"),
    )
    out = (
        n_edges.crossJoin(F.broadcast(n_wedges))
        .crossJoin(F.broadcast(pairs))
        .select(
            "n_edges", "n_wedges", "n_coparticipating_pairs",
            "n_butterflies",
        )
    )
    return persist_until_collected(edges, out)


# ---------------------------------------------------------------------------
# similarity_weighted_jaccard — Ruzicka similarity of demand vectors
# ---------------------------------------------------------------------------


@register(
    "similarity_weighted_jaccard",
    oracle="""
    WITH r AS (
      SELECT l_partkey AS p,
             CAST(sum(CASE WHEN l_returnflag = 'R'
                  THEN CAST(round(l_quantity) AS BIGINT) ELSE 0 END)
                  AS BIGINT) AS vr,
             CAST(sum(CASE WHEN l_returnflag = 'A'
                  THEN CAST(round(l_quantity) AS BIGINT) ELSE 0 END)
                  AS BIGINT) AS va
      FROM lineitem WHERE l_returnflag IN ('R', 'A') GROUP BY 1
    ),
    s AS (
      SELECT CAST(count(*) AS BIGINT) AS n_parts,
             CAST(sum(least(vr, va)) AS HUGEINT) AS smin,
             CAST(sum(greatest(vr, va)) AS HUGEINT) AS smax
      FROM r
    )
    SELECT n_parts,
           CAST(smin AS BIGINT) AS sum_min,
           CAST(smax AS BIGINT) AS sum_max,
           CAST((1000000 * smin) // greatest(smax, 1) AS BIGINT)
             AS weighted_jaccard_ppm
    FROM s
    """,
    doc="Weighted Jaccard (Ruzicka) similarity between the returned "
    "('R') and accepted ('A') part-demand vectors: sum min(v_R, v_A) "
    "/ sum max(v_R, v_A) over per-part quantity totals — the "
    "real-valued generalization of the set Jaccard the dedup stack "
    "uses (dedup_ngram_jaccard compares SETS; this compares "
    "HISTOGRAMS, the form used for n-gram-profile and demand-vector "
    "similarity where multiplicity matters). min/max decompose "
    "per-part, so ONE co-partitioned rollup computes both sums "
    "exactly — no pairwise expansion exists at any scale. Single "
    "ppm floor.",
)
def similarity_weighted_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem", parallel=True)
    q = F.round("l_quantity").cast("bigint")
    r = (
        li.filter(F.col("l_returnflag").isin("R", "A"))
        .groupBy(F.col("l_partkey").alias("p"))
        .agg(
            F.sum(
                F.when(F.col("l_returnflag") == "R", q).otherwise(0)
            )
            .cast("bigint")
            .alias("vr"),
            F.sum(
                F.when(F.col("l_returnflag") == "A", q).otherwise(0)
            )
            .cast("bigint")
            .alias("va"),
        )
    )
    s = r.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_parts"),
        _dsum(F.least("vr", "va")).alias("smin"),
        _dsum(F.greatest("vr", "va")).alias("smax"),
    )
    return s.select(
        "n_parts",
        F.col("smin").cast("bigint").alias("sum_min"),
        F.col("smax").cast("bigint").alias("sum_max"),
        F.expr(
            "CAST((1000000 * smin) div greatest(smax, 1) AS BIGINT)"
        ).alias("weighted_jaccard_ppm"),
    )


# ---------------------------------------------------------------------------
# multimodal_bmp_rle8_decode — run-length-encoded BMP decompression
# ---------------------------------------------------------------------------

# 256-entry BGRA palette quads: B = 7c, G = 3c, R = 5c+1 (mod 256), A = 0
_RLE8_PALETTE_HEX = "".join(
    f"{(c * 7) % 256:02X}{(c * 3) % 256:02X}{(c * 5 + 1) % 256:02X}00"
    for c in range(256)
)


@register(
    "multimodal_bmp_rle8_decode",
    oracle="""
    WITH d AS (
      SELECT doc_id, 12 AS w, 3 + doc_id % 3 AS h FROM documents
    ),
    px AS (
      SELECT doc_id, w, h,
             flatten(list_transform(range(0, h), y ->
               list_transform(range(0, 12), x ->
                 CASE WHEN x < 7 THEN (doc_id * 3 + 5 * y) % 256
                      ELSE (doc_id * 7 + 11 * y) % 256 END))) AS ps
      FROM d
    )
    SELECT doc_id,
           CAST(w AS BIGINT) AS width,
           CAST(h AS BIGINT) AS height,
           CAST(w * h AS BIGINT) AS n_pixels,
           CAST(list_sum(ps) AS BIGINT) AS index_sum,
           CAST(list_sum(list_transform(range(0, w * h), i ->
                (i + 1) * ps[i + 1])) AS BIGINT) AS raster_checksum,
           CAST(list_sum(list_transform(ps, p ->
                (p * 5 + 1) % 256)) AS BIGINT) AS palette_r_sum
    FROM px
    ORDER BY doc_id
    """,
    doc="REAL run-length BMP decompression (BI_RLE8) on the hash "
    "surface: per doc, compose a complete 8bpp palettized BMP — "
    "headers, the 256-entry BGRA color table, and RLE8 pixel data as "
    "per-row encoded runs ([7, c1][5, c2] EOL per stored bottom-up "
    "row, EOB trailer) — as column expressions, then decompress with "
    "the full RLE8 state machine (multimodal.decode_bmp_rle8: runs, "
    "EOL/EOB, DELTA cursor jumps and ABSOLUTE mode with even padding, "
    "the latter two pinned by unit tests) over Arrow-batched "
    "mapInPandas. The raster checksum only matches the arithmetic "
    "oracle if runs, row resets AND the bottom-up flip were all "
    "honored; the palette-mapped red sum additionally pins the BGRA "
    "quad layout. Run-length joins entropy (DEFLATE), dictionary "
    "(LZW) and zlib-wrapped (PNG) coding on the payload-decode axis. "
    "Map-only; zero shuffles at any scale.",
)
def multimodal_bmp_rle8_decode(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from mongodb_nats_connector_spark.operators.multimodal import (
        RLE8_SCHEMA,
        _bmp_rle8_batches,
    )
    from mongodb_nats_connector_spark.operators.pipeline14 import _le_hex

    d = table(spark, sf_dir, "documents", parallel=True).select(
        "doc_id",
        F.lit(12).alias("w"),
        (F.lit(3) + F.col("doc_id") % 3).alias("h"),
    )
    # stored rows bottom-up: y' walks h-1 .. 0 in logical coords
    rle_hex = F.expr(
        "concat_ws('', transform(sequence(h - 1, 0, -1), y -> concat("
        "'07', lpad(hex((doc_id * 3 + 5 * y) % 256), 2, '0'),"
        "'05', lpad(hex((doc_id * 7 + 11 * y) % 256), 2, '0'),"
        "'0000')))"
    )
    data_len = (F.col("h") * 6 + 2).cast("bigint")  # 6 bytes/row + EOB
    bmp_hex = F.concat(
        F.lit("424D"),
        _le_hex(data_len + 1078, 4),        # file size
        F.lit("00000000"),
        _le_hex(F.lit(1078), 4),            # pixel offset = 54 + 1024
        F.lit("28000000"),
        _le_hex(F.col("w"), 4),
        _le_hex(F.col("h"), 4),
        F.lit("0100"),                      # planes
        F.lit("0800"),                      # bpp = 8
        F.lit("01000000"),                  # BI_RLE8
        _le_hex(data_len, 4),               # image size
        F.lit("00000000" * 4),              # ppm + palette counts
        F.lit(_RLE8_PALETTE_HEX),
        rle_hex,
        F.lit("0001"),                      # end of bitmap
    )
    return (
        d.select("doc_id", F.unhex(bmp_hex).alias("payload"))
        .mapInPandas(_bmp_rle8_batches, RLE8_SCHEMA)
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# multimodal_ulaw_audio_decode — ITU-T G.711 mu-law expansion
# ---------------------------------------------------------------------------


@register(
    "multimodal_ulaw_audio_decode",
    oracle="""
    WITH d AS (
      SELECT doc_id, 24 + doc_id % 9 AS n FROM documents
    ),
    s AS (
      SELECT doc_id, n,
             list_transform(range(0, n), i ->
               CASE WHEN (255 - ((doc_id * 13 + i * 7) % 256)) >= 128
                 THEN -(((((255 - ((doc_id * 13 + i * 7) % 256)) % 16)
                          * 8 + 132)
                         * (1 << (((255 - ((doc_id * 13 + i * 7) % 256))
                                   // 16) % 8))) - 132)
                 ELSE (((((255 - ((doc_id * 13 + i * 7) % 256)) % 16)
                         * 8 + 132)
                        * (1 << (((255 - ((doc_id * 13 + i * 7) % 256))
                                  // 16) % 8))) - 132)
               END) AS lin
      FROM d
    )
    SELECT doc_id,
           CAST(n AS BIGINT) AS n_samples,
           CAST(list_sum(lin) AS BIGINT) AS sum_linear,
           CAST(list_min(lin) AS BIGINT) AS min_linear,
           CAST(list_max(lin) AS BIGINT) AS max_linear,
           CAST(list_sum(list_transform(lin, v -> v * v)) AS BIGINT)
             AS energy
    FROM s
    ORDER BY doc_id
    """,
    doc="REAL ITU-T G.711 mu-law audio expansion on the hash surface: "
    "per doc, compose a mu-law byte stream as column expressions and "
    "expand it with the actual telephony codec bit algorithm "
    "(multimodal.decode_ulaw: complement, sign/3-bit-exponent/4-bit-"
    "mantissa split, ((mant<<3)+0x84)<<exp - 0x84 — the audioop."
    "ulaw2lin table) over Arrow-batched mapInPandas, while the oracle "
    "derives the SAME linear samples through independent integer "
    "arithmetic (mod/floor-div/power-of-two products — no bit "
    "operators shared with the decoder). Extends the audio axis "
    "beyond linear PCM (multimodal_pcm_sample_stats) to companded "
    "codecs; energy = sum of squared 16-bit samples rides along as "
    "the loudness feature a curation pipeline would gate on. "
    "Map-only; zero shuffles at any scale.",
)
def multimodal_ulaw_audio_decode(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from mongodb_nats_connector_spark.operators.multimodal import (
        ULAW_SCHEMA,
        _ulaw_batches,
    )

    d = table(spark, sf_dir, "documents", parallel=True).select(
        "doc_id", (F.lit(24) + F.col("doc_id") % 9).alias("n")
    )
    payload_hex = F.expr(
        "concat_ws('', transform(sequence(0, n - 1), i ->"
        " lpad(hex((doc_id * 13 + i * 7) % 256), 2, '0')))"
    )
    return (
        d.select("doc_id", F.unhex(payload_hex).alias("payload"))
        .mapInPandas(_ulaw_batches, ULAW_SCHEMA)
        .orderBy("doc_id")
    )
