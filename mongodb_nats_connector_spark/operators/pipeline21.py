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
