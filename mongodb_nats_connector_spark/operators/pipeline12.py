"""Round-11 bank: operators added after the round-10 verification window
closed at exactly 50 pending — they rank PAST the window by construction
(this module imports LAST in ``registry._load_all()``, the pipeline9-in-
round-7 precedent) and are driver-provable next round; until then the
local proof is tests/test_oracle_parity.py plus tools/bitexact_probe.py.

Contents: the Mann-Kendall trend test (the hypothesis-test companion of
agg_theil_sen's slope — the two are literally published as a pair),
Theil's U forecast-skill ratio (closing the evaluation loop around
orders_mape_backtest / orders_holt_linear), and Croston's method for
intermittent demand (the forecaster for sparse per-part series where
exponential smoothing on the raw calendar is biased by the zeros).

Reference provenance: like pipeline7-11, none of these exist in the
reference's Go core (internal/server/connector.go) — they extend the
engine-side analytics surface downstream of the connector's change streams
(SURVEY.md §2.3/§2.4).

Cross-engine determinism rules (pipeline11's discipline, including its
>2^53 lesson): exact integers end-to-end; any total that can cross 2^53
stays DECIMAL(38,0)/HUGEINT and floor-divides (`div` / ``//``) to a
sub-2^53 integer before the ONE double conversion; sequential folds use
round-to-integer of dyadic products only (the orders_holt_linear lesson);
no logarithm or exp anywhere on the hash surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mongodb_nats_connector_spark.plans.caching import (
    persist_until_collected,
    release_on_gc,
)
from mongodb_nats_connector_spark.registry import register
from mongodb_nats_connector_spark.sources.tables import table


# ---------------------------------------------------------------------------
# agg_mann_kendall — nonparametric monotonic-trend test on daily revenue
# ---------------------------------------------------------------------------


@register(
    "agg_mann_kendall",
    oracle="""
    WITH d AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS rev_c
      FROM orders WHERE o_orderdate IS NOT NULL GROUP BY 1
    ),
    idx AS (
      SELECT rev_c,
             CAST(date_diff('day', DATE '1992-01-01', day) AS BIGINT) AS t
      FROM d
    ),
    s AS (
      SELECT CAST(sum(CASE WHEN b.rev_c > a.rev_c THEN 1
                           WHEN b.rev_c < a.rev_c THEN -1 ELSE 0 END)
                  AS BIGINT) AS s_stat
      FROM idx a JOIN idx b ON b.t > a.t
    ),
    ties AS (
      SELECT CAST(coalesce(sum(c * (c - 1) * (2 * c + 5)), 0) AS BIGINT)
               AS tie18
      FROM (SELECT CAST(count(*) AS BIGINT) AS c FROM d GROUP BY rev_c)
      WHERE c > 1
    ),
    m AS (
      SELECT CAST(count(*) AS BIGINT) AS n FROM d
    )
    SELECT m.n AS n_days, s.s_stat,
           m.n * (m.n - 1) * (2 * m.n + 5) - t.tie18 AS var_x18,
           CASE WHEN s.s_stat > 0 THEN
                  (CAST(s.s_stat AS DOUBLE) - 1)
                  / sqrt((CAST(m.n AS DOUBLE) * (m.n - 1) * (2 * m.n + 5)
                          - t.tie18) / 18.0)
                WHEN s.s_stat < 0 THEN
                  (CAST(s.s_stat AS DOUBLE) + 1)
                  / sqrt((CAST(m.n AS DOUBLE) * (m.n - 1) * (2 * m.n + 5)
                          - t.tie18) / 18.0)
                ELSE 0.0 END AS mk_z,
           CAST(CASE WHEN s.s_stat > 0 THEN 1
                     WHEN s.s_stat < 0 THEN -1 ELSE 0 END AS BIGINT)
             AS trend_direction
    FROM m CROSS JOIN s CROSS JOIN ties t
    WHERE m.n > 2
      AND m.n * (m.n - 1) * (2 * m.n + 5) - t.tie18 > 0
    """,
    doc="Mann-Kendall monotonic-trend test over the daily revenue series — "
    "the published companion of agg_theil_sen (MK decides IF a monotonic "
    "trend exists, Theil-Sen estimates its slope; together they are the "
    "standard robust trend kit): S = sum of pairwise sign(x_j - x_i) over "
    "time-ordered pairs, the tie-corrected variance 18*Var = "
    "n(n-1)(2n+5) - sum t(t-1)(2t+5), and the continuity-corrected "
    "normal z. S, the tie term and 18*Var are EXACT BIGINTs (the "
    "calendar-bounded n keeps n^3 far below 2^53, so the one "
    "integer-to-double conversion is exact); z is one fixed-order IEEE "
    "expression per sign branch. The pair join is CALENDAR-bounded "
    "(days^2, independent of fact rows — the agg_theil_sen NLJ contract, "
    "allowlisted by design); everything upstream is one map-combined day "
    "rollup.",
)
def agg_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate").isNotNull()
    )
    d = o.groupBy(F.col("o_orderdate").cast("date").alias("day")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
        .cast("bigint")
        .alias("rev_c")
    )
    idx = d.select(
        "rev_c",
        F.date_diff(F.col("day"), F.lit("1992-01-01").cast("date"))
        .cast("bigint")
        .alias("t"),
    )
    idx = idx.persist()  # calendar-bounded; consumed by both pair sides
    a = idx.select(F.col("rev_c").alias("ra"), F.col("t").alias("ta"))
    b = idx.select(F.col("rev_c").alias("rb"), F.col("t").alias("tb"))
    s = a.join(F.broadcast(b), F.col("tb") > F.col("ta")).agg(
        F.sum(
            F.when(F.col("rb") > F.col("ra"), 1)
            .when(F.col("rb") < F.col("ra"), -1)
            .otherwise(0)
        )
        .cast("bigint")
        .alias("s_stat")
    )
    ties = (
        d.groupBy("rev_c")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        .filter(F.col("c") > 1)
        .agg(
            F.coalesce(
                F.sum(F.col("c") * (F.col("c") - 1) * (2 * F.col("c") + 5)),
                F.lit(0),
            )
            .cast("bigint")
            .alias("tie18")
        )
    )
    m = d.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    var18 = (
        F.col("n") * (F.col("n") - 1) * (2 * F.col("n") + 5) - F.col("tie18")
    )
    var18d = (
        F.col("n").cast("double") * (F.col("n") - 1) * (2 * F.col("n") + 5)
        - F.col("tie18")
    )
    sd = F.col("s_stat").cast("double")
    z = (
        F.when(F.col("s_stat") > 0, (sd - 1) / F.sqrt(var18d / 18.0))
        .when(F.col("s_stat") < 0, (sd + 1) / F.sqrt(var18d / 18.0))
        .otherwise(F.lit(0.0))
    )
    out = (
        m.crossJoin(F.broadcast(s))
        .crossJoin(F.broadcast(ties))
        .filter((F.col("n") > 2) & (var18 > 0))
        .select(
            F.col("n").alias("n_days"),
            "s_stat",
            var18.alias("var_x18"),
            z.alias("mk_z"),
            F.when(F.col("s_stat") > 0, 1)
            .when(F.col("s_stat") < 0, -1)
            .otherwise(0)
            .cast("bigint")
            .alias("trend_direction"),
        )
    )
    return release_on_gc(idx, out)


# ---------------------------------------------------------------------------
# orders_theil_u — forecast-skill ratio of the MA3 model vs the naive walk
# ---------------------------------------------------------------------------


@register(
    "orders_theil_u",
    oracle="""
    WITH monthly AS (
      SELECT date_trunc('month', o_orderdate) AS month,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS rev_c
      FROM orders WHERE o_orderdate IS NOT NULL GROUP BY 1
    ),
    lagged AS (
      SELECT month, rev_c,
             lag(rev_c, 1) OVER w AS a1,
             lag(rev_c, 2) OVER w AS a2,
             lag(rev_c, 3) OVER w AS a3
      FROM monthly
      WINDOW w AS (ORDER BY month)
    ),
    scored AS (
      SELECT CAST(3 * rev_c - (a1 + a2 + a3) AS BIGINT) AS e_model_x3,
             CAST(3 * (rev_c - a1) AS BIGINT) AS e_naive_x3
      FROM lagged WHERE a3 IS NOT NULL
    ),
    s AS (
      SELECT CAST(count(*) AS BIGINT) AS n_scored,
             sum(CAST(e_model_x3 AS HUGEINT) * e_model_x3) AS num,
             sum(CAST(e_naive_x3 AS HUGEINT) * e_naive_x3) AS den
      FROM scored
    )
    SELECT n_scored,
           CAST((num * 1000000000) // den AS BIGINT) AS u2_nano,
           CAST(CAST((num * 1000000000) // den AS BIGINT) AS DOUBLE)
             / 1000000000.0 AS theil_u2,
           sqrt(CAST(CAST((num * 1000000000) // den AS BIGINT) AS DOUBLE)
                / 1000000000.0) AS theil_u,
           CAST((num * 1000000000) // den AS BIGINT) < 1000000000
             AS beats_naive
    FROM s
    WHERE n_scored > 0 AND den > 0
    """,
    doc="Theil's U forecast-skill ratio for the 3-month moving-average "
    "model over monthly revenue: U^2 = sum(model error^2) / sum(naive "
    "random-walk error^2), U < 1 means the model beats 'tomorrow equals "
    "today' — the skill-score complement to orders_mape_backtest (MAPE "
    "reports absolute accuracy, U reports accuracy RELATIVE to the "
    "benchmark every forecast must clear). Errors are tripled to stay "
    "integer (3*a_t - (a_1+a_2+a_3); the 9x cancels in the ratio), both "
    "squared-error sums stay exact in DECIMAL/HUGEINT (they cross 2^53 "
    "around sf1), and U^2 is ONE nano-quantized integer floor-division "
    "— never a >2^53 integer-to-double cast (the engine-divergent "
    "operation). One map-combined month rollup; the lag window rides the "
    "calendar-bounded monthly series.",
)
def orders_theil_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate").isNotNull()
    )
    monthly = o.groupBy(
        F.date_trunc("month", "o_orderdate").alias("month")
    ).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
        .cast("bigint")
        .alias("rev_c")
    )
    w = Window.orderBy("month")
    lagged = monthly.select(
        "month",
        "rev_c",
        F.lag("rev_c", 1).over(w).alias("a1"),
        F.lag("rev_c", 2).over(w).alias("a2"),
        F.lag("rev_c", 3).over(w).alias("a3"),
    )
    scored = lagged.filter(F.col("a3").isNotNull()).select(
        (3 * F.col("rev_c") - (F.col("a1") + F.col("a2") + F.col("a3")))
        .cast("bigint")
        .alias("e_model_x3"),
        (3 * (F.col("rev_c") - F.col("a1"))).cast("bigint").alias(
            "e_naive_x3"
        ),
    )
    s = scored.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_scored"),
        F.sum(
            (F.col("e_model_x3").cast("decimal(38,0)") * F.col("e_model_x3"))
        )
        .cast("decimal(38,0)")
        .alias("num"),
        F.sum(
            (F.col("e_naive_x3").cast("decimal(38,0)") * F.col("e_naive_x3"))
        )
        .cast("decimal(38,0)")
        .alias("den"),
    )
    u2_nano = F.expr("CAST((num * 1000000000) div den AS BIGINT)")
    out = (
        s.filter((F.col("n_scored") > 0) & (F.col("den") > 0))
        .select(
            "n_scored",
            u2_nano.alias("u2_nano"),
            (u2_nano.cast("double") / 1000000000.0).alias("theil_u2"),
            F.sqrt(u2_nano.cast("double") / 1000000000.0).alias("theil_u"),
            (u2_nano < 1000000000).alias("beats_naive"),
        )
    )
    return persist_until_collected(monthly, out)


# ---------------------------------------------------------------------------
# orders_croston — intermittent-demand smoothing per part
# ---------------------------------------------------------------------------

CROSTON_TOPK = 25  # report the highest-traffic parts (bounded output)


@register(
    "orders_croston",
    oracle=f"""
    WITH dem AS (
      SELECT l_partkey AS part,
             CAST(date_diff('day', DATE '1992-01-01',
                            CAST(l_shipdate AS DATE)) AS BIGINT) AS t,
             CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS q
      FROM lineitem WHERE l_shipdate IS NOT NULL
      GROUP BY 1, 2
    ),
    series AS (
      SELECT part, CAST(count(*) AS BIGINT) AS n_demands,
             list(struct_pack(t := t, q := q) ORDER BY t) AS xs
      FROM dem GROUP BY part HAVING count(*) >= 2
    ),
    folded AS (
      SELECT part, n_demands,
             list_reduce(
               list_prepend(
                 struct_pack(t := xs[1].t,
                             q := CAST(xs[1].q * 1000 AS BIGINT),
                             p := CAST((xs[2].t - xs[1].t) * 1000
                                       AS BIGINT)),
                 list_transform(xs[2:],
                                e -> struct_pack(t := e.t, q := e.q,
                                                 p := CAST(0 AS BIGINT)))),
               (acc, x) -> struct_pack(
                 t := x.t,
                 q := CAST((x.q * 1000 + 3 * acc.q + 2) // 4 AS BIGINT),
                 p := CAST(((x.t - acc.t) * 1000 + 3 * acc.p + 2) // 4
                           AS BIGINT))
             ) AS st
      FROM series
    )
    SELECT part AS partkey, n_demands,
           st.q AS size_x1000, st.p AS interval_x1000,
           CAST(st.q AS DOUBLE) / st.p AS croston_rate_per_day
    FROM folded
    WHERE st.p > 0
    ORDER BY n_demands DESC, part
    LIMIT {CROSTON_TOPK}
    """,
    doc=f"Croston's method for intermittent demand, per part: exponential "
    "smoothing (alpha = 1/4) of the NONZERO demand sizes and of the "
    "inter-demand intervals separately, forecast rate = size/interval — "
    "the estimator for sparse series where plain smoothing over the "
    "calendar is dragged toward zero by the empty days (spare parts, "
    "long-tail SKUs; orders_exp_smoothing / orders_holt_linear cover the "
    "dense case). The fold is FULLY INTEGER: state is (size, interval) "
    "in 1e-3 units and each update is (x*1000 + 3*state + 2) div 4 — "
    "round-half-up of a dyadic product, the orders_holt_linear "
    "discipline with no float in the recurrence at all, so the oracle's "
    "list_reduce replays it bit-for-bit; the reported rate is ONE IEEE "
    "division. Per-part demand series aggregate map-side and fold inside "
    "one partitioned aggregation (no window, no cross-part state); the "
    f"top-{CROSTON_TOPK} by demand count ship via "
    "TakeOrderedAndProject. The DuckDB twin PREPENDS the init state "
    "because list_reduce folds from the first element (Spark's aggregate "
    "takes an explicit init) — same recurrence, same bits.",
)
def orders_croston(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate").isNotNull()
    )
    dem = li.groupBy(
        F.col("l_partkey").alias("part"),
        F.date_diff(
            F.col("l_shipdate").cast("date"), F.lit("1992-01-01").cast("date")
        )
        .cast("bigint")
        .alias("t"),
    ).agg(
        F.sum(F.round("l_quantity").cast("bigint")).cast("bigint").alias("q")
    )
    series = (
        dem.groupBy("part")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_demands"),
            F.sort_array(
                F.collect_list(F.struct(F.col("t"), F.col("q")))
            ).alias("xs"),
        )
        .filter(F.col("n_demands") >= 2)
    )
    fold = F.expr(
        "aggregate("
        "  slice(xs, 2, size(xs) - 1),"
        "  named_struct("
        "    't', element_at(xs, 1).t,"
        "    'q', element_at(xs, 1).q * 1000,"
        "    'p', CAST((element_at(xs, 2).t - element_at(xs, 1).t) * 1000"
        "         AS BIGINT)),"
        "  (acc, x) -> named_struct("
        "    't', x.t,"
        "    'q', CAST((x.q * 1000 + 3 * acc.q + 2) div 4 AS BIGINT),"
        "    'p', CAST(((x.t - acc.t) * 1000 + 3 * acc.p + 2) div 4"
        "         AS BIGINT)))"
    )
    folded = series.select(
        F.col("part").alias("partkey"),
        "n_demands",
        fold.getField("q").alias("size_x1000"),
        fold.getField("p").alias("interval_x1000"),
    )
    return (
        folded.filter(F.col("interval_x1000") > 0)
        .select(
            "partkey",
            "n_demands",
            "size_x1000",
            "interval_x1000",
            (
                F.col("size_x1000").cast("double") / F.col("interval_x1000")
            ).alias("croston_rate_per_day"),
        )
        .orderBy(F.col("n_demands").desc(), "partkey")
        .limit(CROSTON_TOPK)
    )


# ---------------------------------------------------------------------------
# text_readability_flesch — readability scoring as a curation signal
# ---------------------------------------------------------------------------


@register(
    "text_readability_flesch",
    oracle="""
    WITH f AS (
      SELECT doc_id, lang, source,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
             CAST(greatest(1, len(regexp_extract_all(text, '[.!?]')))
                  AS BIGINT) AS n_sentences,
             CAST(len(regexp_extract_all(lower(text), '[aeiouy]+'))
                  AS BIGINT) AS n_syllables
      FROM documents
    )
    SELECT doc_id, lang, source, n_words, n_sentences, n_syllables,
           206.835
             - 1.015 * (CAST(n_words AS DOUBLE) / n_sentences)
             - 84.6 * (CAST(n_syllables AS DOUBLE) / n_words)
             AS flesch_score,
           0.39 * (CAST(n_words AS DOUBLE) / n_sentences)
             + 11.8 * (CAST(n_syllables AS DOUBLE) / n_words)
             - 15.59 AS fk_grade
    FROM f
    WHERE n_words > 0
    """,
    doc="Flesch reading-ease and Flesch-Kincaid grade level per document — "
    "the readability axis of the curation stack next to text_quality's "
    "Gopher-style gates (readability filters are standard in web-corpus "
    "pipelines for separating prose from boilerplate/code, and the FK "
    "grade is a routing feature for difficulty-staged training mixes). "
    "Words from the whitespace split, sentences from terminal-punctuation "
    "counts with the whole-doc-is-one-sentence fallback (greatest(1, .)), "
    "syllables by the vowel-group heuristic (one regexp_extract_all per "
    "doc — the character-class-only pattern both regex dialects agree "
    "on, the text_pii_scrub contract). All three counts are exact "
    "integers; each score is one fixed-order IEEE expression (the "
    "constants 206.835/1.015/84.6/0.39/11.8/15.59 parse to identical "
    "doubles on both engines). Pure map-side projection — zero shuffles, "
    "trivially scales.",
)
def text_readability_flesch(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents", parallel=True)
    f = docs.select(
        "doc_id",
        "lang",
        "source",
        F.size(F.split("text", " ")).cast("bigint").alias("n_words"),
        F.greatest(
            F.lit(1),
            F.size(F.expr("regexp_extract_all(text, '[.!?]', 0)")),
        )
        .cast("bigint")
        .alias("n_sentences"),
        F.size(
            F.expr("regexp_extract_all(lower(text), '[aeiouy]+', 0)")
        )
        .cast("bigint")
        .alias("n_syllables"),
    )
    wps = F.col("n_words").cast("double") / F.col("n_sentences")
    spw = F.col("n_syllables").cast("double") / F.col("n_words")
    return f.filter(F.col("n_words") > 0).select(
        "doc_id",
        "lang",
        "source",
        "n_words",
        "n_sentences",
        "n_syllables",
        (206.835 - 1.015 * wps - 84.6 * spw).alias("flesch_score"),
        (0.39 * wps + 11.8 * spw - 15.59).alias("fk_grade"),
    )
