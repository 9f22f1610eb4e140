"""Round-14 bank (seed): loaded by ``registry._load_deferred()`` AFTER
pipeline19 — round 13's window is exactly filled by pipeline19's 50
operators, so these queue one further round out, fully linted and
identity-pinned from day one like every earlier tranche.

Reference provenance: like pipeline7-19, none of these operators exist in
the reference's Go core (a MongoDB change-stream -> NATS connector,
/root/reference/internal/mongo/client.go) — they extend the engine-side
analytics surface documented in SURVEY.md §2.3/§2.4.

Cross-engine determinism rules: the pipeline11-19 discipline — exact
integers on the hash surface, DECIMAL(38,0)/HUGEINT widening before
multiplication, floor(x+0.5) instead of round() on doubles, every
oracle-side fractional constant CAST(c AS DOUBLE) (bare DuckDB decimal
literals are exact DECIMALs), quantized-per-DOMAIN-cell ln/sqrt only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mongodb_nats_connector_spark.registry import register
from mongodb_nats_connector_spark.sources.tables import table


def _dsum(expr: F.Column) -> F.Column:
    """Exact order-independent sum for integer terms whose total can cross
    2^63: DECIMAL(38,0) accumulation (the oracles' HUGEINT twin)."""
    return F.sum(expr.cast("decimal(38,0)"))


# ---------------------------------------------------------------------------
# agg_cronbach_alpha — internal consistency of line quantities per order
# ---------------------------------------------------------------------------


@register(
    "agg_cronbach_alpha",
    oracle="""
    WITH o4 AS (
      SELECT l_orderkey,
             CAST(max(CASE WHEN l_linenumber = 1
                  THEN CAST(round(l_quantity) AS BIGINT) END) AS BIGINT)
               AS q1,
             CAST(max(CASE WHEN l_linenumber = 2
                  THEN CAST(round(l_quantity) AS BIGINT) END) AS BIGINT)
               AS q2,
             CAST(max(CASE WHEN l_linenumber = 3
                  THEN CAST(round(l_quantity) AS BIGINT) END) AS BIGINT)
               AS q3,
             CAST(max(CASE WHEN l_linenumber = 4
                  THEN CAST(round(l_quantity) AS BIGINT) END) AS BIGINT)
               AS q4
      FROM lineitem GROUP BY 1
      HAVING count(*) = 4 AND max(l_linenumber) = 4
    ),
    s AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(q1) AS HUGEINT) AS s1,
             CAST(sum(q2) AS HUGEINT) AS s2,
             CAST(sum(q3) AS HUGEINT) AS s3,
             CAST(sum(q4) AS HUGEINT) AS s4,
             CAST(sum(CAST(q1 AS HUGEINT) * q1) AS HUGEINT) AS s11,
             CAST(sum(CAST(q2 AS HUGEINT) * q2) AS HUGEINT) AS s22,
             CAST(sum(CAST(q3 AS HUGEINT) * q3) AS HUGEINT) AS s33,
             CAST(sum(CAST(q4 AS HUGEINT) * q4) AS HUGEINT) AS s44,
             CAST(sum(CAST(q1 + q2 + q3 + q4 AS HUGEINT)
                      * (q1 + q2 + q3 + q4)) AS HUGEINT) AS stt,
             CAST(sum(q1 + q2 + q3 + q4) AS HUGEINT) AS st
      FROM o4
    ),
    v AS (
      SELECT n,
             (n * s11 - s1 * s1) + (n * s22 - s2 * s2)
               + (n * s33 - s3 * s3) + (n * s44 - s4 * s4) AS sum_vi,
             n * stt - st * st AS vt
      FROM s
    )
    SELECT n AS n_orders,
           CAST(CASE WHEN 3 * (vt - sum_vi) >= 0 THEN 1 ELSE -1 END
                AS BIGINT) AS alpha_sign,
           CAST((1000000000 * abs(4 * (vt - sum_vi)))
                // greatest(3 * vt, 1) AS BIGINT) AS alpha_abs_ppb
    FROM v
    WHERE vt > 0
    """,
    doc="Cronbach's alpha over exactly-4-line orders (line numbers as the "
    "k=4 'items', rounded quantities as scores): alpha = k/(k-1) * "
    "(1 - sum(var_i)/var_total) — the internal-consistency "
    "coefficient, here measuring whether an order's line quantities "
    "co-vary (a basket-coherence signal; the reliability-theory "
    "companion to agg_fleiss_kappa's agreement on the same 4-rater "
    "frame). Cleared denominators make it ONE exact integer ratio "
    "4(V_t - sum V_i)/(3 V_t) over n-scaled variance numerators "
    "(n*Sxx - Sx^2), sign-split ppb. One order-keyed pivot rollup + "
    "one scalar reduce; no windows, no joins.",
)
def agg_cronbach_alpha(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    qcol = F.round("l_quantity").cast("bigint")
    o4 = (
        li.groupBy("l_orderkey")
        .agg(
            F.max(F.when(F.col("l_linenumber") == 1, qcol)).alias("q1"),
            F.max(F.when(F.col("l_linenumber") == 2, qcol)).alias("q2"),
            F.max(F.when(F.col("l_linenumber") == 3, qcol)).alias("q3"),
            F.max(F.when(F.col("l_linenumber") == 4, qcol)).alias("q4"),
            F.count(F.lit(1)).alias("k"),
            F.max("l_linenumber").alias("mx"),
        )
        .filter((F.col("k") == 4) & (F.col("mx") == 4))
    )
    s = o4.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        _dsum(F.col("q1")).alias("s1"),
        _dsum(F.col("q2")).alias("s2"),
        _dsum(F.col("q3")).alias("s3"),
        _dsum(F.col("q4")).alias("s4"),
        _dsum(F.expr("CAST(q1 AS DECIMAL(38,0)) * q1")).alias("s11"),
        _dsum(F.expr("CAST(q2 AS DECIMAL(38,0)) * q2")).alias("s22"),
        _dsum(F.expr("CAST(q3 AS DECIMAL(38,0)) * q3")).alias("s33"),
        _dsum(F.expr("CAST(q4 AS DECIMAL(38,0)) * q4")).alias("s44"),
        _dsum(
            F.expr(
                "CAST(q1 + q2 + q3 + q4 AS DECIMAL(38,0))"
                " * (q1 + q2 + q3 + q4)"
            )
        ).alias("stt"),
        _dsum(F.expr("q1 + q2 + q3 + q4")).alias("st"),
    )
    v = s.select(
        "n",
        F.expr(
            "(n * s11 - s1 * s1) + (n * s22 - s2 * s2)"
            " + (n * s33 - s3 * s3) + (n * s44 - s4 * s4)"
        ).alias("sum_vi"),
        F.expr("n * stt - st * st").alias("vt"),
    )
    return v.filter(F.col("vt") > 0).select(
        F.col("n").alias("n_orders"),
        F.expr(
            "CAST(CASE WHEN 3 * (vt - sum_vi) >= 0 THEN 1 ELSE -1 END"
            " AS BIGINT)"
        ).alias("alpha_sign"),
        F.expr(
            "CAST((1000000000 * abs(4 * (vt - sum_vi)))"
            " div greatest(3 * vt, 1) AS BIGINT)"
        ).alias("alpha_abs_ppb"),
    )


# ---------------------------------------------------------------------------
# agg_icc_oneway — intraclass correlation ICC(1,1) of line prices per order
# ---------------------------------------------------------------------------


@register(
    "agg_icc_oneway",
    oracle="""
    WITH g AS (
      SELECT l_orderkey, CAST(count(*) AS BIGINT) AS k,
             CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                  AS HUGEINT) AS sg,
             CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                      * CAST(round(l_extendedprice * 100) AS HUGEINT))
                  AS HUGEINT) AS sg2
      FROM lineitem GROUP BY 1 HAVING count(*) = 4
    ),
    t AS (
      SELECT CAST(count(*) AS BIGINT) AS m,
             CAST(sum(sg) AS HUGEINT) AS st,
             CAST(sum(sg2) AS HUGEINT) AS st2,
             CAST(sum(sg * sg) AS HUGEINT) AS sgg
      FROM g
    ),
    ms AS (
      -- cleared integer cores: a = 4m*SSB, b = 4*SSW; then
      -- ICC = (3a - (m-1)b) / (3a + 3(m-1)b) exactly
      SELECT m,
             m * sgg - st * st AS a,
             4 * st2 - sgg AS b
      FROM t
    )
    SELECT m AS n_orders,
           CAST(CASE WHEN 3 * a - (m - 1) * b >= 0
                     THEN 1 ELSE -1 END AS BIGINT) AS icc_sign,
           CAST((1000000000 * abs(3 * a - (m - 1) * b))
                // greatest(3 * a + 3 * (m - 1) * b, 1) AS BIGINT)
             AS icc_abs_ppb
    FROM ms
    """,
    doc="One-way intraclass correlation ICC(1,1) of line PRICES within "
    "exactly-4-line orders: how much of price variance is BETWEEN "
    "orders vs within them — the variance-decomposition answer to "
    "'are orders internally homogeneous pricing units?', the "
    "continuous companion to agg_cronbach_alpha on the same frame "
    "(and the design-effect input for cluster sampling: deff = "
    "1 + (k-1)ICC). With k = 4 and m groups, ICC = (MSB - MSW)/"
    "(MSB + 3 MSW); clearing MSB = SSB/(m-1), MSW = SSW/(3m) onto "
    "common integer denominators gives ONE exact ratio over the "
    "n-scaled sums (identity pinned in tests/test_round20.py: with "
    "a = 4m*SSB = m*sum(S_g^2) - T^2 and b = 4*SSW = 4*sum(x^2) - "
    "sum(S_g^2), ICC = (3a - (m-1)b)/(3a + 3(m-1)b) exactly), sign-split ppb. One "
    "order-keyed rollup + scalar reduce; no windows.",
)
def agg_icc_oneway(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    c = F.round(F.col("l_extendedprice") * 100).cast("bigint")
    g = (
        li.groupBy("l_orderkey")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("k"),
            _dsum(c).alias("sg"),
            _dsum(c.cast("decimal(38,0)") * c).alias("sg2"),
        )
        .filter(F.col("k") == 4)
    )
    t = g.agg(
        F.count(F.lit(1)).cast("bigint").alias("m"),
        _dsum(F.col("sg")).alias("st"),
        _dsum(F.col("sg2")).alias("st2"),
        _dsum(F.expr("sg * sg")).alias("sgg"),
    )
    ms = t.select(
        "m",
        F.expr("m * sgg - st * st").alias("a"),
        F.expr("4 * st2 - sgg").alias("b"),
    )
    return ms.select(
        F.col("m").alias("n_orders"),
        F.expr(
            "CAST(CASE WHEN 3 * a - (m - 1) * b >= 0"
            " THEN 1 ELSE -1 END AS BIGINT)"
        ).alias("icc_sign"),
        F.expr(
            "CAST((1000000000 * abs(3 * a - (m - 1) * b))"
            " div greatest(3 * a + 3 * (m - 1) * b, 1) AS BIGINT)"
        ).alias("icc_abs_ppb"),
    )


# ---------------------------------------------------------------------------
# agg_ks_uniform_gof — one-sample KS test of discount against uniform
# ---------------------------------------------------------------------------


@register(
    "agg_ks_uniform_gof",
    oracle="""
    WITH b AS (
      SELECT CAST(round(l_discount * 100) AS BIGINT) AS d
      FROM lineitem
    ),
    cells AS (
      SELECT d, CAST(count(*) AS BIGINT) AS c FROM b GROUP BY d
    ),
    cum AS (
      SELECT d,
             CAST(sum(c) OVER (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING
                  AND CURRENT ROW) AS BIGINT) AS cumc,
             CAST(sum(c) OVER () AS BIGINT) AS n
      FROM cells
    ),
    dev AS (
      SELECT n,
             CAST(max(abs(11 * cumc - (d + 1) * n)) AS BIGINT) AS dnum
      FROM cum GROUP BY n
    )
    SELECT n, dnum AS d_sup_num,
           CAST((1000000000 * dnum) // (11 * n) AS BIGINT) AS ks_d_ppb,
           CAST(CASE WHEN 10000 * CAST(dnum AS HUGEINT) * dnum
                          > 18496 * 121 * CAST(n AS HUGEINT)
                     THEN 1 ELSE 0 END AS BIGINT) AS reject_uniform
    FROM dev
    """,
    doc="One-sample Kolmogorov-Smirnov goodness-of-fit of the discount "
    "distribution against the DISCRETE UNIFORM on its 11-cell tenths "
    "grid: D = sup_k |F_n(k) - (k+1)/11| — the distribution-shape "
    "gate (is the discount mix actually flat?) completing the KS "
    "family beside the two-sample agg_ks_test and the circular "
    "agg_kuiper_test. The scaled deviation 11*cum_k - (k+1)*N is an "
    "exact integer per grid cell, the sup is an order-independent "
    "integer max, and the alpha=0.05 decision D > 1.36/sqrt(N) is "
    "the EXACT integer cross-multiplication 10^4 D_num^2 > "
    "1.36^2*10^4 * 121 * N — no square root evaluated. One 11-cell "
    "rollup + bounded grid window.",
)
def agg_ks_uniform_gof(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    b = li.select(F.round(F.col("l_discount") * 100).cast("bigint").alias("d"))
    cells = b.groupBy("d").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    cum = cells.select(
        "d",
        F.sum("c").over(w).cast("bigint").alias("cumc"),
        F.sum("c").over(Window.partitionBy()).cast("bigint").alias("n"),
    )
    dev = cum.groupBy("n").agg(
        F.max(F.abs(11 * F.col("cumc") - (F.col("d") + 1) * F.col("n")))
        .cast("bigint")
        .alias("dnum")
    )
    return dev.select(
        "n",
        F.col("dnum").alias("d_sup_num"),
        F.expr("CAST((1000000000 * dnum) div (11 * n) AS BIGINT)").alias(
            "ks_d_ppb"
        ),
        F.expr(
            "CAST(CASE WHEN 10000 * CAST(dnum AS DECIMAL(38,0)) * dnum"
            " > 18496 * 121 * CAST(n AS DECIMAL(38,0))"
            " THEN 1 ELSE 0 END AS BIGINT)"
        ).alias("reject_uniform"),
    )


# ---------------------------------------------------------------------------
# agg_overlap_coefficient — Weitzman OVL between discount cohorts
# ---------------------------------------------------------------------------


@register(
    "agg_overlap_coefficient",
    oracle="""
    WITH b AS (
      SELECT CAST(round(l_quantity) AS BIGINT) AS v,
             CASE WHEN round(l_discount * 100) >= 6 THEN 1 ELSE 0 END AS g
      FROM lineitem
    ),
    cells AS (
      SELECT v, CAST(sum(g) AS BIGINT) AS c1,
             CAST(count(*) - sum(g) AS BIGINT) AS c2
      FROM b GROUP BY v
    ),
    t AS (
      SELECT CAST(sum(c1) AS BIGINT) AS n1, CAST(sum(c2) AS BIGINT) AS n2
      FROM cells
    ),
    ov AS (
      SELECT t.n1, t.n2,
             CAST(sum(least(CAST(c1 AS HUGEINT) * t.n2,
                            CAST(c2 AS HUGEINT) * t.n1)) AS HUGEINT)
               AS mins
      FROM cells, t GROUP BY t.n1, t.n2
    )
    SELECT n1 AS n_discounted, n2 AS n_low_discount,
           CAST((1000000000 * mins)
                // (CAST(n1 AS HUGEINT) * n2) AS BIGINT) AS ovl_ppb
    FROM ov
    """,
    doc="Weitzman overlap coefficient OVL = sum_v min(p1(v), p2(v)) "
    "between the discounted (>= 6%) and low-discount quantity "
    "distributions — the fraction of probability mass the two "
    "cohorts SHARE, the direct 'how exchangeable are they' number "
    "whose complement is total-variation distance (and the "
    "interpretable companion to the significance-oriented "
    "agg_ks_test / agg_cucconi on the same frame: with huge n, tiny "
    "differences are 'significant' while OVL says whether they "
    "matter). Cross-multiplying by n1*n2 makes every per-cell min an "
    "exact integer min(c1 n2, c2 n1) over the ~50-value grid; one "
    "non-negative ppb floor-division. One map-combined grid rollup; "
    "no windows.",
)
def agg_overlap_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    b = li.select(
        F.round("l_quantity").cast("bigint").alias("v"),
        F.when(F.round(F.col("l_discount") * 100) >= 6, 1)
        .otherwise(0)
        .alias("g"),
    )
    cells = b.groupBy("v").agg(
        F.sum("g").cast("bigint").alias("c1"),
        (F.count(F.lit(1)) - F.sum("g")).cast("bigint").alias("c2"),
    )
    t = cells.agg(
        F.sum("c1").cast("bigint").alias("n1"),
        F.sum("c2").cast("bigint").alias("n2"),
    )
    ov = (
        cells.crossJoin(F.broadcast(t))
        .groupBy("n1", "n2")
        .agg(
            _dsum(
                F.least(
                    F.expr("CAST(c1 AS DECIMAL(38,0)) * n2"),
                    F.expr("CAST(c2 AS DECIMAL(38,0)) * n1"),
                )
            ).alias("mins")
        )
    )
    return ov.select(
        F.col("n1").alias("n_discounted"),
        F.col("n2").alias("n_low_discount"),
        F.expr(
            "CAST((1000000000 * mins)"
            " div (CAST(n1 AS DECIMAL(38,0)) * n2) AS BIGINT)"
        ).alias("ovl_ppb"),
    )


# ---------------------------------------------------------------------------
# events_gini_time_concentration — temporal concentration of activity
# ---------------------------------------------------------------------------


@register(
    "events_gini_time_concentration",
    oracle="""
    WITH d AS (
      SELECT CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS c
      FROM events WHERE ts IS NOT NULL GROUP BY 1
    ),
    r AS (
      SELECT c, CAST(row_number() OVER (ORDER BY c, day) AS BIGINT) AS rk
      FROM d
    ),
    g AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(c) AS HUGEINT) AS tot,
             CAST(sum(CAST(rk AS HUGEINT) * c) AS HUGEINT) AS rs
      FROM r
    )
    SELECT n AS n_days, CAST(tot AS BIGINT) AS n_events,
           CAST((1000000000 * (2 * rs - (n + 1) * tot)) // (n * tot)
                AS BIGINT) AS gini_ppb,
           CAST(tot // n AS BIGINT) AS mean_daily
    FROM g
    """,
    doc="Gini coefficient of DAILY EVENT VOLUME across the observed "
    "calendar: how concentrated is activity in time? Gini ~ 0 means "
    "steady load, high Gini means a few peak days carry the traffic "
    "— the capacity-planning complement to events_max_concurrency "
    "(instantaneous peak) and events_vmr_windows (dispersion "
    "ratio): this one integrates the whole daily Lorenz curve into "
    "the standard inequality number. Rank formula over the calendar-"
    "bounded day relation with deterministic (count, day) ties; ONE "
    "non-negative ppb floor-division. One day rollup + one bounded "
    "rank window.",
)
def events_gini_time_concentration(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    d = ev.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    r = d.select(
        "c",
        F.row_number()
        .over(Window.orderBy("c", "day"))
        .cast("bigint")
        .alias("rk"),
    )
    g = r.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        _dsum(F.col("c")).alias("tot"),
        _dsum(F.expr("CAST(rk AS DECIMAL(38,0)) * c")).alias("rs"),
    )
    return g.select(
        F.col("n").alias("n_days"),
        F.expr("CAST(tot AS BIGINT)").alias("n_events"),
        F.expr(
            "CAST((1000000000 * (2 * rs - (n + 1) * tot)) div (n * tot)"
            " AS BIGINT)"
        ).alias("gini_ppb"),
        F.expr("CAST(tot div n AS BIGINT)").alias("mean_daily"),
    )


# ---------------------------------------------------------------------------
# agg_tukey_fences — boxplot-fence outlier census on the quantity domain
# ---------------------------------------------------------------------------


@register(
    "agg_tukey_fences",
    oracle="""
    WITH b AS (
      SELECT CAST(round(l_quantity) AS BIGINT) AS v FROM lineitem
    ),
    cells AS (
      SELECT v, CAST(count(*) AS BIGINT) AS c FROM b GROUP BY v
    ),
    cum AS (
      SELECT v, c,
             CAST(sum(c) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                  AND CURRENT ROW) AS BIGINT) AS cumc,
             CAST(sum(c) OVER () AS BIGINT) AS n
      FROM cells
    ),
    q AS (
      SELECT
        (SELECT min(v) FROM cum WHERE 4 * cumc >= n) AS q1,
        (SELECT min(v) FROM cum WHERE 4 * cumc >= 3 * n) AS q3,
        (SELECT max(n) FROM cum) AS n
    ),
    f AS (
      SELECT n, q1, q3,
             5 * q1 - 3 * q3 AS lo2,
             5 * q3 - 3 * q1 AS hi2
      FROM q
    )
    SELECT f.n, f.q1 AS q1_qty, f.q3 AS q3_qty,
           CAST(f.lo2 AS BIGINT) AS fence_low_x2,
           CAST(f.hi2 AS BIGINT) AS fence_high_x2,
           CAST(coalesce((SELECT sum(c) FROM cum
                          WHERE 2 * cum.v < f.lo2), 0) AS BIGINT)
             AS n_below,
           CAST(coalesce((SELECT sum(c) FROM cum
                          WHERE 2 * cum.v > f.hi2), 0) AS BIGINT)
             AS n_above
    FROM f
    """,
    doc="Tukey boxplot-fence outlier census on the ~50-value quantity "
    "domain: discrete type-1 quartiles from exact cumulative counts "
    "(Q1 = smallest v with 4*cum >= N), fences Q1 - 1.5 IQR and "
    "Q3 + 1.5 IQR kept exact by DOUBLING (2*fence_low = 5Q1 - 3Q3), "
    "and the below/above populations counted by exact integer "
    "comparison 2v < 5Q1 - 3Q3 — the classical boxplot rule beside "
    "the robust-deviation census agg_mad_outliers (median/MAD) and "
    "the parametric agg_grubbs_test: three different outlier "
    "definitions on the same engine surface. One domain rollup + "
    "bounded grid window; no square roots, no doubles anywhere.",
)
def agg_tukey_fences(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    b = li.select(F.round("l_quantity").cast("bigint").alias("v"))
    cells = b.groupBy("v").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    cum = cells.select(
        "v",
        "c",
        F.sum("c").over(w).cast("bigint").alias("cumc"),
        F.sum("c").over(Window.partitionBy()).cast("bigint").alias("n"),
    )
    q = cum.agg(
        F.min(F.when(4 * F.col("cumc") >= F.col("n"), F.col("v"))).alias(
            "q1"
        ),
        F.min(
            F.when(4 * F.col("cumc") >= 3 * F.col("n"), F.col("v"))
        ).alias("q3"),
        F.max("n").cast("bigint").alias("n"),
    )
    f = q.select(
        "n",
        "q1",
        "q3",
        (5 * F.col("q1") - 3 * F.col("q3")).alias("lo2"),
        (5 * F.col("q3") - 3 * F.col("q1")).alias("hi2"),
    )
    counts = (
        cum.crossJoin(F.broadcast(f))
        .agg(
            F.coalesce(
                F.sum(F.when(2 * F.col("v") < F.col("lo2"), F.col("c"))),
                F.lit(0),
            )
            .cast("bigint")
            .alias("n_below"),
            F.coalesce(
                F.sum(F.when(2 * F.col("v") > F.col("hi2"), F.col("c"))),
                F.lit(0),
            )
            .cast("bigint")
            .alias("n_above"),
        )
    )
    return F.broadcast(f).crossJoin(counts).select(
        "n",
        F.col("q1").alias("q1_qty"),
        F.col("q3").alias("q3_qty"),
        F.col("lo2").cast("bigint").alias("fence_low_x2"),
        F.col("hi2").cast("bigint").alias("fence_high_x2"),
        "n_below",
        "n_above",
    )


# ---------------------------------------------------------------------------
# orders_duane_growth — reliability-growth slope of the return process
# ---------------------------------------------------------------------------


@register(
    "orders_duane_growth",
    oracle="""
    WITH m AS (
      SELECT CAST(date_trunc('month', l_shipdate) AS DATE) AS month,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
                  AS BIGINT) AS r
      FROM lineitem WHERE l_shipdate IS NOT NULL GROUP BY 1
    ),
    cum AS (
      SELECT month,
             CAST(sum(n) OVER (ORDER BY month ROWS BETWEEN UNBOUNDED
                  PRECEDING AND CURRENT ROW) AS BIGINT) AS ct,
             CAST(sum(r) OVER (ORDER BY month ROWS BETWEEN UNBOUNDED
                  PRECEDING AND CURRENT ROW) AS BIGINT) AS cf
      FROM m
    ),
    pts AS (
      SELECT CAST(floor(1000000.0 * ln(CAST(ct AS DOUBLE))) AS BIGINT)
               AS x,
             CAST(floor(1000000.0 * ln(1000000.0 * cf / ct)) AS BIGINT)
               AS y
      FROM cum WHERE cf > 0 AND ct > 0
    ),
    s AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS HUGEINT) AS sx,
             CAST(sum(y) AS HUGEINT) AS sy,
             CAST(sum(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy,
             CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx
      FROM pts
    )
    SELECT n AS n_checkpoints,
           CAST(CASE WHEN n * sxy >= sx * sy THEN 1 ELSE -1 END AS BIGINT)
             AS alpha_sign,
           CAST((1000000 * abs(n * sxy - sx * sy))
                // greatest(n * sxx - sx * sx, 1) AS BIGINT)
             AS alpha_abs_micro
    FROM s
    """,
    doc="Duane reliability-growth analysis of the return process: regress "
    "ln(cumulative return RATE) on ln(cumulative exposure) across "
    "monthly checkpoints — a negative slope alpha is the Duane "
    "learning signature (quality improving with cumulative volume), "
    "the reliability-engineering reading of the same log-log OLS "
    "machinery as orders_wright_learning (which tracks unit COST; "
    "NHPP power-law intensity here). The cumulative rate is "
    "pre-scaled by 1e6 inside the log so the quantized ordinate "
    "stays positive-domain; both coordinates floor-quantize to "
    "micro per CHECKPOINT (calendar-bounded), the moment sums are "
    "exact integers, and the slope is sign-split micro. One month "
    "rollup + one bounded prefix window.",
)
def orders_duane_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate").isNotNull()
    )
    m = li.groupBy(
        F.date_trunc("month", "l_shipdate").cast("date").alias("month")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0))
        .cast("bigint")
        .alias("r"),
    )
    w = Window.orderBy("month").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = m.select(
        F.sum("n").over(w).cast("bigint").alias("ct"),
        F.sum("r").over(w).cast("bigint").alias("cf"),
    )
    pts = cum.filter((F.col("cf") > 0) & (F.col("ct") > 0)).select(
        F.floor(F.lit(1000000.0) * F.log(F.col("ct").cast("double")))
        .cast("bigint")
        .alias("x"),
        F.floor(
            F.lit(1000000.0)
            * F.log(F.lit(1000000.0) * F.col("cf") / F.col("ct"))
        )
        .cast("bigint")
        .alias("y"),
    )
    s = pts.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        _dsum(F.col("x")).alias("sx"),
        _dsum(F.col("y")).alias("sy"),
        _dsum(F.expr("CAST(x AS DECIMAL(38,0)) * y")).alias("sxy"),
        _dsum(F.expr("CAST(x AS DECIMAL(38,0)) * x")).alias("sxx"),
    )
    return s.select(
        F.col("n").alias("n_checkpoints"),
        F.expr(
            "CAST(CASE WHEN n * sxy >= sx * sy THEN 1 ELSE -1 END"
            " AS BIGINT)"
        ).alias("alpha_sign"),
        F.expr(
            "CAST((1000000 * abs(n * sxy - sx * sy))"
            " div greatest(n * sxx - sx * sx, 1) AS BIGINT)"
        ).alias("alpha_abs_micro"),
    )


# ---------------------------------------------------------------------------
# multimodal_png_chunk_walk — REAL multi-chunk PNG stream walking
# ---------------------------------------------------------------------------


@register(
    "multimodal_png_chunk_walk",
    oracle="""
    WITH d AS (
      SELECT doc_id,
             doc_id % 1920 + 16 AS w,
             (doc_id * 7) % 1080 + 16 AS h,
             doc_id % 4 AS ntext,
             doc_id % 900 + 100 AS idat_len
      FROM documents
    )
    SELECT doc_id,
           CAST(w AS BIGINT) AS width,
           CAST(h AS BIGINT) AS height,
           CAST(3 + ntext AS BIGINT) AS n_chunks,
           CAST(ntext AS BIGINT) AS n_text_chunks,
           CAST(idat_len AS BIGINT) AS idat_bytes,
           CAST(1 AS BIGINT) AS has_iend
    FROM d
    ORDER BY doc_id
    """,
    doc="REAL multi-chunk PNG stream walking under the driver's hash "
    "check: per doc, construct a complete PNG chunk stream (signature, "
    "13-byte IHDR, 0-3 tEXt chunks with deterministic payload sizes, "
    "one IDAT of deterministic length, IEND — length/type/data/CRC "
    "frames composed as hex column expressions; CRCs carried as dummy "
    "bytes and skipped BY LENGTH, the fast-scan convention every "
    "corpus-ingest profiler uses, declared), then recover dimensions, "
    "chunk census, total IDAT payload bytes and IEND presence with "
    "the real stdlib walker (multimodal.walk_png_chunks). Together "
    "with the GIF walker this covers both length-prefixed (PNG) and "
    "sentinel-terminated (GIF sub-block) container grammars. "
    "Map-only; zero shuffles.",
)
def multimodal_png_chunk_walk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mongodb_nats_connector_spark.operators.multimodal import (
        PNG_CHUNK_SCHEMA,
        _png_chunks_batches,
    )

    d = table(spark, sf_dir, "documents", parallel=True).select(
        "doc_id",
        (F.col("doc_id") % 1920 + 16).alias("w"),
        ((F.col("doc_id") * 7) % 1080 + 16).alias("h"),
        (F.col("doc_id") % 4).alias("ntext"),
        (F.col("doc_id") % 900 + 100).alias("idat_len"),
    )
    be4 = lambda col: F.lpad(F.hex(col), 8, "0")  # noqa: E731
    ihdr = F.concat(
        F.lit("0000000D49484452"),          # len 13 + 'IHDR'
        F.lpad(F.hex("w"), 8, "0"),
        F.lpad(F.hex("h"), 8, "0"),
        F.lit("0806000000"),                # bit depth 8, RGBA, std flags
        F.lit("00000000"),                  # dummy CRC
    )
    texts = F.expr(
        # sequence(1, 0) DESCENDS in Spark — guard the zero-chunk case
        "IF(ntext = 0, '', concat_ws('', transform(sequence(1, ntext), i ->"
        " concat("
        "  lpad(hex(5 + i), 8, '0'),"       # length = 5 + i
        "  '74455874',"                     # 'tEXt'
        "  repeat('4B', CAST(5 + i AS INT)),"
        "  '00000000'))))"                  # dummy CRC
    )
    idat = F.concat(
        be4(F.col("idat_len")),
        F.lit("49444154"),                  # 'IDAT'
        F.expr("repeat('A5', CAST(idat_len AS INT))"),
        F.lit("00000000"),
    )
    png_hex = F.concat(
        F.lit("89504E470D0A1A0A"),          # signature
        ihdr,
        texts,
        idat,
        F.lit("0000000049454E44"),          # len 0 + 'IEND'
        F.lit("00000000"),
    )
    return (
        d.select("doc_id", F.unhex(png_hex).alias("payload"))
        .mapInPandas(_png_chunks_batches, PNG_CHUNK_SCHEMA)
        .orderBy("doc_id")
    )
