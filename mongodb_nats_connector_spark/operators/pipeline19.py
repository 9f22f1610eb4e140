"""Round-13 bank (staged): loaded by ``registry._load_deferred()``, NOT
``_load_all`` — the round-12 driver window is exactly full with the
pipeline16/17/18 tranches plus this round's single in-window query, so
new operators registered here stay out of the driver-facing registry
until the round-13 window opens, while the registry-wide lint and parity
tests load this module explicitly and enforce the full plan/determinism
discipline from day one.

Reference provenance: like pipeline7-18, none of these operators exist in
the reference's Go core (a MongoDB change-stream -> NATS connector,
/root/reference/internal/mongo/client.go) — they extend the engine-side
analytics surface documented in SURVEY.md §2.3/§2.4 downstream of the
connector's change streams.

Cross-engine determinism rules (the pipeline11-18 discipline):
- exact integers end-to-end on the hash surface; cumulative masses over
  value DOMAINS (never row-proportional rank windows);
- any total that can cross 2^53 stays DECIMAL(38,0)/HUGEINT and
  floor-divides (`div` / ``//``) to a sub-2^53 integer before the ONE
  double conversion;
- integer `div` (Spark) and `//` (DuckDB) BOTH truncate toward zero on
  negatives (only Python's // floors), so signed divisions match across
  engines;
- no exp/ln/pow/round-of-float anywhere on the hash surface; +,-,*,/,
  sqrt are IEEE-correctly-rounded and bit-portable in fixed operand
  order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mongodb_nats_connector_spark.registry import register
from mongodb_nats_connector_spark.sources.tables import table

__all__: list[str] = []


def _dsum(expr: F.Column) -> F.Column:
    """Exact order-independent sum for integer terms whose total can cross
    2^63: DECIMAL(38,0) accumulation (the oracles' HUGEINT twin)."""
    return F.sum(expr.cast("decimal(38,0)"))


# ---------------------------------------------------------------------------
# agg_g_test — likelihood-ratio G² independence test (segment × priority)
# ---------------------------------------------------------------------------


@register(
    "agg_g_test",
    oracle="""
    WITH j AS (
      SELECT c.c_mktsegment AS seg, o.o_orderpriority AS pri
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ),
    cells AS (
      SELECT seg, pri, CAST(count(*) AS BIGINT) AS n
      FROM j GROUP BY seg, pri
    ),
    m AS (
      SELECT seg, pri, n,
             CAST(sum(n) OVER (PARTITION BY seg) AS BIGINT) AS r,
             CAST(sum(n) OVER (PARTITION BY pri) AS BIGINT) AS c,
             CAST(sum(n) OVER () AS BIGINT) AS nn
      FROM cells
    )
    SELECT CAST(count(*) AS BIGINT) AS n_cells,
           CAST(max(nn) AS BIGINT) AS n_total,
           CAST(2 * sum(CAST(floor(1000000.0 * n *
                ln((CAST(n AS DOUBLE) * nn)
                   / (CAST(r AS DOUBLE) * c))) AS BIGINT)) AS BIGINT)
             AS g2_micro
    FROM m
    """,
    doc="Likelihood-ratio G-test of independence between market segment "
    "and order priority: G^2 = 2 sum O_ij ln(O_ij N / (R_i C_j)) over "
    "the 5x5 contingency table — the statistic Pearson's chi-square "
    "(agg_chi_square, same frame) approximates to second order, "
    "preferred when expected counts are small or the additivity of "
    "G across nested models matters. Each of the 25 cells quantizes "
    "its term O*ln(O*N/(R*C)) to integer micro-nats BEFORE the sum "
    "(the agg_mutual_information precedent: ln runs on one "
    "correctly-rounded double ratio per DOMAIN cell, never per row), "
    "so the 25-term sum is exact integer arithmetic. One fact-sized "
    "hash join + one map-combined aggregation to the 25-cell grid; "
    "margins via bounded grid windows.",
)
def agg_g_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    j = o.join(c, o.o_custkey == c.c_custkey).select(
        F.col("c_mktsegment").alias("seg"),
        F.col("o_orderpriority").alias("pri"),
    )
    cells = j.groupBy("seg", "pri").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    m = cells.select(
        "seg",
        "pri",
        "n",
        F.sum("n").over(Window.partitionBy("seg")).cast("bigint").alias("r"),
        F.sum("n").over(Window.partitionBy("pri")).cast("bigint").alias("c"),
        F.sum("n").over(Window.partitionBy()).cast("bigint").alias("nn"),
    )
    return m.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_cells"),
        F.max("nn").cast("bigint").alias("n_total"),
        (
            2
            * F.sum(
                F.floor(
                    1000000.0
                    * F.col("n")
                    * F.log(
                        (F.col("n").cast("double") * F.col("nn"))
                        / (F.col("r").cast("double") * F.col("c"))
                    )
                ).cast("bigint")
            )
        )
        .cast("bigint")
        .alias("g2_micro"),
    )


# ---------------------------------------------------------------------------
# agg_freeman_tukey — Freeman-Tukey T² goodness statistic (same frame)
# ---------------------------------------------------------------------------


@register(
    "agg_freeman_tukey",
    oracle="""
    WITH j AS (
      SELECT c.c_mktsegment AS seg, o.o_orderpriority AS pri
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ),
    cells AS (
      SELECT seg, pri, CAST(count(*) AS BIGINT) AS n
      FROM j GROUP BY seg, pri
    ),
    m AS (
      SELECT seg, pri, n,
             CAST(sum(n) OVER (PARTITION BY seg) AS BIGINT) AS r,
             CAST(sum(n) OVER (PARTITION BY pri) AS BIGINT) AS c,
             CAST(sum(n) OVER () AS BIGINT) AS nn
      FROM cells
    )
    SELECT CAST(count(*) AS BIGINT) AS n_cells,
           CAST(max(nn) AS BIGINT) AS n_total,
           CAST(sum(CAST(floor(4000000.0 *
                (sqrt(CAST(n AS DOUBLE))
                 - sqrt((CAST(r AS DOUBLE) * c) / nn))
                * (sqrt(CAST(n AS DOUBLE))
                   - sqrt((CAST(r AS DOUBLE) * c) / nn)))
                AS BIGINT)) AS BIGINT) AS ft_micro
    FROM m
    """,
    doc="Freeman-Tukey T^2 = 4 sum (sqrt(O) - sqrt(E))^2 on the segment x "
    "priority contingency table — the variance-stabilized member of the "
    "power-divergence family, robust to small expected counts where "
    "Pearson's X^2 inflates; completes the trio with agg_chi_square "
    "(lambda=1) and agg_g_test (lambda=0). E_ij = R_i C_j / N as ONE "
    "fixed-shape double ratio per DOMAIN cell; sqrt is IEEE-correctly-"
    "rounded so each cell's 4(sqrt O - sqrt E)^2 quantizes to integer "
    "micro-units before the exact 25-term sum. Same single-join, "
    "grid-window plan as its siblings.",
)
def agg_freeman_tukey(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    j = o.join(c, o.o_custkey == c.c_custkey).select(
        F.col("c_mktsegment").alias("seg"),
        F.col("o_orderpriority").alias("pri"),
    )
    cells = j.groupBy("seg", "pri").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    m = cells.select(
        "n",
        F.sum("n").over(Window.partitionBy("seg")).cast("bigint").alias("r"),
        F.sum("n").over(Window.partitionBy("pri")).cast("bigint").alias("c"),
        F.sum("n").over(Window.partitionBy()).cast("bigint").alias("nn"),
    )
    diff = F.sqrt(F.col("n").cast("double")) - F.sqrt(
        (F.col("r").cast("double") * F.col("c")) / F.col("nn")
    )
    return m.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_cells"),
        F.max("nn").cast("bigint").alias("n_total"),
        F.sum(F.floor(F.lit(4000000.0) * diff * diff).cast("bigint"))
        .cast("bigint")
        .alias("ft_micro"),
    )


# ---------------------------------------------------------------------------
# agg_scott_pi — Scott's pi agreement (first-vs-last priority, 3-cat)
# ---------------------------------------------------------------------------


@register(
    "agg_scott_pi",
    oracle="""
    WITH fl AS (
      SELECT o_custkey,
             min_by(o_orderpriority, o_orderkey) AS p_first,
             max_by(o_orderpriority, o_orderkey) AS p_last
      FROM orders GROUP BY o_custkey
    ),
    c3 AS (
      SELECT CASE WHEN p_first IN ('1-URGENT', '2-HIGH') THEN 1
                  WHEN p_first = '3-MEDIUM' THEN 2 ELSE 3 END AS a,
             CASE WHEN p_last IN ('1-URGENT', '2-HIGH') THEN 1
                  WHEN p_last = '3-MEDIUM' THEN 2 ELSE 3 END AS b
      FROM fl
    ),
    cells AS (
      SELECT a, b, CAST(count(*) AS BIGINT) AS n FROM c3 GROUP BY a, b
    ),
    piv AS (
      SELECT CAST(sum(n) AS BIGINT) AS nn,
             CAST(coalesce(sum(CASE WHEN a = b THEN n END), 0) AS BIGINT)
               AS diag,
             CAST(coalesce(sum(CASE WHEN a = 1 THEN n END), 0)
                  + coalesce(sum(CASE WHEN b = 1 THEN n END), 0) AS BIGINT)
               AS s1,
             CAST(coalesce(sum(CASE WHEN a = 2 THEN n END), 0)
                  + coalesce(sum(CASE WHEN b = 2 THEN n END), 0) AS BIGINT)
               AS s2,
             CAST(coalesce(sum(CASE WHEN a = 3 THEN n END), 0)
                  + coalesce(sum(CASE WHEN b = 3 THEN n END), 0) AS BIGINT)
               AS s3
      FROM cells
    )
    SELECT nn AS n_customers, diag AS n_agree,
           CAST(CASE WHEN 4 * CAST(nn AS HUGEINT) * diag
                          >= CAST(s1 AS HUGEINT) * s1
                             + CAST(s2 AS HUGEINT) * s2
                             + CAST(s3 AS HUGEINT) * s3
                     THEN 1 ELSE -1 END AS BIGINT) AS pi_sign,
           CAST((1000000000 * abs(4 * CAST(nn AS HUGEINT) * diag
                 - (CAST(s1 AS HUGEINT) * s1 + CAST(s2 AS HUGEINT) * s2
                    + CAST(s3 AS HUGEINT) * s3)))
                // greatest(4 * CAST(nn AS HUGEINT) * nn
                 - (CAST(s1 AS HUGEINT) * s1 + CAST(s2 AS HUGEINT) * s2
                    + CAST(s3 AS HUGEINT) * s3), 1) AS BIGINT)
             AS pi_abs_ppb
    FROM piv
    """,
    doc="Scott's pi chance-corrected agreement between a customer's FIRST "
    "and LAST order priority (high/medium/low collapse — the "
    "stuart_maxwell frame): unlike Cohen's kappa (per-rater marginals), "
    "Scott's pi draws chance agreement from the POOLED marginal "
    "(r_i + c_i)/2N — the two-rater special case of Fleiss' kappa. "
    "Clearing denominators: pi = (4N*diag - sum s_i^2) / (4N^2 - "
    "sum s_i^2) with s_i = row_i + col_i — ONE exact integer ratio, "
    "sign-split into pi_sign and a non-negative ppb floor-division. "
    "One customer-keyed aggregation + 9-cell pivot; no joins, no "
    "windows.",
)
def agg_scott_pi(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    fl = o.groupBy("o_custkey").agg(
        F.expr("min_by(o_orderpriority, o_orderkey)").alias("p_first"),
        F.expr("max_by(o_orderpriority, o_orderkey)").alias("p_last"),
    )
    c3 = fl.select(
        F.expr(
            "CASE WHEN p_first IN ('1-URGENT', '2-HIGH') THEN 1"
            " WHEN p_first = '3-MEDIUM' THEN 2 ELSE 3 END"
        ).alias("a"),
        F.expr(
            "CASE WHEN p_last IN ('1-URGENT', '2-HIGH') THEN 1"
            " WHEN p_last = '3-MEDIUM' THEN 2 ELSE 3 END"
        ).alias("b"),
    )
    cells = c3.groupBy("a", "b").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    piv = cells.agg(
        F.sum("n").cast("bigint").alias("nn"),
        F.coalesce(F.sum(F.when(F.col("a") == F.col("b"), F.col("n"))), F.lit(0))
        .cast("bigint")
        .alias("diag"),
        (
            F.coalesce(F.sum(F.when(F.col("a") == 1, F.col("n"))), F.lit(0))
            + F.coalesce(F.sum(F.when(F.col("b") == 1, F.col("n"))), F.lit(0))
        )
        .cast("bigint")
        .alias("s1"),
        (
            F.coalesce(F.sum(F.when(F.col("a") == 2, F.col("n"))), F.lit(0))
            + F.coalesce(F.sum(F.when(F.col("b") == 2, F.col("n"))), F.lit(0))
        )
        .cast("bigint")
        .alias("s2"),
        (
            F.coalesce(F.sum(F.when(F.col("a") == 3, F.col("n"))), F.lit(0))
            + F.coalesce(F.sum(F.when(F.col("b") == 3, F.col("n"))), F.lit(0))
        )
        .cast("bigint")
        .alias("s3"),
    )
    return piv.select(
        F.col("nn").alias("n_customers"),
        F.col("diag").alias("n_agree"),
        F.expr(
            "CAST(CASE WHEN 4 * CAST(nn AS DECIMAL(38,0)) * diag"
            " >= CAST(s1 AS DECIMAL(38,0)) * s1"
            " + CAST(s2 AS DECIMAL(38,0)) * s2"
            " + CAST(s3 AS DECIMAL(38,0)) * s3"
            " THEN 1 ELSE -1 END AS BIGINT)"
        ).alias("pi_sign"),
        F.expr(
            "CAST((1000000000 * abs(4 * CAST(nn AS DECIMAL(38,0)) * diag"
            " - (CAST(s1 AS DECIMAL(38,0)) * s1"
            "    + CAST(s2 AS DECIMAL(38,0)) * s2"
            "    + CAST(s3 AS DECIMAL(38,0)) * s3)))"
            " div greatest(4 * CAST(nn AS DECIMAL(38,0)) * nn"
            " - (CAST(s1 AS DECIMAL(38,0)) * s1"
            "    + CAST(s2 AS DECIMAL(38,0)) * s2"
            "    + CAST(s3 AS DECIMAL(38,0)) * s3), 1) AS BIGINT)"
        ).alias("pi_abs_ppb"),
    )


# ---------------------------------------------------------------------------
# agg_fowlkes_mallows — clustering agreement, segment vs region partition
# ---------------------------------------------------------------------------


@register(
    "agg_fowlkes_mallows",
    oracle="""
    WITH cu AS (
      SELECT c.c_mktsegment AS a, r.r_name AS b
      FROM customer c
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
    ),
    cells AS (
      SELECT a, b, CAST(count(*) AS BIGINT) AS n FROM cu GROUP BY a, b
    ),
    am AS (SELECT a, CAST(sum(n) AS BIGINT) AS na FROM cells GROUP BY a),
    bm AS (SELECT b, CAST(sum(n) AS BIGINT) AS nb FROM cells GROUP BY b),
    s AS (
      SELECT
        (SELECT CAST(sum(n) AS BIGINT) FROM cells) AS nn,
        (SELECT CAST(sum(CAST(n AS HUGEINT) * (n - 1)) AS HUGEINT)
         FROM cells) AS t2,
        (SELECT CAST(sum(CAST(na AS HUGEINT) * (na - 1)) AS HUGEINT)
         FROM am) AS pa2,
        (SELECT CAST(sum(CAST(nb AS HUGEINT) * (nb - 1)) AS HUGEINT)
         FROM bm) AS pb2
    )
    SELECT nn AS n_customers,
           CAST(t2 // 2 AS BIGINT) AS pairs_together,
           CAST(pa2 // 2 AS BIGINT) AS pairs_seg,
           CAST(pb2 // 2 AS BIGINT) AS pairs_region,
           CAST(t2 AS DOUBLE)
             / sqrt(CAST(pa2 AS DOUBLE) * CAST(pb2 AS DOUBLE)) AS fm_index
    FROM s
    """,
    doc="Fowlkes-Mallows index between two partitions of the customer "
    "base — market segment vs geographic region (nation -> region "
    "broadcast chain): FM = TP/sqrt((TP+FP)(TP+FN)) over same-cluster "
    "PAIRS, the geometric mean of pairwise precision and recall (the "
    "external clustering-validation metric beside ARI). Doubled pair "
    "counts n(n-1) stay exact integers (HUGEINT/DECIMAL through "
    "sf1000); FM is ONE fixed-shape double ratio over those exact "
    "integers. Two broadcast dim joins + one 25-cell aggregation; "
    "margins re-aggregate the cell grid.",
)
def agg_fowlkes_mallows(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    cu = (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), F.col("n_regionkey") == r.r_regionkey)
        .select(F.col("c_mktsegment").alias("a"), F.col("r_name").alias("b"))
    )
    cells = cu.groupBy("a", "b").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    am = cells.groupBy("a").agg(F.sum("n").cast("bigint").alias("na"))
    bm = cells.groupBy("b").agg(F.sum("n").cast("bigint").alias("nb"))
    s = (
        cells.agg(
            F.sum("n").cast("bigint").alias("nn"),
            _dsum(F.expr("CAST(n AS DECIMAL(38,0)) * (n - 1)")).alias("t2"),
        )
        .crossJoin(
            F.broadcast(
                am.agg(
                    _dsum(
                        F.expr("CAST(na AS DECIMAL(38,0)) * (na - 1)")
                    ).alias("pa2")
                )
            )
        )
        .crossJoin(
            F.broadcast(
                bm.agg(
                    _dsum(
                        F.expr("CAST(nb AS DECIMAL(38,0)) * (nb - 1)")
                    ).alias("pb2")
                )
            )
        )
    )
    return s.select(
        F.col("nn").alias("n_customers"),
        F.expr("CAST(t2 div 2 AS BIGINT)").alias("pairs_together"),
        F.expr("CAST(pa2 div 2 AS BIGINT)").alias("pairs_seg"),
        F.expr("CAST(pb2 div 2 AS BIGINT)").alias("pairs_region"),
        F.expr(
            "CAST(t2 AS DOUBLE)"
            " / sqrt(CAST(pa2 AS DOUBLE) * CAST(pb2 AS DOUBLE))"
        ).alias("fm_index"),
    )


# ---------------------------------------------------------------------------
# agg_rand_adjusted — adjusted Rand index (same partition pair)
# ---------------------------------------------------------------------------


@register(
    "agg_rand_adjusted",
    oracle="""
    WITH cu AS (
      SELECT c.c_mktsegment AS a, r.r_name AS b
      FROM customer c
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
    ),
    cells AS (
      SELECT a, b, CAST(count(*) AS BIGINT) AS n FROM cu GROUP BY a, b
    ),
    am AS (SELECT a, CAST(sum(n) AS BIGINT) AS na FROM cells GROUP BY a),
    bm AS (SELECT b, CAST(sum(n) AS BIGINT) AS nb FROM cells GROUP BY b),
    s AS (
      SELECT
        (SELECT CAST(sum(n) AS BIGINT) FROM cells) AS nn,
        (SELECT CAST(sum(CAST(n AS HUGEINT) * (n - 1)) AS HUGEINT)
         FROM cells) AS sij2,
        (SELECT CAST(sum(CAST(na AS HUGEINT) * (na - 1)) AS HUGEINT)
         FROM am) AS sa2,
        (SELECT CAST(sum(CAST(nb AS HUGEINT) * (nb - 1)) AS HUGEINT)
         FROM bm) AS sb2
    ),
    z AS (
      SELECT nn, sij2, sa2, sb2,
             CAST(nn AS HUGEINT) * (nn - 1) AS tot2,
             CAST(nn AS HUGEINT) * (nn - 1) * sij2 - sa2 * sb2 AS num,
             CAST(nn AS HUGEINT) * (nn - 1) * ((sa2 + sb2) // 2)
               - sa2 * sb2 AS den
      FROM s
    )
    SELECT nn AS n_customers,
           CAST(sij2 // 2 AS BIGINT) AS pairs_together,
           CAST(CASE WHEN num >= 0 THEN 1 ELSE -1 END AS BIGINT)
             AS ari_sign,
           CAST((1000000000 * abs(num)) // greatest(abs(den), 1) AS BIGINT)
             AS ari_abs_ppb
    FROM z
    """,
    doc="Adjusted Rand index between the market-segment and region "
    "partitions of the customer base — Rand agreement corrected for "
    "chance under the permutation model, the standard external "
    "clustering-comparison statistic next to agg_fowlkes_mallows "
    "(same frame, different normalization: ARI subtracts the expected "
    "pair overlap where FM takes a geometric mean, so they can "
    "disagree on which of two partition pairs is closer). With "
    "doubled combination counts x2 = 2*C(x,2) (each n(n-1) is even, "
    "so (sa2+sb2)/2 is exact): ARI = (tot2*sij2 - sa2*sb2) / "
    "(tot2*(sa2+sb2)/2 - sa2*sb2) — ONE exact integer ratio, "
    "sign-split to ari_sign + non-negative ppb floor-division "
    "(products bounded by n^4 < 10^38 through sf100). Same "
    "broadcast-dim plan as its sibling.",
)
def agg_rand_adjusted(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    cu = (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), F.col("n_regionkey") == r.r_regionkey)
        .select(F.col("c_mktsegment").alias("a"), F.col("r_name").alias("b"))
    )
    cells = cu.groupBy("a", "b").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    am = cells.groupBy("a").agg(F.sum("n").cast("bigint").alias("na"))
    bm = cells.groupBy("b").agg(F.sum("n").cast("bigint").alias("nb"))
    s = (
        cells.agg(
            F.sum("n").cast("bigint").alias("nn"),
            _dsum(F.expr("CAST(n AS DECIMAL(38,0)) * (n - 1)")).alias("sij2"),
        )
        .crossJoin(
            F.broadcast(
                am.agg(
                    _dsum(
                        F.expr("CAST(na AS DECIMAL(38,0)) * (na - 1)")
                    ).alias("sa2")
                )
            )
        )
        .crossJoin(
            F.broadcast(
                bm.agg(
                    _dsum(
                        F.expr("CAST(nb AS DECIMAL(38,0)) * (nb - 1)")
                    ).alias("sb2")
                )
            )
        )
    )
    z = s.select(
        "nn",
        "sij2",
        F.expr(
            "CAST(nn AS DECIMAL(38,0)) * (nn - 1) * sij2 - sa2 * sb2"
        ).alias("num"),
        F.expr(
            "CAST(nn AS DECIMAL(38,0)) * (nn - 1) * ((sa2 + sb2) div 2)"
            " - sa2 * sb2"
        ).alias("den"),
    )
    return z.select(
        F.col("nn").alias("n_customers"),
        F.expr("CAST(sij2 div 2 AS BIGINT)").alias("pairs_together"),
        F.expr(
            "CAST(CASE WHEN num >= 0 THEN 1 ELSE -1 END AS BIGINT)"
        ).alias("ari_sign"),
        F.expr(
            "CAST((1000000000 * abs(num)) div greatest(abs(den), 1)"
            " AS BIGINT)"
        ).alias("ari_abs_ppb"),
    )


# ---------------------------------------------------------------------------
# agg_theil_index — Theil T and L inequality per priority (bucketed domain)
# ---------------------------------------------------------------------------


@register(
    "agg_theil_index",
    oracle="""
    WITH b AS (
      SELECT o_orderpriority AS pri,
             greatest(CAST(round(o_totalprice / 1000) AS BIGINT), 1) AS v
      FROM orders
    ),
    cells AS (
      SELECT pri, v, CAST(count(*) AS BIGINT) AS c
      FROM b GROUP BY pri, v
    ),
    g AS (
      SELECT pri, CAST(sum(c) AS BIGINT) AS n,
             CAST(sum(c * v) AS BIGINT) AS s
      FROM cells GROUP BY pri
    ),
    t AS (
      SELECT cells.pri,
             CAST(sum(CAST(floor(1000000.0 * c * v *
                  ln((CAST(n AS DOUBLE) * v) / s)) AS HUGEINT))
               AS HUGEINT) AS tnum,
             CAST(sum(CAST(floor(1000000.0 * c *
                  ln(CAST(s AS DOUBLE) / (CAST(n AS DOUBLE) * v)))
                  AS HUGEINT)) AS HUGEINT) AS lnum
      FROM cells JOIN g ON cells.pri = g.pri
      GROUP BY cells.pri
    )
    SELECT g.pri AS priority, g.n AS n_orders,
           CAST(CASE WHEN tnum >= 0 THEN 1 ELSE -1 END AS BIGINT)
             AS theil_t_sign,
           CAST(abs(tnum) // g.s AS BIGINT) AS theil_t_abs_micro,
           CAST(CASE WHEN lnum >= 0 THEN 1 ELSE -1 END AS BIGINT)
             AS theil_l_sign,
           CAST(abs(lnum) // g.n AS BIGINT) AS theil_l_abs_micro
    FROM t JOIN g ON t.pri = g.pri
    ORDER BY priority
    """,
    doc="Theil T and Theil L inequality indices of order value per "
    "priority class, computed on the 1000-unit price-bucket DOMAIN "
    "(the roc_auc grid — the statistic is defined on the bucketed "
    "distribution, so both engines evaluate the identical ~105-cell "
    "relation; declared bucketing, not an approximation claim): "
    "T = sum (x/S) ln(n x/S), L = (1/n) sum ln(S/(n x)) — the two "
    "GE-family members that decompose additively by subgroup (the "
    "between/within split agg_atkinson_index and agg_hoover_index "
    "cannot offer). Per-CELL terms c*v*ln(n*v/S) quantize to integer "
    "micro-units before the exact grid-sized sum (the mutual-"
    "information precedent); the two final floor-divisions are "
    "sign-split. One map-combined rollup to (priority, bucket), one "
    "5-row broadcast join back; no windows.",
)
def agg_theil_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    b = o.select(
        F.col("o_orderpriority").alias("pri"),
        F.greatest(
            F.round(F.col("o_totalprice") / 1000).cast("bigint"), F.lit(1)
        ).alias("v"),
    )
    cells = b.groupBy("pri", "v").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    g = cells.groupBy("pri").agg(
        F.sum("c").cast("bigint").alias("n"),
        F.sum(F.col("c") * F.col("v")).cast("bigint").alias("s"),
    )
    t = (
        cells.join(F.broadcast(g), "pri")
        .groupBy("pri")
        .agg(
            _dsum(
                F.floor(
                    F.lit(1000000.0)
                    * F.col("c")
                    * F.col("v")
                    * F.log(
                        (F.col("n").cast("double") * F.col("v")) / F.col("s")
                    )
                )
            ).alias("tnum"),
            _dsum(
                F.floor(
                    F.lit(1000000.0)
                    * F.col("c")
                    * F.log(
                        F.col("s").cast("double")
                        / (F.col("n").cast("double") * F.col("v"))
                    )
                )
            ).alias("lnum"),
        )
    )
    return (
        t.join(F.broadcast(g), "pri")
        .select(
            F.col("pri").alias("priority"),
            F.col("n").alias("n_orders"),
            F.expr(
                "CAST(CASE WHEN tnum >= 0 THEN 1 ELSE -1 END AS BIGINT)"
            ).alias("theil_t_sign"),
            F.expr("CAST(abs(tnum) div s AS BIGINT)").alias(
                "theil_t_abs_micro"
            ),
            F.expr(
                "CAST(CASE WHEN lnum >= 0 THEN 1 ELSE -1 END AS BIGINT)"
            ).alias("theil_l_sign"),
            F.expr("CAST(abs(lnum) div n AS BIGINT)").alias(
                "theil_l_abs_micro"
            ),
        )
        .orderBy("priority")
    )


# ---------------------------------------------------------------------------
# agg_ge2_index — generalized entropy GE(2) per priority (log-free)
# ---------------------------------------------------------------------------


@register(
    "agg_ge2_index",
    oracle="""
    WITH b AS (
      SELECT o_orderpriority AS pri,
             CAST(round(o_totalprice * 100) AS BIGINT) AS x
      FROM orders
    ),
    g AS (
      SELECT pri, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS HUGEINT) AS s,
             CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS s2
      FROM b GROUP BY pri
    )
    SELECT pri AS priority, n AS n_orders,
           CAST(s // n AS BIGINT) AS mean_cents,
           CAST((1000000000 * (n * s2 - s * s)) // (2 * s * s) AS BIGINT)
             AS ge2_ppb,
           CAST((1000000000 * (n * s2 - s * s)) // (CAST(n AS HUGEINT) * s)
                AS BIGINT) AS n_scaled_var_ppb
    FROM g
    ORDER BY priority
    """,
    doc="Generalized entropy GE(2) inequality index per priority — "
    "GE(2) = (E[x^2]/mu^2 - 1)/2 = half the squared coefficient of "
    "variation, the log-free member of the GE family (alpha=2 weights "
    "the top tail, complementing Theil T at alpha=1, Theil L at 0 and "
    "Atkinson's welfare form): top-sensitive inequality with NOTHING "
    "but exact integer cent moments. Cleared denominators: GE2 = "
    "(n*S2 - S^2)/(2*S^2), non-negative by Cauchy-Schwarz, so ONE "
    "unsigned ppb floor-division (n*S2 < 10^33 at sf100 — inside "
    "HUGEINT/DECIMAL(38,0)). One map-combined aggregation; no joins, "
    "no windows.",
)
def agg_ge2_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    b = o.select(
        F.col("o_orderpriority").alias("pri"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("x"),
    )
    g = b.groupBy("pri").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        _dsum(F.col("x")).alias("s"),
        _dsum(F.expr("CAST(x AS DECIMAL(38,0)) * x")).alias("s2"),
    )
    return g.select(
        F.col("pri").alias("priority"),
        F.col("n").alias("n_orders"),
        F.expr("CAST(s div n AS BIGINT)").alias("mean_cents"),
        F.expr(
            "CAST((1000000000 * (n * s2 - s * s)) div (2 * s * s)"
            " AS BIGINT)"
        ).alias("ge2_ppb"),
        F.expr(
            "CAST((1000000000 * (n * s2 - s * s))"
            " div (CAST(n AS DECIMAL(38,0)) * s) AS BIGINT)"
        ).alias("n_scaled_var_ppb"),
    ).orderBy("priority")


# ---------------------------------------------------------------------------
# agg_gumbel_fit — Gumbel EVD fit on monthly block maxima (method of moments)
# ---------------------------------------------------------------------------


@register(
    "agg_gumbel_fit",
    oracle="""
    WITH mm AS (
      SELECT date_trunc('month', o_orderdate) AS mo,
             CAST(max(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS mx
      FROM orders GROUP BY 1
    ),
    s AS (
      SELECT CAST(count(*) AS BIGINT) AS k,
             CAST(sum(mx) AS HUGEINT) AS sm,
             CAST(sum(CAST(mx AS HUGEINT) * mx) AS HUGEINT) AS sm2
      FROM mm
    )
    SELECT k AS n_months,
           CAST(sm // k AS BIGINT) AS mean_max_cents,
           CAST(floor(sqrt(CAST(k * sm2 - sm * sm AS DOUBLE)
                           / (CAST(k AS DOUBLE) * (k - 1)))
                      * 0.7796968012214599) AS BIGINT) AS beta_cents,
           CAST(floor(CAST(sm AS DOUBLE) / k
                      - 0.5772156649015329
                        * (sqrt(CAST(k * sm2 - sm * sm AS DOUBLE)
                                / (CAST(k AS DOUBLE) * (k - 1)))
                           * 0.7796968012214599)) AS BIGINT) AS mu_cents,
           CAST(floor(CAST(sm AS DOUBLE) / k
                      - 0.5772156649015329
                        * (sqrt(CAST(k * sm2 - sm * sm AS DOUBLE)
                                / (CAST(k AS DOUBLE) * (k - 1)))
                           * 0.7796968012214599)
                      + 4.600149226776579
                        * (sqrt(CAST(k * sm2 - sm * sm AS DOUBLE)
                                / (CAST(k AS DOUBLE) * (k - 1)))
                           * 0.7796968012214599)) AS BIGINT)
             AS return_level_99_cents
    FROM s
    """,
    doc="Gumbel extreme-value fit to MONTHLY BLOCK MAXIMA of order value "
    "(method of moments): scale beta = s*sqrt(6)/pi and location "
    "mu = mean - gamma*beta (Euler-Mascheroni), plus the 99th-"
    "percentile return level mu + beta*(-ln(-ln 0.99)) — the "
    "capacity-planning number ('the monthly max exceeded once per "
    "100 months') that complements events_peak_over_threshold's POT "
    "approach with the block-maxima approach. Block maxima and both "
    "moment sums are exact integer cents over the calendar-bounded "
    "~84-month relation; beta/mu/return level are fixed-shape double "
    "expressions over those exact integers with the three "
    "mathematical constants as exact shared double literals, floor-"
    "quantized to whole cents. One month rollup; no windows, no "
    "joins.",
)
def agg_gumbel_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    mm = o.groupBy(
        F.date_trunc("month", F.col("o_orderdate")).alias("mo")
    ).agg(
        F.max(F.round(F.col("o_totalprice") * 100).cast("bigint"))
        .cast("bigint")
        .alias("mx")
    )
    s = mm.agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        _dsum(F.col("mx")).alias("sm"),
        _dsum(F.expr("CAST(mx AS DECIMAL(38,0)) * mx")).alias("sm2"),
    )
    beta = (
        "sqrt(CAST(k * sm2 - sm * sm AS DOUBLE)"
        " / (CAST(k AS DOUBLE) * (k - 1))) * 0.7796968012214599"
    )
    return s.select(
        F.col("k").alias("n_months"),
        F.expr("CAST(sm div k AS BIGINT)").alias("mean_max_cents"),
        F.expr(f"CAST(floor({beta}) AS BIGINT)").alias("beta_cents"),
        F.expr(
            f"CAST(floor(CAST(sm AS DOUBLE) / k"
            f" - 0.5772156649015329 * ({beta})) AS BIGINT)"
        ).alias("mu_cents"),
        F.expr(
            f"CAST(floor(CAST(sm AS DOUBLE) / k"
            f" - 0.5772156649015329 * ({beta})"
            f" + 4.600149226776579 * ({beta})) AS BIGINT)"
        ).alias("return_level_99_cents"),
    )
