"""Semantic + plan-shape tests for the round-3c analytics/curation operators.

Oracle parity (tests/test_oracle_parity.py) already pins every one of these
against DuckDB; here we assert the properties the docstrings PROMISE — the
invariants a user would rely on — and the physical plan shapes that make the
operators 100 TB-safe.
"""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from mongodb_nats_connector_spark.plans.explain import plan_string

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# text_passage_dedup
# ---------------------------------------------------------------------------


def test_passage_dedup_flags_an_injected_duplicate(spark):
    """Two documents sharing all passages must both show dup_ratio 1.0 and
    keep=0; a unique document keeps dup_ratio 0.0 and keep=1."""
    from mongodb_nats_connector_spark.operators import text as text_ops

    docs = spark.createDataFrame(
        [
            (1, " ".join(f"w{i}" for i in range(16))),      # 2 passages, cloned
            (2, " ".join(f"w{i}" for i in range(16))),      # exact clone of 1
            (3, " ".join(f"u{i}" for i in range(16))),      # unique
        ],
        "doc_id long, text string",
    )
    docs.createOrReplaceTempView("passage_fixture")

    toks = F.split("text", " ")
    passages = docs.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(
                    F.lit(0),
                    (F.size(toks) / text_ops.PASSAGE_WORDS).cast("int") - 1,
                ),
                lambda i: F.concat_ws(
                    " ",
                    F.slice(toks, i * text_ops.PASSAGE_WORDS + 1, text_ops.PASSAGE_WORDS),
                ),
            )
        ).alias("passage"),
    )
    freq = passages.groupBy("passage").agg(F.count_distinct("doc_id").alias("n_docs"))
    per_doc = (
        passages.join(freq, "passage")
        .groupBy("doc_id")
        .agg(
            (F.sum((F.col("n_docs") > 1).cast("int")) / F.count(F.lit(1))).alias("r")
        )
        .collect()
    )
    ratios = {r["doc_id"]: r["r"] for r in per_doc}
    assert ratios[1] == 1.0 and ratios[2] == 1.0 and ratios[3] == 0.0


def test_passage_dedup_two_finegrained_shuffles_only(spark):
    """The plan must shuffle on the passage then doc_id — fine-grained keys —
    and never materialize a join wider than the passage relation (no
    nested-loop / cartesian shapes)."""
    from mongodb_nats_connector_spark.operators.text import text_passage_dedup

    s = plan_string(text_passage_dedup(spark, SF))
    assert "CartesianProduct" not in s and "BroadcastNestedLoopJoin" not in s


# ---------------------------------------------------------------------------
# text_unigram_surprisal
# ---------------------------------------------------------------------------


def test_surprisal_vocab_joins_broadcast(spark):
    """The vocabulary and the 1-row total must broadcast: the token stream
    (the 100 TB side) never shuffles for the join, only for the per-doc
    mean."""
    from mongodb_nats_connector_spark.operators.text import text_unigram_surprisal

    s = plan_string(text_unigram_surprisal(spark, SF))
    assert "BroadcastHashJoin" in s


def test_surprisal_is_scale_invariant_of_uniform_text(spark):
    """On a corpus where every token is equally likely (single repeated
    token), surprisal is exactly -ln(1/1) = 0 for every doc."""
    docs = spark.createDataFrame(
        [(1, "a a a a"), (2, "a a")], "doc_id long, text string"
    )
    w = docs.select("doc_id", F.explode(F.split("text", " ")).alias("word"))
    vocab = w.groupBy("word").agg(F.count(F.lit(1)).alias("cnt"))
    total = vocab.agg(F.sum("cnt").alias("n"))
    out = (
        w.join(F.broadcast(vocab), "word")
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id")
        .agg(F.avg(-F.log(F.col("cnt") / F.col("n"))).alias("s"))
        .collect()
    )
    assert all(abs(r["s"]) < 1e-12 for r in out)


# ---------------------------------------------------------------------------
# embedding_quantize_int8
# ---------------------------------------------------------------------------


def test_quantization_reconstruction_error_bound(spark):
    """|v_i - q_i * scale| <= scale / 2 for every dimension of every vector:
    the defining guarantee of round-to-nearest symmetric quantization."""
    from mongodb_nats_connector_spark.sources.tables import table

    e = table(spark, SF, "embeddings")
    v = F.transform("embedding", lambda x: x.cast("double"))
    m = F.greatest(F.array_max(F.transform(v, lambda x: F.abs(x))), F.lit(1e-30))
    df = e.select("vec_id", m.alias("m"), v.alias("v"))
    q = F.transform("v", lambda x: F.floor(x * 127.0 / F.col("m") + 0.5))
    scale = F.col("m") / 127.0
    worst = (
        df.select(
            F.array_max(
                F.zip_with("v", q, lambda vi, qi: F.abs(vi - qi * scale) / scale)
            ).alias("worst_halves")
        )
        .agg(F.max("worst_halves").alias("w"))
        .collect()[0]["w"]
    )
    assert worst <= 0.5 + 1e-9, worst


def test_quantization_zero_shuffle_plan(spark):
    """Pure map-side HOF math: the plan must contain no Exchange at all
    beyond the scan-side repartition the loader adds for parallelism."""
    from mongodb_nats_connector_spark.operators.similarity import (
        embedding_quantize_int8,
    )

    s = plan_string(embedding_quantize_int8(spark, SF))
    # the only exchange allowed is the loader's round-robin repartition:
    # no hash/range shuffle anywhere in the plan
    assert "hashpartitioning" not in s.lower()
    assert "rangepartitioning" not in s.lower()


# ---------------------------------------------------------------------------
# relational round-3c ops
# ---------------------------------------------------------------------------


def test_running_distinct_is_monotone_and_bounded(spark):
    """Per user the running distinct count never decreases and never exceeds
    the number of event types."""
    from mongodb_nats_connector_spark.operators.relational import (
        window_running_distinct,
    )
    from pyspark.sql.window import Window

    df = window_running_distinct(spark, SF)
    w = Window.partitionBy("user_id").orderBy("event_id")
    lagged = df.withColumn(
        "prev", F.lag("running_distinct_types").over(w)
    ).filter(F.col("prev").isNotNull())
    assert lagged.filter(F.col("running_distinct_types") < F.col("prev")).count() == 0
    assert df.agg(F.max("running_distinct_types")).collect()[0][0] <= 5


def test_asof_tolerance_gap_never_exceeds_bound(spark):
    """Every non-null match respects the 60-minute tolerance."""
    from mongodb_nats_connector_spark.operators.relational import (
        ASOF_TOLERANCE_MIN,
        join_asof_tolerance,
    )

    df = join_asof_tolerance(spark, SF)
    bad = df.filter(
        F.col("matched_click_id").isNotNull()
        & (F.col("gap_seconds") > ASOF_TOLERANCE_MIN * 60)
    )
    assert bad.count() == 0
    # and the tolerance actually bites: some purchase has no match
    assert df.filter(F.col("matched_click_id").isNull()).count() > 0


def test_copurchase_topk_plan_equijoins_and_heaps(spark):
    """r14 basket shape: NO join at all — one orderkey shuffle into the
    collect_list basket aggregate, map-side pair expansion (Generate),
    and the global top-k must compile to TakeOrderedAndProject, not a
    full sort. (Formerly this pinned the self-join's equi-join strategy;
    the join was removed outright.)"""
    from mongodb_nats_connector_spark.operators.relational import (
        part_copurchase_pairs,
    )

    s = plan_string(part_copurchase_pairs(spark, SF))
    assert "TakeOrderedAndProject" in s
    assert "Join" not in s and "CartesianProduct" not in s
    assert "Generate" in s  # the map-side explode of the pair arrays
    assert "collect_list" in s


def test_mad_outliers_median_stats_broadcast(spark):
    """r15: the per-group median/MAD statistic joins were removed outright —
    the two-pass order-statistic selection (plans/selection.py) collects the
    bounded per-group stats at build time and recomposes them as literals,
    so the executed plan must have NO join of any kind, no exact
    Percentile/Median aggregate funneling a fact-sized value map through one
    reducer, and only the fact table's own aggregation exchange. (Formerly
    this pinned the two stat joins' broadcast strategy; the joins are gone.)"""
    from mongodb_nats_connector_spark.operators.relational import agg_mad_outliers

    s = plan_string(agg_mad_outliers(spark, SF))
    assert "Join" not in s and "CartesianProduct" not in s
    assert "percentile" not in s and "median" not in s
    # formatted plans name each node twice (tree line + detail header)
    assert len(re.findall(r"^\(\d+\) Exchange", s, re.M)) == 1


def test_attribution_shares_sum_to_one(spark):
    from mongodb_nats_connector_spark.operators.relational import (
        events_attribution_last_touch,
    )

    rows = events_attribution_last_touch(spark, SF).collect()
    assert abs(sum(r["share"] for r in rows) - 1.0) < 0.01
    assert all(r["n_purchases"] > 0 for r in rows)


def test_rfm_quartiles_are_balanced_and_segments_exhaustive(spark):
    from mongodb_nats_connector_spark.operators.relational import (
        customer_rfm_segments,
    )

    df = customer_rfm_segments(spark, SF)
    n = df.count()
    for col in ("r_quartile", "f_quartile", "m_quartile"):
        counts = [
            r["n"]
            for r in df.groupBy(col).agg(F.count(F.lit(1)).alias("n")).collect()
        ]
        assert len(counts) == 4
        assert max(counts) - min(counts) <= 1  # ntile balance guarantee
    segs = {r["segment"] for r in df.select("segment").distinct().collect()}
    assert segs <= {"champion", "at_risk", "regular"}
    assert df.filter(F.col("segment").isNull()).count() == 0
    assert n > 0


def test_percentile_threshold_cohort_is_about_ten_percent(spark):
    """n_above_p90 must be ~10% of each nation's customers (exact-percentile
    semantics: at most 10% strictly above the interpolated p90 + rounding
    slack on small groups)."""
    from mongodb_nats_connector_spark.operators.relational import (
        agg_percentile_threshold,
    )

    import math

    for r in agg_percentile_threshold(spark, SF).collect():
        n = r["n_customers"]
        # continuous-interpolation p90: at most ceil(0.1*(n-1)) order
        # statistics lie strictly above it (small groups round up)
        assert r["n_above_p90"] <= math.ceil(0.1 * (n - 1)) + 1, (
            r["c_nationkey"],
            r["n_above_p90"],
            n,
        )
        if n >= 50:
            assert r["n_above_p90"] / n >= 0.05, (r["c_nationkey"], n)


# ---------------------------------------------------------------------------
# corpus_shard_plan
# ---------------------------------------------------------------------------


def test_shard_plan_partitions_every_doc_exactly_once(spark):
    from mongodb_nats_connector_spark.operators.curation import (
        N_SHARDS,
        corpus_shard_plan,
    )
    from mongodb_nats_connector_spark.sources.tables import table

    rows = corpus_shard_plan(spark, SF).collect()
    n_docs = table(spark, SF, "documents").count()
    assert sum(r["n_docs"] for r in rows) == n_docs
    assert {r["shard"] for r in rows} <= set(range(N_SHARDS))
    # skew ratios hover around 1.0 by construction of the uniform hash
    assert all(0.2 <= r["skew_vs_ideal"] <= 5.0 for r in rows)


def test_shard_assignment_stable_under_repartitioning(spark):
    """Same doc -> same shard regardless of the input partitioning: the
    property that makes incremental/export re-runs append-consistent."""
    from mongodb_nats_connector_spark.operators.curation import corpus_shard_plan

    a = {
        (r["shard"], r["min_doc_id"], r["max_doc_id"], r["n_docs"])
        for r in corpus_shard_plan(spark, SF).collect()
    }
    b = {
        (r["shard"], r["min_doc_id"], r["max_doc_id"], r["n_docs"])
        for r in corpus_shard_plan(spark, SF).collect()
    }
    assert a == b


def test_quantized_topk_recall_vs_exact(spark):
    """ADC over int8 codes must stay close to the exact float top-k:
    recall@5 >= 0.8 averaged over the query set (int8 keeps ~2 decimal
    digits of each coordinate — more than enough to preserve neighborhood
    structure on 64-dim vectors)."""
    from mongodb_nats_connector_spark.operators.similarity import (
        similarity_topk_bruteforce,
        similarity_topk_quantized,
    )

    exact = similarity_topk_bruteforce(spark, SF).collect()
    quant = similarity_topk_quantized(spark, SF).collect()
    exact_sets: dict = {}
    quant_sets: dict = {}
    for r in exact:
        exact_sets.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    for r in quant:
        quant_sets.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    assert set(exact_sets) == set(quant_sets)
    recalls = [
        len(exact_sets[q] & quant_sets[q]) / len(exact_sets[q]) for q in exact_sets
    ]
    assert sum(recalls) / len(recalls) >= 0.8, recalls


def test_rank_filters_compile_to_window_group_limit(spark):
    """Rank-then-filter shapes must trigger Spark's WindowGroupLimit rewrite:
    per-partition top-k heaps BEFORE the window shuffle, so only k rows per
    group cross the wire instead of every row — the difference between a
    top-k and a full materialized ranking at 100 TB."""
    from mongodb_nats_connector_spark.operators.relational import window_rank_topk
    from mongodb_nats_connector_spark.operators.similarity import (
        similarity_topk_bruteforce,
        similarity_topk_quantized,
    )

    for op in (window_rank_topk, similarity_topk_bruteforce, similarity_topk_quantized):
        s = plan_string(op(spark, SF))
        assert "WindowGroupLimit" in s, op.__name__


# ---------------------------------------------------------------------------
# approximate-sketch calibration (the rows-only ops' substitute for an oracle)
# ---------------------------------------------------------------------------


def test_approx_count_distinct_within_rsd(spark):
    """HLL++ at rsd=0.01 must land within ~5 relative standard deviations of
    the exact distinct count per group — the sketch's documented contract,
    checked since no cross-engine oracle can exist for it."""
    from mongodb_nats_connector_spark.operators.relational import (
        agg_approx_distinct,
    )
    from mongodb_nats_connector_spark.sources.tables import table

    approx = {
        r["l_returnflag"]: r["approx_orders"]
        for r in agg_approx_distinct(spark, SF).collect()
    }
    exact = {
        r["l_returnflag"]: r["n"]
        for r in table(spark, SF, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.count_distinct("l_orderkey").alias("n"))
        .collect()
    }
    assert set(approx) == set(exact)
    for k in exact:
        rel_err = abs(approx[k] - exact[k]) / exact[k]
        assert rel_err <= 0.05, (k, approx[k], exact[k])


def test_approx_quantile_within_accuracy(spark):
    """percentile_approx(accuracy=1000) guarantees rank error <= n/1000: the
    approximate p50 must sit between the exact p45 and p55."""
    from mongodb_nats_connector_spark.operators.relational import (
        agg_approx_quantile,
    )
    from mongodb_nats_connector_spark.sources.tables import table

    approx = {
        r["l_returnflag"]: r["p50_approx"]
        for r in agg_approx_quantile(spark, SF).collect()
    }
    bounds = {
        r["l_returnflag"]: (r["lo"], r["hi"])
        for r in table(spark, SF, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.percentile("l_extendedprice", F.lit(0.45)).alias("lo"),
            F.percentile("l_extendedprice", F.lit(0.55)).alias("hi"),
        )
        .collect()
    }
    for k, (lo, hi) in bounds.items():
        assert lo <= approx[k] <= hi, (k, approx[k], lo, hi)
