#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}.

Each query is forced end-to-end with a noop-format write (full computation,
no sink cost, nothing collected to the driver). A warmup action runs first so
JVM/codegen spin-up isn't attributed to the first query.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# representative coverage of each operator family, weighted toward the
# shapes that dominate at 100 TB (fact-table agg, fact-fact join, windows,
# LSH dedup, similarity)
HEADLINE_QUERIES = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q7_volume_shipping",
    "q9_product_profit",
    "agg_count_distinct",
    "agg_rollup",
    "window_rank_topk",
    "join_asof",
    "stream_tumbling_window",
    "stream_session_window",
    "cdc_serialize_envelope",
    "dedup_minhash_lsh",
    "similarity_topk_bruteforce",
    "text_fingerprint",
    "text_chunk_tokens",
    "pack_sequences",
    "q13_customer_distribution",
    "events_funnel",
    "text_passage_dedup",
    "embedding_quantize_int8",
    # round 4: iterative graph, tokenizer-prep counting, one-pass rollup
    "pagerank_nations",
    "bigram_lm_surprisal",
    "events_time_rollup",
    # round 5: sketching, graph mining, DQ sweep, BLAS-batched linear algebra
    "agg_heavy_hitters_cms",
    "graph_triangle_count",
    "dq_rule_violations",
    "embedding_gram_matrix",
    "stream_window_topk",
    "bpe_learn_merges",
    "embedding_pca_power_iteration",
    # round 6: MERGE upsert, semantic LSH dedup, nucleus curation,
    # tile-explode rolling distinct
    "merge_upsert_snapshot",
    "dedup_embedding_cosine",
    "docs_topp_quality",
    "events_stickiness_dau_wau",
    # round 7: mergeable KMV sketch set-ops, exchange-reusing streaks,
    # engine-exact HLL registers
    "agg_kmv_distinct_setops",
    "events_activity_streaks",
    "agg_hll_registers",
    # round 7 (cont.): the shuffle-only 100 TB CC workhorse, point-in-time
    # CDC state reconstruction, sweep-line concurrency
    "graph_cc_bigstar",
    "cdc_apply_asof",
    "events_max_concurrency",
    # round 9: sparse retrieval scoring, one-pass closed-form OLS, hashed
    # Poisson-bootstrap resampling (40x map-side explode)
    "text_bm25_topk",
    "orders_ols_multifactor",
    "agg_bootstrap_poisson",
    # round 8: the two-pass range-partitioned rank (no single-partition
    # ntile) and the distinct-cell-compacted Spearman moments
    "customer_ltv_deciles",
    "agg_spearman_corr",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    from mongodb_nats_connector_spark.registry import queries
    from mongodb_nats_connector_spark.session import get_spark

    spark = get_spark(app_name="mnc-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")
    qs = queries()

    # warmup: touch the biggest input once (JVM + parquet footer caches) and
    # run one trivial Arrow batch so the Python UDF worker pool is up —
    # steady-state is what we're measuring, not worker fork time
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).count()
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def _warm(x):
        return x

    spark.range(1000).select(_warm(F.col("id"))).write.format("noop").mode(
        "overwrite"
    ).save()

    timings: dict[str, float] = {}
    build_s: dict[str, float] = {}
    exec_s: dict[str, float] = {}
    exec_warm_s: dict[str, float] = {}
    for name in HEADLINE_QUERIES:
        # bill build and execute separately: driver-loop queries (kmeans,
        # pagerank, BPE, PCA) run their iteration jobs while the DataFrame
        # is being BUILT (charged to build_s); everything else should be
        # ~all exec_s. The headline total still counts both.
        t0 = time.perf_counter()
        df = qs[name](spark, sf_dir)
        t1 = time.perf_counter()
        # Two noop-sink writes: exec_s is the FIRST (cold — computes every
        # uncached stage, comparable to the single-run numbers of earlier
        # rounds); exec_warm_s is the second, which reuses result-scoped
        # caches and warm page cache — the steady-state floor that separates
        # real plan cost from one-off GC/JIT pauses (run-to-run spread on
        # this box was measured up to 4x on sub-second queries).
        r0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        r1 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        r2 = time.perf_counter()
        build_s[name] = round(t1 - t0, 3)
        exec_s[name] = round(r1 - r0, 3)
        exec_warm_s[name] = round(r2 - r1, 3)
        timings[name] = round(build_s[name] + exec_s[name], 3)

    total = round(sum(timings.values()), 3)
    # the 24-query set benchmarked since round 4, summed over exec_s only —
    # directly comparable to BENCH_r04 (which timed just the noop write):
    # the honest answer to "did execution regress or did accounting change"
    common24 = HEADLINE_QUERIES[:24]
    common24_exec = round(sum(exec_s[q] for q in common24), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "build_s": build_s,
                "exec_s": exec_s,
                "exec_warm_s": exec_warm_s,
                "common24_exec_total": common24_exec,
                "sf": sf,
                "note": "r6: build_s = DataFrame construction (incl. "
                "driver-loop iteration jobs for pagerank/BPE/PCA); exec_s "
                "= first noop-sink write (cold, comparable to earlier "
                "rounds); exec_warm_s = second write (steady state, reuses "
                "result-scoped caches; separates plan cost from GC/JIT "
                "noise — measured spread up to 4x on sub-second queries). "
                "'queries' = build_s + exec_s",
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
