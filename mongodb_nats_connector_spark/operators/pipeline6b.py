"""Round-6b operators: the remaining scale-path and CDC-audit shapes.

- ``graph_cc_bigstar`` turns the large-star/small-star connected-components
  algorithm — previously only *named* as the 100 TB path in the
  ``dedup_clusters`` docstring — into real, tested code: pure hash-partitioned
  shuffles, no broadcast anywhere, logarithmic rounds.
- ``cdc_apply_asof`` and ``cdc_offset_gap_detect`` extend the connector's CDC
  family (reference: damianiandrea/mongodb-nats-connector,
  internal/mongo/client.go:211 change-stream semantics) with the two audits a
  change-stream consumer runs in production: point-in-time snapshot
  reconstruction and per-subject offset-sequence continuity.
- ``agg_bitmap_distinct`` is the exact distributed count-distinct via chunked
  bitmaps — the standard warehouse alternative to shuffling every distinct
  value when the key domain is dense integers.

Cross-engine determinism: every comparison/bucketing decision is on integers
(event ids, 63-bit bitmap chunks, doc ids), so the driver's value-hash gate is
exact by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mongodb_nats_connector_spark.operators.dedup import (
    _PAIRS_CTE,
    dedup_minhash_lsh,
)
from mongodb_nats_connector_spark.registry import register
from mongodb_nats_connector_spark.sources.tables import table

# ---------------------------------------------------------------------------
# graph_cc_bigstar — large-star/small-star connected components
# ---------------------------------------------------------------------------

CC_BIGSTAR_MAX_ROUNDS = 15


def _canon_pairs(e: DataFrame) -> DataFrame:
    """Undirected edge set in canonical (lo, hi) form, no self-loops."""
    return (
        e.filter(F.col("a") != F.col("b"))
        .select(
            F.least("a", "b").alias("lo"), F.greatest("a", "b").alias("hi")
        )
        .distinct()
    )


def _large_star(canon: DataFrame) -> DataFrame:
    """Connect every neighbor v > u to m = min(N(u) ∪ {u})."""
    sym = canon.select(F.col("lo").alias("u"), F.col("hi").alias("v")).union(
        canon.select(F.col("hi").alias("u"), F.col("lo").alias("v"))
    )
    mn = sym.groupBy("u").agg(F.min("v").alias("mnv"))
    out = (
        sym.join(mn, "u")
        .filter(F.col("v") > F.col("u"))
        .select(
            F.col("v").alias("a"), F.least("mnv", F.col("u")).alias("b")
        )
    )
    return _canon_pairs(out)


def _small_star(canon: DataFrame) -> DataFrame:
    """Orient edges (hi -> lo); connect hi and all its smaller neighbors to
    the minimum neighbor m = min(N(hi))."""
    mn = canon.groupBy("hi").agg(F.min("lo").alias("mnv"))
    out = canon.join(mn, "hi").select(
        F.col("lo").alias("a"), F.col("mnv").alias("b")
    ).union(mn.select(F.col("hi").alias("a"), F.col("mnv").alias("b")))
    return _canon_pairs(out)


def bigstar_labels(pairs: DataFrame) -> DataFrame:
    """(a, b) edge pairs -> (doc_id, label) for every node IN the edge set,
    label = component-minimum node id, via alternating large/small-star."""
    # localCheckpoint (not persist): each round references the previous edge
    # set several times, so without truncating the LOGICAL plan the analyzed
    # lineage grows ~8x per round and analysis itself OOMs by round 3 — the
    # checkpoint both materializes the round and resets the plan to a leaf.
    prev = _canon_pairs(pairs).localCheckpoint(eager=True)
    for _ in range(CC_BIGSTAR_MAX_ROUNDS):
        stepped = _small_star(_large_star(prev)).localCheckpoint(eager=True)
        # edge-set fixpoint in ONE job (r14: the two exceptAll/isEmpty
        # probes were two full-shuffle jobs per round): both sides are
        # DISTINCT canonical pair sets, so a +1/-1 tagged union groups to
        # sum 0 on every (lo, hi) exactly when the sets are equal — the
        # same exact set-equality test, half the convergence-check jobs
        same = (
            stepped.withColumn("_t", F.lit(1))
            .unionAll(prev.withColumn("_t", F.lit(-1)))
            .groupBy("lo", "hi")
            .agg(F.sum("_t").alias("_d"))
            .filter(F.col("_d") != 0)
            .isEmpty()
        )
        prev = stepped
        if same:
            break
    else:
        raise RuntimeError(
            f"large-star/small-star did not converge in "
            f"{CC_BIGSTAR_MAX_ROUNDS} rounds"
        )
    # fixpoint => every component is a star (root = component-min node):
    # members appear as hi with lo = root; roots label themselves
    return (
        prev.select(F.col("hi").alias("doc_id"), F.col("lo").alias("label"))
        .union(prev.select(F.col("lo").alias("doc_id"), F.col("lo").alias("label")))
        .groupBy("doc_id")
        .agg(F.min("label").alias("label"))
        .localCheckpoint(eager=True)
    )


@register(
    "graph_cc_bigstar",
    # same fixpoint as dedup_clusters: the recursive-CTE closure over the
    # verified >=0.7-Jaccard near-dup pair graph
    oracle=f"""
    WITH RECURSIVE {_PAIRS_CTE},
    edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM simpairs
      UNION ALL
      SELECT doc_b, doc_a FROM simpairs
    ),
    reach(u, v) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT r.u, e.dst FROM reach r JOIN edges e ON r.v = e.src
    )
    SELECT u AS doc_id, min(v) AS cluster_id,
           CAST(CASE WHEN u = min(v) THEN 1 ELSE 0 END AS BIGINT) AS is_canonical
    FROM reach GROUP BY u
    """,
    doc="Connected components via alternating large-star/small-star (Kiveris "
    "et al., 'Connected Components in MapReduce and Beyond') over the "
    "verified near-duplicate pair graph — the SAME fixpoint as "
    "``dedup_clusters`` computed by the plan that survives 100 TB: no "
    "broadcast anywhere, every round is two hash-partitioned groupBy/join "
    "shuffles keyed on node id, and the round count is logarithmic in the "
    "largest component diameter. ``dedup_clusters`` broadcasts the edge "
    "list into a label-propagation loop (right when near-dup edges are a "
    "vanishing fraction of the corpus); THIS operator is the documented "
    "fallback regime for when the edge list itself is data-proportional "
    "(web-graph CC, giant dedup clusters) — the pair proves both plans "
    "reach the identical labeling. Convergence is detected by edge-set "
    "fixpoint (exceptAll both ways) and asserted within "
    f"{CC_BIGSTAR_MAX_ROUNDS} rounds.",
)
def graph_cc_bigstar(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = dedup_minhash_lsh(spark, sf_dir).select(
        F.col("doc_a").alias("a"), F.col("doc_b").alias("b")
    )
    labels = bigstar_labels(pairs)
    docs = table(spark, sf_dir, "documents").select("doc_id")
    return docs.join(labels, "doc_id", "left").select(
        "doc_id",
        F.coalesce("label", "doc_id").alias("cluster_id"),
        (F.col("doc_id") == F.coalesce("label", "doc_id"))
        .cast("bigint")
        .alias("is_canonical"),
    )


# ---------------------------------------------------------------------------
# cdc_apply_asof — point-in-time snapshot reconstruction (time travel)
# ---------------------------------------------------------------------------

ASOF_SNAPSHOT_TS = "2024-01-16 00:00:00"


@register(
    "cdc_apply_asof",
    oracle=f"""
    SELECT user_id, event_type AS last_event_type, value AS last_value,
           ts AS last_ts
    FROM (
      SELECT user_id, event_type, value, ts,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events WHERE ts <= TIMESTAMP '{ASOF_SNAPSHOT_TS}'
    ) WHERE rn = 1
    """,
    doc="Point-in-time state reconstruction (time travel): replay the change "
    "log only up to a snapshot timestamp and keep the newest row per key — "
    "the as-of-T companion to ``cdc_apply_latest``, answering 'what did the "
    "collection look like at T?' from the same event log the connector "
    "publishes (reference semantics: the NATS stream IS the replayable "
    "log; internal/mongo/client.go:211). The ts predicate reaches the "
    "parquet scan (time-partitioned logs prune whole files), then one "
    "shuffle on the key — identical cost shape to latest-state compaction "
    "at any scale.",
)
def cdc_apply_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mongodb_nats_connector_spark.operators.cdc import latest_state_per_key

    ev = table(spark, sf_dir, "events").filter(
        F.col("ts") <= F.lit(ASOF_SNAPSHOT_TS).cast("timestamp")
    )
    return latest_state_per_key(ev)


# ---------------------------------------------------------------------------
# cdc_offset_gap_detect — per-subject offset-sequence continuity audit
# ---------------------------------------------------------------------------


@register(
    "cdc_offset_gap_detect",
    oracle="""
    WITH seq AS (
      SELECT event_type, event_id,
             lag(event_id) OVER (PARTITION BY event_type
                                 ORDER BY event_id) AS prev_id
      FROM events
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_msgs,
           CAST(sum(CASE WHEN event_id - prev_id > 1 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_gaps,
           CAST(max(event_id - prev_id - 1) AS BIGINT) AS max_gap,
           CAST(sum(CASE WHEN prev_id IS NOT NULL
                         THEN event_id - prev_id - 1 ELSE 0 END)
                AS BIGINT) AS missing_between,
           CAST(max(event_id) AS BIGINT) AS last_offset
    FROM seq GROUP BY event_type
    """,
    doc="Offset-sequence continuity audit, per subject: the check a "
    "change-stream consumer runs to prove it missed nothing. Events carry a "
    "globally monotone id (the resume-token analogue); within each "
    "subject's stream (subject = event_type, mirroring the connector's "
    "per-collection subject routing, internal/server/connector.go "
    "DefaultSubjectFn) the audit reports gap count, widest gap, total ids "
    "skipped between consecutive deliveries, and the last committed "
    "offset. Gaps between subjects are EXPECTED (other subjects' ids); a "
    "consumer compares missing_between across its own subscription set to "
    "detect real loss. The window partitions by subject — exactly the "
    "parallelism the connector's per-collection ordering guarantee "
    "provides, so no global sort exists at any scale.",
)
def cdc_offset_gap_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("event_id")
    seq = ev.select(
        "event_type",
        "event_id",
        F.lag("event_id").over(w).alias("prev_id"),
    )
    delta = F.col("event_id") - F.col("prev_id")
    return seq.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_msgs"),
        F.sum(F.when(delta > 1, 1).otherwise(0)).cast("bigint").alias("n_gaps"),
        F.max(delta - 1).cast("bigint").alias("max_gap"),
        F.sum(
            F.when(F.col("prev_id").isNotNull(), delta - 1).otherwise(0)
        )
        .cast("bigint")
        .alias("missing_between"),
        F.max("event_id").cast("bigint").alias("last_offset"),
    )


# ---------------------------------------------------------------------------
# agg_bitmap_distinct — exact count-distinct via chunked 64-bit bitmaps
# ---------------------------------------------------------------------------

BITMAP_CHUNK_BITS = 63  # bits 0..62 only: identical two's-complement-free
# semantics in Spark and DuckDB (bit 63 would flip the BIGINT sign)


@register(
    "agg_bitmap_distinct",
    oracle=f"""
    WITH chunks AS (
      SELECT event_type, user_id // {BITMAP_CHUNK_BITS} AS bucket,
             bit_or(CAST(1 AS BIGINT)
                    << CAST(user_id % {BITMAP_CHUNK_BITS} AS INT)) AS bm
      FROM events
      WHERE user_id >= 0
      GROUP BY 1, 2
    )
    SELECT event_type,
           CAST(sum(bit_count(bm)) AS BIGINT) AS n_users,
           CAST(count(*) AS BIGINT) AS n_buckets
    FROM chunks GROUP BY event_type
    """,
    doc="EXACT distributed count-distinct via chunked bitmaps — the "
    "warehouse-standard alternative to ``agg_count_distinct``'s "
    "expand-every-value shuffle when the key domain is dense integers: "
    f"each (group, id DIV {BITMAP_CHUNK_BITS}) chunk ORs the id's bit into "
    "a single BIGINT, so map-side partial aggregation collapses every "
    "occurrence of a chunk to 8 bytes before the exchange, and the final "
    "count is sum(bit_count(chunk)). Shuffled bytes are proportional to "
    "the DISTINCT population (one long per 63 ids), not to row count — at "
    "100 TB with billions of duplicate key references this is orders of "
    "magnitude less exchange than exact count-distinct, with none of "
    "HLL's error. Chunks use bits 0..62 so the two's-complement sign bit "
    "never differs between engines; ids must be nonnegative (filtered explicitly, NULLs drop with them).",
)
def agg_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    # the bitmap contract requires dense NONNEGATIVE ids: a negative id
    # would shift by a negative count (engine-divergent: Spark masks the
    # count, DuckDB errors) and a NULL id would create a phantom NULL
    # bucket inflating n_buckets — filter both out explicitly (NULL fails
    # >= 0 too), mirrored in the oracle
    ev = ev.filter(F.col("user_id") >= 0)
    chunks = ev.select(
        "event_type",
        F.expr(f"user_id DIV {BITMAP_CHUNK_BITS}").alias("bucket"),
        F.expr(
            f"shiftleft(CAST(1 AS BIGINT), "
            f"CAST(user_id % {BITMAP_CHUNK_BITS} AS INT))"
        ).alias("bit"),
    ).groupBy("event_type", "bucket").agg(F.bit_or("bit").alias("bm"))
    return chunks.groupBy("event_type").agg(
        F.sum(F.bit_count("bm")).cast("bigint").alias("n_users"),
        F.count(F.lit(1)).cast("bigint").alias("n_buckets"),
    )
