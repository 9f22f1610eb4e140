"""Corpus-statistics operators round 4: information-theoretic quality
signals used by LLM training-data curation pipelines.

- per-document word entropy (low entropy == repetitive/templated text —
  the Shannon complement of the Gopher repetition ratios)
- corpus Zipf slope (rank-frequency log-log regression; natural corpora
  sit near -1, synthetic/spammy ones flatten)
- vocabulary OOV coverage against a corpus-derived top-k vocab (the cheap
  proxy for tokenizer coverage before a BPE run)
- per-document KL divergence from the corpus unigram distribution (the
  DSIR/CCNet-style importance signal for domain filtering)
- language-ID confusion matrix (labeled vs predicted agreement — the QA
  step after any heuristic classifier)

All are two-phase aggregations: one shuffle on (doc_id, word) or (word),
then a broadcast of the tiny corpus-level relation (vocab / totals) back to
the per-doc pass. No Python rows; entropy/KL use the sum(c*ln c) identity so
each engine folds floats in an order-insensitive exact-sum-of-counts form
first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mongodb_nats_connector_spark.operators.text import LANG_MARKERS, _occ_sql, _occurrences
from mongodb_nats_connector_spark.plans.caching import persist_until_collected
from mongodb_nats_connector_spark.plans.hints import maybe_broadcast
from mongodb_nats_connector_spark.registry import register
from mongodb_nats_connector_spark.sources.tables import table


def _doc_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("word")
    )


@register(
    "text_word_entropy",
    oracle="""
    WITH tf AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS word
      FROM documents
    ),
    counts AS (
      SELECT doc_id, word, CAST(count(*) AS BIGINT) AS c
      FROM tf GROUP BY 1, 2
    )
    SELECT doc_id,
           CAST(sum(c) AS BIGINT) AS n_tokens,
           CAST(count(*) AS BIGINT) AS n_distinct,
           round(ln(sum(c)) - sum(c * ln(c)) / sum(c), 4) AS entropy_nats
    FROM counts
    GROUP BY doc_id
    """,
    doc="Per-document Shannon entropy of the word distribution via the "
    "H = ln(n) - sum(c ln c)/n identity — one (doc,word) shuffle, one "
    "(doc) shuffle, both partial-aggregated. Low entropy flags templated/"
    "repetitive documents.",
)
def text_word_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    counts = (
        _doc_words(spark, sf_dir)
        .groupBy("doc_id", "word")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    n = F.sum("c")
    return counts.groupBy("doc_id").agg(
        n.cast("bigint").alias("n_tokens"),
        F.count(F.lit(1)).cast("bigint").alias("n_distinct"),
        F.round(F.log(n) - F.sum(F.col("c") * F.log("c")) / n, 4).alias(
            "entropy_nats"
        ),
    )


@register(
    "text_zipf_slope",
    oracle="""
    WITH freq AS (
      SELECT word, CAST(count(*) AS BIGINT) AS c
      FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents) t
      GROUP BY word
    ),
    ranked AS (
      SELECT c, row_number() OVER (ORDER BY c DESC, word) AS rank
      FROM freq
    )
    SELECT round(regr_slope(ln(c), ln(rank)), 4) AS zipf_slope,
           round(regr_intercept(ln(c), ln(rank)), 4) AS zipf_intercept,
           CAST(count(*) AS BIGINT) AS vocab_size
    FROM ranked
    """,
    doc="Corpus Zipf slope: log-log regression of word frequency on rank "
    "(row_number with a deterministic tie-break). The regression runs over "
    "the vocabulary relation — tiny at any corpus scale; the only wide "
    "shuffle is the word count.",
)
def text_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    freq = (
        _doc_words(spark, sf_dir)
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    ranked = freq.withColumn(
        "rank", F.row_number().over(Window.orderBy(F.col("c").desc(), "word"))
    )
    return ranked.agg(
        F.expr("round(regr_slope(ln(c), ln(rank)), 4)").alias("zipf_slope"),
        F.expr("round(regr_intercept(ln(c), ln(rank)), 4)").alias("zipf_intercept"),
        F.count(F.lit(1)).cast("bigint").alias("vocab_size"),
    )


VOCAB_K = 20


@register(
    "text_vocab_coverage",
    oracle=f"""
    WITH tf AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS word
      FROM documents
    ),
    vocab AS (
      SELECT word
      FROM (SELECT word, row_number() OVER (ORDER BY count(*) DESC, word) AS r
            FROM tf GROUP BY word)
      WHERE r <= {VOCAB_K}
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(sum(CASE WHEN vocab.word IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_oov,
           sum(CASE WHEN vocab.word IS NULL THEN 1.0 ELSE 0.0 END) / count(*)
             AS oov_rate
    FROM tf LEFT JOIN vocab ON tf.word = vocab.word
    GROUP BY doc_id
    """,
    doc=f"Vocabulary coverage: build a top-{VOCAB_K} corpus vocab "
    "(deterministic tie-break), broadcast it, and score each document's "
    "out-of-vocabulary token rate — the pre-tokenizer coverage check. The "
    "vocab is a broadcast hash join probe; tokens never shuffle for the "
    "membership test.",
)
def text_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    tf = _doc_words(spark, sf_dir)
    vocab = (
        tf.groupBy("word")
        .agg(F.count(F.lit(1)).alias("c"))
        .withColumn("r", F.row_number().over(Window.orderBy(F.col("c").desc(), "word")))
        .filter(F.col("r") <= VOCAB_K)
        .select(F.col("word").alias("v_word"))
    )
    joined = tf.join(
        F.broadcast(vocab), tf["word"] == vocab["v_word"], "left"
    )
    oov = F.when(F.col("v_word").isNull(), 1).otherwise(0)
    return joined.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
        F.sum(oov).cast("bigint").alias("n_oov"),
        (F.sum(oov.cast("double")) / F.count(F.lit(1))).alias("oov_rate"),
    )


@register(
    "text_kl_divergence",
    oracle="""
    WITH tf AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS word
      FROM documents
    ),
    doc_counts AS (
      SELECT doc_id, word, CAST(count(*) AS BIGINT) AS c
      FROM tf GROUP BY 1, 2
    ),
    corpus AS (
      SELECT word, CAST(sum(c) AS BIGINT) AS cc
      FROM doc_counts GROUP BY word
    ),
    totals AS (SELECT sum(cc) AS total FROM corpus),
    with_n AS (
      SELECT doc_id, word, c,
             sum(c) OVER (PARTITION BY doc_id) AS n_doc
      FROM doc_counts
    )
    SELECT doc_id,
           CAST(sum(c) AS BIGINT) AS n_tokens,
           round(sum((c * 1.0 / n_doc)
               * ln((c * 1.0 / n_doc) / (cc * 1.0 / total))), 4) AS kl_nats
    FROM with_n JOIN corpus USING (word), totals
    GROUP BY doc_id
    """,
    doc="Per-document KL divergence from the corpus unigram distribution "
    "(DSIR/CCNet-style domain-shift signal). Spark plan: per-doc counts "
    "(one shuffle), corpus distribution derived from them (word shuffle on "
    "the already-reduced relation), broadcast corpus probabilities back, "
    "window-sum for per-doc totals on the same doc partitioning.",
)
def text_kl_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    doc_counts = (
        _doc_words(spark, sf_dir)
        .groupBy("doc_id", "word")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    corpus = doc_counts.groupBy("word").agg(F.sum("c").alias("cc"))
    total = corpus.agg(F.sum("cc").alias("total"))
    corpus_p = corpus.join(F.broadcast(total)).select(
        F.col("word").alias("c_word"), (F.col("cc") / F.col("total")).alias("p_corpus")
    )
    n_doc = F.sum("c").over(Window.partitionBy("doc_id"))
    scored = (
        doc_counts.withColumn("n_doc", n_doc)
        .join(maybe_broadcast(corpus_p), F.col("word") == F.col("c_word"))
        .withColumn("p_doc", F.col("c") / F.col("n_doc"))
    )
    return persist_until_collected(
        doc_counts,
        scored.groupBy("doc_id").agg(
            F.sum("c").cast("bigint").alias("n_tokens"),
            F.round(
                F.sum(F.col("p_doc") * F.log(F.col("p_doc") / F.col("p_corpus"))),
                4,
            ).alias("kl_nats"),
        ),
    )


def _confusion_oracle() -> str:
    scores = ", ".join(
        f"CAST({_occ_sql(m)} AS BIGINT) AS s_{code}" for code, m in LANG_MARKERS
    )
    all_scores = ", ".join(f"s_{code}" for code, _ in LANG_MARKERS)
    case = " ".join(
        f"WHEN s_{code} >= greatest({all_scores}) THEN '{code}'"
        for code, _ in LANG_MARKERS
    )
    return f"""
    WITH scored AS (SELECT lang AS labeled_lang, {scores} FROM documents),
    pred AS (SELECT labeled_lang, CASE {case} END AS predicted_lang FROM scored)
    SELECT labeled_lang, predicted_lang,
           CAST(count(*) AS BIGINT) AS n_docs
    FROM pred
    GROUP BY 1, 2
    """


@register(
    "text_langid_confusion",
    oracle=_confusion_oracle(),
    doc="Language-ID confusion matrix: the text_langid heuristic's "
    "predictions aggregated against the labeled lang column — (labeled, "
    "predicted) doc counts. Map-only scoring, one tiny-key shuffle.",
)
def text_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    scored = docs.select(
        F.col("lang").alias("labeled_lang"),
        *[
            _occurrences(F.col("text"), m).cast("bigint").alias(f"s_{code}")
            for code, m in LANG_MARKERS
        ],
    )
    best = F.greatest(*[F.col(f"s_{code}") for code, _ in LANG_MARKERS])
    pred = F.when(F.col(f"s_{LANG_MARKERS[0][0]}") >= best, LANG_MARKERS[0][0])
    for code, _ in LANG_MARKERS[1:]:
        pred = pred.when(F.col(f"s_{code}") >= best, code)
    return (
        scored.withColumn("predicted_lang", pred)
        .groupBy("labeled_lang", "predicted_lang")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
    )


PAIR_TOPK = 50


@register(
    "bpe_pair_counts",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ),
    pairs AS (
      SELECT t[i] AS w1, t[i + 1] AS w2
      FROM toks, unnest(range(1, len(t))) u(i)
      WHERE len(t) >= 2
    )
    SELECT w1, w2, CAST(count(*) AS BIGINT) AS pair_count
    FROM pairs
    GROUP BY w1, w2
    ORDER BY pair_count DESC, w1, w2
    LIMIT {PAIR_TOPK}
    """,
    doc=f"Adjacent-pair frequencies — the counting step of one BPE merge "
    "iteration (the inner loop of tokenizer training). Pair extraction is a "
    "map-side transform over the token array (no per-row Python, no "
    "self-join on position); the only shuffle is the (w1, w2) count, "
    f"partial-aggregated map-side, then a top-{PAIR_TOPK} "
    "TakeOrderedAndProject — per-partition heads merged on the driver, "
    "never a global sort.",
)
def bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents", parallel=True)
    toks = F.split("text", " ")
    pairs = docs.select(
        F.explode(
            # adjacent pairs via zip_with over two shifted slices — same
            # pairs, same order, ~8x cheaper than sequence+element_at
            F.zip_with(
                F.slice(toks, 1, F.size(toks) - 1),
                F.slice(toks, 2, F.size(toks) - 1),
                lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
            )
        ).alias("p")
    ).filter(F.size(toks) >= 2)
    return (
        pairs.select("p.w1", "p.w2")
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).cast("bigint").alias("pair_count"))
        .orderBy(F.col("pair_count").desc(), "w1", "w2")
        .limit(PAIR_TOPK)
    )


@register(
    "bigram_lm_surprisal",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ),
    inst AS (
      SELECT doc_id, t[i] AS w1, t[i + 1] AS w2
      FROM toks, unnest(range(1, len(t))) u(i)
      WHERE len(t) >= 2
    ),
    corpus_bg AS (
      SELECT w1, w2, CAST(count(*) AS BIGINT) AS c2
      FROM inst GROUP BY w1, w2
    ),
    corpus_left AS (
      SELECT w1, CAST(sum(c2) AS BIGINT) AS c1
      FROM corpus_bg GROUP BY w1
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_bigrams,
           round(avg(-ln(b.c2 * 1.0 / l.c1)), 4) AS avg_surprisal_nats
    FROM inst d
    JOIN corpus_bg b USING (w1, w2)
    JOIN corpus_left l USING (w1)
    GROUP BY doc_id
    """,
    doc="Per-document average surprisal under the corpus bigram MLE model "
    "-ln C(w1,w2)/C(w1·) — the n-gram-LM quality score (documents that the "
    "corpus model finds surprising are outliers/noise). Plan: bigram "
    "instances are map-only (explode); the corpus model reduces them with "
    "map-side combine on (w1, w2) — the only shuffle proportional to the "
    "model, not the corpus; c1 folds into the model by a window over the "
    "already-tiny aggregate. Scoring joins the broadcast model back to the "
    "instance stream and aggregates once on doc_id, so the corpus-sized "
    "data shuffles only as per-doc partial rows. At trillion-token scale "
    "with an unpruned model, drop the broadcast and let the co-partitioned "
    "(w1, w2) shuffle join run instead.",
)
def bigram_lm_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents", parallel=True)
    toks = F.split("text", " ")
    inst = (
        docs.select(
            "doc_id",
            F.explode(
                # adjacent pairs via zip_with over two shifted slices —
                # same pairs, same order, ~8x cheaper than
                # sequence+element_at
                F.zip_with(
                    F.slice(toks, 1, F.size(toks) - 1),
                    F.slice(toks, 2, F.size(toks) - 1),
                    lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
                )
            ).alias("p"),
        )
        .filter(F.size(toks) >= 2)
        .select("doc_id", "p.w1", "p.w2")
    )
    corpus_bg = inst.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).cast("bigint").alias("c2")
    )
    model = corpus_bg.withColumn(
        "c1", F.sum("c2").over(Window.partitionBy("w1")).cast("bigint")
    )
    scored = inst.join(maybe_broadcast(model), ["w1", "w2"])
    return persist_until_collected(
        inst,
        scored.groupBy("doc_id").agg(
            F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
            F.round(F.avg(-F.log(F.col("c2") / F.col("c1"))), 4).alias(
                "avg_surprisal_nats"
            ),
        ),
    )


FUZZY_MIN_LEN = 4


@register(
    "fuzzy_join_blocked",
    oracle=f"""
    WITH words AS (
      SELECT DISTINCT unnest(string_split(p_name, ' ')) AS w FROM part
    ),
    misspells AS (
      SELECT DISTINCT substr(w, 1, 1) || substr(w, 3) AS m
      FROM words WHERE length(w) >= {FUZZY_MIN_LEN}
    ),
    blocked AS (
      SELECT m.m, w.w, levenshtein(m.m, w.w) AS dist
      FROM misspells m JOIN words w
        ON substr(m.m, 1, 1) = substr(w.w, 1, 1)
       AND abs(length(m.m) - length(w.w)) <= 1
    )
    SELECT m, w AS matched_word, CAST(dist AS INT) AS dist
    FROM blocked
    WHERE dist <= 1
    """,
    doc="Blocked fuzzy join (spell-correction / entity-resolution shape): "
    "probe strings (deterministic char-deletion misspellings of the part-"
    "name lexicon) matched to lexicon words within Levenshtein 1, blocked "
    "on (first char, ±1 length band) so Levenshtein only evaluates inside "
    "blocks — never the full cross product. The block join is an equi-join "
    "on the first-char key with a length-band residual; recall is exact for "
    "this edit class (deletions at position ≥ 2 preserve the first char). "
    "Both relations are DISTINCT lexicons — dimension-sized, so at 100 TB "
    "the blocks broadcast.",
)
def fuzzy_join_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = table(spark, sf_dir, "part")
    words = (
        part.select(F.explode(F.split("p_name", " ")).alias("w")).distinct()
    )
    misspells = (
        words.filter(F.length("w") >= FUZZY_MIN_LEN)
        .select(
            F.concat(
                F.substring("w", 1, 1), F.expr("substr(w, 3)")
            ).alias("m")
        )
        .distinct()
    )
    blocked = misspells.join(
        maybe_broadcast(words),
        (F.substring("m", 1, 1) == F.substring("w", 1, 1))
        & (F.abs(F.length("m") - F.length("w")) <= 1),
    ).withColumn("dist", F.levenshtein("m", "w"))
    return persist_until_collected(
        words,
        blocked.filter(F.col("dist") <= 1).select(
            "m",
            F.col("w").alias("matched_word"),
            F.col("dist").cast("int").alias("dist"),
        ),
    )
