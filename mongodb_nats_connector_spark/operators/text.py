"""Text analysis operators over the `documents` table.

Language-ID, quality scoring, token counting and fingerprinting are all pure
SQL expressions (regexp / string / higher-order functions) — JVM-side, fully
pushdown-friendly, no Python per row. Each has an exact DuckDB oracle built
from the same arithmetic so the comparison is deterministic.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from mongodb_nats_connector_spark.functions.texthash import hashed_ngram_tuples
from mongodb_nats_connector_spark.plans.hints import maybe_broadcast
from mongodb_nats_connector_spark.registry import register
from mongodb_nats_connector_spark.sources.tables import table

# marker word per language for the n-gram/occurrence language-ID heuristic;
# ties resolve in this priority order (deterministic argmax).
LANG_MARKERS = [
    ("en", "the"),
    ("de", "scan"),
    ("es", "data"),
    ("fr", "join"),
    ("zh", "stream"),
]


def _occurrences(text: Column, needle: str) -> Column:
    """Occurrence count via the length-difference trick (portable to SQL)."""
    return (F.length(text) - F.length(F.replace(text, F.lit(needle), F.lit("")))) / len(
        needle
    )


def _occ_sql(needle: str) -> str:
    return f"(length(text) - length(replace(text, '{needle}', ''))) / {len(needle)}"


@register(
    "text_stats",
    oracle="""
    SELECT doc_id,
           CAST(length(text) AS BIGINT) AS n_chars_calc,
           CAST(len(string_split(text, ' ')) AS INT) AS n_words,
           round(length(replace(text, ' ', '')) * 1.0
                 / len(string_split(text, ' ')), 4) AS avg_word_len,
           CAST(length(regexp_replace(text, '[^aeiou]', '', 'g')) AS BIGINT) AS n_vowels
    FROM documents
    """,
    doc="Quality-scoring statistics: char/word counts, average word length, "
    "vowel count (all codegen'd string expressions).",
)
def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    words = F.split("text", " ")
    return docs.select(
        "doc_id",
        F.length("text").cast("bigint").alias("n_chars_calc"),
        F.size(words).alias("n_words"),
        F.round(
            F.length(F.replace(F.col("text"), F.lit(" "), F.lit(""))) / F.size(words), 4
        ).alias("avg_word_len"),
        F.length(F.regexp_replace("text", "[^aeiou]", "")).cast("bigint").alias("n_vowels"),
    )


def _langid_oracle() -> str:
    scores = ", ".join(
        f"CAST({_occ_sql(m)} AS BIGINT) AS s_{code}" for code, m in LANG_MARKERS
    )
    all_scores = ", ".join(f"s_{code}" for code, _ in LANG_MARKERS)
    case = " ".join(
        f"WHEN s_{code} >= greatest({all_scores}) THEN '{code}'"
        for code, _ in LANG_MARKERS
    )
    return f"""
    WITH scored AS (SELECT doc_id, lang AS labeled_lang, {scores} FROM documents)
    SELECT doc_id, labeled_lang, CASE {case} END AS predicted_lang, {all_scores}
    FROM scored
    """


@register(
    "text_langid",
    oracle=_langid_oracle(),
    doc="Language-ID n-gram heuristic: per-language marker occurrence scores "
    "with a deterministic priority-ordered argmax.",
)
def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    scored = docs.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        *[
            _occurrences(F.col("text"), m).cast("bigint").alias(f"s_{code}")
            for code, m in LANG_MARKERS
        ],
    )
    best = F.greatest(*[F.col(f"s_{code}") for code, _ in LANG_MARKERS])
    # CASE in priority order — first language reaching the max wins
    pred = F.when(F.col(f"s_{LANG_MARKERS[0][0]}") >= best, LANG_MARKERS[0][0])
    for code, _ in LANG_MARKERS[1:]:
        pred = pred.when(F.col(f"s_{code}") >= best, code)
    return scored.select(
        "doc_id",
        "labeled_lang",
        pred.alias("predicted_lang"),
        *[f"s_{code}" for code, _ in LANG_MARKERS],
    )


@register(
    "text_token_count",
    oracle="""
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS INT) AS n_ws_tokens,
           CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS INT)
             AS n_bpe_ish_tokens
    FROM documents
    """,
    doc="Token counting: whitespace tokens + a BPE-ish regex tokenizer "
    "(letter runs / digit runs / single punctuation).",
)
def text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.size(F.split("text", " ")).alias("n_ws_tokens"),
        F.size(F.expr("regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]', 0)")).alias(
            "n_bpe_ish_tokens"
        ),
    )


@register(
    "text_fingerprint",
    oracle="""
    SELECT doc_id,
           list_reduce(
             list_transform(range(length(text)), i -> CAST(unicode(text[i+1]) AS BIGINT)),
             (acc, x) -> (acc * 31 + x) % 1000000007) AS fingerprint
    FROM documents
    """,
    doc="Document fingerprinting: polynomial rolling hash over character "
    "codes, acc = (acc*31 + code) mod 1e9+7 — identical sequential fold on "
    "both engines.",
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents", parallel=True)
    # One split('') pass instead of transform(sequence) + substr(i, 1) per
    # position: substr on UTF8String seeks from byte 0 counting chars, so
    # the indexed form is O(len^2) per document; split is one linear scan.
    # ascii(char) == ascii(substr(text, i, 1)) at every position (same
    # codepoint), split('') yields [] for '' (the old sequence(1,0) fold
    # also lands on 0), and both forms are null-propagating — bit-compared
    # on the full sf0.1 corpus: 0 differing rows.
    codes = F.transform(F.split("text", ""), F.ascii)
    fp = F.aggregate(
        codes,
        F.lit(0).cast("bigint"),
        lambda acc, x: (acc * 31 + x.cast("bigint")) % 1000000007,
    )
    return docs.select("doc_id", fp.alias("fingerprint"))


STOPWORDS = ["the", "a", "and", "of", "to", "in"]


@register(
    "text_stopword_filter",
    oracle=f"""
    SELECT doc_id,
           CAST(len(list_filter(string_split(text, ' '),
                    w -> NOT list_contains({STOPWORDS!r}, w))) AS INT)
             AS n_content_words,
           CAST(len(string_split(text, ' ')) AS INT) AS n_words
    FROM documents
    """,
    doc="Stopword removal: higher-order filter against a broadcast-literal "
    "stoplist; counts content words per document.",
)
def text_stopword_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    stop = F.array(*[F.lit(w) for w in STOPWORDS])
    words = F.split("text", " ")
    content = F.filter(words, lambda w: ~F.array_contains(stop, w))
    return docs.select(
        "doc_id",
        F.size(content).alias("n_content_words"),
        F.size(words).alias("n_words"),
    )


@register(
    "text_tfidf",
    oracle="""
    WITH w AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
    ), tf AS (
      SELECT doc_id, word, count(*) AS tf FROM w GROUP BY doc_id, word
    ), df AS (
      SELECT word, CAST(count(DISTINCT doc_id) AS BIGINT) AS df FROM w GROUP BY word
    ), n AS (
      SELECT count(*) AS n_docs FROM documents
    )
    SELECT tf.doc_id, tf.word, CAST(tf.tf AS BIGINT) AS tf, df.df,
           round(tf.tf * (ln((n.n_docs + 1.0) / (df.df + 1.0)) + 1.0), 6) AS tfidf
    FROM tf JOIN df USING (word) CROSS JOIN n
    """,
    doc="TF-IDF from first principles as pure DataFrame ops (explode -> two "
    "aggregations -> broadcast joins): term frequency per doc, smoothed "
    "inverse document frequency, product. Unlike HashingTF this is exactly "
    "checkable; the shuffle keys are (doc,word) and (word).",
)
def text_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents", parallel=True)
    w = docs.select("doc_id", F.explode(F.split("text", " ")).alias("word"))
    tf = w.groupBy("doc_id", "word").agg(F.count(F.lit(1)).alias("tf"))
    df = w.groupBy("word").agg(F.countDistinct("doc_id").alias("df"))
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    tfidf = F.col("tf") * (
        F.log((F.col("n_docs") + 1.0) / (F.col("df") + 1.0)) + 1.0
    )
    return (
        tf.join(maybe_broadcast(df), "word")
        .crossJoin(F.broadcast(n_docs))
        .select("doc_id", "word", "tf", "df", F.round(tfidf, 6).alias("tfidf"))
    )


# fixed stopword list for the quality heuristic (mirrored verbatim in SQL)
QUALITY_STOPWORDS = ["the", "of", "and", "to", "in", "a", "is", "it", "for", "on"]


@register(
    "text_quality",
    oracle=f"""
    WITH s AS (
      SELECT doc_id,
             string_split(text, ' ') AS words,
             length(regexp_replace(text, '[a-zA-Z0-9 ]', '', 'g')) AS n_punct,
             length(text) AS n_chars
      FROM documents
    )
    SELECT doc_id,
           CAST(len(words) AS INT) AS n_words,
           round(n_punct * 1.0 / n_chars, 4) AS punct_ratio,
           round(len(list_filter(words,
                 w -> list_contains({QUALITY_STOPWORDS!r}, lower(w)))) * 1.0
                 / len(words), 4) AS stopword_ratio,
           round(0.01 * len(words)
                 + len(list_filter(words,
                       w -> list_contains({QUALITY_STOPWORDS!r}, lower(w)))) * 1.0
                   / len(words)
                 - n_punct * 1.0 / n_chars, 4) AS quality_score
    FROM s
    """,
    doc="Document quality scoring: word count, punctuation ratio, stopword "
    "ratio, and a linear composite score — the usual pre-training corpus "
    "filters (C4/Gopher-style heuristics), all codegen'd expressions with "
    "an exact SQL mirror.",
)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    words = F.split("text", " ")
    stop_arr = F.array(*[F.lit(w) for w in QUALITY_STOPWORDS])
    n_stop = F.size(F.filter(words, lambda w: F.array_contains(stop_arr, F.lower(w))))
    punct_ratio = F.length(F.regexp_replace("text", "[a-zA-Z0-9 ]", "")) / F.length("text")
    stop_ratio = n_stop / F.size(words)
    return docs.select(
        "doc_id",
        F.size(words).alias("n_words"),
        F.round(punct_ratio, 4).alias("punct_ratio"),
        F.round(stop_ratio, 4).alias("stopword_ratio"),
        F.round(0.01 * F.size(words) + stop_ratio - punct_ratio, 4).alias("quality_score"),
    )


# ---------------------------------------------------------------------------
# Round 3: chunking, PII scrubbing, repetition-based quality
# ---------------------------------------------------------------------------

CHUNK_TOKENS = 32  # tokens per training chunk
CHUNK_STRIDE = 24  # stride between chunk starts (overlap = 8)


@register(
    "text_chunk_tokens",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS toks FROM documents
    ), c AS (
      SELECT doc_id, toks,
             unnest(range(0,
               CAST(floor((len(toks) - 1) / {CHUNK_STRIDE}) AS BIGINT) + 1))
               AS chunk_id
      FROM t
    )
    SELECT doc_id, CAST(chunk_id AS INT) AS chunk_id,
           CAST(len(toks[chunk_id*{CHUNK_STRIDE}+1 :
                        chunk_id*{CHUNK_STRIDE}+{CHUNK_TOKENS}]) AS INT)
             AS n_chunk_tokens,
           array_to_string(toks[chunk_id*{CHUNK_STRIDE}+1 :
                                chunk_id*{CHUNK_STRIDE}+{CHUNK_TOKENS}], ' ')
             AS chunk_text
    FROM c
    """,
    doc="Sliding-window document chunking for training-sequence prep: "
    f"{CHUNK_TOKENS}-token windows every {CHUNK_STRIDE} tokens (8-token "
    "overlap), one output row per chunk. Tokenize + explode + slice are all "
    "JVM expressions — map-side only, no shuffle: each input split chunks "
    "independently, so the plan is embarrassingly parallel at any scale.",
)
def text_chunk_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents", parallel=True)
    toks = F.split("text", " ")
    n_chunks = F.floor((F.size(toks) - 1) / CHUNK_STRIDE) + 1
    with_ids = docs.select(
        "doc_id",
        toks.alias("toks"),
        F.explode(F.sequence(F.lit(0), (n_chunks - 1).cast("int"))).alias("chunk_id"),
    )
    sliced = F.slice(
        F.col("toks"), F.col("chunk_id") * CHUNK_STRIDE + 1, CHUNK_TOKENS
    )
    return with_ids.select(
        "doc_id",
        F.col("chunk_id").cast("int").alias("chunk_id"),
        F.size(sliced).alias("n_chunk_tokens"),
        F.array_join(sliced, " ").alias("chunk_text"),
    )


# RE2- and Java-regex-compatible patterns (no backrefs / lookaround)
PII_EMAIL = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"
PII_PHONE = r"[0-9][0-9() -]{6,}[0-9]"


@register(
    "text_pii_scrub",
    oracle=f"""
    WITH withpii AS (
      -- the corpus itself is synthetic prose; append deterministic PII so
      -- the scrubber has real work on every row
      SELECT doc_id,
             text || ' contact user' || CAST(doc_id AS VARCHAR)
                  || '@example.com or 555-01' || CAST(doc_id % 100 AS VARCHAR)
                  || '-' || CAST(1000 + doc_id % 9000 AS VARCHAR) AS text
      FROM documents
    )
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '{PII_EMAIL}')) AS INT)
             AS n_emails,
           CAST(len(regexp_extract_all(
                 regexp_replace(text, '{PII_EMAIL}', '<EMAIL>', 'g'),
                 '{PII_PHONE}')) AS INT) AS n_phones,
           regexp_replace(
             regexp_replace(text, '{PII_EMAIL}', '<EMAIL>', 'g'),
             '{PII_PHONE}', '<PHONE>', 'g') AS scrubbed
    FROM withpii
    """,
    doc="PII scrubbing: email + phone regex redaction with per-doc match "
    "counts (emails first so phone-like digit runs inside addresses don't "
    "double-count). Pure regexp expressions — map-only, pattern dialect "
    "restricted to the RE2/Java common subset so Spark and the oracle "
    "agree. At 100 TB this is the standard streaming-safe scrub pass.",
)
def text_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    withpii = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com or 555-01"),
            (F.col("doc_id") % 100).cast("string"),
            F.lit("-"),
            (F.lit(1000) + F.col("doc_id") % 9000).cast("string"),
        ).alias("text"),
    )
    no_email = F.regexp_replace("text", PII_EMAIL, "<EMAIL>")
    return withpii.select(
        "doc_id",
        F.size(F.regexp_extract_all("text", F.lit(PII_EMAIL), 0)).alias("n_emails"),
        F.size(F.regexp_extract_all(no_email, F.lit(PII_PHONE), 0)).alias("n_phones"),
        F.regexp_replace(no_email, PII_PHONE, "<PHONE>").alias("scrubbed"),
    )


@register(
    "text_repetition_quality",
    oracle="""
    WITH w AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
    ), counts AS (
      SELECT doc_id, word, count(*) AS cnt FROM w GROUP BY doc_id, word
    ), ranked AS (
      SELECT doc_id, word, cnt,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY cnt DESC, word ASC) AS rn,
             sum(cnt) OVER (PARTITION BY doc_id) AS n_words,
             count(*) OVER (PARTITION BY doc_id) AS n_distinct
      FROM counts
    )
    SELECT doc_id, CAST(n_words AS BIGINT) AS n_words,
           CAST(n_distinct AS BIGINT) AS n_distinct_words,
           word AS top_word,
           round(cnt * 1.0 / n_words, 4) AS top_word_ratio,
           round(n_distinct * 1.0 / n_words, 4) AS distinct_ratio,
           CAST(CASE WHEN cnt * 1.0 / n_words <= 0.2
                      AND n_distinct * 1.0 / n_words >= 0.3
                     THEN 1 ELSE 0 END AS BIGINT) AS keep
    FROM ranked WHERE rn = 1
    """,
    doc="Repetition-based quality filter (Gopher-style): most-frequent-word "
    "ratio and distinct-word ratio per document, with the keep/drop "
    "decision. Explode -> count -> per-doc window; the shuffle key is "
    "(doc_id, word) then doc_id — both fine-grained, so the plan holds at "
    "100 TB (no giant groups: a document's vocabulary bounds its rows).",
)
def text_repetition_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    docs = table(spark, sf_dir, "documents")
    w = docs.select("doc_id", F.explode(F.split("text", " ")).alias("word"))
    counts = w.groupBy("doc_id", "word").agg(F.count(F.lit(1)).alias("cnt"))
    byid = Window.partitionBy("doc_id")
    ranked = counts.select(
        "doc_id",
        "word",
        "cnt",
        F.row_number()
        .over(byid.orderBy(F.desc("cnt"), F.asc("word")))
        .alias("rn"),
        F.sum("cnt").over(byid).alias("n_words"),
        F.count(F.lit(1)).over(byid).alias("n_distinct"),
    ).filter(F.col("rn") == 1)
    top_ratio = F.col("cnt") / F.col("n_words")
    distinct_ratio = F.col("n_distinct") / F.col("n_words")
    return ranked.select(
        "doc_id",
        F.col("n_words").cast("bigint").alias("n_words"),
        F.col("n_distinct").cast("bigint").alias("n_distinct_words"),
        F.col("word").alias("top_word"),
        F.round(top_ratio, 4).alias("top_word_ratio"),
        F.round(distinct_ratio, 4).alias("distinct_ratio"),
        ((top_ratio <= 0.2) & (distinct_ratio >= 0.3))
        .cast("bigint")
        .alias("keep"),
    )


NGRAM_TOP_K = 20


@register(
    "text_ngram_topk",
    oracle=f"""
    WITH w AS (
      SELECT string_split(text, ' ') AS toks FROM documents
    ), grams AS (
      SELECT toks[i+1] || ' ' || toks[i+2] AS bigram
      FROM w, LATERAL (SELECT unnest(range(len(toks) - 1)) AS i)
    )
    SELECT bigram, CAST(count(*) AS BIGINT) AS cnt
    FROM grams GROUP BY bigram
    ORDER BY cnt DESC, bigram ASC LIMIT {NGRAM_TOP_K}
    """,
    doc="Corpus-level bigram frequency, top-20 — the n-gram statistics pass "
    "behind contamination checks and LM smoothing tables. Bigrams are built "
    "map-side (transform over the token array, no self-join), counted with "
    "one partial-agg shuffle on the gram, and the global top-k compiles to "
    "TakeOrderedAndProject (per-partition heaps, never a full sort). "
    "Deterministic tie-break on the gram string.",
)
def text_ngram_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    # adjacent pairs via zip_with over two shifted slices — same bigrams
    # in the same order as the former sequence+element_at transform, ~8x
    # cheaper per row (no index-array materialization, no per-element
    # positional lookups in the interpreted HOF path)
    grams = docs.select(
        F.explode(
            F.zip_with(
                F.slice(toks, 1, F.size(toks) - 1),
                F.slice(toks, 2, F.size(toks) - 1),
                lambda a, b: F.concat_ws(" ", a, b),
            )
        ).alias("bigram")
    )
    return (
        grams.groupBy("bigram")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("bigram"))
        .limit(NGRAM_TOP_K)
    )


PASSAGE_WORDS = 8
PASSAGE_MAX_DUP_RATIO = 0.5


@register(
    "text_passage_dedup",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ), passages AS (
      SELECT doc_id,
             array_to_string(t[{PASSAGE_WORDS} * i + 1 : {PASSAGE_WORDS} * (i + 1)], ' ')
               AS passage
      FROM toks, LATERAL (SELECT unnest(range(len(t) // {PASSAGE_WORDS})) AS i)
    ), freq AS (
      SELECT passage, count(DISTINCT doc_id) AS n_docs
      FROM passages GROUP BY passage
    )
    SELECT p.doc_id,
           CAST(count(*) AS BIGINT) AS n_passages,
           CAST(sum(CASE WHEN f.n_docs > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_dup_passages,
           round(sum(CASE WHEN f.n_docs > 1 THEN 1 ELSE 0 END) * 1.0
                 / count(*), 4) AS dup_ratio,
           CAST(CASE WHEN sum(CASE WHEN f.n_docs > 1 THEN 1 ELSE 0 END) * 1.0
                          / count(*) <= {PASSAGE_MAX_DUP_RATIO}
                     THEN 1 ELSE 0 END AS BIGINT) AS keep
    FROM passages p JOIN freq f USING (passage)
    GROUP BY p.doc_id
    """,
    doc="Passage-level dedup (RefinedWeb-style repeated-span removal): each "
    "document is cut into consecutive 8-word passages map-side, passage "
    "frequency is counted corpus-wide, and documents whose duplicated-passage "
    "ratio exceeds the threshold are dropped. The instance stream shuffles "
    "ONCE, by passage: the (passage, doc) reduction, the frequency count "
    "above it, and the flag join back all reuse that partitioning (all "
    "their keys contain the partition key), so the only other exchange is "
    "the final fine-grained doc_id aggregation. A viral boilerplate "
    "passage skews its partition; AQE's skew handling splits the join "
    "side, and the reduction bounds each group at one row per distinct "
    "doc.",
)
def text_passage_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents", parallel=True)
    toks = F.split("text", " ")
    # the passage string never materializes: each 8-word span hashes
    # directly off the token tuple (same trick as hashed_word_shingles), so
    # the shuffles move 8-byte keys instead of ~50-byte strings. The
    # oracle groups by the passage STRING — per-doc outputs agree because
    # they only depend on span equality, which the 64-bit hash preserves
    # w.h.p. (a collision would merely merge two frequency groups).
    # Non-overlapping spans = the stride-8 subset of the overlapping n-gram
    # hash array (same xxhash64 tuple per position), so the zip_with
    # expansion replaces the interpreted transform(sequence) +
    # 8 element_at lookups per position; floor(size/8) spans either way.
    passages = docs.select(
        "doc_id",
        F.explode(
            F.when(
                F.size(toks) >= PASSAGE_WORDS,
                F.filter(
                    hashed_ngram_tuples(toks, PASSAGE_WORDS),
                    lambda _, i: i % PASSAGE_WORDS == 0,
                ),
            ).otherwise(F.array().cast("array<bigint>"))
        ).alias("passage"),
    )
    # partition by passage once; (passage, doc) reduction, passage-level
    # frequency, and the join back are all exchange-free on top of it.
    doc_pass = (
        passages.repartition("passage")
        .groupBy("passage", "doc_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("k"))
    )
    freq = doc_pass.groupBy("passage").agg(F.count(F.lit(1)).alias("n_docs"))
    dup = F.sum(F.col("k") * (F.col("n_docs") > 1).cast("bigint"))
    n = F.sum("k")
    ratio = dup / n
    return (
        doc_pass.join(freq, "passage")
        .groupBy("doc_id")
        .agg(
            n.cast("bigint").alias("n_passages"),
            dup.cast("bigint").alias("n_dup_passages"),
            F.round(ratio, 4).alias("dup_ratio"),
            (ratio <= PASSAGE_MAX_DUP_RATIO).cast("bigint").alias("keep"),
        )
    )


# surprisal band (natural-log units) for the unigram-LM keep decision:
# too low = degenerate/repetitive text, too high = noise/garbage.
SURPRISAL_KEEP_LO = 2.0
SURPRISAL_KEEP_HI = 9.0


@register(
    "text_unigram_surprisal",
    oracle=f"""
    WITH w AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
    ), vocab AS (
      SELECT word, count(*) AS cnt FROM w GROUP BY word
    ), total AS (
      SELECT sum(cnt) AS n FROM vocab
    )
    SELECT w.doc_id,
           CAST(count(*) AS BIGINT) AS n_tokens,
           round(avg(-ln(vocab.cnt * 1.0 / total.n)), 4) AS avg_surprisal,
           CAST(CASE WHEN avg(-ln(vocab.cnt * 1.0 / total.n))
                          BETWEEN {SURPRISAL_KEEP_LO} AND {SURPRISAL_KEEP_HI}
                     THEN 1 ELSE 0 END AS BIGINT) AS keep
    FROM w JOIN vocab USING (word) CROSS JOIN total
    GROUP BY w.doc_id
    """,
    doc="Unigram-LM surprisal scoring (perplexity-proxy quality filter, as in "
    "CCNet/Gopher pipelines): corpus unigram probabilities, then the mean "
    "negative log-probability per document, with a keep band. The vocab "
    "grows Heaps-law slow but UNBOUNDED, so its broadcast is size-GATED "
    "(maybe_broadcast: hash join past the threshold instead of OOMing the "
    "driver at 100 TB); only the 1-row total is force-broadcast. The token "
    "stream joins map-side while the vocab fits and aggregates per doc_id "
    "with partial aggregation.",
)
def text_unigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import broadcast

    docs = table(spark, sf_dir, "documents", parallel=True)
    w = docs.select("doc_id", F.explode(F.split("text", " ")).alias("word"))
    vocab = w.groupBy("word").agg(F.count(F.lit(1)).alias("cnt"))
    total = vocab.agg(F.sum("cnt").alias("n"))
    surprisal = -F.log(F.col("cnt") / F.col("n"))
    avg_s = F.avg(surprisal)
    # the vocab grows with the corpus (Heaps-law slow but unbounded), so
    # the broadcast is size-GATED: past the session threshold AQE picks the
    # hash join instead of OOMing the driver at 100 TB. The 1-row total
    # stays force-broadcast.
    return (
        w.join(maybe_broadcast(vocab), "word")
        .crossJoin(broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
            F.round(avg_s, 4).alias("avg_surprisal"),
            avg_s.between(SURPRISAL_KEEP_LO, SURPRISAL_KEEP_HI)
            .cast("bigint")
            .alias("keep"),
        )
    )


KEYWORD_TOPK = 3


@register(
    "text_keywords_topk",
    oracle=f"""
    WITH w AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
    ), tf AS (
      SELECT doc_id, word, count(*) AS tf FROM w GROUP BY doc_id, word
    ), df AS (
      SELECT word, count(DISTINCT doc_id) AS df FROM w GROUP BY word
    ), n AS (SELECT count(*) AS n_docs FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.word,
             round(tf.tf * (ln((n.n_docs + 1.0) / (df.df + 1.0)) + 1.0), 6)
               AS tfidf
      FROM tf JOIN df USING (word) CROSS JOIN n
    )
    SELECT doc_id, word, tfidf, CAST(rn AS BIGINT) AS rn
    FROM (
      SELECT *, row_number() OVER (
               PARTITION BY doc_id ORDER BY tfidf DESC, word) AS rn
      FROM scored
    ) WHERE rn <= {KEYWORD_TOPK}
    """,
    doc=f"Per-document top-{KEYWORD_TOPK} TF-IDF keywords: the tf-idf "
    "relation (same two-aggregation, broadcast-idf shape as text_tfidf) "
    "capped per doc by a rank filter that Catalyst rewrites to "
    "WindowGroupLimit — map tasks pre-prune to k terms per doc before the "
    "shuffle. The keyword-extraction / doc-tagging primitive over any "
    "corpus size.",
)
def text_keywords_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = table(spark, sf_dir, "documents", parallel=True)
    w = docs.select("doc_id", F.explode(F.split("text", " ")).alias("word"))
    tf = w.groupBy("doc_id", "word").agg(F.count(F.lit(1)).alias("tf"))
    df = w.groupBy("word").agg(F.count_distinct("doc_id").alias("df"))
    n = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(maybe_broadcast(df), "word")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "word",
            F.round(
                F.col("tf")
                * (F.log((F.col("n_docs") + 1.0) / (F.col("df") + 1.0)) + 1.0),
                6,
            ).alias("tfidf"),
        )
    )
    rank_w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), "word")
    return (
        scored.withColumn("rn", F.row_number().over(rank_w).cast("bigint"))
        .filter(F.col("rn") <= KEYWORD_TOPK)
    )
