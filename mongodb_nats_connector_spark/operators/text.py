"""Text analysis operators over the `documents` table.

Language-ID, quality scoring, token counting and fingerprinting are all pure
SQL expressions (regexp / string / higher-order functions) — JVM-side, fully
pushdown-friendly, no Python per row. Each has an exact DuckDB oracle built
from the same arithmetic so the comparison is deterministic.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

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
    codes = F.transform(
        F.sequence(F.lit(1), F.length("text")),
        lambda i: F.ascii(F.col("text").substr(i, F.lit(1))),
    )
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
        tf.join(F.broadcast(df), "word")
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
