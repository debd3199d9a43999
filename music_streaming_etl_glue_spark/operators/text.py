"""Text-analysis operators over the ``documents`` table — the
training-data-pipeline surface (language ID, quality scoring, token
counting, fingerprinting). All JVM-side built-ins (split / array lambdas /
md5), no Python UDFs: these run inside whole-stage codegen and scale
linearly with executors at 100 TB.

Each operator has its DuckDB oracle twin colocated. Tokenization is
whitespace split; the BPE-ish variant counts alpha runs / digit runs /
single punctuation via the same regex in both engines (plain-ASCII corpus,
so Java-vs-RE2 dialect differences don't bite).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: Tiny deterministic English-stopword list used by quality + lang-id.
STOPWORDS = ("a", "the", "of", "and", "to", "in", "is", "it")
_STOP_SQL = ", ".join(f"'{w}'" for w in STOPWORDS)

#: BPE-ish pre-tokenizer: alpha runs, digit runs, single non-alnum marks.
BPE_RE = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"

#: Threshold on stopword ratio above which the heuristic says English.
LANG_EN_THRESHOLD = 0.05


def _tokens(col: str = "text") -> F.Column:
    return F.split(F.col(col), " ")


def token_counts(documents: DataFrame) -> DataFrame:
    """Whitespace and BPE-ish token counts per document."""
    return documents.select(
        "doc_id",
        F.size(_tokens()).cast("long").alias("n_tokens"),
        F.regexp_count(F.col("text"), F.lit(BPE_RE)).cast("long").alias("n_bpe_tokens"),
        F.length("text").cast("long").alias("n_chars"),
    )


TOKEN_COUNTS_SQL = f"""
SELECT doc_id,
       len(string_split(text, ' '))::BIGINT AS n_tokens,
       len(regexp_extract_all(text, '{BPE_RE}'))::BIGINT AS n_bpe_tokens,
       length(text)::BIGINT AS n_chars
FROM documents
"""


def text_quality(documents: DataFrame) -> DataFrame:
    """Heuristic quality signals: length, mean token length, lexical
    diversity (distinct-token ratio), stopword ratio, and a composite
    quality score in [0,1]. Pure column math → deterministic doubles."""
    toks = _tokens()
    n_tokens = F.size(toks).cast("long")
    n_distinct = F.size(F.array_distinct(toks)).cast("long")
    n_stop = F.size(
        F.filter(toks, lambda t: t.isin(*STOPWORDS))
    ).cast("long")
    # total non-space chars / token count
    avg_token_len = (
        F.length(F.regexp_replace("text", " ", "")).cast("double") / n_tokens
    )
    distinct_ratio = n_distinct.cast("double") / n_tokens
    stop_ratio = n_stop.cast("double") / n_tokens
    score = (
        F.least(n_tokens.cast("double") / F.lit(64.0), F.lit(1.0)) * 0.4
        + distinct_ratio * 0.4
        + F.least(stop_ratio * F.lit(10.0), F.lit(1.0)) * 0.2
    )
    return documents.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        n_distinct.alias("n_distinct_tokens"),
        avg_token_len.alias("avg_token_len"),
        distinct_ratio.alias("distinct_token_ratio"),
        stop_ratio.alias("stopword_ratio"),
        score.alias("quality_score"),
    )


TEXT_QUALITY_SQL = f"""
WITH t AS (
    SELECT doc_id,
           string_split(text, ' ') AS toks,
           length(replace(text, ' ', ''))::DOUBLE AS n_nonspace
    FROM documents
)
SELECT doc_id,
       len(toks)::BIGINT AS n_tokens,
       len(list_distinct(toks))::BIGINT AS n_distinct_tokens,
       n_nonspace / len(toks) AS avg_token_len,
       len(list_distinct(toks))::DOUBLE / len(toks) AS distinct_token_ratio,
       len(list_filter(toks, x -> x IN ({_STOP_SQL})))::DOUBLE / len(toks)
           AS stopword_ratio,
       least(len(toks)::DOUBLE / 64.0, 1.0) * 0.4
         + (len(list_distinct(toks))::DOUBLE / len(toks)) * 0.4
         + least((len(list_filter(toks, x -> x IN ({_STOP_SQL})))::DOUBLE
                  / len(toks)) * 10.0, 1.0) * 0.2 AS quality_score
FROM t
"""


def lang_id(documents: DataFrame) -> DataFrame:
    """N-gram/stopword language-ID heuristic: ratio of English stopword
    tokens. Returns the predicted tag + the score that produced it."""
    toks = _tokens()
    stop_ratio = (
        F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS))).cast("double")
        / F.size(toks)
    )
    return documents.select(
        "doc_id",
        stop_ratio.alias("en_score"),
        F.when(stop_ratio > LANG_EN_THRESHOLD, F.lit("en"))
        .otherwise(F.lit("und"))
        .alias("lang_pred"),
    )


LANG_ID_SQL = f"""
WITH t AS (
    SELECT doc_id,
           len(list_filter(string_split(text, ' '), x -> x IN ({_STOP_SQL})))::DOUBLE
             / len(string_split(text, ' ')) AS en_score
    FROM documents
)
SELECT doc_id, en_score,
       CASE WHEN en_score > {LANG_EN_THRESHOLD} THEN 'en' ELSE 'und' END AS lang_pred
FROM t
"""


def fingerprints(documents: DataFrame) -> DataFrame:
    """Document fingerprints: exact (md5 of raw text) and normalized
    (md5 of the sorted distinct token set — order/duplication invariant,
    the classic near-dup canonical form)."""
    toks = _tokens()
    return documents.select(
        "doc_id",
        F.md5("text").alias("exact_fp"),
        F.md5(
            F.concat_ws(" ", F.array_sort(F.array_distinct(toks)))
        ).alias("normalized_fp"),
    )


FINGERPRINTS_SQL = """
SELECT doc_id,
       md5(text) AS exact_fp,
       md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' '))
           AS normalized_fp
FROM documents
"""

def normalize_text(documents: DataFrame) -> DataFrame:
    """Canonical text-normalization pass (the pre-dedup cleanup stage):
    lowercase, strip non-alphanumerics, collapse whitespace, trim.
    All JVM regex expressions — one narrow projection, no shuffle."""
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9 ]", " "),
            " +",
            " ",
        )
    )
    return documents.select(
        "doc_id",
        norm.alias("norm_text"),
        (norm != F.col("text")).alias("changed"),
        F.length(norm).cast("long").alias("norm_chars"),
    )


NORMALIZE_TEXT_SQL = """
WITH n AS (
    SELECT doc_id, text,
           trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
                               ' +', ' ', 'g')) AS norm_text
    FROM documents
)
SELECT doc_id, norm_text,
       norm_text != text AS changed,
       length(norm_text)::BIGINT AS norm_chars
FROM n
"""


TFIDF_TOP_K = 5


def tfidf_top_terms(documents: DataFrame, k: int = TFIDF_TOP_K) -> DataFrame:
    """Top-k characteristic terms per document by TF-IDF.

    Term frequencies and document frequencies are two hash aggregates on
    the exploded token stream (the shuffle key is the token — linear in
    corpus size, never quadratic); the tiny corpus size rides along via a
    broadcast scalar. Scores rounded to 6 decimals before the
    deterministic (score desc, term asc) rank."""
    toks = documents.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("term")
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    df_ = toks.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    n_docs = F.broadcast(documents.agg(F.count("*").alias("n_docs")))
    scored = (
        tf.join(df_, "term")
        .crossJoin(n_docs)
        .withColumn(
            "tfidf",
            F.round(
                F.col("tf") * F.log(F.col("n_docs").cast("double") / F.col("df")), 6
            ),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), F.col("term").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("doc_id", "term", "tf", "df", "tfidf", "rank")
    )


TFIDF_TOP_TERMS_SQL = f"""
WITH toks AS (
    SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
df AS (SELECT term, count(DISTINCT doc_id) AS df FROM toks GROUP BY 1),
scored AS (
    SELECT tf.doc_id, tf.term, tf.tf, df.df,
           round(tf.tf * ln((SELECT count(*) FROM documents)::DOUBLE / df.df), 6)
               AS tfidf
    FROM tf JOIN df ON tf.term = df.term
),
ranked AS (
    SELECT *, row_number() OVER (
        PARTITION BY doc_id ORDER BY tfidf DESC, term ASC
    ) AS rank
    FROM scored
)
SELECT doc_id, term, tf, df, tfidf, rank FROM ranked WHERE rank <= {TFIDF_TOP_K}
"""
