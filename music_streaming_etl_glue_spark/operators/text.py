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

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from music_streaming_etl_glue_spark.functions.ranks import rank_post_limit

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


def normalized_fingerprint(col: str = "text") -> F.Column:
    """md5 of the sorted distinct token set — order/duplication
    invariant, the classic near-dup canonical form. A plain column
    expression so batch fingerprints and the streaming near-dedup share
    one definition."""
    toks = _tokens(col)
    return F.md5(F.concat_ws(" ", F.array_sort(F.array_distinct(toks))))


def fingerprints(documents: DataFrame) -> DataFrame:
    """Document fingerprints: exact (md5 of raw text) and normalized
    (see :func:`normalized_fingerprint`)."""
    return documents.select(
        "doc_id",
        F.md5("text").alias("exact_fp"),
        normalized_fingerprint().alias("normalized_fp"),
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


# ---------------------------------------------------------------------------
# repetition metrics (Gopher/RefinedWeb-style repetition filters)
# ---------------------------------------------------------------------------

def repetition_metrics(documents: DataFrame) -> DataFrame:
    """Per-document repetition signals used to filter low-quality training
    text: duplicate-token fraction, duplicate-bigram fraction, and the
    most-frequent-token share. Array expressions for the n-gram fractions
    (no shuffle); the top-token share is one exploded (doc_id, term)
    hash-agg — shuffle key cardinality is tokens, never pairwise."""
    toks = _tokens()
    base = documents.select("doc_id", toks.alias("toks"))
    n = F.size("toks")
    bigrams = F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(1), n - 1),
            lambda i: F.concat_ws(" ", F.get("toks", i - 1), F.get("toks", i)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    metrics = base.select(
        "doc_id",
        n.cast("long").alias("n_tokens"),
        (F.lit(1.0) - F.size(F.array_distinct("toks")).cast("double") / n).alias(
            "dup_token_frac"
        ),
        F.when(
            F.size(bigrams) > 0,
            F.lit(1.0)
            - F.size(F.array_distinct(bigrams)).cast("double") / F.size(bigrams),
        )
        .otherwise(F.lit(0.0))
        .alias("dup_bigram_frac"),
    )
    tf = (
        documents.select("doc_id", F.explode(toks).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
        .groupBy("doc_id")
        .agg(F.max("tf").alias("top_tf"))
    )
    return metrics.join(tf, "doc_id").select(
        "doc_id",
        "n_tokens",
        "dup_token_frac",
        "dup_bigram_frac",
        (F.col("top_tf").cast("double") / F.col("n_tokens")).alias(
            "top_token_frac"
        ),
    )


REPETITION_METRICS_SQL = """
WITH t AS (
    SELECT doc_id, string_split(text, ' ') AS toks FROM documents
),
base AS (
    SELECT doc_id, toks, len(toks) AS n,
           CASE WHEN len(toks) >= 2 THEN
               list_transform(generate_series(1, len(toks) - 1),
                              i -> toks[i] || ' ' || toks[i + 1])
           ELSE [] END AS bigrams
    FROM t
),
tf AS (
    SELECT doc_id, max(c) AS top_tf FROM (
        SELECT doc_id, term, count(*) AS c
        FROM (SELECT doc_id, unnest(toks) AS term FROM t)
        GROUP BY doc_id, term
    )
    GROUP BY doc_id
)
SELECT b.doc_id,
       b.n::BIGINT AS n_tokens,
       1.0 - len(list_distinct(b.toks))::DOUBLE / b.n AS dup_token_frac,
       CASE WHEN len(b.bigrams) > 0 THEN
           1.0 - len(list_distinct(b.bigrams))::DOUBLE / len(b.bigrams)
       ELSE 0.0 END AS dup_bigram_frac,
       tf.top_tf::DOUBLE / b.n AS top_token_frac
FROM base b JOIN tf ON b.doc_id = tf.doc_id
"""


# ---------------------------------------------------------------------------
# fixed-window document chunking (training-sequence packing prep)
# ---------------------------------------------------------------------------

CHUNK_TOKENS = 32
CHUNK_STRIDE = 24  # 8-token overlap between consecutive chunks


def chunk_documents(
    documents: DataFrame,
    window: int = CHUNK_TOKENS,
    stride: int = CHUNK_STRIDE,
) -> DataFrame:
    """Split each document into fixed-size token windows with overlap —
    the chunking stage ahead of tokenize-and-pack in a training pipeline.
    One generate-and-explode projection, no shuffle, no Python; rows out
    ≈ rows in × (n_tokens/stride), each chunk carrying (doc_id, chunk_id)
    so provenance survives downstream dedup/pack stages."""
    toks = _tokens()
    n = F.size(toks)
    n_chunks = F.when(n <= window, F.lit(1)).otherwise(
        F.ceil((n - window) / F.lit(float(stride))).cast("int") + 1
    )
    base = documents.select(
        "doc_id",
        toks.alias("toks"),
        F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_id"),
    )
    chunk = F.slice("toks", F.col("chunk_id") * stride + 1, window)
    return base.select(
        "doc_id",
        F.col("chunk_id").cast("long").alias("chunk_id"),
        F.concat_ws(" ", chunk).alias("chunk_text"),
        F.size(chunk).cast("long").alias("chunk_tokens"),
    )


CHUNK_DOCUMENTS_SQL = f"""
WITH t AS (
    SELECT doc_id, string_split(text, ' ') AS toks,
           len(string_split(text, ' ')) AS n
    FROM documents
),
c AS (
    SELECT doc_id, toks,
           unnest(generate_series(0,
               CASE WHEN n <= {CHUNK_TOKENS} THEN 0
                    ELSE CAST(ceil((n - {CHUNK_TOKENS})::DOUBLE
                                   / {CHUNK_STRIDE}) AS BIGINT)
               END)) AS chunk_id
    FROM t
)
SELECT doc_id, chunk_id,
       array_to_string(list_slice(toks, chunk_id * {CHUNK_STRIDE} + 1,
                                  chunk_id * {CHUNK_STRIDE} + {CHUNK_TOKENS}),
                       ' ') AS chunk_text,
       len(list_slice(toks, chunk_id * {CHUNK_STRIDE} + 1,
                      chunk_id * {CHUNK_STRIDE} + {CHUNK_TOKENS}))::BIGINT
           AS chunk_tokens
FROM c
"""


# ---------------------------------------------------------------------------
# benchmark decontamination (flag training docs matching an eval set)
# ---------------------------------------------------------------------------

def contamination_flags(documents: DataFrame, bench_mod: int = 20) -> DataFrame:
    """Decontamination check: flag every candidate training document whose
    normalized fingerprint (order/duplication-invariant token set) matches
    a benchmark document. The benchmark here is the deterministic
    ``doc_id % bench_mod == 0`` slice standing in for an eval set.

    The benchmark fingerprint set is tiny relative to the corpus, so the
    probe is a broadcast left join — at 100 TB the corpus streams past the
    in-memory benchmark set with no shuffle."""
    fps = fingerprints(documents).select("doc_id", "normalized_fp")
    bench = (
        fps.filter(F.col("doc_id") % bench_mod == 0)
        .select(F.col("normalized_fp").alias("bench_fp"))
        .distinct()
    )
    candidates = fps.filter(F.col("doc_id") % bench_mod != 0)
    return (
        candidates.join(
            F.broadcast(bench),
            candidates["normalized_fp"] == bench["bench_fp"],
            "left",
        )
        .select(
            "doc_id",
            F.col("bench_fp").isNotNull().alias("contaminated"),
        )
    )


CONTAMINATION_FLAGS_SQL = """
WITH fps AS (
    SELECT doc_id,
           md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))),
                               ' ')) AS normalized_fp
    FROM documents
),
bench AS (
    SELECT DISTINCT normalized_fp AS bench_fp FROM fps WHERE doc_id % 20 = 0
)
SELECT f.doc_id, b.bench_fp IS NOT NULL AS contaminated
FROM fps f
LEFT JOIN bench b ON f.normalized_fp = b.bench_fp
WHERE f.doc_id % 20 != 0
"""


# ---------------------------------------------------------------------------
# BM25 retrieval scoring
# ---------------------------------------------------------------------------

BM25_QUERY_TERMS = ("spark", "shuffle", "join")
BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOP_K = 50


def bm25_scores(
    documents: DataFrame,
    query_terms: tuple[str, ...] = BM25_QUERY_TERMS,
    k1: float = BM25_K1,
    b: float = BM25_B,
    top_k: int = BM25_TOP_K,
) -> DataFrame:
    """Okapi BM25 of one query against every document (the retrieval
    scorer a contamination/search pass needs).

    The token explode is filtered to the query terms FIRST — the tf/df
    aggregates shuffle only rows matching the handful of query terms,
    not the whole token stream. Corpus stats (N, avg doc length) are one
    broadcast scalar row; idf uses the standard
    ln((N - df + 0.5)/(df + 0.5) + 1) form. Scores round to 6dp before
    the deterministic (score desc, doc_id asc) top-k."""
    toks = documents.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("term")
    ).filter(F.col("term").isin(*query_terms))
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    df_ = toks.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    stats = F.broadcast(
        documents.agg(
            F.count("*").alias("n_docs"),
            (
                F.sum(F.size(F.split(F.col("text"), " ")).cast("decimal(28,0)"))
                .cast("double")
                / F.count("*")
            ).alias("avgdl"),
        )
    )
    dl = documents.select(
        "doc_id", F.size(F.split(F.col("text"), " ")).alias("dl")
    )
    idf = F.log(
        (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
    )
    term_score = idf * (
        F.col("tf") * (k1 + 1)
        / (F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.col("avgdl")))
    )
    # Per-doc total as a FIXED-ORDER sum of per-term conditional aggregates
    # (each term contributes at most one row per doc, so every aggregate
    # sums ≤1 value) — a plain SUM over the term rows would make the 6dp
    # rounding depend on engine-specific addition order.
    per_term = [
        F.coalesce(
            F.sum(F.when(F.col("term") == t, term_score)), F.lit(0.0)
        )
        for t in query_terms
    ]
    total = per_term[0]
    for part in per_term[1:]:
        total = total + part
    scored = (
        tf.join(df_, "term")
        .join(dl, "doc_id")
        .crossJoin(stats)
        .groupBy("doc_id")
        .agg(F.round(total, 6).alias("bm25"))
    )
    top = scored.orderBy(F.col("bm25").desc(), F.col("doc_id").asc()).limit(
        top_k
    )
    return rank_post_limit(
        top, "rank", F.col("bm25").desc(), F.col("doc_id").asc()
    )


_BM25_TERMS_SQL = ", ".join(f"'{t}'" for t in BM25_QUERY_TERMS)

BM25_SCORES_SQL = f"""
WITH toks AS (
    SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
qtoks AS (SELECT * FROM toks WHERE term IN ({_BM25_TERMS_SQL})),
tf AS (SELECT doc_id, term, count(*) AS tf FROM qtoks GROUP BY 1, 2),
df AS (SELECT term, count(DISTINCT doc_id) AS df FROM qtoks GROUP BY 1),
stats AS (
    SELECT count(*) AS n_docs,
           (SUM(CAST(len(string_split(text, ' ')) AS DECIMAL(28,0)))::DOUBLE
            / count(*)) AS avgdl
    FROM documents
),
dl AS (SELECT doc_id, len(string_split(text, ' ')) AS dl FROM documents),
scored AS (
    SELECT tf.doc_id,
           round({" + ".join(
               "COALESCE(SUM(CASE WHEN tf.term = '" + t + "' THEN "
               "ln((stats.n_docs - df.df + 0.5) / (df.df + 0.5) + 1.0)"
               " * (tf.tf * (" + repr(BM25_K1) + " + 1)"
               " / (tf.tf + " + repr(BM25_K1)
               + " * (1 - " + repr(BM25_B) + " + " + repr(BM25_B)
               + " * dl.dl / stats.avgdl))) END), 0.0)"
               for t in BM25_QUERY_TERMS
           )}, 6) AS bm25
    FROM tf
    JOIN df ON tf.term = df.term
    JOIN dl ON tf.doc_id = dl.doc_id
    CROSS JOIN stats
    GROUP BY tf.doc_id
)
SELECT doc_id, bm25,
       row_number() OVER (ORDER BY bm25 DESC, doc_id ASC) AS rank
FROM scored
ORDER BY bm25 DESC, doc_id ASC
LIMIT {BM25_TOP_K}
"""


# ---------------------------------------------------------------------------
# UDTF chunker (Python table function twin of chunk_documents)
# ---------------------------------------------------------------------------

def make_chunk_udtf(window: int = CHUNK_TOKENS, stride: int = CHUNK_STRIDE):
    """Python UDTF emitting the SAME chunks as :func:`chunk_documents` —
    the table-function API surface (1 row → N rows from Python, usable in
    SQL via LATERAL). The expression-based chunker stays the hot path
    (JVM-side, no serialization); this twin is for chunkers that
    genuinely need Python (real tokenizers), and shares the chunker's
    oracle so the two can never drift."""
    from pyspark.sql.functions import udtf

    @udtf(returnType=(
        "doc_id bigint, chunk_id bigint, chunk_text string, "
        "chunk_tokens bigint"
    ), useArrow=True)
    class ChunkDoc:
        def eval(self, doc_id: int, text: str):  # noqa: ANN001
            toks = (text or "").split(" ")
            n = len(toks)
            if n <= window:
                n_chunks = 1
            else:
                n_chunks = -((n - window) // -stride) + 1  # ceil + 1
            for cid in range(n_chunks):
                chunk = toks[cid * stride : cid * stride + window]
                yield doc_id, cid, " ".join(chunk), len(chunk)

    return ChunkDoc


def chunk_documents_udtf(documents: DataFrame) -> DataFrame:
    """Apply the UDTF chunker via a LATERAL join (SQL-side table-function
    call). Row-at-a-time Python — bench it against `chunk_documents`
    before putting it in a hot path."""
    spark = documents.sparkSession
    chunker = make_chunk_udtf()
    spark.udtf.register("chunk_doc", chunker)
    documents.select("doc_id", "text").createOrReplaceTempView("__chunk_in")
    return spark.sql(
        "SELECT c.doc_id, c.chunk_id, c.chunk_text, c.chunk_tokens "
        "FROM __chunk_in, LATERAL chunk_doc(doc_id, text) c"
    )


# ---------------------------------------------------------------------------
# sequence packing: chunks -> fixed-token-budget training examples
# ---------------------------------------------------------------------------

#: token budget per packed training example (4 non-overlapping chunks)
PACK_TARGET_TOKENS = 128


def pack_chunks(
    documents: DataFrame, target_tokens: int = PACK_TARGET_TOKENS
) -> DataFrame:
    """Pack non-overlapping document chunks into fixed-token-budget
    training examples — the concat-stream packing step after chunking in
    an LLM data pipeline: chunks are laid out in a deterministic
    pseudo-random global order (md5 of (doc_id, chunk_id) — a stable
    shuffle, so examples mix documents), a running token offset is
    computed, and ``example_id`` = start-offset DIV budget. Deterministic
    and append-stable in the ordering key, with exact integer arithmetic
    end to end.

    The global running sum does NOT serialize through one task: the md5
    key is range-bucketed by its 2-hex-char prefix, the cumulative sum
    runs per (bucket) in parallel, and per-bucket totals (a ≤256-row
    metadata aggregate) prefix-sum into broadcast offsets — the same
    two-level pattern as the exact ``rebalance_sources`` rank. At 100 TB
    widen the prefix; the data-level window stays n/buckets wide.
    """
    chunks = chunk_documents(
        documents, window=CHUNK_TOKENS, stride=CHUNK_TOKENS
    )
    key = F.md5(
        F.concat_ws(
            "|",
            F.col("doc_id").cast("string"),
            F.col("chunk_id").cast("string"),
        )
    )
    tagged = chunks.select(
        "doc_id",
        "chunk_id",
        "chunk_tokens",
        key.alias("pack_key"),
    ).withColumn("__b", F.substring("pack_key", 1, 2))
    w_local = (
        Window.partitionBy("__b")
        .orderBy("pack_key", "doc_id", "chunk_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    btot = tagged.groupBy("__b").agg(F.sum("chunk_tokens").alias("bt"))
    # ≤256-row metadata window: cumulative tokens before each bucket.
    # repartition(1) + spark_partition_id() declares the single partition
    # via an explicit exchange (coalesce(1) would collapse the bucket
    # aggregate's reduce stage above to one task — the round-6 advice
    # pattern); keeps the gate log free of WindowExec no-partition
    # warnings so a REAL one stands out
    w_off = (
        Window.partitionBy(F.spark_partition_id())
        .orderBy("__b")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = (
        btot.repartition(1)
        .withColumn("off", F.coalesce(F.sum("bt").over(w_off), F.lit(0)))
        .select("__b", "off")
    )
    return (
        tagged.join(F.broadcast(offsets), "__b")
        .withColumn(
            "cum_excl",
            F.col("off")
            + F.coalesce(F.sum("chunk_tokens").over(w_local), F.lit(0)),
        )
        .select(
            "doc_id",
            "chunk_id",
            "chunk_tokens",
            F.expr(f"CAST(cum_excl DIV {target_tokens} AS BIGINT)").alias(
                "example_id"
            ),
        )
    )


PACK_CHUNKS_SQL = f"""
WITH t AS (
    SELECT doc_id, string_split(text, ' ') AS toks,
           len(string_split(text, ' ')) AS n
    FROM documents
),
c AS (
    SELECT doc_id, toks,
           unnest(generate_series(0,
               CASE WHEN n <= {CHUNK_TOKENS} THEN 0
                    ELSE CAST(ceil((n - {CHUNK_TOKENS})::DOUBLE
                                   / {CHUNK_TOKENS}) AS BIGINT)
               END)) AS chunk_id
    FROM t
),
chunks AS (
    SELECT doc_id, chunk_id,
           len(list_slice(toks, chunk_id * {CHUNK_TOKENS} + 1,
                          chunk_id * {CHUNK_TOKENS} + {CHUNK_TOKENS}))::BIGINT
               AS chunk_tokens
    FROM c
),
keyed AS (
    SELECT doc_id, chunk_id, chunk_tokens,
           md5(doc_id::VARCHAR || '|' || chunk_id::VARCHAR) AS pack_key
    FROM chunks
),
cum AS (
    SELECT doc_id, chunk_id, chunk_tokens,
           COALESCE(SUM(chunk_tokens) OVER (
               ORDER BY pack_key, doc_id, chunk_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS cum_excl
    FROM keyed
)
SELECT doc_id, chunk_id, chunk_tokens,
       CAST(cum_excl // {PACK_TARGET_TOKENS} AS BIGINT) AS example_id
FROM cum
"""


# ---------------------------------------------------------------------------
# n-gram decontamination: partial-overlap benchmark leakage screen
# ---------------------------------------------------------------------------

#: shingle width for the n-gram decontamination screen — wide enough that
#: incidental phrase reuse doesn't flag, narrow enough that a quoted
#: benchmark fragment inside a larger document still does
DECONTAM_NGRAM = 5


def ngram_decontamination(
    documents: DataFrame,
    n: int = DECONTAM_NGRAM,
    bench_mod: int = 20,
) -> DataFrame:
    """Per corpus document: how many distinct word ``n``-grams it shares
    with ANY benchmark document (the ``doc_id % bench_mod == 0`` slice),
    and a contamination flag. This is the C4/GPT-style partial-overlap
    screen — :func:`contamination_flags` only catches whole-document
    fingerprint matches; a benchmark answer quoted inside a longer
    training document is exactly what this one catches.

    Scale shape: the benchmark's distinct shingle set is tiny next to
    the corpus, so it broadcasts and the corpus shingle stream probes it
    with no shuffle of corpus data; the per-doc count is one hash
    aggregate keyed by doc_id."""
    from music_streaming_etl_glue_spark.operators.dedup import shingles

    sh = shingles(documents, n)
    bench_sh = (
        sh.filter(F.col("doc_id") % bench_mod == 0)
        .select("shingle")
        .distinct()
    )
    shared = (
        sh.filter(F.col("doc_id") % bench_mod != 0)
        .join(F.broadcast(bench_sh), "shingle")
        .groupBy("doc_id")
        .agg(F.count("*").alias("shared_ngrams"))
    )
    corpus = documents.filter(F.col("doc_id") % bench_mod != 0).select(
        "doc_id"
    )
    return corpus.join(shared, "doc_id", "left").select(
        "doc_id",
        F.coalesce(F.col("shared_ngrams"), F.lit(0))
        .cast("long")
        .alias("shared_ngrams"),
        (F.coalesce(F.col("shared_ngrams"), F.lit(0)) > 0).alias(
            "contaminated"
        ),
    )


def _ngram_decontamination_sql(
    n: int = DECONTAM_NGRAM, bench_mod: int = 20
) -> str:
    from music_streaming_etl_glue_spark.operators.dedup import _shingles_cte

    return f"""
WITH sh AS ({_shingles_cte(n)}),
bench_sh AS (
    SELECT DISTINCT shingle FROM sh WHERE doc_id % {bench_mod} = 0
),
shared AS (
    SELECT s.doc_id, count(*) AS shared_ngrams
    FROM sh s JOIN bench_sh b ON s.shingle = b.shingle
    WHERE s.doc_id % {bench_mod} != 0
    GROUP BY s.doc_id
)
SELECT d.doc_id,
       COALESCE(sh2.shared_ngrams, 0)::BIGINT AS shared_ngrams,
       COALESCE(sh2.shared_ngrams, 0) > 0 AS contaminated
FROM documents d
LEFT JOIN shared sh2 ON d.doc_id = sh2.doc_id
WHERE d.doc_id % {bench_mod} != 0
"""


NGRAM_DECONTAMINATION_SQL = _ngram_decontamination_sql()


def pack_examples(
    documents: DataFrame, target_tokens: int = PACK_TARGET_TOKENS
) -> DataFrame:
    """Materialized packed training examples: for each example of
    :func:`pack_chunks`, the member chunks concatenated in stream order
    into one text plus token/member counts — the frame a trainer
    actually reads. One groupBy over the packing assignment; the
    in-example order is reconstructed by sorting the collected
    (pack_key, doc_id, chunk_id) structs, so the result is independent
    of shuffle layout."""
    chunks = chunk_documents(
        documents, window=CHUNK_TOKENS, stride=CHUNK_TOKENS
    )
    key = F.md5(
        F.concat_ws(
            "|",
            F.col("doc_id").cast("string"),
            F.col("chunk_id").cast("string"),
        )
    )
    assigned = pack_chunks(documents, target_tokens).join(
        chunks.select("doc_id", "chunk_id", "chunk_text"),
        ["doc_id", "chunk_id"],
    ).withColumn("pack_key", key)
    members = F.array_sort(
        F.collect_list(
            F.struct("pack_key", "doc_id", "chunk_id", "chunk_text")
        )
    )
    return (
        assigned.groupBy("example_id")
        .agg(
            F.count("*").cast("long").alias("n_chunks"),
            F.sum("chunk_tokens").cast("long").alias("example_tokens"),
            F.concat_ws(
                " ", F.transform(members, lambda s: s["chunk_text"])
            ).alias("example_text"),
        )
        .select("example_id", "n_chunks", "example_tokens", "example_text")
    )


PACK_EXAMPLES_SQL = f"""
WITH assigned AS ({PACK_CHUNKS_SQL}),
t AS (
    SELECT doc_id, string_split(text, ' ') AS toks,
           len(string_split(text, ' ')) AS n
    FROM documents
),
c AS (
    SELECT doc_id, toks,
           unnest(generate_series(0,
               CASE WHEN n <= {CHUNK_TOKENS} THEN 0
                    ELSE CAST(ceil((n - {CHUNK_TOKENS})::DOUBLE
                                   / {CHUNK_TOKENS}) AS BIGINT)
               END)) AS chunk_id
    FROM t
),
chunks AS (
    SELECT doc_id, chunk_id,
           array_to_string(list_slice(toks, chunk_id * {CHUNK_TOKENS} + 1,
                                      chunk_id * {CHUNK_TOKENS}
                                      + {CHUNK_TOKENS}), ' ') AS chunk_text
    FROM c
)
SELECT a.example_id,
       COUNT(*)::BIGINT AS n_chunks,
       SUM(a.chunk_tokens)::BIGINT AS example_tokens,
       string_agg(ch.chunk_text, ' ' ORDER BY
                  md5(a.doc_id::VARCHAR || '|' || a.chunk_id::VARCHAR),
                  a.doc_id, a.chunk_id) AS example_text
FROM assigned a
JOIN chunks ch ON ch.doc_id = a.doc_id AND ch.chunk_id = a.chunk_id
GROUP BY a.example_id
"""


VOCAB_TOP_K = 50


def vocab_top_terms(documents: DataFrame, k: int = VOCAB_TOP_K) -> DataFrame:
    """Corpus vocabulary heavy hitters: the k most frequent tokens with
    total and document frequencies — the vocabulary/tokenizer-training
    feed. One explode + one hash aggregate keyed by token (map-side
    partial counts absorb the skew of common words before the shuffle);
    the top-k is orderBy+limit → TakeOrderedAndProject, never a global
    sort. Deterministic (count desc, term asc) tiebreak."""
    toks = documents.select(
        "doc_id", F.explode(_tokens()).alias("term")
    )
    counts = toks.groupBy("term").agg(
        F.count("*").alias("term_count"),
        F.countDistinct("doc_id").alias("doc_freq"),
    )
    top = counts.orderBy(
        F.col("term_count").desc(), F.col("term").asc()
    ).limit(k)
    return rank_post_limit(
        top, "vocab_rank", F.col("term_count").desc(), F.col("term").asc()
    )


VOCAB_TOP_TERMS_SQL = f"""
WITH toks AS (
    SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
counts AS (
    SELECT term, COUNT(*) AS term_count,
           COUNT(DISTINCT doc_id) AS doc_freq
    FROM toks GROUP BY term
),
ranked AS (
    SELECT term, term_count, doc_freq,
           row_number() OVER (ORDER BY term_count DESC, term ASC)
               AS vocab_rank
    FROM counts
)
SELECT term, term_count, doc_freq, vocab_rank
FROM ranked WHERE vocab_rank <= {VOCAB_TOP_K}
"""


#: Sketch capacity for the approx heavy-hitters twin. When capacity ≥
#: distinct-token count the sketch degenerates to exact counting; below
#: it, returned counts over-estimate by at most the evicted mass (the
#: standard space-saving bound).
VOCAB_SKETCH_CAPACITY = 10_000


def vocab_top_terms_approx(
    documents: DataFrame,
    k: int = VOCAB_TOP_K,
    capacity: int = VOCAB_SKETCH_CAPACITY,
) -> DataFrame:
    """:func:`vocab_top_terms` on the NATIVE ``approx_top_k`` sketch
    (Spark 4.1): one pass, mergeable per-partition sketches, O(capacity)
    state instead of a full vocabulary aggregate — the shape that wins
    when the vocabulary itself is too hot to shuffle (URLs, ids, OCR
    noise make real 100 TB corpora's "vocabulary" enormous; the sketch
    bounds memory where the exact groupBy cannot). Tie order at the k
    boundary is sketch-internal, so the contract is set-level (pytest
    bounds vs the exact twin), not a hash oracle — ranks within the
    result are re-sorted deterministically for stable output."""
    toks = documents.select(F.explode(_tokens()).alias("term"))
    sk = toks.agg(
        F.expr(f"approx_top_k(term, {k}, {capacity})").alias("tk")
    )
    out = sk.select(F.explode("tk").alias("e")).select(
        F.col("e.item").alias("term"),
        F.col("e.count").alias("term_count"),
    )
    return rank_post_limit(
        out, "vocab_rank", F.col("term_count").desc(), F.col("term").asc()
    ).orderBy("vocab_rank")


def vocab_top_terms_approx_audit(
    documents: DataFrame,
    k: int = VOCAB_TOP_K,
    capacity: int = VOCAB_SKETCH_CAPACITY,
    rank_slack: int = 5,
    count_rel: float = 0.01,
    count_abs: int = 2,
) -> DataFrame:
    """Bounded driver check for :func:`vocab_top_terms_approx` (VERDICT
    r11 item #8): the sketch's tie order at the k boundary is internal,
    so per-row hash compare is impossible — but two set-level bounds
    are checkable: (1) every returned term sits in the EXACT top
    (k + rank_slack) by count, and (2) each returned count is within
    max(count_rel·exact, count_abs) of the exact count (space-saving
    over-estimates by at most the evicted mass; at the shipped capacity
    the sketch is exact — measured error 0 at sf0.01/sf0.1). Emits ONE
    row: exact token total + returned-k (both SQL-reproducible) + the
    two all-quantified flags the oracle asserts TRUE.

    The exact-rank side only ranks terms at least as frequent as the
    smallest returned count minus the allowed error — a ≤(k+ε)-sized
    relation, so the verification window is bounded and never a global
    vocabulary sort."""
    approx = vocab_top_terms_approx(documents, k, capacity)
    toks = documents.select(F.explode(_tokens()).alias("term"))
    exact = toks.groupBy("term").agg(F.count("*").alias("exact_count"))
    floor_cnt = approx.agg(
        (F.min("term_count") - F.lit(count_abs)).alias("floor_cnt")
    )
    cand = exact.join(F.broadcast(floor_cnt)).filter(
        F.col("exact_count")
        >= F.col("floor_cnt") - F.lit(count_rel) * F.col("exact_count")
    )
    ranked = cand.withColumn(
        "exact_rank",
        F.row_number().over(
            Window.orderBy(
                F.col("exact_count").desc(), F.col("term").asc()
            )
        ),
    )
    j = approx.join(
        ranked.select("term", "exact_count", "exact_rank"), "term", "left"
    )
    per_term = j.select(
        F.coalesce(
            F.col("exact_rank") <= F.lit(k + rank_slack), F.lit(False)
        ).alias("in_top"),
        F.coalesce(
            F.abs(F.col("term_count") - F.col("exact_count"))
            <= F.greatest(
                F.lit(count_rel) * F.col("exact_count"), F.lit(count_abs)
            ),
            F.lit(False),
        ).alias("cnt_ok"),
    )
    totals = exact.agg(
        F.sum("exact_count").alias("n_tokens"),
        F.least(F.lit(k), F.count("*")).cast("long").alias("k_returned"),
    )
    flags = per_term.agg(
        F.min("in_top").alias("in_exact_topk"),
        F.min("cnt_ok").alias("counts_within_bound"),
        F.count("*").alias("_n_ret"),
    )
    return totals.crossJoin(F.broadcast(flags)).select(
        "n_tokens",
        # cross-check: the sketch must return exactly min(k, |vocab|)
        F.when(F.col("_n_ret") == F.col("k_returned"), F.col("k_returned"))
        .otherwise(F.lit(-1))
        .alias("k_returned"),
        "in_exact_topk",
        "counts_within_bound",
    )


VOCAB_APPROX_AUDIT_SQL = f"""
WITH toks AS (
    SELECT unnest(string_split(text, ' ')) AS term FROM documents
)
SELECT COUNT(*)::BIGINT AS n_tokens,
       LEAST({VOCAB_TOP_K}, COUNT(DISTINCT term))::BIGINT AS k_returned,
       TRUE AS in_exact_topk,
       TRUE AS counts_within_bound
FROM toks
"""


# ---------------------------------------------------------------------------
# PII redaction (the privacy-scrub stage of a training-data pipeline)
# ---------------------------------------------------------------------------

#: (tag, pattern) in APPLICATION ORDER. Patterns live in the Java-regex ∩
#: RE2 common subset (no lookaround, no backrefs) so the Spark expression
#: and the DuckDB oracle redact identically. Email runs first so address
#: domains aren't half-eaten by the ipv4 rule; ssn (3-2-4) and phone
#: (3-3-4) group shapes are disjoint by construction.
PII_PATTERNS: tuple[tuple[str, str], ...] = (
    ("EMAIL", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("IPV4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"),
    ("SSN", r"\b\d{3}-\d{2}-\d{4}\b"),
    ("PHONE", r"\b\d{3}[-.]\d{3}[-.]\d{4}\b"),
)


def redact_pii(
    documents: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Redact emails / IPv4s / SSN-shaped / phone-shaped spans from
    ``text_col``, emitting the scrubbed text plus a per-category match
    count (the audit a privacy pass must produce). Pure JVM regex
    expressions — a narrow projection at scan speed, no shuffle, no
    Python; at 100 TB this pipelines into whatever scan feeds it.

    Counts are measured on the ORIGINAL text per category (regexp_count),
    not inferred from replacement deltas, so overlapping categories
    can't mask each other."""
    scrubbed = F.col(text_col)
    for tag, pat in PII_PATTERNS:
        scrubbed = F.regexp_replace(scrubbed, pat, f"[{tag}]")
    out = [
        F.col("doc_id"),
        scrubbed.alias("redacted_text"),
    ]
    for tag, pat in PII_PATTERNS:
        out.append(
            F.size(F.regexp_extract_all(F.col(text_col), F.lit(pat), 0))
            .cast("long")
            .alias(f"n_{tag.lower()}")
        )
    return documents.select(*out)


def _redact_sql_expr(col: str) -> str:
    expr = col
    for tag, pat in PII_PATTERNS:
        expr = f"regexp_replace({expr}, '{pat}', '[{tag}]', 'g')"
    return expr


REDACT_PII_COUNT_COLS = ", ".join(
    f"len(regexp_extract_all(text, '{pat}'))::BIGINT AS n_{tag.lower()}"
    for tag, pat in PII_PATTERNS
)


def pii_scrub(documents: DataFrame) -> DataFrame:
    """:func:`redact_pii` exercised on a corpus with KNOWN planted PII:
    the synthetic documents carry none, so this query entry first
    injects deterministic doc_id-derived spans (an email, an IP, and —
    on every third doc — an SSN-shaped id) with the same concat
    expression the oracle uses, then scrubs them. The assertion value
    is end-to-end: injection, multi-pattern replacement, and the
    per-category audit counts all hash-match DuckDB."""
    injected = documents.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com at 10.0."),
            (F.col("doc_id") % 256).cast("string"),
            F.lit(".7"),
            F.when(
                F.col("doc_id") % 3 == 0,
                F.concat(
                    F.lit(" id 123-45-"),
                    F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
                ),
            ).otherwise(F.lit("")),
        ).alias("text"),
    )
    return redact_pii(injected)


PII_SCRUB_SQL = f"""
WITH injected AS (
    SELECT doc_id,
           text || ' contact user' || doc_id::VARCHAR || '@example.com at 10.0.'
                || (doc_id % 256)::VARCHAR || '.7'
                || CASE WHEN doc_id % 3 = 0
                        THEN ' id 123-45-' || lpad((doc_id % 10000)::VARCHAR, 4, '0')
                        ELSE '' END AS text
    FROM documents
)
SELECT doc_id,
       {_redact_sql_expr("text")} AS redacted_text,
       {REDACT_PII_COUNT_COLS}
FROM injected
"""


# ---------------------------------------------------------------------------
# unigram surprisal (model-free perplexity proxy for quality filtering)
# ---------------------------------------------------------------------------

def unigram_surprisal(documents: DataFrame) -> DataFrame:
    """Per-document mean/max unigram surprisal −ln p(token) under the
    corpus's own unigram distribution — the model-free stand-in for a
    perplexity quality filter: gibberish and boilerplate both stand out
    (high mean; low mean respectively) without shipping a language
    model. Two hash aggregates keyed by token (the same explode the
    vocabulary feed uses) plus one token-keyed join back; the corpus
    token total rides along as a broadcast scalar. No vocabulary cap is
    needed: the frequency relation is (distinct tokens)-sized and joins
    on its own key — at 100 TB that's a shuffle join on term, never a
    driver-side table. Scores round to 6dp (ln/avg precedent: TF-IDF,
    BM25)."""
    toks = documents.select("doc_id", F.explode(_tokens()).alias("term"))
    freqs = toks.groupBy("term").agg(F.count("*").alias("tc"))
    total = F.broadcast(
        freqs.agg(F.sum("tc").cast("double").alias("total"))
    )
    surprisal = -F.log(F.col("tc").cast("double") / F.col("total"))
    return (
        toks.join(freqs, "term")
        .crossJoin(total)
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.round(F.avg(surprisal), 6).alias("avg_surprisal"),
            F.round(F.max(surprisal), 6).alias("max_surprisal"),
        )
    )


UNIGRAM_SURPRISAL_SQL = """
WITH toks AS (
    SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
freqs AS (
    SELECT term, COUNT(*) AS tc FROM toks GROUP BY term
),
total AS (
    SELECT SUM(tc)::DOUBLE AS total FROM freqs
)
SELECT t.doc_id,
       COUNT(*) AS n_tokens,
       round(AVG(-ln(f.tc::DOUBLE / total.total)), 6) AS avg_surprisal,
       round(MAX(-ln(f.tc::DOUBLE / total.total)), 6) AS max_surprisal
FROM toks t JOIN freqs f ON t.term = f.term, total
GROUP BY t.doc_id
"""


# ---------------------------------------------------------------------------
# BPE merge training (the tokenizer-training step itself)
# ---------------------------------------------------------------------------

BPE_MERGES = 8


def _merge_pair(symbols: Column, left: Column, right: Column) -> Column:
    """Greedy left-to-right merge of adjacent (left, right) symbol pairs
    — one sequential fold, entirely JVM-side. The accumulator carries
    (emitted prefix, one pending symbol); a pending `left` followed by
    `right` emits the merged symbol and clears, anything else flushes
    the pending symbol. Greedy-left matches the reference BPE behavior
    on runs ("aaa" + merge(a,a) -> ["aa", "a"])."""
    empty = F.array().cast("array<string>")
    step = lambda acc, s: F.when(  # noqa: E731
        acc["pending"].isNotNull()
        & (acc["pending"] == left)
        & (s == right),
        F.struct(
            F.concat(
                acc["out"], F.array(F.concat(left, right))
            ).alias("out"),
            F.lit(None).cast("string").alias("pending"),
        ),
    ).otherwise(
        F.struct(
            F.when(
                acc["pending"].isNotNull(),
                F.concat(acc["out"], F.array(acc["pending"])),
            )
            .otherwise(acc["out"])
            .alias("out"),
            s.alias("pending"),
        )
    )
    # the trailing flush runs as the aggregate's FINISH lambda: `done`
    # is then a lambda variable, not a copied subtree — with the old
    # when/otherwise form the whole aggregate expression appeared 3x,
    # so chaining k merge rules grew the plan ~3^k and 8 chained rules
    # OOM'd the driver during expression conversion (bpe_encode)
    return F.aggregate(
        symbols,
        F.struct(
            empty.alias("out"), F.lit(None).cast("string").alias("pending")
        ),
        step,
        lambda done: F.when(
            done["pending"].isNotNull(),
            F.concat(done["out"], F.array(done["pending"])),
        ).otherwise(done["out"]),
    )


def train_bpe_merges(
    documents: DataFrame, n_merges: int = BPE_MERGES
) -> DataFrame:
    """Learn ``n_merges`` byte-pair-encoding merge rules from the corpus
    — the tokenizer-training step itself, distributed: BPE trains on
    the WORD-FREQUENCY table (explode + hash agg — vocabulary-sized,
    orders of magnitude smaller than the corpus), so each iteration is
    (1) explode adjacent symbol pairs weighted by word count, (2) one
    tiny top-1 aggregate with a deterministic (count desc, pair asc)
    tiebreak, (3) apply the merge with a JVM fold (no Python). The
    per-iteration driver touch is ONE row (the argmax pair — same
    legitimate coordination as the k-means/pagerank loops);
    ``localCheckpoint`` truncates the growing lineage.

    Returns (step, left, right, merged, pair_count). No SQL oracle —
    iterative argmax with list-rebuild isn't expressible in one DuckDB
    statement; correctness is pinned by pytest against a pure-Python
    reference BPE on the same corpus (exact rule-sequence equality).

    100 TB: the corpus pass is the one explode+agg; iterations run on
    the vocab table, whose size is corpus-independent (≈ millions of
    words), partitioned by word hash."""
    words = (
        documents.select(F.explode(_tokens()).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("wc"))
        .withColumn("syms", F.split(F.col("w"), ""))
        .select("syms", "wc")
        .localCheckpoint(eager=False)
    )
    merges = []
    for step_no in range(n_merges):
        pairs = words.select(
            "wc",
            F.explode(
                F.when(
                    F.size("syms") >= 2,
                    F.transform(
                        F.slice(
                            F.col("syms"), 1, F.size("syms") - 1
                        ),
                        lambda s, i: F.struct(
                            s.alias("left"),
                            F.element_at(
                                F.col("syms"), i + 2
                            ).alias("right"),
                        ),
                    ),
                ).otherwise(F.array().cast(
                    "array<struct<left:string,right:string>>"
                ))
            ).alias("p"),
        )
        top = (
            pairs.groupBy("p")
            .agg(F.sum("wc").alias("pair_count"))
            .orderBy(
                F.col("pair_count").desc(),
                F.col("p.left").asc(),
                F.col("p.right").asc(),
            )
            .limit(1)
            .collect()
        )
        if not top:
            break
        left, right = top[0]["p"]["left"], top[0]["p"]["right"]
        merges.append(
            (step_no, left, right, left + right, int(top[0]["pair_count"]))
        )
        # LAZY checkpoint (r14): the next round's argmax collect is the
        # action that materializes this round's re-symbolized vocab, so
        # each merge costs one job instead of two — and the final
        # round's vocab (referenced by nothing) is never computed at all
        words = words.select(
            _merge_pair(
                F.col("syms"), F.lit(left), F.lit(right)
            ).alias("syms"),
            "wc",
        ).localCheckpoint(eager=False)
    return documents.sparkSession.createDataFrame(
        merges,
        "step long, left string, right string, merged string,"
        " pair_count long",
    )


def train_bpe_merges_audit(
    documents: DataFrame, n_merges: int = BPE_MERGES
) -> DataFrame:
    """Bounded driver check for :func:`train_bpe_merges` (r12 audit-form
    discipline): the merge SEQUENCE is an iterative argmax no single
    SQL statement expresses, but its FIRST step is — the most frequent
    adjacent character pair of the initial symbolization, with the
    trainer's exact (count desc, left asc, right asc) tiebreak — and
    the sequence's structural invariants are flags. One row:

    * ``first_left`` / ``first_right`` / ``first_count`` — recomputed
      independently by the oracle over the raw corpus (a drifted
      tokenization, weighting, or tiebreak breaks the hash);
    * ``n_requested`` + ``emitted_all`` (the corpus supports the full
      merge budget), ``merged_is_concat`` (every rule's merged symbol
      is left||right), ``counts_positive``, ``steps_contiguous`` —
      asserted TRUE by the oracle.
    """
    rules = train_bpe_merges(documents, n_merges).orderBy("step").collect()
    ok_concat = all(r["merged"] == r["left"] + r["right"] for r in rules)
    ok_counts = all(r["pair_count"] >= 1 for r in rules)
    ok_steps = [r["step"] for r in rules] == list(range(len(rules)))
    first = rules[0] if rules else None
    return documents.sparkSession.createDataFrame(
        [
            (
                int(n_merges),
                first["left"] if first else None,
                first["right"] if first else None,
                int(first["pair_count"]) if first else None,
                len(rules) == n_merges,
                ok_concat,
                ok_counts,
                ok_steps,
            )
        ],
        "n_requested long, first_left string, first_right string,"
        " first_count long, emitted_all boolean,"
        " merged_is_concat boolean, counts_positive boolean,"
        " steps_contiguous boolean",
    )


BPE_MERGES_AUDIT_SQL_TEMPLATE = """
WITH words AS (
    SELECT w, COUNT(*) AS wc
    FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
    GROUP BY w
),
syms AS (SELECT regexp_extract_all(w, '.') AS s, wc FROM words),
pairs AS (
    SELECT s[u.i] AS l, s[u.i + 1] AS r, wc
    FROM syms, unnest(generate_series(1, len(s) - 1)) u(i)
    WHERE len(s) >= 2
),
top AS (
    SELECT l, r, SUM(wc)::BIGINT AS c
    FROM pairs GROUP BY l, r
    ORDER BY SUM(wc) DESC, l ASC, r ASC
    LIMIT 1
)
SELECT {n}::BIGINT AS n_requested,
       l AS first_left, r AS first_right, c AS first_count,
       TRUE AS emitted_all, TRUE AS merged_is_concat,
       TRUE AS counts_positive, TRUE AS steps_contiguous
FROM top
"""


def apply_bpe(
    documents: DataFrame, merges: list[tuple[str, str]]
) -> DataFrame:
    """Encode each document's tokens with an ordered list of learned
    (left, right) BPE merge rules (:func:`train_bpe_merges` output).
    Rules apply in training order, each as the same greedy-left JVM
    fold the trainer uses — k rules become k chained expressions over
    the symbol arrays, still one narrow projection per document row
    (no shuffle, no Python). Emits the per-token symbol arrays plus
    before/after symbol counts (the compression-ratio audit)."""
    toks = documents.select(
        "doc_id", F.explode(_tokens()).alias("w")
    )
    syms = F.split(F.col("w"), "")
    n_chars = F.size(syms).cast("long")
    for left, right in merges:
        syms = _merge_pair(syms, F.lit(left), F.lit(right))
    return toks.select(
        "doc_id",
        F.col("w").alias("token"),
        syms.alias("symbols"),
        n_chars.alias("n_chars"),
        F.size(syms).cast("long").alias("n_symbols"),
    )


#: The committed tokenizer artifact: the 8 merge rules
#: :func:`train_bpe_merges` learns on the sf0.01 documents corpus,
#: pinned the way a production pipeline ships tokenizer.json — encoding
#: with a FIXED tokenizer is scale-independent, so :func:`bpe_encode`
#: applies these at any sf (and the static DuckDB twin replays them
#: verbatim). test_llm_pipeline re-trains at sf0.01 and asserts this
#: list, so drift between artifact and trainer is loud, not silent.
BPE_PINNED_MERGES: tuple[tuple[str, str], ...] = (
    ("e", "r"),
    ("i", "n"),
    ("o", "w"),
    ("o", "r"),
    ("s", "t"),
    ("m", "er"),
    ("a", "t"),
    ("l", "u"),
)


def bpe_encode(
    documents: DataFrame,
    merges: tuple[tuple[str, str], ...] = BPE_PINNED_MERGES,
) -> DataFrame:
    """(doc_id, token_idx, sym_idx, symbol, sym_id): every document
    encoded with the pinned BPE merge list — the step that was missing
    between :func:`train_bpe_merges` (produces rules) and a training
    pipeline that needs token ids (VERDICT r4/r5 item #5). Each rule is
    the same greedy-left JVM fold the trainer uses; ``sym_id`` is the
    vocabulary id (row number of the symbol in lexicographic vocab
    order — deterministic in both engines).

    100 TB: the encode itself is a narrow per-row map (k chained folds,
    no Python); the only shuffles are the vocabulary distinct (output
    bounded by |alphabet| + |merges|) and the broadcast id join back.
    """
    toks = documents.select(
        "doc_id",
        F.posexplode(
            F.filter(_tokens(), lambda t: t != F.lit(""))
        ).alias("token_idx", "w"),
    )
    # encode each DISTINCT word once (the same insight as the trainer:
    # BPE work lives on the vocabulary, not the token stream) — the k
    # chained folds run over |vocab| rows, and instances pick up their
    # symbols with a broadcast join. Measured 28s -> ~6s at sf0.1; at
    # 100 TB this is the difference between fold work ∝ corpus tokens
    # and ∝ vocabulary.
    syms = F.split(F.col("w"), "")
    for left, right in merges:
        syms = _merge_pair(syms, F.lit(left), F.lit(right))
    # localCheckpoint is load-bearing, not a cache nicety: without it,
    # Catalyst's constraint propagation infers isnotnull/size(syms)>0
    # from the downstream posexplode and pushes the WHOLE fold
    # expression below the distinct as a per-instance filter — undoing
    # the vocabulary trick (measured 12s -> 1.6s at sf0.1). No
    # broadcast hint: AQE broadcasts a small vocab and falls back to a
    # shuffle join if a 100 TB vocabulary outgrows the limit.
    encoded_vocab = (
        toks.select("w")
        .distinct()
        .select("w", syms.alias("syms"))
        .localCheckpoint(eager=False)
    )
    flat = (
        toks.join(encoded_vocab, "w")
        .select(
            "doc_id",
            F.col("token_idx").cast("long").alias("token_idx"),
            F.posexplode("syms").alias("sym_idx", "symbol"),
        )
        .withColumn("sym_idx", F.col("sym_idx").cast("long"))
    )
    # symbol ids derive from the ENCODED VOCABULARY (alphabet+merges-
    # bounded), never from the exploded token stream — same id set,
    # vocabulary-sized work
    vocab = rank_post_limit(
        encoded_vocab.select(F.explode("syms").alias("symbol")).distinct(),
        "sym_id",
        F.col("symbol").asc(),
    )
    return flat.join(F.broadcast(vocab), "symbol").select(
        "doc_id", "token_idx", "sym_idx", "symbol", "sym_id"
    )


def _bpe_fold_sql(syms_expr: str, left: str, right: str) -> str:
    """DuckDB twin of one :func:`_merge_pair` fold: ``list_reduce`` over
    a chr(30)-delimited accumulator string whose last segment is the
    pending symbol (empty segment = no pending) — byte-for-byte the
    greedy-left semantics, verified on odd runs ('aaaaa' -> aa,aa,a)."""
    lam = (
        f"list_reduce({syms_expr}, (acc, x) -> CASE "
        f"WHEN array_extract(string_split(acc, chr(30)), -1) = '{left}'"
        f" AND x = '{right}' "
        f"THEN substr(acc, 1, length(acc) - length('{left}'))"
        f" || '{left}{right}' || chr(30) "
        f"ELSE acc || chr(30) || x END)"
    )
    return f"list_filter(string_split({lam}, chr(30)), s -> s <> '')"


def _bpe_encode_sql(
    merges: tuple[tuple[str, str], ...] = BPE_PINNED_MERGES,
) -> str:
    enc = "string_split(tok, '')"
    for left, right in merges:
        enc = _bpe_fold_sql(enc, left, right)
    return f"""
WITH toks0 AS (
    SELECT doc_id,
           unnest(list_transform(
               generate_series(1, len(tl)),
               i -> struct_pack(i := i, tok := tl[i])
           )) AS t
    FROM (
        SELECT doc_id,
               list_filter(string_split(text, ' '), x -> x <> '') AS tl
        FROM documents
    )
),
toks AS (
    SELECT doc_id, (t.i - 1)::BIGINT AS token_idx, t.tok AS tok FROM toks0
),
enc AS (SELECT doc_id, token_idx, {enc} AS syms FROM toks),
flat0 AS (
    SELECT doc_id, token_idx,
           unnest(list_transform(
               generate_series(1, len(syms)),
               i -> struct_pack(i := i, sym := syms[i])
           )) AS s
    FROM enc
),
flat AS (
    SELECT doc_id, token_idx, (s.i - 1)::BIGINT AS sym_idx, s.sym AS symbol
    FROM flat0
),
vocab AS (
    SELECT symbol, row_number() OVER (ORDER BY symbol)::BIGINT AS sym_id
    FROM (SELECT DISTINCT symbol FROM flat)
)
SELECT f.doc_id, f.token_idx, f.sym_idx, f.symbol, v.sym_id
FROM flat f JOIN vocab v USING (symbol)
"""


BPE_ENCODE_SQL = _bpe_encode_sql()


def bpe_fertility(
    documents: DataFrame,
    merges: tuple[tuple[str, str], ...] = BPE_PINNED_MERGES,
) -> DataFrame:
    """Per-source tokenizer-efficiency audit over :func:`bpe_encode`:
    fertility (symbols per word — the standard tokenizer-fit metric) and
    chars per symbol. A source whose fertility stays near character
    count is one the merge table serves poorly — it pays more sequence
    length per byte of text, which is exactly the signal that drives
    domain-weighted tokenizer retraining.

    One aggregate keyed by source over the encode stream; word counts
    come from distinct (doc_id, token_idx), never a re-tokenization."""
    enc = bpe_encode(documents, merges)
    j = enc.join(documents.select("doc_id", "source"), "doc_id")
    return (
        j.groupBy("source")
        .agg(
            F.count_distinct(F.col("doc_id"), F.col("token_idx")).alias(
                "n_words"
            ),
            F.count("*").alias("n_symbols"),
            F.sum(F.length("symbol")).alias("n_chars"),
        )
        .select(
            "source",
            "n_words",
            "n_symbols",
            "n_chars",
            F.round(
                F.col("n_symbols").cast("double")
                / F.col("n_words").cast("double"),
                6,
            ).alias("fertility"),
            F.round(
                F.col("n_chars").cast("double")
                / F.col("n_symbols").cast("double"),
                6,
            ).alias("chars_per_symbol"),
        )
    )


BPE_FERTILITY_SQL = f"""
WITH enc AS ({BPE_ENCODE_SQL}),
j AS (
    SELECT e.doc_id, e.token_idx, e.symbol, d.source
    FROM enc e JOIN documents d USING (doc_id)
)
SELECT source,
       count(DISTINCT (doc_id, token_idx))::BIGINT AS n_words,
       count(*)::BIGINT AS n_symbols,
       sum(length(symbol))::BIGINT AS n_chars,
       round(count(*)::DOUBLE / count(DISTINCT (doc_id, token_idx)), 6)
           AS fertility,
       round(sum(length(symbol))::DOUBLE / count(*), 6) AS chars_per_symbol
FROM j GROUP BY source
"""


def bpe_roundtrip(
    documents: DataFrame,
    merges: tuple[tuple[str, str], ...] = BPE_PINNED_MERGES,
) -> DataFrame:
    """Losslessness audit for the pinned tokenizer: decode
    :func:`bpe_encode`'s symbol stream back to text (symbols concatenated
    per token in sym_idx order, tokens joined in token_idx order) and
    compare against the whitespace-normalized original. BPE merges only
    ever concatenate adjacent symbols, so decode must be the identity —
    a row with ``roundtrip_ok = false`` means the merge fold corrupted a
    token, the gate a production pipeline runs before shipping token ids
    to training.

    Plan: two ordered grouped aggregates over the encode output
    (sort_array over (idx, symbol) structs — no global sort, group state
    is one document) plus a broadcast-sized join back to the normalized
    originals."""
    enc = bpe_encode(documents, merges)
    tok = enc.groupBy("doc_id", "token_idx").agg(
        F.concat_ws(
            "",
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("sym_idx", "symbol"))
                ),
                lambda s: s["symbol"],
            ),
        ).alias("tok"),
        F.count("*").alias("n_syms"),
    )
    decoded = tok.groupBy("doc_id").agg(
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(F.struct("token_idx", "tok"))),
                lambda s: s["tok"],
            ),
        ).alias("decoded"),
        F.count("*").alias("n_tokens"),
        F.sum("n_syms").alias("n_symbols"),
    )
    normalized = documents.select(
        "doc_id",
        F.concat_ws(
            " ", F.filter(_tokens(), lambda t: t != F.lit(""))
        ).alias("norm_text"),
    )
    return decoded.join(normalized, "doc_id").select(
        "doc_id",
        "n_tokens",
        "n_symbols",
        (F.col("decoded") == F.col("norm_text")).alias("roundtrip_ok"),
    )


BPE_ROUNDTRIP_SQL = f"""
WITH enc AS ({BPE_ENCODE_SQL}),
tok AS (
    SELECT doc_id, token_idx,
           string_agg(symbol, '' ORDER BY sym_idx) AS tok,
           count(*) AS n_syms
    FROM enc GROUP BY doc_id, token_idx
),
decoded AS (
    SELECT doc_id,
           string_agg(tok, ' ' ORDER BY token_idx) AS decoded,
           count(*)::BIGINT AS n_tokens,
           sum(n_syms)::BIGINT AS n_symbols
    FROM tok GROUP BY doc_id
),
normalized AS (
    SELECT doc_id,
           array_to_string(list_filter(string_split(text, ' '),
                                       x -> x <> ''), ' ') AS norm_text
    FROM documents
)
SELECT d.doc_id, d.n_tokens, d.n_symbols,
       d.decoded = n.norm_text AS roundtrip_ok
FROM decoded d JOIN normalized n USING (doc_id)
"""


# ---------------------------------------------------------------------------
# Gopher-style quality-filter rules
# ---------------------------------------------------------------------------

#: Rule thresholds, Gopher-flavored (Rae et al. 2021 §A1.1) but tuned so
#: the synthetic corpus exercises both branches of each rule.
QF_MIN_TOKENS = 20
QF_MAX_TOKENS = 1_000
QF_MIN_AVG_TOKEN_LEN = 3.0
QF_MAX_AVG_TOKEN_LEN = 10.0
QF_MAX_SYMBOL_RATIO = 0.1
QF_MIN_DISTINCT_STOPWORDS = 2
QF_MAX_TOP_TOKEN_RATIO = 0.2

#: Non-alphanumeric, non-space marks ("symbols" in the Gopher sense).
_SYMBOL_RE = "[^A-Za-z0-9 ]"


def quality_filter_rules(documents: DataFrame) -> DataFrame:
    """Per-document boolean quality rules + the AND'd keep decision — the
    rule-based document filter every pre-training pipeline runs before
    dedup (Gopher-style: word-count bounds, mean-word-length bounds,
    symbol ratio, stopword evidence, single-token repetition cap).

    Unlike :func:`text_quality` (a soft score for ranking), these are the
    hard gates: each rule is its own column so the pipeline can audit
    WHICH rule killed a document (per-rule kill counts roll up with one
    agg over this output). Pure column math over the token array — no
    shuffle, no Python; scales as a narrow map at 100 TB.

    The repetition rule's inner loop is O(distinct x tokens) per doc —
    bounded by document length, not corpus size, so it stays a per-row
    constant in whole-stage codegen.
    """
    toks = _tokens()
    nt = F.size(toks).cast("long")
    avg_len = F.length(F.regexp_replace("text", " ", "")).cast("double") / nt
    sym_ratio = (
        F.regexp_count(F.col("text"), F.lit(_SYMBOL_RE)).cast("double") / nt
    )
    n_stop_distinct = F.size(
        F.array_intersect(
            F.array_distinct(toks), F.array(*[F.lit(w) for w in STOPWORDS])
        )
    ).cast("long")
    top_tok = F.array_max(
        F.transform(
            F.array_distinct(toks),
            lambda t: F.size(F.filter(toks, lambda x: x == t)),
        )
    )
    top_ratio = top_tok.cast("double") / nt
    r_count = (nt >= QF_MIN_TOKENS) & (nt <= QF_MAX_TOKENS)
    r_len = (avg_len >= QF_MIN_AVG_TOKEN_LEN) & (avg_len <= QF_MAX_AVG_TOKEN_LEN)
    r_sym = sym_ratio <= QF_MAX_SYMBOL_RATIO
    r_stop = n_stop_distinct >= QF_MIN_DISTINCT_STOPWORDS
    r_rep = top_ratio <= QF_MAX_TOP_TOKEN_RATIO
    return documents.select(
        "doc_id",
        nt.alias("n_tokens"),
        r_count.alias("rule_word_count"),
        r_len.alias("rule_mean_word_len"),
        r_sym.alias("rule_symbol_ratio"),
        r_stop.alias("rule_stopwords"),
        r_rep.alias("rule_repetition"),
        (r_count & r_len & r_sym & r_stop & r_rep).alias("keep"),
    )


QUALITY_FILTER_RULES_SQL = f"""
WITH t AS (
    SELECT doc_id, text, string_split(text, ' ') AS toks,
           len(string_split(text, ' '))::BIGINT AS nt
    FROM documents
), m AS (
    SELECT doc_id, nt,
           length(replace(text, ' ', ''))::DOUBLE / nt AS avg_len,
           len(regexp_extract_all(text, '{_SYMBOL_RE}'))::DOUBLE / nt
               AS sym_ratio,
           len(list_intersect(list_distinct(toks),
                              [{_STOP_SQL}]))::BIGINT AS n_stop,
           list_max(list_transform(list_distinct(toks),
               t2 -> len(list_filter(toks, x -> x = t2))))::DOUBLE / nt
               AS top_ratio
    FROM t
)
SELECT doc_id, nt AS n_tokens,
       (nt >= {QF_MIN_TOKENS} AND nt <= {QF_MAX_TOKENS}) AS rule_word_count,
       (avg_len >= {QF_MIN_AVG_TOKEN_LEN} AND avg_len <= {QF_MAX_AVG_TOKEN_LEN})
           AS rule_mean_word_len,
       sym_ratio <= {QF_MAX_SYMBOL_RATIO} AS rule_symbol_ratio,
       n_stop >= {QF_MIN_DISTINCT_STOPWORDS} AS rule_stopwords,
       top_ratio <= {QF_MAX_TOP_TOKEN_RATIO} AS rule_repetition,
       ((nt >= {QF_MIN_TOKENS} AND nt <= {QF_MAX_TOKENS})
        AND (avg_len >= {QF_MIN_AVG_TOKEN_LEN} AND avg_len <= {QF_MAX_AVG_TOKEN_LEN})
        AND sym_ratio <= {QF_MAX_SYMBOL_RATIO}
        AND n_stop >= {QF_MIN_DISTINCT_STOPWORDS}
        AND top_ratio <= {QF_MAX_TOP_TOKEN_RATIO}) AS keep
FROM m
"""


def quality_kill_report(documents: DataFrame) -> DataFrame:
    """The per-rule kill counts :func:`quality_filter_rules` promises:
    one row per rule with how many documents it ALONE would kill, how
    many it kills in concert (failing docs also failing another rule),
    and the overall keep rate — the audit a pipeline owner reads before
    tuning thresholds. One aggregate over the rules relation (a narrow
    map at any scale; the rollup is 5 rows)."""
    rules = quality_filter_rules(documents)
    rule_cols = [
        "rule_word_count",
        "rule_mean_word_len",
        "rule_symbol_ratio",
        "rule_stopwords",
        "rule_repetition",
    ]
    n_failed = sum(
        F.when(~F.col(c), 1).otherwise(0) for c in rule_cols
    )
    base = rules.withColumn("n_failed", n_failed)
    # ONE aggregate computes every rule's counters (a single pass over
    # the rules relation — the 100 TB shape), then a 5-element explode
    # pivots the row to rule grain
    aggs = []
    for c in rule_cols:
        aggs.append(
            F.sum(F.when(~F.col(c), 1).otherwise(0))
            .cast("long")
            .alias(f"kills_{c}")
        )
        aggs.append(
            F.sum(F.when(~F.col(c) & (F.col("n_failed") == 1), 1).otherwise(0))
            .cast("long")
            .alias(f"sole_{c}")
        )
    one = base.agg(
        *aggs,
        F.count("*").cast("long").alias("n_docs"),
        F.sum(F.when(F.col("keep"), 1).otherwise(0)).cast("long").alias("kept"),
    )
    stacked = one.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("rule"),
                        F.col(f"kills_{c}").alias("kills"),
                        F.col(f"sole_{c}").alias("sole_kills"),
                    )
                    for c in rule_cols
                ]
            )
        ).alias("r"),
        "n_docs",
        "kept",
    )
    return stacked.select(
        F.col("r.rule").alias("rule"),
        F.col("r.kills").alias("kills"),
        F.col("r.sole_kills").alias("sole_kills"),
        F.round(F.col("kept").cast("double") / F.col("n_docs"), 6).alias(
            "keep_rate"
        ),
    )


def _quality_kill_report_sql() -> str:
    rule_cols = (
        "rule_word_count",
        "rule_mean_word_len",
        "rule_symbol_ratio",
        "rule_stopwords",
        "rule_repetition",
    )
    n_failed = " + ".join(f"(NOT {c})::INT" for c in rule_cols)
    arms = " UNION ALL ".join(
        f"""
    SELECT '{c}' AS rule,
           SUM((NOT {c})::INT)::BIGINT AS kills,
           SUM((NOT {c} AND n_failed = 1)::INT)::BIGINT AS sole_kills,
           round(SUM(keep::INT)::DOUBLE / COUNT(*), 6) AS keep_rate
    FROM base"""
        for c in rule_cols
    )
    return f"""
WITH rules AS ({{rules_sql}}),
base AS (SELECT *, {n_failed} AS n_failed FROM rules)
{arms}
"""


QUALITY_KILL_REPORT_SQL = _quality_kill_report_sql().replace(
    "{rules_sql}", QUALITY_FILTER_RULES_SQL
)


# ---------------------------------------------------------------------------
# cross-document boilerplate spans (substring-dedup at token-window grain)
# ---------------------------------------------------------------------------

#: Window width (tokens) and min document frequency for a span to count
#: as corpus boilerplate. 3-grams at df>=5 mark real repeats at every
#: test scale factor while staying sparse (<2% of distinct shingles).
BOILERPLATE_N = 3
BOILERPLATE_MIN_DF = 5


def _positional_shingles(documents: DataFrame, n: int) -> DataFrame:
    """(doc_id, start, shingle) for every token window of width n —
    positional (NOT distinct): removal needs every occurrence."""
    toks = _tokens()
    nt = F.size(toks)
    starts = F.when(nt >= n, F.sequence(F.lit(0), nt - n)).otherwise(
        F.array().cast("array<int>")
    )
    return documents.select(
        "doc_id",
        F.posexplode(
            F.transform(
                starts, lambda s: F.concat_ws(" ", F.slice(toks, s + 1, n))
            )
        ).alias("start", "shingle"),
    )


def boilerplate_shingles(
    documents: DataFrame,
    n: int = BOILERPLATE_N,
    min_df: int = BOILERPLATE_MIN_DF,
) -> DataFrame:
    """Corpus boilerplate spans: token n-grams whose document frequency
    reaches ``min_df`` (the repeated headers/footers/license blocks of a
    web corpus). One hash-agg shuffle on the shingle key; df is distinct
    docs, so a span repeating inside one page doesn't qualify."""
    return (
        _positional_shingles(documents, n)
        .groupBy("shingle")
        .agg(F.countDistinct("doc_id").cast("long").alias("df"))
        .filter(F.col("df") >= min_df)
    )


BOILERPLATE_SHINGLES_SQL = f"""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
sh AS (
    SELECT doc_id, u.i AS start,
           array_to_string(toks[u.i + 1 : u.i + {BOILERPLATE_N}], ' ')
               AS shingle
    FROM t, unnest(range(0, greatest(len(toks) - {BOILERPLATE_N} + 1, 0)))
        AS u(i)
)
SELECT shingle, count(DISTINCT doc_id)::BIGINT AS df
FROM sh GROUP BY shingle HAVING count(DISTINCT doc_id) >= {BOILERPLATE_MIN_DF}
"""


def remove_boilerplate(
    documents: DataFrame,
    n: int = BOILERPLATE_N,
    min_df: int = BOILERPLATE_MIN_DF,
) -> DataFrame:
    """Exact-substring dedup at token-window grain (the ExactSubstr pass
    of Lee et al. 2022, re-expressed relationally): every token covered
    by ANY occurrence of a corpus-frequent n-gram is dropped, and the
    cleaned text is rebuilt from the survivors in order.

    Plan shape at 100 TB: one shingle-key hash agg finds the hot set
    (small — boilerplate is by definition a tiny distinct set, so it
    broadcasts); occurrences join it broadcast-side and collapse to a
    per-doc start list; the rebuild is then a narrow array projection
    per document (filter-with-index over the token array) — no second
    wide shuffle, no Python. Docs shorter than n tokens pass through
    untouched via the left join.
    """
    toks = _tokens()
    nt = F.size(toks).cast("long")
    hot = boilerplate_shingles(documents, n, min_df).select("shingle")
    hot_starts = (
        _positional_shingles(documents, n)
        .join(F.broadcast(hot), "shingle")
        .groupBy("doc_id")
        .agg(F.collect_set("start").alias("starts"))
    )
    starts = F.coalesce(F.col("starts"), F.array().cast("array<int>"))
    kept = F.filter(
        toks,
        lambda t, i: ~F.exists(
            starts, lambda s: (i >= s) & (i < s + F.lit(n))
        ),
    )
    return (
        documents.join(hot_starts, "doc_id", "left")
        .select(
            "doc_id",
            nt.alias("n_tokens"),
            (nt - F.size(kept).cast("long")).alias("n_removed"),
            F.concat_ws(" ", kept).alias("clean_text"),
        )
    )


REMOVE_BOILERPLATE_SQL = f"""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
sh AS (
    SELECT doc_id, u.i AS start,
           array_to_string(toks[u.i + 1 : u.i + {BOILERPLATE_N}], ' ')
               AS shingle
    FROM t, unnest(range(0, greatest(len(toks) - {BOILERPLATE_N} + 1, 0)))
        AS u(i)
),
hot AS (
    SELECT shingle FROM sh
    GROUP BY shingle HAVING count(DISTINCT doc_id) >= {BOILERPLATE_MIN_DF}
),
pos AS (
    SELECT doc_id, u.i AS pos, toks[u.i + 1] AS tok
    FROM t, unnest(range(0, len(toks))) AS u(i)
),
covered AS (
    SELECT DISTINCT s.doc_id, p.pos
    FROM sh s JOIN hot USING (shingle)
    JOIN pos p ON p.doc_id = s.doc_id
              AND p.pos BETWEEN s.start AND s.start + {BOILERPLATE_N - 1}
),
kept AS (
    SELECT p.doc_id, count(*)::BIGINT AS n_kept,
           string_agg(p.tok, ' ' ORDER BY p.pos) AS clean_text
    FROM pos p
    LEFT JOIN covered c ON c.doc_id = p.doc_id AND c.pos = p.pos
    WHERE c.pos IS NULL
    GROUP BY p.doc_id
)
SELECT t.doc_id, len(t.toks)::BIGINT AS n_tokens,
       (len(t.toks) - coalesce(k.n_kept, 0))::BIGINT AS n_removed,
       coalesce(k.clean_text, '') AS clean_text
FROM t LEFT JOIN kept k USING (doc_id)
"""


# ---------------------------------------------------------------------------
# data-mix diagnostics: per-source unigram divergence
# ---------------------------------------------------------------------------

def source_divergence(documents: DataFrame) -> DataFrame:
    """Per-source KL divergence of the source's unigram distribution
    from the whole-corpus distribution — the data-mix diagnostic that
    tells you which sources are lexically "far" from the blend (a
    divergent source is either valuable diversity or contamination;
    either way you want the number before setting mix weights).

    KL(q_s || p) = Σ_t q_s(t)·ln(q_s(t)/p(t)), q_s the source's term
    frequencies, p the corpus's. Finite by construction (every source
    term exists in the corpus). Two token-keyed hash aggregates + one
    term join — the same shuffle family as TF-IDF; nothing driver-side.
    Per-term contributions snap to 12 decimals and sum as DECIMAL
    (order-independent — the cross-engine double-sum discipline), then
    the result rounds to 6.
    """
    toks = documents.select("source", F.explode(_tokens()).alias("term"))
    stc = toks.groupBy("source", "term").agg(F.count("*").alias("stc"))
    tc = toks.groupBy("term").agg(F.count("*").alias("tc"))
    totals = stc.groupBy("source").agg(F.sum("stc").alias("total_s"))
    total = F.broadcast(tc.agg(F.sum("tc").cast("double").alias("total")))
    q = F.col("stc").cast("double") / F.col("total_s")
    p = F.col("tc").cast("double") / F.col("total")
    contrib = F.round(q * F.log(q / p), 12).cast("decimal(28,12)")
    return (
        stc.join(tc, "term")
        .join(totals, "source")
        .crossJoin(total)
        .groupBy("source")
        .agg(
            F.max("total_s").cast("long").alias("n_tokens"),
            F.count("*").cast("long").alias("n_distinct_terms"),
            F.round(F.sum(contrib).cast("double"), 6).alias("kl_vs_corpus"),
        )
    )


SOURCE_DIVERGENCE_SQL = """
WITH toks AS (
    SELECT source, unnest(string_split(text, ' ')) AS term FROM documents
),
stc AS (
    SELECT source, term, COUNT(*) AS stc FROM toks GROUP BY source, term
),
tc AS (SELECT term, COUNT(*) AS tc FROM toks GROUP BY term),
totals AS (SELECT source, SUM(stc) AS total_s FROM stc GROUP BY source),
total AS (SELECT SUM(tc)::DOUBLE AS total FROM tc)
SELECT s.source,
       MAX(t.total_s)::BIGINT AS n_tokens,
       COUNT(*)::BIGINT AS n_distinct_terms,
       round(SUM(CAST(round(
           (s.stc::DOUBLE / t.total_s)
           * ln((s.stc::DOUBLE / t.total_s) / (c.tc::DOUBLE / total.total)),
           12) AS DECIMAL(28,12)))::DOUBLE, 6) AS kl_vs_corpus
FROM stc s
JOIN tc c ON s.term = c.term
JOIN totals t ON s.source = t.source, total
GROUP BY s.source
"""


# ---------------------------------------------------------------------------
# packing-efficiency audit
# ---------------------------------------------------------------------------

def packing_efficiency(
    documents: DataFrame, target_tokens: int = PACK_TARGET_TOKENS
) -> DataFrame:
    """Per-example fill audit of the sequence packer: member/token
    counts, fill ratio against the token budget, and the signed padding
    tail. ``padding_tokens`` > 0 is the pad a trainer adds; < 0 is
    overflow — :func:`pack_chunks` assigns a chunk by its START offset,
    so a chunk straddling an example boundary overflows the earlier
    example by up to chunk_tokens - 1 (the audit is where that shows).
    One agg over the packing assignment — never recomputed per metric."""
    assigned = pack_chunks(documents, target_tokens)
    return assigned.groupBy("example_id").agg(
        F.count("*").cast("long").alias("n_chunks"),
        F.sum("chunk_tokens").cast("long").alias("example_tokens"),
        F.round(
            F.sum("chunk_tokens").cast("double") / F.lit(float(target_tokens)),
            6,
        ).alias("fill_ratio"),
        (F.lit(target_tokens) - F.sum("chunk_tokens"))
        .cast("long")
        .alias("padding_tokens"),
    )


PACKING_EFFICIENCY_SQL = f"""
WITH assigned AS ({PACK_CHUNKS_SQL})
SELECT example_id,
       COUNT(*)::BIGINT AS n_chunks,
       SUM(chunk_tokens)::BIGINT AS example_tokens,
       round(SUM(chunk_tokens)::DOUBLE / {PACK_TARGET_TOKENS}, 6)
           AS fill_ratio,
       ({PACK_TARGET_TOKENS} - SUM(chunk_tokens))::BIGINT AS padding_tokens
FROM assigned
GROUP BY example_id
"""


# ---------------------------------------------------------------------------
# bigram surprisal (context-aware perplexity proxy)
# ---------------------------------------------------------------------------

BIGRAM_ALPHA = 0.5


def bigram_surprisal(
    documents: DataFrame, alpha: float = BIGRAM_ALPHA
) -> DataFrame:
    """Per-document mean/max bigram surprisal −ln p(w₂|w₁) under the
    corpus's own add-α-smoothed bigram model — the context-aware rung
    above :func:`unigram_surprisal`: a document of individually-common
    words in an improbable ORDER (shuffled text, spam keyword salads)
    scores high here while the unigram proxy waves it through.

    p(w₂|w₁) = (c(w₁w₂) + α) / (c(w₁·) + α·V), with c(w₁·) the count of
    bigram instances starting with w₁ and V the unigram vocabulary.
    Bigrams come from one array-expression zip (no positional
    self-join); the model is two hash aggregates on bigram/left keys
    joined back on their own keys — the same shuffle economics as the
    unigram scorer at any corpus size. Docs under 2 tokens carry no
    bigram and drop out. Scores round to 6dp (ln/avg precedent)."""
    toks_arr = F.split(F.col("text"), " ")
    n = F.size(toks_arr)
    bigr = (
        documents.select(
            "doc_id",
            F.explode(
                F.zip_with(
                    F.slice(toks_arr, F.lit(1), n - 1),
                    F.slice(toks_arr, F.lit(2), n - 1),
                    lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
                )
            ).alias("bg"),
        )
        .select("doc_id", "bg.w1", "bg.w2")
    )
    c2 = bigr.groupBy("w1", "w2").agg(F.count("*").alias("c2"))
    c1 = bigr.groupBy("w1").agg(F.count("*").alias("c1"))
    vocab = F.broadcast(
        documents.select(F.explode(_tokens()).alias("term"))
        .agg(F.countDistinct("term").cast("double").alias("v"))
    )
    p = (F.col("c2") + F.lit(alpha)) / (
        F.col("c1") + F.lit(alpha) * F.col("v")
    )
    return (
        bigr.join(c2, ["w1", "w2"])
        .join(c1, "w1")
        .crossJoin(vocab)
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.round(F.avg(-F.log(p)), 6).alias("avg_surprisal"),
            F.round(F.max(-F.log(p)), 6).alias("max_surprisal"),
        )
    )


BIGRAM_SURPRISAL_SQL = f"""
WITH parts AS (
    SELECT doc_id, string_split(text, ' ') AS t,
           len(string_split(text, ' ')) AS n
    FROM documents
),
bigr AS (
    SELECT doc_id, t[i] AS w1, t[i + 1] AS w2
    FROM parts, LATERAL unnest(generate_series(1, n - 1)) u(i)
    WHERE n >= 2
),
c2 AS (SELECT w1, w2, COUNT(*) AS c2 FROM bigr GROUP BY 1, 2),
c1 AS (SELECT w1, COUNT(*) AS c1 FROM bigr GROUP BY 1),
vocab AS (
    SELECT COUNT(DISTINCT term)::DOUBLE AS v
    FROM (SELECT unnest(string_split(text, ' ')) AS term FROM documents)
)
SELECT b.doc_id,
       COUNT(*) AS n_bigrams,
       round(AVG(-ln((c2.c2 + {BIGRAM_ALPHA}) / (c1.c1 + {BIGRAM_ALPHA} * v))), 6)
           AS avg_surprisal,
       round(MAX(-ln((c2.c2 + {BIGRAM_ALPHA}) / (c1.c1 + {BIGRAM_ALPHA} * v))), 6)
           AS max_surprisal
FROM bigr b
JOIN c2 ON b.w1 = c2.w1 AND b.w2 = c2.w2
JOIN c1 ON b.w1 = c1.w1, vocab
GROUP BY b.doc_id
"""


# ---------------------------------------------------------------------------
# corpus card (dataset-documentation summary per source)
# ---------------------------------------------------------------------------

SHORT_DOC_TOKENS = 20


def corpus_card(documents: DataFrame) -> DataFrame:
    """Per-source dataset-card row: the summary table a dataset README
    publishes (docs, token volume, length profile, short-doc and
    language mix) — one hash aggregate over the corpus, all metrics
    exact. Pairs with :func:`source_divergence` (distributional view)
    and the dedup funnel (processing view) for the full card."""
    n_tokens = F.size(_tokens())
    return (
        documents.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(n_tokens).alias("n_tokens"),
            F.round(F.avg("n_chars"), 2).alias("avg_chars"),
            F.sum(
                F.when(n_tokens < SHORT_DOC_TOKENS, 1).otherwise(0)
            ).alias("short_docs"),
            F.countDistinct("lang").alias("n_langs"),
        )
        .orderBy("source")
    )


CORPUS_CARD_SQL = f"""
SELECT source,
       COUNT(*) AS n_docs,
       SUM(len(string_split(text, ' ')))::BIGINT AS n_tokens,
       round(AVG(n_chars), 2) AS avg_chars,
       SUM(CASE WHEN len(string_split(text, ' ')) < {SHORT_DOC_TOKENS}
                THEN 1 ELSE 0 END)::BIGINT AS short_docs,
       COUNT(DISTINCT lang) AS n_langs
FROM documents
GROUP BY source
ORDER BY source
"""


# ---------------------------------------------------------------------------
# multinomial naive-Bayes source classifier (distributed train + score)
# ---------------------------------------------------------------------------

#: log-prob terms are rounded here, then summed as DECIMAL(38,12) —
#: partition-order-exact (the pagerank discipline for float folds).
NB_TERM_ROUND = 12
_NB_DEC = "decimal(38,12)"


def _nb_predictions(
    train_docs: DataFrame, score_docs: DataFrame
) -> DataFrame:
    """Shared NB core: train per-(source, token) statistics on
    ``train_docs``, score ``score_docs`` against every candidate source.
    Vocabulary, totals and priors come from the TRAIN side only, so the
    holdout form sees eval tokens exactly as unseen-token smoothing
    (coalesce(c,0)+1). Both relations need (doc_id, text, source).

    Plan shape (r14, guide §2.5/§3.1): the documents scan is one file at
    bench scale, and the ~300x token explode inherits that single
    partition — both sides spread across the cluster parallelism before
    exploding so tokenization isn't serialized on one core. The scoring
    join broadcasts the model (|sources|x|vocab|, corpus-growth ~log —
    the documented broadcast-sized relation): the exploded token stream
    is never shuffled, the partial aggregate reduces it map-side, and
    the only exchange left carries ~|docs|x|sources| aggregated rows."""
    from music_streaming_etl_glue_spark.operators.dedup import _spread

    train_docs = _spread(train_docs)
    score_docs = _spread(score_docs)
    train_toks = train_docs.select(
        F.col("source").alias("src"),
        F.explode(F.filter(_tokens(), lambda t: t != F.lit(""))).alias(
            "token"
        ),
    )
    model = train_toks.groupBy("src", "token").agg(F.count("*").alias("c"))
    totals = model.groupBy("src").agg(F.sum("c").alias("tot"))
    vocab_n = F.broadcast(
        train_toks.agg(F.count_distinct("token").alias("v_size"))
    )
    priors = train_docs.groupBy(F.col("source").alias("src")).agg(
        F.count("*").alias("n_docs")
    )
    n_total = F.broadcast(train_docs.agg(F.count("*").alias("n_total")))

    score_toks = score_docs.select(
        "doc_id",
        F.col("source").alias("actual_source"),
        F.explode(F.filter(_tokens(), lambda t: t != F.lit(""))).alias(
            "token"
        ),
    )
    term = F.round(
        F.log(
            (F.coalesce(F.col("c"), F.lit(0)) + 1).cast("double")
            / (F.col("tot") + F.col("v_size")).cast("double")
        ),
        NB_TERM_ROUND,
    ).cast(_NB_DEC)
    scored_terms = (
        score_toks.crossJoin(F.broadcast(priors.select("src")))
        .join(F.broadcast(model), ["src", "token"], "left")
        .join(F.broadcast(totals), "src")
        .crossJoin(vocab_n)
        .select("doc_id", "actual_source", "src", term.alias("term"))
    )
    prior_term = F.round(
        F.log(
            F.col("n_docs").cast("double") / F.col("n_total").cast("double")
        ),
        NB_TERM_ROUND,
    ).cast(_NB_DEC)
    doc_scores = (
        scored_terms.groupBy("doc_id", "actual_source", "src")
        .agg(F.sum("term").alias("s"))
        .join(F.broadcast(priors), "src")
        .crossJoin(n_total)
        .select(
            "doc_id",
            "actual_source",
            "src",
            (F.col("s") + prior_term).alias("score"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("src").asc()
    )
    return (
        doc_scores.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(
            "doc_id",
            F.col("src").alias("predicted_source"),
            "actual_source",
            (F.col("src") == F.col("actual_source")).alias("correct"),
            F.round(F.col("score").cast("double"), 6).alias("score"),
        )
    )


def nb_source_classifier(documents: DataFrame) -> DataFrame:
    """Multinomial naive Bayes over whitespace tokens, trained and applied
    distributed — the domain-tagging step of a training-data pipeline
    (classify scraped text into source domains), run here as a
    resubstitution audit against the ground-truth ``source`` column.

    Train: per-(source, token) counts, per-source totals, vocabulary size
    and per-source doc priors — three hash aggregates over the exploded
    token stream, all model relations broadcast-sized (|sources|·|vocab|).
    Score: each token instance joins the model once per candidate source
    (the scoring relation is tokens × |sources| — linear in the corpus,
    |sources| is small and bounded), add-1 smoothed log-likelihood
    ``ln((c+1)/(tot+V))`` plus the ``ln(n_docs/N)`` prior. Each term is
    rounded to 12dp and summed as DECIMAL(38,12), so per-(doc, source)
    scores are bit-stable under partition order and retries; argmax
    breaks ties by source name. The ~1e-10 worst-case rounding drift
    sits 3 orders of magnitude under the 6dp output rounding.

    Output: (doc_id, predicted_source, actual_source, correct, score).
    For the honest train/serve separation see
    :func:`nb_holdout_accuracy`."""
    return _nb_predictions(documents, documents)


def nb_holdout_accuracy(documents: DataFrame) -> DataFrame:
    """Held-out NB evaluation — the resubstitution audit's honest twin:
    the model trains ONLY on the deterministic train split
    (:func:`..dedup.dataset_split`) and scores the val/test documents it
    never saw; eval-only tokens hit the unseen-token smoothing path.
    One row per actual source: (actual_source, n_docs, n_correct,
    accuracy) — the generalization number a domain-tagger deployment is
    judged by, not the training-set fit."""
    from music_streaming_etl_glue_spark.operators.dedup import dataset_split

    split = dataset_split(documents).select("doc_id", "split")
    joined = documents.join(split, "doc_id")
    train = joined.filter(F.col("split") == "train").drop("split")
    held = joined.filter(F.col("split") != "train").drop("split")
    preds = _nb_predictions(train, held)
    return preds.groupBy("actual_source").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.when(F.col("correct"), 1).otherwise(0))
        .cast("long")
        .alias("n_correct"),
        F.round(
            F.sum(F.when(F.col("correct"), 1).otherwise(0)).cast("double")
            / F.count("*").cast("double"),
            6,
        ).alias("accuracy"),
    )


def _nb_predictions_sql(train_where: str, score_where: str) -> str:
    """DuckDB twin of :func:`_nb_predictions`: ``train_where`` /
    ``score_where`` are boolean SQL predicates over the ``docs`` CTE
    (doc_id, text, source, split)."""
    return f"""
WITH split AS (
    SELECT doc_id,
           CASE WHEN ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT
                     % 1000 < 800
                THEN 'train'
                WHEN ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT
                     % 1000 < 900
                THEN 'val' ELSE 'test' END AS split
    FROM documents
),
docs AS (
    SELECT d.doc_id, d.text, d.source, s.split
    FROM documents d JOIN split s USING (doc_id)
),
train_toks AS (
    SELECT source AS src,
           unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS token
    FROM docs WHERE {train_where}
),
model AS (
    SELECT src, token, count(*) AS c FROM train_toks GROUP BY 1, 2
),
totals AS (SELECT src, sum(c) AS tot FROM model GROUP BY 1),
v AS (SELECT count(DISTINCT token) AS v_size FROM train_toks),
priors AS (
    SELECT source AS src, count(*) AS n_docs
    FROM docs WHERE {train_where} GROUP BY 1
),
n AS (SELECT count(*) AS n_total FROM docs WHERE {train_where}),
score_toks AS (
    SELECT doc_id, source AS actual_source,
           unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS token
    FROM docs WHERE {score_where}
),
terms AS (
    SELECT t.doc_id, t.actual_source, s.src,
           round(ln((coalesce(m.c, 0) + 1)::DOUBLE / (tt.tot + v.v_size)),
                 {NB_TERM_ROUND})::DECIMAL(38,12) AS term
    FROM score_toks t
    CROSS JOIN (SELECT src FROM priors) s
    LEFT JOIN model m ON m.src = s.src AND m.token = t.token
    JOIN totals tt ON tt.src = s.src
    CROSS JOIN v
),
doc_scores AS (
    SELECT doc_id, actual_source, src, sum(term) AS s
    FROM terms GROUP BY 1, 2, 3
),
with_prior AS (
    SELECT d.doc_id, d.actual_source, d.src,
           d.s + round(ln(p.n_docs::DOUBLE / n.n_total),
                       {NB_TERM_ROUND})::DECIMAL(38,12) AS score
    FROM doc_scores d JOIN priors p USING (src) CROSS JOIN n
),
ranked AS (
    SELECT *, row_number() OVER (PARTITION BY doc_id
                                 ORDER BY score DESC, src ASC) AS rn
    FROM with_prior
)
SELECT doc_id, src AS predicted_source, actual_source,
       src = actual_source AS correct,
       round(score::DOUBLE, 6) AS score
FROM ranked WHERE rn = 1
"""


NB_SOURCE_CLASSIFIER_SQL = _nb_predictions_sql("TRUE", "TRUE")

NB_HOLDOUT_ACCURACY_SQL = f"""
WITH preds AS ({_nb_predictions_sql("split = 'train'", "split != 'train'")})
SELECT actual_source,
       count(*)::BIGINT AS n_docs,
       sum(CASE WHEN correct THEN 1 ELSE 0 END)::BIGINT AS n_correct,
       round(sum(CASE WHEN correct THEN 1 ELSE 0 END)::DOUBLE
             / count(*), 6) AS accuracy
FROM preds GROUP BY actual_source
"""

# ---------------------------------------------------------------------------
# feature-hashed document vectors (text -> embedding bridge, no model)
# ---------------------------------------------------------------------------

HASH_VEC_DIMS = 64
TEXT_ANN_QUERY_DOC = 0
TEXT_ANN_K = 10


def hashed_doc_vectors(
    documents: DataFrame, dims: int = HASH_VEC_DIMS
) -> DataFrame:
    """Feature-hashing (hashing-trick) document vectors: each token maps
    to dimension ``md5(token) % dims`` with sign ``md5 parity``, summed
    per document — a deterministic, engine-portable, INTEGER-valued
    embedding that needs no external model. This is the bridge that lets
    a raw text corpus ride the entire embedding toolkit (cosine top-k,
    LSH pair mining, k-means, PQ) before a learned encoder exists:
    signed hashing preserves inner products in expectation (the
    count-sketch guarantee), and integer components keep every
    downstream dot product exact across engines.

    One explode + one (doc, dim) hash aggregate; the dense array is
    rebuilt by a vectorized Arrow scatter over the per-doc (dim, value)
    entry list (r14, guide §4.2 — the old per-dimension
    ``element_at(map, i)`` rebuild hid a quadratic: Spark maps are
    arrays, so ``GetMapValue`` is a LINEAR scan and each row paid
    dims × |entries| interpreted comparisons — measured 437 s CPU for
    2×2967 rows; the scatter is two numpy index ops per doc). Values
    are unchanged: the entries are exact int64 sums and the scatter
    casts them to the same exactly-representable doubles, missing dims
    to the same 0.0."""
    toks = documents.select(
        "doc_id",
        F.explode(F.filter(_tokens(), lambda t: t != F.lit(""))).alias(
            "token"
        ),
    )
    idx = (
        F.conv(F.substring(F.md5("token"), 1, 15), 16, 10).cast("long")
        % dims
    )
    sign = F.when(
        F.conv(F.substring(F.md5("token"), 32, 1), 16, 10).cast("long") % 2
        == 1,
        F.lit(1),
    ).otherwise(F.lit(-1))
    cells = (
        toks.select("doc_id", idx.alias("d"), sign.alias("s"))
        .groupBy("doc_id", "d")
        .agg(F.sum("s").cast("long").alias("v"))
    )
    @F.pandas_udf("array<double>")
    def scatter(ds: pd.Series, vs: pd.Series) -> pd.Series:
        out = []
        for d, v in zip(ds, vs):
            a = np.zeros(dims, dtype=np.float64)
            if len(d):
                a[np.asarray(d, dtype=np.int64)] = np.asarray(
                    v, dtype=np.float64
                )
            out.append(a)
        return pd.Series(out)

    entries = F.sort_array(
        F.collect_list(
            F.struct(F.col("d").cast("int").alias("d"), F.col("v"))
        )
    )
    return (
        cells.groupBy("doc_id")
        .agg(entries.alias("__e"))
        .select(
            "doc_id",
            scatter(
                F.transform(F.col("__e"), lambda e: e["d"]),
                F.transform(F.col("__e"), lambda e: e["v"]),
            ).alias("embedding"),
        )
    )


def _hashed_vectors_cte(dims: int = HASH_VEC_DIMS) -> str:
    """DuckDB CTE chain ending in ``hvecs(doc_id, embedding)`` — the SQL
    twin: same md5-derived index and sign, same integer sums."""
    return f"""htoks AS (
    SELECT doc_id,
           unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS token
    FROM documents
),
hcells AS (
    SELECT doc_id,
           ('0x' || substr(md5(token), 1, 15))::BIGINT % {dims} AS d,
           sum(CASE WHEN ('0x' || substr(md5(token), 32, 1))::BIGINT % 2 = 1
                    THEN 1 ELSE -1 END)::BIGINT AS v
    FROM htoks GROUP BY 1, 2
),
hmaps AS (
    SELECT doc_id, map_from_entries(list((d, v))) AS m FROM hcells
    GROUP BY doc_id
),
hvecs AS (
    SELECT doc_id,
           list_transform(
               generate_series(0, {dims - 1}),
               i -> coalesce(m[i][1], 0)::DOUBLE
           ) AS embedding
    FROM hmaps
)"""


HASHED_DOC_VECTORS_SQL = f"""
WITH {_hashed_vectors_cte()}
SELECT doc_id,
       array_to_string(list_transform(embedding, x -> x::BIGINT::VARCHAR),
                       ',') AS vec
FROM hvecs
"""


def hashed_doc_vectors_packed(
    documents: DataFrame, dims: int = HASH_VEC_DIMS
) -> DataFrame:
    """Stamped scalar form of :func:`hashed_doc_vectors` (catalog rule:
    stamped entries emit atomic columns only). Internal consumers keep
    the array form."""
    return hashed_doc_vectors(documents, dims).select(
        "doc_id",
        F.array_join(
            F.transform(
                F.col("embedding"), lambda x: x.cast("long").cast("string")
            ),
            ",",
        ).alias("vec"),
    )


def text_ann_topk(
    documents: DataFrame,
    query_doc: int = TEXT_ANN_QUERY_DOC,
    k: int = TEXT_ANN_K,
    dims: int = HASH_VEC_DIMS,
) -> DataFrame:
    """Exact cosine top-k over the hashed document vectors: 'documents
    most similar to this one' with zero model dependencies — the query
    shape a corpus-exploration UI runs, and the proof that the text
    corpus rides the embedding toolkit unmodified. Integer-valued
    vectors make every dot product exact; ranks tie-break on doc_id."""
    from music_streaming_etl_glue_spark.functions.ranks import (
        rank_post_limit,
    )

    vecs = hashed_doc_vectors(documents, dims)
    dot = F.aggregate(
        F.zip_with(F.col("embedding"), F.col("qvec"), lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    nrm = F.sqrt(
        F.aggregate(
            F.transform(F.col("embedding"), lambda x: x * x),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    qn = F.sqrt(
        F.aggregate(
            F.transform(F.col("qvec"), lambda x: x * x),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    q = F.broadcast(
        vecs.filter(F.col("doc_id") == query_doc).select(
            F.col("embedding").alias("qvec")
        )
    )
    scored = (
        vecs.filter(F.col("doc_id") != query_doc)
        .crossJoin(q)
        .select(
            "doc_id",
            F.when((nrm > 0) & (qn > 0), F.round(dot / (nrm * qn), 6))
            .otherwise(F.lit(0.0))
            .alias("similarity"),
        )
    )
    top = scored.orderBy(
        F.col("similarity").desc(), F.col("doc_id").asc()
    ).limit(k)
    return rank_post_limit(
        top, "rank", F.col("similarity").desc(), F.col("doc_id").asc()
    )


TEXT_ANN_TOPK_SQL = f"""
WITH {_hashed_vectors_cte()},
q AS (
    SELECT embedding AS qvec FROM hvecs WHERE doc_id = {TEXT_ANN_QUERY_DOC}
),
scored AS (
    SELECT h.doc_id,
           CASE WHEN list_dot_product(h.embedding, h.embedding) > 0
                 AND list_dot_product(q.qvec, q.qvec) > 0
                THEN round(
                    list_dot_product(h.embedding, q.qvec)
                    / (sqrt(list_dot_product(h.embedding, h.embedding))
                       * sqrt(list_dot_product(q.qvec, q.qvec))), 6)
                ELSE 0.0 END AS similarity
    FROM hvecs h, q
    WHERE h.doc_id != {TEXT_ANN_QUERY_DOC}
),
ranked AS (
    SELECT doc_id, similarity,
           row_number() OVER (ORDER BY similarity DESC, doc_id ASC) AS rank
    FROM scored
)
SELECT doc_id, similarity, rank FROM ranked WHERE rank <= {TEXT_ANN_K}
"""


#: hashed bag-of-words vectors over a shared vocabulary make MOST pairs
#: moderately similar (measured p50 0.65 / p99 0.85 on the synthetic
#: corpus); near-dup text pairs live at >= 0.9
TEXT_PAIR_THRESHOLD = 0.9


def text_semantic_pairs(
    documents: DataFrame,
    dims: int = HASH_VEC_DIMS,
    threshold: float = TEXT_PAIR_THRESHOLD,
) -> DataFrame:
    """Near-dup document pairs mined by the banded sign-LSH embedding
    pipeline over the MEAN-CENTERED hashed vectors — the composition
    proof for the text→embedding bridge: the raw corpus runs the exact
    same candidate-mining machinery (buckets, verification join) as a
    learned-embedding corpus, unmodified.

    Centering is load-bearing, not cosmetic: raw bag-of-words vectors
    over a shared vocabulary are a hot cone (measured p50 cosine 0.65
    corpus-wide), the one geometry angular LSH cannot prune — nearly
    every pair collides in some band and the verification join goes
    ~n² (measured 44 s at sf0.1). Subtracting the per-dimension corpus
    mean removes the shared direction: duplicates keep centered cosine
    1.0 exactly (identical vectors shift identically), the unrelated
    bulk decorrelates toward 0, and LSH prunes again (measured 3–4 s).
    All arithmetic stays cross-engine exact: components are integers,
    per-dimension sums are exact in doubles below 2^53, and the
    mean division rounds identically everywhere.

    Zero-norm centered vectors are excluded (their cosine is NaN and
    the engines disagree on NaN ordering). Banding is pinned to the
    static floor the SQL twin encodes (the knn_join_lsh rule);
    production callers re-derive BOTH sides."""
    from music_streaming_etl_glue_spark.operators.similarity import (
        LSH_BANDS,
        LSH_BITS,
        cosine_pairs_lsh,
    )

    # the hashed-vector aggregate feeds THREE consumers (the mean sums,
    # the centering projection, and the bucket GEMM downstream) —
    # materialize it once, spread across the cluster so the per-row
    # dense-array reconstruction and the centering both run wide instead
    # of on the aggregate's one coalesced output partition (r15: width
    # size-adaptive from the document count — the dense vectors are
    # dims×8 bytes/row of real work each, so 128 rows amortize a task)
    from music_streaming_etl_glue_spark.operators.width import spread_width

    par = spread_width(documents, rows_per_task=128)
    vecs = (
        hashed_doc_vectors(documents, dims)
        .select(F.col("doc_id").alias("vec_id"), "embedding")
        .repartition(par, "vec_id")
        .localCheckpoint()
    )
    sums = (
        vecs.select(F.posexplode("embedding").alias("d", "x"))
        .groupBy("d")
        .agg(F.sum("x").alias("s"), F.count("*").alias("n"))
    )
    mean_row = F.broadcast(
        sums.groupBy().agg(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct("d", (F.col("s") / F.col("n")).alias("m"))
                    )
                ),
                lambda t: t["m"],
            ).alias("__mean")
        )
    )
    centered = vecs.crossJoin(mean_row).select(
        "vec_id",
        F.zip_with(
            F.col("embedding"), F.col("__mean"), lambda a, b: a - b
        ).alias("embedding"),
    )
    sq = F.aggregate(
        F.transform(F.col("embedding"), lambda x: x * x),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    # the centered relation feeds the bucket GEMM AND both verification
    # sides — checkpoint once or the hashing aggregate + centering chain
    # re-runs per consumer
    centered = centered.filter(sq > 0).localCheckpoint(eager=False)
    return cosine_pairs_lsh(
        centered, threshold=threshold, bands=LSH_BANDS, bits=LSH_BITS,
        dims=dims,
    ).select(
        F.col("vec_id_a").alias("doc_id_a"),
        F.col("vec_id_b").alias("doc_id_b"),
        "similarity",
    )


def _text_semantic_pairs_sql(dims: int = HASH_VEC_DIMS) -> str:
    from music_streaming_etl_glue_spark.operators.similarity import (
        _cosine_pairs_lsh_sql,
    )

    prelude = (
        _hashed_vectors_cte(dims)
        + f""",
hmean AS (
    SELECT list(m ORDER BY d) AS mean FROM (
        SELECT g.i AS d, sum(embedding[g.i]) / count(*) AS m
        FROM hvecs, generate_series(1, {dims}) g(i)
        GROUP BY g.i
    )
),
hsrc AS (
    SELECT doc_id AS vec_id,
           list_transform(generate_series(1, {dims}),
                          i -> embedding[i] - mean[i]) AS embedding
    FROM hvecs, hmean
    WHERE list_dot_product(
              list_transform(generate_series(1, {dims}),
                             i -> embedding[i] - mean[i]),
              list_transform(generate_series(1, {dims}),
                             i -> embedding[i] - mean[i])) > 0
),
"""
    )
    inner = _cosine_pairs_lsh_sql(
        threshold=TEXT_PAIR_THRESHOLD, source="hsrc", prelude=prelude
    )
    return f"""
SELECT vec_id_a AS doc_id_a, vec_id_b AS doc_id_b, similarity
FROM ({inner})
"""


TEXT_SEMANTIC_PAIRS_SQL = _text_semantic_pairs_sql()


# ---------------------------------------------------------------------------
# CCNet-style perplexity bucketing (head / middle / tail)
# ---------------------------------------------------------------------------


def perplexity_buckets(documents: DataFrame) -> DataFrame:
    """CCNet-style quality partitioning: per-document perplexity under
    the corpus's own unigram LM (exp of mean surprisal — the model-free
    twin of :func:`unigram_surprisal`), split into head / middle / tail
    by corpus-wide perplexity terciles. Pretraining pipelines keep head,
    sample middle, and drop or re-filter tail; the bucket column is the
    mixture key.

    Shape: the same two token-keyed hash aggregates as
    ``unigram_surprisal`` (term frequencies join back on their own key —
    never a driver-side vocabulary), one exact-percentile aggregate over
    the per-DOC relation (|docs| rows, not tokens), broadcast back as
    two scalars. Terciles are computed over the 6dp-rounded perplexity
    so both engines cut on the identical grid; at 100 TB swap the exact
    percentile for ``percentile_approx`` (same contract, sketch-bounded
    memory).
    """
    toks = documents.select("doc_id", F.explode(_tokens()).alias("term"))
    freqs = toks.groupBy("term").agg(F.count("*").alias("tc"))
    total = F.broadcast(
        freqs.agg(F.sum("tc").cast("double").alias("total"))
    )
    surprisal = -F.log(F.col("tc").cast("double") / F.col("total"))
    ppl = (
        toks.join(freqs, "term")
        .crossJoin(total)
        .groupBy("doc_id")
        .agg(F.round(F.exp(F.avg(surprisal)), 6).alias("ppl"))
    )
    cuts = F.broadcast(
        ppl.agg(
            F.expr("percentile(ppl, 1.0/3.0)").alias("t1"),
            F.expr("percentile(ppl, 2.0/3.0)").alias("t2"),
        )
    )
    bucket = (
        F.when(F.col("ppl") <= F.col("t1"), "head")
        .when(F.col("ppl") <= F.col("t2"), "middle")
        .otherwise("tail")
    )
    return ppl.crossJoin(cuts).select(
        "doc_id", "ppl", bucket.alias("bucket")
    )


PERPLEXITY_BUCKETS_SQL = """
WITH toks AS (
    SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
freqs AS (SELECT term, COUNT(*) AS tc FROM toks GROUP BY term),
total AS (SELECT SUM(tc)::DOUBLE AS total FROM freqs),
ppl AS (
    SELECT t.doc_id,
           round(exp(AVG(-ln(f.tc::DOUBLE / total.total))), 6) AS ppl
    FROM toks t JOIN freqs f ON t.term = f.term, total
    GROUP BY t.doc_id
),
cuts AS (
    SELECT quantile_cont(ppl, 1.0/3.0) AS t1,
           quantile_cont(ppl, 2.0/3.0) AS t2
    FROM ppl
)
SELECT doc_id, ppl,
       CASE WHEN ppl <= t1 THEN 'head'
            WHEN ppl <= t2 THEN 'middle'
            ELSE 'tail' END AS bucket
FROM ppl, cuts
"""


# ---------------------------------------------------------------------------
# PMI collocations (adjacent-bigram association mining)
# ---------------------------------------------------------------------------

PMI_MIN_COUNT = 5
PMI_TOP_K = 50


def collocations_pmi(
    documents: DataFrame,
    min_count: int = PMI_MIN_COUNT,
    k: int = PMI_TOP_K,
) -> DataFrame:
    """Top-k adjacent-word collocations by pointwise mutual information:
    PMI(x, y) = ln( p(xy) / (p(x) p(y)) ) with bigram probabilities over
    adjacent pairs and unigram probabilities over all tokens, filtered
    to pairs seen ≥ ``min_count`` times (the classic low-frequency PMI
    inflation guard). The phrase-mining primitive feeding tokenizer
    vocabularies and query expansion.

    Shape: bigrams explode from a zip of the token array with its own
    tail — position-aware without a window or posexplode self-join; one
    hash aggregate each for bigram and unigram counts; the two corpus
    totals broadcast as scalars; unigram probabilities join back on
    their own term key (shuffle equi-join at vocabulary cardinality).
    Ranking sorts by the 6dp-ROUNDED pmi with a (t1, t2) tiebreak so
    the top-k boundary is engine-independent, and runs as
    TakeOrderedAndProject (partial top-k, no global sort).
    """
    arr = _tokens()
    pairs = (
        documents.filter(F.size(arr) >= 2)
        .select(
            F.explode(
                F.arrays_zip(
                    F.slice(arr, 1, F.size(arr) - 1).alias("t1"),
                    F.slice(arr, 2, F.size(arr) - 1).alias("t2"),
                )
            ).alias("p")
        )
        .select(F.col("p.t1").alias("t1"), F.col("p.t2").alias("t2"))
    )
    pair_counts = pairs.groupBy("t1", "t2").agg(
        F.count("*").alias("n_pair")
    )
    n_pairs = F.broadcast(
        pair_counts.agg(F.sum("n_pair").cast("double").alias("n_pairs"))
    )
    uni = documents.select(F.explode(arr).alias("term")).groupBy(
        "term"
    ).agg(F.count("*").alias("n_term"))
    n_toks = F.broadcast(
        uni.agg(F.sum("n_term").cast("double").alias("n_toks"))
    )
    pmi = F.log(
        (F.col("n_pair") / F.col("n_pairs"))
        / (
            (F.col("na") / F.col("n_toks"))
            * (F.col("nb") / F.col("n_toks"))
        )
    )
    return (
        pair_counts.filter(F.col("n_pair") >= min_count)
        .join(uni.select(F.col("term"), F.col("n_term").alias("na")),
              F.col("t1") == F.col("term"))
        .drop("term")
        .join(uni.select(F.col("term"), F.col("n_term").alias("nb")),
              F.col("t2") == F.col("term"))
        .drop("term")
        .crossJoin(n_pairs)
        .crossJoin(n_toks)
        .select(
            "t1",
            "t2",
            "n_pair",
            F.round(pmi, 6).alias("pmi"),
        )
        .orderBy(F.col("pmi").desc(), F.col("t1").asc(), F.col("t2").asc())
        .limit(k)
    )


COLLOCATIONS_PMI_SQL = f"""
WITH docs AS (
    SELECT string_split(text, ' ') AS arr FROM documents
),
zipped AS (
    SELECT unnest(list_zip(arr[:len(arr) - 1], arr[2:])) AS p
    FROM docs WHERE len(arr) >= 2
),
pairs AS (
    SELECT p[1] AS t1, p[2] AS t2 FROM zipped
),
pair_counts AS (
    SELECT t1, t2, COUNT(*) AS n_pair FROM pairs GROUP BY t1, t2
),
n_pairs AS (SELECT SUM(n_pair)::DOUBLE AS n_pairs FROM pair_counts),
uni AS (
    SELECT unnest(string_split(text, ' ')) AS term FROM documents
),
uni_counts AS (SELECT term, COUNT(*) AS n_term FROM uni GROUP BY term),
n_toks AS (SELECT SUM(n_term)::DOUBLE AS n_toks FROM uni_counts)
SELECT p.t1, p.t2, p.n_pair,
       round(ln((p.n_pair / n_pairs.n_pairs)
                / ((ua.n_term / n_toks.n_toks)
                   * (ub.n_term / n_toks.n_toks))), 6) AS pmi
FROM pair_counts p
JOIN uni_counts ua ON p.t1 = ua.term
JOIN uni_counts ub ON p.t2 = ub.term
CROSS JOIN n_pairs CROSS JOIN n_toks
WHERE p.n_pair >= {PMI_MIN_COUNT}
ORDER BY pmi DESC, p.t1 ASC, p.t2 ASC
LIMIT {PMI_TOP_K}
"""


# ---------------------------------------------------------------------------
# hybrid retrieval: BM25 ∪ semantic cosine fused by reciprocal-rank fusion
# (Cormack et al. 2009 — the standard lexical+vector fusion a RAG/search
# stack runs when neither signal alone is trusted)
# ---------------------------------------------------------------------------

RRF_K = 60
HYBRID_TOP_K = 20
HYBRID_SEM_DEPTH = 50  # per-list depth feeding the fusion (= BM25_TOP_K)


def _hash_query_vector(
    terms: tuple[str, ...], dims: int = HASH_VEC_DIMS
) -> list[float]:
    """The query terms hashed into the SAME signed feature space as
    :func:`hashed_doc_vectors` (md5 prefix → dim, last hex digit parity
    → sign) — a driver-side literal, so the Spark plan stays one
    codegen'd expression; the SQL twin derives it from the same md5 on
    the same literal terms."""
    import hashlib

    v = [0.0] * dims
    for t in terms:
        h = hashlib.md5(t.encode()).hexdigest()
        v[int(h[:15], 16) % dims] += 1.0 if int(h[31], 16) % 2 == 1 else -1.0
    return v


def semantic_query_topk(
    documents: DataFrame,
    query_terms: tuple[str, ...] = BM25_QUERY_TERMS,
    top_k: int = HYBRID_SEM_DEPTH,
    dims: int = HASH_VEC_DIMS,
) -> DataFrame:
    """Semantic half of the hybrid stack: cosine of every document's
    hashed vector against the hashed QUERY vector (integer dots — both
    engines see bit-identical doubles), deterministic (cos desc, doc_id)
    top-k. Zero-norm docs score 0 (ANSI-safe CASE, mirrored in SQL)."""
    from music_streaming_etl_glue_spark.functions.ranks import (
        rank_post_limit,
    )

    qv = _hash_query_vector(query_terms, dims)
    qlit = F.array(*[F.lit(x) for x in qv])
    qn = float(sum(x * x for x in qv)) ** 0.5
    vecs = hashed_doc_vectors(documents, dims)
    dot = F.aggregate(
        F.zip_with(F.col("embedding"), qlit, lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    nrm = F.sqrt(
        F.aggregate(
            F.transform(F.col("embedding"), lambda x: x * x),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    scored = vecs.select(
        "doc_id",
        F.when(nrm > 0, F.round(dot / (nrm * F.lit(qn)), 6))
        .otherwise(F.lit(0.0))
        .alias("cosine"),
    )
    top = scored.orderBy(F.col("cosine").desc(), F.col("doc_id").asc()).limit(
        top_k
    )
    return rank_post_limit(
        top, "rank", F.col("cosine").desc(), F.col("doc_id").asc()
    )


def hybrid_retrieval_rrf(
    documents: DataFrame,
    query_terms: tuple[str, ...] = BM25_QUERY_TERMS,
    rrf_k: int = RRF_K,
    top_k: int = HYBRID_TOP_K,
) -> DataFrame:
    """Reciprocal-rank fusion of the BM25 top-50 and the semantic
    cosine top-50 for the same query: rrf = Σ_lists 1/(rrf_k + rank),
    absent-from-list contributes 0. The two candidate lists are
    driver-scale (top-50 each) so the fusion join is a broadcast-sized
    full outer join — at 100 TB the heavy lifting is in the two scorers
    (each one scan + one slim agg), never in the fusion."""
    from music_streaming_etl_glue_spark.functions.ranks import (
        rank_post_limit,
    )

    lex = bm25_scores(documents, query_terms).select(
        "doc_id", F.col("rank").alias("lex_rank")
    )
    sem = semantic_query_topk(documents, query_terms).select(
        "doc_id", F.col("rank").alias("sem_rank")
    )
    fused = lex.join(sem, "doc_id", "full_outer").select(
        "doc_id",
        "lex_rank",
        "sem_rank",
        F.round(
            F.coalesce(1.0 / (F.lit(rrf_k) + F.col("lex_rank")), F.lit(0.0))
            + F.coalesce(
                1.0 / (F.lit(rrf_k) + F.col("sem_rank")), F.lit(0.0)
            ),
            6,
        ).alias("rrf_score"),
    )
    top = fused.orderBy(
        F.col("rrf_score").desc(), F.col("doc_id").asc()
    ).limit(top_k)
    return rank_post_limit(
        top, "rank", F.col("rrf_score").desc(), F.col("doc_id").asc()
    )


def _query_vec_sql_cte(dims: int = HASH_VEC_DIMS) -> str:
    terms_sql = ", ".join(f"'{t}'" for t in BM25_QUERY_TERMS)
    return f"""qcells AS (
    SELECT ('0x' || substr(md5(t), 1, 15))::BIGINT % {dims} AS d,
           sum(CASE WHEN ('0x' || substr(md5(t), 32, 1))::BIGINT % 2 = 1
                    THEN 1 ELSE -1 END)::BIGINT AS v
    FROM unnest([{terms_sql}]) AS u(t) GROUP BY 1
),
qvec AS (
    SELECT list_transform(
               generate_series(0, {dims - 1}),
               i -> coalesce(m[i][1], 0)::DOUBLE
           ) AS q
    FROM (SELECT map_from_entries(list((d, v))) AS m FROM qcells)
)"""


_SEM_TOPK_BODY = f"""
semscored AS (
    SELECT h.doc_id,
           CASE WHEN list_dot_product(h.embedding, h.embedding) > 0
                THEN round(
                    list_dot_product(h.embedding, q.q)
                    / (sqrt(list_dot_product(h.embedding, h.embedding))
                       * sqrt(list_dot_product(q.q, q.q))), 6)
                ELSE 0.0 END AS cosine
    FROM hvecs h, qvec q
),
semtop AS (
    SELECT doc_id, cosine,
           row_number() OVER (ORDER BY cosine DESC, doc_id ASC) AS rank
    FROM semscored
    ORDER BY cosine DESC, doc_id ASC LIMIT {HYBRID_SEM_DEPTH}
)"""

SEMANTIC_QUERY_TOPK_SQL = f"""
WITH {_hashed_vectors_cte()},
{_query_vec_sql_cte()},
{_SEM_TOPK_BODY.lstrip()}
SELECT doc_id, cosine, rank FROM semtop
"""

HYBRID_RETRIEVAL_RRF_SQL = f"""
WITH {_hashed_vectors_cte()},
{_query_vec_sql_cte()},
{_SEM_TOPK_BODY.lstrip()},
lex AS ({BM25_SCORES_SQL}),
fused AS (
    SELECT coalesce(l.doc_id, s.doc_id) AS doc_id,
           l.rank AS lex_rank, s.rank AS sem_rank,
           round(coalesce(1.0 / ({RRF_K} + l.rank), 0.0)
                 + coalesce(1.0 / ({RRF_K} + s.rank), 0.0), 6) AS rrf_score
    FROM lex l FULL OUTER JOIN semtop s ON l.doc_id = s.doc_id
)
SELECT doc_id, lex_rank, sem_rank, rrf_score,
       row_number() OVER (ORDER BY rrf_score DESC, doc_id ASC) AS rank
FROM fused
ORDER BY rrf_score DESC, doc_id ASC
LIMIT {HYBRID_TOP_K}
"""


# ---------------------------------------------------------------------------
# DSIR — data selection via importance resampling (Xie et al. 2023)
# ---------------------------------------------------------------------------

#: Hashed n-gram feature space for the DSIR importance estimator.
DSIR_BUCKETS = 512
#: Sources whose documents define the TARGET distribution (the
#: "high-quality domain" a selection run is steering the mix toward);
#: every other source is the raw candidate pool being selected from.
DSIR_TARGET_SOURCES = ("src0", "src1")
#: Fraction of the candidate pool the Gumbel-top-k resample keeps.
DSIR_KEEP_FRAC = 0.2
#: 16^13 = 2^52 — the md5-uniform denominator (exact in binary64).
_DSIR_U_DENOM = float(16**13)


def _dsir_grams(documents: DataFrame) -> DataFrame:
    """(doc_id, source, gram): the hashed-feature stream DSIR models run
    on — unigrams plus adjacent word bigrams ("w1 w2"), the feature set
    of the DSIR paper. Bigrams zip the (empty-filtered) token array with
    its own tail, the :func:`collocations_pmi` shape."""
    arr = F.filter(_tokens(), lambda t: t != F.lit(""))
    base = documents.select("doc_id", "source", arr.alias("arr"))
    uni = base.select(
        "doc_id", "source", F.explode("arr").alias("gram")
    )
    big = (
        base.filter(F.size("arr") >= 2)
        .select(
            "doc_id",
            "source",
            F.explode(
                F.arrays_zip(
                    F.slice(F.col("arr"), 1, F.size("arr") - 1).alias("t1"),
                    F.slice(F.col("arr"), 2, F.size("arr") - 1).alias("t2"),
                )
            ).alias("p"),
        )
        .select(
            "doc_id",
            "source",
            F.concat_ws(" ", F.col("p.t1"), F.col("p.t2")).alias("gram"),
        )
    )
    return uni.unionByName(big)


def _dsir_bucket(col: str = "gram", buckets: int = DSIR_BUCKETS) -> F.Column:
    return (
        F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")
        % buckets
    )


def dsir_weights(
    documents: DataFrame,
    buckets: int = DSIR_BUCKETS,
    target_sources: tuple[str, ...] = DSIR_TARGET_SOURCES,
    materialize: bool = False,
) -> DataFrame:
    """Per-document DSIR importance weights (Xie et al. 2023, "Data
    Selection for Language Models via Importance Resampling"): fit two
    add-1-smoothed unigram models over hashed n-gram buckets — the
    TARGET model on the ``target_sources`` docs, the RAW model on the
    candidate pool (everything else) — and weight each pool document by
    the log likelihood ratio ``log w(d) = Σ_b c_db (ln p̂_b − ln q̂_b)``.
    Selecting by this weight steers a web-scale crawl toward the target
    domain's feature distribution; it is the standard model-free data-
    selection baseline for LLM pretraining mixes.

    Bit-stability follows the NB-classifier discipline: each per-bucket
    log term is rounded to 12dp and cast to DECIMAL(38,12), and the
    per-document sum adds one decimal per gram OCCURRENCE (addition
    only — no decimal×int product whose precision/scale promotion could
    diverge between engines), so weights are exact under any partition
    order. The λ relation is ≤ ``buckets`` rows → broadcast; the whole
    plan is two hash aggregates over the gram stream plus one broadcast
    join — linear in corpus size, no wide shuffle at 100 TB.

    Output: (doc_id, source, logw) for every pool document (gramless
    docs carry 0.0)."""
    from music_streaming_etl_glue_spark.operators.dedup import _spread

    is_target = F.col("source").isin(*target_sources)
    grams = _dsir_grams(_spread(documents)).withColumn(
        "b", _dsir_bucket(buckets=buckets)
    )
    # r14 (guide §2.4/§1.2): the gram stream used to be re-tokenized for
    # EVERY consumer — tcounts, t_tot, pcounts, p_tot and the weight sum
    # each re-ran the scan → tokenize → explode chain (×2 branches for
    # the uni/bigram union), ten corpus passes in one plan. One
    # map-side-reducible aggregate now lands the per-(doc, bucket)
    # occurrence counts ONCE; every model statistic derives from that
    # slim relation (totals = Σ of the bucket counts — same values by
    # definition), and the weight sum re-attaches λ per bucket with the
    # occurrence count as an exact decimal repeat-factor.
    # materialize=False (the direct weights entry): every consumer hangs
    # off the SAME aggregate subtree, so ReuseExchange materializes the
    # one (doc, source, b) exchange once — measured 0.56 s vs 1.15 s
    # with a checkpoint. materialize=True (dsir_sample and other callers
    # that embed the weights in a LARGER plan): the broadcast subqueries
    # of the enclosing plan compile cdb into separate AQE jobs where
    # exchange reuse does not apply and the gram pass re-ran 3× —
    # a lazy checkpoint pins it to one materialization (measured
    # 5.26 s → 2.04 s for dsir_sample).
    cdb = grams.groupBy("doc_id", "source", "b").agg(
        F.count("*").alias("c")
    )
    if materialize:
        cdb = cdb.localCheckpoint(eager=False)
    tcounts = cdb.filter(is_target).groupBy("b").agg(
        F.sum("c").alias("ct")
    )
    pcb = cdb.filter(~is_target)
    pcounts = pcb.groupBy("b").agg(F.sum("c").alias("cp"))
    # coalesce the totals to 0 on degenerate corpora (ADVICE r14): an
    # empty target/pool side makes F.sum yield NULL where the pre-r14
    # per-gram count(*) yielded 0 — the NULL would silently zero every
    # smoothed log-ratio downstream instead of computing it
    t_tot = F.broadcast(
        tcounts.agg(
            F.coalesce(F.sum("ct"), F.lit(0).cast("long")).alias("t_tot")
        )
    )
    p_tot = F.broadcast(
        pcounts.agg(
            F.coalesce(F.sum("cp"), F.lit(0).cast("long")).alias("p_tot")
        )
    )
    lam = (
        pcounts.join(tcounts, "b", "left")
        .crossJoin(t_tot)
        .crossJoin(p_tot)
        .select(
            "b",
            (
                F.round(
                    F.log(
                        (F.coalesce(F.col("ct"), F.lit(0)) + 1).cast("double")
                        / (F.col("t_tot") + buckets).cast("double")
                    ),
                    NB_TERM_ROUND,
                ).cast(_NB_DEC)
                - F.round(
                    F.log(
                        (F.col("cp") + 1).cast("double")
                        / (F.col("p_tot") + buckets).cast("double")
                    ),
                    NB_TERM_ROUND,
                ).cast(_NB_DEC)
            ).alias("lam"),
        )
    )
    # λ·c with pinned decimal types: DECIMAL(26,12) × DECIMAL(11,0) →
    # DECIMAL(38,12) stays UNDER the 38-precision cap, so Spark performs
    # no precision-loss scale adjustment and the product is the exact
    # decimal value of λ added c times — bit-identical to the old
    # per-occurrence sum (decimal addition and this multiply are both
    # exact), while the aggregate now runs over the slim cdb relation
    # instead of the re-tokenized gram stream.
    w = (
        pcb.join(F.broadcast(lam), "b")
        .groupBy("doc_id", "source")
        .agg(
            F.sum(
                F.col("lam").cast("decimal(26,12)")
                * F.col("c").cast("decimal(11,0)")
            ).alias("w")
        )
    )
    pool_docs = documents.filter(~is_target).select("doc_id", "source")
    return pool_docs.join(w, ["doc_id", "source"], "left").select(
        "doc_id",
        "source",
        F.round(F.coalesce(F.col("w").cast("double"), F.lit(0.0)), 6).alias(
            "logw"
        ),
    )


def dsir_sample(
    documents: DataFrame,
    buckets: int = DSIR_BUCKETS,
    target_sources: tuple[str, ...] = DSIR_TARGET_SOURCES,
    keep_frac: float = DSIR_KEEP_FRAC,
) -> DataFrame:
    """Gumbel-top-k importance RESAMPLE over :func:`dsir_weights` — the
    selection step of DSIR: sampling without replacement with
    probability ∝ w(d) is exactly taking the k largest ``log w(d) + g_d``
    where ``g_d`` is standard Gumbel noise. The noise is an md5-lottery
    draw (``u = (h_52bit + 0.5) / 2^52``, ``g = −ln(−ln u)``) so both
    engines replay the identical sample; keys round to 6dp with a
    doc_id tiebreak.

    The ranking stage is one global row_number over the SLIM
    (doc_id, source, logw, key) relation — the
    :func:`customer_rfm_segments` single-partition precedent; ~16 bytes
    a row, and the scale path swaps it for a broadcast
    percentile_approx threshold exactly as
    :func:`customer_rfm_segments_approx` does for quintiles.

    Output: (doc_id, source, logw, gumbel_key, sel_rank) for the kept
    ⌊keep_frac·|pool|⌋ documents."""
    is_target = F.col("source").isin(*target_sources)
    pool_docs = documents.filter(~is_target).select("doc_id", "source")
    # unrounded decimal weight (cast exactly to double) + Gumbel draw;
    # materialize: the weights land inside a larger plan whose broadcast
    # subqueries would otherwise re-run the gram pass (see dsir_weights)
    weights = dsir_weights(
        documents, buckets, target_sources, materialize=True
    ).select("doc_id", "source", "logw")
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("dsir"), F.col("doc_id").cast("string"))),
                1,
                13,
            ),
            16,
            10,
        ).cast("double")
        + F.lit(0.5)
    ) / F.lit(_DSIR_U_DENOM)
    gumbel = -F.log(-F.log(u))
    keyed = weights.select(
        "doc_id",
        "source",
        "logw",
        F.round(F.col("logw") + gumbel, 6).alias("gumbel_key"),
    )
    n_pool = F.broadcast(pool_docs.agg(F.count("*").alias("n_pool")))
    w_rank = Window.orderBy(
        F.col("gumbel_key").desc(), F.col("doc_id").asc()
    )
    return (
        keyed.withColumn("sel_rank", F.row_number().over(w_rank))
        .crossJoin(n_pool)
        .filter(
            F.col("sel_rank")
            <= F.floor(F.lit(keep_frac) * F.col("n_pool"))
        )
        .drop("n_pool")
    )


def _dsir_targets_sql(target_sources: tuple[str, ...]) -> str:
    return ", ".join(f"'{s}'" for s in target_sources)


def _dsir_weights_sql(
    buckets: int = DSIR_BUCKETS,
    target_sources: tuple[str, ...] = DSIR_TARGET_SOURCES,
) -> str:
    tgts = _dsir_targets_sql(target_sources)
    return f"""
WITH toks AS (
    SELECT doc_id, source,
           list_filter(string_split(text, ' '), x -> x <> '') AS arr
    FROM documents
),
grams AS (
    SELECT doc_id, source, unnest(arr) AS gram FROM toks
    UNION ALL
    SELECT doc_id, source, p[1] || ' ' || p[2] AS gram
    FROM (
        SELECT doc_id, source,
               unnest(list_zip(arr[:len(arr) - 1], arr[2:])) AS p
        FROM toks WHERE len(arr) >= 2
    )
),
hashed AS (
    SELECT doc_id, source,
           ('0x' || substr(md5(gram), 1, 15))::BIGINT % {buckets} AS b,
           source IN ({tgts}) AS is_target
    FROM grams
),
tcounts AS (SELECT b, count(*) AS ct FROM hashed WHERE is_target GROUP BY 1),
ttot AS (SELECT count(*) AS t_tot FROM hashed WHERE is_target),
pcounts AS (
    SELECT b, count(*) AS cp FROM hashed WHERE NOT is_target GROUP BY 1
),
ptot AS (SELECT count(*) AS p_tot FROM hashed WHERE NOT is_target),
lam AS (
    SELECT p.b,
           round(ln((coalesce(t.ct, 0) + 1)::DOUBLE
                    / (ttot.t_tot + {buckets})),
                 {NB_TERM_ROUND})::DECIMAL(38,12)
           - round(ln((p.cp + 1)::DOUBLE / (ptot.p_tot + {buckets})),
                   {NB_TERM_ROUND})::DECIMAL(38,12) AS lam
    FROM pcounts p
    LEFT JOIN tcounts t USING (b)
    CROSS JOIN ttot CROSS JOIN ptot
),
w AS (
    SELECT h.doc_id, h.source, sum(l.lam) AS w
    FROM hashed h JOIN lam l USING (b)
    WHERE NOT h.is_target
    GROUP BY 1, 2
),
pool_docs AS (
    SELECT doc_id, source FROM documents WHERE source NOT IN ({tgts})
),
dsir_w AS (
    SELECT d.doc_id, d.source,
           round(coalesce(w.w::DOUBLE, 0.0), 6) AS logw
    FROM pool_docs d LEFT JOIN w USING (doc_id, source)
)"""


DSIR_WEIGHTS_SQL = f"""{_dsir_weights_sql()}
SELECT doc_id, source, logw FROM dsir_w
"""


def _dsir_sample_sql(
    buckets: int = DSIR_BUCKETS,
    target_sources: tuple[str, ...] = DSIR_TARGET_SOURCES,
    keep_frac: float = DSIR_KEEP_FRAC,
) -> str:
    return f"""{_dsir_weights_sql(buckets, target_sources)},
keyed AS (
    SELECT doc_id, source, logw,
           round(logw + -ln(-ln(
               (('0x' || substr(md5('dsir' || doc_id::VARCHAR), 1, 13))::BIGINT
                + 0.5) / {_DSIR_U_DENOM!r})), 6) AS gumbel_key
    FROM dsir_w
),
ranked AS (
    SELECT doc_id, source, logw, gumbel_key,
           row_number() OVER (ORDER BY gumbel_key DESC, doc_id ASC)
               AS sel_rank,
           count(*) OVER () AS n_pool
    FROM keyed
)
SELECT doc_id, source, logw, gumbel_key, sel_rank
FROM ranked
WHERE sel_rank <= floor({keep_frac!r} * n_pool)
"""


DSIR_SAMPLE_SQL = _dsir_sample_sql()


# ---------------------------------------------------------------------------
# quality-curriculum training order (phase terciles + sharded shuffle)
# ---------------------------------------------------------------------------

#: Shard fan-out within each curriculum phase (the writer's file fan-out).
CURRICULUM_SHARDS = 8


def curriculum_order(
    documents: DataFrame, shards: int = CURRICULUM_SHARDS
) -> DataFrame:
    """Quality-curriculum training order: phase 1 = top quality tercile,
    phase 2 = middle, phase 3 = tail, with a stable md5-lottery order
    within each phase — "train on the cleanest data first, anneal onto
    the noisier tail" as one deterministic (phase, shard, pos) sort key.
    The composition pretraining runs actually schedule: the
    :func:`text_quality` score picks the phase, and within a phase the
    order is decorrelated from ingest order exactly like
    ``corpus_shuffle`` (phase-local md5 shards, each shard ranked
    independently).

    Shape: one narrow scan computes the 6dp-rounded quality score; one
    exact-percentile aggregate over |docs| rows broadcasts the two
    tercile cuts back as scalars (at 100 TB swap for
    ``percentile_approx`` — same contract, sketch-bounded memory); phase
    assignment is a per-row CASE; the rank window is keyed by
    (phase, shard) so no partition ever holds more than 1/(3·shards) of
    the corpus — the same scale contract as ``corpus_shuffle``, never a
    global sort.
    """
    from music_streaming_etl_glue_spark.operators.dedup import _hash_bucket

    # the score map feeds BOTH the tercile aggregate and the phase
    # projection — materialize once (house convention for multi-consumer
    # frames) instead of re-running the per-doc regex/array scans twice
    scored = text_quality(documents).select(
        "doc_id", F.round("quality_score", 6).alias("q")
    ).localCheckpoint(eager=False)
    cuts = F.broadcast(
        scored.agg(
            F.expr("percentile(q, 1.0/3.0)").alias("t1"),
            F.expr("percentile(q, 2.0/3.0)").alias("t2"),
        )
    )
    phase = (
        F.when(F.col("q") >= F.col("t2"), 1)
        .when(F.col("q") >= F.col("t1"), 2)
        .otherwise(3)
    )
    keyed = scored.crossJoin(cuts).select(
        "doc_id",
        "q",
        phase.cast("int").alias("phase"),
        _hash_bucket("doc_id", shards).alias("shard"),
        F.md5(F.col("doc_id").cast("string")).alias("shuffle_key"),
    )
    w = Window.partitionBy("phase", "shard").orderBy("shuffle_key", "doc_id")
    return (
        keyed.withColumn("pos", F.row_number().over(w).cast("long"))
        .select("doc_id", "q", "phase", "shard", "pos")
    )


CURRICULUM_ORDER_SQL = f"""
WITH tq AS ({TEXT_QUALITY_SQL}),
scored AS (SELECT doc_id, round(quality_score, 6) AS q FROM tq),
cuts AS (
    SELECT quantile_cont(q, 1.0/3.0) AS t1,
           quantile_cont(q, 2.0/3.0) AS t2
    FROM scored
),
keyed AS (
    SELECT doc_id, q,
           CASE WHEN q >= t2 THEN 1
                WHEN q >= t1 THEN 2
                ELSE 3 END AS phase,
           ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT
               % {CURRICULUM_SHARDS} AS shard,
           md5(doc_id::VARCHAR) AS shuffle_key
    FROM scored, cuts
)
SELECT doc_id, q, phase, shard,
       row_number() OVER (PARTITION BY phase, shard
                          ORDER BY shuffle_key, doc_id) AS pos
FROM keyed
"""
