"""Multimodal column support: opaque ``binary`` payloads + typed metadata,
with decode / feature-extraction as Arrow-batched ``mapInPandas`` stages.

Design: image/audio/video payloads are *opaque bytes* to the engine — a
``content: binary`` column plus a metadata struct (byte length, content
hash, declared mime). All Spark-side plumbing is real and tested: schema,
partition-preserving mapInPandas batch shape, deterministic feature
extraction. The actual codec step is STUBBED (``decode_image`` raises
``NotImplementedError``) because no image/audio libraries ship in this
container — swap the stub body for PIL/torchaudio/ffmpeg in a real
deployment; the plumbing around it does not change.

At 100 TB: payload columns dominate I/O, so metadata/filter queries must
prune them — keep payloads in their own parquet column (columnar pruning
skips the bytes unless selected), and run decode stages with
``spark.sql.execution.arrow.maxRecordsPerBatch`` tuned so a batch of
payloads fits executor memory.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_SCHEMA = (
    "doc_id long, byte_len long, first_byte int, last_byte int, checksum long"
)


def attach_binary(documents: DataFrame, mime: str = "text/plain") -> DataFrame:
    """Wrap a source column as an opaque multimodal payload: binary content
    + typed metadata. (The testdata has no real image bytes, so document
    text stands in as the payload; the column shapes are what matter.)"""
    content = F.col("text").cast("binary")
    return documents.select(
        "doc_id",
        content.alias("content"),
        F.octet_length(content).cast("long").alias("byte_len"),
        F.sha2(content, 256).alias("content_sha256"),
        F.lit(mime).alias("mime"),
    )


def multimodal_meta(documents: DataFrame) -> DataFrame:
    """Payload metadata projection — the query pattern that must NOT read
    the payload bytes at scale (column pruning drops ``content``)."""
    return attach_binary(documents).select(
        "doc_id", "byte_len", "content_sha256", "mime"
    )


MULTIMODAL_META_SQL = """
SELECT doc_id,
       octet_length(CAST(text AS BLOB))::BIGINT AS byte_len,
       sha256(text) AS content_sha256,
       'text/plain' AS mime
FROM documents
"""


def decode_image(payload: bytes) -> object:
    """STUB — image decoding needs a codec library not present in this
    container. Replace with e.g. PIL.Image.open(io.BytesIO(payload))."""
    raise NotImplementedError(
        "image decode requires a codec library (PIL/opencv); "
        "not available in this environment"
    )


def _fake_features(payload: bytes) -> tuple[int, int, int, int]:
    """Deterministic stand-in for a decoded-payload featurizer (exercises
    the full mapInPandas path with a real payload-dependent output)."""
    if payload is None or len(payload) == 0:
        return 0, -1, -1, 0
    checksum = sum(payload[:: max(1, len(payload) // 64)]) % (1 << 31)
    return len(payload), payload[0], payload[-1], checksum


def extract_features(binary_df: DataFrame, batch_hint: int = 1024) -> DataFrame:
    """Feature extraction over payload bytes via ``mapInPandas``: Arrow
    batches stream through Python once, partition layout preserved, output
    schema fixed. The decode call is the only line to swap for real media."""

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = pdf["content"].map(_fake_features)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "byte_len": feats.map(lambda t: t[0]),
                    "first_byte": feats.map(lambda t: t[1]),
                    "last_byte": feats.map(lambda t: t[2]),
                    "checksum": feats.map(lambda t: t[3]),
                }
            )

    return binary_df.select("doc_id", "content").mapInPandas(
        featurize, schema=FEATURE_SCHEMA
    )


# DuckDB twin of extract_features(attach_binary(documents)). The stand-in
# payload is the document text, which the testdata guarantees is pure ASCII
# (octet_length == length for every row), so per-character ascii() equals
# per-byte access; the strided positions 1, 1+s, … (s = max(1, n//64))
# mirror payload[::s].
MULTIMODAL_FEATURES_SQL = """
WITH b AS (
    -- coalesce: a NULL payload must follow the empty-payload path
    -- (0, -1, -1, 0) exactly as _fake_features does, not produce NULLs
    SELECT doc_id, coalesce(text, '') AS text,
           octet_length(CAST(coalesce(text, '') AS BLOB)) AS n
    FROM documents
)
SELECT doc_id,
       n::BIGINT AS byte_len,
       (CASE WHEN n = 0 THEN -1 ELSE ascii(substr(text, 1, 1)) END)::INTEGER
           AS first_byte,
       (CASE WHEN n = 0 THEN -1 ELSE ascii(substr(text, n, 1)) END)::INTEGER
           AS last_byte,
       (CASE WHEN n = 0 THEN 0 ELSE
           list_sum(list_transform(
               generate_series(1, n, GREATEST(1, n // 64)),
               i -> ascii(substr(text, i, 1)))) % 2147483648
        END)::BIGINT AS checksum
FROM b
"""
