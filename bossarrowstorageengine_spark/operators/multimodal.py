"""Multimodal binary-column operators (task brief: image/audio/video as
opaque ``binary`` columns with typed metadata; decode / feature-extract as
Pandas UDFs over ``mapInPandas``).

The corpus has no binary table, so the pipeline manufactures one in-flight:
``documents.text`` utf-8-encoded into a ``binary`` payload column plus typed
metadata (media_type, n_bytes) — exactly the schema shape a 100 TB
image/audio lake uses (payload + sidecar metadata columns in one row).

The *decode* step is STUBBED (no image/audio libs in this container):
``_decode_stub`` is a deterministic fake that derives "features" from the
raw bytes.  The Spark-side plumbing — schema, Arrow batch exchange,
``mapInPandas`` signature, per-batch iteration — is real and tested; a real
deployment swaps ``_decode_stub`` for a PIL/torchaudio call with the same
contract.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bossarrowstorageengine_spark.catalog import load_table
from bossarrowstorageengine_spark.operators.registry import query

#: Output schema of the feature-extraction stage.
FEATURES_SCHEMA = (
    "doc_id long, media_type string, n_bytes long, "
    "first_byte long, byte_checksum long"
)


def _decode_stub(payload: bytes) -> dict:
    """Deterministic fake decoder.

    A real decoder (PIL.Image.open / librosa.load / av.open) goes here and
    would raise on corrupt payloads; the stub derives features from raw
    bytes so the pipeline is testable without media libraries.  Swapping in
    a real codec changes ONLY this function.
    """
    if payload is None:
        raise NotImplementedError(
            "real media decode not available in this environment")
    return {
        "n_bytes": len(payload),
        "first_byte": payload[0] if payload else -1,
        # cheap rolling checksum over the first 64 bytes
        "byte_checksum": sum((i + 1) * b for i, b in enumerate(payload[:64])),
    }


def extract_features(binary_df: DataFrame) -> DataFrame:
    """``mapInPandas`` feature extraction over (doc_id, media_type, payload).

    Arrow-batched: each pandas chunk holds many payloads; the Python worker
    decodes a batch at a time — the shape that amortizes per-row overhead
    at 100 TB (and the same pathway a GPU feature-extractor would use).
    """

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [_decode_stub(p) for p in pdf["payload"]]
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"].astype("int64"),
                "media_type": pdf["media_type"],
                "n_bytes": pd.Series([f["n_bytes"] for f in feats], dtype="int64"),
                "first_byte": pd.Series([f["first_byte"] for f in feats], dtype="int64"),
                "byte_checksum": pd.Series(
                    [f["byte_checksum"] for f in feats], dtype="int64"),
            })

    return binary_df.mapInPandas(decode_batches, FEATURES_SCHEMA)


@query(
    "q_multimodal_binary",
    oracle="""
    WITH feats AS (
        SELECT doc_id,
               'text/plain'                        AS media_type,
               octet_length(encode(text))          AS n_bytes,
               CASE WHEN octet_length(encode(text)) > 0
                    THEN ascii(substr(text, 1, 1)) ELSE -1 END AS first_byte
        FROM documents
    )
    SELECT media_type,
           count(*)                        AS n_docs,
           CAST(sum(n_bytes) AS BIGINT)    AS total_bytes,
           CAST(min(first_byte) AS BIGINT) AS min_first_byte,
           CAST(max(first_byte) AS BIGINT) AS max_first_byte
    FROM feats
    GROUP BY media_type
    """,
)
def q_multimodal_binary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload column + typed metadata → mapInPandas decode/feature
    stage → aggregate.  The oracle recomputes the SQL-expressible features
    (byte length, first byte) on the original text; checksum is asserted in
    the pytest suite (not SQL-portable)."""
    d = load_table(spark, sf_dir, "documents")
    binary_df = d.select(
        "doc_id",
        F.lit("text/plain").alias("media_type"),
        F.encode(F.col("text"), "utf-8").alias("payload"),
    )
    feats = extract_features(binary_df)
    return feats.groupBy("media_type").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_bytes").cast("long").alias("total_bytes"),
        F.min("first_byte").cast("long").alias("min_first_byte"),
        F.max("first_byte").cast("long").alias("max_first_byte"),
    )
