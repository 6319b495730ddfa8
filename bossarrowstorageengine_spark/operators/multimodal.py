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


#: Output schema of the frame-sampling stage (one row per sampled frame).
FRAMES_SCHEMA = "doc_id long, frame_idx long, frame_len long, frame binary"

FRAME_BYTES = 64      #: stub "frame" size (a real video frame is a decode unit)
FRAME_STRIDE = 4      #: keep every 4th frame


def resize_payload(binary_df: DataFrame, target_bytes: int,
                   payload_col: str = "payload") -> DataFrame:
    """Resize stub over Arrow batches: pad-or-truncate each payload to
    ``target_bytes`` (a real implementation calls the codec's resize with
    the same one-in-one-out contract; metadata column updates ride along).
    """
    import pandas as pd  # noqa: F811 — worker-side import

    out_schema = "doc_id long, media_type string, payload binary, n_bytes long"

    def resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            resized = [
                (p[:target_bytes] if len(p) >= target_bytes
                 else p + b"\x00" * (target_bytes - len(p)))
                for p in pdf["payload"]
            ]
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"].astype("int64"),
                "media_type": pdf["media_type"],
                "payload": resized,
                "n_bytes": pd.Series([len(p) for p in resized], dtype="int64"),
            })

    return binary_df.mapInPandas(resize_batches, out_schema)


def sample_frames(binary_df: DataFrame,
                  frame_bytes: int = FRAME_BYTES,
                  stride: int = FRAME_STRIDE) -> DataFrame:
    """Frame-sampling stub: chunk each payload into ``frame_bytes`` frames
    and keep every ``stride``-th one — the one-row→many-frames expansion a
    video pipeline does (decode unit = frame; sampling bounds downstream
    cost).  Emitted as exploded rows so frames parallelize independently
    of their source object — the layout that matters when one video is
    gigabytes."""

    def frame_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, lens, frames = [], [], [], []
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                for i in range(0, (len(p) + frame_bytes - 1) // frame_bytes,
                               stride):
                    chunk = p[i * frame_bytes:(i + 1) * frame_bytes]
                    ids.append(doc_id)
                    idxs.append(i)
                    lens.append(len(chunk))
                    frames.append(chunk)
            yield pd.DataFrame({
                "doc_id": pd.Series(ids, dtype="int64"),
                "frame_idx": pd.Series(idxs, dtype="int64"),
                "frame_len": pd.Series(lens, dtype="int64"),
                "frame": frames if frames else pd.Series([], dtype=object),
            })

    return binary_df.mapInPandas(frame_batches, FRAMES_SCHEMA)


@query(
    "q_multimodal_frames",
    oracle="""
    WITH sizes AS (
        SELECT doc_id, octet_length(encode(text)) AS n_bytes FROM documents
        WHERE doc_id % 10 = 0
    ), frames AS (
        SELECT doc_id,
               CAST(ceil(n_bytes / 64.0) AS BIGINT)             AS n_frames,
               n_bytes
        FROM sizes WHERE n_bytes > 0
    )
    SELECT CAST(count(DISTINCT doc_id) AS BIGINT)               AS n_docs,
           CAST(sum(ceil(n_frames / 4.0)) AS BIGINT)            AS n_sampled,
           CAST(sum(
               64 * ceil(n_frames / 4.0)
               - CASE WHEN (n_frames - 1) % 4 = 0
                      THEN 64 * n_frames - n_bytes ELSE 0 END
           ) AS BIGINT)                                         AS sampled_bytes
    FROM frames
    """,
)
def q_multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sample the binary payloads (every 4th 64-byte frame) and
    aggregate sampled counts/bytes.  The oracle recomputes the expected
    frame arithmetic from payload lengths alone — proving the chunking,
    striding, and short-last-frame handling are exact."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 10 == 0)
    binary_df = d.select(
        "doc_id",
        F.lit("text/plain").alias("media_type"),
        F.encode(F.col("text"), "utf-8").alias("payload"),
    )
    frames = sample_frames(binary_df)
    return frames.agg(
        F.countDistinct("doc_id").alias("n_docs"),
        F.count(F.lit(1)).alias("n_sampled"),
        F.sum("frame_len").cast("long").alias("sampled_bytes"),
    )
