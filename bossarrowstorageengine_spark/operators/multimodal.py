"""Multimodal binary-column operators (task brief: image/audio/video as
opaque ``binary`` columns with typed metadata; decode / feature-extract as
Pandas UDFs over ``mapInPandas``).

The corpus has no binary table, so the pipeline manufactures one in-flight:
``documents.text`` utf-8-encoded into a ``binary`` payload column plus typed
metadata (media_type, n_bytes) — exactly the schema shape a 100 TB
image/audio lake uses (payload + sidecar metadata columns in one row).

Decode: ``decode_media`` carries REAL codecs for the formats the sandbox
can parse natively — WAV via the stdlib ``wave`` RIFF parser and PNG via
signature + CRC-verified IHDR parsing (``q_multimodal_decode`` runs both
end-to-end against in-flight-encoded payloads).  Formats with no
in-container codec (video, JPEG) fall back to ``_decode_stub``'s
byte-level features; a PIL/torchaudio/av call slots into ``decode_media``
with the same bytes-in/features-out, raise-on-corrupt contract.
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
    """Byte-level feature extractor for opaque payloads.

    Used for media types with no in-container codec (video, JPEG, ...);
    ``audio/wav`` and ``image/png`` have REAL decoders below
    (``decode_media``).  A richer decoder (PIL / torchaudio / av) slots in
    with the same contract: bytes in, feature dict out, raise on corrupt.
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


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def decode_media(payload: bytes, media_type: str) -> dict:
    """REAL media decode for the formats the sandbox can parse natively.

    - ``audio/wav``: stdlib ``wave`` (RIFF parser) — channels, sample rate,
      frame count, floor-ms duration.  Corrupt payloads raise
      ``wave.Error``/``EOFError`` exactly like any real codec.
    - ``image/png``: PNG signature + IHDR parse with the chunk CRC verified
      (``zlib.crc32``) — width, height, bit depth.  Bad signature or CRC
      raises ``ValueError``.
    - anything else: byte-level features via ``_decode_stub``.

    Returns a uniform feature dict with ``None`` for inapplicable fields so
    mixed-media batches produce one Arrow schema.
    """
    import io
    import struct
    import wave
    import zlib

    out = {"n_frames": None, "duration_ms": None, "sample_rate": None,
           "width": None, "height": None}
    if media_type == "audio/wav":
        with wave.open(io.BytesIO(payload), "rb") as w:
            rate = w.getframerate()
            frames = w.getnframes()
        out.update(n_frames=frames, sample_rate=rate,
                   duration_ms=frames * 1000 // rate)
        return out
    if media_type == "image/png":
        if len(payload) < 33 or payload[:8] != _PNG_SIG:
            raise ValueError("not a PNG: bad signature")
        length, ctype = struct.unpack(">I4s", payload[8:16])
        if ctype != b"IHDR" or length != 13:
            raise ValueError("not a PNG: first chunk is not IHDR")
        body = payload[16:29]
        (crc,) = struct.unpack(">I", payload[29:33])
        if zlib.crc32(b"IHDR" + body) & 0xFFFFFFFF != crc:
            raise ValueError("corrupt PNG: IHDR CRC mismatch")
        width, height, bit_depth = struct.unpack(">IIB", body[:9])
        out.update(width=width, height=height, n_frames=1)
        return out
    out.update(_decode_stub(payload))
    return out


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


def encode_wav(n_frames: int, sample_rate: int = 16000,
               samples: "list[int] | None" = None) -> bytes:
    """A real RIFF/WAV payload: 1 channel, 16-bit PCM — produced by the
    stdlib encoder, so ``decode_media`` exercises a genuine codec
    round-trip, not a hand-rolled header.  ``samples`` (int16 values)
    fills the frames; default is silence.  ONE definition of the codec
    parameters — every WAV the module writes goes through here."""
    import io
    import struct
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        if samples is None:
            w.writeframes(b"\x00\x00" * n_frames)
        else:
            w.writeframes(struct.pack(f"<{len(samples)}h", *samples))
    return buf.getvalue()


def encode_png(width: int, height: int) -> bytes:
    """A real minimal PNG (signature, CRC'd IHDR, zlib IDAT, IEND): 8-bit
    RGB, all-black scanlines."""
    import struct
    import zlib

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (struct.pack(">I", len(body)) + ctype + body
                + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    raw = b"".join(b"\x00" + b"\x00\x00\x00" * width for _ in range(height))
    return (_PNG_SIG + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))


#: Output schema of the real-codec decode stage.
DECODE_SCHEMA = (
    "doc_id long, media_type string, n_frames long, duration_ms long, "
    "sample_rate long, width long, height long"
)


@query(
    "q_multimodal_decode",
    oracle="""
    WITH base AS (SELECT doc_id, n_chars FROM documents),
    wav AS (
        SELECT (n_chars % 256) + 16 AS n_frames
        FROM base WHERE doc_id % 2 = 0
    ),
    png AS (
        SELECT (n_chars % 64) + 1 AS width, (doc_id % 32) + 1 AS height
        FROM base WHERE doc_id % 2 = 1
    )
    SELECT 'audio/wav' AS media_type,
           CAST(count(*) AS BIGINT)                      AS n_items,
           CAST(sum(n_frames) AS BIGINT)                 AS sum_frames,
           CAST(sum(n_frames * 1000 // 16000) AS BIGINT) AS sum_duration_ms,
           CAST(NULL AS BIGINT)                          AS sum_width,
           CAST(NULL AS BIGINT)                          AS sum_height
    FROM wav
    UNION ALL
    SELECT 'image/png',
           CAST(count(*) AS BIGINT),
           CAST(count(*) AS BIGINT),
           CAST(NULL AS BIGINT),
           CAST(sum(width) AS BIGINT),
           CAST(sum(height) AS BIGINT)
    FROM png
    """,
)
def q_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL-codec multimodal decode: WAV (stdlib ``wave``) and PNG
    (signature + CRC-verified IHDR parse) payloads manufactured in-flight
    from document metadata, decoded back through ``decode_media``, and
    aggregated per media type.  The oracle recomputes every decoded
    property (frame counts, floor-ms durations, pixel dimensions) from the
    same metadata formulas — so a header-parse or codec bug shows up as a
    value mismatch, not just a row-count drift.

    Scale: encode and decode are Arrow-batched ``mapInPandas`` stages (the
    GPU-feature-extractor pathway); the shuffle carries only per-media-type
    partial aggregates, never payload bytes.
    """
    d = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")

    def encode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            mts, payloads = [], []
            for doc_id, n_chars in zip(pdf["doc_id"], pdf["n_chars"]):
                if doc_id % 2 == 0:
                    mts.append("audio/wav")
                    payloads.append(encode_wav(int(n_chars) % 256 + 16))
                else:
                    mts.append("image/png")
                    payloads.append(encode_png(
                        int(n_chars) % 64 + 1, int(doc_id) % 32 + 1))
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"].astype("int64"),
                "media_type": mts,
                "payload": payloads,
            })

    media = d.mapInPandas(
        encode_batches, "doc_id long, media_type string, payload binary")

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decode_media(p, m)
                     for p, m in zip(pdf["payload"], pdf["media_type"])]
            out = {"doc_id": pdf["doc_id"].astype("int64"),
                   "media_type": pdf["media_type"]}
            for k in ("n_frames", "duration_ms", "sample_rate",
                      "width", "height"):
                out[k] = pd.Series([f[k] for f in feats], dtype="Int64")
            yield pd.DataFrame(out)

    feats = media.mapInPandas(decode_batches, DECODE_SCHEMA)
    return feats.groupBy("media_type").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum("n_frames").cast("long").alias("sum_frames"),
        F.sum("duration_ms").cast("long").alias("sum_duration_ms"),
        F.sum("width").cast("long").alias("sum_width"),
        F.sum("height").cast("long").alias("sum_height"),
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


@query(
    "q_multimodal_audio_stats",
    oracle="""
    WITH base AS (
        SELECT doc_id, (n_chars % 256) + 16 AS n
        FROM documents WHERE doc_id % 6 = 0
    ), s AS (
        SELECT doc_id, n, g.i AS i,
               ((doc_id * 31 + g.i * 17) % 2003) - 1001 AS v
        FROM base, unnest(range(n)) AS g(i)
    )
    SELECT CAST(doc_id AS BIGINT)            AS doc_id,
           CAST(max(n) AS BIGINT)            AS n_frames,
           CAST(max(abs(v)) AS BIGINT)       AS peak_abs,
           CAST(sum(abs(v)) AS BIGINT)       AS sum_abs,
           CAST(sum((i + 1) * v) AS BIGINT)  AS sample_checksum
    FROM s
    GROUP BY doc_id
    """,
)
def q_multimodal_audio_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio FEATURE EXTRACTION over the real WAV codec path (extends
    ``q_multimodal_decode``, which stops at header metadata): synthesize a
    deterministic non-silent 16-bit PCM waveform per document
    (``s[i] = ((doc_id*31 + i*17) % 2003) − 1001``), encode it through the
    stdlib ``wave`` RIFF writer, decode the payload back through the same
    codec in a second Arrow-batched stage, and report per-clip
    SAMPLE-LEVEL features — peak amplitude, L1 energy, and a
    position-weighted checksum.  Every value is an exact integer the
    oracle recomputes from the generative formula, so a codec bug
    anywhere in the encode→bytes→decode chain (byte order, sample width,
    frame count) breaks the hash — this is the audit shape for a 100 TB
    audio lake where the "model feature" stage must provably see the
    samples the encoder wrote.

    Scale: both stages are ``mapInPandas`` over Arrow batches (payload
    bytes never shuffle — features leave the worker as scalars); at
    100 TB the decode stage is where a torchaudio/GPU extractor slots in
    with the same bytes-in/features-out contract."""
    import struct

    d = (load_table(spark, sf_dir, "documents")
         .select("doc_id", "n_chars").filter(F.col("doc_id") % 6 == 0))

    def encode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for doc_id, n_chars in zip(pdf["doc_id"], pdf["n_chars"]):
                n = int(n_chars) % 256 + 16
                samples = [((int(doc_id) * 31 + i * 17) % 2003) - 1001
                           for i in range(n)]
                payloads.append(encode_wav(n, samples=samples))
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"].astype("int64"),
                "payload": payloads,
            })

    media = d.mapInPandas(encode_batches, "doc_id long, payload binary")

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io
        import wave

        for pdf in batches:
            rows = {"doc_id": [], "n_frames": [], "peak_abs": [],
                    "sum_abs": [], "sample_checksum": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                with wave.open(io.BytesIO(payload), "rb") as w:
                    n = w.getnframes()
                    raw = w.readframes(n)
                samples = struct.unpack(f"<{n}h", raw)
                rows["doc_id"].append(int(doc_id))
                rows["n_frames"].append(n)
                rows["peak_abs"].append(max(abs(s) for s in samples))
                rows["sum_abs"].append(sum(abs(s) for s in samples))
                rows["sample_checksum"].append(
                    sum((i + 1) * s for i, s in enumerate(samples)))
            yield pd.DataFrame(
                {k: pd.Series(v, dtype="int64") for k, v in rows.items()})

    return media.mapInPandas(
        decode_batches,
        "doc_id long, n_frames long, peak_abs long, sum_abs long, "
        "sample_checksum long")
