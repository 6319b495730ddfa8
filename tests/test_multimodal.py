"""Multimodal binary-column pipeline tests: schema plumbing, batch shape,
stubbed-decode determinism, checksum (the non-SQL-portable feature)."""

from __future__ import annotations

from pyspark.sql import functions as F

import __spark_entry__ as entrymod
from bossarrowstorageengine_spark.catalog import load_table
from bossarrowstorageengine_spark.operators.multimodal import (
    _decode_stub,
    extract_features,
)

SF = "/root/testdata/sf0.001"


def test_binary_payload_schema_and_features(spark):
    d = load_table(spark, SF, "documents").limit(20)
    binary_df = d.select(
        "doc_id",
        F.lit("text/plain").alias("media_type"),
        F.encode(F.col("text"), "utf-8").alias("payload"),
    )
    assert dict(binary_df.dtypes)["payload"] == "binary"
    feats = extract_features(binary_df).collect()
    assert len(feats) == 20
    originals = {r.doc_id: r.text for r in d.collect()}
    for row in feats:
        raw = originals[row.doc_id].encode()
        expect = _decode_stub(raw)
        assert row.n_bytes == expect["n_bytes"] == len(raw)
        assert row.first_byte == raw[0]
        assert row.byte_checksum == expect["byte_checksum"]


def test_decode_stub_raises_on_missing_payload():
    import pytest

    with pytest.raises(NotImplementedError):
        _decode_stub(None)


def test_q_multimodal_binary_aggregate(spark):
    out = entrymod.queries()["q_multimodal_binary"](spark, SF).collect()
    assert len(out) == 1
    row = out[0]
    assert row.media_type == "text/plain"
    assert row.n_docs == 500
    total = load_table(spark, SF, "documents") \
        .select(F.sum(F.length("text"))).collect()[0][0]
    # ascii corpus: utf-8 byte length == char length
    assert row.total_bytes == total


def test_resize_pad_and_truncate(spark):
    from bossarrowstorageengine_spark.operators.multimodal import resize_payload

    df = spark.createDataFrame(
        [(1, "image/fake", b"abcdef"), (2, "image/fake", b"xy")],
        "doc_id long, media_type string, payload binary")
    out = {r.doc_id: r for r in resize_payload(df, 4).collect()}
    assert bytes(out[1].payload) == b"abcd"          # truncated
    assert bytes(out[2].payload) == b"xy\x00\x00"    # zero-padded
    assert out[1].n_bytes == out[2].n_bytes == 4


def test_sample_frames_stride_and_short_last_frame(spark):
    from bossarrowstorageengine_spark.operators.multimodal import sample_frames

    # 300 bytes → frames of 64: idx 0..4 (last = 44 bytes); stride 4 keeps 0, 4
    df = spark.createDataFrame(
        [(7, "video/fake", bytes(range(256)) + bytes(44))],
        "doc_id long, media_type string, payload binary")
    rows = sorted(sample_frames(df).collect(), key=lambda r: r.frame_idx)
    assert [(r.frame_idx, r.frame_len) for r in rows] == [(0, 64), (4, 44)]
    assert bytes(rows[0].frame) == bytes(range(64))


def test_decode_media_real_codecs_roundtrip():
    """encode_wav/encode_png produce genuine WAV/PNG bytes; decode_media
    parses them with real parsers (stdlib wave, CRC-checked IHDR)."""
    from bossarrowstorageengine_spark.operators.multimodal import (
        decode_media,
        encode_png,
        encode_wav,
    )

    wav = decode_media(encode_wav(1234, sample_rate=8000), "audio/wav")
    assert wav["n_frames"] == 1234
    assert wav["sample_rate"] == 8000
    assert wav["duration_ms"] == 1234 * 1000 // 8000
    assert wav["width"] is None and wav["height"] is None

    png = decode_media(encode_png(17, 9), "image/png")
    assert png["width"] == 17 and png["height"] == 9
    assert png["sample_rate"] is None

    # an external PNG encoder would interoperate: verify our bytes against
    # an independent stdlib parse of the IHDR
    import struct
    payload = encode_png(5, 3)
    assert payload[:8] == b"\x89PNG\r\n\x1a\n"
    w, h = struct.unpack(">II", payload[16:24])
    assert (w, h) == (5, 3)


def test_decode_media_raises_on_corrupt_payloads():
    """Real-codec error path: corrupt payloads raise (never emit garbage
    features) — the contract a production decoder swap must keep."""
    import wave as wave_mod

    import pytest

    from bossarrowstorageengine_spark.operators.multimodal import (
        decode_media,
        encode_png,
    )

    with pytest.raises((wave_mod.Error, EOFError)):
        decode_media(b"definitely not RIFF data", "audio/wav")

    with pytest.raises(ValueError, match="signature"):
        decode_media(b"not a png at all, far too long to be one....", "image/png")

    # flip one IHDR byte → CRC mismatch must be detected
    good = bytearray(encode_png(5, 3))
    good[17] ^= 0xFF  # inside IHDR body (width bytes)
    with pytest.raises(ValueError, match="CRC"):
        decode_media(bytes(good), "image/png")

    # truncated-but-signed payload
    with pytest.raises(ValueError):
        decode_media(b"\x89PNG\r\n\x1a\n" + b"\x00" * 4, "image/png")
