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
