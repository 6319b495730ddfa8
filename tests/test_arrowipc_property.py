"""Property-based round-trip tests for the arrowipc data source: for
arbitrary (null-sprinkled, unicode, extreme-valued) rows, write→read is the
identity.  Complements the corpus round-trip tests in ``test_arrowipc.py``
with adversarial values the test tables don't contain."""

from __future__ import annotations

import datetime
import math
import uuid

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from bossarrowstorageengine_spark.sources import register_arrowipc

_SCHEMA = ("id long, label string, score double, "
           "emb array<float>, ts timestamp")

_ts = st.datetimes(
    min_value=datetime.datetime(1970, 1, 2),
    max_value=datetime.datetime(2200, 1, 1),
).map(lambda d: d.replace(microsecond=(d.microsecond // 1) or 0))

_row = st.tuples(
    st.integers(min_value=-(2**63), max_value=2**63 - 1),
    st.one_of(st.none(), st.text(max_size=40)),           # unicode incl. ''
    st.one_of(st.none(),
              st.floats(allow_nan=False, allow_infinity=True, width=64)),
    st.one_of(st.none(),
              st.lists(st.floats(allow_nan=False, allow_infinity=False,
                                 width=32), max_size=8)),
    st.one_of(st.none(), _ts),
)


def _canon(rows):
    out = []
    for r in sorted(rows, key=lambda r: (r[0], str(r[1]))):
        emb = None if r[3] is None else tuple(r[3])
        out.append((r[0], r[1], r[2], emb, r[4]))
    return out


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(rows=st.lists(_row, min_size=1, max_size=30), codec=st.sampled_from(
    ["zstd", "lz4", "none"]))
def test_roundtrip_identity_arbitrary_rows(spark, rows, codec):
    register_arrowipc(spark)
    df = spark.createDataFrame(rows, _SCHEMA)
    out = f"/tmp/spark_graft_test/prop_{uuid.uuid4().hex}"
    df.coalesce(1).write.format("arrowipc") \
        .option("compression", codec).mode("append").save(out)
    back = spark.read.format("arrowipc").load(out)
    assert back.schema == df.schema
    got = _canon([tuple(r) for r in back.collect()])
    want = _canon([tuple(r) for r in df.collect()])
    assert got == want


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(rows=st.lists(_row, min_size=1, max_size=30))
def test_roundtrip_identity_stream_encoding(spark, rows):
    """Same identity property through the sequential (stream) IPC encoding
    with a dictionary-encoded string column."""
    register_arrowipc(spark)
    df = spark.createDataFrame(rows, _SCHEMA)
    out = f"/tmp/spark_graft_test/prop_{uuid.uuid4().hex}"
    df.coalesce(1).write.format("arrowipc") \
        .option("ipcFormat", "stream").option("dictionary", "label") \
        .mode("append").save(out)
    back = spark.read.format("arrowipc").load(out)
    assert back.schema == df.schema
    got = _canon([tuple(r) for r in back.collect()])
    want = _canon([tuple(r) for r in df.collect()])
    assert got == want
