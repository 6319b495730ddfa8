"""Property tests for round-5 components: the Pareto-frontier helper
against a brute-force reference, and the real-codec media encode/decode
round-trip across the parameter space."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st


def _brute_frontier(rows):
    """Reference skyline: O(n²) dominance scan within each block."""
    out = []
    for i, (blk, mx, mn, key) in enumerate(rows):
        dominated = any(
            b == blk and m2 >= mx and n2 <= mn and (m2 > mx or n2 < mn)
            for j, (b, m2, n2, _) in enumerate(rows) if j != i
        )
        if not dominated:
            out.append(key)
    return sorted(out)


@settings(max_examples=12, deadline=None)
@given(st.lists(
    st.tuples(st.integers(0, 1), st.integers(0, 5), st.integers(0, 5)),
    min_size=1, max_size=18,
))
def test_pareto_frontier_matches_bruteforce(spark, points):
    from bossarrowstorageengine_spark.operators.filters import pareto_frontier

    rows = [(blk, mx, mn, i) for i, (blk, mx, mn) in enumerate(points)]
    df = spark.createDataFrame(rows, "blk int, mx int, mn int, key int")
    got = sorted(r.key for r in pareto_frontier(
        df, block="blk", maximize="mx", minimize="mn").collect())
    assert got == _brute_frontier(rows)


@settings(max_examples=25, deadline=None)
@given(st.integers(1, 5000), st.sampled_from([8000, 16000, 44100]))
def test_wav_roundtrip_any_params(n_frames, rate):
    from bossarrowstorageengine_spark.operators.multimodal import (
        decode_media,
        encode_wav,
    )

    out = decode_media(encode_wav(n_frames, sample_rate=rate), "audio/wav")
    assert out["n_frames"] == n_frames
    assert out["sample_rate"] == rate
    assert out["duration_ms"] == n_frames * 1000 // rate


@settings(max_examples=25, deadline=None)
@given(st.integers(1, 300), st.integers(1, 300))
def test_png_roundtrip_any_dims(w, h):
    from bossarrowstorageengine_spark.operators.multimodal import (
        decode_media,
        encode_png,
    )

    out = decode_media(encode_png(w, h), "image/png")
    assert (out["width"], out["height"]) == (w, h)
