"""Property tests for the posting codecs (no Spark needed)."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from alix_spark.index import codec


@given(
    st.lists(st.integers(min_value=0, max_value=2**40), max_size=300)
)
@settings(max_examples=200, deadline=None)
def test_varbyte_roundtrip(values):
    arr = np.array(values, dtype=np.uint64)
    assert np.array_equal(codec.varbyte_decode(codec.varbyte_encode(arr)), arr) or (
        arr.size == 0
    )


@given(
    st.lists(
        st.integers(min_value=0, max_value=2**40),
        max_size=300,
        unique=True,
    )
)
@settings(max_examples=200, deadline=None)
def test_delta_roundtrip(ids):
    arr = np.sort(np.array(ids, dtype=np.uint64))
    gaps = codec.delta_encode(arr)
    assert np.array_equal(codec.delta_decode(gaps), arr)


@given(st.lists(st.integers(min_value=0, max_value=2**40), unique=True, max_size=200))
@settings(max_examples=100, deadline=None)
def test_delta_varbyte_composed(ids):
    arr = np.sort(np.array(ids, dtype=np.uint64))
    buf = codec.varbyte_encode(codec.delta_encode(arr))
    assert np.array_equal(codec.delta_decode(codec.varbyte_decode(buf)), arr)


def test_smallfloat_exact_small_values():
    # values below 2^4 are subnormal: exact roundtrip (Lucene semantics)
    v = np.arange(0, 16)
    assert np.array_equal(codec.byte4_to_int(codec.int_to_byte4(v)), v)


def test_smallfloat_monotone_and_lossy():
    v = np.arange(0, 100000)
    q = codec.quantize_doc_len(v)
    # quantization never exceeds the input and is monotone non-decreasing
    assert (q <= v).all()
    assert (np.diff(q) >= 0).all()
    # idempotent: quantizing a quantized value is identity
    assert np.array_equal(codec.quantize_doc_len(q), q)


def test_smallfloat_golden_vs_lucene():
    """Byte-for-byte golden comparison against lucene-core-8.8.1
    (tests/golden/smallfloat_lucene881.csv was produced by running
    SmallFloat.intToByte4/byte4ToInt through the reference's own jar)."""
    import pathlib

    golden = pathlib.Path(__file__).parent / "golden" / "smallfloat_lucene881.csv"
    rows = [tuple(map(int, line.split(","))) for line in golden.read_text().split()]
    i = np.array([r[0] for r in rows])
    expected = np.array([r[1] for r in rows])
    assert np.array_equal(codec.quantize_doc_len(i), expected)
    # spot semantics: small lengths are exact, larger ones round down
    assert codec.quantize_doc_len(np.array([17]))[0] == 17
    assert codec.quantize_doc_len(np.array([39]))[0] == 39
    assert codec.quantize_doc_len(np.array([41]))[0] == 40
