"""Property-based round-trip tests (hypothesis): encode∘decode == identity
for arbitrary inputs, for every codec that accepts arbitrary data.

The reference's correctness discipline is fixed-seed randomized round-trip
equality (MvtBuildTest.java:60,179); property testing is the same idea with
an adversarial search strategy on top. Every failure here is a real
losslessness bug by definition — no tolerance, bit-identity only.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
from hypothesis import given, settings, strategies as st

from mapbox_vector_tile_java_spark.codecs import base, by_name
from mapbox_vector_tile_java_spark.columns import (
    content_crc,
    decode_column,
    encode_column,
)

I64 = st.integers(min_value=-(2**63), max_value=2**63 - 1)


def _roundtrip_int(codec: str, values: list[int]):
    a = np.array(values, dtype=np.int64)
    spec = by_name(codec)
    blob = spec.encode(a, {})
    r = base.ByteReader(blob)
    out = spec.decode(r, len(a))
    r.expect_end()
    np.testing.assert_array_equal(out, a)


@pytest.mark.parametrize(
    "codec", ["raw_int", "rle_int", "for_bitpack", "for_delta", "dict_int",
              "varint_int", "huff_int"])
@settings(max_examples=60, deadline=None)
@given(values=st.lists(I64, min_size=1, max_size=200))
def test_int_codec_roundtrip_property(codec, values):
    _roundtrip_int(codec, values)


@pytest.mark.parametrize("codec", ["raw_bytes", "dict_bytes", "fsst", "tok_dict"])
@settings(max_examples=40, deadline=None)
@given(rows=st.lists(st.binary(min_size=0, max_size=120), min_size=0,
                     max_size=60))
def test_bytes_codec_roundtrip_property(codec, rows):
    lens = np.fromiter((len(r) for r in rows), dtype=np.int64, count=len(rows))
    data = np.frombuffer(b"".join(rows), dtype=np.uint8)
    spec = by_name(codec)
    blob = spec.encode((lens, data), {})
    r = base.ByteReader(blob)
    out_lens, out_data = spec.decode(r, len(rows), {})
    r.expect_end()
    np.testing.assert_array_equal(np.asarray(out_lens), lens)
    assert np.asarray(out_data).tobytes() == data.tobytes()


@settings(max_examples=40, deadline=None)
@given(rows=st.lists(
    st.one_of(st.none(), st.text(max_size=40)), min_size=0, max_size=60))
def test_column_envelope_string_property(rows):
    arr = pa.array(rows, type=pa.string())
    blob, meta = encode_column(arr)
    out = decode_column(blob, pa.string())
    assert out.equals(arr)
    assert content_crc(out) == meta["content_crc"]


@settings(max_examples=40, deadline=None)
@given(rows=st.lists(st.one_of(st.none(), st.floats(allow_nan=True,
                                                    allow_infinity=True)),
                     min_size=0, max_size=60))
def test_column_envelope_float_bits_property(rows):
    # floats travel as bit views: NaN payloads and -0.0 must survive exactly
    arr = pa.array(rows, type=pa.float64())
    blob, meta = encode_column(arr)
    out = decode_column(blob, pa.float64())
    a = arr.to_numpy(zero_copy_only=False)
    b = out.to_numpy(zero_copy_only=False)
    assert a.tobytes() == b.tobytes()
    assert out.is_valid().equals(arr.is_valid())


@settings(max_examples=30, deadline=None)
@given(rows=st.lists(
    st.one_of(st.none(), st.lists(st.integers(-(2**31), 2**31 - 1),
                                  max_size=12)),
    min_size=0, max_size=40))
def test_column_envelope_list_property(rows):
    arr = pa.array(rows, type=pa.list_(pa.int64()))
    blob, meta = encode_column(arr)
    out = decode_column(blob, pa.list_(pa.int64()))
    assert out.equals(arr)


@settings(max_examples=25, deadline=None)
@given(rows=st.lists(st.binary(max_size=30), min_size=1, max_size=30),
       extra=st.lists(st.binary(max_size=30), min_size=1, max_size=10))
def test_dict_global_escape_property(rows, extra):
    # dictionary built from `rows` only; encode rows+extra — out-of-dict
    # values must escape losslessly
    symbols = sorted(set(rows))
    all_rows = rows + extra
    lens = np.fromiter((len(r) for r in all_rows), dtype=np.int64,
                       count=len(all_rows))
    data = np.frombuffer(b"".join(all_rows), dtype=np.uint8)
    spec = by_name("dict_global")
    blob = spec.encode((lens, data), {"symbols": symbols, "symtab_id": 0})
    r = base.ByteReader(blob)
    out_lens, out_data = spec.decode(r, len(all_rows), {"symtabs": {0: symbols}})
    r.expect_end()
    np.testing.assert_array_equal(np.asarray(out_lens), lens)
    assert np.asarray(out_data).tobytes() == data.tobytes()


@settings(max_examples=30, deadline=None)
@given(rows=st.lists(
    st.one_of(st.none(),
              st.fixed_dictionaries({
                  "a": st.one_of(st.none(), st.integers(-(2**40), 2**40)),
                  "b": st.one_of(st.none(), st.text(max_size=20)),
                  "c": st.one_of(st.none(),
                                 st.lists(st.integers(-100, 100), max_size=5)),
              })),
    min_size=0, max_size=40))
def test_column_envelope_struct_property(rows):
    t = pa.struct([("a", pa.int64()), ("b", pa.string()),
                   ("c", pa.list_(pa.int32()))])
    arr = pa.array(rows, type=t)
    blob, meta = encode_column(arr)
    out = decode_column(blob, t)
    assert out.equals(arr)
    assert content_crc(out) == meta["content_crc"]


@settings(max_examples=30, deadline=None)
@given(rows=st.lists(
    st.one_of(st.none(),
              st.lists(st.tuples(st.text(max_size=8),
                                 st.one_of(st.none(),
                                           st.integers(-(2**40), 2**40))),
                       max_size=6, unique_by=lambda kv: kv[0])),
    min_size=0, max_size=40))
def test_column_envelope_map_property(rows):
    t = pa.map_(pa.string(), pa.int64())
    arr = pa.array(rows, type=t)
    blob, meta = encode_column(arr)
    out = decode_column(blob, t)
    lt = pa.list_(pa.struct([t.key_field, t.item_field]))
    assert out.cast(lt).equals(arr.cast(lt))
    assert content_crc(out) == meta["content_crc"]


@settings(max_examples=50, deadline=None)
@given(values=st.lists(I64, min_size=1, max_size=200))
def test_byteplane_roundtrip_property(values):
    _roundtrip_int("byteplane", values)
