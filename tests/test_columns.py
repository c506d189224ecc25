"""Column envelope round-trip tests over every supported arrow type,
including the FIXTURES.md adversarial variants (nulls vs empty strings,
duplicates, unicode, single/zero-row, extreme timestamps)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from mapbox_vector_tile_java_spark.columns import decode_column, encode_column

from helpers import assert_bit_equal

rng = np.random.default_rng(487125064)


def _dec_arr(vals, precision, scale):
    from decimal import Decimal

    return pa.array([None if v is None else Decimal(v) for v in vals],
                    type=pa.decimal128(precision, scale))


def roundtrip(arr: pa.Array, codec="auto", params=None, ctx=None):
    blob, meta = encode_column(arr, codec, params)
    out = decode_column(blob, arr.type, ctx)
    assert_bit_equal(out, arr)
    return meta


CASES = {
    "int64": pa.array([1, 2, 3, None, -5, 2**62, -(2**62)], type=pa.int64()),
    "int32": pa.array([1, None, -(2**31), 2**31 - 1], type=pa.int32()),
    "int16": pa.array([0, -32768, 32767, None], type=pa.int16()),
    "int8": pa.array([0, -128, 127], type=pa.int8()),
    "uint64": pa.array([0, 2**64 - 1, 5], type=pa.uint64()),
    "bool": pa.array([True, False, None, True], type=pa.bool_()),
    "float64": pa.array([1.5, -0.0, float("inf"), float("-inf"), None, 3.141592653589793], type=pa.float64()),
    "float64_nan": pa.array(np.array([np.nan, 1.0, np.float64.fromhex("0x1.fffp+3")]), type=pa.float64()),
    "float32": pa.array(np.array([1.5, -2.25, np.nan], dtype=np.float32), type=pa.float32()),
    "ts_us": pa.array([0, 1, None, 1_700_000_000_000_000], type=pa.timestamp("us")),
    "ts_us_tz": pa.array([12345, None], type=pa.timestamp("us", tz="UTC")),
    "ts_ns": pa.array([99, -5], type=pa.timestamp("ns")),
    "date32": pa.array([0, 19000, None], type=pa.date32()),
    "string": pa.array(["hello", "", None, "héllo", "日本語", "🎉"], type=pa.string()),
    "large_string": pa.array(["a" * 1000, None, ""], type=pa.large_string()),
    "binary": pa.array([b"\x00\xff", b"", None, bytes(range(256))], type=pa.binary()),
    "large_binary": pa.array([b"x" * 10], type=pa.large_binary()),
    "list_f32": pa.array([[1.0, 2.0], None, [], [3.5]], type=pa.list_(pa.float32())),
    "list_i64": pa.array([[1, 2, 3], [4], None], type=pa.list_(pa.int64())),
    "all_null": pa.array([None, None, None], type=pa.string()),
    "empty": pa.array([], type=pa.int64()),
    "empty_str": pa.array([], type=pa.string()),
    "single": pa.array([42], type=pa.int64()),
    "no_nulls_str": pa.array(["a", "b", "a", "a"], type=pa.string()),
    "null_vs_empty": pa.array([None, "", None, "", "x"], type=pa.string()),
    "dups": pa.array(["same", "same", "same", "same"], type=pa.string()),
    "struct": pa.array(
        [{"a": 1, "b": "x"}, None, {"a": None, "b": ""}, {"a": -7, "b": None}],
        type=pa.struct([("a", pa.int64()), ("b", pa.string())])),
    "struct_nested": pa.array(
        [{"m": {"q": 1.5}, "l": [1, 2], "s": "t"},
         {"m": None, "l": None, "s": None},
         None,
         {"m": {"q": None}, "l": [], "s": "u"}],
        type=pa.struct([("m", pa.struct([("q", pa.float64())])),
                        ("l", pa.list_(pa.int32())),
                        ("s", pa.string())])),
    "struct_all_null_field": pa.array(
        [{"a": None, "b": 1}, {"a": None, "b": 2}],
        type=pa.struct([("a", pa.string()), ("b", pa.int64())])),
    "list_struct": pa.array(
        [[{"k": 1}, {"k": None}], None, [], [{"k": 9}]],
        type=pa.list_(pa.struct([("k", pa.int64())]))),
    "map_str_i64": pa.array(
        [[("a", 1), ("b", 2)], None, [], [("c", None)], [("a", 3)]],
        type=pa.map_(pa.string(), pa.int64())),
    "map_ts": pa.array(
        [[("x", 1_700_000_000_000_000)], []],
        type=pa.map_(pa.string(), pa.timestamp("us"))),
    "decimal_cents": _dec_arr(["12.34", None, "-99999999.99", "0.01", "0.00"],
                              12, 2),
    "decimal_wide": _dec_arr([str(10**37), str(-(10**37)), None, "0"], 38, 0),
    "struct_decimal": pa.array(
        [{"p": __import__("decimal").Decimal("1.50"), "q": 2}, None],
        type=pa.struct([("p", pa.decimal128(10, 2)), ("q", pa.int64())])),
}


@pytest.mark.parametrize("name", list(CASES))
def test_envelope_roundtrip(name):
    roundtrip(CASES[name])


def test_large_random_columns():
    n = 50_000
    ints = rng.integers(-(2**62), 2**62, n)
    mask = rng.random(n) < 0.1
    arr = pa.array(ints, type=pa.int64(), mask=mask)
    roundtrip(arr)

    floats = rng.random(n)
    roundtrip(pa.array(floats, type=pa.float64()))

    words = np.array(["alpha", "beta", "gamma", "delta"])[rng.integers(0, 4, n)]
    roundtrip(pa.array(words, type=pa.string(), mask=mask))


def test_sorted_timestamps_pick_delta():
    ts = np.sort(rng.integers(1_500_000_000_000_000, 1_700_000_000_000_000, 10_000))
    meta = roundtrip(pa.array(ts, type=pa.timestamp("us")))
    assert meta["codec"] == "for_delta"
    assert meta["enc_bytes"] < meta["raw_bytes"] / 1.3


def test_low_card_picks_dict():
    langs = np.array(["en", "de", "fr"])[rng.integers(0, 3, 20_000)]
    meta = roundtrip(pa.array(langs, type=pa.string()))
    assert meta["codec"] == "dict_bytes"
    assert meta["enc_bytes"] < meta["raw_bytes"] / 4


def test_repetitive_text_picks_fsst():
    docs = [f"common crawl web page body {i:06d} text with shared vocabulary " * 3
            for i in range(2000)]
    meta = roundtrip(pa.array(docs, type=pa.string()))
    # size-based choice between the substring (fsst) and token (tok_dict)
    # compressors — either is correct; raw/dict here would be a selector bug
    assert meta["codec"] in ("fsst", "tok_dict")
    assert meta["enc_bytes"] < meta["raw_bytes"] / 2


def test_high_card_rejects_dict():
    """FIXTURES.md rt_high_card: near-unique column must not pick dict."""
    vals = [f"unique-{i:010d}-suffix" for i in range(10_000)]
    meta = roundtrip(pa.array(vals, type=pa.string()))
    assert meta["codec"] != "dict_bytes"


def test_global_dict_roundtrip():
    langs = pa.array(["en", "de", None, "en", "zh"], type=pa.string())
    symbols = [b"de", b"en", b"zh"]
    blob, meta = encode_column(langs, "dict_global", {"symbols": symbols, "symtab_id": 7})
    out = decode_column(blob, pa.string(), {"symtabs": {7: symbols}})
    assert out.equals(langs)
    assert meta["codec"] == "dict_global"


def test_content_crc_stable():
    arr = pa.array([1, 2, None, 4], type=pa.int64())
    _, m1 = encode_column(arr)
    _, m2 = encode_column(arr)
    assert m1["content_crc"] == m2["content_crc"]


def test_trailing_garbage_rejected():
    arr = pa.array([1, 2, 3], type=pa.int64())
    blob, _ = encode_column(arr)
    with pytest.raises(ValueError):
        decode_column(blob + b"\x00", pa.int64())


def test_content_crc_matches_decoded_recompute():
    from mapbox_vector_tile_java_spark.columns import content_crc

    cases = [
        pa.array([1, 2, None, 4], type=pa.int64()),
        pa.array(["a b c", None, "", "d  e"], type=pa.string()),
        pa.array([[1.5, 2.5], None, []], type=pa.list_(pa.float64())),
        pa.array([True, False, None], type=pa.bool_()),
    ]
    for arr in cases:
        blob, meta = encode_column(arr)
        out = decode_column(blob, arr.type)
        assert content_crc(out) == meta["content_crc"], arr.type


def test_bitflip_detected_by_content_crc():
    # codec payloads are not self-checking; the manifest crc is the
    # integrity gate — verify a middle-byte flip changes the recomputed crc
    from mapbox_vector_tile_java_spark.columns import content_crc

    rows = ["the quick brown fox jumps"] * 200 + ["over the lazy dog"] * 200
    arr = pa.array(rows, type=pa.string())
    blob, meta = encode_column(arr, "auto")
    flipped = bytearray(blob)
    flipped[len(flipped) // 2] ^= 0xFF
    try:
        out = decode_column(bytes(flipped), pa.string())
    except (ValueError, IndexError, KeyError):
        return  # structural corruption already caught — fine
    assert content_crc(out) != meta["content_crc"]


def test_multi_segment_single_document():
    """A single document larger than the FSST parse SEGMENT exercises the
    cache-blocked multi-segment path end-to-end (segment edges are chunk
    edges; parses must concatenate exactly)."""
    from mapbox_vector_tile_java_spark.codecs import fsst as fsstmod

    words = np.array(["the ", "web ", "crawl ", "data ", "page "], dtype=object)
    big = "".join(words[rng.integers(0, len(words), 800_000)])  # ~4MB, 8 segments
    arr = pa.array([big, "small", None, big[: 10_000]], type=pa.string())
    blob, meta = encode_column(arr)
    out = decode_column(blob, pa.string())
    assert out.equals(arr)
    # and the raw kernel agrees with a single-segment parse on a slice
    data = np.frombuffer(big.encode(), dtype=np.uint8)
    table = fsstmod.train(data[: 1 << 18])
    seg = fsstmod.SEGMENT
    assert len(data) > seg  # the test's premise
    comp = table.compress(data)
    assert bytes(table.decompress(comp)) == bytes(data)
