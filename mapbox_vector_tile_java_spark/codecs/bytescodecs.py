"""Bytes-shape codecs (string / binary columns): raw, dictionary,
global-broadcast dictionary, FSST.

A bytes column is carried as ``(lengths: int64[], data: uint8[])`` — exactly
the Arrow varbinary layout (offsets become lengths). Lengths are themselves
compressed with the best int codec (auto-picked by exact size), mirroring how
the reference's packed geometry stream nests varint parameters under a
run-length header (vector_tile.proto:44,52).

``dict_bytes`` is the direct descendant of the reference's layer-global
key/value dictionaries (MvtLayerProps.java:33-60 insert-or-get +
MvtUtil.writeProps MvtUtil.java:246-255): unique values stored once, rows as
bit-packed indexes. ``dict_global`` hoists the table out of the blob into a
table registry shared across all partitions via a Spark broadcast — the
"layer-global" idea at cluster scale; the blob stores only the table id
(analog of Layer.keys being tile-level, vector_tile.proto:69-72).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from . import fsst as fsstmod
from .base import ByteReader, CodecSpec, SHAPE_BYTES, put_uvarint, register
from .intcodecs import (
    CONST_INT,
    FOR_BITPACK,
    FOR_DELTA,
    RAW_INT,
    RLE_INT,
    delta_size,
    for_size,
    raw_int_size,
    rle_size,
)
from .gather import gather_runs
from .primitives import bit_width, bitpack, bitunpack


# ---------------------------------------------------------------------------
# auto-picked int sub-blob (used for lengths and by the column-level selector)

def encode_int_sub(a: np.ndarray, params: dict | None = None) -> bytes:
    """[codec_id byte][payload] with the smallest-output int codec, chosen by
    exact size formulas (stats-driven choice — descendant of the reference's
    JtsGeomStats sampling, JtsGeomStats.java:48-153)."""
    params = params or {}
    a = np.ascontiguousarray(a, dtype=np.int64)
    n = len(a)
    if n == 0:
        return bytes([RAW_INT.codec_id])
    if a.min() == a.max():
        return bytes([CONST_INT.codec_id]) + CONST_INT.encode(a, params)
    cands = [
        (rle_size(a), RLE_INT),
        (for_size(a), FOR_BITPACK),
        (delta_size(a), FOR_DELTA),
        (raw_int_size(n), RAW_INT),
    ]
    cands.sort(key=lambda c: (c[0], c[1].codec_id))
    spec = cands[0][1]
    return bytes([spec.codec_id]) + spec.encode(a, params)


def decode_int_sub(r: ByteReader, n: int) -> np.ndarray:
    from .base import by_id

    spec = by_id(int(r.take(1)[0]))
    if n == 0:
        return np.empty(0, dtype=np.int64)
    return spec.decode(r, n)


# ---------------------------------------------------------------------------
# raw bytes

def _rawb_encode(inp: tuple[np.ndarray, np.ndarray], params: dict) -> bytes:
    lens, data = inp
    return encode_int_sub(lens) + data.tobytes()


def _rawb_decode(r: ByteReader, n: int, ctx: dict | None = None):
    lens = decode_int_sub(r, n)
    data = r.take(int(lens.sum()))
    return lens, data


# ---------------------------------------------------------------------------
# dictionary (inline table)

def _bytes_array(lens: np.ndarray, data: np.ndarray) -> pa.Array:
    offsets = np.zeros(len(lens) + 1, dtype=np.int64)
    np.cumsum(lens, out=offsets[1:])
    return pa.LargeBinaryArray.from_buffers(
        pa.large_binary(), len(lens),
        [None, pa.py_buffer(offsets.tobytes()), pa.py_buffer(data.tobytes())],
    )


def _array_parts(arr: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    arr = arr.cast(pa.large_binary())
    o = np.frombuffer(arr.buffers()[1], dtype=np.int64)[arr.offset : arr.offset + len(arr) + 1]
    data = np.frombuffer(arr.buffers()[2] or b"", dtype=np.uint8)[o[0] : o[-1]]
    return np.diff(o), data


def _dictb_encode(inp: tuple[np.ndarray, np.ndarray], params: dict) -> bytes:
    lens, data = inp
    arr = _bytes_array(lens, data)
    enc = arr.dictionary_encode()
    table = enc.dictionary
    idx = enc.indices.to_numpy(zero_copy_only=False).astype(np.uint64)
    t_lens, t_data = _array_parts(table)
    parts: list[bytes] = []
    put_uvarint(parts, len(table))
    parts.append(encode_int_sub(t_lens))
    parts.append(t_data.tobytes())
    w = bit_width(np.array([max(len(table) - 1, 0)], dtype=np.uint64))
    parts.append(bytes([w]))
    parts.append(bitpack(idx, w))
    return b"".join(parts)


def _dictb_decode(r: ByteReader, n: int, ctx: dict | None = None):
    nuniq = r.uvarint()
    t_lens = decode_int_sub(r, nuniq)
    t_data = r.take(int(t_lens.sum()))
    w = int(r.take(1)[0])
    idx = bitunpack(r.take((n * w + 7) // 8), n, w).astype(np.int64)
    lens = t_lens[idx]
    ofs = np.concatenate(([0], np.cumsum(t_lens)))[:-1]
    return lens, gather_runs(t_data, ofs[idx], lens)


# ---------------------------------------------------------------------------
# global-broadcast dictionary

def _dictg_encode(inp: tuple[np.ndarray, np.ndarray], params: dict) -> bytes:
    lens, data = inp
    symbols: list[bytes] = params["symbols"]  # sorted, deterministic
    symtab_id: int = params["symtab_id"]
    arr = _bytes_array(lens, data)
    idx = pc.index_in(arr, value_set=pa.array(symbols, type=pa.large_binary()))
    if idx.null_count:
        raise ValueError("value missing from global dictionary")
    iv = idx.to_numpy(zero_copy_only=False).astype(np.uint64)
    parts: list[bytes] = []
    put_uvarint(parts, symtab_id)
    w = bit_width(np.array([max(len(symbols) - 1, 0)], dtype=np.uint64))
    parts.append(bytes([w]))
    parts.append(bitpack(iv, w))
    return b"".join(parts)


def _dictg_decode(r: ByteReader, n: int, ctx: dict | None = None):
    symtab_id = r.uvarint()
    symbols: list[bytes] = ctx["symtabs"][symtab_id]
    w = int(r.take(1)[0])
    idx = bitunpack(r.take((n * w + 7) // 8), n, w).astype(np.int64)
    t_lens = np.fromiter((len(s) for s in symbols), dtype=np.int64, count=len(symbols))
    t_data = np.frombuffer(b"".join(symbols), dtype=np.uint8)
    ofs = np.concatenate(([0], np.cumsum(t_lens)))[:-1]
    lens = t_lens[idx]
    return lens, gather_runs(t_data, ofs[idx], lens)


# ---------------------------------------------------------------------------
# FSST

def _fsst_encode(inp: tuple[np.ndarray, np.ndarray], params: dict) -> bytes:
    lens, data = inp
    table: fsstmod.SymbolTable | None = params.get("fsst_table")
    if table is None:
        table = fsstmod.train(data)
    comp = table.compress(data)
    parts: list[bytes] = [encode_int_sub(lens)]
    tb = table.table_bytes()
    put_uvarint(parts, len(tb))
    parts.append(tb)
    put_uvarint(parts, len(comp))
    parts.append(comp)
    return b"".join(parts)


def _fsst_decode(r: ByteReader, n: int, ctx: dict | None = None):
    lens = decode_int_sub(r, n)
    tb = r.section()
    comp = r.section()
    table = fsstmod.decoder_from_table_bytes(tb)
    data = table.decompress(comp)
    if len(data) != int(lens.sum()):
        raise ValueError("fsst decode length mismatch")
    return lens, data


RAW_BYTES = register(CodecSpec("raw_bytes", 0x11, SHAPE_BYTES, _rawb_encode, _rawb_decode))
DICT_BYTES = register(CodecSpec("dict_bytes", 0x12, SHAPE_BYTES, _dictb_encode, _dictb_decode))
DICT_GLOBAL = register(CodecSpec("dict_global", 0x13, SHAPE_BYTES, _dictg_encode, _dictg_decode))
FSST_BYTES = register(CodecSpec("fsst", 0x14, SHAPE_BYTES, _fsst_encode, _fsst_decode))
