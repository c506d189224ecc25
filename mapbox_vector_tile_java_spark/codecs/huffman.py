"""Canonical Huffman entropy coding, fully vectorized via decode lanes.

Purpose: the last ~20-30% on skewed integer streams that varint cannot
reach (varint's floor is 8 bits/value; frequency-remapped dictionary ids
have ~6-8 bits of entropy). This is the entropy-coding half of the
"entropy/cardinality-sampling" discipline the codec selector implements.

Design constraints drive the layout:
- **Vectorized decode.** A single Huffman stream decodes sequentially (bit
  position depends on every previous code). We instead round-robin values
  into independent lane bitstreams: step s of lane l holds value
  ``s*lanes + l``, so one numpy iteration decodes `lanes` values (peek 12
  bits per lane via a 3-byte gather, LUT lookup, advance cursors).
  ceil(n/lanes) python-level steps total.
- **12-bit max code length** so a 4096-entry LUT resolves (symbol, length)
  in one gather. Lengths are limited with a kraft repair pass.
- **Escape symbol** for the value tail: only the top ``MAX_SYMS-1`` most
  frequent values get codes; the rest emit ESCAPE in-stream and their
  values go to a zig-zag varint side stream, restoring the full int64
  domain — losslessness never depends on the frequency model.

Reference lineage: the MVT wire format chooses per-value integer widths
via varints (generated VectorTile.java:1768-1785); Huffman extends the
same stats-driven bits-per-value idea below byte granularity.

Wire layout:
    [n varint][K varint][n_esc varint]
    [code lengths: K bytes]
    [kept value table: (K - has_esc) delta zig-zag varints]
    [escape values: n_esc zig-zag varints, global order]
    [lanes varint][per-lane byte lengths: varints][lane bytes...]
"""

from __future__ import annotations

import heapq

import numpy as np

from .gather import multi_range
from .primitives import (
    varint_encode,
    varint_encode_one,
    zigzag_decode,
    zigzag_encode,
)

MAX_CODE_LEN = 12
MAX_SYMS = 2048          # top values that receive codes (incl. escape)
LANES = 2048
# bit-offset arithmetic drops to int32 when every offset fits (any
# Arrow-batch-sized block); tests force the int64 path by patching this
_INT32_BIT_LIMIT = 1 << 31


def build_lengths(freqs: np.ndarray, max_len: int = MAX_CODE_LEN) -> np.ndarray:
    """Huffman code lengths from positive frequencies, length-limited.

    Deterministic: heap ties resolve by node id (first-created wins).
    O(K log K); K <= MAX_SYMS, runs once per encoded block.
    """
    k = len(freqs)
    if k == 0:
        return np.empty(0, dtype=np.int64)
    if k == 1:
        return np.array([1], dtype=np.int64)
    parent = np.full(2 * k - 1, -1, dtype=np.int64)
    heap = [(int(freqs[i]), i) for i in range(k)]
    heapq.heapify(heap)
    nid = k
    while len(heap) > 1:
        f1, n1 = heapq.heappop(heap)
        f2, n2 = heapq.heappop(heap)
        parent[n1] = nid
        parent[n2] = nid
        heapq.heappush(heap, (f1 + f2, nid))
        nid += 1
    lengths = np.zeros(k, dtype=np.int64)
    for i in range(k):
        d, node = 0, i
        while parent[node] != -1:
            node = parent[node]
            d += 1
        lengths[i] = d
    lengths = np.minimum(lengths, max_len)
    # kraft repair: clamping may overflow; extend the shortest codes (they
    # cost the fewest payload bits per unit of kraft recovered)
    kraft = float((2.0 ** (-lengths.astype(np.float64))).sum())
    while kraft > 1.0 + 1e-12:
        cand = np.flatnonzero(lengths < max_len)
        if len(cand) == 0:
            raise ValueError("cannot satisfy kraft inequality at max_len")
        j = cand[np.argmin(lengths[cand])]
        kraft -= 2.0 ** (-float(lengths[j])) / 2.0
        lengths[j] += 1
    return lengths


def canonical_codes(lengths: np.ndarray) -> np.ndarray:
    """Canonical MSB-first code values from lengths; deterministic."""
    order = np.lexsort((np.arange(len(lengths)), lengths))
    codes = np.zeros(len(lengths), dtype=np.int64)
    code = 0
    prev_len = 0
    for idx in order:
        L = int(lengths[idx])
        code <<= L - prev_len
        codes[idx] = code
        code += 1
        prev_len = L
    return codes


def _decode_lut(lengths: np.ndarray, codes: np.ndarray):
    lut_sym = np.zeros(1 << MAX_CODE_LEN, dtype=np.int32)
    lut_len = np.zeros(1 << MAX_CODE_LEN, dtype=np.int32)
    for s in range(len(lengths)):
        L = int(lengths[s])
        base = int(codes[s]) << (MAX_CODE_LEN - L)
        span = 1 << (MAX_CODE_LEN - L)
        lut_sym[base : base + span] = s
        lut_len[base : base + span] = L
    return lut_sym, lut_len


def _model(v: np.ndarray):
    """(syms per value incl. escape, kept_vals sorted, freqs, esc_sym|-1)."""
    mn, mx = int(v.min()), int(v.max())
    if 0 <= mn and mx <= max(4 * len(v), 1 << 16):
        # dense-domain fast path (dictionary ids, small ints): bincount +
        # table lookup replaces the sort-based unique — same uniq order
        # (ascending), same counts, same inverse, so identical wire bytes
        counts_full = np.bincount(v, minlength=mx + 1)
        uniq = np.flatnonzero(counts_full)
        counts = counts_full[uniq]
        pos = np.zeros(mx + 1, dtype=np.int64)
        pos[uniq] = np.arange(len(uniq))
        inv = pos[v]
    else:
        uniq, inv, counts = np.unique(v, return_inverse=True,
                                      return_counts=True)
    if len(uniq) > MAX_SYMS - 1:
        top = np.sort(np.argsort(-counts, kind="stable")[: MAX_SYMS - 1])
        sym_of_uniq = np.full(len(uniq), -1, dtype=np.int64)
        sym_of_uniq[top] = np.arange(len(top))
        kept_vals, kept_counts = uniq[top], counts[top]
    else:
        sym_of_uniq = np.arange(len(uniq))
        kept_vals, kept_counts = uniq, counts
    syms = sym_of_uniq[inv]
    n_esc = int((syms < 0).sum())
    if n_esc:
        esc_sym = len(kept_vals)
        syms = np.where(syms < 0, esc_sym, syms)
        freqs = np.append(kept_counts, n_esc)
    else:
        esc_sym = -1
        freqs = kept_counts
    return syms, kept_vals, freqs, esc_sym, n_esc


def prepare(values: np.ndarray):
    """Model + code lengths for ``values`` — the shared front half of
    encode() and encoded_size(). Computing it once and passing it to both
    halves halves the model cost when the selector sizes a stream and then
    encodes it with the winning (huffman) codec."""
    v = np.ascontiguousarray(values, dtype=np.int64)
    if len(v) == 0:
        return None
    syms, kept_vals, freqs, esc_sym, n_esc = _model(v)
    return syms, kept_vals, freqs, esc_sym, n_esc, build_lengths(freqs)


def encode(values: np.ndarray, prep=None) -> bytes:
    """Entropy-encode an int64 array; lossless on the full int64 domain."""
    v = np.ascontiguousarray(values, dtype=np.int64)
    n = len(v)
    if n == 0:
        return varint_encode_one(0) + varint_encode_one(0) + varint_encode_one(0)
    syms, kept_vals, freqs, esc_sym, n_esc, lengths = \
        prep if prep is not None else prepare(v)
    K = len(freqs)
    codes = canonical_codes(lengths)

    parts: list[bytes] = [varint_encode_one(n), varint_encode_one(K),
                          varint_encode_one(n_esc)]
    parts.append(lengths.astype(np.uint8).tobytes())
    kd = np.empty(len(kept_vals), dtype=np.int64)
    if len(kept_vals):
        kd[0] = kept_vals[0]
        kd[1:] = (kept_vals.view(np.uint64)[1:]
                  - kept_vals.view(np.uint64)[:-1]).view(np.int64)
    parts.append(varint_encode(zigzag_encode(kd)))
    if n_esc:
        parts.append(varint_encode(zigzag_encode(v[syms == esc_sym])))

    lanes = min(LANES, n)
    steps = -(-n // lanes)
    # int32 fast path: grid/cumsum/offset arithmetic in 4-byte lanes when
    # every bit offset fits (payload bits + per-lane padding < 2^31 — true
    # for any Arrow-batch-sized block; the int64 path remains for larger
    # streams). Same values, same emitted bytes, half the memory traffic of
    # the former all-int64 pipeline — this stage is bandwidth-bound.
    payload_bits_ub = int(lengths.max()) * n + 8 * lanes
    dt = np.int32 if payload_bits_ub < _INT32_BIT_LIMIT else np.int64
    lens_i = lengths.astype(dt)[syms]
    codes_i = codes.astype(dt)[syms]
    grid = np.zeros((steps, lanes), dtype=dt)
    grid.ravel()[:n] = lens_i            # index i = step*lanes + lane
    ofs_grid = np.cumsum(grid, axis=0, dtype=dt)
    ofs_grid -= grid
    lane_bits = (ofs_grid[-1] + grid[-1]).astype(np.int64)
    lane_bytes = (lane_bits + 7) // 8
    lane_start_bits = (np.cumsum(lane_bytes) - lane_bytes) * 8
    # fold the per-lane start offset in by broadcast (replaces the former
    # 8-byte lane_of modulo + gather over every value)
    ofs_grid += lane_start_bits.astype(dt)[None, :]
    gbp = ofs_grid.ravel()[:n]
    # pack via 3-byte windows: a <=12-bit code at bit offset sh (<8) fits in
    # bytes [gbp>>3, gbp>>3 + 2]; bits past the code are zero, so OR-ing a
    # window never corrupts a neighbor. Values within one step live in
    # different lanes (disjoint byte ranges), so each statement's fancy
    # indices are unique; consecutive steps OR cumulatively.
    out_b = np.zeros(int(lane_bytes.sum()) + 2, dtype=np.uint8)  # +2 spill pad
    gbyte = gbp >> 3
    sh = gbp & 7
    w24 = codes_i << (dt(24) - sh - lens_i)
    b0 = (w24 >> 16).astype(np.uint8)
    b1 = ((w24 >> 8) & 0xFF).astype(np.uint8)
    b2 = (w24 & 0xFF).astype(np.uint8)
    for s in range(steps):
        sl = slice(s * lanes, min((s + 1) * lanes, n))
        idx = gbyte[sl]
        out_b[idx] |= b0[sl]
        out_b[idx + 1] |= b1[sl]
        out_b[idx + 2] |= b2[sl]
    parts.append(varint_encode_one(lanes))
    parts.append(varint_encode(lane_bytes.astype(np.uint64)))
    parts.append(out_b[:-2].tobytes())
    return b"".join(parts)


def encoded_size(values: np.ndarray, prep=None) -> int:
    """Exact-side-streams size estimate without building the bitstream.

    Escape and value-table bytes are computed exactly (a wrong estimate
    there made the selector pick huffman for incompressible full-range
    streams, where every escape costs 10 varint bytes)."""
    from .primitives import varint_byte_lengths

    v = np.ascontiguousarray(values, dtype=np.int64)
    n = len(v)
    if n == 0:
        return 3
    syms, kept_vals, freqs, esc_sym, n_esc, lengths = \
        prep if prep is not None else prepare(v)
    payload_bits = int((freqs * lengths).sum())
    lanes = min(LANES, n)
    kd = np.empty(len(kept_vals), dtype=np.int64)
    if len(kept_vals):
        kd[0] = kept_vals[0]
        kd[1:] = (kept_vals.view(np.uint64)[1:]
                  - kept_vals.view(np.uint64)[:-1]).view(np.int64)
    table_bytes = int(varint_byte_lengths(zigzag_encode(kd)).sum())
    esc_bytes = (int(varint_byte_lengths(
        zigzag_encode(v[syms == esc_sym])).sum()) if n_esc else 0)
    return (10 + len(freqs)            # header + length table
            + table_bytes + esc_bytes
            + 2 * lanes                # lane byte-length varints
            + (payload_bits + 7) // 8 + lanes)  # payload + lane padding


def decode(r, n_expected: int) -> np.ndarray:
    """Decode from a ByteReader (strict); returns int64 array."""
    n = r.uvarint()
    K = r.uvarint()
    n_esc = r.uvarint()
    if n != n_expected:
        raise ValueError(f"huffman: count mismatch {n} != {n_expected}")
    if n == 0:
        return np.empty(0, dtype=np.int64)
    lengths = r.take(K).astype(np.int64)
    has_esc = n_esc > 0
    n_kept = K - (1 if has_esc else 0)
    kd = zigzag_decode(r.uvarints(n_kept)) if n_kept else np.empty(0, np.int64)
    # deltas were taken in the uint64 wraparound domain; invert the same way
    kept_vals = np.cumsum(kd.view(np.uint64), dtype=np.uint64).view(np.int64)
    esc_vals = (zigzag_decode(r.uvarints(n_esc)) if has_esc
                else np.empty(0, np.int64))
    lanes = r.uvarint()
    lane_bytes = r.uvarints(lanes).astype(np.int64)
    payload = r.take(int(lane_bytes.sum()))

    codes = canonical_codes(lengths)
    lut_sym, lut_len = _decode_lut(lengths, codes)

    maxb = int(lane_bytes.max()) if lanes else 0
    buf2d = np.zeros((lanes, maxb + 3), dtype=np.uint8)
    starts = np.cumsum(lane_bytes) - lane_bytes
    src_idx = multi_range(starts, lane_bytes)
    dst_rows = np.repeat(np.arange(lanes), lane_bytes)
    dst_cols = src_idx - np.repeat(starts, lane_bytes)
    buf2d[dst_rows, dst_cols] = np.asarray(payload)[src_idx]

    steps = -(-n // lanes)
    lane_counts = (n - np.arange(lanes, dtype=np.int64) + lanes - 1) // lanes
    out_sym = np.empty(steps * lanes, dtype=np.int32)
    bitpos = np.zeros(lanes, dtype=np.int64)
    rows = np.arange(lanes)
    u32 = np.uint32
    for s in range(steps):
        byte = bitpos >> 3
        sh = (bitpos & 7).astype(np.int64)
        w = ((buf2d[rows, byte].astype(u32) << u32(16))
             | (buf2d[rows, byte + 1].astype(u32) << u32(8))
             | buf2d[rows, byte + 2].astype(u32))
        peek = (w >> (u32(MAX_CODE_LEN) - sh.astype(u32))) & u32(0xFFF)
        sym = lut_sym[peek]
        L = lut_len[peek]
        active = s < lane_counts
        if bool((active & (L == 0)).any()):
            raise ValueError("huffman: invalid code in stream")
        out_sym[s * lanes : (s + 1) * lanes] = sym
        bitpos += np.where(active, L, 0)
    if bool((bitpos > lane_bytes * 8).any()) or \
       bool((bitpos <= (lane_bytes - 1) * 8)[lane_bytes > 0].any()):
        raise ValueError("huffman: lane length mismatch")
    syms = out_sym[:n].astype(np.int64)

    out = np.empty(n, dtype=np.int64)
    if has_esc:
        esc_sym = K - 1
        is_esc = syms == esc_sym
        if int(is_esc.sum()) != n_esc:
            raise ValueError("huffman: escape count mismatch")
        safe = np.where(is_esc, 0, syms)
        out = kept_vals[safe] if n_kept else np.zeros(n, dtype=np.int64)
        out[is_esc] = esc_vals
    else:
        out = kept_vals[syms]
    return out
