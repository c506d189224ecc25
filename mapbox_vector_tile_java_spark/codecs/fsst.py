"""FSST-style symbol-table string compression, from scratch, vectorized.

Design (public knowledge: Boncz/Neumann/Leis, "FSST: Fast Random Access
String Compression", VLDB 2020 — we implement the *interface and wire
discipline* of FSST, not its exact table-construction algorithm):

- a table of up to 255 symbols, each 1..8 bytes; output codes are one byte;
  code 255 is an escape marker meaning "next byte is a literal".
- table construction here uses iterative most-frequent-adjacent-pair merging
  (byte-pair style) because every step of it is expressible as whole-array
  numpy operations — no per-byte Python, per the north rule.
- decode needs only the (code -> symbol bytes) table; encode additionally
  replays the learned merge rules, each rule one vectorized pass.

The reference analog is the layer-global key/value dictionary
(MvtLayerProps.java:33-60): a shared table built from the data, with rows
storing only compact references into it. FSST generalizes that from whole
values to substrings.

Losslessness: every input byte either becomes part of a matched symbol or is
escaped verbatim, so decode(encode(x)) == x for arbitrary bytes.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from .gather import multi_range
from .primitives import varint_decode, varint_encode, varint_encode_one

ESCAPE = 255
MAX_SYMBOLS = 255  # codes 0..254; 255 reserved for escape
MAX_SYMBOL_LEN = 8
_PAIR_K = np.int64(1 << 20)


def _merge_pass(toks: np.ndarray, a: int, b: int, t: int) -> np.ndarray:
    """Replace adjacent (a, b) token pairs with token t, one vectorized pass.

    Overlaps (only possible when a == b) are resolved greedily left-to-right
    by keeping even offsets within each run of consecutive match positions.
    """
    if len(toks) < 2:
        return toks
    m = np.flatnonzero((toks[:-1] == a) & (toks[1:] == b))
    if len(m) == 0:
        return toks
    if a == b:
        first = np.empty(len(m), dtype=bool)
        first[0] = True
        np.not_equal(np.diff(m), 1, out=first[1:])
        run_start = m[np.maximum.accumulate(np.where(first, np.arange(len(m)), 0))]
        m = m[(m - run_start) % 2 == 0]
    toks[m] = t
    keep = np.ones(len(toks), dtype=bool)
    keep[m + 1] = False
    return toks[keep]


@dataclass
class SymbolTable:
    """Trained FSST-style table: final symbols + the merge program."""

    symbols: list[bytes]                      # code -> bytes (len <= 255)
    merges: list[tuple[int, int, int]]        # (left_tok, right_tok, new_tok)
    tok_bytes: list[bytes]                    # internal token id -> expansion
    code_of: np.ndarray = field(default=None)  # internal token id -> code or -1

    def __post_init__(self):
        if self.code_of is None:
            sym_code = {s: i for i, s in enumerate(self.symbols)}
            self.code_of = np.full(len(self.tok_bytes), -1, dtype=np.int64)
            for tok, bs in enumerate(self.tok_bytes):
                self.code_of[tok] = sym_code.get(bs, -1)
        self._enc_cache = None
        # decode-side gather tables
        lens = np.fromiter((len(s) for s in self.symbols), dtype=np.int64,
                           count=len(self.symbols))
        if len(lens) == 0:  # degenerate: everything escapes
            lens = np.zeros(1, dtype=np.int64)
        self._sym_lens = lens
        self._sym_ofs = np.concatenate(([0], np.cumsum(lens)))[:-1]
        self._sym_data = np.frombuffer(b"".join(self.symbols), dtype=np.uint8)

    # -- encode-side token -> output-bytes table -------------------------------
    def _enc_tables(self):
        if self._enc_cache is not None:
            return self._enc_cache
        enc: list[bytes] = []
        byte_code = self.code_of[:256]
        for tok, bs in enumerate(self.tok_bytes):
            c = int(self.code_of[tok])
            if c >= 0:
                enc.append(bytes([c]))
            else:
                out = bytearray()
                for byte in bs:
                    bc = int(byte_code[byte])
                    if bc >= 0:
                        out.append(bc)
                    else:
                        out.append(ESCAPE)
                        out.append(byte)
                enc.append(bytes(out))
        lens = np.fromiter((len(e) for e in enc), dtype=np.int64, count=len(enc))
        ofs = np.concatenate(([0], np.cumsum(lens)))[:-1]
        data = np.frombuffer(b"".join(enc), dtype=np.uint8)
        self._enc_cache = (lens, ofs, data)
        return self._enc_cache

    def compress(self, data: np.ndarray) -> bytes:
        """uint8 array -> compressed bytes (codes + escapes)."""
        if len(data) == 0:
            return b""
        toks = data.astype(np.uint16)  # token ids stay < 2^16; halves bandwidth
        for a, b, t in self.merges:
            toks = _merge_pass(toks, a, b, t)
        lens, ofs, enc_data = self._enc_tables()
        return enc_data[multi_range(ofs[toks], lens[toks])].tobytes()

    def decompress(self, buf: bytes | np.ndarray) -> np.ndarray:
        """compressed bytes -> original uint8 array."""
        b = np.frombuffer(buf, dtype=np.uint8) if not isinstance(buf, np.ndarray) else buf
        if len(b) == 0:
            return b[:0]
        p255 = np.flatnonzero(b == ESCAPE)
        if len(p255):
            first = np.empty(len(p255), dtype=bool)
            first[0] = True
            np.not_equal(np.diff(p255), 1, out=first[1:])
            run_start = p255[np.maximum.accumulate(
                np.where(first, np.arange(len(p255)), 0))]
            esc = p255[(p255 - run_start) % 2 == 0]
            if len(esc) and esc[-1] + 1 >= len(b):
                raise ValueError("corrupt fsst stream: trailing escape")
        else:
            esc = p255
        kind = np.zeros(len(b), dtype=np.int8)  # 0=code 1=escape 2=literal
        kind[esc] = 1
        kind[esc + 1] = 2
        codes = b.astype(np.int64)
        is_code = kind == 0
        if is_code.any() and int(codes[is_code].max()) >= len(self.symbols):
            raise ValueError("corrupt fsst stream: code out of range")
        safe = np.where(is_code, codes, 0)
        out_lens = np.where(kind == 1, 0, np.where(kind == 2, 1, self._sym_lens[safe]))
        # gather source: symbols data ++ the buffer itself (for literals)
        src = np.where(kind == 2, len(self._sym_data) + np.arange(len(b)),
                       self._sym_ofs[safe])
        pool = np.concatenate((self._sym_data, b))
        return pool[multi_range(src, out_lens)]

    # -- (de)serialization ------------------------------------------------------
    def table_bytes(self) -> bytes:
        """Decode-side table: n, per-symbol lengths, concatenated bytes."""
        parts = [bytes([len(self.symbols)])]
        parts.append(bytes(len(s) for s in self.symbols))
        parts.append(b"".join(self.symbols))
        return b"".join(parts)

    def full_bytes(self) -> bytes:
        """Encode+decode state (for shared/global table registry)."""
        tb = self.table_bytes()
        parts = [varint_encode_one(len(tb)), tb,
                 varint_encode_one(len(self.merges))]
        flat = np.array([x for m in self.merges for x in m], dtype=np.uint64)
        parts.append(varint_encode(flat))
        return b"".join(parts)


def table_from_bytes(buf: np.ndarray | bytes) -> tuple[list[bytes], int]:
    b = np.frombuffer(buf, dtype=np.uint8) if not isinstance(buf, np.ndarray) else buf
    n = int(b[0])
    lens = b[1 : 1 + n].astype(np.int64)
    ofs = 1 + n + np.concatenate(([0], np.cumsum(lens)))
    raw = b.tobytes()
    symbols = [raw[ofs[i] : ofs[i + 1]] for i in range(n)]
    return symbols, int(ofs[-1])


def decoder_from_table_bytes(buf) -> SymbolTable:
    symbols, _ = table_from_bytes(buf)
    tok_bytes = [bytes([i]) for i in range(256)] + [s for s in symbols if len(s) > 1]
    return SymbolTable(symbols=symbols, merges=[], tok_bytes=tok_bytes)


def from_full_bytes(buf: bytes) -> SymbolTable:
    b = np.frombuffer(buf, dtype=np.uint8)
    tlen, consumed = varint_decode(b, 1)
    pos = consumed
    symbols, _ = table_from_bytes(b[pos : pos + int(tlen[0])])
    pos += int(tlen[0])
    nm, consumed = varint_decode(b[pos:], 1)
    pos += consumed
    flat, consumed = varint_decode(b[pos:], int(nm[0]) * 3)
    merges = [tuple(int(x) for x in flat[i : i + 3]) for i in range(0, len(flat), 3)]
    max_tok = max([t for _, _, t in merges], default=255)
    tok_bytes = [bytes([i]) for i in range(256)] + [b""] * (max_tok - 255)
    for a, bb, t in merges:
        tok_bytes[t] = tok_bytes[a] + tok_bytes[bb]
    return SymbolTable(symbols=symbols, merges=merges, tok_bytes=tok_bytes)


def spread_sample(data: np.ndarray, cap: int, k: int = 16) -> np.ndarray:
    """Deterministic diverse sample: k evenly spaced chunks totalling cap."""
    chunk = cap // k
    stride = len(data) // k
    starts = np.arange(k) * stride
    idx = (starts[:, None] + np.arange(chunk)[None, :]).ravel()
    return data[idx]


def train(
    data: np.ndarray,
    max_rounds: int = 320,
    sample_cap: int = 1 << 18,
    min_count_frac: float = 2e-4,
) -> SymbolTable:
    """Train a symbol table on a uint8 sample. Deterministic: ties in pair
    frequency break toward the smallest (left, right) token pair."""
    sample = spread_sample(data, sample_cap) if len(data) > sample_cap else data
    toks = sample.astype(np.int32)
    tok_bytes: list[bytes] = [bytes([i]) for i in range(256)]
    tok_lens = np.ones(256 + max_rounds, dtype=np.int64)
    merges: list[tuple[int, int, int]] = []
    min_count = max(4, int(len(sample) * min_count_frac))
    for _ in range(max_rounds):
        if len(toks) < 2:
            break
        keys = toks[:-1].astype(np.int64) * _PAIR_K + toks[1:]
        uk, counts = np.unique(keys, return_counts=True)
        la = tok_lens[(uk // _PAIR_K).astype(np.int64)]
        lb = tok_lens[(uk % _PAIR_K).astype(np.int64)]
        ok = (la + lb) <= MAX_SYMBOL_LEN
        if not ok.any():
            break
        uk, counts = uk[ok], counts[ok]
        best = int(np.argmax(counts))  # first max -> deterministic
        if counts[best] < min_count:
            break
        a, b = int(uk[best] // _PAIR_K), int(uk[best] % _PAIR_K)
        t = len(tok_bytes)
        tok_bytes.append(tok_bytes[a] + tok_bytes[b])
        tok_lens[t] = len(tok_bytes[t])
        merges.append((a, b, t))
        toks = _merge_pass(toks, a, b, t)
    # pick the final table: top tokens by byte savings
    counts = np.bincount(toks, minlength=len(tok_bytes)).astype(np.int64)
    lens = tok_lens[: len(tok_bytes)]
    score = counts * np.maximum(1, lens - 1)
    order = np.argsort(-score, kind="stable")
    chosen = sorted(int(t) for t in order[:MAX_SYMBOLS] if score[t] > 0 or t < 256)
    chosen = chosen[:MAX_SYMBOLS]
    symbols = [tok_bytes[t] for t in chosen]
    # prune the merge program to ancestors of chosen symbols: skipped merges
    # only change which tokens survive (still losslessly escapable), and the
    # encoder replays far fewer vectorized passes.
    needed = set(t for t in chosen if t >= 256)
    kept: list[tuple[int, int, int]] = []
    for a, b, t in reversed(merges):
        if t in needed:
            kept.append((a, b, t))
            if a >= 256:
                needed.add(a)
            if b >= 256:
                needed.add(b)
    kept.reverse()
    return SymbolTable(symbols=symbols, merges=kept, tok_bytes=tok_bytes)
