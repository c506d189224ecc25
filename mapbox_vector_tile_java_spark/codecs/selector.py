"""Stats-driven codec auto-selection.

Descendant of the reference's ``JtsGeomStats`` (JtsGeomStats.java:48-153):
the reference samples distinct-point counts and consecutive-repeat counts to
characterize geometry streams; we compute cardinality, run structure and
exact candidate sizes per column block and pick the smallest encoding.

Selection is deterministic: exact size formulas, ties broken by codec id.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from . import fsst as fsstmod
from .intcodecs import (byteplane_size, delta_size, dict_size, for_size,
                        raw_int_size, rle_size)


def choose_int_codec(a: np.ndarray) -> str:
    """Pick the smallest int codec for a non-null int64 array, by exact size."""
    n = len(a)
    if n == 0:
        return "raw_int"
    mn, mx = int(a.min()), int(a.max())
    if mn == mx:
        return "const_int"
    uniq = np.unique(a)
    cands = [
        ("rle_int", rle_size(a)),
        ("for_bitpack", for_size(a)),
        ("for_delta", delta_size(a)),
        ("dict_int", dict_size(a, uniq)),
        ("byteplane", byteplane_size(a)),
        ("raw_int", raw_int_size(n)),
    ]
    cands.sort(key=lambda c: (c[1], c[0]))
    return cands[0][0]


# bytes-shape thresholds
FSST_MIN_DATA = 256        # don't bother training below this many bytes
FSST_SAMPLE = 128 * 1024   # train + trial-compress on at most this much
FSST_MIN_GAIN = 1.10       # require >=10% gain over the dict/raw alternative
DICT_MAX_RATIO = 0.5       # dict eligible when nuniq/n <= this
TOK_MIN_SEP_FRAC = 0.02    # tok_dict trialed when >=2% separator bytes


def row_sample(lens: np.ndarray, data: np.ndarray, cap: int):
    """Row-aligned prefix sample: the first k rows totalling <= cap bytes
    (at least one row). Returns (s_lens, s_data)."""
    cum = np.cumsum(lens)
    k = int(np.searchsorted(cum, cap, side="right")) + 1
    k = min(max(k, 1), len(lens))
    return lens[:k], data[: int(cum[k - 1])]


def choose_bytes_codec(lens: np.ndarray, data: np.ndarray,
                       arr: pa.Array | None = None) -> tuple[str, dict]:
    """Pick a codec for a bytes column block. Returns (name, params).

    The cardinality test mirrors the reference's dict-eligibility check
    (MvtLayerProps.addValue returning -1 for ineligible values,
    MvtLayerProps.java:49-60): high-cardinality blocks must reject dict.
    Candidates are trial-encoded on a sample and compared by realized size —
    the descendant of the reference's stats-then-choose encode discipline.
    """
    n = len(lens)
    if n == 0 or len(data) == 0:
        return "raw_bytes", {}
    raw_size = int(len(data)) + n  # data + ~1B/len
    best = ("raw_bytes", raw_size, {})

    if arr is not None:
        nuniq = len(arr.unique())
        if nuniq / n <= DICT_MAX_RATIO:
            # exact-ish: unique data once + ceil(log2 nuniq) bits per row
            w = max(1, (nuniq - 1).bit_length()) if nuniq > 1 else 1
            uniq_bytes = int(len(data)) * nuniq // max(n, 1) if nuniq < n else int(len(data))
            dict_sz = uniq_bytes + (n * w + 7) // 8 + nuniq
            if dict_sz < best[1]:
                best = ("dict_bytes", dict_sz, {})

    if len(data) >= FSST_MIN_DATA:
        from .bytescodecs import _tokd_encode

        sample = data if len(data) <= FSST_SAMPLE else fsstmod.spread_sample(data, FSST_SAMPLE)
        table = fsstmod.train(sample)
        comp = table.compress(sample)
        ratio = len(sample) / max(len(comp), 1)
        est = int(len(data) / ratio) + len(table.table_bytes()) + n
        if est * FSST_MIN_GAIN < best[1]:
            # always hand the sample-trained table to the encoder: training
            # dominates encode cost and FSST tables generalize (losslessness
            # never depends on the table fitting the data)
            best = ("fsst", est, {"fsst_table": table})

        n_sep = int((np.asarray(data[:FSST_SAMPLE]) == 0x20).sum())
        if n_sep >= TOK_MIN_SEP_FRAC * min(len(data), FSST_SAMPLE):
            s_lens, s_data = row_sample(lens, data, FSST_SAMPLE)
            blob = _tokd_encode((s_lens, s_data), {"fsst_table": table})
            tok_est = int(len(blob) * (len(data) / max(len(s_data), 1)))
            if tok_est < best[1]:
                # reuse the sample-trained fsst table for per-block token
                # tables (lossless regardless of fit; skips re-training)
                best = ("tok_dict", tok_est, {"fsst_table": table})

    return best[0], best[2]
