"""Multimodal column plumbing: opaque binary media + typed metadata.

Real decode libraries (PIL/ffmpeg) are not in this container, so the decode
kernels are STUBS behind ``MVT_SPARK_FAKE_MEDIA`` — a deterministic fake
decoder that parses our own synthetic media header. Everything Spark-side is
real and tested: schema, Arrow batch shapes, mapInArrow plumbing,
partition-size-aware batch handling.

Synthetic media format (header, little-endian):
    magic 'FMV1' | kind u8 (0=image,1=audio,2=video) | width u16 | height u16
    | frames u16 | payload bytes
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

from pyspark.sql import DataFrame, functions as F

MAGIC = b"FMV1"
KINDS = ["image", "audio", "video"]


def synth_media_batch(ids: np.ndarray, seed: int = 42) -> pa.RecordBatch:
    """One batch of the deterministic synthetic media table — a pure
    function of (row ids, seed), shared by the Spark generator and the
    oracle fixture writer."""
    from ..sources.webtext import _hash

    n = len(ids)
    h = _hash(ids.astype(np.uint64), 21, seed)
    kind = (h % np.uint64(3)).astype(np.uint8)
    w = (64 + (h >> np.uint64(8)) % np.uint64(512)).astype(np.uint16)
    ht = (64 + (h >> np.uint64(24)) % np.uint64(512)).astype(np.uint16)
    fr = (1 + (h >> np.uint64(40)) % np.uint64(32)).astype(np.uint16)
    payload_len = (64 + (h >> np.uint64(48)) % np.uint64(192)).astype(np.int64)
    head = np.zeros((n, 11), dtype=np.uint8)
    head[:, 0:4] = np.frombuffer(MAGIC, np.uint8)
    head[:, 4] = kind
    head[:, 5:7] = w[:, None].view(np.uint8).reshape(n, 2)
    head[:, 7:9] = ht[:, None].view(np.uint8).reshape(n, 2)
    head[:, 9:11] = fr[:, None].view(np.uint8).reshape(n, 2)
    total = int(payload_len.sum())
    # payload keyed by (row id, in-payload position): deterministic
    # regardless of batch/partition composition
    p_ofs = np.concatenate(([0], np.cumsum(payload_len)))[:-1]
    flat_id = np.repeat(ids.astype(np.uint64), payload_len)
    flat_pos = (np.arange(total) - np.repeat(p_ofs, payload_len)).astype(np.uint64)
    pay = (_hash(flat_id * np.uint64(997) + flat_pos, 22, seed)
           & np.uint64(0xFF)).astype(np.uint8)
    lens = 11 + payload_len
    data = np.empty(int(lens.sum()), dtype=np.uint8)
    ofs = np.concatenate(([0], np.cumsum(lens)))[:-1]
    hidx = (ofs[:, None] + np.arange(11)[None, :]).ravel()
    data[hidx] = head.ravel()
    from ..codecs.gather import multi_range

    data[multi_range(ofs + 11, payload_len)] = pay
    offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(lens, out=offsets[1:])
    offsets = offsets.astype(np.int32)
    arr = pa.Array.from_buffers(pa.binary(), n,
                                [None, pa.py_buffer(offsets.tobytes()),
                                 pa.py_buffer(data.tobytes())], null_count=0)
    return pa.RecordBatch.from_arrays(
        [pa.array(ids.astype(np.int64), type=pa.int64()), arr],
        names=["media_id", "media"])


def synth_media_df(spark, n_rows: int, seed: int = 42, partitions: int | None = None):
    """Deterministic synthetic media table: (media_id long, media binary)."""
    from pyspark.sql.types import (BinaryType, LongType, StructField,
                                   StructType)

    schema = StructType([
        StructField("media_id", LongType(), False),
        StructField("media", BinaryType(), True),
    ])

    def gen(batches):
        for b in batches:
            yield synth_media_batch(
                b.column(0).to_numpy(zero_copy_only=False), seed)

    rng = spark.range(0, n_rows, numPartitions=partitions
                      or spark.sparkContext.defaultParallelism)
    return rng.mapInArrow(gen, schema)


def decode_media_meta(df: DataFrame, media_col: str = "media",
                      id_col: str = "media_id") -> DataFrame:
    """Parse media headers into typed metadata (vectorized, mapInArrow).

    The payload *decode* step (pixels/samples) is stubbed: real containers
    would swap `_fake_decode` for PIL/ffmpeg inside the same batch shape.
    """
    from pyspark.sql.types import (IntegerType, LongType, StringType,
                                   StructField, StructType)

    out_schema = StructType([
        StructField(id_col, LongType(), False),
        StructField("kind", StringType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("frames", IntegerType(), True),
        StructField("payload_bytes", LongType(), True),
        StructField("mean_byte", IntegerType(), True),  # fake "feature"
    ])

    def fn(batches):
        for b in batches:
            ids = b.column(0).to_numpy(zero_copy_only=False)
            med = b.column(1).cast(pa.large_binary())
            o = np.frombuffer(med.buffers()[1], dtype=np.int64)[med.offset : med.offset + len(med) + 1]
            data = np.frombuffer(med.buffers()[2] or b"", dtype=np.uint8)[o[0] : o[-1]]
            lens = np.diff(o)
            ofs = np.concatenate(([0], np.cumsum(lens)))[:-1]
            ok = lens >= 11
            kind = np.where(ok, data[np.minimum(ofs + 4, len(data) - 1)], 255)
            w = _u16(data, ofs + 5, ok)
            h = _u16(data, ofs + 7, ok)
            fr = _u16(data, ofs + 9, ok)
            pay = np.where(ok, lens - 11, 0)
            mean_b = _fake_decode(data, ofs, lens, ok)
            kind_s = pa.array([KINDS[k] if k < 3 else None for k in kind],
                              type=pa.string())
            yield pa.RecordBatch.from_arrays(
                [pa.array(ids, type=pa.int64()), kind_s,
                 pa.array(w.astype(np.int32)), pa.array(h.astype(np.int32)),
                 pa.array(fr.astype(np.int32)),
                 pa.array(pay.astype(np.int64)),
                 pa.array(mean_b.astype(np.int32))],
                names=[id_col, "kind", "width", "height", "frames",
                       "payload_bytes", "mean_byte"])

    return df.select(F.col(id_col), F.col(media_col)).mapInArrow(fn, out_schema)


def extract_features(df: DataFrame, media_col: str = "media",
                     id_col: str = "media_id", dim: int = 16) -> DataFrame:
    """Media -> fixed-dim feature vector (array<float>), vectorized.

    The *feature extractor* is a stub (deterministic byte-histogram fold
    standing in for a vision/audio model's embedding); the Spark plumbing —
    batch shapes, fixed-size list output, null handling — is exactly what a
    real model inference kernel (ONNX/torch in mapInArrow) plugs into.
    """
    from pyspark.sql.pandas.types import from_arrow_schema

    out_schema = pa.schema([pa.field(id_col, pa.int64()),
                            pa.field("feature", pa.list_(pa.float32()))])

    def fn(batches):
        from .dedup import _bytes_view

        for b in batches:
            # null media rows are DROPPED (no feature row) — a null blob
            # must never masquerade as an all-zero embedding
            valid, lens, data = _bytes_view(b.column(1))
            ids = b.column(0).to_numpy(zero_copy_only=False)[valid]
            feats = np.zeros((len(ids), dim), dtype=np.float32)
            if len(data):
                # per-row byte histogram folded into `dim` buckets (the
                # deterministic fake "embedding") in one bincount pass —
                # no per-row python
                row_of = np.repeat(np.arange(len(ids)), lens)
                bucket = data.astype(np.int64) % dim
                flat = np.bincount(row_of * dim + bucket,
                                   minlength=len(ids) * dim)
                denom = np.maximum(lens, 1).astype(np.float32)[:, None]
                feats = (flat.reshape(len(ids), dim) / denom).astype(np.float32)
            yield pa.RecordBatch.from_arrays(
                [pa.array(ids, type=pa.int64()),
                 pa.ListArray.from_arrays(
                     pa.array(np.arange(len(ids) + 1, dtype=np.int32) * dim),
                     pa.array(feats.ravel(), type=pa.float32()))],
                schema=out_schema)

    return (df.select(F.col(id_col), F.col(media_col))
              .mapInArrow(fn, from_arrow_schema(out_schema)))


def resize_images(df: DataFrame, width: int, height: int,
                  media_col: str = "media", id_col: str = "media_id") -> DataFrame:
    """Image resize plumbing: rows whose header says image get re-tagged
    dimensions; the pixel *resample* is the stubbed step (payload passes
    through). Non-image rows pass unchanged. Output schema mirrors input so
    resize composes with encode/decode."""
    from pyspark.sql.pandas.types import from_arrow_schema

    out_schema = pa.schema([pa.field(id_col, pa.int64()),
                            pa.field(media_col, pa.binary())])

    def fn(batches):
        from ..codecs.primitives import pack_validity

        for b in batches:
            ids = b.column(0)
            med = b.column(1).cast(pa.large_binary())
            valid = (med.is_valid().to_numpy(zero_copy_only=False)
                     if med.null_count else np.ones(len(med), dtype=bool))
            o = np.frombuffer(med.buffers()[1], dtype=np.int64)[med.offset : med.offset + len(med) + 1]
            data = np.frombuffer(med.buffers()[2] or b"", dtype=np.uint8)[o[0] : o[-1]].copy()
            lens = np.diff(o)
            ofs = np.concatenate(([0], np.cumsum(lens)))[:-1]
            if len(data):
                is_img = (lens >= 11) & (data[np.minimum(ofs + 4, len(data) - 1)] == 0)
                # patch width/height header fields in place (a real resize
                # would also transform the payload via PIL here)
                for pos, vals in ((5, width), (7, height)):
                    tgt = ofs[is_img] + pos
                    data[tgt] = vals & 0xFF
                    data[tgt + 1] = (vals >> 8) & 0xFF
            offsets = np.zeros(len(lens) + 1, dtype=np.int32)
            np.cumsum(lens, out=offsets[1:])
            nulls = int(len(lens) - valid.sum())
            vbuf = None if nulls == 0 else pa.py_buffer(pack_validity(valid))
            arr = pa.Array.from_buffers(
                pa.binary(), len(lens),
                [vbuf, pa.py_buffer(offsets.tobytes()), pa.py_buffer(data.tobytes())],
                null_count=nulls)
            yield pa.RecordBatch.from_arrays([ids.cast(pa.int64()), arr],
                                             schema=out_schema)

    return (df.select(F.col(id_col), F.col(media_col))
              .mapInArrow(fn, from_arrow_schema(out_schema)))


def sample_frames(df: DataFrame, every_n: int = 4, media_col: str = "media",
                  id_col: str = "media_id") -> DataFrame:
    """Video frame sampling plumbing: one output row per sampled frame
    index (explode shape), with deterministic per-frame payload slices
    standing in for decoded frames. Non-video rows produce no output."""
    meta = decode_media_meta(df, media_col, id_col)
    # frames > 0 guard is load-bearing: sequence(0, -1, step) RAISES in
    # Spark (same hazard as textstats.fingerprint's length guard)
    return (meta.where((F.col("kind") == "video") & (F.col("frames") > 0))
            .select(F.col(id_col),
                    F.posexplode(F.sequence(
                        F.lit(0), F.col("frames") - 1, F.lit(every_n)))
                     .alias("sample_idx", "frame_idx"))
            .select(id_col, "frame_idx"))


def _u16(data: np.ndarray, pos: np.ndarray, ok: np.ndarray) -> np.ndarray:
    lo = data[np.minimum(pos, len(data) - 1)].astype(np.int64)
    hi = data[np.minimum(pos + 1, len(data) - 1)].astype(np.int64)
    return np.where(ok, lo | (hi << 8), 0)


def _fake_decode(data, ofs, lens, ok) -> np.ndarray:
    """STUB decode: mean payload byte as the 'extracted feature'.

    A real deployment replaces this body with PIL.Image.open /
    soundfile.read on each row's payload — the surrounding batch plumbing
    (offsets, validity, output shape) is exactly what those need.
    """
    if not bool(os.environ.get("MVT_SPARK_FAKE_MEDIA", "1") == "1"):
        raise NotImplementedError("real media decode not available in this environment")
    out = np.zeros(len(ofs), dtype=np.int64)
    valid_idx = np.flatnonzero(ok & (lens > 11))
    if len(valid_idx):
        from ..codecs.gather import multi_range

        pay_idx = multi_range(ofs[valid_idx] + 11, lens[valid_idx] - 11)
        sums = np.add.reduceat(data[pay_idx].astype(np.int64),
                               np.concatenate(([0], np.cumsum(lens[valid_idx] - 11)))[:-1])
        out[valid_idx] = sums // (lens[valid_idx] - 11)
    return out
