"""Structured Streaming incremental encode: micro-batches -> segments ->
union decode, bit-identical to the full table; batch replay is idempotent.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from mapbox_vector_tile_java_spark.operators.verify import verify_roundtrip
from mapbox_vector_tile_java_spark.sources.webtext import SCHEMA, gen_batch
from mapbox_vector_tile_java_spark.streaming.incremental import (
    decode_segments,
    encode_stream,
    list_segments,
    segments_manifest,
)


@pytest.fixture()
def stream_dirs(tmp_path):
    src = tmp_path / "incoming"
    src.mkdir()
    # two file-arrivals -> two micro-batches (maxFilesPerTrigger=1)
    for i, (lo, hi) in enumerate([(0, 1500), (1500, 3000)]):
        t = pa.Table.from_batches(
            [gen_batch(np.arange(lo, hi, dtype=np.int64), seed=42)],
            schema=SCHEMA)
        pq.write_table(t, src / f"chunk-{i}.parquet")
    return str(src), str(tmp_path / "out"), str(tmp_path / "ckpt")


def test_streaming_encode_segments_bit_identical(spark, stream_dirs):
    src_dir, out_dir, ckpt = stream_dirs
    from pyspark.sql.pandas.types import from_arrow_schema

    stream = (spark.readStream.schema(from_arrow_schema(SCHEMA))
              .option("maxFilesPerTrigger", 1).parquet(src_dir))
    q = encode_stream(stream, out_dir, n_parts=2, checkpoint_dir=ckpt)
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    segs = list_segments(out_dir)
    assert len(segs) == 2, segs

    full = spark.createDataFrame(
        pa.Table.from_batches(
            [gen_batch(np.arange(0, 3000, dtype=np.int64), seed=42)],
            schema=SCHEMA).to_pandas())
    dec = decode_segments(spark, out_dir)
    verify_roundtrip(full, dec)

    m = segments_manifest(spark, out_dir)
    assert m.select("segment").distinct().count() == 2
    assert m.where(m.codec == "raw_bytes").count() <= m.count()  # sanity


def test_streaming_replay_is_idempotent(spark, stream_dirs):
    """Re-running the stream from scratch WITHOUT the checkpoint replays
    both batches into the same segment dirs; per-partition resume markers
    skip committed work and output stays bit-identical (exactly-once
    bytes under duplicate delivery)."""
    src_dir, out_dir, ckpt = stream_dirs
    from pyspark.sql.pandas.types import from_arrow_schema

    schema = from_arrow_schema(SCHEMA)
    for attempt, cp in enumerate([ckpt + "_a", ckpt + "_b"]):
        stream = (spark.readStream.schema(schema)
                  .option("maxFilesPerTrigger", 1).parquet(src_dir))
        q = encode_stream(stream, out_dir, n_parts=2, checkpoint_dir=cp)
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    assert len(list_segments(out_dir)) == 2
    full = spark.createDataFrame(
        pa.Table.from_batches(
            [gen_batch(np.arange(0, 3000, dtype=np.int64), seed=42)],
            schema=SCHEMA).to_pandas())
    verify_roundtrip(full, decode_segments(spark, out_dir))
