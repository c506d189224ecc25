"""Structured Streaming ingestion: incremental encode of a webtext stream.

The reference is batch-only (a whole tile is built then serialized,
MvtEncoder.java:82-100), and the north rule's "resumable from checkpoint"
is satisfied by per-partition manifest idempotence — but a 10^12-document
corpus arrives continuously, so the engine also offers a streaming front
end: ``readStream -> foreachBatch(encode micro-batch)``.

Design:
- each micro-batch becomes one *segment* directory ``segment=<batch_id>``
  encoded with the SAME planner/encode path as batch mode (plan persisted
  per segment; per-partition commit markers within the segment);
- exactly-once across restarts comes from the pairing of Spark's streaming
  checkpoint (batch replay) with segment-level idempotence: a replayed
  batch re-enters ``encode_table`` with ``resume=True`` and every committed
  partition is skipped, so duplicate delivery cannot duplicate bytes;
- ``read_segments``/``decode_segments`` union all segments back into one
  DataFrame — segments are just more partitions of the same table.

This is the streaming analog of the layer-per-tile layout: a segment is a
tile appended to a growing tileset.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame


def encode_stream(stream_df: DataFrame, out_dir: str, n_parts: int = 4,
                  checkpoint_dir: str | None = None, url_col: str = "url"):
    """Start a streaming query that encodes each micro-batch as a segment.

    Returns the StreamingQuery; caller manages its lifecycle
    (processAllAvailable / stop).
    """
    from ..operators.encode import encode_webtext

    os.makedirs(out_dir, exist_ok=True)

    def sink(batch_df: DataFrame, batch_id: int):
        if len(batch_df.take(1)) == 0:
            return
        seg = os.path.join(out_dir, f"segment={batch_id}")
        # resume=True inside encode_webtext makes batch replay idempotent
        encode_webtext(batch_df, seg, n_parts=n_parts, url_col=url_col)

    writer = (stream_df.writeStream
              .foreachBatch(sink)
              .outputMode("append"))
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()


def list_segments(out_dir: str) -> list[str]:
    segs = sorted(
        d for d in os.listdir(out_dir)
        if d.startswith("segment=") and
        os.path.exists(os.path.join(out_dir, d, "manifest.parquet")))
    return [os.path.join(out_dir, d) for d in segs]


def decode_segments(spark, out_dir: str, columns: list[str] | None = None) -> DataFrame:
    """Union-decode every committed segment (segments are just extra
    partitions of one logical table)."""
    from functools import reduce

    from ..operators.decode import decode_table

    segs = list_segments(out_dir)
    if not segs:
        raise FileNotFoundError(f"no committed segments under {out_dir}")
    dfs = [decode_table(spark, s, columns=columns) for s in segs]
    return reduce(lambda a, b: a.unionByName(b), dfs)


def segments_manifest(spark, out_dir: str):
    from functools import reduce

    from ..operators.decode import read_manifest
    from pyspark.sql import functions as F

    parts = []
    for s in list_segments(out_dir):
        seg_id = int(os.path.basename(s).split("=", 1)[1])
        parts.append(read_manifest(spark, s).withColumn("segment", F.lit(seg_id)))
    return reduce(lambda a, b: a.unionByName(b), parts)
