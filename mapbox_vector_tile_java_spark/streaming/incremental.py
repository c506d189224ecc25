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


def compact_segments(spark, out_dir: str, dst_dir: str, n_parts: int,
                     url_col: str = "url", resume: bool = True):
    """Merge every committed segment into ONE compacted encoded table.

    A micro-batch-per-segment layout accumulates small segments (each with
    its own plan, symbol tables and sub-optimally small blocks) — the LSM
    problem. Compaction decodes the union of segments (map-only, no
    shuffle: each block row is self-contained) and re-encodes it through
    the normal planner at a production partition count, so the compacted
    table gets one global plan, full-size FSST/dict tables trained on the
    whole corpus slice, and ``n_parts`` right-sized blocks.

    Correctness contract (the reference's discipline: what round-trips is
    the table's CONTENT, not its segment structure — a tile re-encoded from
    decoded features must decode identically, MvtBuildTest.java:141-308):
    decode(compact(segments)) must equal decode(segments) row-for-row.

    Scale: one decode map + one repartition shuffle + one encode map —
    identical plan shape to a fresh bulk encode; ``resume=True`` gives the
    same per-partition idempotent commit, so a killed compaction rerun
    skips finished partitions. The swap into place is ``promote_compacted``
    (separate, so callers control the cutover point).
    """
    from ..operators.encode import encode_webtext

    df = decode_segments(spark, out_dir)
    return encode_webtext(df, dst_dir, n_parts=n_parts, url_col=url_col,
                          resume=resume)


def promote_compacted(out_dir: str, compacted_dir: str) -> str:
    """Atomically (rename-level) replace ``out_dir``'s segments with the
    compacted table as ``segment=0``. Old segments are moved aside into
    ``<out_dir>/.pre_compact/`` rather than deleted — the caller reaps that
    directory after verifying the compacted table (the same
    verify-then-delete discipline as the encode commit markers).

    NOTE on real object stores: directory rename is not atomic on S3-style
    stores; production there would commit via a manifest-of-segments
    pointer swap instead. The segment layout already supports that (a
    segment is discovered only through its committed manifest).
    """
    import shutil
    import time as _time

    segs = list_segments(out_dir)
    if not os.path.exists(os.path.join(compacted_dir, "manifest.parquet")):
        raise FileNotFoundError(
            f"compacted table at {compacted_dir} has no committed manifest")
    aside = os.path.join(out_dir, ".pre_compact",
                         _time.strftime("%Y%m%dT%H%M%S"))
    os.makedirs(aside, exist_ok=True)
    for s in segs:
        shutil.move(s, os.path.join(aside, os.path.basename(s)))
    dst = os.path.join(out_dir, "segment=0")
    shutil.move(compacted_dir, dst)
    return dst


def segments_manifest(spark, out_dir: str):
    from functools import reduce

    from ..operators.decode import read_manifest
    from pyspark.sql import functions as F

    parts = []
    for s in list_segments(out_dir):
        seg_id = int(os.path.basename(s).split("=", 1)[1])
        parts.append(read_manifest(spark, s).withColumn("segment", F.lit(seg_id)))
    return reduce(lambda a, b: a.unionByName(b), parts)
