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


def test_stream_restart_after_compaction_never_loses_rows(spark, stream_dirs,
                                                          tmp_path):
    """The ADVICE r04 scenario end-to-end: ingest -> compact -> promote ->
    restart the stream. With the RETAINED checkpoint nothing replays (row
    set unchanged); with a FRESH checkpoint the source replays into fresh
    numeric segments — rows may duplicate (at-least-once, repairable) but
    are NEVER lost, because the compacted segment lives outside the
    batch-id namespace so no replayed batch can resume-skip into it."""
    from pyspark.sql import functions as F
    from pyspark.sql.pandas.types import from_arrow_schema

    from mapbox_vector_tile_java_spark.streaming.incremental import (
        compact_segments, promote_compacted)

    src_dir, out_dir, ckpt = stream_dirs
    schema = from_arrow_schema(SCHEMA)

    def run_stream(cp):
        stream = (spark.readStream.schema(schema)
                  .option("maxFilesPerTrigger", 1).parquet(src_dir))
        q = encode_stream(stream, out_dir, n_parts=2, checkpoint_dir=cp)
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    def url_counts():
        rows = (decode_segments(spark, out_dir)
                .groupBy("url").count().collect())
        return {r["url"]: r["count"] for r in rows}

    run_stream(ckpt)
    base = url_counts()
    assert len(base) == 3000 and set(base.values()) == {1}

    compacted = str(tmp_path / "compacted")
    compact_segments(spark, out_dir, compacted, n_parts=2)
    promote_compacted(out_dir, compacted)
    assert url_counts() == base

    # retained checkpoint: the engine knows both batches committed -> no
    # replay, no new segments, row set identical
    run_stream(ckpt)
    assert url_counts() == base
    assert len(list_segments(out_dir)) == 1

    # fresh checkpoint: full replay lands in fresh numeric segments next
    # to the compacted one — every row now seen exactly twice, none lost
    run_stream(ckpt + "_fresh")
    dup = url_counts()
    assert set(dup) == set(base)
    assert set(dup.values()) == {2}
    assert len(list_segments(out_dir)) == 3  # compacted + 2 replayed


def test_windowed_ingest_stats_with_watermark(spark, stream_dirs, tmp_path):
    """Event-time windowed aggregation over the ingest stream; results must
    equal the same aggregation computed in batch over the full table."""
    from pyspark.sql import functions as F
    from pyspark.sql.pandas.types import from_arrow_schema

    from mapbox_vector_tile_java_spark.streaming.windowed import (
        windowed_ingest_stats)

    src_dir, _, _ = stream_dirs
    stream = (spark.readStream.schema(from_arrow_schema(SCHEMA))
              .option("maxFilesPerTrigger", 1).parquet(src_dir))
    agg = windowed_ingest_stats(stream, window="6 hours", watermark="1 hour")
    out = str(tmp_path / "agg_out")
    q = (agg.writeStream.outputMode("append").format("parquet")
         .option("path", out)
         .option("checkpointLocation", str(tmp_path / "agg_ckpt")).start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = (spark.read.parquet(out)
           .select(F.col("window.start").alias("ws"), "n_docs", "total_bytes")
           .orderBy("ws"))
    batch = spark.read.parquet(src_dir)
    want = (batch.groupBy(F.window("warc_ts", "6 hours").alias("window"))
            .agg(F.count("*").alias("n_docs"),
                 F.sum(F.coalesce(F.length("text"), F.lit(0))
                       + F.coalesce(F.length("html"), F.lit(0))).alias("total_bytes"))
            .select(F.col("window.start").alias("ws"), "n_docs", "total_bytes")
            .orderBy("ws"))
    got_rows = [tuple(r) for r in got.collect()]
    want_rows = [tuple(r) for r in want.collect()]
    # append mode only emits windows the watermark has closed; every emitted
    # window must match batch exactly, and most windows must have closed
    want_by_ws = {r[0]: r for r in want_rows}
    assert len(got_rows) >= len(want_rows) - 1
    for r in got_rows:
        assert want_by_ws[r[0]] == r


def test_host_profile_stateful_stream(spark, stream_dirs, tmp_path):
    """applyInPandasWithState running per-host profile: final update-mode
    emission per host must equal the batch groupBy over everything seen."""
    from pyspark.sql import functions as F
    from pyspark.sql.pandas.types import from_arrow_schema

    from mapbox_vector_tile_java_spark.plans.partitioning import host_expr
    from mapbox_vector_tile_java_spark.streaming.windowed import (
        host_profile_stream)

    src_dir, _, _ = stream_dirs
    stream = (spark.readStream.schema(from_arrow_schema(SCHEMA))
              .option("maxFilesPerTrigger", 1).parquet(src_dir))
    prof = host_profile_stream(stream)
    out = str(tmp_path / "prof_out")

    def sink(bdf, bid):  # parquet has no update mode; land updates per batch
        bdf.write.mode("append").parquet(out)

    q = (prof.writeStream.outputMode("update").foreachBatch(sink)
         .option("checkpointLocation", str(tmp_path / "prof_ckpt")).start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    # last emission per host (update mode re-emits on every batch a host
    # appears in; the running totals of the LAST emission are the answer)
    emitted = spark.read.parquet(out)
    last = (emitted.groupBy("host")
            .agg(F.max("n_docs").alias("n_docs"),
                 F.max("total_bytes").alias("total_bytes"),
                 F.min("first_seen_us").alias("first_seen_us"),
                 F.max("last_seen_us").alias("last_seen_us")))
    batch = spark.read.parquet(src_dir)
    want = (batch.groupBy(host_expr("url").alias("host"))
            .agg(F.count("*").alias("n_docs"),
                 F.sum(F.coalesce(F.length("text"), F.lit(0))
                       + F.coalesce(F.length("html"), F.lit(0))).alias("total_bytes"),
                 F.min(F.unix_micros(F.col("warc_ts").cast("timestamp"))).alias("first_seen_us"),
                 F.max(F.unix_micros(F.col("warc_ts").cast("timestamp"))).alias("last_seen_us")))
    got = {r["host"]: tuple(r)[1:] for r in last.collect()}
    exp = {r["host"]: tuple(r)[1:] for r in want.collect()}
    assert got == exp


def test_host_profile_timeout_evicts_state(spark, tmp_path):
    """With a small processing-time timeout, an idle host's state is
    evicted (final emission fires on a later batch that doesn't contain
    the host), and the host's totals RESTART when it reappears — proving
    the state store does not grow with hosts that went quiet."""
    import time

    import pyarrow.parquet as pq
    from pyspark.sql.pandas.types import from_arrow_schema

    from mapbox_vector_tile_java_spark.sources.webtext import SCHEMA
    from mapbox_vector_tile_java_spark.streaming.windowed import (
        host_profile_stream)

    src = tmp_path / "incoming"
    src.mkdir()
    out = str(tmp_path / "prof_out")

    def chunk(i, rows):
        t = pa.Table.from_pylist(
            [{"url": f"https://{h}/p{j}",
              "warc_ts": 1_700_000_000_000_000 + j * 1_000_000,
              "html": None, "text": "x" * 10, "lang": "en"}
             for j, h in enumerate(rows)],
            schema=SCHEMA)
        pq.write_table(t, src / f"chunk-{i}.parquet")

    def sink(bdf, bid):
        bdf.write.mode("append").parquet(out)

    def a_counts():
        try:
            rows = spark.read.parquet(out).collect()
        except Exception:
            return []
        return sorted(r["n_docs"] for r in rows if r["host"] == "a.example")

    def wait_for(pred, timeout_s=60.0):
        deadline = time.monotonic() + timeout_s
        while time.monotonic() < deadline:
            if pred(a_counts()):
                return
            time.sleep(0.25)
        raise AssertionError(f"timed out; emissions so far: {a_counts()}")

    # NOTE: processAllAvailable() never settles once ProcessingTimeTimeout
    # is armed (the engine keeps scheduling timeout-check batches), so this
    # test polls the sink instead
    stream = (spark.readStream.schema(from_arrow_schema(SCHEMA))
              .option("maxFilesPerTrigger", 1).parquet(str(src)))
    prof = host_profile_stream(stream, timeout_ms=300)
    q = (prof.writeStream.outputMode("update").foreachBatch(sink)
         .option("checkpointLocation", str(tmp_path / "prof_ckpt")).start())
    try:
        chunk(0, ["a.example", "a.example"])   # batch 1: host a, 2 docs
        wait_for(lambda c: c == [2])
        # idle past the timeout: the engine fires a timeout batch on its
        # own and the hasTimedOut path re-emits a's final row (still 2)
        wait_for(lambda c: c == [2, 2])
        chunk(1, ["a.example"])                # a reappears post-eviction
        wait_for(lambda c: 1 in c)
    finally:
        q.stop()

    c = a_counts()
    # the post-eviction emission is a RESTARTED total (1), never a
    # cumulative 3 — proof the idle host's state was actually removed.
    # (The restarted state may itself time out and re-emit more 1s.)
    assert c.count(2) == 2 and 1 in c, c
    assert max(c) == 2 and 3 not in c, c
