"""Segment compaction + metadata-only aggregates.

Compaction contract (reference discipline: re-encoding decoded content must
round-trip identically, MvtBuildTest.java:141-308): the compacted table's
decoded rows equal the union of the source segments' decoded rows, and the
compacted table is ONE segment with one plan.
"""
import os

import pytest
from pyspark.sql import functions as F

from mapbox_vector_tile_java_spark.operators.decode import (
    decode_table, meta_column_stats, read_manifest)
from mapbox_vector_tile_java_spark.operators.encode import encode_webtext
from mapbox_vector_tile_java_spark.sources.webtext import webtext_df
from mapbox_vector_tile_java_spark.streaming.incremental import (
    compact_segments, decode_segments, list_segments, promote_compacted)


def _rows(df):
    return sorted(
        (r["url"], r["ts"], r["hl"], r["text"], r["lang"])
        for r in df.select(
            "url", F.unix_micros("warc_ts").alias("ts"),
            F.length("html").alias("hl"), "text", "lang").collect())


@pytest.fixture(scope="module")
def segmented(spark, tmp_path_factory):
    """Three segments holding disjoint thirds of a 1200-row webtext table."""
    root = str(tmp_path_factory.mktemp("segtbl"))
    src = webtext_df(spark, 1200, seed=42, partitions=4)
    for k in range(3):
        part = src.where(F.pmod(F.xxhash64("url"), F.lit(3)) == k)
        encode_webtext(part, os.path.join(root, f"segment={k}"), n_parts=2)
    return root, src


def test_compact_preserves_content(spark, segmented, tmp_path):
    root, src = segmented
    dst = str(tmp_path / "compacted")
    man = compact_segments(spark, root, dst, n_parts=4)
    assert man.num_rows > 0
    assert _rows(decode_table(spark, dst)) == _rows(src)


def test_compact_merges_plans(spark, segmented, tmp_path):
    """The compacted table has ONE plan/manifest (segments each had their
    own) and its per-column block count shrinks to n_parts."""
    root, _ = segmented
    dst = str(tmp_path / "compacted2")
    compact_segments(spark, root, dst, n_parts=4)
    m = read_manifest(spark, dst)
    per_col = m.groupBy("name").count().collect()
    assert all(r["count"] <= 4 for r in per_col)  # one block per partition
    # every segment had its own meta.json; the compacted table has exactly one
    assert os.path.exists(os.path.join(dst, "meta.json"))


def test_promote_swaps_segments(spark, segmented, tmp_path):
    root, src = segmented
    dst = str(tmp_path / "compacted3")
    compact_segments(spark, root, dst, n_parts=4)
    before = _rows(decode_segments(spark, root))
    promoted = promote_compacted(root, dst)
    segs = list_segments(root)
    assert segs == [promoted]
    assert _rows(decode_segments(spark, root)) == before == _rows(src)
    # old segments moved aside, not deleted (verify-then-delete discipline)
    aside = os.path.join(root, ".pre_compact")
    assert os.path.isdir(aside) and len(os.listdir(aside)) == 1


def test_promote_requires_committed_manifest(spark, tmp_path):
    with pytest.raises(FileNotFoundError):
        promote_compacted(str(tmp_path), str(tmp_path / "nope"))


def test_meta_column_stats_exact(spark, tmp_path):
    """Metadata-only aggregates equal the same aggregates computed on the
    decoded data — and on the source."""
    src = webtext_df(spark, 800, seed=7, partitions=4)
    enc = str(tmp_path / "enc")
    encode_webtext(src, enc, n_parts=4)
    got = {r["name"]: r for r in meta_column_stats(spark, enc).collect()}
    exp = src.agg(
        F.count("*").alias("n"),
        F.sum(F.col("html").isNull().cast("long")).alias("html_nulls"),
        F.sum(F.col("text").isNull().cast("long")).alias("text_nulls"),
        F.sum(F.col("lang").isNull().cast("long")).alias("lang_nulls"),
        F.min(F.unix_micros("warc_ts")).alias("ts_min"),
        F.max(F.unix_micros("warc_ts")).alias("ts_max")).first()
    assert set(got) == {"url", "warc_ts", "html", "text", "lang"}
    for name in got:
        assert got[name]["n_rows"] == exp["n"]
    assert got["html"]["null_count"] == exp["html_nulls"]
    assert got["text"]["null_count"] == exp["text_nulls"]
    assert got["lang"]["null_count"] == exp["lang_nulls"]
    assert got["url"]["null_count"] == 0
    assert got["warc_ts"]["min_i64"] == exp["ts_min"]
    assert got["warc_ts"]["max_i64"] == exp["ts_max"]
    # bytes-like columns carry no zone map
    assert got["url"]["min_i64"] is None and got["text"]["max_i64"] is None
