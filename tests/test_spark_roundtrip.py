"""End-to-end Spark round-trip tests: encode -> decode -> bit-identity.

The engine-level mirror of the reference's build->encode->load->assertEquals
round trips (MvtBuildTest.java:141-308, MvtEncoderTest.java:33-53).
"""

from __future__ import annotations

import glob
import os

import pytest

from mapbox_vector_tile_java_spark.operators.decode import (
    compression_report,
    decode_table,
    read_manifest,
)
from mapbox_vector_tile_java_spark.operators.encode import encode_table
from mapbox_vector_tile_java_spark.operators.verify import verify_roundtrip
from mapbox_vector_tile_java_spark.plans.partitioning import plan_generic, plan_webtext
from mapbox_vector_tile_java_spark.sources.webtext import webtext_df

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def webtext_encoded(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("enc") / "webtext")
    df = webtext_df(spark, 20_000, seed=42, partitions=4)
    pdf = plan_webtext(df, n_parts=8)
    encode_table(pdf, out)
    return out


def test_webtext_roundtrip_bit_identical(spark, webtext_encoded):
    src = webtext_df(spark, 20_000, seed=42, partitions=4)
    dec = decode_table(spark, webtext_encoded)
    report = verify_roundtrip(src, dec)
    assert report["n_source"] == 20_000


def test_webtext_codec_choices(spark, webtext_encoded):
    m = read_manifest(spark, webtext_encoded).toPandas()
    by_col = {n: set(g["codec"]) for n, g in m.groupby("name")}
    assert by_col["lang"] == {"dict_global"}
    assert by_col["warc_ts"] <= {"for_delta", "for_bitpack", "rle_int"}
    # text is wordy: the planner should pick a string codec, not raw
    assert by_col["text"] <= {"tok_dict", "fsst", "fsst_global"}, by_col["text"]


def test_webtext_compression_beats_raw(spark, webtext_encoded):
    rep = {r["name"]: r for r in compression_report(spark, webtext_encoded).collect()}
    assert rep["text"]["ratio"] > 2.0, rep["text"]
    assert rep["lang"]["ratio"] > 5.0, rep["lang"]
    assert rep["warc_ts"]["ratio"] > 1.5, rep["warc_ts"]
    assert rep["url"]["ratio"] > 1.5, rep["url"]


def test_column_pruned_decode(spark, webtext_encoded):
    dec = decode_table(spark, webtext_encoded, columns=["url", "lang"])
    assert dec.columns == ["url", "lang"]
    assert dec.count() == 20_000


def test_zone_map_pruning(spark, tmp_path):
    # encode with time-bucketed partitions so block zone maps are disjoint
    from pyspark.sql import functions as F

    df = webtext_df(spark, 10_000, seed=42, partitions=4)
    out = str(tmp_path / "zoned")
    pdf = (df.repartition(4, F.floor(F.unix_micros("warc_ts") / (737 * 2600)))
             .sortWithinPartitions("warc_ts"))
    encode_table(pdf, out)
    lo = 1_600_000_000_000_000
    hi = lo + 737 * 2000  # first ~2000 rows by construction
    pruned = decode_table(spark, out, zone_filters=[("warc_ts", lo, hi)])
    n = pruned.count()
    assert 0 < n < 10_000, n
    # disjoint range prunes everything
    assert decode_table(spark, out, zone_filters=[("warc_ts", 0, 10)]).count() == 0


@pytest.mark.parametrize("table,key", [
    ("documents", "doc_id"),
    ("events", "event_id"),
    ("lineitem", "l_orderkey"),
    ("embeddings", "vec_id"),
    ("orders", "o_orderkey"),
])
def test_testdata_roundtrip(spark, tmp_path, table, key):
    src = spark.read.parquet(f"{SF_DIR}/{table}.parquet")
    out = str(tmp_path / table)
    encode_table(plan_generic(src, 4, key), out)
    dec = decode_table(spark, out)
    verify_roundtrip(src, dec)


def test_resume_skips_committed_partitions(spark, tmp_path):
    out = str(tmp_path / "resume")
    df = webtext_df(spark, 5_000, seed=7, partitions=2)
    pdf = plan_webtext(df, n_parts=4)
    encode_table(pdf, out)
    files = sorted(glob.glob(os.path.join(out, "blocks", "*.parquet")))
    mtimes = {f: os.path.getmtime(f) for f in files}
    # simulate a torn partition: remove one data file (its marker goes stale)
    os.remove(files[0])
    encode_table(pdf, out)  # resume run
    files2 = sorted(glob.glob(os.path.join(out, "blocks", "*.parquet")))
    assert files2 == files
    for f in files[1:]:
        assert os.path.getmtime(f) == mtimes[f], "committed partition was rewritten"
    # and output still decodes bit-identically
    verify_roundtrip(webtext_df(spark, 5_000, seed=7, partitions=2),
                     decode_table(spark, out))


def test_nulls_and_empties_survive(spark, tmp_path):
    """FIXTURES.md rt_nulls / rt_duplicates: null vs empty distinct; adjacent
    duplicates preserved (reference drops them, JtsAdapter.java:405,488 —
    we must not)."""
    from pyspark.sql import Row

    rows = [
        Row(k=1, s="", b=b"", note="empty"),
        Row(k=2, s=None, b=None, note="null"),
        Row(k=3, s="dup", b=b"x", note="dup"),
        Row(k=4, s="dup", b=b"x", note="dup"),
        Row(k=5, s="dup", b=b"x", note="dup"),
    ]
    src = spark.createDataFrame(rows)
    out = str(tmp_path / "nulls")
    encode_table(plan_generic(src, 2, "k"), out)
    verify_roundtrip(src, decode_table(spark, out))


def test_encode_reproducible_across_runs(spark, tmp_path):
    """Two independent fresh encodes of the same input produce identical
    manifests (codecs, byte counts, checksums) — the determinism rule that
    makes checksums and resume meaningful (SURVEY §4)."""
    from mapbox_vector_tile_java_spark.operators.encode import encode_webtext

    df = webtext_df(spark, 4_000, seed=42, partitions=4)
    outs = []
    for run in ("a", "b"):
        out = str(tmp_path / f"rep_{run}")
        encode_webtext(df, out, n_parts=4)
        m = (read_manifest(spark, out)
             .select("part_id", "block_id", "name", "codec", "n_rows",
                     "raw_bytes", "enc_bytes", "content_crc", "symtab_id")
             .orderBy("part_id", "block_id", "name").collect())
        outs.append([tuple(r) for r in m])
    assert outs[0] == outs[1]


def test_empty_and_single_row_tables(spark, tmp_path):
    """Zero-row input produces a decodable empty table (the encode job has
    no tasks, so no block files exist); one row round-trips."""
    from mapbox_vector_tile_java_spark.operators.encode import encode_webtext

    empty = webtext_df(spark, 0, seed=1, partitions=2)
    out_e = str(tmp_path / "empty")
    encode_webtext(empty, out_e, n_parts=2)
    dec = decode_table(spark, out_e)
    assert dec.count() == 0
    assert dec.columns == ["url", "warc_ts", "html", "text", "lang"]
    assert decode_table(spark, out_e, columns=["lang"]).count() == 0

    one = webtext_df(spark, 1, seed=1, partitions=2)
    out_1 = str(tmp_path / "one")
    encode_webtext(one, out_1, n_parts=2)
    verify_roundtrip(one, decode_table(spark, out_1))
