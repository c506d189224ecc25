"""Distributed decode: encoded block files -> original DataFrame.

SURVEY §3.2 engine equivalent: read manifests -> prune -> mapInArrow
dispatching per-column codec decode by manifest codec id -> reassembled
DataFrame. Shuffle-free: every block row is self-contained, so decode is a
pure map over the blocks parquet (no groupBy needed).

Column pruning: ``columns=[...]`` decodes only the requested columns, and
because each column's blobs are a separate top-level parquet column, the
explicit projection reaches the scan (verified: FileScan ReadSchema lists
only the requested ``c_*``/``crc_*`` columns) — unrequested columns' bytes
are never read. Parquet's column chunks ARE the column-chunk layout.

Block pruning: ``ts_range``-style predicates are evaluated against the
per-column min/max zone maps in the manifest *before* decode — the
descendant of the reference's cheap AABB pre-filter before expensive
intersection (JtsAdapter.java:232).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

from ..columns import decode_column
from ..plans import manifest as M


def make_decode_fn(schema: pa.Schema, symtabs: dict[int, list[bytes]],
                   columns: list[str] | None, verify_crc: bool = True):
    names = columns or schema.names
    out_schema = pa.schema([schema.field(n) for n in names])
    ctx = {"symtabs": symtabs}

    def fn(batches):
        from ..codecs.gather import warm_heap
        from ..columns import content_crc

        warm_heap()
        for b in batches:
            blobs = {n: b.column(f"c_{n}") for n in names}
            crcs = {n: b.column(f"crc_{n}") for n in names} if verify_crc else {}
            for i in range(b.num_rows):
                arrays = []
                for n in names:
                    blob = blobs[n][i].as_buffer()
                    arr = decode_column(blob, out_schema.field(n).type, ctx)
                    if verify_crc:
                        want = crcs[n][i].as_py()
                        if want is not None:
                            if want < 0:
                                want += 1 << 64
                            got = content_crc(arr)
                            if got != want:
                                raise ValueError(
                                    f"checksum mismatch decoding column {n!r}: "
                                    f"manifest={want} decoded={got} — block is corrupt")
                    arrays.append(arr)
                yield pa.RecordBatch.from_arrays(arrays, schema=out_schema)

    return fn


def decode_table(spark, out_dir: str, columns: list[str] | None = None,
                 zone_filters: list[tuple[str, int, int]] | None = None,
                 verify_crc: bool = True):
    """Read an encoded table back as a DataFrame.

    zone_filters: [(col, lo, hi)] keeps only blocks whose [min,max] overlaps
    [lo,hi] — evaluated on manifest zone maps, pruning whole blocks before
    any decode work. NOTE: pruning is block-level; callers still apply the
    exact row-level predicate afterwards.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.pandas.types import from_arrow_schema

    import glob as _glob

    schema, symtabs, _ = M.read_meta(out_dir)
    if columns:
        for c in columns:
            if c not in schema.names:
                raise KeyError(f"unknown column {c}")
    bdir = M.blocks_dir(out_dir)
    if not _glob.glob(os.path.join(bdir, "*.parquet")):
        # zero-row table: the encode job had no tasks, so no block files
        out_fields = [schema.field(n) for n in (columns or schema.names)]
        return spark.createDataFrame([], from_arrow_schema(pa.schema(out_fields)))
    blocks = spark.read.parquet(bdir)
    if zone_filters:
        # zone maps are plain top-level columns: the predicate pushes down
        # to the parquet scan and prunes whole row groups via their stats —
        # the cluster-scale descendant of the reference's cheap AABB
        # pre-filter before expensive work (JtsAdapter.java:232)
        for col, lo, hi in zone_filters:
            blocks = blocks.filter(
                F.col(f"mn_{col}").isNull()
                | ((F.col(f"mn_{col}") <= F.lit(int(hi)))
                   & (F.col(f"mx_{col}") >= F.lit(int(lo)))))
    if columns:
        for c in columns:
            if c not in schema.names:
                raise KeyError(f"unknown column {c}")
    names = columns or schema.names
    need = ["part_id", "block_id", "n_rows"] + [f"c_{n}" for n in names]
    if verify_crc:
        need += [f"crc_{n}" for n in names]
    # explicit projection -> parquet reads ONLY the requested blob columns
    blocks = blocks.select(*need)
    out_fields = [schema.field(n) for n in names]
    spark_schema = from_arrow_schema(pa.schema(out_fields))
    return blocks.mapInArrow(
        make_decode_fn(schema, symtabs, columns, verify_crc), spark_schema)


def read_manifest(spark, out_dir: str):
    return spark.read.parquet(os.path.join(out_dir, "manifest.parquet"))


def meta_column_stats(spark, out_dir: str):
    """Aggregate pushdown to metadata: per-column row count, null count and
    (for int-like columns) min/max answered ENTIRELY from the manifest — no
    data block is opened. This is the engine analog of parquet/Iceberg
    aggregate pushdown: at 10^12 rows the manifest is the only thing read
    (millions of rows, not trillions), and the plan is one partial+final
    aggregation over the manifest parquet.

    min/max are the encode-time zone-map values (``_minmax_i64``) — exact,
    not sampled: every block records the true min/max of its rows
    (timestamps in their native tick unit; bytes-like columns yield NULL).
    The reference's analog is answering layer extent questions from the
    tile header instead of decoding features (MvtReader.java:99-147 reads
    layer metadata before any geometry decode).
    """
    from pyspark.sql import functions as F

    m = read_manifest(spark, out_dir)
    return (m.groupBy("name")
            .agg(F.sum("n_rows").alias("n_rows"),
                 F.sum("null_count").alias("null_count"),
                 F.min("min_i64").alias("min_i64"),
                 F.max("max_i64").alias("max_i64"))
            .orderBy("name"))


def compression_report(spark, out_dir: str):
    """Per-column raw/encoded byte totals + ratio from the manifest."""
    from pyspark.sql import functions as F

    m = read_manifest(spark, out_dir)
    return (m.groupBy("name")
            .agg(F.sum("raw_bytes").alias("raw_bytes"),
                 F.sum("enc_bytes").alias("enc_bytes"),
                 F.count("*").alias("n_blocks"),
                 F.first("codec").alias("example_codec"))
            .withColumn("ratio", F.col("raw_bytes") / F.col("enc_bytes"))
            .orderBy("name"))
