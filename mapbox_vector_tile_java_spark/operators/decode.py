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


def _norm_file_dir(path: str) -> str:
    """Normalize a Spark ``input_file_name()`` URI to the realpath of its
    parent directory (the segment's blocks dir) for symtab-namespace lookup."""
    from urllib.parse import unquote, urlparse

    p = urlparse(path)
    local = unquote(p.path) if p.scheme else path
    return os.path.realpath(os.path.dirname(local))


def make_multi_decode_fn(schema: pa.Schema,
                         symtabs_by_dir: dict[str, dict[int, list[bytes]]],
                         columns: list[str] | None, verify_crc: bool = True):
    """Decode fn for blocks drawn from MANY segments in one scan: the last
    input column is the block's source file (``input_file_name``), which
    selects the segment's symbol-table namespace. Per-ROW lookup cost is
    negligible — each row is a whole encoded block, and a scan partition
    rarely mixes files anyway."""
    names = columns or schema.names
    out_schema = pa.schema([schema.field(n) for n in names])

    def fn(batches):
        from ..codecs.gather import warm_heap
        from ..columns import content_crc

        warm_heap()
        ctx_cache: dict[str, dict] = {}
        for b in batches:
            blobs = {n: b.column(f"c_{n}") for n in names}
            crcs = {n: b.column(f"crc_{n}") for n in names} if verify_crc else {}
            srcs = b.column("__src_file")
            for i in range(b.num_rows):
                raw_src = srcs[i].as_py()
                ctx = ctx_cache.get(raw_src)
                if ctx is None:
                    key = _norm_file_dir(raw_src)
                    try:
                        ctx = {"symtabs": symtabs_by_dir[key]}
                    except KeyError:
                        raise ValueError(
                            f"block file {raw_src!r} (dir {key!r}) matches no "
                            f"known segment — segment list changed under the "
                            f"decode?") from None
                    ctx_cache[raw_src] = ctx
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


def decode_table_multi(spark, seg_dirs: list[str],
                       columns: list[str] | None = None,
                       zone_filters: list[tuple[str, int, int]] | None = None,
                       verify_crc: bool = True):
    """Decode MANY encoded tables (streaming segments) as ONE DataFrame with
    a plan whose depth does not grow with the segment count.

    A union-of-``decode_table`` plan is O(#segments) deep — fine at 3
    segments, but a year of micro-batches (10^4-10^5 segments) would melt
    the analyzer before any task runs. Here the union happens at the FILE
    LISTING level instead: one parquet scan over every segment's block
    files, one ``mapInArrow``, with ``input_file_name()`` carrying each
    block's segment so the decode fn resolves the right symbol-table
    namespace (symtab ids are per-segment). Driver cost is O(#segments)
    small meta.json reads — listing cost, not plan cost.

    All segments must share one logical schema (they are micro-batches of
    the same stream); a mismatch raises rather than miscasts.

    Reference lineage: the reference decodes MANY layers from ONE tile
    buffer in a single pass, resolving each layer's own key/value tables
    as it goes (MvtReader.java:149-158 iterates mvt.getLayersList() with
    per-layer dictionaries) — segments are the cluster-scale layers here,
    and the per-segment symbol-table namespace plays the per-layer
    dictionary.
    """
    import glob as _glob

    from pyspark.sql import functions as F
    from pyspark.sql.pandas.types import from_arrow_schema

    if not seg_dirs:
        raise ValueError("decode_table_multi: empty segment list")
    schema = None
    symtabs_by_dir: dict[str, dict[int, list[bytes]]] = {}
    files: list[str] = []
    for s in seg_dirs:
        seg_schema, symtabs, _ = M.read_meta(s)
        if schema is None:
            schema = seg_schema
        elif seg_schema != schema:
            raise ValueError(
                f"segment {s!r} schema {seg_schema} != first segment's "
                f"{schema} — segments must share one logical schema")
        bdir = M.blocks_dir(s)
        symtabs_by_dir[os.path.realpath(bdir)] = symtabs
        files.extend(sorted(_glob.glob(os.path.join(bdir, "*.parquet"))))
    names = columns or schema.names
    for c in names:
        if c not in schema.names:
            raise KeyError(f"unknown column {c}")
    out_fields = [schema.field(n) for n in names]
    spark_schema = from_arrow_schema(pa.schema(out_fields))
    if not files:
        # all segments were zero-row tables (no block files written)
        return spark.createDataFrame([], spark_schema)
    blocks = spark.read.parquet(*files).withColumn(
        "__src_file", F.input_file_name())
    if zone_filters:
        for col, lo, hi in zone_filters:
            blocks = blocks.filter(
                F.col(f"mn_{col}").isNull()
                | ((F.col(f"mn_{col}") <= F.lit(int(hi)))
                   & (F.col(f"mx_{col}") >= F.lit(int(lo)))))
    need = ["part_id", "block_id", "n_rows"] + [f"c_{n}" for n in names]
    if verify_crc:
        need += [f"crc_{n}" for n in names]
    blocks = blocks.select(*need, "__src_file")
    return blocks.mapInArrow(
        make_multi_decode_fn(schema, symtabs_by_dir, columns, verify_crc),
        spark_schema)


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
