"""Deduplication operators for training-data pipelines.

Five tiers, all DataFrame-first:

- exact:        hash-groupBy on content (shuffle on content hash)
- ngram-jaccard: exact set similarity over character n-grams (Catalyst
                 higher-order functions; O(n^2) verify — the *oracle-exact*
                 baseline; at 10^12 docs you run it only on LSH candidates)
- minhash+LSH:  vectorized signature kernel (mapInArrow) -> band buckets ->
                 shuffle only within buckets -> candidate pairs
- simhash:      64-bit fingerprints + band join for hamming<=k candidates
- embedding:    cosine near-dup over embedding vectors (brute pairs at small
                 scale; IVF buckets in similarity.py for the scale path)

Reference lineage: consecutive-duplicate detection is the reference's
repeated-point stats (JtsGeomStats.java:105-153) and dedup-on-encode
(JtsAdapter.java:405,488) — lossy there, analysis-only here (we never drop
rows during encode; dedup is an explicit operator).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

from pyspark.sql import DataFrame, functions as F

MERSENNE = (1 << 61) - 1


def round_half_away(x: np.ndarray, digits: int = 6) -> np.ndarray:
    """Round half-away-from-zero — the SQL ROUND mode (DuckDB, Spark
    F.round), unlike numpy's half-to-even. Keeps kernel outputs bit-aligned
    with ANSI-SQL oracles on exact decimal ties."""
    p = 10.0 ** digits
    y = x * p
    return np.trunc(y + np.copysign(0.5, y)) / p


def _bytes_view(txt: pa.Array) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Arrow string/binary column -> (valid mask, per-row byte lens of
    non-null rows, concatenated data bytes). Zero-copy views."""
    valid = (txt.is_valid().to_numpy(zero_copy_only=False)
             if txt.null_count else np.ones(len(txt), dtype=bool))
    nn = txt.drop_null().cast(pa.large_binary())
    o = np.frombuffer(nn.buffers()[1], dtype=np.int64)[nn.offset : nn.offset + len(nn) + 1]
    data = (np.frombuffer(nn.buffers()[2] or b"", dtype=np.uint8)[o[0] : o[-1]]
            if len(nn) else np.empty(0, dtype=np.uint8))
    return valid, np.diff(o), data


# ---------------------------------------------------------------------------
# exact dedup

def exact_dedup(df: DataFrame, content_col: str, id_col: str) -> DataFrame:
    """Keep the smallest id per distinct content value (deterministic).
    Shuffle: one hash-partition on content value; map-side partial min."""
    return (df.groupBy(content_col)
              .agg(F.min(id_col).alias(id_col))
              .select(id_col, content_col))


# ---------------------------------------------------------------------------
# character n-gram jaccard (exact)

def gram_set_expr(text_col: str, k: int):
    """Sorted distinct char-k-gram set of a text column.

    The length guard matters: Spark's ``sequence(1, 0)`` yields a
    DESCENDING [1, 0] (not an empty array), which would fabricate phantom
    grams for texts shorter than k — texts with no k-grams must map to an
    empty set, matching the end-exclusive ``range`` the SQL oracles use.
    """
    return F.expr(
        f"CASE WHEN length({text_col}) >= {k} THEN "
        f"array_sort(array_distinct(transform("
        f"sequence(1, length({text_col}) - {k - 1}),"
        f" i -> substring({text_col}, i, {k})))) "
        f"ELSE array() END")


def ngram_jaccard_pairs(df: DataFrame, text_col: str, id_col: str,
                        k: int = 3, threshold: float = 0.6) -> DataFrame:
    """Exact jaccard over char k-gram sets for all pairs above threshold.

    O(n^2) — correct-by-construction baseline used as the verify stage on
    LSH candidates at scale; run standalone only at small n.
    Returns (id_a, id_b, jaccard) with id_a < id_b, jaccard rounded.
    """
    g = (df.select(F.col(id_col).alias("id"),
                   gram_set_expr(text_col, k).alias("g"))
           .where(F.size("g") > 0))
    a, b = g.alias("a"), g.alias("b")
    inter = F.size(F.array_intersect(F.col("a.g"), F.col("b.g")))
    union = F.size(F.col("a.g")) + F.size(F.col("b.g")) - inter
    jac = inter / union
    return (a.join(b, F.col("a.id") < F.col("b.id"))
             .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"),
                     F.round(jac, 6).alias("jaccard"))
             .where(F.col("jaccard") >= threshold))


# ---------------------------------------------------------------------------
# minhash + LSH

def _minhash_params(num_perm: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, MERSENNE, num_perm, dtype=np.int64).astype(np.uint64)
    b = rng.integers(0, MERSENNE, num_perm, dtype=np.int64).astype(np.uint64)
    return a, b


def _shingle_hashes(lens: np.ndarray, data: np.ndarray, k: int) -> tuple[np.ndarray, np.ndarray]:
    """Rolling k-byte hashes of each doc's bytes, boundary-safe, vectorized.
    Returns (per-doc shingle counts, flat shingle hash array uint64)."""
    n_sh = np.maximum(lens - (k - 1), 0)
    if len(data) == 0 or int(n_sh.sum()) == 0:
        return n_sh, np.empty(0, dtype=np.uint64)
    # hash all length-k windows of the concatenated buffer, then select the
    # in-bounds windows per doc via multi_range over doc-local offsets
    from ..codecs.gather import multi_range

    h = np.zeros(len(data) - (k - 1), dtype=np.uint64)
    mult = np.uint64(0x9E3779B97F4A7C15)
    for j in range(k):
        h = h * mult + data[j : len(data) - (k - 1) + j]
    doc_ofs = np.concatenate(([0], np.cumsum(lens)))[:-1]
    idx = multi_range(doc_ofs, n_sh)
    return n_sh, h[idx]


def minhash_kernel(lens: np.ndarray, data: np.ndarray, num_perm: int,
                   shingle_k: int, seed: int) -> np.ndarray:
    """(n, num_perm) uint64 minhash signature matrix — pure numpy, shared by
    the Spark mapInArrow stage and the oracle fixture writer."""
    a_par, b_par = _minhash_params(num_perm, seed)
    n_sh, sh = _shingle_hashes(lens, data, shingle_k)
    sigs = np.full((len(lens), num_perm), MERSENNE, dtype=np.uint64)
    if len(sh):
        bounds = np.concatenate(([0], np.cumsum(n_sh)))
        nz = n_sh > 0
        starts = bounds[:-1][nz]
        for j in range(num_perm):
            pj = (a_par[j] * sh + b_par[j]) % np.uint64(MERSENNE)
            sigs[nz, j] = np.minimum.reduceat(pj, starts)
    return sigs


def minhash_signatures(df: DataFrame, text_col: str, id_col: str,
                       num_perm: int = 64, shingle_k: int = 5,
                       seed: int = 42) -> DataFrame:
    """(id, sig: array<long>) — vectorized minhash over char shingles."""
    from pyspark.sql.types import ArrayType, LongType, StructField, StructType

    out_schema = StructType([
        StructField("id", LongType(), False),
        StructField("sig", ArrayType(LongType(), False), False),
    ])

    def fn(batches):
        for batch in batches:
            ids = batch.column(0).to_numpy(zero_copy_only=False)
            valid, lens, data = _bytes_view(batch.column(1))
            sigs = minhash_kernel(lens, data, num_perm, shingle_k, seed)
            offsets = pa.array(np.arange(len(lens) + 1, dtype=np.int32) * num_perm)
            values = pa.array(sigs.view(np.int64).ravel(), type=pa.int64())
            arr = pa.ListArray.from_arrays(offsets, values)
            yield pa.RecordBatch.from_arrays(
                [pa.array(ids[valid], type=pa.int64()), arr],
                names=["id", "sig"])

    src = _spread(df.select(F.col(id_col).cast("long").alias("id"),
                            F.col(text_col)))
    return src.mapInArrow(fn, out_schema)


def minhash_lsh_pairs(df: DataFrame, text_col: str, id_col: str,
                      num_perm: int = 64, bands: int = 16,
                      shingle_k: int = 5, seed: int = 42,
                      hash_bands: bool = False,
                      work_dir: str | None = None) -> DataFrame:
    """Candidate near-duplicate pairs: docs sharing >=1 LSH band bucket.

    Scale path: the only shuffle is the band-bucket join key; bucket sizes
    are bounded by near-duplicate cluster sizes, not corpus size. Returns
    (id_a, id_b, n_bands) distinct pairs.

    Band keys default to the raw signature slice (array<long> equality —
    exact, and what the DuckDB oracle reproduces from the signature table);
    hash_bands=True joins on xxhash64(slice) instead, cutting the shuffle key
    from 8*rows_per_band to 8 bytes at a vanishing (2^-64 per bucket)
    collision risk — the right trade at 10^12 docs.

    The signature stage is materialized to ``work_dir`` parquet (an explicit
    temp table), so the self-join reads it twice from storage instead of
    recomputing the python kernel per side or pinning an executor cache.
    """
    rows_per_band = num_perm // bands
    sigs = _materialize_fp(
        minhash_signatures(df, text_col, id_col, num_perm, shingle_k, seed),
        df.sparkSession, "mvt_minhash_", work_dir)
    key = ((lambda b: F.xxhash64(F.slice("sig", b * rows_per_band + 1, rows_per_band)))
           if hash_bands else
           (lambda b: F.slice("sig", b * rows_per_band + 1, rows_per_band)))
    banded = sigs.select(
        "id",
        F.posexplode(F.array(*[key(b) for b in range(bands)])).alias("band", "bh"),
    )
    a, b = banded.alias("a"), banded.alias("b")
    pairs = (a.join(b, (F.col("a.band") == F.col("b.band"))
                    & (F.col("a.bh") == F.col("b.bh"))
                    & (F.col("a.id") < F.col("b.id")))
             .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
             .agg(F.count("*").alias("n_bands")))
    return pairs


_MINHASH_IDX_MARKER = "_MINHASH_OK"


def _read_idx_marker(index_dir: str) -> dict:
    import json as _json

    with open(os.path.join(index_dir, _MINHASH_IDX_MARKER)) as fh:
        return _json.load(fh)


def build_minhash_index(df: DataFrame, text_col: str, id_col: str,
                        index_dir: str, num_perm: int = 64,
                        shingle_k: int = 5, seed: int = 42) -> DataFrame:
    """Persist the corpus minhash signature table (id, sig) as a write-once
    index — the artifact that makes dedup INCREMENTAL: a new crawl batch is
    deduplicated against 10^12 existing documents by reading their
    signatures (8*num_perm bytes/doc), never by re-running the minhash
    kernel over the corpus text. A ``_MINHASH_OK`` marker pins the
    parameters; ``dedup_incremental``/``minhash_index_append`` refuse an
    index whose parameters do not match theirs (mixed-parameter signatures
    are incomparable garbage, so this fails loudly).

    Same discipline as the IVF index (similarity.py) and the gram-record
    stage: build once, query many, caller owns the directory.
    """
    import json as _json

    spark = df.sparkSession
    minhash_signatures(df, text_col, id_col, num_perm, shingle_k,
                       seed).write.mode("overwrite").parquet(index_dir)
    marker = os.path.join(index_dir, _MINHASH_IDX_MARKER)
    tmp = marker + ".tmp"
    with open(tmp, "w") as fh:
        _json.dump({"num_perm": num_perm, "shingle_k": shingle_k,
                    "seed": seed}, fh)
    os.replace(tmp, marker)
    return spark.read.parquet(index_dir)


def minhash_index_append(new_df: DataFrame, text_col: str, id_col: str,
                         index_dir: str) -> None:
    """Append a new batch's signatures to an existing index (call AFTER the
    batch passed ``dedup_incremental`` and was admitted to the corpus).
    Parameters come from the index marker, so appended signatures are
    always comparable with the existing ones."""
    p = _read_idx_marker(index_dir)
    minhash_signatures(new_df, text_col, id_col, p["num_perm"],
                       p["shingle_k"], p["seed"]).write.mode(
                           "append").parquet(index_dir)


def dedup_incremental(corpus_df: DataFrame, new_df: DataFrame,
                      text_col: str, id_col: str, index_dir: str,
                      bands: int = 16, threshold: float = 0.5, k: int = 3,
                      block_rows: int = 512,
                      gram_dir: str | None = None) -> DataFrame:
    """True near-dup pairs (id_a, id_b, jaccard) with at least one NEW
    endpoint: new-vs-corpus and new-vs-new, exactly verified.

    The incremental shape a streaming corpus needs: the corpus side costs
    one scan of its persisted signature index (``build_minhash_index``) —
    no text moves, no kernel runs over old documents. Only the new batch
    is minhashed. Candidates come from the usual banded join (8-byte
    xxhash64 band keys, the 10^12-doc shuffle key) restricted to pairs
    with a new endpoint; every candidate then passes the shared
    ``exact_jaccard_verify`` over corpus ∪ new text, so precision is
    exact — identical contract to ``ngram_jaccard_lsh``, restricted to
    pairs the new batch introduces.

    Ids must be unique across corpus and batch (the table's primary key).
    Accepted workflow: drop/keep decisions from the returned pairs, then
    ``minhash_index_append`` the admitted rows.
    """
    p = _read_idx_marker(index_dir)
    num_perm = p["num_perm"]
    if num_perm % bands:
        raise ValueError(f"bands={bands} must divide num_perm={num_perm}")
    rows_per_band = num_perm // bands
    spark = corpus_df.sparkSession
    old_sig = spark.read.parquet(index_dir).withColumn(
        "is_new", F.lit(False))
    new_sig = _materialize_fp(
        minhash_signatures(new_df, text_col, id_col, num_perm,
                           p["shingle_k"], p["seed"]),
        spark, "mvt_minhash_inc_").withColumn("is_new", F.lit(True))
    sigs = old_sig.unionByName(new_sig)
    key = lambda b: F.xxhash64(F.slice("sig", b * rows_per_band + 1,
                                       rows_per_band))
    banded = sigs.select(
        "id", "is_new",
        F.posexplode(F.array(*[key(b) for b in range(bands)]))
         .alias("band", "bh"))
    a, b = banded.alias("a"), banded.alias("b")
    cands = (a.join(b, (F.col("a.band") == F.col("b.band"))
                    & (F.col("a.bh") == F.col("b.bh"))
                    & (F.col("a.id") < F.col("b.id"))
                    & (F.col("a.is_new") | F.col("b.is_new")))
             .select(F.col("a.id").alias("id_a"),
                     F.col("b.id").alias("id_b"))
             .distinct())
    both = (corpus_df.select(F.col(id_col).cast("long").alias(id_col),
                             text_col)
            .unionByName(new_df.select(
                F.col(id_col).cast("long").alias(id_col), text_col)))
    return exact_jaccard_verify(both, cands, text_col, id_col, k=k,
                                threshold=threshold, block_rows=block_rows,
                                gram_dir=gram_dir)


def _spread(df: DataFrame, n_parts: int | None = None) -> DataFrame:
    """Repartition up to the session's parallelism when the input scan is
    too narrow (e.g. one parquet file) — otherwise the vectorized
    fingerprint kernels run on a single core.

    The width probe is metadata-only: ``df.inputFiles()`` lists the leaf
    scan's files without running a job or converting the plan to an RDD
    (``df.rdd.getNumPartitions()`` forces a DataFrame->RDD conversion — an
    avoidable analysis pass on a 100 TB plan). A file-backed input with at
    least ``target`` files is already wide (parquet is additionally
    splittable, so this under-counts, never over-counts, width); inputs
    Spark can't enumerate files for are conservatively respread. Callers
    that know their partitioning pass ``n_parts`` explicitly."""
    target = n_parts or df.sparkSession.sparkContext.defaultParallelism
    try:
        n_files = len(df.inputFiles())
    except Exception:
        n_files = 0
    if n_files >= target:
        return df
    return df.repartition(target)


_FP_TMP_DIRS: list[str] = []


def _materialize_fp(df: DataFrame, spark, prefix: str,
                    work_dir: str | None = None) -> DataFrame:
    """Land a fingerprint/signature stage as a parquet temp table so the
    self-join reads it twice from storage instead of recomputing the
    python kernel per side or pinning an executor cache for the session.

    Callers who pass ``work_dir`` own its lifecycle. Auto-created temp dirs
    are tracked and removed at interpreter exit (they must outlive the
    returned DataFrame, which lazily re-reads the files, so they cannot be
    deleted any earlier)."""
    import tempfile

    if work_dir is None:
        work_dir = tempfile.mkdtemp(prefix=prefix)
        if not _FP_TMP_DIRS:
            import atexit

            atexit.register(cleanup_temp_dirs)
        _FP_TMP_DIRS.append(work_dir)
    df.write.mode("overwrite").parquet(work_dir)
    return spark.read.parquet(work_dir)


def cleanup_temp_dirs() -> int:
    """Remove every auto-created signature/gram temp dir NOW and return how
    many were deleted. Long-lived driver sessions call this between dedup
    batches so disk does not accumulate one dir per operator call; it also
    runs once at interpreter exit as the backstop.

    Only call after fully consuming (or persisting) the DataFrames the
    dedup operators returned — they lazily re-read these files."""
    import shutil

    n = len(_FP_TMP_DIRS)
    for d in _FP_TMP_DIRS:
        shutil.rmtree(d, ignore_errors=True)
    _FP_TMP_DIRS.clear()
    return n


def band_candidates(fp: DataFrame) -> DataFrame:
    """Distinct (id_a, id_b) pairs sharing >=1 block-pair band of their
    64-bit fingerprints (simhash_band_exprs pigeonhole machinery)."""
    banded = fp.select(
        "id", F.posexplode(F.array(*simhash_band_exprs())).alias("band", "bh"))
    a, b = banded.alias("a"), banded.alias("b")
    return (a.join(b, (F.col("a.band") == F.col("b.band"))
                   & (F.col("a.bh") == F.col("b.bh"))
                   & (F.col("a.id") < F.col("b.id")))
            .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
            .distinct())


def _gram_record_df(df: DataFrame, text_col: str, id_col: str,
                    k: int) -> DataFrame:
    """(id, cnt, rec): each doc's distinct char-k-gram set packed into ONE
    binary blob of bytewise-sorted fixed-width records (see _gram_records).
    The packed form is what the block-pair verify ships — one blob per doc,
    never one gram-string array per candidate pair.

    Gram extraction happens INSIDE the kernel from the raw text bytes —
    the earlier Catalyst transform/array_distinct/array_sort pipeline
    allocated one JVM substring per gram position (2000 objects per 2KB
    doc) and shipped the gram arrays through Arrow; shipping the text and
    windowing in numpy halved the stage wall. Rows that are pure ASCII
    (the overwhelming case) take the vectorized byte-window path (char
    grams == byte grams); rows with multi-byte characters fall back to a
    per-row python set over decoded characters — identical char-gram
    semantics to substring(text, i, k), so the SQL oracle is unchanged.
    """
    from pyspark.sql.pandas.types import from_arrow_schema

    width = 4 * k  # utf-8 worst case: 4 bytes per char
    rw = width + 1
    src = (df.where(F.col(text_col).isNotNull()
                    & (F.length(text_col) >= k))
             .select(F.col(id_col).cast("long").alias("id"),
                     F.col(text_col)))
    out_schema = pa.schema([pa.field("id", pa.int64()),
                            pa.field("cnt", pa.int64()),
                            pa.field("rec", pa.binary())])

    def fn(batches):
        from ..codecs.gather import multi_range

        for batch in batches:
            if batch.num_rows == 0:
                continue
            valid, lens, data = _bytes_view(batch.column(1))
            ids = batch.column(0).to_numpy(zero_copy_only=False)[valid]
            n = len(ids)
            ofs = np.concatenate(([0], np.cumsum(lens)))
            # per-row ascii flag: any byte >= 0x80 forces the char fallback
            hi = (data >= 0x80)
            non_ascii = np.add.reduceat(hi, ofs[:-1]) > 0 if len(data) else \
                np.zeros(n, dtype=bool)
            non_ascii &= lens > 0
            out_ids, out_cnts, blobs = [], [], []
            # vectorized path: k-byte windows over the flat buffer, one
            # record matrix build, per-row unique (sorts + dedups)
            asc = np.flatnonzero(~non_ascii & (lens >= k))
            if len(asc):
                n_gr = lens[asc] - (k - 1)
                win_idx = multi_range(ofs[:-1][asc], n_gr)
                total = len(win_idx)
                rec = np.zeros((total, rw), dtype=np.uint8)
                rec[:, 0] = k
                for j in range(k):
                    rec[:, 1 + j] = data[win_idx + j]
                rv = rec.view(f"S{rw}").ravel()
                starts = np.concatenate(([0], np.cumsum(n_gr)))
                for p, i in enumerate(asc):
                    u = np.unique(rv[starts[p] : starts[p + 1]])
                    out_ids.append(int(ids[i]))
                    out_cnts.append(len(u))
                    blobs.append(u.tobytes())
            for i in np.flatnonzero(non_ascii):
                s = bytes(data[ofs[i] : ofs[i + 1]]).decode("utf-8")
                if len(s) < k:
                    continue
                gset = {s[p : p + k].encode() for p in range(len(s) - k + 1)}
                recs = np.zeros((len(gset), rw), dtype=np.uint8)
                for row, gb in enumerate(gset):
                    recs[row, 0] = len(gb)
                    recs[row, 1 : 1 + len(gb)] = np.frombuffer(gb, np.uint8)
                u = np.unique(recs.view(f"S{rw}").ravel())
                out_ids.append(int(ids[i]))
                out_cnts.append(len(u))
                blobs.append(u.tobytes())
            yield pa.RecordBatch.from_arrays(
                [pa.array(out_ids, type=pa.int64()),
                 pa.array(out_cnts, type=pa.int64()),
                 pa.array(blobs, type=pa.binary())],
                schema=out_schema)

    return src.mapInArrow(fn, from_arrow_schema(out_schema))


def ngram_jaccard_lsh(df: DataFrame, text_col: str, id_col: str,
                      k: int = 3, threshold: float = 0.5,
                      num_perm: int = 64, bands: int = 16,
                      shingle_k: int = 5, seed: int = 42,
                      block_rows: int = 512,
                      hash_bands: bool = True,
                      work_dir: str | None = None,
                      gram_dir: str | None = None) -> DataFrame:
    """Scale-path near-dup detection: minhash-LSH candidate pairs, then
    EXACT char-k-gram jaccard computed only on the candidates.

    Replaces ngram_jaccard_pairs' O(n^2) self-join with
    O(candidates) exact work — candidates are bounded by near-duplicate
    cluster sizes, not corpus size. Recall is the LSH recall (1-(1-j^r)^b;
    >=0.99 for j>=0.8 at 64/16); precision is exact (every reported pair
    carries its true jaccard). Returns (id_a, id_b, jaccard).

    Candidate generation is minhash-LSH; the exact verify stage is the
    shared ``exact_jaccard_verify`` (see its docstring for the block-pair
    plan). ``ngram_jaccard_winnow`` is the same composition with winnowing
    fingerprints as the candidate generator.

    ``hash_bands`` defaults to True here (unlike ``minhash_lsh_pairs``,
    whose raw array<long> band key is what the DuckDB oracle reproduces
    directly): this IS the scale entry point, and the 8-byte xxhash64 band
    key is the right shuffle-key size at 10^12 docs. The candidate set is
    identical to the raw-key set modulo a 2^-64-per-bucket hash collision,
    and the exact-verify stage makes even that harmless for precision —
    a colliding non-duplicate pair is measured and dropped.
    """
    cands = minhash_lsh_pairs(df, text_col, id_col, num_perm, bands,
                              shingle_k, seed, hash_bands=hash_bands,
                              work_dir=work_dir)
    return exact_jaccard_verify(df, cands, text_col, id_col, k=k,
                                threshold=threshold, block_rows=block_rows,
                                gram_dir=gram_dir)


def build_gram_records(df: DataFrame, text_col: str, id_col: str, k: int,
                       gram_dir: str) -> DataFrame:
    """Materialize (or reuse) the per-doc gram-record stage at ``gram_dir``.

    The gram records are a deterministic function of (corpus, text_col, k)
    and every verified dedup route ships the SAME records through
    ``exact_jaccard_verify`` — so when several routes run over one corpus
    (minhash-verified, winnow-verified, a cleaning pipeline), the stage is
    built ONCE and reused, exactly like the write-once IVF index. A
    ``_GRAMS_OK`` marker (ignored by the parquet reader: leading
    underscore) records the parameters; a parameter mismatch rebuilds and
    overwrites. Callers own ``gram_dir``'s lifecycle; reuse across process
    restarts is safe as long as the source table is unchanged (the same
    contract as the IVF index dir and the encode resume markers)."""
    import json as _json

    spark = df.sparkSession
    marker = os.path.join(gram_dir, "_GRAMS_OK")
    want = {"k": int(k), "text_col": text_col, "id_col": id_col}
    if os.path.exists(marker):
        with open(marker) as fh:
            if _json.load(fh) == want:
                return spark.read.parquet(gram_dir)
    _gram_record_df(df, text_col, id_col, k).write.mode(
        "overwrite").parquet(gram_dir)
    tmp = marker + ".tmp"
    with open(tmp, "w") as fh:
        _json.dump(want, fh)
    os.replace(tmp, marker)
    return spark.read.parquet(gram_dir)


def exact_jaccard_verify(df: DataFrame, cands: DataFrame, text_col: str,
                         id_col: str, k: int = 3, threshold: float = 0.5,
                         block_rows: int = 512,
                         gram_dir: str | None = None) -> DataFrame:
    """Exact char-k-gram jaccard over a candidate-pair DataFrame
    (id_a, id_b) — the verify stage every sub-quadratic dedup route
    composes with (minhash-LSH: ngram_jaccard_lsh; winnowing:
    ngram_jaccard_winnow). Returns (id_a, id_b, jaccard >= threshold).

    Verify plan (the round-2 32.7s wall was here): gram sets are packed
    once per doc into sorted fixed-width records (_gram_record_df), docs
    are grouped into hash blocks, candidate pairs are grouped by their
    (block_a, block_b) key, and ONE Arrow kernel per block pair intersects
    integer gram codes with numpy searchsorted. Each doc's gram set
    crosses the wire once per partner BLOCK — not once per candidate pair,
    which is what made both the Catalyst array_intersect plan and the
    naive per-pair-kernel plan transfer-bound on candidate-dense corpora.
    Exactness: records carry full gram bytes (length-prefixed, no
    hashing), and double division + half-away rounding match the ANSI
    oracle bit-for-bit.
    """
    from pyspark.sql.pandas.types import from_arrow_schema
    from pyspark.sql.types import (BinaryType, IntegerType, StructField,
                                   StructType)

    width = 4 * k
    spark = df.sparkSession
    if gram_dir is not None:
        fp = build_gram_records(df, text_col, id_col, k, gram_dir)
    else:
        fp = _materialize_fp(_gram_record_df(df, text_col, id_col, k),
                             spark, "mvt_gramrec_")
    n = fp.count()  # parquet metadata count on the materialized stage
    n_blocks = max(1, -(-n // block_rows))
    blk = lambda c: F.pmod(F.xxhash64(c), F.lit(n_blocks)).cast("int")

    pack_schema = StructType([
        StructField("b", IntegerType(), False),
        StructField("ids", BinaryType(), False),
        StructField("cnts", BinaryType(), False),
        StructField("recs", BinaryType(), False),
    ])

    def pack(pdf):
        import pandas as pd

        pdf = pdf.sort_values("id")
        ids = pdf["id"].to_numpy(dtype=np.int64)
        cnts = pdf["cnt"].to_numpy(dtype=np.int64)
        recs = b"".join(pdf["rec"])
        return pd.DataFrame({"b": [int(pdf["b"].iloc[0])],
                             "ids": [ids.tobytes()],
                             "cnts": [cnts.tobytes()], "recs": [recs]})

    packed = (fp.withColumn("b", blk("id"))
                .groupBy("b").applyInPandas(pack, pack_schema))

    # size-ratio prefilter (jaccard <= min|A|,|B| / max|A|,|B|) on the tiny
    # (id, cnt) side table — prunes pairs that can never reach threshold
    # before any gram bytes move
    sizes = fp.select("id", "cnt")
    sa = sizes.select(F.col("id").alias("id_a"), F.col("cnt").alias("ca"))
    sb = sizes.select(F.col("id").alias("id_b"), F.col("cnt").alias("cb"))
    pruned = (cands.join(sa, "id_a").join(sb, "id_b")
              .where(F.least("ca", "cb") >= F.lit(threshold) * F.greatest("ca", "cb"))
              .select("id_a", "id_b"))

    grouped = (pruned
               .groupBy(blk("id_a").alias("ba"), blk("id_b").alias("bb"))
               .agg(F.collect_list(F.struct("id_a", "id_b")).alias("prs")))
    x, y = packed.alias("x"), packed.alias("y")
    joined = (grouped
              .join(x, F.col("ba") == F.col("x.b"))
              .join(y, F.col("bb") == F.col("y.b"))
              .select("prs", F.col("x.ids").alias("ids_x"),
                      F.col("x.cnts").alias("cnts_x"),
                      F.col("x.recs").alias("recs_x"),
                      F.col("y.ids").alias("ids_y"),
                      F.col("y.cnts").alias("cnts_y"),
                      F.col("y.recs").alias("recs_y")))

    out_schema = pa.schema([pa.field("id_a", pa.int64()),
                            pa.field("id_b", pa.int64()),
                            pa.field("jaccard", pa.float64())])

    def _unpack(bts, cnt_bts):
        ids = np.frombuffer(bts, dtype=np.int64)
        cnts = np.frombuffer(cnt_bts, dtype=np.int64)
        return ids, cnts, np.concatenate(([0], np.cumsum(cnts)))

    def verify(batches):
        from ..codecs.gather import multi_range

        rw = width + 1
        for batch in batches:
            prs_col = batch.column("prs")
            p_off = np.concatenate(
                ([0], np.cumsum(prs_col.value_lengths().fill_null(0)
                                .to_numpy(zero_copy_only=False))))
            st = prs_col.flatten()
            all_a = st.field("id_a").to_numpy(zero_copy_only=False)
            all_b = st.field("id_b").to_numpy(zero_copy_only=False)
            for i in range(batch.num_rows):
                ida = all_a[p_off[i] : p_off[i + 1]]
                idb = all_b[p_off[i] : p_off[i + 1]]
                xi, xc, xo = _unpack(batch.column("ids_x")[i].as_py(),
                                     batch.column("cnts_x")[i].as_py())
                yi, yc, yo = _unpack(batch.column("ids_y")[i].as_py(),
                                     batch.column("cnts_y")[i].as_py())
                xr = np.frombuffer(batch.column("recs_x")[i].as_py(),
                                   dtype=np.uint8).view(f"S{rw}")
                yr = np.frombuffer(batch.column("recs_y")[i].as_py(),
                                   dtype=np.uint8).view(f"S{rw}")
                # one unique pass per block pair -> int codes; per-doc code
                # arrays stay sorted (codes are byte-order ranks and each
                # doc's records were sorted at pack time)
                codes = np.unique(np.concatenate([xr, yr]),
                                  return_inverse=True)[1].astype(np.int64)
                cx, cy = codes[: len(xr)], codes[len(xr):]
                # ids sorted at pack time -> binary-search doc lookup;
                # candidates whose doc has no gram row (e.g. text shorter
                # than k) are dropped, same as the old inner join
                pa_ = np.searchsorted(xi, ida).clip(max=max(len(xi) - 1, 0))
                pb_ = np.searchsorted(yi, idb).clip(max=max(len(yi) - 1, 0))
                ok = np.zeros(len(ida), dtype=bool)
                if len(xi) and len(yi):
                    ok = (xi[pa_] == ida) & (yi[pb_] == idb)
                sel = np.flatnonzero(ok)
                if not len(sel):
                    yield pa.RecordBatch.from_arrays(
                        [pa.array([], type=pa.int64()),
                         pa.array([], type=pa.int64()),
                         pa.array([], type=pa.float64())],
                        schema=out_schema)
                    continue
                # batched intersection: ONE searchsorted over every
                # candidate at once. Each pair p's (sorted) code arrays are
                # shifted by p * n_codes, so the concatenated target array
                # stays globally sorted and one binary-search pass answers
                # all pairs; per-pair hit counts fall out of a reduceat
                # over the needle boundaries. No Python-level per-pair
                # iteration remains.
                ai, bi = pa_[sel], pb_[sel]
                la, lb = xc[ai], yc[bi]
                stride = np.int64(len(codes)) if len(codes) else np.int64(1)
                pair_no = np.arange(len(sel), dtype=np.int64)
                A = (cx[multi_range(xo[ai], la)]
                     + stride * np.repeat(pair_no, la))
                B = (cy[multi_range(yo[bi], lb)]
                     + stride * np.repeat(pair_no, lb))
                pos = np.searchsorted(B, A)
                hit = np.zeros(len(A), dtype=bool)
                inb = pos < len(B)
                hit[inb] = B[pos[inb]] == A[inb]
                a_ofs = np.concatenate(([0], np.cumsum(la)))[:-1]
                # bool reduceat would saturate (logical or) — count in int64
                inter = (np.add.reduceat(hit.astype(np.int64), a_ofs)
                         if len(A) else np.zeros(len(sel), dtype=np.int64))
                union = la + lb - inter
                jac = round_half_away(inter / union, 6)
                keep = jac >= threshold
                yield pa.RecordBatch.from_arrays(
                    [pa.array(ida[sel][keep], type=pa.int64()),
                     pa.array(idb[sel][keep], type=pa.int64()),
                     pa.array(jac[keep], type=pa.float64())],
                    schema=out_schema)

    return joined.mapInArrow(verify, from_arrow_schema(out_schema))


def winnow_candidate_pairs(df: DataFrame, text_col: str, id_col: str,
                           k: int = 8, window: int = 4,
                           min_shared: int = 2,
                           max_df: int = 64) -> DataFrame:
    """Near-dup candidate pairs from winnowing fingerprints — the third
    candidate route next to minhash (set similarity) and simhash (hamming),
    with the SIGMOD'03 guarantee the other two lack: any two documents
    sharing a substring of length >= window + k - 1 share at least one
    fingerprint, so long verbatim overlaps are NEVER missed, independent of
    how dissimilar the rest of the documents is.

    Plan: fingerprint_winnow builds the distinct (id, fp) index (one
    vectorized kernel pass + one distinct shuffle); fingerprints appearing
    in more than ``max_df`` documents are dropped as stop-fingerprints
    (boilerplate — every pair they'd generate is also covered by the doc
    pair's rarer shared fingerprints, and without the cap one viral navbar
    string would emit a |docs|^2 blowup); the self-join on fp is then a
    bucketed shuffle with per-bucket fan-out <= max_df^2. ``min_shared``
    filters coincidental single-fp collisions. Returns
    (id_a, id_b, n_shared).
    """
    from .textstats import fingerprint_winnow

    fp = fingerprint_winnow(df, text_col, id_col, k, window)
    stop = (fp.groupBy("fp").agg(F.count("*").alias("n"))
              .where(F.col("n") > max_df).select("fp"))
    # left_anti on fp shares the self-join's hash key; the stop set is
    # tiny (<= |fp rows| / max_df) so AQE broadcasts it in practice
    fpf = fp.join(stop, "fp", "left_anti")
    a, b = fpf.alias("a"), fpf.alias("b")
    return (a.join(b, (F.col("a.fp") == F.col("b.fp"))
                   & (F.col("a.id") < F.col("b.id")))
            .groupBy(F.col("a.id").alias("id_a"),
                     F.col("b.id").alias("id_b"))
            .agg(F.count("*").alias("n_shared"))
            .where(F.col("n_shared") >= min_shared))


def ngram_jaccard_winnow(df: DataFrame, text_col: str, id_col: str,
                         k: int = 3, threshold: float = 0.5,
                         fp_k: int = 8, window: int = 4,
                         min_shared: int = 2, max_df: int = 64,
                         block_rows: int = 512,
                         gram_dir: str | None = None) -> DataFrame:
    """Winnowing-candidate near-dup route: winnow_candidate_pairs ->
    exact_jaccard_verify. Same output contract as ngram_jaccard_lsh
    (id_a, id_b, true jaccard >= threshold), different recall envelope:
    winnowing guarantees recall on shared-substring duplicates (mirror
    pages, boilerplate wraps around identical bodies) where minhash
    recall degrades smoothly with overall set similarity."""
    cands = winnow_candidate_pairs(df, text_col, id_col, fp_k, window,
                                   min_shared, max_df).select("id_a", "id_b")
    return exact_jaccard_verify(df, cands, text_col, id_col, k=k,
                                threshold=threshold, block_rows=block_rows,
                                gram_dir=gram_dir)


# ---------------------------------------------------------------------------
# near-dup cluster collapse: connected components + canonical pick

def dedup_components(pairs: DataFrame, id_a: str = "id_a",
                     id_b: str = "id_b", max_iters: int = 200,
                     algorithm: str = "labelprop") -> DataFrame:
    """Connected components of the near-duplicate pair graph:
    (id, comp) where comp = the smallest doc id in the component — the
    canonical representative a dedup pipeline keeps (every other member
    is the drop set). Only ids that appear in at least one pair are
    returned; unpaired docs are trivially their own canonical.

    algorithm="labelprop" (default): alternating min-label propagation
    (each round every node takes the min label over itself and its
    neighbors) — deterministic, one shuffle per round, terminates in
    O(component diameter) rounds. Near-dup clusters are dense, so the
    diameter is small in practice. The convergence check is folded into
    the round's own materialization: the update carries a ``chg`` flag
    column and localCheckpoint (eager) runs the job, so the probe is a
    take(1) scan over the already-materialized blocks — no second
    join+count job per round.

    algorithm="star": the large-star/small-star alternation (Kiveris et
    al., "Connected Components in MapReduce and Beyond", SoCC'14) —
    O(log^2 n) rounds on adversarial long-chain graphs where labelprop
    needs O(diameter). Use it when components may be deep (transitive
    near-dup chains over crawl snapshots); for shallow dense clusters
    labelprop does fewer shuffles per round.

    localCheckpoint trades fault-tolerance for speed (lost executors
    cannot recompute truncated lineage); on a real cluster set a reliable
    ``spark.sparkContext.setCheckpointDir`` and swap to ``.checkpoint()``
    for runs long enough to see executor churn.
    """
    if algorithm == "star":
        return _components_star(pairs, id_a, id_b, max_iters)
    if algorithm != "labelprop":
        raise ValueError(f"unknown algorithm {algorithm!r} "
                         "(expected 'labelprop' or 'star')")
    edges = pairs.select(F.col(id_a).cast("long").alias("a"),
                         F.col(id_b).cast("long").alias("b"))
    # localCheckpoint (eager) truncates lineage each round — without it the
    # logical plan doubles per iteration and analysis time explodes (the
    # standard iterative-DataFrame pitfall)
    edges = (edges.union(edges.select(F.col("b").alias("a"),
                                      F.col("a").alias("b"))).distinct()
                  .localCheckpoint())
    labels = (edges.select(F.col("a").alias("id")).distinct()
                   .withColumn("comp", F.col("id")).localCheckpoint())
    for it in range(max_iters):
        nbr = (edges.join(labels.withColumnRenamed("id", "a"), "a")
                    .groupBy(F.col("b").alias("id"))
                    .agg(F.min("comp").alias("nc")))
        # ONE job per round: the eager localCheckpoint materializes the
        # update with its chg flag; the convergence probe below is a
        # take(1) over those materialized blocks, not a recompute
        new_labels = (labels.join(nbr, "id", "left")
                      .select("id",
                              F.least(F.col("comp"),
                                      F.coalesce("nc", "comp")).alias("comp"),
                              (F.coalesce("nc", F.col("comp"))
                               < F.col("comp")).alias("chg"))
                      .localCheckpoint())
        converged = new_labels.where(F.col("chg")).isEmpty()
        labels = new_labels.select("id", "comp")
        if converged:
            break
    else:
        raise RuntimeError(
            f"components did not converge in {max_iters} min-label rounds "
            f"(component diameter exceeds max_iters) — rerun with "
            f"algorithm='star' (O(log^2 n) rounds on long chains) or a "
            f"higher max_iters")
    return labels


def _components_star(pairs: DataFrame, id_a: str, id_b: str,
                     max_iters: int) -> DataFrame:
    """Large-star/small-star connected components (SoCC'14). Maintains a
    shrinking edge set; converges when the edge set is a fixed point of the
    small-star round, at which point every edge is (node, component-min).

    Fixed-point detection: count + sum of per-edge 64-bit hashes (exact
    arithmetic via decimal(38,0)) compared across rounds. Two DISTINCT
    consecutive edge sets colliding on both count and 64-bit hash-sum is a
    ~2^-64 event — and a false "converged" here could only ever happen on a
    not-yet-star graph that the deterministic operators map to a same-count
    same-hashsum graph, which self-checks below (the final edge set must be
    self-loop-free and star-shaped is implied by the fixed point).
    """
    edges = (pairs.select(F.col(id_a).cast("long").alias("u"),
                          F.col(id_b).cast("long").alias("v"))
                  .where(F.col("u") != F.col("v"))
                  .distinct().localCheckpoint())
    nodes = (edges.select(F.col("u").alias("id"))
                  .union(edges.select(F.col("v").alias("id")))
                  .distinct().localCheckpoint())

    def _fingerprint(e: DataFrame) -> tuple[int, int]:
        r = e.agg(F.count("*").alias("n"),
                  F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")).alias("h")
                  ).first()
        return int(r["n"]), int(r["h"] or 0)

    def _large_star(e: DataFrame) -> DataFrame:
        sym = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        m = (sym.groupBy("u")
                .agg(F.least(F.min("v"), F.first("u")).alias("m")))
        return (sym.join(m, "u")
                   .where(F.col("v") > F.col("u"))
                   .select(F.col("v").alias("u"), F.col("m").alias("v"))
                   .distinct())

    def _small_star(e: DataFrame) -> DataFrame:
        # orient hi -> lo, then point every lo-neighbor (and hi) at the min
        o = e.select(F.greatest("u", "v").alias("u"),
                     F.least("u", "v").alias("v"))
        m = o.groupBy("u").agg(F.min("v").alias("m"))
        om = o.join(m, "u")
        out = (om.select(F.col("v").alias("u"), F.col("m").alias("v"))
                 .union(om.select(F.col("u"), F.col("m").alias("v"))))
        return out.where(F.col("u") != F.col("v")).distinct()

    fp = _fingerprint(edges)
    for _ in range(max_iters):
        edges = _small_star(_large_star(edges)).localCheckpoint()
        nfp = _fingerprint(edges)
        if nfp == fp:
            break
        fp = nfp
    else:
        raise RuntimeError(
            f"star components did not converge in {max_iters} rounds")
    # fixed point: edges = (member, component-min) stars; centers label
    # themselves
    return (nodes.join(edges.select(F.col("u").alias("id"),
                                    F.col("v").alias("c")), "id", "left")
                 .groupBy("id").agg(F.min("c").alias("c"))
                 .select("id", F.coalesce("c", "id").alias("comp")))


def dedup_drop_set(pairs: DataFrame, id_a: str = "id_a",
                   id_b: str = "id_b") -> DataFrame:
    """(id, keep_id): every non-canonical member of each near-dup cluster
    with the canonical doc that replaces it — the rows a training-data
    pipeline deletes after near-dup detection."""
    comp = dedup_components(pairs, id_a, id_b)
    return (comp.where(F.col("id") != F.col("comp"))
                .select("id", F.col("comp").alias("keep_id")))


# ---------------------------------------------------------------------------
# simhash

def simhash_kernel(lens: np.ndarray, data: np.ndarray,
                   shingle_k: int) -> np.ndarray:
    """uint64 simhash per row (per-bit majority vote over shingle hashes) —
    pure numpy, shared by the Spark stage and the oracle fixture writer."""
    n_sh, sh = _shingle_hashes(lens, data, shingle_k)
    fps = np.zeros(len(lens), dtype=np.uint64)
    if len(sh):
        bits = np.unpackbits(sh.view(np.uint8).reshape(-1, 8), axis=1,
                             bitorder="little").astype(np.int32) * 2 - 1
        bounds = np.concatenate(([0], np.cumsum(n_sh)))
        nz = n_sh > 0
        votes = np.add.reduceat(bits, bounds[:-1][nz], axis=0)
        packed = np.packbits((votes > 0).astype(np.uint8), axis=1,
                             bitorder="little")
        fps[nz] = packed.view(np.uint64).ravel()
    return fps


def simhash_fingerprints(df: DataFrame, text_col: str, id_col: str,
                         shingle_k: int = 4) -> DataFrame:
    """(id, simhash long): per-bit majority vote over shingle hashes."""
    from pyspark.sql.types import LongType, StructField, StructType

    out_schema = StructType([
        StructField("id", LongType(), False),
        StructField("simhash", LongType(), False),
    ])

    def fn(batches):
        for batch in batches:
            ids = batch.column(0).to_numpy(zero_copy_only=False)
            valid, lens, data = _bytes_view(batch.column(1))
            fps = simhash_kernel(lens, data, shingle_k)
            yield pa.RecordBatch.from_arrays(
                [pa.array(ids[valid], type=pa.int64()),
                 pa.array(fps.view(np.int64), type=pa.int64())],
                names=["id", "simhash"])

    src = _spread(df.select(F.col(id_col).cast("long").alias("id"),
                            F.col(text_col)))
    return src.mapInArrow(fn, out_schema)


def simhash_band_exprs(n_blocks: int = 8):
    """Composite band keys: the 64-bit fingerprint split into ``n_blocks``
    equal blocks, one key per unordered block *pair* (C(n,2) keys).

    Pigeonhole recall guarantee: hamming <= n_blocks - 2 flips bits in at
    most n_blocks - 2 blocks, leaving >= 2 blocks identical — so some block
    pair matches exactly and the pair is a candidate. With the default 8
    blocks of 8 bits that guarantees every hamming<=6 pair is found (the
    old 4x16 banding only guaranteed hamming<=3 while advertising 6).
    """
    assert 64 % n_blocks == 0
    w = 64 // n_blocks
    mask = (1 << w) - 1
    blocks = [F.shiftright("simhash", i * w).bitwiseAND(F.lit(mask))
              for i in range(n_blocks)]
    return [F.shiftleft(blocks[i], w) + blocks[j]
            for i in range(n_blocks) for j in range(i + 1, n_blocks)]


def simhash_pairs(df: DataFrame, text_col: str, id_col: str,
                  max_hamming: int = 6, shingle_k: int = 4,
                  work_dir: str | None = None) -> DataFrame:
    """ALL pairs with fingerprint hamming distance <= max_hamming (exact for
    max_hamming <= 6 by the block-pair pigeonhole — see simhash_band_exprs),
    verified against a DuckDB all-pairs hamming join in the oracle gate.

    Scale shape: the only shuffle is the band-bucket join; expected random
    collisions per key are n^2/2^16 per band over uniform fingerprints.
    Degenerate corpora (a huge exact-duplicate class sharing one
    fingerprint) make the *output itself* quadratic — run exact_dedup first
    at scale so identical texts collapse before near-dup detection.

    The fingerprint stage is materialized to ``work_dir`` parquet so the
    self-join reads it from storage twice instead of recomputing the python
    kernel per side or pinning an executor cache for the session.
    """
    if max_hamming > 6:
        raise ValueError("recall guarantee covers max_hamming <= 6 "
                         "(8 blocks, pairs of blocks); got "
                         f"{max_hamming}")
    fp = _materialize_fp(simhash_fingerprints(df, text_col, id_col, shingle_k),
                         df.sparkSession, "mvt_simhash_", work_dir)
    return simhash_pairs_from_fps(fp, max_hamming)


def simhash_pairs_from_fps(fp: DataFrame, max_hamming: int = 6) -> DataFrame:
    """Band join over an (id, simhash) DataFrame — see simhash_pairs."""
    banded = fp.select(
        "id", "simhash",
        F.posexplode(F.array(*simhash_band_exprs())).alias("band", "bh"))
    a, b = banded.alias("a"), banded.alias("b")
    ham = F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
    return (a.join(b, (F.col("a.band") == F.col("b.band"))
                   & (F.col("a.bh") == F.col("b.bh"))
                   & (F.col("a.id") < F.col("b.id")))
            .where(ham <= max_hamming)
            .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"),
                    ham.cast("long").alias("hamming"))
            .distinct())


# ---------------------------------------------------------------------------
# sign-random-projection LSH for embeddings (sub-quadratic cosine dedup)

def srp_kernel(V: np.ndarray, dim: int, n_bits: int = 64,
               seed: int = 42) -> np.ndarray:
    """uint64 sign-random-projection fingerprints: bit j = sign(V @ R[:, j])
    with a seeded gaussian projection matrix. Pure numpy — shared by the
    Spark stage and the oracle fixture writer. P(bit differs) = angle/pi,
    so hamming distance estimates the angle between vectors."""
    rng = np.random.default_rng(seed)
    R = rng.standard_normal((dim, n_bits))
    bits = (V @ R) > 0
    return np.packbits(bits.astype(np.uint8), axis=1,
                       bitorder="little").view(np.uint64).ravel()


def srp_fingerprints(df: DataFrame, vec_col: str, id_col: str,
                     seed: int = 42) -> DataFrame:
    """(id, simhash long): SRP fingerprints of an embedding column — named
    ``simhash`` so the block-pair banding machinery is shared verbatim."""
    from pyspark.sql.types import LongType, StructField, StructType

    out_schema = StructType([
        StructField("id", LongType(), False),
        StructField("simhash", LongType(), False),
    ])

    def fn(batches):
        for b in batches:
            if b.num_rows == 0:
                continue
            ids = b.column(0).to_numpy(zero_copy_only=False)
            vv = b.column(1)
            V = np.asarray(vv.flatten().to_numpy(zero_copy_only=False),
                           dtype=np.float64).reshape(len(ids), -1)
            fps = srp_kernel(V, V.shape[1], seed=seed)
            yield pa.RecordBatch.from_arrays(
                [pa.array(ids, type=pa.int64()),
                 pa.array(fps.view(np.int64), type=pa.int64())],
                names=["id", "simhash"])

    src = _spread(df.where(F.col(vec_col).isNotNull())
                    .select(F.col(id_col).cast("long").alias("id"),
                            F.transform(F.col(vec_col),
                                        lambda x: x.cast("double")).alias("v")))
    return src.mapInArrow(fn, out_schema)


def embedding_srp_pairs(df: DataFrame, vec_col: str, id_col: str,
                        threshold: float = 0.95, seed: int = 42,
                        work_dir: str | None = None) -> DataFrame:
    """Sub-quadratic cosine near-dup pairs: SRP band candidates -> EXACT
    cosine verify on candidates only. Returns (id_a, id_b, cosine).

    Scale shape: fingerprints are one map pass; the only quadratic-ish
    step is the band-bucket join, whose buckets hold vectors agreeing on
    16 projection signs. Precision is exact (every reported pair carries
    its true cosine, same fold/rounding as the SQL oracle). Recall: a pair
    surfaces iff some block pair of its fingerprints matches — guaranteed
    when SRP hamming <= 6, i.e. designed for true near-duplicates
    (E[hamming] = 64*angle/pi ~ 6 at cosine 0.96); at looser thresholds
    recall decays and the exact block-pair plan
    (embedding_neardup_pairs) or IVF bucketing is the right tool.
    """
    from .similarity import _as_double, _dot, _norm

    fp = _materialize_fp(srp_fingerprints(df, vec_col, id_col, seed),
                         df.sparkSession, "mvt_srp_", work_dir)
    cands = band_candidates(fp)
    v = (df.where(F.col(vec_col).isNotNull())
           .select(F.col(id_col).cast("long").alias("id"),
                   _as_double(F.col(vec_col)).alias("v")))
    v = (v.select("id", "v", _norm(F.col("v")).alias("nrm"))
          .where(F.col("nrm") > 0))
    va = v.select(F.col("id").alias("id_a"), F.col("v").alias("va"),
                  F.col("nrm").alias("na"))
    vb = v.select(F.col("id").alias("id_b"), F.col("v").alias("vb"),
                  F.col("nrm").alias("nb"))
    cos = F.round(_dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")), 6)
    return (cands.join(va, "id_a").join(vb, "id_b")
            .select("id_a", "id_b", cos.alias("cosine"))
            .where(F.col("cosine") >= threshold))


# ---------------------------------------------------------------------------
# embedding cosine near-dup

def _norms_seq(M: np.ndarray) -> np.ndarray:
    """Dimension-sequential L2 norms — the same left-to-right fold as the
    ANSI-SQL oracle's sqrt(list_sum(x*x)), so values match bit-for-bit."""
    acc = np.zeros(len(M))
    for kdim in range(M.shape[1]):
        acc += M[:, kdim] * M[:, kdim]
    return np.sqrt(acc)


def embedding_neardup_pairs(df: DataFrame, vec_col: str, id_col: str,
                            threshold: float = 0.95,
                            block_rows: int = 4096) -> DataFrame:
    """Exact cosine pairs >= threshold — fully distributed block-matrix plan.

    Physical plan: vectors are grouped into B = ceil(n/block_rows) blocks by
    id hash; each block is packed into ONE row holding (ids, row-major f64
    matrix bytes). The B(B+1)/2 unordered block pairs are enumerated by a
    self-join on block id, and an Arrow kernel computes each pair's dense
    cosine sub-matrix. Nothing is ever collected to the driver, and peak
    task memory is two blocks plus a sub-chunked score matrix. Exact
    all-pairs is inherently O(n^2) work — this shape distributes it evenly
    across B^2/2 tasks; the sub-quadratic scale paths are minhash_lsh_pairs
    and similarity.ivf_topk.

    Fold-order/rounding discipline: norms and dots accumulate
    dimension-sequentially (the SQL left-to-right fold) and rounding is
    half-away-from-zero (SQL ROUND), so rounded cosines match the ANSI
    oracle bit-for-bit. Null vectors are dropped (the oracle's nrm > 0
    predicate is NULL-false there); ragged dimensions raise.
    """
    from pyspark.sql.pandas.types import from_arrow_schema
    from pyspark.sql.types import (BinaryType, IntegerType, StructField,
                                   StructType)

    d = (df.where(F.col(vec_col).isNotNull())
           .select(F.col(id_col).cast("long").alias("id"),
                   F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v")))
    n = d.count()
    n_blocks = max(1, -(-n // block_rows))

    pack_schema = StructType([
        StructField("b", IntegerType(), False),
        StructField("ids", BinaryType(), False),
        StructField("mat", BinaryType(), False),
    ])

    def pack(pdf):
        import pandas as pd

        ids = pdf["id"].to_numpy(dtype=np.int64)
        rows = [np.asarray(v, dtype=np.float64) for v in pdf["v"]]
        dims = {len(r) for r in rows}
        if len(dims) > 1:
            raise ValueError(f"ragged embedding dimensions in block: {sorted(dims)}")
        M = np.stack(rows) if rows else np.empty((0, 0))
        return pd.DataFrame({"b": [int(pdf["b"].iloc[0])],
                             "ids": [ids.tobytes()], "mat": [M.tobytes()]})

    blocks = (d.withColumn("b", F.pmod(F.xxhash64("id"), F.lit(n_blocks)).cast("int"))
                .groupBy("b").applyInPandas(pack, pack_schema))

    x, y = blocks.alias("x"), blocks.alias("y")
    joined = x.join(y, F.col("x.b") <= F.col("y.b")).select(
        F.col("x.b").alias("bx"), F.col("x.ids").alias("ids_x"),
        F.col("x.mat").alias("mat_x"),
        F.col("y.b").alias("by"), F.col("y.ids").alias("ids_y"),
        F.col("y.mat").alias("mat_y"))

    out_schema = pa.schema([pa.field("id_a", pa.int64()),
                            pa.field("id_b", pa.int64()),
                            pa.field("cosine", pa.float64())])

    def pairs(batches):
        for b in batches:
            for i in range(b.num_rows):
                ids_x = np.frombuffer(b.column("ids_x")[i].as_py(), dtype=np.int64)
                ids_y = np.frombuffer(b.column("ids_y")[i].as_py(), dtype=np.int64)
                if not (len(ids_x) and len(ids_y)):
                    continue
                Mx = np.frombuffer(b.column("mat_x")[i].as_py(),
                                   dtype=np.float64).reshape(len(ids_x), -1)
                My = np.frombuffer(b.column("mat_y")[i].as_py(),
                                   dtype=np.float64).reshape(len(ids_y), -1)
                nx, ny = _norms_seq(Mx), _norms_seq(My)
                kx, ky = nx > 0, ny > 0
                ids_x2, Mx2, nx2 = ids_x[kx], Mx[kx], nx[kx]
                ids_y2, My2, ny2 = ids_y[ky], My[ky], ny[ky]
                diag = int(b.column("bx")[i].as_py()) == int(b.column("by")[i].as_py())
                # sub-chunk the x side so the score matrix stays ~16MB
                step = max(1, (1 << 21) // max(len(ids_y2), 1))
                for s in range(0, len(ids_x2), step):
                    ci, cm, cn = (ids_x2[s:s+step], Mx2[s:s+step], nx2[s:s+step])
                    dots = np.zeros((len(ci), len(ids_y2)))
                    for kdim in range(cm.shape[1]):
                        dots += cm[:, kdim : kdim + 1] * My2[:, kdim][None, :]
                    cos = round_half_away(dots / (cn[:, None] * ny2[None, :]), 6)
                    hit = cos >= threshold
                    if diag:
                        hit &= ci[:, None] < ids_y2[None, :]
                    else:
                        hit &= ci[:, None] != ids_y2[None, :]
                    ai, bi = np.nonzero(hit)
                    id_a = np.minimum(ci[ai], ids_y2[bi])
                    id_b = np.maximum(ci[ai], ids_y2[bi])
                    yield pa.RecordBatch.from_arrays(
                        [pa.array(id_a, type=pa.int64()),
                         pa.array(id_b, type=pa.int64()),
                         pa.array(cos[ai, bi], type=pa.float64())],
                        schema=out_schema)

    return joined.mapInArrow(pairs, from_arrow_schema(out_schema))
