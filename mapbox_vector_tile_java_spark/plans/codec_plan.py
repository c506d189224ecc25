"""Global codec planning: one sampling job -> per-column codec plan.

At 10^12-document scale, per-partition codec training is the wrong shape
twice over: it repeats identical work on every partition (FSST training
dominates encode wall-clock), and an exact global `distinct()` for the
dictionary is a full table scan. This planner mirrors the reference's
build-once-per-layer dictionaries (MvtEncoder.java:91, MvtLayerProps.java:
33-60) at cluster scope: collect ONE head-sample of the table, train every
shared artifact driver-side (FSST symbol tables, global dictionaries, skew
salt map), broadcast them via task closures, and persist the plan + symbol
tables in the encoded table's meta so resume and decode are exact.

Losslessness never depends on the sample being representative: dict_global
escapes out-of-sample values inline, FSST escapes unmatched bytes
(fsst.py), tok_dict is self-contained per block. A bad sample costs bytes,
never correctness.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..codecs import fsst as fsstmod
from ..codecs.selector import DICT_MAX_RATIO, FSST_MIN_DATA, row_sample

SAMPLE_ROWS_PER_PART = 512      # a few hundred KB per partition suffices:
SAMPLE_PARTITIONS = 16          # per-column trials cap at TRIAL_BYTES anyway
TRIAL_BYTES = 256 * 1024        # per-column trial-encode budget
GLOBAL_DICT_MAX = 4096          # max symbols for a broadcast dictionary
FSST_TRAIN_BYTES = 1 << 19      # global tables train on a bigger sample


def estimate_width(df) -> int:
    """Metadata-only partition-count estimate: ``df.inputFiles()`` (parquet
    splits at least one partition per file) or the session default
    parallelism. Never ``df.rdd.getNumPartitions()``, which forces a
    DataFrame->RDD plan conversion — an avoidable analysis pass on a
    100 TB plan. Callers that know the real count pass it explicitly."""
    try:
        n = len(df.inputFiles())
    except Exception:
        n = 0
    return n if n > 0 else df.sparkSession.sparkContext.defaultParallelism


def collect_sample(df, rows_per_part: int = SAMPLE_ROWS_PER_PART,
                   sample_partitions: int = SAMPLE_PARTITIONS,
                   n_parts: int | None = None) -> pa.Table:
    """One Spark job: head rows from ``sample_partitions`` evenly-strided
    partitions.

    Fully deterministic for a given input+partitioning (unlike a global
    ``limit``, whose surviving rows depend on task completion order) — so
    the codec plan, and therefore every encoded byte and checksum,
    reproduces across independent runs. Non-selected partitions' tasks
    return immediately; selected tasks read only their first Arrow batch.

    ``n_parts``: the input's partition count when the caller knows it
    (the partition planners do). The fallback estimate is metadata-only —
    ``df.inputFiles()`` (parquet splits at least one partition per file)
    or the session default parallelism — never
    ``df.rdd.getNumPartitions()``, which forces a DataFrame->RDD plan
    conversion. The estimate only spaces the sampled-partition stride;
    under-estimating samples earlier partitions, and losslessness never
    depends on the sample (module docstring), so an off estimate costs
    sample spread, not correctness or determinism.
    """
    if n_parts is None:
        n_parts = estimate_width(df)
    stride = max(1, n_parts // sample_partitions)

    def head(batches):
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        if pid % stride != 0 or pid // stride >= sample_partitions:
            return
        took = 0
        for b in batches:
            if took >= rows_per_part:
                break
            s = b.slice(0, min(b.num_rows, rows_per_part - took))
            took += s.num_rows
            yield s

    return df.mapInArrow(head, df.schema).toArrow()


def _is_byteslike(t: pa.DataType) -> bool:
    from ..columns import _is_byteslike

    return _is_byteslike(t)


def plan_from_sample(sample: pa.Table, skip: set[str] = frozenset(),
                     next_sid: int = 0):
    """Build per-column codec overrides from a sample table.

    Returns (overrides, symtabs, plan_note):
      overrides: {col: (codec_name, params)} for bytes-like columns with a
                 confident global choice; int-like columns stay per-block
                 'auto' (their selection is exact-size and cheap).
      symtabs:   {sid: [symbol bytes, ...]} to persist in table meta.
      plan_note: json-able description for meta.json / lineage audit.
    """
    from ..columns import _bytes_parts
    from ..codecs.bytescodecs import _tokd_encode

    overrides: dict = {}
    symtabs: dict[int, list[bytes]] = {}
    note: dict = {}
    sid = next_sid

    cols = [f.name for f in sample.schema
            if f.name not in skip and _is_byteslike(f.type)]

    def plan_col(col):
        nn = sample.column(col).combine_chunks()
        if isinstance(nn, pa.ChunkedArray):
            nn = nn.combine_chunks()
        nn = nn.drop_null()
        lens, data = _bytes_parts(nn)
        n = len(lens)
        if n == 0 or len(data) < FSST_MIN_DATA:
            return col, None
        raw_size = int(len(data)) + n
        best = ("raw_bytes", raw_size, {}, None)  # name, est, params, symbols

        # global dictionary candidate (sampled; escapes cover the tail)
        uniq = nn.unique()
        if len(uniq) <= GLOBAL_DICT_MAX and len(uniq) / n <= DICT_MAX_RATIO:
            symbols = sorted(
                v.as_py() if isinstance(v.as_py(), bytes) else v.as_py().encode()
                for v in uniq)
            w = max(1, len(symbols).bit_length())
            est = (n * w + 7) // 8 + 16
            if est < best[1]:
                best = ("dict_global", est, {"symbols": symbols}, symbols)

        # FSST candidate: train once on a spread sample
        train_data = (data if len(data) <= FSST_TRAIN_BYTES
                      else fsstmod.spread_sample(data, FSST_TRAIN_BYTES))
        table = fsstmod.train(train_data)
        trial = (data if len(data) <= TRIAL_BYTES
                 else fsstmod.spread_sample(data, TRIAL_BYTES))
        comp = table.compress(trial)
        # all candidate estimates below are at sample scale (len(data) is the
        # sample's bytes), so they compare like-for-like with raw_size
        fsst_est = int(len(comp) * (len(data) / max(len(trial), 1))) + n
        if fsst_est < best[1]:
            best = ("fsst_global", fsst_est, {"fsst_table": table},
                    list(table.symbols))

        # tok_dict candidate (self-contained blocks; shared table for its
        # inline token-table compression)
        n_sep = int((np.asarray(trial) == 0x20).sum())
        if n_sep >= 0.02 * len(trial):
            s_lens, s_data = row_sample(lens, data, TRIAL_BYTES)
            blob = _tokd_encode((s_lens, s_data), {"fsst_table": table})
            tok_est = int(len(blob) * (len(data) / max(len(s_data), 1)))
            if tok_est < best[1]:
                best = ("tok_dict", tok_est, {"fsst_table": table},
                        list(table.symbols))
        return col, (*best, n)

    # plan columns concurrently: training/trials are big-array numpy work
    # (GIL mostly released) and this is the job's only serial driver-side
    # section — it bounds scaling efficiency at small data sizes
    if len(cols) > 1:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=min(4, len(cols))) as ex:
            results = dict(ex.map(plan_col, cols))
    else:
        results = dict(map(plan_col, cols))

    for col in cols:  # deterministic sid assignment in schema order
        r = results[col]
        if r is None:
            continue
        name, est, params, symbols, n = r
        if name == "raw_bytes":
            note[col] = {"codec": name, "symtab_id": -1}
            overrides[col] = (name, None)
            continue
        params = dict(params)
        params["symtab_id"] = sid
        symtabs[sid] = symbols
        overrides[col] = (name, params)
        note[col] = {"codec": name, "symtab_id": sid,
                     "est_bytes": int(est), "sample_rows": n}
        sid += 1

    return overrides, symtabs, note


def overrides_from_plan(plan_note: dict, symtabs: dict[int, list[bytes]]):
    """Reconstruct encode overrides from a persisted plan (exact resume:
    partitions encoded by a later run use the same tables/choices as the
    committed ones)."""
    overrides: dict = {}
    for col, info in plan_note.items():
        name = info["codec"]
        sid = info.get("symtab_id", -1)
        if name == "raw_bytes":
            overrides[col] = (name, None)
        elif name == "dict_global":
            overrides[col] = (name, {"symbols": symtabs[sid], "symtab_id": sid})
        elif name == "fsst_global":
            overrides[col] = (name, {
                "fsst_table": fsstmod.SymbolTable(symbols=list(symtabs[sid])),
                "symtab_id": sid})
        elif name == "tok_dict":
            overrides[col] = (name, {
                "fsst_table": fsstmod.SymbolTable(symbols=list(symtabs[sid])),
                "symtab_id": sid})
        else:
            overrides[col] = (name, None)
    return overrides


def hot_keys_from_sample(sample: pa.Table, url_col: str, n_parts: int,
                         frac_threshold: float | None = None) -> dict[str, int]:
    """Skew salt map from the sample's url hosts — no extra Spark job.

    Same contract as plans.partitioning.detect_hot_keys: {host: n_buckets}
    for hosts whose sampled share would overload one partition.
    """
    import pyarrow.compute as pc

    frac_threshold = frac_threshold or (1.0 / max(n_parts, 2))
    urls = sample.column(url_col).combine_chunks()
    hosts = pc.extract_regex(urls.cast(pa.string()), r"^[a-z]+://(?P<host>[^/]+)")
    hosts = pc.struct_field(hosts, "host")
    vc = hosts.value_counts()
    total = max(len(urls), 1)
    out: dict[str, int] = {}
    for item in vc.to_pylist():
        host, cnt = item["values"], item["counts"]
        frac = cnt / total
        if host is not None and frac > frac_threshold:
            out[host] = max(2, int(frac / frac_threshold) + 1)
    return out
