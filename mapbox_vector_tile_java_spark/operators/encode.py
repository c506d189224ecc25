"""Distributed encode: DataFrame -> per-partition block files + manifest.

Lifecycle (SURVEY §3.1 "engine equivalent"): stats/global-dict pass ->
partition plan -> mapInArrow(encode blocks) writing per-partition parquet
with atomic commit markers -> manifest + meta committed by the driver.

Scale notes:
- the only shuffle is the explicit partition plan (hash on url-host+salt);
  encode itself is map-only and writes from executors — no driver data path.
- global dictionaries are collected once (distinct on a low-cardinality
  column — tiny) and shipped via closure broadcast, the cluster-scale analog
  of the reference's layer-global key/value dicts (MvtLayerProps.java:33-60,
  vector_tile.proto:69-72).
- resume: a partition whose .done marker validates is not re-encoded or
  re-written (its manifest rows are replayed from the marker), so a killed
  job re-run skips committed partitions (FIXTURES.md F5).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..columns import encode_column
from ..plans import manifest as M

def _minmax_i64(arr: pa.Array):
    """Zone-map min/max for int-like columns (decode-side pruning, the
    manifest analog of the reference's AABB pre-filter, JtsAdapter.java:232)."""
    from ..columns import _is_intlike, _to_int64

    if not _is_intlike(arr.type) or arr.null_count == len(arr) or len(arr) == 0:
        return None, None
    v = _to_int64(arr.drop_null())
    return int(v.min()), int(v.max())


def encode_batch(batch: pa.RecordBatch, pid: int, block_id: int,
                 overrides: dict, plan_cache: dict | None = None) -> tuple[dict, list[dict]]:
    """Encode one Arrow batch into a block row + flat manifest rows.

    plan_cache carries bytes-codec choices (incl. trained FSST tables) across
    sibling blocks of a partition — training once per partition, the way the
    reference builds one dict per layer, not per feature (MvtEncoder.java:91).
    """
    mrows = []
    block = {"part_id": pid, "block_id": block_id, "n_rows": batch.num_rows}
    plan_cache = plan_cache if plan_cache is not None else {}
    for name in batch.schema.names:
        arr = batch.column(name)
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        codec, params = overrides.get(name) or plan_cache.get(name) or ("auto", None)
        blob, meta = encode_column(arr, codec, params)
        if "reusable_plan" in meta:
            plan_cache[name] = meta.pop("reusable_plan")
        mn, mx = _minmax_i64(arr)
        crc = meta["content_crc"]
        crc = crc - (1 << 64) if crc >= (1 << 63) else crc  # int64 view
        block[f"c_{name}"] = blob
        block[f"crc_{name}"] = crc
        block[f"mn_{name}"] = mn
        block[f"mx_{name}"] = mx
        mrows.append({"part_id": pid, "block_id": block_id,
                      "n_rows": batch.num_rows, "name": name,
                      "dtype": str(arr.type), "codec": meta["codec"],
                      "null_count": meta["null_count"],
                      "raw_bytes": meta["raw_bytes"],
                      "enc_bytes": meta["enc_bytes"], "content_crc": crc,
                      "min_i64": mn, "max_i64": mx,
                      "symtab_id": meta.get("symtab_id", -1)})
    return block, mrows


def _manifest_batch(rows: list[dict]) -> pa.RecordBatch:
    if not rows:
        return pa.RecordBatch.from_pylist([], schema=M.MANIFEST_ARROW)
    return pa.RecordBatch.from_pylist(rows, schema=M.MANIFEST_ARROW)


def make_encode_fn(out_dir: str, overrides: dict, resume: bool,
                   schema: pa.Schema | None = None):
    """Build the mapInArrow function (runs on executors)."""

    def fn(batches):
        from pyspark import TaskContext

        from ..codecs.gather import warm_heap

        warm_heap()  # once per (reused) python worker
        pid = TaskContext.get().partitionId()
        if resume:
            committed = M.read_done(out_dir, pid)
            if committed is not None:
                # skip encode + write; replay manifest from the marker
                for b in batches:
                    pass  # drain iterator (input scan already paid)
                yield _manifest_batch(committed)
                return
        blocks, mrows = [], []
        plan_cache: dict = {}
        for block_id, batch in enumerate(batches):
            if batch.num_rows == 0:
                continue
            if schema is not None and batch.schema != schema:
                batch = pa.Table.from_batches([batch]).cast(schema).combine_chunks().to_batches()[0]
            block, rows = encode_batch(batch, pid, block_id, overrides, plan_cache)
            blocks.append(block)
            mrows.extend(rows)
        os.makedirs(M.blocks_dir(out_dir), exist_ok=True)
        table = pa.Table.from_pylist(blocks, schema=M.block_schema(schema))
        tmp = M.part_file(out_dir, pid) + ".tmp"
        # small row groups -> zone-map predicates prune at row-group grain;
        # no parquet-level recompression (blobs are already compressed)
        pq.write_table(table, tmp, compression="none", row_group_size=64)
        os.replace(tmp, M.part_file(out_dir, pid))
        M.write_done(out_dir, pid, mrows)
        yield _manifest_batch(mrows)

    return fn


def encode_table(df, out_dir: str, *, plan: str = "global",
                 sample: "pa.Table | None" = None,
                 codec_overrides: dict | None = None, resume: bool = True,
                 config_note: dict | None = None, n_parts: int | None = None):
    """Encode a (pre-partitioned) DataFrame. Returns the manifest as a
    lazy DataFrame over the landed manifest parquet.

    Callers should partition first (plans.partitioning.plan_webtext /
    plan_generic); this function does no shuffle of its own.

    plan="global" (default): one sampling job trains every shared artifact
    driver-side (FSST tables, global dictionaries) and fixes per-column
    codecs up front — executors only compress (SURVEY §3.1: the cluster
    analog of build-once-per-layer dictionaries, MvtEncoder.java:91). The
    plan + symbol tables are persisted to meta.json BEFORE the encode job,
    so a resumed run reuses the identical plan and mixed-run partitions
    stay mutually decodable. plan="block": per-partition auto-selection
    (no sampling job; each partition trains its own tables).

    ``sample``: pre-collected pa.Table to plan from (lets a pipeline share
    one sample between codec planning and skew detection, and lets callers
    sample the UNSHUFFLED input — sampling `df` itself would pay its
    shuffle twice, since recompiled DataFrame actions do not reuse
    exchanges across jobs).

    ``n_parts``: the planned partition count, recorded in meta.json. Pass
    it when known (the partition planners know it) — the fallback is the
    metadata-only ``estimate_width`` (input file count / default
    parallelism); the recorded value is audit metadata, so an estimate is
    acceptable where a plan->RDD conversion probe is not.
    """
    from pyspark.sql.pandas.types import to_arrow_schema

    from ..plans.codec_plan import (collect_sample, estimate_width,
                                    overrides_from_plan, plan_from_sample)

    os.makedirs(out_dir, exist_ok=True)
    overrides = dict(codec_overrides or {})
    symtabs: dict[int, list[bytes]] = {}
    plan_note: dict = {}
    schema = to_arrow_schema(df.schema)

    prior = None
    if resume:
        try:
            prior = M.read_meta(out_dir)
        except (FileNotFoundError, ValueError, KeyError):
            prior = None
    if prior is not None and prior[2].get("plan"):
        _, symtabs, cfg = prior
        plan_note = cfg["plan"]
        planned = overrides_from_plan(plan_note, symtabs)
        for col, ov in planned.items():
            overrides.setdefault(col, ov)
    elif plan == "global":
        if sample is None:
            sample = collect_sample(df)
        o2, symtabs, plan_note = plan_from_sample(sample, skip=set(overrides))
        overrides.update(o2)

    # caller-supplied global-codec overrides also need their symbols
    # persisted for decode — regardless of plan mode (a plan="block" table
    # whose blobs reference an unpersisted symtab_id would be undecodable)
    for col, (cname, params) in list(overrides.items()):
        if cname in ("dict_global", "fsst_global", "tok_dict") and isinstance(params, dict):
            sid = params.get("symtab_id")
            if sid is None:
                raise ValueError(
                    f"global codec override for column {col!r} needs a "
                    f"'symtab_id' param so its symbols can be persisted")
            if sid not in symtabs:
                symtabs[sid] = (params["symbols"] if cname == "dict_global"
                                else list(params["fsst_table"].symbols))

    M.write_meta(out_dir, schema, symtabs,
                 {"note": config_note or {}, "plan": plan_note,
                  "n_parts": n_parts if n_parts is not None
                             else estimate_width(df)})
    mdf = df.mapInArrow(make_encode_fn(out_dir, overrides, resume, schema),
                        M.manifest_spark_schema())
    # one action runs the whole job; the manifest lands from the EXECUTORS
    # (a parquet directory) — at the 400k partitions of docs/SCALE.md the
    # manifest is millions of rows, which must never route through a
    # driver collect, so the return value is a LAZY scan of the landed
    # parquet (aggregate it distributed; see decode.read_manifest /
    # meta_column_stats), never an in-memory table
    mpath = os.path.join(out_dir, "manifest.parquet")
    mdf.write.mode("overwrite").parquet(mpath)
    return df.sparkSession.read.parquet(mpath)


def encode_webtext(df, out_dir: str, n_parts: int, url_col: str = "url",
                   resume: bool = True, config_note: dict | None = None,
                   skip_if_empty: bool = False):
    """Full webtext pipeline: ONE sampling job on the unshuffled input
    drives both skew salting and codec planning, then one shuffle+encode
    job. This is the production entry point for the north-rule table.

    ``skip_if_empty``: return None without creating ``out_dir`` when the
    input has no rows. The check piggybacks on the sampling job this
    function already runs — only a 0-row sample (rare: empty input, or a
    pathological partitioning that leaves every sampled partition empty)
    pays one extra ``isEmpty`` probe. This is how the streaming sink skips
    empty micro-batches without a dedicated per-batch probe job.
    """
    from ..plans.codec_plan import (collect_sample, hot_keys_from_sample,
                                    plan_from_sample)
    from ..plans.partitioning import plan_webtext

    sample = collect_sample(df)
    if skip_if_empty and sample.num_rows == 0 and df.isEmpty():
        return None
    hot = hot_keys_from_sample(sample, url_col, n_parts)
    planned = plan_webtext(df, n_parts, url_col=url_col, hot_hosts=hot)
    return encode_table(planned, out_dir, sample=sample, resume=resume,
                        n_parts=n_parts,
                        config_note={**(config_note or {}),
                                     "hot_hosts": hot})
