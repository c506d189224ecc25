"""Profile the webtext encode pipeline stage-by-stage at sf0.1.

Decomposes webtext_encode wall into:
  sample      - the one planning/sampling job (collect_sample)
  shuffle     - JVM-only scan+repartition+sort (noop sink)
  drain       - shuffle + JVM->Py Arrow transfer, kernel skipped
  kernels     - shuffle + transfer + encode kernels, NO disk writes
  full        - encode_webtext (everything incl. block writes + manifest)
  staged_w    - shuffle lands as parquet staging (JVM writer, no Python)
  staged_enc  - python tasks pyarrow-read their staged file and encode

Run: python scripts/profile_encode.py [n_rows]
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mapbox_vector_tile_java_spark.session import apply_malloc_env

apply_malloc_env()

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
REPEATS = int(os.environ.get("PROFILE_REPEATS", "3"))


def main():
    import pyarrow as pa
    from pyspark.sql import functions as F

    from mapbox_vector_tile_java_spark.operators.encode import (
        encode_batch, encode_webtext)
    from mapbox_vector_tile_java_spark.plans.codec_plan import (
        collect_sample, hot_keys_from_sample, overrides_from_plan,
        plan_from_sample)
    from mapbox_vector_tile_java_spark.plans.partitioning import plan_webtext
    from mapbox_vector_tile_java_spark.session import get_spark
    from mapbox_vector_tile_java_spark.sources.webtext import webtext_df

    spark = get_spark("profile-encode", cores=CPUS, shuffle_partitions=CPUS)
    work = tempfile.mkdtemp(prefix="mvt_prof_")
    res: dict[str, list[float]] = {}

    def timed(name, fn):
        t0 = time.time()
        out = fn()
        res.setdefault(name, []).append(round(time.time() - t0, 3))
        return out

    # warm python workers
    webtext_df(spark, CPUS * 64, seed=1, partitions=CPUS).count()
    encode_webtext(webtext_df(spark, CPUS * 96, seed=1, partitions=CPUS),
                   f"{work}/warm", n_parts=CPUS)

    src = webtext_df(spark, N, seed=42, partitions=CPUS)
    src.write.mode("overwrite").parquet(f"{work}/src_plain")
    base = spark.read.parquet(f"{work}/src_plain")

    sample = collect_sample(base)
    hot = hot_keys_from_sample(sample, "url", CPUS)
    overrides, symtabs, _ = plan_from_sample(sample)

    arrow_schema = None

    def identity_fn(batches):
        for b in batches:
            yield b

    def drain_fn(batches):
        n = 0
        for b in batches:
            n += b.num_rows
        yield pa.RecordBatch.from_pylist([{"n": n}],
                                         schema=pa.schema([("n", pa.int64())]))

    def make_kernel_fn(ov):
        def fn(batches):
            from pyspark import TaskContext
            from mapbox_vector_tile_java_spark.codecs.gather import warm_heap
            warm_heap()
            pid = TaskContext.get().partitionId()
            plan_cache: dict = {}
            total = 0
            for i, b in enumerate(batches):
                if b.num_rows == 0:
                    continue
                _, rows = encode_batch(b, pid, i, ov, plan_cache)
                total += sum(r["enc_bytes"] for r in rows)
            yield pa.RecordBatch.from_pylist(
                [{"n": total}], schema=pa.schema([("n", pa.int64())]))
        return fn

    n_enc = [0]
    for _ in range(REPEATS):
        timed("sample", lambda: collect_sample(base))
        timed("shuffle", lambda: plan_webtext(base, CPUS, hot_hosts=hot)
              .write.format("noop").mode("overwrite").save())
        timed("drain", lambda: plan_webtext(base, CPUS, hot_hosts=hot)
              .mapInArrow(drain_fn, "n long")
              .write.format("noop").mode("overwrite").save())
        timed("identity", lambda: plan_webtext(base, CPUS, hot_hosts=hot)
              .mapInArrow(identity_fn, base.schema)
              .write.format("noop").mode("overwrite").save())
        timed("kernels", lambda: plan_webtext(base, CPUS, hot_hosts=hot)
              .mapInArrow(make_kernel_fn(overrides), "n long")
              .write.format("noop").mode("overwrite").save())

        def _full():
            n_enc[0] += 1
            encode_webtext(base, f"{work}/enc_{n_enc[0]}", n_parts=CPUS)
        timed("full", _full)

        # staged alternative
        def _staged_write():
            plan_webtext(base, CPUS, hot_hosts=hot).write \
                .mode("overwrite").option("compression", "snappy") \
                .parquet(f"{work}/staged")
        timed("staged_w", _staged_write)

        files = sorted(f"{work}/staged/{f}" for f in os.listdir(f"{work}/staged")
                       if f.endswith(".parquet"))

        def make_staged_fn(ov):
            def fn(batches):
                import pyarrow.parquet as pq
                from pyspark import TaskContext
                from mapbox_vector_tile_java_spark.codecs.gather import warm_heap
                warm_heap()
                pid = TaskContext.get().partitionId()
                total = 0
                for b in batches:
                    for path in b.column("path").to_pylist():
                        plan_cache: dict = {}
                        pf = pq.ParquetFile(path)
                        for i, rb in enumerate(pf.iter_batches(65536)):
                            _, rows = encode_batch(rb, pid, i, ov, plan_cache)
                            total += sum(r["enc_bytes"] for r in rows)
                yield pa.RecordBatch.from_pylist(
                    [{"n": total}], schema=pa.schema([("n", pa.int64())]))
            return fn

        def _staged_enc():
            fdf = spark.createDataFrame([(p,) for p in files], "path string") \
                .repartition(len(files))
            fdf.mapInArrow(make_staged_fn(overrides), "n long") \
                .write.format("noop").mode("overwrite").save()
        timed("staged_enc", _staged_enc)

    out = {k: {"runs": v, "min": min(v)} for k, v in res.items()}
    out["n_rows"] = N
    out["cpus"] = CPUS
    print(json.dumps(out, indent=1))
    shutil.rmtree(work, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
