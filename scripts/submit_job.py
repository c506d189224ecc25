"""spark-submit entry point: encode -> verify -> report, per the north rule
("run via spark-submit --py-files on a multi-executor cluster").

Usage (see scripts/run_spark_submit.sh):

    spark-submit --master local[8] --py-files /tmp/mvt_spark_pkg.zip \
        scripts/submit_job.py --rows 50000 --out /tmp/mvt_job_out

The package zip makes the job self-contained on executors, exactly as it
would ship to a real cluster; no repo checkout is needed on workers.
"""

from __future__ import annotations

import argparse
import json
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=50_000)
    ap.add_argument("--parts", type=int, default=32)
    ap.add_argument("--out", required=True)
    ap.add_argument("--seed", type=int, default=42)
    args = ap.parse_args()

    from pyspark.sql import SparkSession, functions as F

    from mapbox_vector_tile_java_spark.operators.decode import (
        decode_table, read_manifest)
    from mapbox_vector_tile_java_spark.operators.encode import encode_webtext
    from mapbox_vector_tile_java_spark.operators.verify import verify_roundtrip
    from mapbox_vector_tile_java_spark.sources.webtext import webtext_df

    spark = SparkSession.builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    src = webtext_df(spark, args.rows, seed=args.seed, partitions=args.parts)
    src.write.mode("overwrite").parquet(f"{args.out}/src")
    base = spark.read.parquet(f"{args.out}/src")

    t0 = time.time()
    encode_webtext(base, f"{args.out}/encoded", n_parts=args.parts)
    wall = time.time() - t0

    decoded = decode_table(spark, f"{args.out}/encoded")
    report = verify_roundtrip(base, decoded)
    m = read_manifest(spark, f"{args.out}/encoded").agg(
        F.sum("raw_bytes").alias("r"), F.sum("enc_bytes").alias("e")).first()
    print("JOB_RESULT " + json.dumps({
        "rows": args.rows, "encode_wall_s": round(wall, 2),
        "raw_bytes": int(m["r"]), "enc_bytes": int(m["e"]),
        "ratio": round(m["r"] / m["e"], 3), "verify": report,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
