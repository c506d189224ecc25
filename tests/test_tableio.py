"""TableIO seam tests: the parquet backend end-to-end, the Iceberg backend
behind its availability gate (this sandbox has no iceberg runtime jar, so
the constructor must fail loudly; the round-trip test auto-activates when
the jar is present)."""

from __future__ import annotations

import pytest

from mapbox_vector_tile_java_spark.operators.decode import decode_table
from mapbox_vector_tile_java_spark.operators.encode import encode_webtext
from mapbox_vector_tile_java_spark.operators.verify import verify_roundtrip
from mapbox_vector_tile_java_spark.sources.tableio import (
    IcebergTableIO,
    IcebergUnavailable,
    ParquetTableIO,
    iceberg_available,
    resolve_table_io,
)
from mapbox_vector_tile_java_spark.sources.webtext import webtext_df


def test_resolve_schemes(spark):
    io, name = resolve_table_io(spark, "parquet:/x/y")
    assert isinstance(io, ParquetTableIO) and name == "/x/y"
    io, name = resolve_table_io(spark, "/bare/path")
    assert isinstance(io, ParquetTableIO) and name == "/bare/path"


def test_parquet_tableio_scan_sink_roundtrip(spark, tmp_path):
    src = webtext_df(spark, 300, seed=7, partitions=3)
    io = ParquetTableIO()
    io.write(src, str(tmp_path / "t"), mode="overwrite")
    back = io.read(spark, str(tmp_path / "t"))
    verify_roundtrip(src, back)


def test_encode_through_tableio_seam(spark, tmp_path):
    """Source scan via the seam -> codec engine -> decode == source."""
    src = webtext_df(spark, 400, seed=11, partitions=2)
    io, name = resolve_table_io(spark, str(tmp_path / "src"))
    io.write(src, name, mode="overwrite")
    scanned = io.read(spark, name)
    encode_webtext(scanned, str(tmp_path / "enc"), n_parts=2)
    dec = decode_table(spark, str(tmp_path / "enc"))
    verify_roundtrip(src, dec)


def test_iceberg_gate(spark):
    if iceberg_available(spark):
        pytest.skip("iceberg jar present; covered by test_iceberg_roundtrip")
    with pytest.raises(IcebergUnavailable):
        IcebergTableIO(spark)
    with pytest.raises(IcebergUnavailable):
        resolve_table_io(spark, "iceberg:cat.db.t")


def test_iceberg_roundtrip(spark, tmp_path):
    """Full Iceberg scan/sink round-trip — runs only when the runtime jar
    is on the classpath (e.g. spark.jars.packages=org.apache.iceberg:...)."""
    if not iceberg_available(spark):
        pytest.skip("iceberg-spark-runtime jar not available in this environment")
    # catalogs resolve lazily, so a runtime conf on the existing session is
    # enough — no new SparkSession needed
    spark.conf.set("spark.sql.catalog.local",
                   "org.apache.iceberg.spark.SparkCatalog")
    spark.conf.set("spark.sql.catalog.local.type", "hadoop")
    spark.conf.set("spark.sql.catalog.local.warehouse", str(tmp_path / "wh"))
    io = IcebergTableIO(spark)
    src = webtext_df(spark, 100, seed=3, partitions=2)
    io.write(src, "local.db.webtext", mode="overwrite")
    verify_roundtrip(src, io.read(spark, "local.db.webtext"))
