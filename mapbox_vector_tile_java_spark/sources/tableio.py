"""TableIO seam: the engine's source-scan/sink boundary (SURVEY §2.D B1/B2).

The codec engine consumes and produces *tables*; everything else (blocks,
manifests, symbol tables) is its own storage format. This seam pins the
table boundary to one small interface so the scan/sink technology is a
drop-in swap:

- ``ParquetTableIO`` — plain parquet directories (always available; what
  the sandbox runs).
- ``IcebergTableIO`` — catalog-qualified Iceberg tables via the standard
  ``iceberg-spark-runtime`` jar (``spark.read.format("iceberg")`` /
  ``DataFrameWriterV2.writeTo``). Constructing it verifies the runtime jar
  is actually on the classpath and raises ``IcebergUnavailable`` otherwise,
  so misconfiguration fails loudly at setup, not mid-job.

``resolve_table_io`` picks by URI scheme: ``iceberg:catalog.db.tbl`` vs
``parquet:/path`` (or a bare path). Reference analogs: the file/stream scan
``MvtReader.java:99-147`` and byte sink ``MvtEncoder.java:40-72``.

Why this shape scales: both backends return a lazy DataFrame, so Catalyst
pushdown (column pruning, predicate pushdown, Iceberg partition/metadata
pruning) applies identically — the engine never materializes a table at
this boundary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


class IcebergUnavailable(RuntimeError):
    pass


class TableIO:
    """Read/write whole tables by name. Implementations must be lazy on
    read (return an unevaluated DataFrame) and atomic-per-commit on write."""

    def read(self, spark: SparkSession, table: str) -> DataFrame:
        raise NotImplementedError

    def write(self, df: DataFrame, table: str, mode: str = "append") -> None:
        raise NotImplementedError


class ParquetTableIO(TableIO):
    """Tables are parquet directories; ``table`` is a filesystem path."""

    def read(self, spark: SparkSession, table: str) -> DataFrame:
        return spark.read.parquet(table)

    def write(self, df: DataFrame, table: str, mode: str = "append") -> None:
        df.write.mode(mode).parquet(table)


def iceberg_available(spark: SparkSession) -> bool:
    """True iff the iceberg-spark runtime jar is on the JVM classpath."""
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.source.IcebergSource")
        return True
    except Exception:
        return False


class IcebergTableIO(TableIO):
    """Tables are catalog-qualified Iceberg identifiers (``cat.db.tbl``).

    The catalog itself is configured the standard way
    (``spark.sql.catalog.<name>`` = org.apache.iceberg.spark.SparkCatalog +
    warehouse path) — see ``configure_local_catalog`` for a hadoop-catalog
    convenience used by tests.
    """

    def __init__(self, spark: SparkSession):
        if not iceberg_available(spark):
            raise IcebergUnavailable(
                "iceberg-spark-runtime jar not on the classpath; use "
                "ParquetTableIO or add the jar via spark.jars.packages")

    def read(self, spark: SparkSession, table: str) -> DataFrame:
        return spark.read.format("iceberg").load(table)

    def write(self, df: DataFrame, table: str, mode: str = "append") -> None:
        if mode == "overwrite":
            df.writeTo(table).createOrReplace()
        elif mode == "append":
            df.writeTo(table).append()
        else:
            raise ValueError(f"unsupported write mode {mode!r}")


def configure_local_catalog(builder, name: str, warehouse: str):
    """SparkSession.Builder config for a local hadoop-backed Iceberg
    catalog (test convenience; production points at a real catalog)."""
    return (builder
            .config(f"spark.sql.catalog.{name}",
                    "org.apache.iceberg.spark.SparkCatalog")
            .config(f"spark.sql.catalog.{name}.type", "hadoop")
            .config(f"spark.sql.catalog.{name}.warehouse", warehouse))


def resolve_table_io(spark: SparkSession, uri: str) -> tuple[TableIO, str]:
    """(io, table_name) from a scheme-prefixed uri; bare paths -> parquet."""
    if uri.startswith("iceberg:"):
        return IcebergTableIO(spark), uri[len("iceberg:"):]
    if uri.startswith("parquet:"):
        return ParquetTableIO(), uri[len("parquet:"):]
    return ParquetTableIO(), uri
