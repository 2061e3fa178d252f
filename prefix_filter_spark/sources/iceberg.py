"""Iceberg source adapter (north rule: 'Iceberg tables of pre-tokenized
training sequences').

The Iceberg runtime jars are not in this image (pyspark_guide.md
'Sources & sinks'), so this adapter degrades explicitly:

- an Iceberg catalog identifier (``catalog.db.table``) is read via
  ``spark.read.table`` when the session has an Iceberg catalog
  configured (cluster deployments: add
  ``--packages org.apache.iceberg:iceberg-spark-runtime-*`` and the
  catalog confs shown in ``iceberg_session_conf``);
- a filesystem path falls back to plain parquet — same DataFrame
  contract downstream, so every operator in this library is
  source-agnostic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def iceberg_session_conf(catalog: str = "pfs", warehouse: str = "/tmp/pfs-warehouse") -> dict[str, str]:
    """The spark-submit confs a cluster deployment needs (documented,
    not applied here — the jars are absent in this sandbox)."""
    return {
        f"spark.sql.catalog.{catalog}": "org.apache.iceberg.spark.SparkCatalog",
        f"spark.sql.catalog.{catalog}.type": "hadoop",
        f"spark.sql.catalog.{catalog}.warehouse": warehouse,
    }


def has_iceberg(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName("org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:  # noqa: BLE001
        return False


def read_sequences(spark: SparkSession, source: str) -> DataFrame:
    """Read the tokenized-sequence table from an Iceberg identifier or a
    parquet path; raise a clear error when Iceberg is requested but the
    runtime is absent."""
    looks_like_path = "/" in source or source.endswith(".parquet")
    if looks_like_path:
        return spark.read.parquet(source)
    if not has_iceberg(spark):
        raise RuntimeError(
            f"'{source}' looks like an Iceberg identifier but the Iceberg "
            "runtime is not on the classpath. Submit with --packages "
            "org.apache.iceberg:iceberg-spark-runtime-<ver> and session conf "
            f"{iceberg_session_conf()} — or pass a parquet path."
        )
    return spark.read.table(source)
