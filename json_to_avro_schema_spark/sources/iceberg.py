"""Iceberg table access, gated behind an import/availability check.

The north rule targets Iceberg tables; this container has no Iceberg runtime
jars, so the engine exposes one call shape for both backends:

    read_table(spark, "db.documents")        # iceberg when available
    read_table(spark, "/path/dir.parquet")   # parquet fallback

On a real cluster, ship with::

    spark-submit --packages org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:<ver> \
        --conf spark.sql.catalog.eng=org.apache.iceberg.spark.SparkCatalog ...

Partition metadata (for per-partition verdicts + resume) comes from the
``<table>.partitions`` metadata table on Iceberg; the parquet fallback
derives it from a column (e.g. ``part_key``) via ``distinct`` — same
downstream interface.
"""

from __future__ import annotations

from typing import List, Optional

from pyspark.sql import DataFrame, SparkSession


def iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(  # type: ignore[union-attr]
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:
        return False


def read_table(spark: SparkSession, table_or_path: str) -> DataFrame:
    if "/" in table_or_path or table_or_path.endswith(".parquet"):
        return spark.read.parquet(table_or_path)
    if not iceberg_available(spark):
        raise RuntimeError(
            "Iceberg runtime not on the classpath; pass a parquet path or add "
            "iceberg-spark-runtime via --packages"
        )
    return spark.read.format("iceberg").load(table_or_path)


def partition_keys(
    spark: SparkSession,
    df: DataFrame,
    *,
    table: Optional[str] = None,
    part_key_col: str = "part_key",
) -> List[str]:
    """Enumerate partitions: Iceberg metadata table when available (no data
    scan), else distinct over the partition column (one column-pruned scan)."""
    if table is not None and iceberg_available(spark):
        rows = spark.read.format("iceberg").load(f"{table}.partitions").collect()
        return [str(r["partition"][part_key_col]) for r in rows]
    return [r[part_key_col] for r in df.select(part_key_col).distinct().collect()]
