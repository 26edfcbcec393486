"""Parquet table loaders for the driver-provided oracle tables
(TESTDATA.md: region nation customer supplier part orders lineitem events
documents embeddings at /root/testdata/sf*/).

Iceberg note: on a real cluster these loads become
``spark.read.format('iceberg').load(table)`` — jars aren't in this image, so
the engine reads parquet behind the same call shape (see module
``sources.iceberg``); partition-predicate pushdown applies to both.
"""

from __future__ import annotations

import os
from typing import Dict

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_tables(spark: SparkSession, sf_dir: str) -> Dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}
