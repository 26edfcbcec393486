"""Uniqueness checks at scale (SURVEY.md §2.3).

Two paths, both from the north rule:

* **approximate** — ``approx_count_distinct`` (HyperLogLog++) vs ``count``:
  a cheap single-scan signal that duplicates exist, with HLL's ~2% error.
* **exact violation rows** — salted two-phase aggregation: partial count by
  ``(key, salt)`` absorbs hot-key skew (hot doc_id prefixes) into S× more
  reducers, final sum by ``key``, then ``filter(total > 1)``.  A left-semi
  join recovers the full duplicate rows when needed.

At 10^12 rows the two-phase shape matters: a single groupBy(doc_id) would
put every occurrence of a hot key on one reducer; the salt spreads partials
first, and AQE coalesces the (much smaller) final stage.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def approx_uniqueness(
    df: DataFrame, columns: Sequence[str], *, rsd: float = 0.01
) -> DataFrame:
    """One row: n_rows, approx_distinct, approx_duplicates (>0 ⇒ dups likely).

    ``rsd`` is HLL++'s relative standard deviation; 0.01 (vs Spark's 0.05
    default) keeps the sketch a few hundred KiB while making the estimate
    reliably within ~1% — cheap insurance when the verdict is a threshold.
    """
    key = F.concat_ws("\x1f", *[F.col(c).cast("string") for c in columns])
    return df.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.approx_count_distinct(key, rsd).alias("approx_distinct"),
    ).select(
        "n_rows",
        "approx_distinct",
        (F.col("n_rows") - F.col("approx_distinct")).alias("approx_duplicates"),
    )


def duplicate_keys(
    df: DataFrame, columns: Sequence[str], *, salt_buckets: int = 16
) -> DataFrame:
    """Exact duplicate keys via salted two-phase aggregation.

    Output: key columns + ``dup_count`` (total occurrences, always ≥ 2).

    The salt is derived from the key columns plus the physical partition id
    — deterministic (no ``monotonically_increasing_id`` / RNG), so a
    partial-stage retry re-produces identical partials, and a hot key's
    occurrences still split across partitions (each partition's copy of the
    key lands in ONE salt bucket, different partitions in different
    buckets — the skew absorption the salt exists for). Counts are exact
    regardless: phase 2 re-sums per key.
    """
    cols = list(columns)
    salt = F.pmod(
        F.xxhash64(*cols, F.spark_partition_id()), F.lit(salt_buckets)
    )
    partial = (
        df.select(*cols)
        .withColumn("__salt", salt)
        .groupBy(*cols, "__salt")
        .agg(F.count(F.lit(1)).alias("__partial"))
    )
    total = (
        partial.groupBy(*cols)
        .agg(F.sum("__partial").alias("dup_count"))
        .filter(F.col("dup_count") > 1)
    )
    return total


def duplicate_rows(
    df: DataFrame, columns: Sequence[str], *, salt_buckets: int = 16
) -> DataFrame:
    """Full rows participating in a duplicate key (left-semi join against the
    exact duplicate key set — semi keeps the probe side's bytes untouched)."""
    dups = duplicate_keys(df, columns, salt_buckets=salt_buckets)
    return df.join(dups.select(*columns), list(columns), "left_semi")


def uniqueness_verdict(
    df: DataFrame, columns: Sequence[str], *, by: str | None = None
) -> DataFrame:
    """Per-partition uniqueness verdict: (part_key, n_rows, n_distinct,
    n_dup_rows, pass). Exact, two-phase (count_distinct is itself a partial
    agg under the hood)."""
    key_cols = [by] if by else []
    key = F.concat_ws("\x1f", *[F.col(c).cast("string") for c in columns])
    grouped = (
        df.select(*key_cols, key.alias("__k"))
        .groupBy(*key_cols, "__k")
        .agg(F.count(F.lit(1)).alias("__c"))
    )
    agg_key = [F.col(c) for c in key_cols] if key_cols else [F.lit("__all__").alias("part_key")]
    out = grouped.groupBy(*agg_key).agg(
        F.sum("__c").alias("n_rows"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.sum(F.when(F.col("__c") > 1, F.col("__c")).otherwise(0)).alias("n_dup_rows"),
    )
    return out.withColumn("pass", F.col("n_dup_rows") == 0)
