"""Bucketed-table storage: co-located joins with NO shuffle of the fact side.

SURVEY.md §2.3 "Joins" names bucketing as the co-location primitive; this is
the storage-level counterpart of the runtime choices in
``operators/referential.py`` (broadcast / shuffle / AQE). At 10^12 documents
the recurring cost is not one join but the SAME join every run: corpus ×
fingerprint-index (incremental exact dedup), corpus × historical verdicts
(regression diffs), corpus × media-assets (span RI). Writing both sides
``bucketBy(N, key)`` once means every subsequent join is Exchange-free —
each task zips bucket i with bucket i, no network movement of the 100-TB
side, ever.

Spark specifics encoded here:

* ``bucketBy`` requires ``saveAsTable`` (the bucket spec lives in the
  catalog, not the parquet footer). An explicit ``option("path", ...)``
  makes the table EXTERNAL so the data lives where the caller says and
  survives catalog loss; re-registering is one ``saveAsTable`` away.
* Both sides must agree on bucket COUNT and bucket KEY for the exchange to
  be elided; ``sortBy`` additionally elides the per-task sort of a
  sort-merge join.
* The reader just uses ``spark.table`` — Catalyst reads the bucket spec
  and plans ``FileScan ... Bucketed: true``; no hints needed.

Reference analog: none (the reference is single-process); this implements
the SURVEY §2.3 join-strategy row "repartition()/bucketing for co-located
joins".
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    bucket_cols: Sequence[str],
    *,
    n_buckets: int = 64,
    sort_cols: Optional[Sequence[str]] = None,
    mode: str = "overwrite",
) -> None:
    """Materialize ``df`` as an external bucketed (and optionally
    bucket-sorted) table. ``n_buckets`` should be sized so one bucket of the
    BIG side fits an executor core's working memory at the target scale —
    for 10^12 docs that is tens of thousands of buckets, not 64; the default
    suits the sandbox scale factors."""
    writer = (
        df.write.mode(mode)
        .format("parquet")
        .option("path", path)
        .bucketBy(n_buckets, *bucket_cols)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def co_located_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: Sequence[str],
    how: str = "inner",
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key. With matching
    bucket specs Catalyst plans this with ZERO Exchange operators — pinned
    by ``tests/test_bucketed.py`` via the physical plan string."""
    return spark.table(left_table).join(spark.table(right_table), list(on), how)


def dedup_exact_colocated(
    spark: SparkSession,
    corpus_table: str,
    index_table: str,
    fingerprint_col: str = "fingerprint",
) -> DataFrame:
    """Incremental exact dedup against a bucketed fingerprint index with no
    shuffle of the corpus: rows of ``corpus_table`` whose fingerprint is NOT
    in ``index_table`` (the new-content set). Both tables must be bucketed
    on ``fingerprint_col`` with the same bucket count — then the anti-join
    is bucket-local."""
    corpus = spark.table(corpus_table)
    index = spark.table(index_table).select(fingerprint_col)
    return corpus.join(index, [fingerprint_col], "left_anti")
