"""Skew-proof grouped top-K: salted two-phase window.

``Window.partitionBy(group).orderBy(v) + row_number <= k`` funnels EVERY
row of a group through one task — with low-cardinality groups (3 return
flags, a handful of event types) the whole table sorts on |groups| cores
no matter how large the cluster. The fix is the same two-phase shape the
engine uses for salted uniqueness (operators/uniqueness.py):

  phase 1  window over (group, salt) — |groups| × |salts| concurrent
           sorts of N/(G·S) rows each; keep each bucket's local top-K
  phase 2  exact window over the surviving |groups| × |salts| × K rows

Exactness: a row in the global top-K of its group is necessarily in the
top-K of its salt bucket (the bucket holds a subset of competitors), so
phase 1 never drops a winner. Phase 2's input is bounded by G·S·K rows —
independent of N — so the final single-task-per-group sort is trivial.

The salt is a deterministic hash of the row's tie-break columns (not a
random number): results are reproducible across runs, retries, and
repartitioning.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def grouped_topk(
    df: DataFrame,
    group_cols: Sequence[str],
    order_by: Sequence[Column],
    tiebreak_cols: Sequence[str],
    k: int,
    *,
    num_salts: Optional[int] = None,
    rank_col: str = "rk",
) -> DataFrame:
    """Top-``k`` rows per group under ``order_by``, exact and skew-proof.

    ``order_by`` must be a total order (include the tie-break columns) so
    ranks are deterministic; ``tiebreak_cols`` also feed the salt hash.
    Returns ``df``'s columns plus ``rank_col`` (1-based within group).
    """
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    clash = {"__salt", "__lrk", rank_col} & set(df.columns)
    if clash:
        raise ValueError(
            f"grouped_topk working/output columns {sorted(clash)} already "
            f"exist on the input — rename them or pass a different rank_col"
        )
    spark = df.sparkSession
    s = num_salts or spark.sparkContext.defaultParallelism
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in tiebreak_cols]), F.lit(s))

    w_local = Window.partitionBy(*group_cols, "__salt").orderBy(*order_by)
    w_final = Window.partitionBy(*group_cols).orderBy(*order_by)
    return (
        df.withColumn("__salt", salt)
        .withColumn("__lrk", F.row_number().over(w_local))
        .filter(F.col("__lrk") <= k)
        .drop("__salt", "__lrk")
        .withColumn(rank_col, F.row_number().over(w_final))
        .filter(F.col(rank_col) <= k)
    )
