"""Token-budget shard packing + data-mixture selection.

Both operators need a *global running sum* of token counts in a
deterministic document order (optionally per group). The naive
formulation is ``sum() OVER (ORDER BY ...)`` — a window whose Spark plan
sorts the ENTIRE table into ONE partition, a single-task bottleneck at
any scale. :func:`cumulative_tokens` is the distributed prefix-sum shape
instead:

1. range-repartition + sort by (group, order) — Spark's range
   partitioner assigns increasing key ranges to increasing partition
   ids, so partition order == global order,
2. per-(partition, group) token totals — tiny, O(#partitions × #groups
   present per partition) rows — collected to the driver (never O(rows)),
3. an exclusive prefix per group over those totals, broadcast back as a
   join on (partition id, group),
4. a *within-partition* running sum (window partitioned by partition id
   and group — every partition computes in parallel).

Global offset = partition/group offset + within-partition running sum;
bit-identical to the single-partition window at any parallelism, which
is exactly what the DuckDB oracles check.

On top of it:

* :func:`packed_shards` — ``shard_id = cum_tokens_before div budget``,
  the "pack docs into fixed-token-budget training shards" step.
* :func:`select_mixture` — per-group token targets (e.g. from mixture
  weights × total budget): keep every doc that STARTS before its
  group's target, the deterministic "data mixture" curation step. The
  last kept doc may overshoot its target by less than its own length.
"""

from __future__ import annotations

from typing import Dict, Mapping, Optional

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_PID = "__pack_pid"
_BEFORE = "__pack_before"


def cumulative_tokens(
    df: DataFrame,
    token_col: str,
    order_col: str,
    *,
    by: Optional[str] = None,
    num_partitions: Optional[int] = None,
) -> DataFrame:
    """Add ``cum_tokens_before``: the sum of ``token_col`` over all rows
    earlier in ``order_col`` order (within ``by`` when given, else
    globally). ``order_col`` must be a total order (unique values) —
    ties across a partition boundary would make the prefix ambiguous.
    Rows with a NULL ``by`` value are dropped (the offset join is an
    equi-join); filter or fill nulls first."""
    for c in (_PID, _BEFORE):
        if c in df.columns:
            raise ValueError(f"input already has working column {c!r}")

    spark = df.sparkSession
    n_parts = num_partitions or spark.sparkContext.defaultParallelism
    range_keys = ([F.col(by)] if by else []) + [F.col(order_col)]
    sort_keys = ([by] if by else []) + [order_col]
    part = (
        df.repartitionByRange(n_parts, *range_keys)
        .sortWithinPartitions(*sort_keys)
        .withColumn(_PID, F.spark_partition_id())
    )
    # one materialization feeds both the totals aggregate and the final
    # window (otherwise each branch would recompute the upstream scan)
    part = part.localCheckpoint(eager=False)

    group_cols = [_PID] + ([by] if by else [])
    totals = (
        part.groupBy(*group_cols)
        .agg(F.sum(token_col).alias("t"))
        .orderBy(*group_cols)
        .collect()
    )
    acc: Dict[object, int] = {}
    rows = []
    for row in totals:  # ordered by (pid) within each group's pid sequence
        g = row[by] if by else None
        rows.append((row[_PID], g, acc.get(g, 0)))
        acc[g] = acc.get(g, 0) + (row["t"] or 0)
    if by:
        by_type = dict(df.dtypes)[by]
        offset_df = spark.createDataFrame(
            rows, f"{_PID} int, {by} {by_type}, {_BEFORE} long"
        )
        join_on = [_PID, by]
    else:
        offset_df = spark.createDataFrame(
            [(pid, off) for pid, _, off in rows], f"{_PID} int, {_BEFORE} long"
        )
        join_on = [_PID]

    w = (
        Window.partitionBy(*group_cols)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    within = F.coalesce(F.sum(token_col).over(w), F.lit(0))
    return (
        part.join(F.broadcast(offset_df), join_on)
        .withColumn("cum_tokens_before", F.col(_BEFORE) + within)
        .drop(_PID, _BEFORE)
    )


def packed_shards(
    df: DataFrame,
    token_col: str,
    order_col: str,
    budget: int,
    *,
    num_partitions: Optional[int] = None,
) -> DataFrame:
    """Add ``cum_tokens_before`` and ``shard_id = cum_tokens_before div
    budget`` (integral ``div``, not float floor — exact at any magnitude)."""
    if budget <= 0:
        raise ValueError("budget must be > 0")
    cum = cumulative_tokens(
        df, token_col, order_col, num_partitions=num_partitions
    )
    return cum.withColumn(
        "shard_id", F.expr(f"cum_tokens_before div {int(budget)}")
    )


def shard_manifest(
    df: DataFrame, token_col: str, order_col: str, budget: int
) -> DataFrame:
    """Per-shard manifest: doc count, token total, and the [min, max]
    order-key span — what a downstream writer consumes to emit one
    training file per shard."""
    packed = packed_shards(df, token_col, order_col, budget)
    return (
        packed.groupBy("shard_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(token_col).alias("sum_tokens"),
            F.min(order_col).alias("first_key"),
            F.max(order_col).alias("last_key"),
        )
        .orderBy("shard_id")
    )


def select_mixture(
    df: DataFrame,
    token_col: str,
    order_col: str,
    by: str,
    targets: Mapping[object, int],
    *,
    num_partitions: Optional[int] = None,
) -> DataFrame:
    """Deterministic data-mixture selection: keep every row whose group
    prefix (``cum_tokens_before`` within ``by``, ordered by ``order_col``)
    is below that group's token target. Groups absent from ``targets``
    contribute nothing. The kept set is take-while-shaped: the last kept
    doc of a group may overshoot its target by < its own token count."""
    if any(t < 0 for t in targets.values()):
        raise ValueError("targets must be >= 0")
    cum = cumulative_tokens(
        df, token_col, order_col, by=by, num_partitions=num_partitions
    )
    spark = df.sparkSession
    by_type = dict(df.dtypes)[by]
    target_df = F.broadcast(
        spark.createDataFrame(
            list(targets.items()), f"{by} {by_type}, __target long"
        )
    )
    return (
        cum.join(target_df, by)
        .filter(F.col("cum_tokens_before") < F.col("__target"))
        .drop("__target")
    )
