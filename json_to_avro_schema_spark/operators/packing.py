"""Token-budget shard packing for training-data pipelines.

Assigns every document a global token offset (the running sum of token
counts in a deterministic document order) and a shard id
``floor(cum_tokens_before / budget)`` — the standard "pack docs into
fixed-token-budget shards" step before writing training data.

The naive formulation is a global window (``sum() OVER (ORDER BY ...)``)
whose Spark plan sorts the ENTIRE table into ONE partition — a
single-task bottleneck at any scale. This implementation is the
distributed prefix-sum shape instead:

1. range-repartition + sort by the order column (Spark's range
   partitioner assigns increasing key ranges to increasing partition
   ids, so partition order == global order),
2. per-partition token totals — one tiny row per partition — collected
   to the driver (bounded: O(#partitions), never O(rows)),
3. an exclusive prefix over those totals broadcast back as a join on
   partition id,
4. a *within-partition* running sum (window partitioned by partition id
   — every partition computes in parallel).

Global offset = partition offset + within-partition running sum. The
result is bit-identical to the single-partition window at any
parallelism, which is exactly what the DuckDB oracle checks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_PID = "__pack_pid"
_BEFORE = "__pack_before"


def packed_shards(
    df: DataFrame,
    token_col: str,
    order_col: str,
    budget: int,
    *,
    num_partitions: int | None = None,
) -> DataFrame:
    """Add ``cum_tokens_before`` (tokens in all earlier docs, by
    ``order_col``) and ``shard_id = floor(cum_tokens_before / budget)``.

    ``order_col`` must be a total order (unique values) — ties across a
    partition boundary would make the prefix sum ambiguous.
    """
    if budget <= 0:
        raise ValueError("budget must be > 0")
    for c in (_PID, _BEFORE):
        if c in df.columns:
            raise ValueError(f"input already has working column {c!r}")

    spark = df.sparkSession
    n_parts = num_partitions or spark.sparkContext.defaultParallelism
    part = (
        df.repartitionByRange(n_parts, F.col(order_col))
        .sortWithinPartitions(order_col)
        .withColumn(_PID, F.spark_partition_id())
    )
    # a narrow projection feeds both branches; one scan each (the per-pid
    # totals aggregate is one tiny shuffle of O(#partitions) rows)
    part = part.localCheckpoint(eager=False)

    totals = (
        part.groupBy(_PID)
        .agg(F.sum(token_col).alias("t"))
        .orderBy(_PID)
        .collect()
    )
    offsets, acc = {}, 0
    for row in totals:
        offsets[row[_PID]] = acc
        acc += row["t"] or 0
    offset_df = spark.createDataFrame(
        [(pid, off) for pid, off in offsets.items()],
        f"{_PID} int, {_BEFORE} long",
    )

    w = (
        Window.partitionBy(_PID)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    within = F.coalesce(F.sum(token_col).over(w), F.lit(0))
    return (
        part.join(F.broadcast(offset_df), _PID)
        .withColumn("cum_tokens_before", F.col(_BEFORE) + within)
        # integral `div`, not float floor(x/b): exact at any magnitude
        .withColumn("shard_id", F.expr(f"cum_tokens_before div {int(budget)}"))
        .drop(_PID, _BEFORE)
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
