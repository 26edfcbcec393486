"""Token-budget shard packing + data-mixture selection.

Both operators need a *global running sum* of token counts in a
deterministic document order (optionally per group). The naive
formulation is ``sum() OVER (ORDER BY ...)`` — a window whose Spark plan
sorts the ENTIRE table into ONE partition, a single-task bottleneck at
any scale. :func:`cumulative_tokens` is the distributed prefix-sum shape
instead:

1. derive P-1 approximate-quantile bounds of the order column (one
   narrow aggregate; at 100 TB this scan is column-pruned to one
   column), making ``pid(row) = #bounds <= order`` a deterministic,
   retry-safe function of the row VALUE — no sampling-based range
   partitioner, no checkpoint pinning,
2. per-(pid, group) token totals — tiny, O(P × #groups present) rows —
   collected to the driver (never O(rows)),
3. an exclusive prefix per group over those totals in pid order
   (bounds are monotonic in the order column, so ascending pid ==
   ascending order), broadcast back as a join on (pid, group),
4. a *within-pid* running sum — a window partitioned by (pid, group)
   whose own shuffle is the ONLY wide exchange; every pid bucket
   computes in parallel.

Non-numeric order columns fall back to ``repartitionByRange`` +
``spark_partition_id`` with a ``localCheckpoint`` to freeze the sampled
partitioning between the totals and window branches.

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

import logging
import math
from typing import Dict, Mapping, Optional

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_LOG = logging.getLogger(__name__)

_PID = "__pack_pid"
_BEFORE = "__pack_before"

# Upper bound on pid buckets, independent of cluster parallelism. The P-1
# quantile bounds are embedded in the plan as literals (a multi-MB plan at
# uncapped 10^5-core defaults); correctness only needs enough buckets to
# parallelize the within-pid window. Per-row assignment cost is kept flat
# by the two-level scan in _pid_from_bounds (O(2*sqrt(P)) comparisons).
_MAX_PID_BUCKETS = 4096

# bound count above which _pid_from_bounds switches to the sqrt-blocked
# two-level scan (below it the flat literal-array filter is cheaper)
_TWO_LEVEL_MIN = 128


def _order_bounds(
    df: DataFrame, order_col: str, n_parts: int
) -> Optional[list]:
    """P-1 approximate-quantile bounds of a NUMERIC order column (None
    for non-numeric types — callers fall back to range partitioning).
    One narrow aggregate job; the result is embedded as literals so every
    later branch assigns identical pids, retry- and AQE-proof."""
    from pyspark.sql.types import NumericType

    if not isinstance(df.schema[order_col].dataType, NumericType):
        return None
    if n_parts <= 1:
        return []
    probs = [i / n_parts for i in range(1, n_parts)]
    row = df.agg(
        F.percentile_approx(order_col, probs, 10_000).alias("b")
    ).collect()[0]
    return list(row["b"] or [])


def _pid_from_bounds(order_col: str, bounds: list):
    """pid(x) = #{b in bounds : b <= x} over the SORTED bound list.

    Small bound counts use one literal-array filter scan. Past
    ``_TWO_LEVEL_MIN`` the scan goes two-level (sqrt-blocked): count the
    blocks whose max <= x via a coarse array, then scan only the one
    straddling block — O(2*sqrt(P)) comparisons per row instead of O(P).
    Measured at 10M rows x 4096 bounds: the flat scan costs ~12x the
    64-bound plan; two-level brings it back to ~1x (BENCH/BASELINE.md).
    Correct with duplicate bounds: the list is sorted, so every element
    of a later block >= every element of an earlier one — elements <= x
    can only live in fully-counted blocks or the single straddling block.
    """
    if not bounds:
        return F.lit(0)
    x = F.col(order_col)
    if len(bounds) <= _TWO_LEVEL_MIN:
        barr = F.array(*[F.lit(b) for b in bounds])
        return F.size(F.filter(barr, lambda b: b <= x))
    bs = int(math.isqrt(len(bounds) - 1)) + 1
    blocks = [bounds[i:i + bs] for i in range(0, len(bounds), bs)]
    coarse = F.array(*[F.lit(b[-1]) for b in blocks])
    # element counts of blocks 0..i-1, so count_full = psize[full]
    psizes, acc = [0], 0
    for b in blocks:
        acc += len(b)
        psizes.append(acc)
    psize_arr = F.array(*[F.lit(p) for p in psizes])
    blocks_arr = F.array(*[F.array(*[F.lit(v) for v in b]) for b in blocks])
    full = F.size(F.filter(coarse, lambda b: b <= x))
    count_full = F.element_at(psize_arr, full + 1)
    straddle = F.element_at(
        blocks_arr, F.least(full, F.lit(len(blocks) - 1)) + 1
    )
    partial = F.when(
        full < len(blocks),
        F.size(F.filter(straddle, lambda b: b <= x)),
    ).otherwise(F.lit(0))
    return count_full + partial


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
    globally). ``order_col`` must be a non-null total order (unique
    values) — ties across a pid boundary would make the prefix ambiguous.
    Rows with a NULL ``by`` value are dropped (the offset join is an
    equi-join); filter or fill nulls first.

    ``num_partitions`` requests pid-bucket count; both it and the derived
    default are capped at ``_MAX_PID_BUCKETS`` (4096) — results are
    identical at any bucket count, only window parallelism changes. A
    non-numeric ``order_col`` takes a documented slow path (full-input
    localCheckpoint; a warning is logged)."""
    for c in (_PID, _BEFORE):
        if c in df.columns:
            raise ValueError(f"input already has working column {c!r}")

    spark = df.sparkSession
    # 2x parallelism: pids are hash-assigned to window tasks, so extra
    # logical buckets smooth the assignment; capped so the bound-literal
    # count never tracks cluster size (see _MAX_PID_BUCKETS)
    n_parts = num_partitions or spark.sparkContext.defaultParallelism * 2
    n_parts = min(n_parts, _MAX_PID_BUCKETS)
    bounds = _order_bounds(df, order_col, n_parts)
    if bounds is not None:
        # The `+ 0 * monotonically_increasing_id()` is a value-neutral
        # NONDETERMINISM BARRIER, not dead code: the pid expression holds
        # a HOF lambda with an outer reference, and Catalyst's
        # InferFiltersFromConstraints mis-computes that lambda's reference
        # set — it derives `pid_expr <=> __pack_pid` from the offset join
        # and pushes it to the offset side, where the order column does
        # not exist, producing an unresolvable `!Filter` that fails task
        # binding (INTERNAL_ERROR_ATTRIBUTE_NOT_FOUND; reproduced with an
        # int order column, pinned in test_packing.py). Constraints are
        # only inferred from deterministic expressions, so the no-op
        # nondeterministic term suppresses exactly this inference; the
        # value is unchanged (x*0) under any retry.
        pid = (
            _pid_from_bounds(order_col, bounds).cast("long")
            + F.lit(0) * F.monotonically_increasing_id()
        ).cast("int")
        part = df.withColumn(_PID, pid)
    else:
        # the expensive path: a full wide-row localCheckpoint
        # materialization just to freeze the sampled range partitioning —
        # make hitting it with a non-numeric order column a VISIBLE choice
        _LOG.warning(
            "cumulative_tokens: order column %r is non-numeric; falling "
            "back to repartitionByRange + localCheckpoint, which "
            "materializes the full input once. Prefer a numeric total "
            "order (e.g. a monotonic doc sequence number) at scale.",
            order_col,
        )
        range_keys = ([F.col(by)] if by else []) + [F.col(order_col)]
        sort_keys = ([by] if by else []) + [order_col]
        part = (
            df.repartitionByRange(n_parts, *range_keys)
            .sortWithinPartitions(*sort_keys)
            .withColumn(_PID, F.spark_partition_id())
        )
        # freeze the sampled partitioning so the totals aggregate and the
        # final window see identical pids
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


def temperature_targets(
    df: DataFrame,
    token_col: str,
    by: str,
    *,
    total_tokens: int,
    temperature: float = 1.0,
) -> dict:
    """Per-group token targets for temperature-scaled mixture sampling
    (the multilingual/multi-source rebalancing rule of mT5/XLM-R:
    ``p_i ∝ n_i^(1/T)``).  T=1 keeps natural proportions; T→∞ approaches
    uniform; T<1 sharpens toward the biggest sources.  Feed the result to
    :func:`select_mixture`.

    One aggregation (per-group token totals — O(groups) driver state,
    same bound as select_mixture's own target map); targets are floored
    and never exceed a group's available tokens."""
    if temperature <= 0:
        raise ValueError("temperature must be > 0")
    if total_tokens < 0:
        raise ValueError("total_tokens must be >= 0")
    totals = {
        r["g"]: int(r["n"])
        for r in df.groupBy(F.col(by).alias("g"))
        .agg(F.sum(token_col).alias("n"))
        .collect()
    }
    if not totals:
        return {}
    weights = {g: n ** (1.0 / temperature) for g, n in totals.items() if n > 0}
    z = sum(weights.values()) or 1.0
    return {
        g: min(int(total_tokens * w / z), totals[g])
        for g, w in weights.items()
    }


def write_packed_shards(
    df: DataFrame,
    out_path: str,
    token_col: str,
    order_col: str,
    budget: int,
    *,
    num_partitions: Optional[int] = None,
    mode: str = "error",
) -> int:
    """Materialize :func:`packed_shards` as the physical training layout:
    one ``shard_id=N`` parquet directory per shard, each holding exactly
    its shard's rows — the shape data loaders consume (read one shard
    directory = one token-budget-bounded unit of work).

    Shape: the prefix-sum assignment runs as usual, then ONE shuffle on
    ``shard_id`` colocates each shard into a single task before the
    partitioned write — so every shard directory is one writer's output
    (no tiny-file spray), and a shard's size is bounded by ``budget``
    tokens regardless of corpus size. Returns the number of shards
    written (counted from the written directory — valid because append
    mode is rejected: shard numbering restarts at 0 every call, so
    appending would interleave two runs' rows inside the same
    ``shard_id=N`` directories; write each snapshot to its own path).
    """
    if mode == "append":
        raise ValueError(
            "write_packed_shards does not support mode='append': shard ids "
            "restart at 0 per call and would collide with prior output — "
            "write each snapshot to its own path"
        )
    shards = packed_shards(
        df, token_col, order_col, budget, num_partitions=num_partitions
    )
    spark = df.sparkSession
    # partitionOverwriteMode=dynamic left set session-wide (e.g. by a
    # checkpointed validation run) would make mode='overwrite' replace
    # only the shard_id dirs THIS run produces, leaving a previous larger
    # run's extra shards interleaved in the output — the same corruption
    # the append rejection above guards against, and it breaks the
    # read-back shard count. Pin static for this write, restore after.
    _MODE_KEY = "spark.sql.sources.partitionOverwriteMode"
    prev_mode = spark.conf.get(_MODE_KEY, None)
    spark.conf.set(_MODE_KEY, "static")
    try:
        (
            shards.repartition(F.col("shard_id"))
            .write.mode(mode)
            .partitionBy("shard_id")
            .parquet(out_path)
        )
    finally:
        if prev_mode is None:
            spark.conf.unset(_MODE_KEY)
        else:
            spark.conf.set(_MODE_KEY, prev_mode)
    return (
        spark.read.parquet(out_path)
        .select("shard_id").distinct().count()
    )
