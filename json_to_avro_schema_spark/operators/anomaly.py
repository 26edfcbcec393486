"""Cross-run metric anomaly detection (the Deequ "metrics repository +
anomaly check" pattern over this engine's checkpoint state).

A validation deployment runs the same spec over the same table shape
every day; the per-partition metrics the checkpoint already persists
(``n_rows``, ``n_fail`` — checkpoint.py STATE_SCHEMA) become a time
series per partition key. This operator compares the CURRENT run's
metric against the distribution of prior runs and flags:

- ``z``        |current − mean(history)| > z_threshold × stddev(history)
- ``rel``      |current − mean| / mean > rel_threshold (catches drifts a
               tight-history stddev of ~0 would turn into huge z scores,
               and is the only rule when stddev == 0)
- ``missing``  the key has history but no current-run row (a partition
               vanished — at 10^5 partitions the failure nobody notices)
- new keys (no history, or fewer than ``min_history`` prior runs) are
  reported with ``insufficient_history = true`` and never flagged —
  day-1 partitions are expected, not anomalous.

Distributed shape: the metrics table is one row per (run, key) — already
tiny relative to data (10^6 partitions × 10^2 runs = 10^8 small rows at
the extreme). One groupBy(key) over the history rows (partial+final hash
agg), one broadcast-eligible join against the current run's rows, every
rule a Column expression; no driver state, no collect.

The reference repo has no run-over-run surface (it converts one schema at
a time); this extends the drift family from *within-run distribution
drift* (operators/drift.py) to *between-run metric drift*.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def metric_anomalies(
    metrics: DataFrame,
    run_col: str,
    key_col: str,
    value_col: str,
    current_run,
    *,
    z_threshold: float = 3.0,
    rel_threshold: float = 0.5,
    min_history: int = 2,
) -> DataFrame:
    """One row per key in the current run OR in history: the current
    value, history mean/stddev/count (population stddev — every prior
    run is observed, not sampled), the deviation measures, a ``reason``
    in {'z','rel','missing', null} (first matching rule wins, 'missing'
    checked first) and the ``anomalous`` flag. ``current_run`` rows are
    ``metrics[run_col] == current_run``; history is every run strictly
    before it (``<`` — run ids must be orderable: dates, sequence
    numbers)."""
    cur = metrics.filter(F.col(run_col) == F.lit(current_run)).select(
        F.col(key_col).alias("key"),
        F.col(value_col).cast("double").alias("current"),
    )
    hist = (
        metrics.filter(F.col(run_col) < F.lit(current_run))
        .groupBy(F.col(key_col).alias("key"))
        .agg(
            F.count(F.lit(1)).alias("hist_n"),
            F.avg(F.col(value_col).cast("double")).alias("hist_mean"),
            F.stddev_pop(F.col(value_col).cast("double")).alias("hist_std"),
        )
    )
    j = cur.join(hist, "key", "full_outer")
    hist_n = F.coalesce(F.col("hist_n"), F.lit(0))
    enough = hist_n >= F.lit(min_history)
    mean = F.col("hist_mean")
    std = F.col("hist_std")
    dev = F.abs(F.col("current") - mean)
    rel = F.when(mean != 0, dev / F.abs(mean))
    z = F.when(std > 0, dev / std)
    reason = (
        F.when(enough & F.col("current").isNull(), F.lit("missing"))
        .when(enough & (z > F.lit(z_threshold)), F.lit("z"))
        .when(enough & (rel > F.lit(rel_threshold)), F.lit("rel"))
    )
    return j.select(
        F.col("key").alias(key_col),
        "current",
        hist_n.alias("hist_n"),
        F.round(mean, 6).alias("hist_mean"),
        F.round(std, 6).alias("hist_std"),
        F.round(rel, 6).alias("rel_change"),
        F.round(z, 6).alias("z_score"),
        (~enough).alias("insufficient_history"),
        reason.alias("reason"),
        reason.isNotNull().alias("anomalous"),
    )


def checkpoint_anomalies(
    spark,
    store,
    spec_hash: str,
    current_run: str,
    *,
    metric: str = "fail_rate",
    z_threshold: float = 3.0,
    rel_threshold: float = 0.5,
    min_history: int = 2,
) -> DataFrame:
    """Anomaly report over the checkpoint store's persisted per-partition
    metrics for one spec version: ``metric`` ∈ {'n_rows', 'n_fail',
    'fail_rate'}. Run ids are compared with ``<`` (the engine's run ids
    sort chronologically). State rows duplicated by a retried append are
    collapsed to one row per (run, partition) first — averages must not
    double-weight a retry."""
    if metric not in ("n_rows", "n_fail", "fail_rate"):
        raise ValueError(f"unknown metric {metric!r}")
    state = (
        store.read_state(spark)
        .filter(F.col("spec_hash") == spec_hash)
        .groupBy("run_id", "part_key")
        .agg(F.max("n_rows").alias("n_rows"), F.max("n_fail").alias("n_fail"))
    )
    if metric == "fail_rate":
        state = state.withColumn(
            "fail_rate",
            F.col("n_fail") / F.greatest(F.col("n_rows"), F.lit(1)),
        )
    return metric_anomalies(
        state, "run_id", "part_key", metric, current_run,
        z_threshold=z_threshold, rel_threshold=rel_threshold,
        min_history=min_history,
    )
