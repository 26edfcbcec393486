"""Partition-granular checkpoint / resume (north rule: "resumable from
checkpoint with per-partition lineage + metrics").

State model — one row per (run_id, part_key) written **after** that
partition's sinks commit:

    run_id, part_key, spec_name, spec_hash, n_rows, n_fail, completed_at,
    state_json

Resume = enumerate the input's partitions, **anti-join** the completed set,
validate only the remainder (SURVEY.md §3 lifecycle).

``state_json`` carries the partition's serialized t-digest sketch when the
caller names a ``sketch_col`` (north rule: "validation state (sketches,
partition lineage, metrics) is checkpointed"): per-partition digests are
built deterministically (operators/tdigest.keyed_digests) and persisted
with the lineage row, so corpus-wide quantiles after any number of
crash/resume cycles come from :func:`merged_state_digest` — merging the
stored partials, never rescanning completed partitions' data.

Atomicity & idempotence:
  * violation/verdict sinks are written with *dynamic partition overwrite*
    (``partitionOverwriteMode=dynamic`` + ``mode('overwrite')``), so a retried
    partition replaces exactly its own output directory — re-running a
    half-finished partition cannot duplicate rows;
  * the state row is appended only after both sinks return, giving
    write-then-commit ordering (an Iceberg snapshot commit would make this a
    single atomic operation; Iceberg jars aren't in this image, so the store
    is parquet-backed behind the same interface — see ``sources/iceberg.py``).

The completed-set read is tiny (one row per partition × run) and is
broadcast into the anti-join.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import List, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .compiler.plan import CompiledPlan
from .runner import ValidationResult, run_validation

STATE_SCHEMA = (
    "run_id string, part_key string, spec_name string, spec_hash string, "
    "n_rows long, n_fail long, completed_at timestamp, state_json string"
)


@dataclass
class CheckpointStore:
    """Parquet-backed state table (same interface an Iceberg metadata table
    would implement)."""

    path: str

    def _state_path(self) -> str:
        return os.path.join(self.path, "state")

    def read_state(self, spark: SparkSession) -> DataFrame:
        p = self._state_path()
        try:
            # mergeSchema: a pre-sketch state dir (7-column files) appended
            # with 8-column rows must not lose state_json to a single-footer
            # schema inference — old and new files coexist losslessly.
            df = spark.read.option("mergeSchema", "true").parquet(p)
        except Exception:
            return spark.createDataFrame([], STATE_SCHEMA)
        if "state_json" not in df.columns:  # pre-sketch state tables
            df = df.withColumn("state_json", F.lit(None).cast("string"))
        return df

    def completed_partitions(
        self, spark: SparkSession, run_id: str, spec_hash: str
    ) -> DataFrame:
        """part_key values already finished for this run under this exact
        spec version (lineage: a spec change invalidates completion)."""
        return (
            self.read_state(spark)
            .filter((F.col("run_id") == run_id) & (F.col("spec_hash") == spec_hash))
            .select("part_key")
            .distinct()
        )

    def mark_completed(self, spark: SparkSession, rows: DataFrame) -> None:
        rows.write.mode("append").parquet(self._state_path())


@dataclass
class CheckpointedRun:
    run_id: str
    n_partitions_total: int
    n_partitions_resumed: int   # skipped because already completed
    n_partitions_processed: int
    result: Optional[ValidationResult]


def run_with_checkpoint(
    spark: SparkSession,
    df: DataFrame,
    plan: CompiledPlan,
    store: CheckpointStore,
    run_id: str,
    out_dir: str,
    *,
    part_key_col: str = "part_key",
    sketch_col: Optional[str] = None,
    sketch_delta: float = 100.0,
) -> CheckpointedRun:
    """Validate only the partitions not yet completed for (run_id, spec_hash);
    sink violations + verdicts partitioned by part_key; then commit state.

    ``sketch_col``: numeric column to sketch per partition (t-digest). The
    serialized digest rides the state row (``state_json``), so resumed runs
    keep completed partitions' sketches without rescanning them — merge
    them all with :func:`merged_state_digest`. One extra pass over the
    PENDING rows only (grouped by the partition key)."""
    # dynamic overwrite is what makes a retried partition replace exactly
    # its own sink directory — but it must not leak into the session (a
    # later plain mode('overwrite') write, e.g. write_packed_shards, would
    # silently keep stale partition dirs). Set it for this run's sink
    # writes only and restore the caller's value on every exit path.
    _MODE_KEY = "spark.sql.sources.partitionOverwriteMode"
    prev_mode = spark.conf.get(_MODE_KEY, None)
    spark.conf.set(_MODE_KEY, "dynamic")
    try:
        return _run_with_checkpoint(
            spark, df, plan, store, run_id, out_dir,
            part_key_col=part_key_col, sketch_col=sketch_col,
            sketch_delta=sketch_delta,
        )
    finally:
        if prev_mode is None:
            spark.conf.unset(_MODE_KEY)
        else:
            spark.conf.set(_MODE_KEY, prev_mode)


def _run_with_checkpoint(
    spark: SparkSession,
    df: DataFrame,
    plan: CompiledPlan,
    store: CheckpointStore,
    run_id: str,
    out_dir: str,
    *,
    part_key_col: str,
    sketch_col: Optional[str],
    sketch_delta: float,
) -> CheckpointedRun:
    all_parts = df.select(part_key_col).distinct()
    # the state table's key column is always named part_key; align it to
    # the caller's column so a custom part_key_col resolves in the joins
    done = store.completed_partitions(spark, run_id, plan.spec_hash)
    if part_key_col != "part_key":
        done = done.withColumnRenamed("part_key", part_key_col)
    # pending stays a DataFrame end-to-end: at 10^5-10^6 partitions a
    # collect + isin(literal list) would embed one literal per partition in
    # every downstream plan. localCheckpoint materializes the (tiny) key
    # set once so the three reuses below don't re-scan the input.
    pending = (
        all_parts.join(F.broadcast(done), part_key_col, "left_anti")
        .localCheckpoint(eager=True)
    )

    n_total = all_parts.count()
    n_pending = pending.count()
    if n_pending == 0:
        return CheckpointedRun(run_id, n_total, n_total, 0, None)

    # broadcast semi-join on the partition column: with a partitioned
    # source this triggers dynamic partition pruning (whole directories /
    # manifests skipped at scan time), without a driver-side literal plan
    sub = df.join(F.broadcast(pending), part_key_col, "left_semi")
    res = run_validation(spark, sub, plan)

    viol_path = os.path.join(out_dir, "violations")
    verd_path = os.path.join(out_dir, "verdicts")
    res.violations.write.mode("overwrite").partitionBy(part_key_col).parquet(viol_path)
    # verdicts from the materialized violations + a column-pruned row count —
    # ONE full compute scan total instead of two (runner.verdicts_from_violations)
    try:
        viol_written = spark.read.parquet(viol_path).join(
            F.broadcast(pending), part_key_col, "left_semi"
        )
    except Exception:  # zero violations ⇒ no files to infer from
        viol_written = spark.createDataFrame([], res.violations.schema)
    from .runner import partition_verdicts, verdicts_from_violations

    # the verdict helpers need the same check list run_validation built:
    # bind the schema here too (schema-bound additionalProperties checks
    # otherwise get no verdict lines)
    bound = plan.bind_schema(sub.schema)
    if any(c.severity != "enforce" for c in bound.row_checks):
        # warn-severity failures never reach the violations sink, so the
        # fused derivation cannot count them — pay the second compute
        # scan to keep their verdict lines truthful
        checked = res.checked
        if part_key_col != "part_key":
            if "part_key" in checked.columns:
                # a pre-existing literal part_key DATA column would make
                # the rename produce duplicate names and the groupBy
                # ambiguous; the check-result columns are separate, so
                # dropping the data column is safe here
                checked = checked.drop("part_key")
            checked = checked.withColumnRenamed(part_key_col, "part_key")
        verdicts = partition_verdicts(checked, bound)
        if part_key_col != "part_key":
            verdicts = verdicts.withColumnRenamed("part_key", part_key_col)
    else:
        verdicts = verdicts_from_violations(
            sub, viol_written, bound, part_key_col=part_key_col
        )
        if part_key_col != "part_key":
            # the helper's output key column is always named part_key
            verdicts = verdicts.withColumnRenamed("part_key", part_key_col)
    verdicts.write.mode("overwrite").partitionBy(part_key_col).parquet(verd_path)

    # state rows AFTER both sinks committed (per-partition metrics = lineage)
    base = (
        spark.read.parquet(verd_path)
        .join(F.broadcast(pending), part_key_col, "left_semi")
        .groupBy(part_key_col)
        .agg(F.max("n_rows").alias("n_rows"), F.sum("n_fail").alias("n_fail"))
    )
    if sketch_col is not None:
        from .operators.tdigest import keyed_digests

        sketches = keyed_digests(sub, sketch_col, part_key_col, delta=sketch_delta)
        base = base.join(sketches, part_key_col, "left")
    else:
        base = base.withColumn("state_json", F.lit(None).cast("string"))
    metrics = base.select(
        F.lit(run_id).alias("run_id"),
        F.col(part_key_col).alias("part_key"),
        F.lit(plan.spec_name).alias("spec_name"),
        F.lit(plan.spec_hash).alias("spec_hash"),
        "n_rows",
        "n_fail",
        F.current_timestamp().alias("completed_at"),
        "state_json",
    )
    store.mark_completed(spark, metrics)
    return CheckpointedRun(run_id, n_total, n_total - n_pending, n_pending, res)


def merged_state_digest(
    spark: SparkSession, store: CheckpointStore, run_id: str, spec_hash: str
):
    """Corpus-wide quantile sketch from the PERSISTED per-partition digests —
    zero data rescan, however many crash/resume cycles produced the rows.

    Partials are deduplicated per part_key and merged in sorted part_key
    order, so the result is identical whether the state rows came from one
    run or a run interrupted at any partition boundary (pinned in
    tests/test_checkpoint.py::test_sketch_state_resume_merge).
    """
    from .operators.tdigest import TDigest

    rows = (
        store.read_state(spark)
        .filter((F.col("run_id") == run_id) & (F.col("spec_hash") == spec_hash))
        .filter(F.col("state_json").isNotNull())
        .select("part_key", "state_json")
        .collect()
    )
    out = TDigest.empty()
    seen = set()
    for r in sorted(rows, key=lambda r: r["part_key"]):
        if r["part_key"] in seen:  # retried state append — first row wins
            continue
        seen.add(r["part_key"])
        out = out.merge(TDigest.from_json(r["state_json"]))
    return out
