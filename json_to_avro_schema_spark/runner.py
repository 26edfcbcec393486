"""Distributed validation runner (the only part that touches executors).

Engine lifecycle per SURVEY.md §3:

    scan → select(original cols + check predicate cols) → split:
       violations (filter ¬row_pass)        → sink, original columns UNTOUCHED
       verdicts   (groupBy part_key, long)  → sink
       table checks (uniqueness / referential / drift / stats) → operators/

Scale notes (the parts that matter at 10^12 rows):
  * All §2.2 predicates are Column expressions → whole-stage codegen; one
    scan produces both violations and per-partition verdicts.
  * Violation rows keep the original ``spans`` column selected as-is so
    Tungsten carries the bytes untouched (span-sequence equality invariant —
    never round-tripped through Python).
  * Verdict aggregation is a partial+final hash agg on ``part_key``; the
    per-check fail counters are fused into ONE agg so the table is scanned
    once.
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field
from typing import Dict, List, Optional

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .compiler.plan import CompiledPlan
from .errors import SchemaMismatchError, ValidationFailedError

ROW_PASS = "__row_pass"
CHECK_PREFIX = "__chk_"


def schema_conformance(actual: T.StructType, expected: T.StructType) -> List[str]:
    """Driver-side structural comparison; returns human-readable mismatches.

    The engine's 'type' keyword check: a column physically of the wrong Spark
    type is a spec violation of the whole table (reference analog: the type
    mapping table, docs/TypeMappings.md).  Extra columns in the data (e.g.
    ``part_key``) are allowed; missing or differently-typed ones are not.
    """
    problems: List[str] = []
    actual_by_name = {f.name: f for f in actual.fields}
    for f in expected.fields:
        got = actual_by_name.get(f.name)
        if got is None:
            problems.append(f"missing column: {f.name} ({f.dataType.simpleString()})")
        elif isinstance(f.dataType, T.BinaryType):
            # BinaryType is the "any / empty schema" escape hatch
            # (TypeMappings.md: any→bytes): no constraint ⇒ any physical
            # type conforms
            continue
        elif got.dataType.simpleString() != f.dataType.simpleString():
            problems.append(
                f"type mismatch on {f.name}: expected "
                f"{f.dataType.simpleString()}, got {got.dataType.simpleString()}"
            )
    return problems


@dataclass
class ValidationResult:
    checked: DataFrame          # original columns + one boolean col per check + __row_pass
    violations: DataFrame       # failing rows, original columns byte-identical
    verdicts: DataFrame         # (part_key, check_name, n_rows, n_fail, pass)
    valid: DataFrame            # rows passing every enforce check, original
                                # columns byte-identical (the expect_or_drop
                                # sink: valid ∪ violations = input, disjoint)
    schema_problems: List[str] = dc_field(default_factory=list)
    unchecked_paths: List[str] = dc_field(default_factory=list)


def apply_row_checks(
    df: DataFrame, plan: CompiledPlan, part_key: Optional[Column] = None
) -> DataFrame:
    """One projection: original columns + a boolean column per check.

    Check columns are fail-closed: a null predicate result (indeterminate)
    counts as a failure. Null *inputs* already pass via the compiler's
    null-gating, so nulls here only arise from genuinely undecidable values.
    """
    orig = [F.col(c) for c in df.columns]
    checks = [
        F.coalesce(chk.predicate(), F.lit(False)).alias(CHECK_PREFIX + chk.name)
        for chk in plan.row_checks
    ]
    out = df.select(*orig, *checks)
    if part_key is not None and "part_key" not in df.columns:
        out = out.withColumn("part_key", part_key)
    # only enforce-severity checks gate the row; warn-severity checks
    # (x-severity: warn) still get their column + verdict line but a
    # failing row stays valid (DLT's plain `expect` level)
    pass_cols = [
        F.col(CHECK_PREFIX + c.name)
        for c in plan.row_checks
        if c.severity == "enforce"
    ]
    row_pass = F.lit(True)
    for c in pass_cols:
        row_pass = row_pass & c
    return out.withColumn(ROW_PASS, row_pass)


def extract_violations(checked: DataFrame, original_columns: List[str]) -> DataFrame:
    """Rows failing ≥1 check; original columns selected untouched, plus the
    names of the failed checks for the report."""
    check_cols = [c for c in checked.columns if c.startswith(CHECK_PREFIX)]
    failed_names = F.filter(
        F.array(
            *[
                F.when(~F.col(c), F.lit(c[len(CHECK_PREFIX):])).otherwise(F.lit(None))
                for c in check_cols
            ]
        ),
        lambda x: x.isNotNull(),
    )
    return (
        checked.filter(~F.col(ROW_PASS))
        .select(*[F.col(c) for c in original_columns], failed_names.alias("failed_checks"))
    )


def partition_verdicts(checked: DataFrame, plan: CompiledPlan) -> DataFrame:
    """Per-(part_key, check) verdicts in long form — ONE fused aggregation.

    groupBy(part_key).agg(count, sum(fail_i)…) then unpivot driver-side via
    ``stack`` so the shuffle carries one compact row per partition.
    """
    check_cols = [CHECK_PREFIX + c.name for c in plan.row_checks]
    key = F.col("part_key") if "part_key" in checked.columns else F.lit("__all__")
    aggs = [F.count(F.lit(1)).alias("n_rows")] + [
        F.sum((~F.col(c)).cast("long")).alias(f"fail_{i}")
        for i, c in enumerate(check_cols)
    ]
    wide = checked.groupBy(key.alias("part_key")).agg(*aggs)
    k = len(check_cols)
    if k == 0:
        return wide.select(
            "part_key", F.lit(None).cast("string").alias("check_name"),
            "n_rows", F.lit(0).alias("n_fail"), F.lit(True).alias("pass"),
        )
    stack_args = ", ".join(
        f"'{plan.row_checks[i].name}', fail_{i}" for i in range(k)
    )
    long = wide.selectExpr(
        "part_key",
        "n_rows",
        f"stack({k}, {stack_args}) as (check_name, n_fail)",
    )
    return long.select(
        "part_key",
        "check_name",
        "n_rows",
        "n_fail",
        (F.col("n_fail") == 0).alias("pass"),
    )


def sample_violations(
    violations: DataFrame,
    *,
    k: int = 10,
    part_key_col: str = "part_key",
    order_col: str = "doc_id",
) -> DataFrame:
    """Deterministic top-K violation sample per partition (SURVEY.md §2.3
    'Window functions'): the report-sized excerpt a 10^12-row run ships to
    a human instead of the full violation table. row_number over a
    per-partition window — no global sort, no collect."""
    from pyspark.sql import Window

    w = Window.partitionBy(part_key_col).orderBy(F.col(order_col))
    return (
        violations.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= k)
        .drop("__rk")
    )


def verdicts_with_violation_count(
    df: DataFrame,
    plan: CompiledPlan,
    *,
    part_key: Optional[Column] = None,
):
    """ONE-scan verdict aggregation + total failing-row count.

    ``Observation`` metrics ride the same job that feeds the verdict
    aggregation, so the row-level violation total (rows failing ≥1 check —
    NOT derivable from per-check fail sums, since one row can fail several)
    costs zero extra scans. Returns ``(verdicts_df, observation)``; read
    ``observation.get`` AFTER an action on the verdicts.
    """
    from pyspark.sql import Observation

    checked = apply_row_checks(df, plan, part_key=part_key)
    obs = Observation()
    observed = checked.observe(
        obs,
        F.sum((~F.col(ROW_PASS)).cast("long")).alias("n_violations"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    return partition_verdicts(observed, plan), obs


def verdicts_from_violations(
    df: DataFrame,
    violations: DataFrame,
    plan: CompiledPlan,
    *,
    part_key_col: str = "part_key",
) -> DataFrame:
    """Per-(part_key, check) verdicts WITHOUT re-scanning the checked table.

    Sink-path optimization: after ``violations`` is materialized, every
    failing (row, check) is already in it, so
    ``n_fail = count of violations carrying that check`` and only
    ``n_rows`` needs the source — a column-pruned scan of the partition-key
    column (parquet never decodes ``spans``). One full compute pass over
    the data instead of two; at 100 TB the verdict agg becomes ~free.
    Output is identical to :func:`partition_verdicts` (zero-filled for
    checks with no failures).

    Requires an all-enforce plan: warn-severity failures on rows that
    pass every enforce check never enter ``violations``, so their counts
    are unrecoverable from it — this function raises rather than silently
    under-reporting them; use :func:`partition_verdicts` (one extra
    aggregation over the checked frame) when the spec carries
    ``x-severity: warn``.
    """
    warn = [c.name for c in plan.row_checks if c.severity != "enforce"]
    if warn:
        raise ValueError(
            f"verdicts_from_violations cannot count warn-severity checks "
            f"{warn} (their failures are not violations) — use "
            f"partition_verdicts for this plan"
        )
    key = (
        F.col(part_key_col) if part_key_col in df.columns else F.lit("__all__")
    )
    rows_per_part = df.groupBy(key.alias("part_key")).agg(
        F.count(F.lit(1)).alias("n_rows")
    )
    vkey = (
        F.col(part_key_col)
        if part_key_col in violations.columns
        else F.lit("__all__")
    )
    fails = (
        violations.select(
            vkey.alias("part_key"), F.explode("failed_checks").alias("check_name")
        )
        .groupBy("part_key", "check_name")
        .agg(F.count(F.lit(1)).alias("n_fail"))
    )
    checks = F.explode(
        F.array(*[F.lit(c.name) for c in plan.row_checks])
    ).alias("check_name")
    grid = rows_per_part.select("part_key", "n_rows", checks)
    return (
        grid.join(F.broadcast(fails), ["part_key", "check_name"], "left")
        .select(
            "part_key",
            "check_name",
            "n_rows",
            F.coalesce("n_fail", F.lit(0)).alias("n_fail"),
            (F.coalesce("n_fail", F.lit(0)) == 0).alias("pass"),
        )
    )


def run_validation(
    spark: SparkSession,
    df: DataFrame,
    plan: CompiledPlan,
    *,
    part_key: Optional[Column] = None,
    enforce_schema: bool = True,
) -> ValidationResult:
    """Build the full lazy validation plan. No action is triggered here —
    callers write/collect the pieces they need (one scan each, or persist
    ``checked`` to share the scan).

    Raises :class:`SchemaMismatchError` when the physical schema can't carry
    the spec's checks (with ``enforce_schema=False`` the mismatches are only
    reported in the result and check columns may fail to resolve).
    """
    problems = schema_conformance(df.schema, plan.expected_schema)
    if problems and enforce_schema:
        raise SchemaMismatchError(problems)
    # accumulative additionalProperties / patternProperties: undeclared data
    # columns get their own checks, materialized against the actual schema
    plan = plan.bind_schema(df.schema)
    original_columns = list(df.columns)
    checked = apply_row_checks(df, plan, part_key=part_key)
    return ValidationResult(
        checked=checked,
        violations=extract_violations(checked, original_columns),
        verdicts=partition_verdicts(checked, plan),
        valid=checked.filter(F.col(ROW_PASS)).select(
            *[F.col(c) for c in original_columns]
        ),
        schema_problems=problems,
        unchecked_paths=list(plan.unchecked_paths),
    )


def fail_on_violations(
    result: ValidationResult, *, limit: int = 0, sample: int = 5
) -> int:
    """The fail-the-pipeline expectation level (DLT's ``expect_or_fail``,
    Deequ's error level): count the enforce-severity violation rows and
    raise :class:`ValidationFailedError` past ``limit``, carrying up to
    ``sample`` violating rows for the error report. Returns the count when
    within the limit.

    Cost: one count action; the failure path adds a second
    ``limit(sample)`` job to fetch the report rows. At large scale,
    ``result.checked.persist()`` before calling (the violations and valid
    frames both derive from it) keeps the failure path from recomputing
    the full lineage. Callers gating a write should run this BEFORE the
    write action.
    """
    n = result.violations.count()
    if n > limit:
        rows = [r.asDict() for r in result.violations.limit(sample).collect()]
        raise ValidationFailedError(n, limit, rows)
    return n
