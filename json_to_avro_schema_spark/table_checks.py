"""Execute a CompiledPlan's table-level checks (SURVEY.md §3 lifecycle:
the ``table_checks``/``ref_checks``/``stats`` arm).

The spec declares them with engine extension keywords (compiler/plan.py):
``x-unique`` → salted-agg uniqueness verdicts, ``x-ref`` → anti-join
referential integrity, ``x-drift`` → binned-histogram KL/PSI vs a supplied
baseline (``categorical: true`` switches to category-proportion PSI, no
binning), ``x-vector`` → embedding-column conformance (dim / NaN / null /
L2-norm bounds), ``x-stats`` → fused single-scan column stats. Each check
family delegates to its operator module; results land in ONE unified
verdict table::

    (check_name, kind, n_rows, n_bad, pass)

``kind`` ∈ {unique, ref, drift, drift_skipped, vector, stats}. Per-check metric
detail (PSI value, per-column stats) stays in the operators' own outputs;
this table is the pass/fail report a run persists next to the row-check
verdicts.

Scale notes: each family is one aggregation/join plan over the table
(partial+final hash aggs, broadcast dims); results collected here are a
handful of scalar rows, never data-proportional.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

from pyspark.sql import DataFrame, SparkSession

from .compiler.plan import CompiledPlan
from .operators import drift as dr
from .operators import referential as ri
from .operators import stats as st
from .operators import uniqueness as uq

VERDICT_SCHEMA = (
    "check_name string, kind string, n_rows long, n_bad long, pass boolean"
)


def run_table_checks(
    spark: SparkSession,
    df: DataFrame,
    plan: CompiledPlan,
    *,
    ref_tables: Optional[Dict[str, DataFrame]] = None,
    drift_baselines: Optional[Dict[str, DataFrame]] = None,
    psi_threshold: float = 0.2,
) -> DataFrame:
    """Run every table-level check the spec declares; one verdict row each.

    ``ref_tables`` maps the spec's ``refTable`` names to DataFrames (a
    missing parent table is a spec/environment error — raised, not
    silently skipped). ``drift_baselines`` maps drift-check name (or
    column) to the baseline DataFrame; drift checks without a baseline are
    reported as ``drift_skipped`` with ``pass=true`` so resumable runs can
    fill them in later.
    """
    ref_tables = ref_tables or {}
    drift_baselines = drift_baselines or {}
    rows: List[Tuple] = []

    for u in plan.unique_checks:
        r = uq.uniqueness_verdict(df, list(u.columns)).collect()[0]
        rows.append(
            (u.name, "unique", int(r["n_rows"]), int(r["n_dup_rows"]), bool(r["pass"]))
        )

    for rc in plan.ref_checks:
        if rc.ref_table not in ref_tables:
            raise KeyError(
                f"ref check '{rc.name}' needs table '{rc.ref_table}' — "
                f"pass it via ref_tables="
            )
        parent = ref_tables[rc.ref_table]
        r = ri.ri_verdict(
            df, parent, list(rc.columns), list(rc.ref_columns)
        ).collect()[0]
        rows.append(
            (rc.name, "ref", int(r["n_rows"]), int(r["n_dangling"]), bool(r["pass"]))
        )

    for dc in plan.drift_checks:
        base = drift_baselines.get(dc.name) or drift_baselines.get(dc.column)
        if base is None:
            rows.append((dc.name, "drift_skipped", 0, 0, True))
            continue
        if dc.categorical:
            rep = dr.categorical_drift_report(
                df, base, dc.column, psi_threshold=psi_threshold
            )
        else:
            rep = dr.drift_report(
                df, base, dc.column,
                bins=dc.bins, lo=dc.lo, hi=dc.hi, psi_threshold=psi_threshold,
            )
        rows.append(
            (dc.name, "drift", rep.n_current, 0 if rep.ok else 1, bool(rep.ok))
        )

    for vc in plan.vector_checks:
        from .operators import similarity as sim

        bounds = (
            (vc.norm_min, vc.norm_max)
            if vc.norm_min is not None and vc.norm_max is not None
            else None
        )
        r = sim.vector_stats(
            df, vc.column, expected_dim=vc.dim, norm_bounds=bounds
        ).collect()[0]
        n_bad = (
            int(r["n_null_vec"]) + int(r["n_dim_mismatch"])
            + int(r["n_with_nan"]) + int(r["n_norm_oob"])
        )
        rows.append((vc.name, "vector", int(r["n_rows"]), n_bad, n_bad == 0))

    if plan.stats_columns:
        stats = st.column_stats(
            df,
            None if plan.stats_columns == ["*"] else plan.stats_columns,
            quantiles=None,
            approx_distinct=False,
        ).collect()
        for r in stats:
            rows.append(
                (f"stats_{r['column']}", "stats", int(r["n_rows"]),
                 int(r["n_null"]), True)
            )

    return spark.createDataFrame(rows, VERDICT_SCHEMA)
