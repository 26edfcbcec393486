"""Distribution-drift checks: binned histograms + KL divergence / PSI.

North-rule operator (SURVEY.md §2.3 'Aggregations'): the distributed part is
a single ``groupBy(bucket).count()`` histogram per column — oracle-checkable
SQL.  The KL/PSI arithmetic runs driver-side on the (tiny) histogram vectors;
at 10^12 rows the histogram is still ≤ ``bins`` rows per partition key, so
the driver never sees data-proportional volume.

PSI = Σ (p_i - q_i) * ln(p_i / q_i)     (symmetric-ish, finite with smoothing)
KL  = Σ p_i * ln(p_i / q_i)

Smoothing: each empty bucket gets ``eps`` mass so both are finite.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence, Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def histogram(
    df: DataFrame,
    column: str,
    *,
    bins: int = 32,
    lo: Optional[float] = None,
    hi: Optional[float] = None,
    by: Optional[str] = None,
) -> DataFrame:
    """Fixed-width binned counts: (part_key?, bucket, n). Nulls are dropped;
    values outside [lo, hi] clamp into the edge buckets (so mass is conserved).

    When lo/hi are omitted they are computed with one extra (cheap) agg pass —
    at scale pass them explicitly from the spec (DriftCheckCfg.lo/hi) to keep
    drift single-scan.
    """
    col = F.col(column)
    if lo is None or hi is None:
        row = df.agg(F.min(col).alias("lo"), F.max(col).alias("hi")).collect()[0]
        lo = float(row["lo"]) if lo is None else lo
        hi = float(row["hi"]) if hi is None else hi
    if hi <= lo:
        hi = lo + 1.0
    width = (hi - lo) / bins
    bucket = F.least(
        F.greatest(F.floor((col - F.lit(lo)) / F.lit(width)), F.lit(0)),
        F.lit(bins - 1),
    ).cast("int")
    keys = [F.col(by).alias("part_key")] if by else []
    return (
        df.filter(col.isNotNull())
        .groupBy(*keys, bucket.alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


def _to_probs(counts: Dict[int, int], bins: int, eps: float) -> List[float]:
    total = sum(counts.values())
    if total == 0:
        return [1.0 / bins] * bins
    raw = [counts.get(i, 0) / total for i in range(bins)]
    smoothed = [max(p, eps) for p in raw]
    z = sum(smoothed)
    return [p / z for p in smoothed]


def kl_divergence(p: Sequence[float], q: Sequence[float]) -> float:
    return sum(pi * math.log(pi / qi) for pi, qi in zip(p, q) if pi > 0)


def psi(p: Sequence[float], q: Sequence[float]) -> float:
    return sum((pi - qi) * math.log(pi / qi) for pi, qi in zip(p, q))


@dataclass
class DriftReport:
    kl: float
    psi: float
    ok: bool
    n_current: int
    n_baseline: int


def drift_report(
    current: DataFrame,
    baseline: DataFrame,
    column: str,
    *,
    bins: int = 32,
    lo: Optional[float] = None,
    hi: Optional[float] = None,
    psi_threshold: float = 0.2,
    eps: float = 1e-6,
) -> DriftReport:
    """:func:`drift_verdict` plus the histogram row totals (for verdict
    tables that report ``n_rows``) — same two aggregations, no extra scan."""
    if lo is None or hi is None:
        row = (
            current.select(F.col(column).alias("v"))
            .union(baseline.select(F.col(column).alias("v")))
            .agg(F.min("v").alias("lo"), F.max("v").alias("hi"))
            .collect()[0]
        )
        lo = float(row["lo"]) if lo is None else lo
        hi = float(row["hi"]) if hi is None else hi
    # the two sides are independent jobs — submit them concurrently so
    # drift wall-time is one histogram, not two in sequence
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=2) as pool:
        f_cur = pool.submit(
            lambda: histogram(current, column, bins=bins, lo=lo, hi=hi).collect()
        )
        f_base = pool.submit(
            lambda: histogram(baseline, column, bins=bins, lo=lo, hi=hi).collect()
        )
        cur = {r["bucket"]: r["n"] for r in f_cur.result()}
        base = {r["bucket"]: r["n"] for r in f_base.result()}
    p = _to_probs(cur, bins, eps)
    q = _to_probs(base, bins, eps)
    s = psi(p, q)
    return DriftReport(
        kl=kl_divergence(p, q),
        psi=s,
        ok=s < psi_threshold,
        n_current=sum(cur.values()),
        n_baseline=sum(base.values()),
    )


def drift_verdict(
    current: DataFrame,
    baseline: DataFrame,
    column: str,
    *,
    bins: int = 32,
    lo: Optional[float] = None,
    hi: Optional[float] = None,
    psi_threshold: float = 0.2,
    eps: float = 1e-6,
) -> Tuple[float, float, bool]:
    """(kl, psi, pass). Two histogram aggregations → driver-side arithmetic.

    ``psi_threshold`` 0.2 is the conventional 'significant shift' cutoff.
    """
    rep = drift_report(
        current, baseline, column,
        bins=bins, lo=lo, hi=hi, psi_threshold=psi_threshold, eps=eps,
    )
    return rep.kl, rep.psi, rep.ok


def partitioned_drift_verdicts(
    current: DataFrame,
    baseline: DataFrame,
    column: str,
    *,
    by: str,
    bins: int = 32,
    lo: float,
    hi: float,
    psi_threshold: float = 0.2,
    eps: float = 1e-6,
) -> DataFrame:
    """Per-partition KL/PSI drift verdicts, FULLY distributed.

    The scalar :func:`drift_report` collects two ≤bins histograms and does
    the divergence arithmetic on the driver — fine for one verdict, a
    driver bottleneck at 10^5+ Iceberg partitions. Here the whole
    computation stays in the cluster: one histogram aggregation per side
    keyed on ``(by, bucket)``, a dense per-partition bucket grid via
    ``explode(sequence(...))`` (no crossJoin), and the smoothing /
    normalization / divergence math as array HOFs over a sort_array'd
    ≤bins collect_list per partition — codegen'd, deterministic order,
    one output row per partition.

    Output: (part_key, n_current, n_baseline, kl, psi, pass). Partitions
    present on either side are reported (absent side = all-eps histogram).
    """
    hc = histogram(current, column, bins=bins, lo=lo, hi=hi, by=by)
    hb = histogram(baseline, column, bins=bins, lo=lo, hi=hi, by=by)
    parts = (
        hc.select("part_key").union(hb.select("part_key")).distinct()
    )
    grid = parts.select(
        "part_key",
        F.explode(F.sequence(F.lit(0), F.lit(bins - 1))).alias("bucket"),
    )
    j = (
        grid.join(hc.withColumnRenamed("n", "nc"), ["part_key", "bucket"], "left")
        .join(hb.withColumnRenamed("n", "nb"), ["part_key", "bucket"], "left")
        .select(
            "part_key",
            "bucket",
            F.coalesce("nc", F.lit(0)).alias("nc"),
            F.coalesce("nb", F.lit(0)).alias("nb"),
        )
    )
    rows = F.sort_array(F.collect_list(F.struct("bucket", "nc", "nb")))
    per = j.groupBy("part_key").agg(rows.alias("rows"))

    def _tot(field: str):
        return F.aggregate(
            "rows", F.lit(0).cast("long"), lambda a, x: a + x[field]
        )

    per = per.withColumn("tc", _tot("nc")).withColumn("tb", _tot("nb"))

    def _probs(field: str, total):
        # raw share (uniform when the side is empty) → eps floor → renorm
        raw = F.transform(
            "rows",
            lambda x: F.when(
                total > 0, x[field].cast("double") / total
            ).otherwise(F.lit(1.0 / bins)),
        )
        smoothed = F.transform(raw, lambda v: F.greatest(v, F.lit(float(eps))))
        z = F.aggregate(smoothed, F.lit(0.0), lambda a, v: a + v)
        return F.transform(smoothed, lambda v: v / z)

    per = per.withColumn("p", _probs("nc", F.col("tc"))).withColumn(
        "q", _probs("nb", F.col("tb"))
    )
    kl = F.aggregate(
        F.zip_with("p", "q", lambda p, q: p * F.log(p / q)),
        F.lit(0.0),
        lambda a, v: a + v,
    )
    psi_c = F.aggregate(
        F.zip_with("p", "q", lambda p, q: (p - q) * F.log(p / q)),
        F.lit(0.0),
        lambda a, v: a + v,
    )
    return per.select(
        "part_key",
        F.col("tc").alias("n_current"),
        F.col("tb").alias("n_baseline"),
        kl.alias("kl"),
        psi_c.alias("psi"),
        (psi_c < F.lit(psi_threshold)).alias("pass"),
    )


def category_counts(
    df: DataFrame, column: str, *, by: Optional[str] = None
) -> DataFrame:
    """Frequency table for a categorical column: (part_key?, value, n).
    Nulls are kept as their own category (drift in null-rate IS drift)."""
    keys = [F.col(by).alias("part_key")] if by else []
    return df.groupBy(*keys, F.col(column).alias("value")).agg(
        F.count(F.lit(1)).alias("n")
    )


def categorical_drift_report(
    current: DataFrame,
    baseline: DataFrame,
    column: str,
    *,
    psi_threshold: float = 0.2,
    eps: float = 1e-6,
) -> DriftReport:
    """KL/PSI over CATEGORY proportions (no binning): the category set is
    the union of both sides' observed values, each unseen category smoothed
    with ``eps`` mass. Distributed part = one groupBy per side (partial+final
    hash agg, shuffle one row per category); the divergence arithmetic runs
    driver-side on ≤|categories| values — same contract as the numeric path.
    """
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=2) as pool:
        f_cur = pool.submit(lambda: category_counts(current, column).collect())
        f_base = pool.submit(lambda: category_counts(baseline, column).collect())
        cur = {r["value"]: r["n"] for r in f_cur.result()}
        base = {r["value"]: r["n"] for r in f_base.result()}
    cats = sorted(set(cur) | set(base), key=repr)
    idx = {c: i for i, c in enumerate(cats)}
    k = len(cats)
    p = _to_probs({idx[c]: n for c, n in cur.items()}, k, eps)
    q = _to_probs({idx[c]: n for c, n in base.items()}, k, eps)
    s = psi(p, q)
    return DriftReport(
        kl=kl_divergence(p, q),
        psi=s,
        ok=s < psi_threshold,
        n_current=sum(cur.values()),
        n_baseline=sum(base.values()),
    )
