"""File-layout clustering for data skipping: Z-order (Morton) writes.

At 100 TB the scan you DON'T do is the fastest operator: parquet/Iceberg
readers prune row groups whose min/max stats exclude the predicate, but
stats only help if the writer CLUSTERED the data.  Sorting by one column
gives perfect skipping on that column and none on any other; interleaving
the quantized bits of k columns (the Z-order / Morton curve — the same
layout Delta/Iceberg `OPTIMIZE ZORDER BY` produces) gives good skipping
on EVERY participating column simultaneously, because curve-adjacent rows
are close in all k dimensions at once.

Distributed shape: ONE min/max aggregate scan (2k scalars) → the z-value
is a pure codegen'd projection (shift-and-or chain, no UDF) →
``repartitionByRange`` on the z-value (one range exchange — Spark samples
boundaries, so output files are balanced) → ``sortWithinPartitions`` →
write.  Nothing here is driver-sized except the 2k min/max scalars.

Width quantization (min/max) is deliberate: quantile quantization would
balance skewed columns better but needs an edges scan per column and a
255-way comparison chain per row; min/max costs one fused agg and the
range exchange re-balances row COUNTS regardless.  Skewed columns still
skip — their quantized values just occupy fewer distinct cells.

Reference analog: none (``/root/reference/README.md:100-104``); extends
SURVEY.md §2.3 alongside sources/bucketed.py (bucketing co-locates JOIN
keys; Z-order co-locates RANGE predicates).
"""

from __future__ import annotations

from typing import List, Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _quantize(col: Column, lo: Column, hi: Column, bits: int) -> Column:
    """Width-quantize to ``[0, 2^bits)``: nulls and degenerate (lo==hi)
    ranges map to 0 — they carry no skipping information either way."""
    span = hi - lo
    q = F.floor(
        (col.cast("double") - lo) / span * F.lit(float((1 << bits) - 1))
    )
    q = F.least(F.greatest(q, F.lit(0)), F.lit((1 << bits) - 1))
    return (
        F.when(col.isNull() | (span <= 0), F.lit(0)).otherwise(q)
    ).cast("long")


def zorder_key(quantized: Sequence[Column], bits: int) -> Column:
    """Interleave the low ``bits`` bits of k pre-quantized long columns
    into one Morton key: bit ``i`` of column ``j`` lands at position
    ``i*k + j``.  A chain of ``bits × k`` shift-and-or terms — all
    JVM-side integer ops inside whole-stage codegen."""
    k = len(quantized)
    if k == 0:
        raise ValueError("zorder_key needs at least one column")
    z: Optional[Column] = None
    for j, q in enumerate(quantized):
        for i in range(bits):
            term = F.shiftleft(
                F.shiftright(q, i).bitwiseAND(F.lit(1)), i * k + j
            )
            z = term if z is None else z.bitwiseOR(term)
    return z


def with_zorder(
    df: DataFrame, cols: Sequence[str], *, bits: int = 12,
    out_col: str = "__z",
) -> DataFrame:
    """``df`` plus the Morton key over ``cols`` — one fused min/max agg
    (2k scalars collected) + a pure projection.  ``bits`` caps the
    per-column resolution; 12 bits × 4 cols fits a long with room."""
    cols = list(cols)
    if not cols:
        raise ValueError("need at least one column")
    if bits * len(cols) > 63:
        raise ValueError(
            f"bits*len(cols) must fit a long: {bits}*{len(cols)} > 63"
        )
    rng = df.agg(
        *[
            a
            for c in cols
            for a in (
                F.min(F.col(c).cast("double")).alias(f"__lo_{c}"),
                F.max(F.col(c).cast("double")).alias(f"__hi_{c}"),
            )
        ]
    ).head()
    qs: List[Column] = [
        _quantize(
            F.col(c),
            F.lit(float(rng[f"__lo_{c}"] if rng[f"__lo_{c}"] is not None else 0.0)),
            F.lit(float(rng[f"__hi_{c}"] if rng[f"__hi_{c}"] is not None else 0.0)),
            bits,
        )
        for c in cols
    ]
    return df.withColumn(out_col, zorder_key(qs, bits))


def write_zordered(
    df: DataFrame,
    path: str,
    cols: Sequence[str],
    *,
    n_files: int = 32,
    bits: int = 12,
    mode: str = "error",
) -> None:
    """Write ``df`` as ``n_files`` parquet files clustered along the
    Z-order curve of ``cols``: range-partition on the Morton key (sampled
    boundaries → balanced files), sort within each partition, drop the
    key, write.  Every participating column's row-group min/max stats
    become narrow, so predicate pushdown on ANY of them prunes files —
    the multi-column complement of a single-column sort."""
    z = with_zorder(df, cols, bits=bits)
    (
        z.repartitionByRange(n_files, F.col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode(mode)
        .parquet(path)
    )
