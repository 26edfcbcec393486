"""Table snapshot diff: per-key added / removed / changed between two
versions of a table — the data-diff regression check run before promoting
a new snapshot (did the rebuild drop keys? silently rewrite values?).
The reference repo has no table surface (a schema transpiler —
``/root/reference/src/main/scala/Transpiler.scala``); this belongs to the
same validation-extra family as the profiler: yesterday's partition is
the baseline, today's must explain its differences.

Distributed shape (the 100 TB story):

* Each side is projected to ``(keys…, xxhash64(struct(compare_cols)))``
  BEFORE the join — the full-outer join shuffles ~16-byte rows per key,
  never the row bodies, so a diff of two 100 TB snapshots moves only
  key + fingerprint bytes through the exchange (the same skinny-shuffle
  rule as paragraph/url dedup's winner computation).
* Status falls out of null-ness + fingerprint equality; ``unchanged``
  rows are dropped by default (at 10^12 keys the unchanged set IS the
  corpus — only the delta may be materialized).  Equal fingerprints are
  taken as equal values: a 2^-64 xxhash64 collision could mask a changed
  row; rerun with ``compare_cols`` split if that risk matters.
* Changed-row EVIDENCE (old vs new values) is a caller-side semi-join of
  either snapshot against the returned keys — deliberately not fused
  here, so the evidence join-back pays only for the delta.

Contracts: ``keys`` must be unique per side (snapshot primary key — with
duplicates the full-outer join multiplies; enforcing would cost the very
shuffle this avoids, the asof_join precedent). Null keys never match
across sides (SQL join semantics): an old null-key row reports
``removed``, a new one ``added``.  Key/compare dtypes must match between
the sides (checked — equal values hash differently across integer
widths, so a silently type-widened rebuild would read as all-changed);
per-column null flags are hashed alongside the values so a value
shifting between same-typed columns is detected as changed.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_STATUS = "status"


def table_diff(
    old: DataFrame,
    new: DataFrame,
    keys: Sequence[str],
    *,
    compare_cols: Optional[Sequence[str]] = None,
    include_unchanged: bool = False,
) -> DataFrame:
    """(keys…, status) for every key whose row was added, removed, or
    changed between ``old`` and ``new``; ``compare_cols`` defaults to the
    non-key columns present in BOTH frames.  ``include_unchanged=True``
    keeps the ``unchanged`` rows too (gate-scale verification only — see
    module docstring)."""
    keys = list(keys)
    if not keys:
        raise ValueError("table_diff needs at least one key column")
    for side, df in (("old", old), ("new", new)):
        missing = [k for k in keys if k not in df.columns]
        if missing:
            raise ValueError(f"key columns missing from {side}: {missing}")
    if compare_cols is None:
        compare_cols = [
            c for c in old.columns if c not in keys and c in new.columns
        ]
    else:
        compare_cols = list(compare_cols)
        for side, df in (("old", old), ("new", new)):
            missing = [c for c in compare_cols if c not in df.columns]
            if missing:
                raise ValueError(
                    f"compare columns missing from {side}: {missing}"
                )
        overlap = set(compare_cols) & set(keys)
        if overlap:
            raise ValueError(f"columns on both sides: {sorted(overlap)}")
    if not compare_cols:
        raise ValueError(
            "no compare columns: the frames share no non-key columns"
        )
    if _STATUS in keys:
        raise ValueError(f"key column {_STATUS!r} collides with the output")
    # equal logical values hash differently across widths (int 5 vs
    # bigint 5), so a type-widened rebuild would flood the gate with
    # false 'changed' rows — refuse dtype drift instead of guessing a
    # common cast (schema evolution is a deliberate caller-side cast)
    old_t = dict(old.dtypes)
    new_t = dict(new.dtypes)
    drift = [
        (c, old_t[c], new_t[c])
        for c in (*keys, *compare_cols)
        if old_t[c] != new_t[c]
    ]
    if drift:
        raise ValueError(
            f"column dtypes differ between snapshots (cast one side "
            f"first): {drift}"
        )

    def fp(df: DataFrame, alias: str) -> DataFrame:
        # per-column null flags ride the hashed struct: hash expressions
        # pass the seed through unchanged on null inputs, so without the
        # flags a value SHIFTING between same-typed columns (old goes
        # null, neighbor picks the value up) would fingerprint
        # identically — a deterministic false negative, not the 2^-64
        # collision case
        hashed = F.struct(
            *[
                part
                for c in compare_cols
                for part in (F.col(c).isNull(), F.col(c))
            ]
        )
        return df.select(*keys, F.xxhash64(hashed).alias(alias))

    j = fp(old, "__old_h").join(fp(new, "__new_h"), keys, "full_outer")
    status = (
        F.when(F.col("__old_h").isNull(), F.lit("added"))
        .when(F.col("__new_h").isNull(), F.lit("removed"))
        .when(F.col("__old_h") != F.col("__new_h"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    out = j.withColumn(_STATUS, status).drop("__old_h", "__new_h")
    if not include_unchanged:
        out = out.filter(F.col(_STATUS) != "unchanged")
    return out


def table_diff_summary(
    old: DataFrame,
    new: DataFrame,
    keys: Sequence[str],
    *,
    compare_cols: Optional[Sequence[str]] = None,
) -> DataFrame:
    """(status, n_keys) counts over :func:`table_diff` INCLUDING
    ``unchanged`` — the one-line promotion gate ("0 removed, 12 changed,
    340 added").  Same skinny shuffle plus one bounded 4-row aggregate."""
    d = table_diff(
        old, new, keys, compare_cols=compare_cols, include_unchanged=True
    )
    return d.groupBy(_STATUS).agg(F.count(F.lit(1)).alias("n_keys"))
