"""Referential-integrity checks: child keys ⊆ parent keys (SURVEY.md §2.3).

The spec-language counterpart is a cross-table ``$ref`` (reference analog:
$ref resolution, Transpiler.scala:334-345 — retargeted from intra-document
name reuse to inter-table key containment).

Spark shape: ``left_anti`` join child→parent for violations, ``left_semi``
for passes.  The parent side is usually a dimension — broadcast it when it
fits; when the parent itself is huge (validating FKs against a 10^12-row
table), the anti-join becomes a shuffle join on the key, which AQE converts
back to broadcast at runtime if the deduped key set turns out small, and
splits skewed partitions otherwise.  ``broadcast_parent="auto"`` (default)
picks per Catalyst's size estimate — never force-broadcasting an unbounded
parent.  Only the key columns of the parent are shuffled/broadcast (column
pruning by construction).
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# broadcast_parent modes: True forces F.broadcast (caller knows the dim is
# small), False never broadcasts (shuffle anti-join, AQE may still convert at
# runtime), "auto" — the scale-safe default — broadcasts only when Catalyst's
# optimized-plan size estimate for the deduped key projection fits the
# threshold. Forcing broadcast of a 10^12-row parent OOMs the driver; "auto"
# keeps the small-dim fast path without that failure mode.
#
# "auto" caveats (behavior change from the round-1 force-broadcast default):
# the estimate comes from a full Catalyst analyze+optimize of the keys plan
# (one driver-side planning pass per call — cheap next to the job, but not
# free), and NON-FILE-BACKED parents (in-memory DataFrames, views without
# stats) estimate at defaultSizeInBytes — effectively huge — so they take the
# shuffle path pre-AQE. Callers with known-small in-memory dims should pass
# broadcast_parent=True to keep the deterministic broadcast plan.
AUTO_BROADCAST_BYTES = 64 * 1024 * 1024

BroadcastMode = Union[bool, str]


def _keys_only(parent: DataFrame, ref_columns: Sequence[str], columns: Sequence[str]) -> DataFrame:
    sel = [F.col(rc).alias(c) for rc, c in zip(ref_columns, columns)]
    return parent.select(*sel).dropDuplicates(list(columns))


def _maybe_broadcast(
    keys: DataFrame, mode: BroadcastMode, threshold_bytes: int
) -> DataFrame:
    if mode is True:
        return F.broadcast(keys)
    if mode is False:
        return keys
    if mode != "auto":
        raise ValueError(f"broadcast_parent must be True/False/'auto', got {mode!r}")
    try:
        # Catalyst's own pre-execution size estimate (column-pruned, deduped
        # key projection). BigInt via py4j; falls back to the shuffle path
        # (AQE can still convert to broadcast at runtime from ACTUAL sizes).
        stats = keys._jdf.queryExecution().optimizedPlan().stats()
        size = int(stats.sizeInBytes().toString())
    except Exception:
        return keys
    return F.broadcast(keys) if size <= threshold_bytes else keys


def ri_violations(
    child: DataFrame,
    parent: DataFrame,
    columns: Sequence[str],
    ref_columns: Optional[Sequence[str]] = None,
    *,
    broadcast_parent: BroadcastMode = "auto",
    broadcast_threshold_bytes: int = AUTO_BROADCAST_BYTES,
) -> DataFrame:
    """Child rows whose key has no match in the parent (dangling refs).

    Null child keys are NOT violations (SQL FK semantics: null opts out).
    Child rows pass through the anti-join byte-identical — Spark's anti join
    only reads the parent's keys.
    """
    ref_columns = list(ref_columns or columns)
    keys = _maybe_broadcast(
        _keys_only(parent, ref_columns, columns),
        broadcast_parent,
        broadcast_threshold_bytes,
    )
    non_null = child
    for c in columns:
        non_null = non_null.filter(F.col(c).isNotNull())
    return non_null.join(keys, list(columns), "left_anti")


def ri_verdict(
    child: DataFrame,
    parent: DataFrame,
    columns: Sequence[str],
    ref_columns: Optional[Sequence[str]] = None,
    *,
    by: Optional[str] = None,
    broadcast_parent: BroadcastMode = "auto",
    broadcast_threshold_bytes: int = AUTO_BROADCAST_BYTES,
) -> DataFrame:
    """(part_key, n_rows, n_dangling, pass) — one anti-join + one agg."""
    ref_columns = list(ref_columns or columns)
    keys = _maybe_broadcast(
        _keys_only(parent, ref_columns, columns).withColumn("__hit", F.lit(True)),
        broadcast_parent,
        broadcast_threshold_bytes,
    )
    joined = child.join(keys, list(columns), "left")
    key_col = F.col(by) if by else F.lit("__all__")
    has_key = F.lit(True)
    for c in columns:
        has_key = has_key & F.col(c).isNotNull()
    dangling = (has_key & F.col("__hit").isNull()).cast("long")
    out = joined.groupBy(key_col.alias("part_key")).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(dangling).alias("n_dangling"),
    )
    return out.withColumn("pass", F.col("n_dangling") == 0)


def exploded_span_refs(documents: DataFrame) -> DataFrame:
    """Flatten media span refs for RI against a media_assets table:
    (doc_id, part_key?, media_ref). Explode prunes to the two needed columns
    before the shuffle."""
    cols = [F.col("doc_id")]
    if "part_key" in documents.columns:
        cols.append(F.col("part_key"))
    return (
        documents.select(*cols, F.explode("spans").alias("s"))
        .filter(F.col("s.media_ref").isNotNull())
        .select(*cols, F.col("s.media_ref").alias("media_ref"))
    )


# ---------------------------------------------------------------------------
# Bloom-filter RI pre-filter (runtime-filter semantics, made explicit)
# ---------------------------------------------------------------------------
#
# The exact anti-join above shuffles the child's key columns.  At 10^12 child
# rows that shuffle — even column-pruned — is the dominant cost of an RI
# check whose answer is usually "almost everything matches".  A Bloom filter
# built over the parent keys inverts the cost model: the bitmap is built with
# ONE tiny aggregation on the parent (the shuffle carries at most
# n_bits/64 rows — one per 64-bit word — regardless of parent size), the
# driver holds n_bits/8 bytes (2 MiB at the 2^24 default), and the child side
# is probed MAP-SIDE with zero shuffle.  Bloom filters have no false
# negatives, so every key the probe rejects is DEFINITELY dangling; false
# positives mean a ~fpp fraction of true violations is missed, where
# fpp ≈ (1 - e^(-k·n/m))^k for n parent keys, m bits, k hashes.  This is the
# same trade Spark's own runtime bloom-filter join pruning makes — exposed
# here as an explicit, tunable validation operator: use it as a cheap first
# pass at full scale (violations it reports need no verification), and run
# the exact anti-join only when a zero-miss guarantee is required.
#
# Build and probe MUST agree bit-for-bit, so both sides derive positions from
# the same JVM expression (xxhash64 seeded per probe); only the final bit
# test drops to Python — one Arrow-vectorized numpy gather per batch, the
# narrow case the brief's UDF rule reserves pandas_udf for (a 2 MiB bitmap
# cannot be a codegen literal, and a word-table join would cost the very
# shuffle the operator exists to avoid).

_BLOOM_MAX_BITS = 1 << 30  # 128 MiB bitmap — driver/executor broadcast bound


def _bloom_positions(cols: Sequence[str], n_bits: int, n_hashes: int):
    """Array column of the key's ``n_hashes`` bit positions — the ONE
    definition both the parent build and the child probe compile."""
    return F.array(*[
        F.pmod(F.xxhash64(F.lit(i), *[F.col(c) for c in cols]), F.lit(n_bits))
        for i in range(n_hashes)
    ])


def bloom_build(
    parent: DataFrame,
    ref_columns: Sequence[str],
    *,
    n_bits: int = 1 << 24,
    n_hashes: int = 5,
):
    """Distributed Bloom-bitmap build over the parent's key columns.

    One hash-aggregate job: explode each key's positions to
    (word_index, bit_mask) and ``bit_or`` per word — partial aggregation
    collapses every task's contribution to ≤ n_bits/64 rows map-side, so
    the shuffle is bitmap-sized, never parent-sized (no dropDuplicates
    pass: OR-ing a key's bits twice is idempotent and cheaper than a
    key-scale dedup shuffle).  Returns a ``numpy.int64`` array of
    n_bits/64 words (bit tests use arithmetic shift + ``& 1``, which is
    sign-safe).  Null-containing keys are skipped — SQL FK semantics
    (null opts out), matching :func:`ri_violations`.
    """
    if n_bits % 64 or n_bits <= 0 or n_bits > _BLOOM_MAX_BITS:
        raise ValueError(
            f"n_bits must be a positive multiple of 64 ≤ {_BLOOM_MAX_BITS}, "
            f"got {n_bits}"
        )
    if n_hashes < 1:
        raise ValueError(f"n_hashes must be ≥ 1, got {n_hashes}")
    import numpy as np

    has_key = F.lit(True)
    for c in ref_columns:
        has_key = has_key & F.col(c).isNotNull()
    words = (
        parent.filter(has_key)
        .select(
            F.explode(
                _bloom_positions(list(ref_columns), n_bits, n_hashes)
            ).alias("__pos")
        )
        .select(
            (F.col("__pos") / 64).cast("long").alias("__word"),
            F.expr("shiftleft(1L, cast(__pos % 64 as int))").alias("__mask"),
        )
        .groupBy("__word")
        .agg(F.bit_or("__mask").alias("__bits"))
        .collect()
    )
    bitmap = np.zeros(n_bits // 64, dtype=np.int64)
    for r in words:
        bitmap[r["__word"]] = r["__bits"]
    return bitmap


def bloom_ri_violations(
    child: DataFrame,
    parent: DataFrame,
    columns: Sequence[str],
    ref_columns: Optional[Sequence[str]] = None,
    *,
    n_bits: int = 1 << 24,
    n_hashes: int = 5,
) -> DataFrame:
    """Child rows whose key is DEFINITELY absent from the parent — the
    zero-child-shuffle approximate RI check.

    Exactness contract: every returned row is a true violation (no false
    negatives in the bloom ⇒ no false accusations here); a ~fpp fraction
    of true violations is NOT returned (bloom false positives look like
    matches).  With the 2^24-bit / 5-hash default the miss rate stays
    < 1e-6 up to ~10^5 parent keys and < 1 % up to ~10^6; size n_bits to
    the parent's distinct-key count for larger dimensions, or follow up
    with the exact :func:`ri_violations` when zero-miss is required.

    Plan shape: the parent contributes one bitmap-bounded aggregation
    (see :func:`bloom_build`); the child side is scan → position
    projection (JVM xxhash64) → one Arrow-batched bit test → filter —
    NO exchange on the child (plan-pinned in tests), which is the whole
    point at a 10^12-row child.  Null child keys opt out, matching
    :func:`ri_violations`.
    """
    from pyspark.sql.pandas.functions import pandas_udf

    ref_columns = list(ref_columns or columns)
    bitmap = bloom_build(
        parent, ref_columns, n_bits=n_bits, n_hashes=n_hashes
    )
    bc = child.sparkSession.sparkContext.broadcast(bitmap)

    @pandas_udf("boolean")
    def _might_contain(positions):
        import numpy as np
        import pandas as pd

        if not len(positions):
            return pd.Series([], dtype="bool")
        bm = bc.value
        arr = np.vstack(positions.to_numpy()).astype(np.int64)  # (n, k)
        hits = (bm[arr >> 6] >> (arr & 63)) & 1
        return pd.Series(hits.all(axis=1))

    has_key = F.lit(True)
    for c in columns:
        has_key = has_key & F.col(c).isNotNull()
    probe = _bloom_positions(list(columns), n_bits, n_hashes)
    return (
        child.withColumn("__bloom_hit", _might_contain(probe))
        .filter(has_key & ~F.col("__bloom_hit"))
        .drop("__bloom_hit")
    )
