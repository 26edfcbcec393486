"""Similarity search over an embedding column (``array<float>``).

Two paths (training-data-pipeline ANN):

* **brute-force cosine top-k** — the correctness baseline: dot product via
  ``zip_with`` + ``aggregate`` HOFs (JVM-side), ``orderBy desc limit k``.
  O(N·d) per query; fine for one-off queries, the oracle path for the ANN
  variants.
* **LSH-bucketed (random hyperplanes)** — the scale path: H sign-bits of
  projections onto deterministic pseudo-random hyperplanes form a bucket id;
  a query only scans its own bucket (plus optional 1-bit probes). Hyperplanes
  are derived from a seed via hashing, so executors need no broadcast state
  and two runs agree bit-for-bit.

At 10^12 vectors the bucketed variant turns a full-scan top-k into a
(avg N/2^H)-row scan per probe; bucket ids are near-uniform by construction.
"""

from __future__ import annotations

import math
from typing import List, Optional, Sequence, Tuple

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x)
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def brute_force_topk(
    df: DataFrame,
    query: Sequence[float],
    *,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(id, cos_sim) of the k nearest vectors by cosine — exact baseline.

    The query vector is a literal array (constant-folded; no join, no
    broadcast needed). Top-k is a TakeOrdered — no full sort materializes.
    """
    q = F.array(*[F.lit(float(x)) for x in query])
    sim = cosine(F.col(vec_col).cast("array<double>"), q).alias("cos_sim")
    return (
        df.select(F.col(id_col), sim)
        .orderBy(F.col("cos_sim").desc(), F.col(id_col))
        .limit(k)
    )


# --------------------------------------------------- random-hyperplane LSH

def _hyperplane(dim: int, bit: int, seed: int) -> List[float]:
    """Deterministic pseudo-random unit-ish hyperplane from (seed, bit).

    Components via splitmix-style integer hashing → [-1, 1]; no RNG object,
    so driver and any re-run agree exactly.
    """
    comps = []
    for j in range(dim):
        x = (seed * 0x9E3779B97F4A7C15 + bit * 0xBF58476D1CE4E5B9 + j * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
        x ^= x >> 30
        x = (x * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
        x ^= x >> 27
        comps.append((x / 2**64) * 2.0 - 1.0)
    return comps


def lsh_bucket(vec: Column, dim: int, *, bits: int = 8, seed: int = 42) -> Column:
    """H-bit bucket id: bit h = sign(vec · hyperplane_h)."""
    bucket = F.lit(0).cast("long")
    for h in range(bits):
        plane = F.array(*[F.lit(c) for c in _hyperplane(dim, h, seed)])
        positive = dot(vec.cast("array<double>"), plane) > 0
        bucket = bucket.bitwiseOR(
            F.when(positive, F.shiftleft(F.lit(1).cast("long"), h)).otherwise(F.lit(0).cast("long"))
        )
    return bucket


def lsh_topk(
    df: DataFrame,
    query: Sequence[float],
    *,
    k: int = 10,
    bits: int = 8,
    seed: int = 42,
    probe_hamming: int = 1,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    bucket_col: Optional[str] = None,
) -> DataFrame:
    """ANN top-k: scan only buckets within ``probe_hamming`` bits of the
    query's bucket, exact cosine inside. Recall rises with probes; with
    probe_hamming = bits it degrades gracefully to brute force.

    Pass ``bucket_col`` when the table was WRITTEN with a materialized
    bucket column (computed via :func:`lsh_bucket` with the same
    bits/seed and used as a partition/bucketing key): the probe filter then
    lands on a stored column, so Catalyst prunes partitions/files instead
    of recomputing the bucket for every row of a full scan."""
    dim = len(query)
    q_list = [float(x) for x in query]
    # query bucket computed driver-side with the same hyperplanes
    qb = 0
    for h in range(bits):
        plane = _hyperplane(dim, h, seed)
        if sum(a * b for a, b in zip(q_list, plane)) > 0:
            qb |= 1 << h
    # probe set = every bucket within probe_hamming bit flips of the query
    # bucket (C(bits, ≤r) masks — tiny for practical bits); probe_hamming =
    # bits covers all 2^bits buckets, degrading exactly to brute force
    from itertools import combinations

    probes = [qb]
    for r in range(1, min(probe_hamming, bits) + 1):
        for flip in combinations(range(bits), r):
            m = 0
            for h in flip:
                m |= 1 << h
            probes.append(qb ^ m)

    qcol = F.array(*[F.lit(x) for x in q_list])
    sim = cosine(F.col(vec_col).cast("array<double>"), qcol).alias("cos_sim")
    if bucket_col is not None:
        # stored bucket column → the isin filter is pushed to the scan
        # (partition pruning / parquet row-group skipping)
        pruned = df.filter(F.col(bucket_col).isin(probes))
    else:
        bucket = lsh_bucket(F.col(vec_col), dim, bits=bits, seed=seed)
        pruned = df.withColumn("__bucket", bucket).filter(
            F.col("__bucket").isin(probes)
        )
    return (
        pruned.select(F.col(id_col), sim)
        .orderBy(F.col("cos_sim").desc(), F.col(id_col))
        .limit(k)
    )


# ------------------------------------------------------------------- IVF

def ivf_assign(
    df: DataFrame,
    centroids: List[List[float]],
    *,
    vec_col: str = "embedding",
) -> DataFrame:
    """Add ``__cell`` = index of the nearest centroid (max cosine).

    Centroids are literal arrays (constant-folded; no broadcast state).
    At scale the assignment is one codegen'd projection; writing the table
    bucketed/partitioned by ``__cell`` then gives list-level pruning.
    """
    best = F.lit(-1)
    best_sim = F.lit(float("-inf"))
    v = F.col(vec_col).cast("array<double>")
    for i, c in enumerate(centroids):
        cc = F.array(*[F.lit(float(x)) for x in c])
        sim = cosine(v, cc)
        better = sim > best_sim
        best = F.when(better, F.lit(i)).otherwise(best)
        best_sim = F.when(better, sim).otherwise(best_sim)
    return df.withColumn("__cell", best)


def ivf_train_centroids(
    df: DataFrame,
    *,
    k: int = 16,
    iters: int = 3,
    train_sample: int = 50_000,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> List[List[float]]:
    """Deterministic mini k-means for IVF coarse quantization.

    Standard IVF practice (what FAISS does): the coarse quantizer trains on
    a BOUNDED deterministic sample (smallest ``train_sample`` ids via
    TakeOrdered — never a full-table collect), so training cost is
    independent of table size; only the final assignment pass touches all
    rows. The sample is collected once and the k-means iterations run
    driver-side in numpy — at 50k×128 floats that is ~25 MB and
    milliseconds per iteration, vs one Spark job (with a k×dim-literal
    codegen'd plan) per iteration for a cluster round-trip that computes
    the same k×dim floats. Init = the k vectors with the smallest ids
    (no RNG, bit-reproducible); empty cells keep their previous centroid.
    """
    import numpy as np

    rows = (
        df.filter(F.col(vec_col).isNotNull())
        .orderBy(id_col)
        .limit(train_sample)
        .select(vec_col)
        .collect()
    )
    if not rows:
        return []
    x = np.asarray([list(r[vec_col]) for r in rows], dtype=np.float64)
    xn = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-300)
    centroids = x[: min(k, len(x))].copy()
    for _ in range(iters):
        cn = centroids / np.maximum(
            np.linalg.norm(centroids, axis=1, keepdims=True), 1e-300
        )
        # argmax keeps the FIRST max — same lowest-index tiebreak as the
        # previous Column-chain implementation
        cells = np.argmax(xn @ cn.T, axis=1)
        for c in range(len(centroids)):
            members = x[cells == c]
            if len(members):
                centroids[c] = members.mean(axis=0)
    return [[float(v) for v in c] for c in centroids]


def ivf_topk(
    df: DataFrame,
    query: Sequence[float],
    centroids: List[List[float]],
    *,
    k: int = 10,
    nprobe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF ANN top-k: scan only the ``nprobe`` cells whose centroids are
    closest to the query; exact cosine inside. Complements lsh_topk —
    IVF adapts to the data distribution, LSH needs no training pass."""
    q = [float(x) for x in query]
    probes = _probe_cells(q, centroids, nprobe)
    qcol = F.array(*[F.lit(x) for x in q])
    sim = cosine(F.col(vec_col).cast("array<double>"), qcol).alias("cos_sim")
    return (
        ivf_assign(df, centroids, vec_col=vec_col)
        .filter(F.col("__cell").isin(probes))
        .select(F.col(id_col), sim)
        .orderBy(F.col("cos_sim").desc(), F.col(id_col))
        .limit(k)
    )


def _cos_py(a: Sequence[float], b: Sequence[float]) -> float:
    num = sum(x * y for x, y in zip(a, b))
    na = math.sqrt(sum(x * x for x in a))
    nb = math.sqrt(sum(x * x for x in b))
    return num / (na * nb) if na and nb else 0.0


def _probe_cells(
    q: Sequence[float], centroids: List[List[float]], nprobe: int
) -> List[int]:
    order = sorted(
        range(len(centroids)), key=lambda i: -_cos_py(q, centroids[i])
    )
    return order[:nprobe]


def ivf_write_index(
    df: DataFrame,
    path: str,
    centroids: List[List[float]],
    *,
    vec_col: str = "embedding",
) -> None:
    """Materialize the IVF index: assign each vector to its cell and write
    the table ``partitionBy("__cell")``. This is the storage layout that
    makes IVF *prune* at scale — a search touches only the ``nprobe``
    probed cell directories (Hive partition pruning at planning time), so
    scan cost is O(N·nprobe/k) instead of a full pass with a post-filter.
    One-time cost; the assignment is a codegen'd projection."""
    (
        ivf_assign(df, centroids, vec_col=vec_col)
        .write.mode("overwrite")
        .partitionBy("__cell")
        .parquet(path)
    )


def ivf_topk_indexed(
    spark,
    path: str,
    query: Sequence[float],
    centroids: List[List[float]],
    *,
    k: int = 10,
    nprobe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF top-k over a cell-partitioned index written by
    :func:`ivf_write_index`. The ``__cell IN (probes)`` predicate is a
    partition filter — Spark enumerates only the probed directories; the
    un-probed cells are never read (verify: ``.inputFiles()`` lists files
    from ≤ nprobe partitions). Same results as :func:`ivf_topk` on the
    source table with identical centroids/nprobe."""
    q = [float(x) for x in query]
    probes = _probe_cells(q, centroids, nprobe)
    qcol = F.array(*[F.lit(x) for x in q])
    sim = cosine(F.col(vec_col).cast("array<double>"), qcol).alias("cos_sim")
    return (
        spark.read.parquet(path)
        .filter(F.col("__cell").isin(probes))
        .select(F.col(id_col), sim)
        .orderBy(F.col("cos_sim").desc(), F.col(id_col))
        .limit(k)
    )


def embedding_near_duplicates(
    df: DataFrame,
    *,
    threshold: float = 0.95,
    bits: Optional[int] = None,
    seed: int = 42,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    target_bucket_rows: int = 256,
) -> DataFrame:
    """Embedding-cosine near-dup pairs (id_a < id_b, cos_sim ≥ threshold).

    Same-bucket join only — O(Σ bucket²) not O(N²); high-cosine pairs land in
    the same bucket with probability (1 − θ/π)^bits for angle θ.

    ``bits`` defaults to ``log2(N / target_bucket_rows)`` from a cheap
    count, clamped to [8, 28]: a fixed bit width would make the same-bucket
    self-join O(N²/2^bits) — quadratic blowup once N outgrows the bucket
    table. Pass ``bits`` explicitly to pin the bucket layout (e.g. when the
    table was written bucketed by a known width).
    """
    if bits is None:
        n = df.count()
        bits = max(8, min(28, int(math.ceil(math.log2(max(n / target_bucket_rows, 2.0))))))
    first = df.filter(F.col(vec_col).isNotNull()).select(vec_col).first()
    dim = len(first[vec_col]) if first else 0
    bucket = lsh_bucket(F.col(vec_col), dim, bits=bits, seed=seed)
    base = df.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("v"), bucket.alias("b")
    )
    l, r = base.alias("l"), base.alias("r")
    pairs = (
        l.join(r, "b")
        .filter(F.col("l.id") < F.col("r.id"))
        .select(
            F.col("l.id").alias("id_a"),
            F.col("r.id").alias("id_b"),
            cosine(
                F.col("l.v").cast("array<double>"), F.col("r.v").cast("array<double>")
            ).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
        .distinct()
    )
    return pairs


def semantic_dedup(
    df: DataFrame,
    *,
    threshold: float = 0.95,
    k_cells: int = 16,
    iters: int = 3,
    train_sample: int = 50_000,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    centroids: Optional[List[List[float]]] = None,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning at
    web-scale through semantic deduplication"): cluster embeddings with
    the IVF coarse quantizer, then within each cluster drop every row
    whose cosine with ANY lower-id row of the same cluster reaches
    ``threshold``. Returns the kept rows.

    Keep policy: lowest id per semantic-duplicate neighborhood —
    deterministic, order-free, and SQL-expressible (NOT EXISTS), where
    the paper's keep-farthest-from-centroid depends on the trained
    centroid values; near threshold 1 the policies differ only in WHICH
    twin survives. Cross-cluster near-dups are invisible by design (the
    paper's accepted trade: clustering bounds the pairwise term — scale
    ``k_cells`` with N, e.g. tens of thousands of cells at 10^8+ rows).

    Scale shape: centroid training is bounded
    (:func:`ivf_train_centroids`: deterministic sample, driver-side
    numpy); assignment is one codegen'd projection of centroid literals;
    the within-cell self-join shuffles the table ONCE on ``__cell`` and
    its quadratic term is bounded by the largest cell. Rows with a null
    ``vec_col`` are kept untouched (cosine with null is null, never ≥
    threshold)."""
    if centroids is None and k_cells < 1:
        raise ValueError(f"k_cells must be >= 1, got {k_cells}")
    cents = centroids if centroids is not None else ivf_train_centroids(
        df, k=k_cells, iters=iters, train_sample=train_sample,
        vec_col=vec_col, id_col=id_col,
    )
    if not cents:
        return df
    base = ivf_assign(df, cents, vec_col=vec_col).select(
        F.col(id_col).alias("__id"), F.col(vec_col).alias("__v"), "__cell"
    )
    l, r = base.alias("l"), base.alias("r")
    dropped = (
        l.join(r, "__cell")
        .filter(F.col("l.__id") > F.col("r.__id"))
        .filter(
            cosine(
                F.col("l.__v").cast("array<double>"),
                F.col("r.__v").cast("array<double>"),
            )
            >= threshold
        )
        .select(F.col("l.__id").alias(id_col))
        .distinct()
    )
    return df.join(dropped, id_col, "left_anti")


def vector_stats(
    df: DataFrame,
    vec_col: str = "embedding",
    *,
    expected_dim: Optional[int] = None,
    norm_bounds: Optional[Tuple[float, float]] = None,
) -> DataFrame:
    """Embedding-column validation in ONE fused aggregation: dimension
    consistency, NaN/null contamination, and L2-norm distribution — the
    checks a training pipeline runs before indexing vectors.

    All JVM-side (size / exists / aggregate HOFs — no UDF). Output is a
    single row: n_rows, n_null_vec, n_dim_mismatch (vs expected_dim, or vs
    the modal observed dim when omitted — pass it explicitly at scale to
    keep this single-pass), n_with_nan, min/max/mean of the L2 norm.
    """
    v = F.col(vec_col)
    if expected_dim is None:
        modal = (
            df.filter(v.isNotNull())
            .groupBy(F.size(v).alias("d"))
            .count()
            .orderBy(F.col("count").desc(), "d")
            .first()
        )
        # empty / all-null column: no modal dim exists — report dim 0 (every
        # counter below still comes out well-defined: 0 mismatches, n nulls)
        expected_dim = modal["d"] if modal is not None else 0
    aggs = vector_stat_aggs(vec_col, expected_dim, norm_bounds)
    return df.agg(*aggs).withColumn("expected_dim", F.lit(expected_dim))


def vector_stat_aggs(
    vec_col: str,
    expected_dim: int,
    norm_bounds: Optional[Tuple[float, float]] = None,
    *,
    prefix: str = "",
) -> List[Column]:
    """The :func:`vector_stats` aggregate expressions as a reusable list so
    callers (table_checks) can FUSE them into one shared scan with other
    check families. Aliases are ``{prefix}{name}``."""
    v = F.col(vec_col)
    has_nan = F.exists(v, lambda x: x.isNull() | F.isnan(x))
    good_norm = F.when(v.isNotNull() & ~has_nan, norm(v))
    aggs = [
        F.count(F.lit(1)).alias(f"{prefix}n_rows"),
        F.sum(v.isNull().cast("long")).alias(f"{prefix}n_null_vec"),
        F.sum((v.isNotNull() & (F.size(v) != F.lit(expected_dim))).cast("long"))
        .alias(f"{prefix}n_dim_mismatch"),
        F.sum((v.isNotNull() & has_nan).cast("long")).alias(f"{prefix}n_with_nan"),
        F.min(good_norm).alias(f"{prefix}norm_min"),
        F.max(good_norm).alias(f"{prefix}norm_max"),
        F.avg(good_norm).alias(f"{prefix}norm_mean"),
    ]
    if norm_bounds is not None:
        lo, hi = norm_bounds
        oob = (good_norm < F.lit(float(lo))) | (good_norm > F.lit(float(hi)))
        aggs.append(F.sum(oob.cast("long")).alias(f"{prefix}n_norm_oob"))
    else:
        aggs.append(F.sum(F.lit(0)).cast("long").alias(f"{prefix}n_norm_oob"))
    return aggs
