"""Deterministic sampling: key-stable membership must survive reruns,
repartitioning, and seed nesting — the reproducibility contract
``df.sample()`` (per-task RNG) cannot give."""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from json_to_avro_schema_spark.operators.sampling import (  # noqa: E402
    HASH_SPACE,
    bucket_sql,
    deterministic_sample,
    deterministic_topn_sample,
    sample_bucket,
    stratified_sample,
    train_test_split,
)


@pytest.fixture(scope="module")
def keys_df(spark):
    return spark.range(20_000).withColumnRenamed("id", "doc_id")


def _ids(df):
    return {r["doc_id"] for r in df.select("doc_id").collect()}


def test_sample_is_stable_and_partition_independent(spark, keys_df):
    a = _ids(deterministic_sample(keys_df, "doc_id", 0.2, seed="s1"))
    b = _ids(deterministic_sample(keys_df, "doc_id", 0.2, seed="s1"))
    c = _ids(
        deterministic_sample(keys_df.repartition(7), "doc_id", 0.2, seed="s1")
    )
    assert a == b == c
    assert abs(len(a) / 20_000 - 0.2) < 0.02


def test_different_seeds_differ(spark, keys_df):
    a = _ids(deterministic_sample(keys_df, "doc_id", 0.2, seed="s1"))
    b = _ids(deterministic_sample(keys_df, "doc_id", 0.2, seed="s2"))
    assert a != b


def test_samples_nest_by_fraction(spark, keys_df):
    small = _ids(deterministic_sample(keys_df, "doc_id", 0.1, seed="s1"))
    big = _ids(deterministic_sample(keys_df, "doc_id", 0.3, seed="s1"))
    assert small < big


def test_split_partitions_rows_exactly(spark, keys_df):
    split = train_test_split(keys_df, "doc_id", 0.25, seed="s1")
    counts = {
        r["split"]: r["n"]
        for r in split.groupBy("split").agg(F.count("*").alias("n")).collect()
    }
    assert counts["test"] + counts["train"] == 20_000
    assert abs(counts["test"] / 20_000 - 0.25) < 0.02
    # the test side IS the same-seed sample (one hash, thresholded)
    assert _ids(split.filter(F.col("split") == "test")) == _ids(
        deterministic_sample(keys_df, "doc_id", 0.25, seed="s1")
    )


def test_stratified_respects_per_stratum_fractions(spark, keys_df):
    df = keys_df.withColumn(
        "src", F.when(F.col("doc_id") % 2 == 0, "a").otherwise("b")
    )
    out = stratified_sample(
        df, "src", {"a": 0.5, "b": 0.1}, "doc_id", seed="s1"
    )
    counts = {
        r["src"]: r["n"]
        for r in out.groupBy("src").agg(F.count("*").alias("n")).collect()
    }
    assert abs(counts["a"] / 10_000 - 0.5) < 0.03
    assert abs(counts["b"] / 10_000 - 0.1) < 0.03
    # default_fraction=0: unlisted strata are dropped entirely
    none = stratified_sample(df, "src", {"a": 0.5}, "doc_id", seed="s1")
    assert none.filter(F.col("src") == "b").count() == 0


def test_stratified_large_map_broadcast_path_equivalent(spark, keys_df):
    """>64 strata switches to the broadcast-lookup path; membership must be
    identical to the CASE path for the shared strata."""
    df = keys_df.withColumn(
        "src", F.concat(F.lit("s"), (F.col("doc_id") % 100).cast("string"))
    )
    big = {f"s{i}": 0.3 if i % 2 == 0 else 0.05 for i in range(100)}
    out_big = stratified_sample(df, "src", big, "doc_id", seed="s1")
    # CASE path over the same two fractions, restricted to two strata
    small = {"s0": 0.3, "s1": 0.05}
    out_small = stratified_sample(
        df.filter(F.col("src").isin("s0", "s1")),
        "src",
        small,
        "doc_id",
        seed="s1",
    )
    a = _ids(out_big.filter(F.col("src").isin("s0", "s1")))
    assert a == _ids(out_small)
    assert out_big.columns == df.columns


def test_topn_exact_size_and_deterministic(spark, keys_df):
    a = deterministic_topn_sample(keys_df, "doc_id", 500, seed="s1")
    assert a.count() == 500
    b = _ids(
        deterministic_topn_sample(
            keys_df.repartition(5), "doc_id", 500, seed="s1"
        )
    )
    assert _ids(a) == b
    # equals the 500 smallest buckets computed independently
    expected = {
        r["doc_id"]
        for r in keys_df.select(
            "doc_id", sample_bucket(F.col("doc_id"), "s1").alias("b")
        )
        .orderBy("b", "doc_id")
        .limit(500)
        .collect()
    }
    assert _ids(a) == expected


def test_bucket_matches_duckdb_oracle(spark, keys_df):
    """The Spark bucket and the oracle-side SQL rendering must agree
    bit-for-bit — this is what makes every sampling operator oracle-able."""
    got = {
        r["doc_id"]: r["b"]
        for r in keys_df.limit(200)
        .select("doc_id", sample_bucket(F.col("doc_id"), "s42").alias("b"))
        .collect()
    }
    con = duckdb.connect()
    expr = bucket_sql("r", seed="s42")
    want = dict(
        con.execute(
            f"SELECT r, {expr} FROM range(200) t(r)"
        ).fetchall()
    )
    assert got == want


def test_bad_fraction_rejected(spark, keys_df):
    with pytest.raises(ValueError):
        deterministic_sample(keys_df, "doc_id", 1.5)


def test_sample_filter_plan_has_no_shuffle(spark, keys_df):
    plan = (
        deterministic_sample(keys_df, "doc_id", 0.2, seed="s1")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan, plan


def test_weighted_sample_matches_python_rederivation(spark):
    import hashlib
    import math

    from json_to_avro_schema_spark.operators.sampling import weighted_sample

    rows = [(i, float(1 + (i * 7) % 50)) for i in range(2_000)]
    df = spark.createDataFrame(rows, "doc_id long, w double")
    got = [
        (r["doc_id"], r["w"], r["priority"])
        for r in weighted_sample(df, "doc_id", "w", 25, seed="s1").collect()
    ]

    def _pr(k, w):
        b = int(hashlib.md5(f"s1{k}".encode()).hexdigest()[:8], 16)
        return round(math.log((b + 1) / HASH_SPACE) / w, 9)

    want = sorted(
        ((k, w, _pr(k, w)) for k, w in rows),
        key=lambda r: (-r[2], r[0]),
    )[:25]
    assert got == want


def test_weighted_sample_biases_toward_heavy_weights(spark):
    from json_to_avro_schema_spark.operators.sampling import weighted_sample

    # 2k keys: even ids weight 10, odd ids weight 1 -> even ids must
    # dominate the sample (expected share 10/11)
    df = spark.range(2_000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 2 == 0, 10.0).otherwise(1.0).alias("w"),
    )
    got = weighted_sample(df, "doc_id", "w", 200, seed="bias")
    n_even = got.filter(F.col("doc_id") % 2 == 0).count()
    assert n_even > 150  # expected ~182, uniform would be ~100


def test_weighted_sample_drops_bad_rows_and_plan(spark):
    from json_to_avro_schema_spark.operators.sampling import weighted_sample

    df = spark.createDataFrame(
        [(1, 5.0), (2, 0.0), (3, -1.0), (4, None), (None, 5.0), (5, 2.0)],
        "doc_id long, w double",
    )
    got = weighted_sample(df, "doc_id", "w", 10)
    assert {r["doc_id"] for r in got.collect()} == {1, 5}
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, plan


def test_weighted_priority_sql_matches_spark(spark):
    from json_to_avro_schema_spark.operators.sampling import (
        weighted_priority_sql,
        weighted_sample,
    )

    rows = [(i, float(1 + i % 9)) for i in range(500)]
    df = spark.createDataFrame(rows, "doc_id long, w double")
    got = [
        (r["doc_id"], r["priority"])
        for r in weighted_sample(df, "doc_id", "w", 20, seed="qq").collect()
    ]
    con = duckdb.connect()
    con.register("t", __import__("pandas").DataFrame(rows, columns=["doc_id", "w"]))
    want = con.execute(
        "SELECT doc_id, "
        + weighted_priority_sql("doc_id", "w", "qq")
        + " AS priority FROM t WHERE doc_id IS NOT NULL AND w > 0 "
        "ORDER BY priority DESC, doc_id LIMIT 20"
    ).fetchall()
    assert got == [(k, p) for k, p in want]
