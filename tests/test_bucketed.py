"""Bucketed co-located joins: matching bucket specs must elide the
Exchange entirely — the storage-level answer to re-joining the same
10^12-row corpus against its index tables every run."""

from __future__ import annotations

import os
import sys
from contextlib import contextmanager

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from json_to_avro_schema_spark.operators.text import fingerprint  # noqa: E402
from json_to_avro_schema_spark.sources.bucketed import (  # noqa: E402
    co_located_join,
    dedup_exact_colocated,
    write_bucketed,
)
from json_to_avro_schema_spark.sources.synthetic import (  # noqa: E402
    generate_documents_iv,
)


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("bucketed")
    docs = generate_documents_iv(spark, 5_000, violation_pct=5).withColumn(
        "fingerprint", fingerprint(F.to_json(F.col("spans")))
    )
    # historical index = fingerprints of the first 60% of docs
    index = docs.limit(3_000).select("fingerprint").distinct()
    write_bucketed(
        docs, "corpus_b", str(base / "corpus"), ["fingerprint"], n_buckets=8
    )
    write_bucketed(
        index, "index_b", str(base / "index"), ["fingerprint"], n_buckets=8
    )
    yield docs, index
    spark.sql("DROP TABLE IF EXISTS corpus_b")
    spark.sql("DROP TABLE IF EXISTS index_b")


def _physical_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@contextmanager
def _no_auto_broadcast(spark):
    """At 10^12 rows neither side is broadcastable; pin the at-scale plan by
    forcing the sort-merge path (auto-broadcast would otherwise kick in at
    sandbox scale and bypass the bucketed scan entirely)."""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        yield
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_colocated_join_has_no_exchange(spark, bucketed_tables):
    with _no_auto_broadcast(spark):
        joined = co_located_join(spark, "corpus_b", "index_b", ["fingerprint"])
        plan = _physical_plan(joined)
    assert "Exchange" not in plan, plan
    assert "Bucketed: true" in plan or "SelectedBucketsCount" in plan, plan


def test_colocated_antijoin_matches_plain(spark, bucketed_tables):
    docs, index = bucketed_tables
    with _no_auto_broadcast(spark):
        fresh = dedup_exact_colocated(spark, "corpus_b", "index_b")
        assert "Exchange" not in _physical_plan(fresh)
    expected = docs.join(index, ["fingerprint"], "left_anti")
    assert fresh.count() == expected.count()
    a = {r["doc_id"] for r in fresh.select("doc_id").collect()}
    b = {r["doc_id"] for r in expected.select("doc_id").collect()}
    assert a == b


def test_mismatched_bucket_count_still_correct(spark, bucketed_tables, tmp_path):
    """A mismatched bucket count can't co-locate — Spark must fall back to a
    correct (shuffled or one-side-coalesced) join, never a wrong result."""
    docs, index = bucketed_tables
    write_bucketed(
        index, "index_b4", str(tmp_path / "index4"), ["fingerprint"], n_buckets=4
    )
    try:
        joined = co_located_join(spark, "corpus_b", "index_b4", ["fingerprint"])
        expected = spark.table("corpus_b").join(index, ["fingerprint"], "inner")
        assert joined.count() == expected.count()
    finally:
        spark.sql("DROP TABLE IF EXISTS index_b4")
