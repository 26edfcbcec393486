"""Table snapshot diff: status semantics + the skinny-shuffle plan shape
(the join moves key+fingerprint rows, never the row bodies)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from json_to_avro_schema_spark.operators.diff import (
    table_diff,
    table_diff_summary,
)


@pytest.fixture(scope="module")
def snapshots(spark):
    old = spark.createDataFrame(
        [
            (1, "a", 10.0),   # unchanged
            (2, "b", 20.0),   # value changes
            (3, "c", 30.0),   # removed
            (4, None, 40.0),  # null value, unchanged (null == null here)
            (None, "e", 50.0),  # null key -> removed
        ],
        "k long, s string, v double",
    )
    new = spark.createDataFrame(
        [
            (1, "a", 10.0),
            (2, "b", 21.0),
            (4, None, 40.0),
            (5, "f", 60.0),     # added
            (None, "e", 50.0),  # null key -> added (never matches old's)
        ],
        "k long, s string, v double",
    )
    return old, new


def test_table_diff_statuses(snapshots):
    old, new = snapshots
    got = {r["k"]: r["status"] for r in table_diff(old, new, ["k"]).collect()}
    # the two null-key rows both surface; dict keeps one — check count below
    assert got[2] == "changed"
    assert got[3] == "removed"
    assert got[5] == "added"
    assert 1 not in got and 4 not in got  # unchanged dropped by default
    rows = table_diff(old, new, ["k"]).collect()
    null_key = sorted(r["status"] for r in rows if r["k"] is None)
    assert null_key == ["added", "removed"]  # null keys never match

    full = {
        (r["k"], r["status"])
        for r in table_diff(old, new, ["k"], include_unchanged=True).collect()
    }
    assert (1, "unchanged") in full and (4, "unchanged") in full


def test_table_diff_summary_and_compare_subset(snapshots):
    old, new = snapshots
    got = {
        r["status"]: r["n_keys"]
        for r in table_diff_summary(old, new, ["k"]).collect()
    }
    assert got == {"unchanged": 2, "changed": 1, "removed": 2, "added": 2}
    # restricting compare_cols to s makes key 2 (v-only change) unchanged
    sub = {r["k"]: r["status"]
           for r in table_diff(old, new, ["k"], compare_cols=["s"]).collect()}
    assert 2 not in sub


def test_table_diff_skinny_shuffle_plan(snapshots):
    old, new = snapshots
    plan = (
        table_diff(old, new, ["k"])
        ._jdf.queryExecution().executedPlan().toString()
        .split("== Initial Plan ==")[0]
    )
    # the exchanges carry (key, xxhash64) projections — the compare
    # columns are pruned before the shuffle, so their names never appear
    # in an exchange's output schema (only inside the xxhash64 args of
    # the pre-shuffle projection)
    assert "FullOuter" in plan
    for line in plan.splitlines():
        if "Exchange hashpartitioning" in line:
            assert "s#" not in line and "v#" not in line


def test_table_diff_validations(snapshots):
    old, new = snapshots
    with pytest.raises(ValueError, match="at least one key"):
        table_diff(old, new, [])
    with pytest.raises(ValueError, match="missing from old"):
        table_diff(old, new, ["nope"])
    with pytest.raises(ValueError, match="missing from old"):
        table_diff(old, new, ["k"], compare_cols=["only_old"])
    with pytest.raises(ValueError, match="missing from new"):
        table_diff(old.withColumn("x", F.lit(1)), new, ["k"],
                   compare_cols=["x"])
    with pytest.raises(ValueError, match="both sides"):
        table_diff(old, new, ["k"], compare_cols=["k", "s"])
    with pytest.raises(ValueError, match="no compare columns"):
        table_diff(old.select("k"), new.select("k"), ["k"])
    with pytest.raises(ValueError, match="collides"):
        table_diff(
            old.withColumnRenamed("s", "status"),
            new.withColumnRenamed("s", "status"),
            ["status"],
        )


def test_table_diff_detects_null_shift_and_rejects_dtype_drift(spark):
    # a value SHIFTING between same-typed columns (old goes null) must
    # read as changed — null flags ride the fingerprint
    old = spark.createDataFrame([(1, "v", None)], "k long, a string, b string")
    new = spark.createDataFrame([(1, None, "v")], "k long, a string, b string")
    assert [r["status"] for r in table_diff(old, new, ["k"]).collect()] == [
        "changed"
    ]
    # dtype drift between snapshots is refused, not silently all-changed
    widened = spark.createDataFrame([(1, 5)], "k long, v int")
    base = spark.createDataFrame([(1, 5)], "k long, v long")
    with pytest.raises(ValueError, match="dtypes differ"):
        table_diff(base, widened, ["k"])
