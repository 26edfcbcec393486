"""Fuzzy record linkage (operators/matching.py): brute-force parity
within blocks, the blocking recall boundary, the block-size cap, null
handling, and the hash-join (no nested loop) plan."""

from __future__ import annotations

import itertools
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from json_to_avro_schema_spark.operators.matching import (  # noqa: E402
    block_stats,
    fuzzy_dedup_candidates,
    fuzzy_join,
)


def _lev(a, b):
    dp = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        prev, dp[0] = dp[0], i
        for j, cb in enumerate(b, 1):
            prev, dp[j] = dp[j], min(
                dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb)
            )
    return dp[len(b)]


LEFT = [
    (1, "jonathan smith", "js"),
    (2, "maria garcia", "mg"),
    (3, "wei chen", "wc"),
    (4, None, "js"),
    (5, "jon smith", None),
]
RIGHT = [
    (10, "jonathon smith", "js"),   # dist 1 to jonathan smith
    (11, "maria garcai", "mg"),     # dist 2 to maria garcia
    (12, "wei chen", "OTHER"),      # exact but WRONG BLOCK: never compared
    (13, "zzzz", "js"),
]


@pytest.fixture(scope="module")
def sides(spark):
    l = spark.createDataFrame(LEFT, "left_id long, name string, blk string")
    r = spark.createDataFrame(RIGHT, "right_id long, name string, blk string")
    return l, r


def test_fuzzy_join_matches_bruteforce(sides):
    l, r = sides
    got = sorted(
        (x["left_id"], x["right_id"], x["distance"])
        for x in fuzzy_join(
            l, r, on="name", block_on="blk", max_distance=2
        ).collect()
    )
    want = sorted(
        (li, ri, _lev(lv, rv))
        for li, lv, lb in LEFT
        for ri, rv, rb in RIGHT
        if lb is not None and rb is not None and lb == rb
        and lv is not None and rv is not None and _lev(lv, rv) <= 2
    )
    assert got == want
    # the planted semantics: same-block typos match, cross-block exact
    # duplicates do NOT (the documented blocking recall boundary)
    assert (1, 10, 1) in got and (2, 11, 2) in got
    assert all(ri != 12 for _, ri, _ in got)


def test_block_cap_drops_degenerate_blocks(spark):
    rows = [(i, f"name{i}", "HOT") for i in range(50)] + [
        (100, "abc", "cold"), (101, "abd", "cold")
    ]
    df = spark.createDataFrame(rows, "doc_id long, name string, blk string")
    capped = fuzzy_dedup_candidates(
        df, on="name", block_on="blk", max_distance=3, max_block_size=10
    ).collect()
    assert {(r["doc_id_1"], r["doc_id_2"]) for r in capped} == {(100, 101)}
    stats = {r["block_key"]: r["n_rows"] for r in block_stats(df, "blk").collect()}
    assert stats == {"HOT": 50, "cold": 2}
    # uncapped finds the HOT-block near-pairs too
    uncapped = fuzzy_dedup_candidates(
        df, on="name", block_on="blk", max_distance=3, max_block_size=None
    ).count()
    assert uncapped > 1


def test_dedup_candidates_bruteforce_and_plan(spark):
    rows = [
        (1, "alpha", "a"), (2, "alphq", "a"), (3, "alXha", "a"),
        (4, "beta", "b"), (5, "betas", "b"), (6, "gamma", "g"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, name string, blk string")
    out = fuzzy_dedup_candidates(df, on="name", block_on="blk", max_distance=1)
    got = sorted((r["doc_id_1"], r["doc_id_2"], r["distance"]) for r in out.collect())
    want = sorted(
        (a, b, _lev(va, vb))
        for (a, va, ba), (b, vb, bb) in itertools.combinations(rows, 2)
        if ba == bb and _lev(va, vb) <= 1
    )
    assert got == want
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
