"""Exact set-similarity join (operators/dedup.set_similarity_join,
AllPairs/PPJoin prefix filter): brute-force parity (recall MUST be 1.0 —
it's exact), random-corpus completeness, and the no-nested-loop plan."""

from __future__ import annotations

import itertools
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from json_to_avro_schema_spark.operators.dedup import (  # noqa: E402
    set_similarity_join,
)


def _brute(rows, t):
    sets = {i: set(txt.lower().split()) for i, txt in rows if txt.split()}
    out = []
    for a, b in itertools.combinations(sorted(sets), 2):
        inter = len(sets[a] & sets[b])
        union = len(sets[a] | sets[b])
        j = inter / union
        if j >= t:
            out.append((a, b, len(sets[a]), len(sets[b]), inter, round(j, 6)))
    return sorted(out)


CORPUS = [
    (1, "spark hash join merge sort window"),
    (2, "spark hash join merge sort filter"),          # J=5/7 with 1
    (3, "spark hash join merge sort window"),          # identical to 1
    (4, "completely different words entirely here"),
    (5, "spark hash"),                                 # small set
    (6, "hash spark"),                                 # identical set to 5
    (7, ""),                                           # empty: dropped
]


def test_matches_bruteforce_exactly(spark):
    df = spark.createDataFrame(CORPUS, "doc_id long, text string")
    for t in (0.5, 0.7, 1.0):
        got = sorted(
            tuple(r)
            for r in set_similarity_join(df, threshold=t).collect()
        )
        assert got == _brute(CORPUS, t), t
    # the planted facts
    got = {(
        r["doc_id_1"], r["doc_id_2"]
    ) for r in set_similarity_join(df, threshold=0.99).collect()}
    assert got == {(1, 3), (5, 6)}


def test_random_corpus_completeness(spark):
    # exactness on an adversarial random corpus: small vocab forces many
    # borderline pairs right at the threshold
    rng = np.random.RandomState(42)
    vocab = [f"w{i}" for i in range(25)]
    rows = [
        (i, " ".join(rng.choice(vocab, size=rng.randint(3, 15))))
        for i in range(120)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted(
        tuple(r) for r in set_similarity_join(df, threshold=0.6).collect()
    )
    assert got == _brute(rows, 0.6)
    assert len(got) > 0  # the corpus actually produced qualifying pairs


def test_no_nested_loop_in_plan(spark):
    df = spark.createDataFrame(CORPUS, "doc_id long, text string")
    plan = (
        set_similarity_join(df, threshold=0.7)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_threshold_validation(spark):
    df = spark.createDataFrame(CORPUS, "doc_id long, text string")
    with pytest.raises(ValueError):
        set_similarity_join(df, threshold=0.0)
    with pytest.raises(ValueError):
        set_similarity_join(df, threshold=1.5)
