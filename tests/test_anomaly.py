"""operators/anomaly.py: cross-run metric anomaly detection."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from json_to_avro_schema_spark.operators.anomaly import (
    checkpoint_anomalies,
    metric_anomalies,
)


@pytest.fixture()
def metrics(spark):
    rows = []
    # A: stable; B: zero-variance history, current 10x (rel rule);
    # C: noisy history, huge current (z rule); D: vanishes in current run;
    # E: first appears in current run; F: only 1 history run
    for run in (1, 2, 3, 4):
        rows += [
            (run, "A", 10.0 + (run % 2)),       # 11,10,11,10
            (run, "B", 10.0),
            (run, "C", float([10, 12, 8, 10][run - 1])),
            (run, "D", 5.0),
        ]
    rows += [(4, "F", 7.0)]
    rows += [
        (5, "A", 10.0), (5, "B", 100.0), (5, "C", 30.0),
        (5, "E", 1.0), (5, "F", 7.0),
    ]
    return spark.createDataFrame(rows, "run int, key string, v double")


def test_rules_fire_per_key(spark, metrics):
    out = {
        r["key"]: r
        for r in metric_anomalies(metrics, "run", "key", "v", 5).collect()
    }
    assert not out["A"]["anomalous"] and out["A"]["reason"] is None
    assert out["B"]["anomalous"] and out["B"]["reason"] == "rel"
    assert out["B"]["hist_std"] == 0.0 and out["B"]["z_score"] is None
    assert out["B"]["rel_change"] == pytest.approx(9.0)
    assert out["C"]["anomalous"] and out["C"]["reason"] == "z"
    assert out["C"]["z_score"] > 3
    assert out["D"]["anomalous"] and out["D"]["reason"] == "missing"
    assert out["D"]["current"] is None
    assert out["E"]["insufficient_history"] and not out["E"]["anomalous"]
    assert out["F"]["insufficient_history"] and not out["F"]["anomalous"]
    assert out["F"]["hist_n"] == 1


def test_thresholds_are_respected(spark, metrics):
    # with huge thresholds nothing but 'missing' fires
    out = {
        r["key"]: r
        for r in metric_anomalies(
            metrics, "run", "key", "v", 5,
            z_threshold=1e9, rel_threshold=1e9,
        ).collect()
    }
    flagged = {k for k, r in out.items() if r["anomalous"]}
    assert flagged == {"D"}


def test_history_is_strictly_before_current(spark, metrics):
    # runs AFTER current must not contaminate history: add a wild run 6
    plus = metrics.union(
        metrics.sparkSession.createDataFrame(
            [(6, "A", 1e9)], "run int, key string, v double"
        )
    )
    out = {
        r["key"]: r
        for r in metric_anomalies(plus, "run", "key", "v", 5).collect()
    }
    assert out["A"]["hist_n"] == 4 and not out["A"]["anomalous"]


def test_checkpoint_anomalies_integration(spark, tmp_path):
    from json_to_avro_schema_spark.checkpoint import CheckpointStore

    store = CheckpointStore(str(tmp_path / "ckpt"))
    rows = []
    for run in ("r01", "r02", "r03"):
        for pk in ("p1", "p2"):
            rows.append((run, pk, "spec", "h1", 1000, 10, None, None))
    # current run: p1 normal, p2 fail-rate x20; p1 state row retried (dup)
    rows += [
        ("r04", "p1", "spec", "h1", 1000, 10, None, None),
        ("r04", "p1", "spec", "h1", 1000, 10, None, None),
        ("r04", "p2", "spec", "h1", 1000, 200, None, None),
    ]
    store.mark_completed(
        spark,
        spark.createDataFrame(
            rows,
            "run_id string, part_key string, spec_name string, "
            "spec_hash string, n_rows long, n_fail long, "
            "completed_at timestamp, state_json string",
        ),
    )
    out = {
        r["part_key"]: r
        for r in checkpoint_anomalies(spark, store, "h1", "r04").collect()
    }
    assert not out["p1"]["anomalous"]
    assert out["p2"]["anomalous"] and out["p2"]["reason"] == "rel"
    assert out["p1"]["hist_n"] == 3  # retried append not double-counted


def test_checkpoint_anomalies_unknown_metric(spark, tmp_path):
    from json_to_avro_schema_spark.checkpoint import CheckpointStore

    with pytest.raises(ValueError, match="unknown metric"):
        checkpoint_anomalies(
            spark, CheckpointStore(str(tmp_path)), "h", "r", metric="bogus"
        )
