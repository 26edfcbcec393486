"""Stateful streaming: watermarked windowed metrics (append mode emits a
window exactly once, when the watermark closes it) and cumulative
per-partition verdicts via applyInPandasWithState (running totals across
micro-batches must converge to the batch verdict totals)."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql.window import Window  # noqa: E402

from json_to_avro_schema_spark.streaming import drain
from json_to_avro_schema_spark.compiler.plan import compile_document  # noqa: E402
from json_to_avro_schema_spark.runner import partition_verdicts, apply_row_checks  # noqa: E402
from json_to_avro_schema_spark.sources.synthetic import (  # noqa: E402
    documents_iv_spec,
    generate_documents_iv,
)
from json_to_avro_schema_spark.streaming.stateful import (  # noqa: E402
    running_partition_verdicts,
    windowed_metrics,
)


def _write_one_file(df, path):
    df.coalesce(1).write.mode("append").parquet(path)


def test_windowed_metrics_append_closes_windows_by_watermark(spark, tmp_path):
    src = str(tmp_path / "src")
    mk = "CAST('2026-01-01 00:{m:02d}:00' AS TIMESTAMP)"
    early = spark.createDataFrame(
        [(m, float(m)) for m in (0, 5, 12, 18, 25, 34)], "m int, value double"
    ).selectExpr("CAST('2026-01-01 00:00:00' AS TIMESTAMP) + make_interval(0,0,0,0,0,m,0) AS ts", "value")
    late = spark.createDataFrame(
        [(120, 1.0)], "m int, value double"
    ).selectExpr("CAST('2026-01-01 00:00:00' AS TIMESTAMP) + make_interval(0,0,0,0,0,m,0) AS ts", "value")
    _write_one_file(early, src)
    _write_one_file(late, src)

    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = windowed_metrics(
        stream, ts_col="ts", window_duration="10 minutes",
        watermark_delay="10 minutes", value_col="value",
    )
    q = (
        out.writeStream.format("memory").queryName("win_metrics")
        .outputMode("append").trigger(availableNow=True).start()
    )
    drain(q, 120)

    rows = {
        (r["window_start"].minute, r["window_end"].minute): (r["n_rows"], r["mean_v"])
        for r in spark.sql("SELECT * FROM win_metrics").collect()
    }
    # after the late file (02:00) the watermark is 01:50 — every early
    # window closes and emits exactly once; the late row's own window
    # (end 02:10 > watermark) never closes, so it must NOT appear.
    assert rows == {
        (0, 10): (2, 2.5),    # minutes 0, 5
        (10, 20): (2, 15.0),  # minutes 12, 18
        (20, 30): (1, 25.0),  # minute 25
        (30, 40): (1, 34.0),  # minute 34
    }


def test_running_partition_verdicts_converge_to_batch(spark, tmp_path):
    src = str(tmp_path / "src")
    docs = generate_documents_iv(spark, 3_000, violation_pct=5)
    # split WITHIN partitions (suffix parity), so part_keys span both
    # micro-batches and the state actually accumulates
    seq = F.regexp_extract("doc_id", r"(\d+)$", 1).cast("long")
    first = docs.filter(seq % 2 == 0)
    second = docs.filter(seq % 2 == 1)
    assert first.count() > 0 and second.count() > 0
    _write_one_file(first, src)
    _write_one_file(second, src)

    plan = compile_document(documents_iv_spec())
    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = running_partition_verdicts(stream, plan)
    q = (
        out.writeStream.format("memory").queryName("run_verd")
        .outputMode("update").trigger(availableNow=True).start()
    )
    drain(q, 180)

    # update mode appends one row per (part_key, check) per touched batch;
    # running totals are monotone, so the final state is the max-n_rows row
    emitted = spark.sql("SELECT * FROM run_verd")
    latest = {
        (r["part_key"], r["check_name"]): (r["n_rows"], r["n_fail"], r["pass"])
        for r in emitted.withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("part_key", "check_name")
                .orderBy(F.col("n_rows").desc(), F.col("n_fail").desc())
            ),
        ).filter(F.col("rk") == 1).collect()
    }

    batch = {
        (r["part_key"], r["check_name"]): (r["n_rows"], r["n_fail"], r["pass"])
        for r in partition_verdicts(
            apply_row_checks(spark.read.parquet(src), plan), plan
        ).collect()
    }
    assert latest == batch
    # at least one partition must have been updated across two batches
    per_group = emitted.groupBy("part_key", "check_name").count()
    assert per_group.agg(F.max("count")).collect()[0][0] >= 2


def test_session_metrics_gap_boundary_and_cross_batch_merge(spark, tmp_path):
    """Gap sessions via F.session_window: a gap EXACTLY equal to the
    threshold MERGES (engine contract pinned here — same boundary as
    batch sessionize's strict >, so batch and stream agree row-for-row);
    sub-gap events merge even when they arrive in DIFFERENT micro-batches
    (the session state store must merge open windows); only sessions
    closed by the final watermark are emitted."""
    from json_to_avro_schema_spark.streaming.stateful import session_metrics

    src = str(tmp_path / "sess_src")

    def evs(rows):
        return spark.createDataFrame(
            rows, "user_id string, m int"
        ).selectExpr(
            "user_id",
            "CAST('2026-01-01 00:00:00' AS TIMESTAMP)"
            " + make_interval(0,0,0,0,0,m,0) AS ts",
        )

    # batch 1: u1 two events 5min apart (merge), one exactly 10min later
    # (boundary -> MERGES), one 11min after that (past gap -> NEW
    # session); u2 one event whose session stays open into batch 2
    _write_one_file(
        evs([("u1", 0), ("u1", 5), ("u1", 15), ("u1", 26), ("u2", 20)]), src
    )
    # batch 2: u2 event 5min after its batch-1 event (cross-batch session
    # MERGE) + a late sentinel pushing the watermark far enough to close
    # every session above (its own session stays open and is not emitted)
    _write_one_file(evs([("u2", 25), ("zz", 300)]), src)

    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = session_metrics(
        stream, ts_col="ts", gap_duration="10 minutes",
        watermark_delay="10 minutes", user_col="user_id",
    )
    q = (
        out.writeStream.format("memory").queryName("sess_metrics")
        .outputMode("append").trigger(availableNow=True).start()
    )
    drain(q, 180)

    got = {
        (r["user_id"], r["start_us"] // 60_000_000, r["n_events"])
        for r in spark.sql("SELECT * FROM sess_metrics").collect()
    }
    base = 29_453_760  # 2026-01-01 00:00 UTC in minutes since the epoch
    assert got == {
        ("u1", base + 0, 3),   # 00:00+00:05 merged; exactly-10min MERGES
        ("u1", base + 26, 1),  # 11min gap (> threshold) -> new session
        ("u2", base + 20, 2),  # merged ACROSS micro-batches
    }
    durations = {
        (r["user_id"], r["start_us"] // 60_000_000): r["duration_us"]
        for r in spark.sql("SELECT * FROM sess_metrics").collect()
    }
    assert durations[("u1", base + 0)] == 15 * 60_000_000
    assert durations[("u2", base + 20)] == 5 * 60_000_000
