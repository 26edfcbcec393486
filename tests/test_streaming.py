"""Structured-Streaming validation: the same CompiledPlan over a streaming
source must produce exactly the batch runner's violations and verdicts
(micro-batch == bounded batch inside foreachBatch)."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from json_to_avro_schema_spark.compiler.plan import compile_document  # noqa: E402
from json_to_avro_schema_spark.runner import ROW_PASS, run_validation  # noqa: E402
from json_to_avro_schema_spark.sources.synthetic import (  # noqa: E402
    documents_iv_spec,
    generate_documents_iv,
)
from json_to_avro_schema_spark.streaming.validate_stream import (  # noqa: E402
    stream_to_sinks,
    validate_stream,
)


@pytest.fixture(scope="module")
def stream_setup(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("stream")
    src = str(base / "src")
    df = generate_documents_iv(spark, 4_000, violation_pct=5)
    df.write.parquet(src)
    schema = spark.read.parquet(src).schema
    return base, src, schema


def test_stream_matches_batch(spark, stream_setup):
    base, src, schema = stream_setup
    plan = compile_document(documents_iv_spec())
    viol_path = str(base / "violations")
    verd_path = str(base / "verdicts")

    stream_df = spark.readStream.schema(schema).parquet(src)
    q = stream_to_sinks(
        stream_df,
        plan,
        violations_path=viol_path,
        verdicts_path=verd_path,
        checkpoint_location=str(base / "ckpt"),
    )
    q.awaitTermination(120)

    batch = run_validation(spark, spark.read.parquet(src), plan)
    b_viol = {r["doc_id"] for r in batch.violations.select("doc_id").collect()}
    s_viol = {
        r["doc_id"]
        for r in spark.read.parquet(viol_path).select("doc_id").collect()
    }
    assert s_viol == b_viol and len(b_viol) > 0

    # verdict fail totals agree per check (streamed epochs sum to batch)
    b_verd = {
        (r["check_name"]): r["f"]
        for r in batch.verdicts.groupBy("check_name")
        .agg(F.sum("n_fail").alias("f"))
        .collect()
    }
    s_verd = {
        (r["check_name"]): r["f"]
        for r in spark.read.parquet(verd_path)
        .groupBy("check_name")
        .agg(F.sum("n_fail").alias("f"))
        .collect()
    }
    assert s_verd == b_verd


def test_validate_stream_is_streaming_projection(spark, stream_setup):
    _, src, schema = stream_setup
    plan = compile_document(documents_iv_spec())
    stream_df = spark.readStream.schema(schema).parquet(src)
    checked = validate_stream(stream_df, plan)
    assert checked.isStreaming
    assert ROW_PASS in checked.columns
