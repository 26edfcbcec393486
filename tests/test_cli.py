"""CLI entrypoint (__main__.py): spark-submit shape, stdout JSON summary,
typed-error exit codes, checkpoint resume path."""

from __future__ import annotations

import json
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from json_to_avro_schema_spark.__main__ import main  # noqa: E402
from json_to_avro_schema_spark.sources.synthetic import (  # noqa: E402
    generate_documents_iv,
)

SPEC = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "json_to_avro_schema_spark", "plans", "documents_iv.json",
)


@pytest.fixture(scope="module")
def docs_parquet(spark, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("cli") / "docs.parquet")
    generate_documents_iv(spark, 2_000, violation_pct=5).write.parquet(p)
    return p


def test_cli_batch_run(spark, docs_parquet, tmp_path, capsys):
    out = str(tmp_path / "out")
    rc = main([SPEC, "--table", docs_parquet, "--out", out])
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["spec"] == "DocumentsIV"
    assert summary["n_fail"] > 0 and not summary["schema_problems"]
    assert spark.read.parquet(f"{out}/violations").count() > 0
    assert spark.read.parquet(f"{out}/verdicts").count() > 0


def test_cli_checkpoint_resume(spark, docs_parquet, tmp_path, capsys):
    out = str(tmp_path / "out2")
    ckpt = str(tmp_path / "state")
    args = [SPEC, "--table", docs_parquet, "--out", out,
            "--checkpoint", ckpt, "--run-id", "cli-run"]
    assert main(args) == 0
    first = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert first["partitions_processed"] > 0 and first["partitions_resumed"] == 0
    assert main(args) == 0
    second = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert second["partitions_processed"] == 0
    assert second["partitions_resumed"] == first["partitions_total"]


def test_cli_bad_spec_exit_1(tmp_path, capsys):
    bad = tmp_path / "bad.json"
    bad.write_text(json.dumps({"$id": "x://a/B", "type": "integer",
                               "multipleOf": 0}))
    rc = main([str(bad), "--table", "/nonexistent", "--out", str(tmp_path)])
    assert rc == 1
    assert "multipleOf" in capsys.readouterr().err


def test_cli_table_checks_in_summary(spark, docs_parquet, tmp_path, capsys):
    out = str(tmp_path / "out3")
    rc = main([SPEC, "--table", docs_parquet, "--out", out])
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    # documents_iv spec declares x-unique (doc_id) + x-stats; 5% seeded
    # violations include duplicate doc_ids, so the unique check fails
    assert summary["table_checks"]["unique_doc_id"] is False
    assert summary["table_checks_pass"] is False
    tv = spark.read.parquet(f"{out}/table_verdicts")
    assert {r["kind"] for r in tv.collect()} == {"unique", "stats"}
