"""Fault tolerance on a real multi-executor runtime: kill an executor JVM
mid-job under local-cluster and the validation must still complete with
results identical to the healthy run (Spark re-schedules the lost tasks;
the engine's operators are deterministic, so retries are invisible).

This is the 1000-executor-cluster property the north rule implies:
executor loss is routine at scale, and a validation engine whose verdicts
change under task retry would be unusable. Runs in a subprocess so the
local-cluster master doesn't disturb the session-wide local[32] fixture.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, os, signal, subprocess, sys, threading, time

from json_to_avro_schema_spark.compiler.plan import compile_document
from json_to_avro_schema_spark.runner import verdicts_with_violation_count
from json_to_avro_schema_spark.sources.synthetic import (
    documents_iv_rich_spec, generate_documents_iv,
)

os.environ.setdefault("SPARK_HOME", "/opt/spark")
# task.maxFailures / deploy.maxExecutorRetries are cluster-level confs that
# must be set before the context starts; raised so the standalone Master
# tolerates the deliberate executor loss (and any respawn churn) without
# failing the app
from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.master("local-cluster[2,2,2048]")
    .appName("kill-test")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.shuffle.partitions", "16")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.task.maxFailures", "8")
    .config("spark.deploy.maxExecutorRetries", "50")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

plan = compile_document(documents_iv_rich_spec())
path = sys.argv[1]
generate_documents_iv(spark, 400_000, violation_pct=5,
                      num_partitions=64).write.mode("overwrite").parquet(path)

def run():
    verd, obs = verdicts_with_violation_count(spark.read.parquet(path), plan)
    rows = sorted(tuple(r) for r in verd.collect())
    return rows, int(obs.get["n_rows"])

baseline_rows, baseline_n = run()

def my_executor_pids():
    # pgrep -f also matches the worker's bash launch wrapper; only the java
    # processes are executors (killing the wrapper destabilizes the worker)
    out = subprocess.run(["pgrep", "-f", "CoarseGrainedExecutorBackend"],
                        capture_output=True, text=True).stdout.split()
    pids = []
    for p in out:
        try:
            comm = open(f"/proc/{p}/comm").read().strip()
        except OSError:
            continue
        if comm == "java":
            pids.append(int(p))
    return pids

victims = my_executor_pids()
assert len(victims) >= 2, f"expected 2 executors, saw {victims}"

killed = {}
def assassin():
    time.sleep(0.8)  # let the job start so in-flight tasks are lost
    os.kill(victims[0], signal.SIGKILL)
    killed["pid"] = victims[0]

t = threading.Thread(target=assassin); t.start()
wounded_rows, wounded_n = run()
t.join()

# the replacement executor (spark.worker re-launches) or the survivor
# finished the retried tasks; results must be bit-identical
assert killed.get("pid"), "assassin did not fire"
assert wounded_n == baseline_n, (wounded_n, baseline_n)
assert wounded_rows == baseline_rows, "verdicts changed under executor loss"
print(json.dumps({"ok": True, "n_docs": baseline_n,
                  "n_verdicts": len(baseline_rows),
                  "killed_pid": killed["pid"]}))
"""


@pytest.mark.skipif(
    not os.path.isdir("/opt/spark"), reason="needs SPARK_HOME for local-cluster"
)
def test_executor_kill_mid_job_same_results(tmp_path):
    proc = subprocess.run(
        [sys.executable, "-c", CHILD, str(tmp_path / "docs.parquet")],
        capture_output=True, text=True, timeout=600,
        cwd=REPO, env={**os.environ, "PYTHONPATH": REPO},
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    out = json.loads(proc.stdout.strip().splitlines()[-1])
    assert out["ok"] and out["n_docs"] == 400_000 and out["n_verdicts"] > 0
