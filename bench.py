#!/usr/bin/env python
"""Benchmark harness.

Default: run the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE JSON line:

    {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

``--scaling`` mode: run the flagship validation job at two parallelism
levels (local[8] vs local[32] by default) in separate processes on the SAME
input and report throughput at both plus scaling efficiency
(T_8/T_32)/4 — the sandbox evidence for the north rule's N→4N executor
criterion (BASELINE.md). Results are appended to BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_DOCS_BENCH = int(os.environ.get("SPARK_GRAFT_BENCH_DOCS", "2000000"))


def _sf_label(sf_dir: str) -> float:
    try:
        return float(sf_dir.rstrip("/").split("sf")[-1])
    except ValueError:
        return -1.0


def flagship_validation(spark, n_docs: int) -> int:
    """Full interleaved-documents validation: generate → row checks →
    violations count + verdicts count (forces both sinks' plans)."""
    from pyspark.sql import functions as F

    from json_to_avro_schema_spark.compiler.plan import compile_document
    from json_to_avro_schema_spark.runner import run_validation
    from json_to_avro_schema_spark.sources.synthetic import (
        documents_iv_spec,
        generate_documents_iv,
    )

    plan = compile_document(documents_iv_spec())
    df = generate_documents_iv(spark, n_docs, violation_pct=5)
    res = run_validation(spark, df, plan)
    # one combined action over the checked plan: verdict agg (scans all rows);
    # total rows = sum of per-partition n_rows for one check
    first_check = plan.row_checks[0].name
    agg = (
        res.verdicts.filter(F.col("check_name") == first_check)
        .agg(F.sum("n_rows").alias("r"))
        .collect()[0]
    )
    return int(agg["r"] or 0)


def run_bench() -> dict:
    from json_to_avro_schema_spark.session import get_spark
    import __spark_entry__ as entrymod

    spark = get_spark(app="bench", cpus=CPUS)
    spark.sparkContext.setLogLevel("ERROR")

    timings: dict[str, float] = {}

    # warm the JVM/codegen path so per-query numbers measure the queries
    flagship_validation(spark, 10_000)

    t0 = time.perf_counter()
    n_docs = flagship_validation(spark, N_DOCS_BENCH)
    flagship_sec = time.perf_counter() - t0
    timings["flagship_validation"] = round(flagship_sec, 3)

    qs = entrymod.queries()
    bench_queries = [
        "stats_lineitem", "unique_orders", "ri_lineitem_orders",
        "histogram_price", "quantiles_price", "text_analysis",
        "exact_dup_groups", "topk_cosine", "token_totals", "tdigest_price",
    ]
    for name in bench_queries:
        qs[name](spark, SF_DIR).collect()  # warm: codegen, readers, py-workers
        t0 = time.perf_counter()
        qs[name](spark, SF_DIR).collect()
        timings[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    return {
        "metric": "end_to_end_validation_and_checks_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": _sf_label(SF_DIR),
        "docs_per_sec": round(n_docs / flagship_sec, 1),
        "bench_docs": N_DOCS_BENCH,
        "cpus": CPUS,
    }


def _scaling_child(cpus: int, n_docs: int) -> None:
    from json_to_avro_schema_spark.session import get_spark

    spark = get_spark(app=f"scale{cpus}", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    flagship_validation(spark, 50_000)  # warmup
    t0 = time.perf_counter()
    n = flagship_validation(spark, n_docs)
    dt = time.perf_counter() - t0
    print(json.dumps({"cpus": cpus, "sec": dt, "docs": n,
                      "docs_per_sec": n / dt}))


def run_scaling(n_small: int = 8, n_large: int = 32) -> dict:
    results = {}
    for cpus in (n_small, n_large):
        out = subprocess.run(
            [sys.executable, __file__, "--scaling-child", str(cpus),
             str(N_DOCS_BENCH)],
            capture_output=True, text=True, cwd=REPO, timeout=1800,
            env={**os.environ, "SPARK_GRAFT_CPUS": str(cpus)},
        )
        line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
        results[cpus] = json.loads(line)
    t_small = results[n_small]["sec"]
    t_large = results[n_large]["sec"]
    ratio = n_large / n_small
    efficiency = (t_small / t_large) / ratio
    report = {
        "n_docs": N_DOCS_BENCH,
        f"local[{n_small}]_sec": round(t_small, 2),
        f"local[{n_large}]_sec": round(t_large, 2),
        f"local[{n_small}]_docs_per_sec": round(results[n_small]["docs_per_sec"], 1),
        f"local[{n_large}]_docs_per_sec": round(results[n_large]["docs_per_sec"], 1),
        "scaling_efficiency": round(efficiency, 3),
        "target": 0.8,
        "meets_target": efficiency >= 0.8,
    }
    return report


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--scaling-child":
        _scaling_child(int(sys.argv[2]), int(sys.argv[3]))
    elif len(sys.argv) > 1 and sys.argv[1] == "--scaling":
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_bench()))
