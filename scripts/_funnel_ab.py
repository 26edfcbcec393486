"""Throwaway same-session interleaved A/B of corpus_funnel persist_pruned.

Interleaves no-persist / persist timed blocks (A B A B) so VM phase drift
cancels; 10 M skewed rows, the --corpus-bench dup-heavy regime. Not part
of the shipped bench surface — results recorded in BENCH/BASELINE.md §1d.
"""
import json
import time

from pyspark.sql import functions as F

from json_to_avro_schema_spark.operators.funnel import corpus_funnel
from json_to_avro_schema_spark.session import get_spark

spark = get_spark(app="funnel-ab", cpus=32)
spark.sparkContext.setLogLevel("ERROR")
n = 10_000_000
docs = (
    spark.range(n).repartition(64)
    .selectExpr(
        "cast(id AS string) AS doc_id",
        "concat("
        " CASE WHEN id % 10 < 3 THEN 'accept all cookies to continue'"
        "      ELSE concat('lead para ', cast(id AS string)) END,"
        " '\n', 'body text line ', cast(id AS string),"
        " '\n', 'shared tail ', cast(id % 100000 AS string)) AS text",
        "concat('https://', "
        " CASE WHEN id % 10 < 3 THEN 'WWW.Hot0' "
        "      ELSE concat('Site', cast((id div 4) % 100000 AS string))"
        " END, '.com', "
        " CASE WHEN id % 4 = 2 THEN ':443' ELSE '' END, "
        " '/p/', cast(id div 4 AS string), "
        " CASE WHEN id % 4 = 0 THEN '?b=2&a=1'"
        "      WHEN id % 4 = 1 THEN '?a=1&b=2'"
        "      WHEN id % 4 = 2 THEN '/?a=1&b=2&utm_source=feed'"
        "      ELSE '?a=1&utm_campaign=x&b=2#frag' END) AS url",
    ).persist()
)
docs.count()
blocked = spark.createDataFrame(
    [("site7.com",), ("site13.com",)], "domain string"
)


def run(persist):
    res = corpus_funnel(
        docs, blocked_domains=blocked,
        keep_if=F.length("text") >= 20,
        persist_pruned=persist,
    )
    out = res.annotated.groupBy("drop_stage").agg(
        F.count(F.lit(1)), F.sum(F.length("text"))
    ).collect()
    res.unpersist()
    return out


def timed(persist):
    run(persist)  # warm
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        run(persist)
        ts.append(time.perf_counter() - t0)
    return round(sorted(ts)[1], 3)


a1 = timed(False)
b1 = timed(True)
a2 = timed(False)
b2 = timed(True)
with open("/root/repo/_funnel_ab.json", "w") as f:
    json.dump({"no_persist": [a1, a2], "persist": [b1, b2]}, f)
print(json.dumps({"no_persist": [a1, a2], "persist": [b1, b2]}))
