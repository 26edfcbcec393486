"""End-to-end composition of the session-4 operator families over the
real sf0.001 corpus: normalize → quality-gate → exact-similarity dedup →
weighted sample → quantile-binned shards, with search over the result.
Each stage's contract is already unit/oracle-pinned; this pins that the
stages COMPOSE (schemas line up, determinism survives chaining, nothing
collects the corpus)."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

SF = "/root/testdata/sf0.001"


def test_pipeline_composes_end_to_end(spark, tmp_path):
    from json_to_avro_schema_spark.operators.binning import quantile_bins
    from json_to_avro_schema_spark.operators.dedup import set_similarity_join
    from json_to_avro_schema_spark.operators.sampling import weighted_sample
    from json_to_avro_schema_spark.operators.search import bm25_search
    from json_to_avro_schema_spark.operators.text import (
        normalize_unicode,
        whitespace_token_count,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    n0 = docs.count()

    # 1. normalize (NFC + lower + collapse) — row-preserving
    clean = normalize_unicode(
        docs, "text", lowercase=True, collapse_whitespace=True
    )
    assert clean.count() == n0

    # 2. drop near-identical docs: exact set-similarity pairs at 0.95,
    #    keep the min id of each matched pair's losers out
    pairs = set_similarity_join(clean, threshold=0.95)
    losers = pairs.select(F.col("doc_id_2").alias("doc_id")).distinct()
    deduped = clean.join(losers, "doc_id", "left_anti")
    n1 = deduped.count()
    assert 0 < n1 <= n0

    # 3. weighted sample by token count — deterministic, exact N
    with_w = deduped.withColumn(
        "n_tokens", whitespace_token_count(F.col("text"))
    )
    n_sample = min(200, n1)
    sample = weighted_sample(with_w, "doc_id", "n_tokens", n_sample, seed="e2e")
    assert sample.count() == n_sample
    again = weighted_sample(with_w, "doc_id", "n_tokens", n_sample, seed="e2e")
    assert (
        sorted(r["doc_id"] for r in sample.select("doc_id").collect())
        == sorted(r["doc_id"] for r in again.select("doc_id").collect())
    )

    # 4. quantile-bin the sample by length and write one dir per bin
    binned = quantile_bins(sample, "n_chars", 4, out_col="len_bin")
    out = str(tmp_path / "shards")
    binned.write.partitionBy("len_bin").parquet(out)
    back = spark.read.parquet(out)
    assert back.count() == n_sample
    assert back.select("len_bin").distinct().count() == 4

    # 5. search the deduped corpus — results must come from kept docs
    hits = bm25_search(deduped, "hash join merge", k=5)
    kept = {r["doc_id"] for r in deduped.select("doc_id").collect()}
    got = [r["doc_id"] for r in hits.collect()]
    assert len(got) == 5 and all(d in kept for d in got)
