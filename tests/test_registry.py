"""Driver-contract registry composition: the correctness gate records the
FIRST 50 ``queries()`` entries, so their ordering is load-bearing (round 3
regression: new queries pushed the flagship pair past the cap). These pins
fail loudly if a future edit breaks the composition again."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry  # noqa: E402

# one representative per operator family that MUST be driver-recorded
FAMILY_REPRESENTATIVES = {
    # flagship + spans
    "derived_validation_verdicts", "derived_validation_violations",
    "span_ri_dangling", "span_monotonic_violations",
    # sketches / checkpoint / multimodal
    "tdigest_price", "checkpoint_resume", "multimodal_features",
    # near-dup + ANN
    "simhash_near_dups", "near_dup_clusters", "ivf_indexed_topk_cosine",
    "minhash_near_dups", "decontaminate_pairs", "embedding_near_dups",
    "dup_ngram_coverage",
    # streaming (all four mechanisms)
    "streaming_validation", "streaming_dedup", "streaming_windowed_metrics",
    "streaming_running_verdicts",
    # table-level checks
    "stats_lineitem", "unique_orders", "metric_anomalies_events", "ri_checks",
    "enum_returnflag", "range_lineitem", "histograms", "psi_drift",
    "table_checks_lineitem", "format_json_checks",
    "grouping_verdicts", "verdict_set_ops", "topk_price_by_flag",
    "approx_unique_lineitem", "skew_report_events",
    # training-data pipeline ops (+ the constraint-suggestion profiler)
    "token_totals", "suggested_spec_lineitem", "lang_detect_docs",
    "pii_docs", "repetition_docs", "packed_shards", "mixture_docs",
    "chunked_docs", "clean_corpus_report", "exact_dup_groups",
    "dedup_incremental", "colocated_dedup",
    "stratified_sample_events", "lm_perplexity_docs", "dsir_weights",
    # crawl-side web pipeline + paragraph-granularity dedup (r4 session 5)
    "url_dedup_docs", "paragraph_dedup_docs",
}


def test_every_query_has_an_oracle():
    qs, oracles = entry.queries(), entry.oracle_sql()
    assert set(qs) == set(oracles), (
        "queries() and oracle_sql() must carry identical key sets"
    )


def test_first_50_cover_every_operator_family():
    first50 = set(list(entry.queries())[:50])
    missing = FAMILY_REPRESENTATIVES - first50
    assert not missing, (
        f"driver gate records only the first 50 queries; family "
        f"representatives pushed past the cap: {sorted(missing)}"
    )


def test_overflow_entries_have_recorded_family_siblings():
    """Positions 51+ may only hold variants whose family is already
    attested inside the recorded window."""
    order = list(entry.queries())
    overflow = set(order[50:])
    # every overflow entry maps to >= 1 recorded sibling of the same family
    siblings = {
        "quantiles_price": "tdigest_price",
        "events_domain": "stats_lineitem",
        "text_analysis": "clean_corpus_report",
        "quality_docs": "clean_corpus_report",
        "stats_events_by_type": "stats_lineitem",
        "ngram_jaccard_pairs": "minhash_near_dups",
        "vector_stats": "embedding_near_dups",
        "exactsubstr_clean_docs": "dup_ngram_coverage",
        "dedup_exact_keep": "exact_dup_groups",
        "fingerprint_distinct": "exact_dup_groups",
        "sample_split_docs": "stratified_sample_events",
        "minhash_incremental_dups": "minhash_near_dups",
        "span_seq_keys": "span_monotonic_violations",
        "span_kind_stats": "span_monotonic_violations",
        "topk_cosine": "ivf_indexed_topk_cosine",
        "lsh_topk_cosine": "ivf_indexed_topk_cosine",
        "ivf_topk_cosine": "ivf_indexed_topk_cosine",
        "streaming_dedup_watermarked": "streaming_dedup",
        "bpe_token_stats": "token_totals",
        "dup_event_users": "unique_orders",
        "ref_suggest_containment": "ri_checks",
        "profile_drift_lineitem": "suggested_spec_lineitem",
        "frequent_values_docs": "suggested_spec_lineitem",
        "streaming_profile_drift": "streaming_windowed_metrics",
        "ngram_decontamination": "decontaminate_pairs",
        "semantic_dedup_embeddings": "embedding_near_dups",
        "gopher_rules_docs": "clean_corpus_report",
        "c4_clean_docs": "clean_corpus_report",
        "exactsubstr_keep_first": "dup_ngram_coverage",
        "url_dedup_incremental_docs": "url_dedup_docs",
        "streaming_url_dedup": "streaming_dedup",
        "corpus_funnel_docs": "clean_corpus_report",
        "perplexity_split_docs": "lm_perplexity_docs",
        # demoted r4s5 to make room for the two new families: their
        # families stay attested by the recorded siblings below
        "resize_plan": "multimodal_features",
        "categorical_drift": "psi_drift",
    }
    recorded = set(order[:50])
    unknown = overflow - set(siblings)
    assert not unknown, f"overflow entries without a declared sibling: {unknown}"
    for name in overflow:
        assert siblings[name] in recorded, (
            f"{name}'s family sibling {siblings[name]} fell out of the "
            f"recorded window"
        )
