"""Driver-contract registry composition: the correctness gate records the
FIRST 50 ``queries()`` entries, so their ordering is load-bearing (round 3
regression: new queries pushed the flagship pair past the cap). These pins
fail loudly if a future edit breaks the composition again."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry  # noqa: E402

# one representative per operator family that MUST be driver-recorded.
# Round-5 rotation (VERDICT r4 #1): the 15 never-driver-recorded round-4
# queries (plus the new classifier_quality_docs) replaced 16 members that
# were attested green in CORRECTNESS_r04.json and whose families stay
# represented — the demoted names appear in the overflow-siblings map.
FAMILY_REPRESENTATIVES = {
    # flagship + spans
    "derived_validation_verdicts", "derived_validation_violations",
    "span_ri_dangling", "span_monotonic_violations",
    # sketches / checkpoint / multimodal
    "tdigest_price", "checkpoint_resume", "multimodal_features",
    # near-dup + ANN + semantic/excerpt dedup
    "simhash_near_dups", "near_dup_clusters", "ivf_indexed_topk_cosine",
    "minhash_near_dups", "semantic_dedup_embeddings",
    "ngram_decontamination", "dup_ngram_coverage",
    "exactsubstr_clean_docs", "exactsubstr_keep_first",
    # streaming (all mechanisms incl. watermarked state + URL + profile)
    "streaming_validation", "streaming_dedup_watermarked",
    "streaming_windowed_metrics", "streaming_running_verdicts",
    "streaming_url_dedup", "streaming_profile_drift",
    # table-level checks
    "stats_lineitem", "unique_orders", "ri_checks",
    "ri_bloom_dangling", "range_lineitem", "psi_drift",
    "table_checks_lineitem", "format_json_checks",
    "grouping_verdicts", "topk_price_by_flag",
    "session_stats_events", "asof_join_events", "skew_report_events",
    # profiler family
    "ref_suggest_containment", "profile_drift_lineitem",
    "frequent_values_docs",
    # training-data pipeline ops (r5 session-4: dsir_weights and
    # exact_dup_groups — both driver-attested green in r04 — rotated to
    # 51+ for the new search + outlier families)
    "gopher_rules_docs", "c4_clean_docs", "classifier_quality_docs",
    "packed_shards", "mixture_docs", "corpus_funnel_docs",
    "outliers_events", "stratified_sample_events",
    "perplexity_split_docs", "bm25_search_docs",
    # crawl-side web pipeline + paragraph-granularity dedup
    "url_dedup_incremental_docs", "paragraph_dedup_docs",
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
        # --- the 16 round-5 demotions: every one was driver-attested
        # green in CORRECTNESS_r04.json; the mapped sibling keeps the
        # family inside the recorded window ---
        "streaming_dedup": "streaming_dedup_watermarked",
        "metric_anomalies_events": "profile_drift_lineitem",
        "verdict_set_ops": "grouping_verdicts",
        "token_totals": "gopher_rules_docs",
        "suggested_spec_lineitem": "ref_suggest_containment",
        "lang_detect_docs": "gopher_rules_docs",
        "pii_docs": "gopher_rules_docs",
        "repetition_docs": "gopher_rules_docs",
        "chunked_docs": "paragraph_dedup_docs",
        "clean_corpus_report": "corpus_funnel_docs",
        "url_dedup_docs": "url_dedup_incremental_docs",
        "lm_perplexity_docs": "perplexity_split_docs",
        "dedup_incremental": "url_dedup_incremental_docs",
        "colocated_dedup": "url_dedup_incremental_docs",
        "decontaminate_pairs": "ngram_decontamination",
        "embedding_near_dups": "semantic_dedup_embeddings",
        # --- long-standing overflow variants ---
        "quantiles_price": "tdigest_price",
        "events_domain": "stats_lineitem",
        "text_analysis": "gopher_rules_docs",
        "quality_docs": "classifier_quality_docs",
        "stats_events_by_type": "stats_lineitem",
        "ngram_jaccard_pairs": "minhash_near_dups",
        "vector_stats": "semantic_dedup_embeddings",
        "dedup_exact_keep": "url_dedup_incremental_docs",
        "fingerprint_distinct": "url_dedup_incremental_docs",
        "sample_split_docs": "stratified_sample_events",
        "minhash_incremental_dups": "minhash_near_dups",
        "span_seq_keys": "span_monotonic_violations",
        "span_kind_stats": "span_monotonic_violations",
        "topk_cosine": "ivf_indexed_topk_cosine",
        "lsh_topk_cosine": "ivf_indexed_topk_cosine",
        "ivf_topk_cosine": "ivf_indexed_topk_cosine",
        "bpe_token_stats": "classifier_quality_docs",
        "classifier_train_docs": "classifier_quality_docs",
        "ks_drift": "psi_drift",
        "emd_drift": "psi_drift",
        "dup_event_users": "unique_orders",
        "resize_plan": "multimodal_features",
        "categorical_drift": "psi_drift",
        # --- round-5 session-2 demotions (all driver-attested green in
        # CORRECTNESS_r04.json) making room for the bloom-RI + temporal
        # families ---
        "enum_returnflag": "range_lineitem",
        "histograms": "psi_drift",
        "approx_unique_lineitem": "unique_orders",
        # r5 session-2 additions: streaming twin of the recorded
        # session_stats_events / streaming_windowed_metrics families,
        # and the bucketized range join (temporal-family sibling)
        "streaming_session_stats": "streaming_windowed_metrics",
        "range_join_events": "session_stats_events",
        "interval_overlaps_events": "session_stats_events",
        "sequence_gaps_events": "session_stats_events",
        "fd_violations_docs": "profile_drift_lineitem",
        # r5 session-3 additions: correlation + missingness profiling
        # (profiler family)
        "correlations_lineitem": "profile_drift_lineitem",
        "null_patterns_events": "profile_drift_lineitem",
        # snapshot diff = the row-level form of the run-over-run
        # comparison family profile_drift_lineitem records
        "table_diff_orders": "profile_drift_lineitem",
        "entropy_docs": "profile_drift_lineitem",
        "mutual_info_docs": "profile_drift_lineitem",
        # --- round-5 session-4 demotions (both driver-attested green in
        # CORRECTNESS_r04.json) making room for the search + outlier
        # families ---
        "dsir_weights": "perplexity_split_docs",
        "exact_dup_groups": "url_dedup_incremental_docs",
        # r5 session-4 additions
        "tfidf_top_terms_docs": "bm25_search_docs",
        "fd_suggest_docs": "ref_suggest_containment",
        "weighted_sample_docs": "stratified_sample_events",
        "quantile_bins_lineitem": "tdigest_price",
        "benford_lineitem": "psi_drift",
        "set_similarity_pairs": "minhash_near_dups",
        # z-order clustering key: physical-layout family, recorded via
        # the shard-writer/packing representative
        "zorder_events": "packed_shards",
        "bm25_indexed_docs": "bm25_search_docs",
        # unicode normalization: text-cleaning family sibling
        "normalize_unicode_docs": "c4_clean_docs",
        # group-wise scaling: group-stats-broadcast family sibling
        "standardize_lineitem": "outliers_events",
        # fuzzy record linkage: near-dup family sibling
        "fuzzy_match_customers": "minhash_near_dups",
        # declared-range width binning: quantile/binning family sibling
        "width_bins_events": "tdigest_price",
    }
    recorded = set(order[:50])
    unknown = overflow - set(siblings)
    assert not unknown, f"overflow entries without a declared sibling: {unknown}"
    for name in overflow:
        assert siblings[name] in recorded, (
            f"{name}'s family sibling {siblings[name]} fell out of the "
            f"recorded window"
        )
