"""The build driver verifies only the first 50 registry entries; pin the
invariant that every distinct component family is inside that window
(round 1 shipped the whole extension layer at positions 51-72 and got
zero driver CORRECTNESS rows for it)."""

import __spark_entry__ as entrymod

WINDOW = 50

#: families that must each have every member in the driver window
EXTENSION_PREFIXES = (
    "dedup_",
    "sim_",
    "text_",
    "pipeline_",
    "multimodal_",
    "embedding_",
    "sample_",
    "split_",
    "pack_",
    "corpus_",
)

#: extension queries deliberately OUTSIDE the window - each must be a
#: perf-twin or variant of an in-window component (listed), never a
#: distinct algorithm. Adding here requires naming the in-window proxy.
OUT_OF_WINDOW_OK = {
    "sim_knn_pandas_gemm": "sim_knn_bruteforce",   # same oracle, Arrow twin
    "sample_stratified_by_lang": "sample_hash_deterministic",
    "text_repetition_metrics": "text_quality_score",
    "text_redact_pii": "f3_pii_pseudonymize",  # PII component in-window
    "corpus_vocabulary_topk": "corpus_source_report",
    "sim_ivf_kmeans_topk": "sim_ivf_topk",  # composition of two in-window ops
    "text_chunk_windows": "pack_token_shards",  # sequence-layout family
    "text_unigram_logprob": "text_quality_score",  # quality-scoring family
    "pipeline_chunk_dedup_pack": "pipeline_dedup_shards",  # pipeline family
    "sample_eval_carve": "sample_hash_deterministic",
    "dedup_minhash_clusters": "dedup_clusters",  # same CC over LSH pairs
}

#: one in-window query per SURVEY section-2 operator family
PARITY_CORE = {
    "q1_pricing_summary",
    "p1_eq_filter",
    "p2_like_filter",
    "p3_isin_filter",
    "p5_string_predicates",
    "w1_latest_event_per_user",
    "w2_distinct_keys",
    "j1_inner_join_agg",
    "j2_anti_join",
    "j3_join_chain_q5",
    "j4_semi_join",
    "a1_collect_reassembly",
    "a4_union_all_agg",
    "f1_json_extract",
    "f3_pii_pseudonymize",
    "f10_greatest_last_touched",
    "x3_posexplode_tokens",
    "pattern_a_snapshot_upsert",
    "pattern_b_array_child",
    "pattern_c_collection_refresh",
    "pattern_d_traffic_series",
    "pattern_e_version_log",
    "sessionize_events",
}


def test_every_extension_query_in_driver_window():
    names = list(entrymod.queries())
    window = set(names[:WINDOW])
    stragglers = [
        n for n in names
        if n.startswith(EXTENSION_PREFIXES)
        and n not in window
        and n not in OUT_OF_WINDOW_OK
    ]
    assert not stragglers, (
        f"extension queries outside the driver's first-{WINDOW} window "
        f"(no CORRECTNESS row will be recorded): {stragglers}"
    )
    for n, proxy in OUT_OF_WINDOW_OK.items():
        assert proxy in window, (
            f"{n} is allowed out-of-window only because {proxy} covers "
            f"its component in-window - but {proxy} left the window"
        )


def test_parity_core_in_driver_window():
    names = list(entrymod.queries())
    window = set(names[:WINDOW])
    missing = sorted(PARITY_CORE - window)
    assert not missing, f"parity core outside driver window: {missing}"


def test_queries_and_oracles_align():
    qs = entrymod.queries()
    os_ = entrymod.oracle_sql()
    assert set(os_) <= set(qs)
    # oracle iteration order must follow the query order (the driver
    # zips by position in some paths; keep them identical)
    assert [n for n in qs if n in os_] == list(os_)
