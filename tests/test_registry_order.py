"""The build driver verifies only the first 50 registry entries; pin the
invariant that every distinct component family is inside that window
(round 1 shipped the whole extension layer at positions 51-72 and got
zero driver CORRECTNESS rows for it; round 2's 12 additions sat at 51+
and were likewise never driver-checked).

Round-3 layout: the 12 round-2 additions are IN the window, plus the
eight round-3 queries (BPE pairs, TF-IDF, SemDeDup, kNN graph, gopher
filter, target mix, quality-mix-pack pipeline, top-share selector);
room came from parity-core and extension queries with two consecutive
green driver rows (CORRECTNESS_r01.json + CORRECTNESS_r02.json), per
the round-2 VERDICT instruction #1."""

import __spark_entry__ as entrymod

WINDOW = 50

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
)

#: extension queries deliberately OUTSIDE the window - each must either
#: name a perf-twin/variant in-window proxy, or name the CORRECTNESS
#: file recording its own green driver row from a prior round (the
#: value is then verified against that file). Adding here requires
#: evidence of one of the two kinds.
OUT_OF_WINDOW_OK = {
    # rotated out mid-round-3 to make room for the four new distinct
    # algorithms (dedup_semantic_prune, sim_knn_graph,
    # text_gopher_filter, sample_target_mix); both have green driver
    # rows in r1 AND r2 - evidence kind: CORRECTNESS file.
    "sample_hash_deterministic": "CORRECTNESS_r02.json",
    "split_train_valid_test": "CORRECTNESS_r02.json",
    # ceded its slot to pipeline_quality_mix_pack (r3); exact-dup
    # semantics remain window-covered via dedup_span_first_occurrence
    # and the chunk-dedup stage of pipeline_chunk_dedup_pack
    "dedup_exact_groups": "CORRECTNESS_r02.json",
    # ceded its slot to sample_top_share_quality (r3); the in-window
    # sim_knn_pandas_gemm runs the SAME oracle SQL (exact twin)
    "sim_knn_bruteforce": "CORRECTNESS_r02.json",
}

#: one query per SURVEY section-2 operator family. Split into the
#: in-window representatives and the rotated-out set; rotated-out
#: queries must carry green rows in BOTH prior CORRECTNESS files
#: (verified by test_rotated_out_parity_has_two_green_rows when the
#: files are present).
PARITY_CORE_IN_WINDOW = {
    "pattern_a_snapshot_upsert",
}

PARITY_CORE_ROTATED_OUT = {
    "w2_distinct_keys",  # ceded its slot to text_bpe_pair_stats (r3)
    "j3_join_chain_q5",  # ceded its slot to search_tfidf_cosine (r3)
    "pattern_b_array_child",  # ceded its slot to text_bigram_logprob (r3)
    "pattern_c_collection_refresh",  # ceded to sample_dsir_select (r3)
    "w1_latest_event_per_user",  # ceded its slot to text_bpe_encode (r3)
    "j2_anti_join",  # ceded its slot to dedup_keep_best_quality (r3)
    "pattern_d_traffic_series",  # ceded its slot to sim_pq_adc_topk (r3)
    # ceded its slot to text_quality_classifier (r3); beyond its two
    # green rows it remains driver-RUN every round as the entry()
    # flagship smoke check
    "q1_pricing_summary",
    "sessionize_events",  # ceded its slot to dedup_semantic_prune (r3)
    "pattern_e_version_log",  # ceded its slot to sim_knn_graph (r3)
    "p1_eq_filter",
    "p2_like_filter",
    "p3_isin_filter",
    "p5_string_predicates",
    "j1_inner_join_agg",
    "j4_semi_join",
    "a1_collect_reassembly",
    "a4_union_all_agg",
    "f1_json_extract",
    "f3_pii_pseudonymize",
    "f10_greatest_last_touched",
    "x3_posexplode_tokens",
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
    for n, evidence in OUT_OF_WINDOW_OK.items():
        if evidence.endswith(".json"):
            import json
            import os

            path = os.path.join(
                os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                evidence,
            )
            if not os.path.exists(path):
                continue  # fresh checkout without driver artifacts
            rec = json.load(open(path)).get(n)
            assert rec and rec.get("hash_match"), (
                f"{n} is out-of-window on the strength of a green row in "
                f"{evidence}, but that file records none"
            )
        else:
            assert evidence in window, (
                f"{n} is allowed out-of-window only because {evidence} "
                f"covers its component in-window - but it left the window"
            )


def test_parity_core_in_driver_window():
    names = list(entrymod.queries())
    window = set(names[:WINDOW])
    missing = sorted(PARITY_CORE_IN_WINDOW - window)
    assert not missing, f"parity core outside driver window: {missing}"


def test_rotated_out_parity_has_two_green_rows():
    """A parity query may leave the window only with two consecutive
    green driver rows on record."""
    import json
    import os

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    rows = []
    for fname in ("CORRECTNESS_r01.json", "CORRECTNESS_r02.json"):
        path = os.path.join(root, fname)
        if not os.path.exists(path):  # fresh checkout without artifacts
            return
        rows.append(json.load(open(path)))
    for n in sorted(PARITY_CORE_ROTATED_OUT):
        for rnd, data in zip((1, 2), rows):
            rec = data.get(n)
            assert rec is not None, f"{n} has no round-{rnd} driver row"
            assert rec.get("rows_match") and rec.get("schema_match") and rec.get("hash_match"), (
                f"{n} round-{rnd} driver row is not green: {rec}"
            )


def test_queries_and_oracles_align():
    qs = entrymod.queries()
    os_ = entrymod.oracle_sql()
    assert set(os_) <= set(qs)
    # oracle iteration order must follow the query order (the driver
    # zips by position in some paths; keep them identical)
    assert [n for n in qs if n in os_] == list(os_)
