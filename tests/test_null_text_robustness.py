"""NULL / empty / whitespace-only text must not diverge between the
Spark queries and their DuckDB oracles (round-2 ADVICE: the oracles
tokenized raw ``text`` while the Spark side yields no tokens, so a
NULL-text doc made the chunk oracle emit a spurious row and the
repetition oracle emit NULL shares - latent only because the pinned
testdata happens to contain no NULL text).

Builds a tiny documents.parquet containing the degenerate rows the
testdata lacks and runs every documents-only query through the same
differential gate as tests/test_oracle_differential.py.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entrymod
from tests.test_oracle_differential import rows_canon

#: queries over `documents` alone (no other tables touched), so the
#: synthetic corpus satisfies every read
DOC_ONLY = [
    "text_stats",
    "text_lang_id",
    "text_quality_score",
    "text_fingerprint",
    "text_repetition_metrics",
    "text_redact_pii",
    "text_chunk_windows",
    "text_unigram_logprob",
    "text_bpe_pair_stats",
    "search_tfidf_cosine",
    "corpus_vocabulary_topk",
    "corpus_source_report",
    "pack_token_shards",
    "pipeline_chunk_dedup_pack",
    "x3_posexplode_tokens",
    "dedup_exact_groups",
    "sample_hash_deterministic",
    "text_gopher_filter",
    "sample_target_mix",
    "pipeline_quality_mix_pack",
    "sample_top_share_quality",
    "text_bigram_logprob",
    "sample_dsir_select",
    "text_bpe_encode",
    "dedup_keep_best_quality",
    "text_quality_classifier",
    "text_perplexity_buckets",
    "sample_temperature_mix",
    "text_bpe_encode_ids",
    "pipeline_tokenize_pack",
    "corpus_fertility_by_lang",
    "pack_store_roundtrip",
    # round-5 documents-table sketch queries: NULL/empty/whitespace
    # text must tokenize to nothing identically on both engines, and
    # the empty corpus must yield empty sketches, not crashes
    "sketch_cms_heavy_hitters",
    "sketch_bloom_decontaminate",
    # round-5: perceptual-hash pairs - NULL text must hash as b''
    # (coalesce) identically on both engines; the planted duplicate
    # slice must pair up even when the duplicated text is NULL/empty
    "multimodal_phash_pairs",
    # round-5: audio stats - NULL text must ride the surrogate arm as
    # b'' (duration 0, sha256('') digests) identically on both engines
    "multimodal_audio_stats",
    # round-5: PPS sampling - NULL n_chars weights must never select,
    # identically on both engines; all-zero weights -> empty sample
    "sample_pps_systematic",
    # round-9: the incremental-index screens - the batch split
    # (doc_id % 10 >= 8) carries a NULL-text doc (8: never signs, never
    # matches) and an exact dup of doc 0 (9: must match through the
    # persisted index), in both the batch and streaming arms
    "dedup_incremental_index",
    "stream_lsh_dedup",
    # round-10: substring/paragraph removal and standing-cluster
    # maintenance - NULL/empty/whitespace docs must pass through
    # untouched (n_removed/n_dropped 0, text_clean ''), and the
    # 15-token duplicate pair (docs 6/7) exercises real window
    # removal, paragraph drops, and a corpus-side cluster
    "dedup_remove_substrings",
    "dedup_drop_paragraphs",
    "dedup_incremental_clusters",
    # round-10: the streaming arm of the same - an empty arriving
    # split produces zero triggers (the bootstrap labels ARE the
    # answer), and the NULL-text batch doc must never sign or match
    "stream_cluster_maintenance",
    # round-10: the paragraph-granularity standing-store screen - the
    # 80% id-threshold split puts the NULL/empty/dup rows on both
    # sides across the fixture's id range
    "dedup_incremental_paragraphs",
    # round-10: the span-granularity winnow-store screen - NULL/empty
    # batch docs report 0 fps / 0.0, the exact-dup batch doc (9)
    # overlaps its corpus twin (0) at 1.0
    "dedup_incremental_spans",
    # round-11: the window-digest standing-store screen (removal
    # grain) - NULL/empty batch docs pass through untouched, the
    # batch dup of doc 0 (9) cuts through the persisted store
    "dedup_incremental_substrings",
    # round-11: the composed production-day loop - every stage must
    # survive NULL/empty/whitespace docs on both split sides and the
    # exact-dup pairs must trip the paragraph/span/LSH screens
    "pipeline_daily_ingest",
    # round-11: corpus-frequency boilerplate removal - the NULL-source
    # doc forms its own 1-doc group (min_docs floor keeps everything),
    # the 7-doc "web" group drops its synthesized header/footer, the
    # 2-doc "news" group drops them at exactly the min_docs floor, and
    # the df=2 duplicate bodies (0/9, 6/7) stay below the 30% line
    "text_boilerplate_lines",
    # round-11: the standing-stats boilerplate screen - the 80% split
    # puts docs 9/18 in the batch; their headers/footers cross the
    # union threshold through the CORPUS-side counts (web 7 docs, news
    # 2), and doc 9's duplicate body stays below 30% of the union
    "text_boilerplate_incremental",
    # round-12: the streaming arm of the same - the 80%/90% split
    # sends the tail docs through two REAL triggers; NULL text behaves
    # as '' and NULL sources keep their own group at every trigger
    "stream_boilerplate_screen",
    # round-12: the persisted-index BM25 - NULL/empty docs contribute
    # zero postings and dl=0 length rows (they still count in n_docs
    # and avgdl), identically on both engines
    "search_bm25_incremental",
    # round-13: the streaming arm of the same - the 80%/90% split makes
    # day 1 EMPTY (a zero-row trigger must skip cleanly, no manifest
    # entry) and day 2 the empty-text doc 18 (zero postings, dl=0);
    # the post-stream serve must still equal the global BM25
    "stream_bm25_maintenance",
]


@pytest.fixture(scope="module")
def degenerate_sf_dir(tmp_path_factory):
    folder = tmp_path_factory.mktemp("nulltext")
    rows = [
        (0, "The quick brown fox jumps over the lazy dog", "en", "web", 43),
        (1, None, "en", "web", 0),
        (2, "", "de", "news", 0),
        (3, "   \n  \t ", "fr", "web", 8),
        (4, "foo foo foo foo foo foo foo foo foo foo", "en", "books", 39),
        (5, None, None, None, None),
        # round-10: a 15-token exact-duplicate pair (> the substring
        # query's k=10 window and > one 12-token synthesized
        # paragraph), so window removal, cross-doc paragraph drops and
        # cluster formation all fire on this corpus
        (6, "alpha beta gamma delta epsilon zeta eta theta iota"
            " kappa lambda mu nu xi omicron", "en", "web", 88),
        (7, "alpha beta gamma delta epsilon zeta eta theta iota"
            " kappa lambda mu nu xi omicron", "en", "web", 88),
        # batch-split rows for the round-9 incremental-index screens
        (8, None, "en", "web", 0),
        (9, "The quick brown fox jumps over the lazy dog", "en", "web", 43),
        (18, "", "de", "news", 0),
    ]
    df = pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
    )
    df = df.astype({"doc_id": "int64"})
    con = duckdb.connect()
    con.register("docs", df)
    con.execute(
        "COPY (SELECT doc_id, text, lang, source, CAST(n_chars AS BIGINT)"
        f" AS n_chars FROM docs) TO '{folder}/documents.parquet'"
        " (FORMAT PARQUET)"
    )
    return str(folder)


@pytest.fixture(scope="module")
def ddb(degenerate_sf_dir):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{degenerate_sf_dir}/documents.parquet')"
    )
    return con


@pytest.mark.parametrize("name", DOC_ONLY)
def test_degenerate_text_matches_oracle(spark, ddb, degenerate_sf_dir, name):
    sdf = entrymod.queries()[name](spark, degenerate_sf_dir)
    scols = [c.lower() for c in sdf.columns]
    srows = [tuple(r) for r in sdf.collect()]
    res = ddb.execute(entrymod.oracle_sql()[name])
    dcols = [d[0].lower() for d in res.description]
    drows = res.fetchall()
    assert sorted(scols) == sorted(dcols), f"{name}: {scols} vs {dcols}"
    assert len(srows) == len(drows), (
        f"{name}: row count {len(srows)} vs oracle {len(drows)}"
    )
    sc = rows_canon(scols, srows)
    dc = rows_canon(dcols, drows)
    if sc != dc:
        diffs = [(a, b) for a, b in zip(sc, dc) if a != b][:5]
        raise AssertionError(f"{name}: value mismatch, first diffs: {diffs}")


@pytest.fixture(scope="module")
def empty_sf_dir(tmp_path_factory):
    folder = tmp_path_factory.mktemp("emptydocs")
    con = duckdb.connect()
    con.execute(
        'COPY (SELECT CAST(NULL AS BIGINT) AS doc_id,'
        ' CAST(NULL AS VARCHAR) AS "text", CAST(NULL AS VARCHAR) AS lang,'
        ' CAST(NULL AS VARCHAR) AS source,'
        ' CAST(NULL AS BIGINT) AS n_chars WHERE false) TO'
        f" '{folder}/documents.parquet' (FORMAT PARQUET)"
    )
    return str(folder)


@pytest.fixture(scope="module")
def ddb_empty(empty_sf_dir):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{empty_sf_dir}/documents.parquet')"
    )
    return con


@pytest.mark.parametrize("name", DOC_ONLY)
def test_empty_corpus_matches_oracle(spark, ddb_empty, empty_sf_dir, name):
    """A zero-row corpus must neither crash nor diverge (aggregates may
    legitimately emit a row; both engines must agree on it)."""
    sdf = entrymod.queries()[name](spark, empty_sf_dir)
    scols = [c.lower() for c in sdf.columns]
    srows = [tuple(r) for r in sdf.collect()]
    res = ddb_empty.execute(entrymod.oracle_sql()[name])
    dcols = [d[0].lower() for d in res.description]
    drows = res.fetchall()
    assert sorted(scols) == sorted(dcols), f"{name}: {scols} vs {dcols}"
    assert len(srows) == len(drows), (
        f"{name}: row count {len(srows)} vs oracle {len(drows)}"
    )
    sc = rows_canon(scols, srows)
    dc = rows_canon(dcols, drows)
    assert sc == dc, f"{name}: {sc[:3]} vs {dc[:3]}"

