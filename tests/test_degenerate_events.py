"""Degenerate-events differential suite: NULL timestamps, NULL users,
NULL values/types, malformed JSON props, and exact-timestamp ties must
not diverge between the Spark queries and their DuckDB oracles (the
events twin of the null-text and embeddings suites).

The dangerous class this hunts: window/sort NULL placement. Spark
orders ascending NULLS FIRST by default, DuckDB NULLS LAST - any
ORDER BY over a nullable column where neither side pins the placement
diverges the moment a NULL appears. The pinned events testdata has no
NULLs anywhere, so every such divergence is latent until now.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entrymod
from tests.test_oracle_differential import rows_canon

#: queries over `events` alone (no other tables touched)
EVENTS_ONLY = [
    "w1_latest_event_per_user",
    "w1_maxby_latest_event_per_user",
    "w2_distinct_keys",
    "j5_salted_skew_join",
    "a5_distinct_count_two_stage",
    "asof_last_purchase",
    "asof_next_purchase",
    "range_interval_join",
    "a1_collect_reassembly",
    "f1_json_extract",
    "pattern_a_snapshot_upsert",
    "pattern_b_array_child",
    "pattern_c_collection_refresh",
    "pattern_d_traffic_series",
    "pattern_e_version_log",
    "sessionize_events",
    "stream_windowed_counts",
    "agg_value_percentiles",
    "agg_rollup_daily",
    "pivot_user_event_matrix",
    "w3_lag_event_gaps",
    "setop_user_cohorts",
    "funnel_click_to_purchase",
    "locf_fill_forward",
    "w5_sliding_hour_frame",
    # round-5 events-only additions: the sketch family's event-table
    # members (NULL users/ts must be excluded identically on both
    # sides; the empty corpus must yield 0 rows, not a crash), the
    # streaming-run HLL, and the JSONL round trip ('' vs NULL arms)
    "sketch_hll_distinct",
    "sketch_hll_merge",
    "sketch_histogram_quantiles",
    "stream_hll_distinct",
    "jsonl_round_trip",
    # round-5: densification must drop NULL-ts rows identically and
    # yield an empty frame (not a crash) on the empty corpus
    "timeseries_gap_fill",
    # round-5: SCD2 build - NULL keys/ts dropped identically, NULL
    # event_type forms runs via null-safe comparison on both engines
    "dim_scd2_user_state",
    # round-5: PageRank edge derivation - malformed props must yield a
    # NULL node (json_valid guard vs get_json_object), NULL-k events
    # break chains identically
    "graph_pagerank_transitions",
    # round-5: sweep-line concurrency - NULL ts excluded before
    # sessionization on both engines; the tiny corpus drives the
    # single-session and tie-heavy arms
    "timeseries_max_concurrency",
    # round-9: mergeable stats state - NULL value/user rows must fold
    # identically (sum/min/max ignore NULLs, HLL ignores NULL users;
    # an all-NULL-value day leaves total_value NULL on both engines)
    "sketch_incremental_stats",
    # round-10: the same state folded through the CDC merge sink -
    # NULL-key/value/user handling must survive the bucket-pruned
    # merge_upsert round trip and the touched-keys semi-join
    "sketch_stats_cdc_table",
    # round-11: day-over-day drift - NULL ts rows are excluded
    # EXPLICITLY before the lag window (the NULL-placement divergence
    # this suite hunts); NULL users/values fold into n_keys/null_frac
    # identically, and single-day corpora yield NULL ratio + false
    # flags (no baseline), not a crash
    "dq_drift_by_day",
    # round-11: linear interpolation - NULL ts excluded explicitly,
    # one-sided gaps (leading/trailing) stay NULL, NULL-value purchase
    # rows never become neighbors, tie timestamps break by event_id
    "timeseries_interpolate",
]


@pytest.fixture(scope="module")
def degenerate_events_dir(tmp_path_factory):
    folder = tmp_path_factory.mktemp("degevents")
    rows = [
        (1, "2024-01-01 10:00:00", 1, "click", 1.0,
         '{"page": "a", "items": [{"id": 11, "qty": 2}]}'),
        (2, "2024-01-01 10:10:00", 1, "view", 2.5, '{"page": "b"}'),
        (3, "2024-01-01 11:30:00", 1, "purchase", 9.9, '{"page": "c"}'),
        (4, "2024-01-02 09:00:00", 2, "click", None, None),      # NULL value+props
        (5, "2024-01-02 09:05:00", 2, None, 1.5, "not json"),    # NULL type, bad props
        (6, None, 2, "view", 2.0, '{"page": "d"}'),              # NULL ts
        (7, "2024-01-02 09:05:00", None, "click", 3.0, "{}"),    # NULL user
        (8, "2024-01-01 10:10:00", 1, "view", 2.5, '{"page": "b"}'),  # exact ts tie
        (9, "2024-01-02 23:59:59", 3, "purchase", None, '{"page": "e"}'),
        # purchase WITH an observation for user 2: makes LOCF null-
        # placement observable (a NULL-ts row either precedes or
        # follows this depending on the engine's default null order)
        (10, "2024-01-02 08:00:00", 2, "purchase", 4.0, '{"k": "7"}'),
        # purchase with MALFORMED props: the json path must yield NULL,
        # not an engine error, even when the extraction branch is taken
        (11, "2024-01-02 09:30:00", 2, "purchase", 5.0, "{broken"),
    ]
    df = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    con = duckdb.connect()
    con.register("ev", df)
    con.execute(
        "COPY (SELECT CAST(event_id AS BIGINT) AS event_id,"
        " CAST(ts AS TIMESTAMP) AS ts, CAST(user_id AS BIGINT) AS user_id,"
        " event_type, CAST(value AS DOUBLE) AS value, props FROM ev) TO"
        f" '{folder}/events.parquet' (FORMAT PARQUET)"
    )
    return str(folder)


@pytest.fixture(scope="module")
def ddb_events(degenerate_events_dir):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{degenerate_events_dir}/events.parquet')"
    )
    return con


@pytest.mark.parametrize("name", EVENTS_ONLY)
def test_degenerate_events_match_oracle(
    spark, ddb_events, degenerate_events_dir, name
):
    sdf = entrymod.queries()[name](spark, degenerate_events_dir)
    scols = [c.lower() for c in sdf.columns]
    srows = [tuple(r) for r in sdf.collect()]
    res = ddb_events.execute(entrymod.oracle_sql()[name])
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
def empty_events_dir(tmp_path_factory):
    folder = tmp_path_factory.mktemp("emptyevents")
    con = duckdb.connect()
    con.execute(
        "COPY (SELECT CAST(NULL AS BIGINT) AS event_id,"
        " CAST(NULL AS TIMESTAMP) AS ts, CAST(NULL AS BIGINT) AS user_id,"
        " CAST(NULL AS VARCHAR) AS event_type, CAST(NULL AS DOUBLE) AS value,"
        " CAST(NULL AS VARCHAR) AS props WHERE false) TO"
        f" '{folder}/events.parquet' (FORMAT PARQUET)"
    )
    return str(folder)


@pytest.fixture(scope="module")
def ddb_empty_events(empty_events_dir):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{empty_events_dir}/events.parquet')"
    )
    return con


@pytest.mark.parametrize("name", EVENTS_ONLY)
def test_empty_events_match_oracle(spark, ddb_empty_events, empty_events_dir, name):
    """A zero-row events table must neither crash nor diverge (global
    aggregates may legitimately emit a row; both engines must agree)."""
    sdf = entrymod.queries()[name](spark, empty_events_dir)
    scols = [c.lower() for c in sdf.columns]
    srows = [tuple(r) for r in sdf.collect()]
    res = ddb_empty_events.execute(entrymod.oracle_sql()[name])
    dcols = [d[0].lower() for d in res.description]
    drows = res.fetchall()
    assert sorted(scols) == sorted(dcols), f"{name}: {scols} vs {dcols}"
    assert len(srows) == len(drows), (
        f"{name}: row count {len(srows)} vs oracle {len(drows)}"
    )
    assert rows_canon(scols, srows) == rows_canon(dcols, drows)
