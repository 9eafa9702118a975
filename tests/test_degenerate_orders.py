"""Degenerate-orders differential suite: NULL custkeys, NULL
priorities, NULL prices and an empty table must not diverge between
the Spark queries and their DuckDB oracles - the orders twin of the
events/embeddings/null-text suites, covering the round-5 queries that
read orders (and customer, for the runtime-filter join).

The dangerous class here: NULL join/sketch keys. The KMV sketches hash
o_custkey (NULL must be excluded identically, never hashed as a
string 'None'/'NULL'), bool_or-style flag aggregation must not count
NULL-key customers, and the bloom-prefiltered join must drop NULL fact
keys exactly like the plain join it claims to equal.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entrymod
from tests.test_oracle_differential import rows_canon

#: queries over orders (+customer for j6) alone; queries needing
#: lineitem or other tables stay with the sf-corpus differential
ORDERS_ONLY = [
    "sketch_kmv_distinct",
    "sketch_kmv_overlap",
    "j6_bloom_prefilter_join",
    # the referential check FAILS here (custkey 13 missing from the
    # customer dim) - the one place the passed=False arm is driven
    # through the full oracle comparison
    "dq_validate_orders",
    # z-order stats: NULL custkey/orderdate dropped identically; the
    # tiny corpus drives the near-degenerate min/max scaling arms
    "layout_zorder_buckets",
    # edit-distance join: NULL names never pair, ""/"b" pair through
    # the identity variant, and a genuine distance-1 name pair
    "j7_edit_distance_join",
    # round-11 changefeed emission: the NULL-price key (4) rides the
    # delete arm carrying its NULL, key 7 is a genuine update, and
    # keys 3/6 insert (6 with NULL date/priority outside the
    # projection) - the full-outer diff must stay null-safe throughout
    "dim_table_changes",
    # round-11 streaming changefeed: keys 3/6 insert on trigger 0,
    # key 7 is a genuine doubled-price update, key 4 deletes carrying
    # its NULL price, and trigger 1's only live arm is the k%5=0
    # delete (key 5) - two real triggers over a 7-row table, feeds
    # emitted through the same null-safe diff
    "stream_changefeed_emission",
    # round-12 changefeed consumption: the NULL-price rows carry NULL
    # cents through insert/retract (n_vals stays exact, an all-NULL
    # group reports sum_v NULL), the NULL status coalesces to the ''
    # group, and the two-day fold must land on the recompute
    "dim_changefeed_consume",
    # round-13 join IVM: the NULL-custkey order (5) sits in the index
    # but never joins, the NULL-key customer row is filtered up front,
    # key 7's FK move (10 -> 11) lands via its U_pre preimage, and the
    # day-1 B insert of the ck%5=0 slice gives previously-unmatched
    # orders their match - the two-day fold must equal the final join
    "dim_join_ivm",
    # round-13 extrema IVM: the NULL-price order (4) keeps n_vals
    # exact through insert AND the sentinel NULL group starts at
    # n_vals=0; day-2's sentinel deletes retract a genuine group max
    # (re-derived through the group-bucketed upstream) and one of a
    # tied pair (max survives)
    "dim_minmax_ivm",
    # round-13 streaming join IVM: trigger 0 bootstraps from the tiny
    # fact slice (NULL-custkey order 5 sits in the index, never
    # joins); trigger 1's lone FK move (key 7, 10 -> 11) must land
    # through the preimage feed against the static dimension
    "stream_join_ivm",
    # round-13 streaming aggregate IVM: the NULL-price key (4) rides
    # the NULL-cents arm through the stats fold, key 7's doubled
    # cents emits a genuine U pair, key 5 deletes - both downstream
    # tables (stats + extrema) must land on the recompute through
    # the per-table version ledger
    "stream_aggregate_ivm",
    # round-13 chained gold: key 7's FK move shifts its row between
    # NATION groups through TWO IVM hops (fact feed -> join; the
    # join's own changefeed -> gold stats); the NULL-nationkey
    # customer coalesces to the -1 group
    "pipeline_ivm_gold",
]


def _write_orders(folder, rows) -> None:
    df = pd.DataFrame(
        rows,
        columns=[
            "o_orderkey",
            "o_custkey",
            "o_orderstatus",
            "o_totalprice",
            "o_orderdate",
            "o_orderpriority",
        ],
    )
    con = duckdb.connect()
    con.register("o", df)
    con.execute(
        "COPY (SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey,"
        " CAST(o_custkey AS BIGINT) AS o_custkey, o_orderstatus,"
        " CAST(o_totalprice AS DOUBLE) AS o_totalprice,"
        " CAST(o_orderdate AS DATE) AS o_orderdate, o_orderpriority"
        " FROM o) TO"
        f" '{folder}/orders.parquet' (FORMAT PARQUET)"
    )


def _write_customer(folder, rows) -> None:
    df = pd.DataFrame(
        rows,
        columns=[
            "c_custkey", "c_name", "c_mktsegment", "c_acctbal",
            "c_nationkey",
        ],
    )
    con = duckdb.connect()
    con.register("c", df)
    con.execute(
        "COPY (SELECT CAST(c_custkey AS BIGINT) AS c_custkey, c_name,"
        " c_mktsegment, CAST(c_acctbal AS DOUBLE) AS c_acctbal,"
        " CAST(c_nationkey AS BIGINT) AS c_nationkey"
        " FROM c) TO"
        f" '{folder}/customer.parquet' (FORMAT PARQUET)"
    )


@pytest.fixture(scope="module")
def degenerate_orders_dir(tmp_path_factory):
    folder = tmp_path_factory.mktemp("degorders")
    _write_orders(
        folder,
        [
            (1, 10, "O", 100.0, "2024-01-01", "1-URGENT"),
            (2, 10, "O", 200.0, "2024-01-02", "5-LOW"),   # overlap cust
            (3, 11, "F", 50.0, "2024-01-03", "1-URGENT"),
            (4, 12, "O", None, "2024-01-04", "5-LOW"),    # NULL price
            (5, None, "O", 75.0, "2024-01-05", "1-URGENT"),  # NULL cust
            (6, 13, "O", 60.0, None, None),               # NULL priority
            (7, 10, "O", 10.0, "2024-01-06", "1-URGENT"),  # dup cust+prio
        ],
    )
    _write_customer(
        folder,
        [
            # c_name values drive j7: "Cust#10"/"Cust#11" are a real
            # distance-1 pair, "ab"/"b" pair through the identity
            # variant, NULL names never pair, "" pairs with "b"
            (10, "Cust#10", "BUILDING", 9000.0, 1),
            (11, "Cust#11", "MACHINERY", 100.0, 2),  # fails acctbal filter
            (12, None, "AUTOMOBILE", 8000.0, None),   # NULL name+nation
            (None, "ab", "HOUSEHOLD", 9999.0, 3),     # NULL dim key
            # keys 20/21 on purpose: custkey 13 must STAY missing from
            # the dim so dq's referential check keeps its failing arm
            (20, "b", "FURNITURE", 1.0, 4),
            (21, "", "FURNITURE", 2.0, 4),            # empty-string name
        ],
    )
    return str(folder)


@pytest.fixture(scope="module")
def ddb_orders(degenerate_orders_dir):
    con = duckdb.connect()
    for t in ("orders", "customer"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{degenerate_orders_dir}/{t}.parquet')"
        )
    return con


@pytest.mark.parametrize("name", ORDERS_ONLY)
def test_degenerate_orders_match_oracle(
    spark, ddb_orders, degenerate_orders_dir, name
):
    sdf = entrymod.queries()[name](spark, degenerate_orders_dir)
    scols = [c.lower() for c in sdf.columns]
    srows = [tuple(r) for r in sdf.collect()]
    res = ddb_orders.execute(entrymod.oracle_sql()[name])
    dcols = [d[0].lower() for d in res.description]
    drows = res.fetchall()
    assert sorted(scols) == sorted(dcols), f"{name}: {scols} vs {dcols}"
    assert len(srows) == len(drows), (
        f"{name}: row count {len(srows)} vs oracle {len(drows)}"
    )
    assert rows_canon(scols, srows) == rows_canon(dcols, drows)


@pytest.fixture(scope="module")
def empty_orders_dir(tmp_path_factory):
    folder = tmp_path_factory.mktemp("emptyorders")
    con = duckdb.connect()
    con.execute(
        "COPY (SELECT CAST(NULL AS BIGINT) AS o_orderkey,"
        " CAST(NULL AS BIGINT) AS o_custkey,"
        " CAST(NULL AS VARCHAR) AS o_orderstatus,"
        " CAST(NULL AS DOUBLE) AS o_totalprice,"
        " CAST(NULL AS DATE) AS o_orderdate,"
        " CAST(NULL AS VARCHAR) AS o_orderpriority WHERE false) TO"
        f" '{folder}/orders.parquet' (FORMAT PARQUET)"
    )
    con.execute(
        "COPY (SELECT CAST(NULL AS BIGINT) AS c_custkey,"
        " CAST(NULL AS VARCHAR) AS c_name,"
        " CAST(NULL AS VARCHAR) AS c_mktsegment,"
        " CAST(NULL AS DOUBLE) AS c_acctbal WHERE false) TO"
        f" '{folder}/customer.parquet' (FORMAT PARQUET)"
    )
    return str(folder)


@pytest.fixture(scope="module")
def ddb_empty_orders(empty_orders_dir):
    con = duckdb.connect()
    for t in ("orders", "customer"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{empty_orders_dir}/{t}.parquet')"
        )
    return con


@pytest.mark.parametrize(
    "name",
    [
        "sketch_kmv_distinct",
        "sketch_kmv_overlap",
        "j6_bloom_prefilter_join",
        "dq_validate_orders",
        "layout_zorder_buckets",
        "j7_edit_distance_join",
    ],
)
def test_empty_orders_match_oracle(
    spark, ddb_empty_orders, empty_orders_dir, name
):
    """A zero-row orders table must neither crash nor diverge."""
    sdf = entrymod.queries()[name](spark, empty_orders_dir)
    scols = [c.lower() for c in sdf.columns]
    srows = [tuple(r) for r in sdf.collect()]
    res = ddb_empty_orders.execute(entrymod.oracle_sql()[name])
    dcols = [d[0].lower() for d in res.description]
    drows = res.fetchall()
    assert sorted(scols) == sorted(dcols), f"{name}: {scols} vs {dcols}"
    assert len(srows) == len(drows), (
        f"{name}: row count {len(srows)} vs oracle {len(drows)}"
    )
    assert rows_canon(scols, srows) == rows_canon(dcols, drows)
