"""Degenerate-embeddings differential suite: NULL vectors, a zero-norm
vector, exact duplicates, and scaled copies must not diverge between
the Spark queries and their DuckDB oracles (the embeddings twin of
tests/test_null_text_robustness.py - the pinned testdata contains none
of these rows, so any divergence they cause is latent until a real
corpus hits it).

Known-agreeing degeneracy this pins: a zero-norm vector makes cosine
NaN on the Spark/numpy side (NaN >= t is False -> excluded) and NULL
on the DuckDB side (x/0.0 is NULL -> excluded) - different values,
same decision. The suite proves the decision parity holds everywhere
the cosine paths compare or rank.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entrymod
from tests.test_oracle_differential import rows_canon

#: queries over `embeddings` alone. Constraints honored by the fixture:
#: sim_ivf_topk's deterministic quantizer takes the 16 LOWEST ids as
#: centroids, so ids 0..15 are well-behaved vectors (a zero-norm
#: centroid would hit engine-specific NaN-vs-NULL ranking; the learned
#: paths guard it explicitly); the degenerate rows sit at ids 16+.
EMB_ONLY = [
    "dedup_embedding_cosine",
    "sim_knn_bruteforce",
    "sim_knn_pandas_gemm",
    "sim_knn_int8_dot",
    "sim_ann_lsh",
    "sim_ivf_topk",
    "sim_ivf_kmeans_topk",
    "sim_kmeans_assign",
    "embedding_quantize_int8",
    "dedup_semantic_prune",
    "sim_knn_graph",
    "sim_pq_adc_topk",
    "embedding_random_projection",
    # round-9: persisted-postings IVF - the zero-norm (id 18) and NULL
    # (id 19) vectors land in the DELTA split and must be excluded
    # from its appended postings identically on both engines
    "sim_ivf_delta_append",
    # round-12: incremental SemDeDup - the duplicate (16), scaled copy
    # (17), zero-norm (18), and NULL (19) all land in the BATCH split
    # and must screen against the standing postings identically (NaN
    # cosine never drops; the duplicate of id 0 must drop)
    "dedup_semantic_incremental",
    # round-12: the streaming arm - the dup/scaled rows (16, 17) land
    # in trigger 0 and the zero-norm/NULL rows (18, 19) in trigger 1;
    # the NULL row must vanish before the stream and the zero-norm
    # row must screen (NaN never drops) through the postings store
    "stream_semantic_dedup",
]

DIM = 64  # the width the registered queries pin (ann dim=64)


@pytest.fixture(scope="module")
def degenerate_emb_dir(tmp_path_factory):
    folder = tmp_path_factory.mktemp("degemb")

    def vec(seed: int) -> list[float]:
        # deterministic, engine-independent spread; exactly
        # representable doubles so parquet float->double is stable
        return [((seed * 31 + i * 7) % 13 - 6) / 8.0 for i in range(DIM)]

    rows = [(i, vec(i), i % 3) for i in range(16)]
    rows.append((16, vec(0), 0))                      # exact duplicate of id 0
    rows.append((17, [x * 0.5 for x in vec(1)], 1))   # scaled copy: cosine 1.0
    rows.append((18, [0.0] * DIM, 2))                 # zero-norm vector
    rows.append((19, None, None))                     # NULL embedding
    df = pd.DataFrame(rows, columns=["vec_id", "embedding", "label"])
    con = duckdb.connect()
    con.register("emb", df)
    con.execute(
        "COPY (SELECT CAST(vec_id AS BIGINT) AS vec_id,"
        " CAST(embedding AS FLOAT[]) AS embedding,"
        " CAST(label AS INTEGER) AS label FROM emb) TO"
        f" '{folder}/embeddings.parquet' (FORMAT PARQUET)"
    )
    return str(folder)


@pytest.fixture(scope="module")
def ddb_emb(degenerate_emb_dir):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{degenerate_emb_dir}/embeddings.parquet')"
    )
    return con


@pytest.mark.parametrize("name", EMB_ONLY)
def test_degenerate_embeddings_match_oracle(
    spark, ddb_emb, degenerate_emb_dir, name
):
    sdf = entrymod.queries()[name](spark, degenerate_emb_dir)
    scols = [c.lower() for c in sdf.columns]
    srows = [tuple(r) for r in sdf.collect()]
    res = ddb_emb.execute(entrymod.oracle_sql()[name])
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


def test_empty_embeddings_contracts(spark):
    """A zero-row embeddings corpus: the pair/graph operators return
    empty frames; the learned-centroid operators fail LOUDLY (k-means
    cannot init k centroids from nothing) rather than emitting
    garbage."""
    from ghcrawler_datalake_etl_spark.operators import clustering as CL
    from ghcrawler_datalake_etl_spark.operators import dedup as DD
    from ghcrawler_datalake_etl_spark.operators import similarity as S

    empty = spark.createDataFrame(
        [], "vec_id long, embedding array<float>, label int"
    )
    assert DD.embedding_cosine_pairs_gemm(
        empty, "vec_id", "embedding", threshold=0.5
    ).count() == 0
    assert S.knn_graph(empty, "vec_id", "embedding", k=3).count() == 0
    assert S.cosine_topk_pandas(empty, empty, "vec_id", "embedding", k=3).count() == 0
    assert S.int8_dot_topk_pandas(empty, empty, "vec_id", "embedding", k=3).count() == 0
    with pytest.raises(ValueError, match="only 0 non-null vectors"):
        CL.kmeans_fit(empty, "vec_id", "embedding", k=4)
    with pytest.raises(ValueError, match="only 0 non-null vectors"):
        # SemDeDup's training stage inherits the same loud contract
        DD.semantic_dedup(
            empty, "vec_id", "embedding",
            CL.kmeans_fit(empty, "vec_id", "embedding", k=2), threshold=0.5,
        )
