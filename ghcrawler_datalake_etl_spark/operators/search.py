"""Lexical full-text search: BM25 scoring over the document corpus.

The retrieval complement to the embedding paths in
operators/similarity.py - at 100 TB the lexical index is the cheap
first-stage retriever (exact term match, no model) in front of the
vector rerankers.

Spark-first shape: everything is one declarative plan over the inverted
layout -

1. tokenize -> posexplode -> per-(doc, term) term frequencies, with the
   QUERY-TERM FILTER applied before the explode's groupBy, so the only
   shuffle carries matched terms (a handful of rows per doc), never the
   vocabulary;
2. document frequency per query term (k rows) and the corpus constants
   (N, total token count) - driver-scale aggregates, broadcast back as
   literals/joins;
3. per-term BM25 contributions, collected per doc as a TERM-SORTED
   array and folded left-to-right - summation ORDER is pinned, so the
   score is bit-reproducible across engines (a plain SUM() would add
   doubles in partition order). ln() is the one per-engine wobble
   (libm last-ulp); scores are floor-quantized before ranking.

Uses the Lucene/BM25+ idf form: ln(1 + (N - df + 0.5)/(df + 0.5)),
non-negative for any df.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ghcrawler_datalake_etl_spark.functions.core import quantize
from ghcrawler_datalake_etl_spark.operators.text import tokenize

K1 = 1.2
B = 0.75


def _doc_term_tf(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """The shared lexical index: (doc_id, term, tf), materialized.

    Every consumer builds this frame with the IDENTICAL construction on
    the same input plan, so Spark's cache manager substitutes one
    persisted copy for all of them (the jaccard-pairs-cache contract):
    consumers WITHIN one query (the bigram model's unigram fallback
    rides its unigram sibling's copy) pay the tokenize + explode + tf
    shuffle once. ACROSS queries the copy lives only until the loop
    boundary: the persist registers in the release registry and
    bench.py/probe_strict drain it after each query's reps, so the
    unigram LM, TF-IDF, and bigram queries each rebuild it - the
    deliberate loop discipline (release_materialized) that keeps a
    167-query sweep from evicting the live query's cache."""
    from ghcrawler_datalake_etl_spark.operators.dedup import _materialize

    base = df.select(
        F.col(id_col).alias("doc_id"),
        tokenize(F.col(text_col)).alias("toks"),
    )
    return _materialize(
        base.select("doc_id", F.explode("toks").alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )


def unigram_logprob(
    df: DataFrame,
    id_col: str,
    text_col: str,
) -> DataFrame:
    """Per-document average unigram log-probability under the corpus's
    own add-one-smoothed unigram model - the CCNet-style language-model
    quality signal (wildly unlikely token streams score very negative;
    typical prose sits near the corpus average) without shipping an
    external LM.

    Returns (id, n_tokens, avg_logprob). Shape: one exploded (doc,
    term) tf aggregate (map-side combinable), the vocabulary derived
    from it by a second O(distinct-terms) aggregate, a term equi-join,
    and a TERM-SORTED fold per document so the float sum is
    bit-reproducible (same contract as bm25_topk; ln() wobble is
    floor-quantized away).
    """
    # tf feeds three consumers here (the scoring join, the vocabulary,
    # and the corpus constants) AND other lexical queries in the same
    # process - the shared _doc_term_tf cache slot
    tf = _doc_term_tf(df, id_col, text_col)
    vocab = tf.groupBy("term").agg(F.sum("tf").alias("n"))
    consts = vocab.agg(
        F.sum("n").alias("total"), F.count("*").alias("vocab")
    )
    contrib = (
        tf.join(vocab, "term")
        .crossJoin(F.broadcast(consts))
        .select(
            "doc_id",
            "term",
            "tf",
            (
                F.col("tf")
                * F.log(
                    (F.col("n") + F.lit(1.0))
                    / (F.col("total") + F.col("vocab"))
                )
            ).alias("contrib"),
        )
    )
    return (
        contrib.groupBy("doc_id")
        .agg(
            F.sum("tf").alias("n_tokens"),
            F.array_sort(
                F.collect_list(F.struct("term", "contrib"))
            ).alias("_parts"),
        )
        .select(
            "doc_id",
            "n_tokens",
            quantize(
                F.aggregate(
                    F.col("_parts"),
                    F.lit(0.0),
                    lambda acc, p: acc + p["contrib"],
                )
                / F.col("n_tokens"),
                4,
            ).alias("avg_logprob"),
        )
    )


def perplexity_buckets(
    df: DataFrame,
    id_col: str,
    text_col: str,
) -> DataFrame:
    """CCNet-style perplexity bucketing (Wenzek et al. 2020, public
    recipe): score every document with the corpus's own smoothed
    unigram LM (:func:`unigram_logprob`) and split the corpus into
    head / middle / tail thirds by that score - the standard
    quality-tiering step before mixing training data (head = most
    LM-typical text).

    Returns (doc_id, n_tokens, avg_logprob, bucket). Bucket boundaries
    are DISCRETE thirds computed with pure integer arithmetic - no
    percentile interpolation anywhere, so any engine replays the exact
    same split: avg_logprob is mapped to integer micro-units
    (round(x * 1e4) - exact: x is already floor-quantized to 4dp), the
    bounded distinct-value histogram gets an ascending running count,
    and boundary b_k is the smallest value whose running count reaches
    ceil(k * N / 3). Ties share a value and therefore a bucket, so
    bucket sizes deviate from N/3 only by tie mass.

    Scale shape: the LM scoring is unigram_logprob's (shared tf cache,
    map-side aggregates); the per-doc score frame feeds three
    consumers (histogram, corpus count, final labeling) and is
    persisted once - a narrow (id, 2 numbers) projection, spill-safe.
    The histogram is an aggregate over distinct 4dp score values -
    bounded cardinality (~1e5 for real corpora) regardless of corpus
    size, so its single-partition running-sum window and the two-row
    boundary pull are driver-scale, the same bounded-frame contract as
    pack_shards offsets. The corpus then takes one broadcast-join pass
    to label buckets.
    """
    from pyspark.sql import Window

    from ghcrawler_datalake_etl_spark.operators.dedup import _materialize

    lp = _materialize(
        unigram_logprob(df, id_col, text_col).withColumn(
            "_lpi", F.round(F.col("avg_logprob") * 10000, 0).cast("long")
        )
    )
    hist = lp.groupBy("_lpi").agg(F.count("*").alias("_c"))
    cum = hist.withColumn(
        "_cum",
        F.sum("_c").over(
            Window.orderBy("_lpi").rowsBetween(
                Window.unboundedPreceding, 0
            )
        ),
    )
    consts = lp.agg(F.count("*").alias("_n"))
    bounds = cum.crossJoin(F.broadcast(consts)).agg(
        F.min(
            F.when(F.col("_cum") * 3 >= F.col("_n"), F.col("_lpi"))
        ).alias("_b1"),
        F.min(
            F.when(F.col("_cum") * 3 >= F.col("_n") * 2, F.col("_lpi"))
        ).alias("_b2"),
    )
    return (
        lp.crossJoin(F.broadcast(bounds))
        .select(
            "doc_id",
            "n_tokens",
            "avg_logprob",
            F.when(F.col("_lpi") <= F.col("_b1"), F.lit("tail"))
            .when(F.col("_lpi") <= F.col("_b2"), F.lit("middle"))
            .otherwise(F.lit("head"))
            .alias("bucket"),
        )
    )


def bm25_topk(
    df: DataFrame,
    id_col: str,
    text_col: str,
    query_terms: list[str],
    top_k: int = 10,
    k1: float = K1,
    b: float = B,
) -> DataFrame:
    """Top-k documents for a bag of query terms by BM25.

    Returns (id, n_terms_matched, score) ranked by (quantized score
    desc, id) - the quantized score is the ranking key so last-ulp ln()
    noise can never flip the order between engines.

    Scale: the tf frame after the query-term filter is O(matches), the
    df/constants aggregates are k rows + 2 scalars, and the final
    ranking is a distributed top-k (TakeOrderedAndProject), not a
    global sort.
    """
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    terms = sorted(set(t.lower() for t in query_terms))

    base = df.select(
        F.col(id_col).alias("doc_id"),
        tokenize(F.col(text_col)).alias("toks"),
    )
    lens = base.select("doc_id", F.size("toks").alias("dl"))

    tf = (
        base.select("doc_id", F.explode("toks").alias("term"))
        .filter(F.col("term").isin(terms))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    return _bm25_score_tail(tf, lens, top_k, k1, b)


def bm25_index(
    df: DataFrame, id_col: str, text_col: str
) -> tuple[DataFrame, DataFrame]:
    """The STANDING state of incremental lexical retrieval: the full
    inverted index ``(term, doc_id, tf)`` plus the per-document length
    table ``(doc_id, dl)`` - everything BM25 needs, and both
    APPEND-ONLY: each document contributes its rows exactly once, and
    every query-time statistic derives from them (df = postings count
    per term, n_docs/avgdl from the lengths), so a day's index
    maintenance is ``bm25_index(batch)`` appended to the stores -
    corpus text never re-tokenized (the same delta-append loop as the
    LSH band / paragraph-hash / IVF postings stores; no fold step at
    all, unlike the boilerplate stats). Write postings repartitioned
    by term (and sorted within partitions) so query-term predicates
    prune at the scan; at warehouse scale, partition or bucket by a
    term hash."""
    base = df.select(
        F.col(id_col).alias("doc_id"),
        tokenize(F.col(text_col)).alias("toks"),
    )
    postings = (
        base.select("doc_id", F.explode("toks").alias("term"))
        .groupBy("term", "doc_id")
        .agg(F.count("*").alias("tf"))
    )
    doc_stats = base.select("doc_id", F.size("toks").alias("dl"))
    return postings, doc_stats


def bm25_topk_index(
    postings: DataFrame,
    doc_stats: DataFrame,
    query_terms: list[str],
    top_k: int = 10,
    k1: float = K1,
    b: float = B,
) -> DataFrame:
    """BM25 top-k over a PERSISTED index (:func:`bm25_index` read back
    from parquet) - bit-identical to :func:`bm25_topk` over the same
    corpus (same scoring tail, same term-sorted fold), with zero
    corpus-side recompute: the only data-sized touch is the postings
    scan under the query-term predicate (pushdown-prunable), the
    df/constants aggregates are k rows + 2 scalars, and the ranking is
    a distributed top-k."""
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    terms = sorted(set(t.lower() for t in query_terms))
    tf = postings.filter(F.col("term").isin(terms)).select(
        "doc_id", "term", "tf"
    )
    return _bm25_score_tail(tf, doc_stats, top_k, k1, b)


def _bm25_score_tail(
    tf: DataFrame, lens: DataFrame, top_k: int, k1: float, b: float
) -> DataFrame:
    """Shared BM25 scoring from a (doc_id, term, tf) frame and a
    (doc_id, dl) frame - the single implementation behind the direct
    and the persisted-index paths keeps their outputs bit-identical."""
    consts = lens.agg(
        F.count("*").alias("n_docs"), F.sum("dl").alias("total_dl")
    )
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))

    # exact corpus constants ride in via a 1-row cross join (broadcast);
    # avgdl derives as an exact integer ratio inside the expression
    scored_terms = (
        tf.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(consts))
        .select(
            "doc_id",
            "term",
            (
                F.log(
                    F.lit(1.0)
                    + (F.col("n_docs") - F.col("df") + F.lit(0.5))
                    / (F.col("df") + F.lit(0.5))
                )
                * (F.col("tf") * (k1 + 1))
            ).alias("_num"),
            (F.col("tf").cast("double")).alias("_tf"),
            (F.col("total_dl").cast("double") / F.col("n_docs")).alias(
                "_avgdl"
            ),
        )
        .join(lens, "doc_id")
        .select(
            "doc_id",
            "term",
            (
                F.col("_num")
                / (
                    F.col("_tf")
                    + F.lit(k1)
                    * (
                        F.lit(1 - b)
                        + F.lit(b) * F.col("dl") / F.col("_avgdl")
                    )
                )
            ).alias("contrib"),
        )
    )

    per_doc = (
        scored_terms.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_terms_matched"),
            F.array_sort(
                F.collect_list(F.struct("term", "contrib"))
            ).alias("_parts"),
        )
        .select(
            "doc_id",
            "n_terms_matched",
            quantize(
                F.aggregate(
                    F.col("_parts"),
                    F.lit(0.0),
                    lambda acc, p: acc + p["contrib"],
                ),
                4,
            ).alias("score"),
        )
    )
    return per_doc.orderBy(F.desc("score"), "doc_id").limit(top_k)


def tfidf_cosine_topk(
    df: DataFrame,
    id_col: str,
    text_col: str,
    query_terms: list[str],
    top_k: int = 10,
) -> DataFrame:
    """Top-k documents by TF-IDF cosine similarity to a bag-of-words
    query - the vector-space retrieval classic (Salton), complementing
    bm25_topk (probabilistic) and the embedding paths (dense).

    Returns (id, n_terms_matched, score) ranked by (quantized score
    desc, id). Weights: w = tf * idf with sklearn-style smooth
    idf = ln((1+N)/(1+df)) + 1; query weights are the idf of each
    distinct query term present in the corpus (binary query tf), and
    the score is the cosine dot(w_d, w_q) / (|w_d| * |w_q|).

    Cross-engine exactness: idf is floor-quantized to 6 decimals AT THE
    SOURCE, so ln()'s last-ulp libm wobble never enters the arithmetic;
    every later product/sum runs on bit-identical doubles in TERM-SORTED
    fold order, and IEEE sqrt/divide are correctly rounded - the oracle
    matches bit-for-bit before the final 4-decimal quantize.

    Scale: unlike bm25_topk (which filters to query terms before any
    shuffle), the document NORM is intrinsically corpus-wide - one
    (doc, term) tf aggregate, one O(vocab) df aggregate, one term join,
    one per-doc fold: the same cost class as unigram_logprob, paid
    once per corpus in a real deployment (norms are query-independent
    and cacheable). The query-dependent part - dot products and
    ranking - touches only matched terms and ends in a distributed
    top-k.
    """
    from ghcrawler_datalake_etl_spark.operators.dedup import _materialize

    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    terms = sorted(set(t.lower() for t in query_terms))

    base = df.select(
        F.col(id_col).alias("doc_id"),
        tokenize(F.col(text_col)).alias("toks"),
    )
    # shared lexical index (one cache slot with unigram/bigram LM)
    tf = _doc_term_tf(df, id_col, text_col)
    consts = base.agg(F.count("*").alias("n_docs"))
    idf = _materialize(
        tf.groupBy("term")
        .agg(F.count("*").alias("df"))
        .crossJoin(F.broadcast(consts))
        .select(
            "term",
            quantize(
                F.log(
                    (F.col("n_docs") + F.lit(1.0)) / (F.col("df") + F.lit(1.0))
                )
                + F.lit(1.0),
                6,
            ).alias("idf"),
        )
    )
    w = tf.join(idf, "term").select(
        "doc_id", "term", (F.col("tf") * F.col("idf")).alias("w"), "idf"
    )

    def _sorted_fold(parts, fn):
        return F.aggregate(F.array_sort(parts), F.lit(0.0), fn)

    norms = w.groupBy("doc_id").agg(
        F.sqrt(
            _sorted_fold(
                F.collect_list(F.struct("term", "w")),
                lambda acc, p: acc + p["w"] * p["w"],
            )
        ).alias("norm_d")
    )
    q = idf.filter(F.col("term").isin(terms))
    norm_q = q.agg(
        F.sqrt(
            _sorted_fold(
                F.collect_list(F.struct("term", "idf")),
                lambda acc, p: acc + p["idf"] * p["idf"],
            )
        ).alias("norm_q")
    )
    dot = (
        w.filter(F.col("term").isin(terms))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_terms_matched"),
            _sorted_fold(
                F.collect_list(F.struct("term", F.col("w"), F.col("idf"))),
                lambda acc, p: acc + p["w"] * p["idf"],
            ).alias("dot"),
        )
    )
    scored = (
        dot.join(norms, "doc_id")
        .crossJoin(F.broadcast(norm_q))
        .select(
            "doc_id",
            "n_terms_matched",
            quantize(
                F.col("dot") / (F.col("norm_d") * F.col("norm_q")), 4
            ).alias("score"),
        )
    )
    return scored.orderBy(F.desc("score"), "doc_id").limit(top_k)


def hybrid_rrf_topk(
    rankings: list[DataFrame],
    id_col: str = "doc_id",
    rank_col: str = "rank",
    k: float = 60.0,
    top_k: int = 10,
    weights: list[float] | None = None,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al. 2009) of N retrieval
    rankings - the standard hybrid-retrieval combiner (BM25 + dense,
    or any mix): ``rrf = sum_i w_i / (k + rank_i)`` over the lists
    that retrieved the id; absent lists contribute nothing. Rank-based
    fusion needs no score calibration between modalities, which is
    exactly why it is the production default for lexical+vector
    hybrids.

    Each input frame carries (``id_col``, ``rank_col``) - the top-N of
    one retriever with deterministic ranks (quantized-score-desc, id).
    Returns (id, n_lists, rrf_score) ranked by (quantized score desc,
    id), limited to ``top_k``.

    Determinism: contributions fold in LIST-INDEX order (the same
    sorted-struct fold the BM25 score uses), so the double sum is
    bit-reproducible across engines; the score quantizes before
    ranking.

    Scale: inputs are already distributed top-Ns (TakeOrderedAndProject
    / windowed rank filters), so fusion touches O(top_n x lists) rows -
    candidate-set sized, never corpus-sized.
    """
    if not rankings:
        raise ValueError("rankings must be non-empty")
    w = [1.0] * len(rankings) if weights is None else [float(x) for x in weights]
    if len(w) != len(rankings):
        raise ValueError("weights must match rankings length")
    tagged = None
    for i, r in enumerate(rankings):
        t = r.select(
            F.col(id_col).alias("doc_id"),
            F.lit(i).alias("li"),
            F.col(rank_col).cast("long").alias("rnk"),
            F.lit(w[i]).alias("w"),
        )
        tagged = t if tagged is None else tagged.unionByName(t)
    fused = (
        tagged.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_lists"),
            F.array_sort(
                F.collect_list(F.struct("li", F.col("rnk"), F.col("w")))
            ).alias("_parts"),
        )
        .select(
            "doc_id",
            "n_lists",
            quantize(
                F.aggregate(
                    F.col("_parts"),
                    F.lit(0.0),
                    lambda acc, p: acc + p["w"] / (F.lit(float(k)) + p["rnk"]),
                ),
                6,
            ).alias("rrf_score"),
        )
    )
    return fused.orderBy(F.desc("rrf_score"), "doc_id").limit(top_k)


def bigram_logprob(
    df: DataFrame,
    id_col: str,
    text_col: str,
    lam: float = 0.9,
) -> DataFrame:
    """Per-document average log-probability under an interpolated
    bigram model trained on the corpus itself - the KenLM/CCNet-style
    fluency signal one notch above :func:`unigram_logprob` (a unigram
    model cannot see scrambled word ORDER; a bigram model scores it
    harshly).

    p(w2 | w1) = lam * c(w1,w2)/c(w1,*)  +  (1-lam) * p_add1(w2)

    where c(*) are corpus bigram counts (MLE term - always defined for
    scored bigrams, since the model is trained on the very corpus being
    scored, so c(w1,w2) >= 1) and p_add1 is the add-one-smoothed
    unigram fallback, exactly the model unigram_logprob uses. Returns
    (doc_id, n_bigrams, avg_logprob); documents with < 2 tokens have no
    bigram positions and are absent (same absent-row convention as
    unigram_logprob for zero-token docs).

    Cross-engine exactness (the tfidf_cosine_topk recipe): every count
    and total is integer-exact; the interpolated probability is a fixed
    IEEE expression tree over bit-identical doubles; ln() - the one
    libm wobble - is floor-quantized AT THE SOURCE (6 decimals) so all
    downstream products and the term-sorted per-document fold run on
    bit-identical values.

    Scale shape: the corpus-sized shuffles are the (doc, w1, w2) tf
    aggregate (map-side combinable) and the model joins on the bigram /
    left-unigram keys; the corpus constants are one broadcast row. No
    Python anywhere. Bigram vocabulary is larger than the unigram one
    but the joins stay key-partitioned equi-joins - the 100 TB plan is
    the same shape as a word-count.
    """
    from ghcrawler_datalake_etl_spark.operators.dedup import _materialize

    base = df.select(
        F.col(id_col).alias("doc_id"),
        tokenize(F.col(text_col)).alias("toks"),
    )
    # bigram positions: pair i = (toks[i], toks[i+1]); slice is 1-based,
    # transform's index 0-based, so sliced[i] = toks[i+1] and the left
    # token is element_at(toks, i+1) (1-based) = toks[i]
    pairs = F.transform(
        F.slice(F.col("toks"), 2, F.greatest(F.size("toks") - 1, F.lit(0))),
        lambda x, i: F.struct(
            F.element_at(F.col("toks"), i + 1).alias("w1"), x.alias("w2")
        ),
    )
    # tf feeds the scoring join AND the corpus bigram model: one
    # explode+aggregate, materialized once (same contract as
    # unigram_logprob's tf)
    tf = _materialize(
        base.select("doc_id", F.explode(pairs).alias("p"))
        .select("doc_id", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
        .groupBy("doc_id", "w1", "w2")
        .agg(F.count("*").alias("tf"))
    )
    big = tf.groupBy("w1", "w2").agg(F.sum("tf").alias("cvw"))
    left = big.groupBy("w1").agg(F.sum("cvw").alias("cv"))
    # unigram fallback model from the SHARED (doc, term) tf frame -
    # same cache slot as unigram_logprob / tfidf_cosine_topk, and one
    # less corpus scan for this query (sum of per-doc tf == raw count)
    vocab = (
        _doc_term_tf(df, id_col, text_col)
        .groupBy("term")
        .agg(F.sum("tf").alias("n"))
    )
    consts = vocab.agg(F.sum("n").alias("total"), F.count("*").alias("vocab"))
    contrib = (
        tf.join(big, ["w1", "w2"])
        .join(left, "w1")
        .join(vocab.withColumnRenamed("term", "w2"), "w2")
        .crossJoin(F.broadcast(consts))
        .select(
            "doc_id",
            "w1",
            "w2",
            "tf",
            (
                F.col("tf")
                * quantize(
                    F.log(
                        F.lit(lam)
                        * (F.col("cvw").cast("double") / F.col("cv").cast("double"))
                        + (F.lit(1.0) - F.lit(lam))
                        * (
                            (F.col("n") + F.lit(1.0))
                            / (F.col("total") + F.col("vocab"))
                        )
                    ),
                    6,
                )
            ).alias("contrib"),
        )
    )
    return (
        contrib.groupBy("doc_id")
        .agg(
            F.sum("tf").alias("n_bigrams"),
            F.array_sort(
                F.collect_list(F.struct("w1", "w2", "contrib"))
            ).alias("_parts"),
        )
        .select(
            "doc_id",
            "n_bigrams",
            quantize(
                F.aggregate(
                    F.col("_parts"), F.lit(0.0), lambda acc, p: acc + p["contrib"]
                )
                / F.col("n_bigrams"),
                4,
            ).alias("avg_logprob"),
        )
    )
