"""Sketch operators (operators/sketches.py): HLL / Count-Min / KMV.

Three layers of evidence, mirroring the repo's differential strategy:
- bit-exactness of the SKETCH STATE against a pure-Python reference
  (register_sum / counters / kth_hash are integers - any hash or
  arithmetic divergence fails exactly, not approximately);
- the estimators' mathematical guarantees (CMS never undercounts; HLL
  and KMV land within their published error bounds at these register
  sizes);
- plan shape: no Python UDFs anywhere, the CMS estimate join
  broadcasts the sketch.
The full driver-oracle differential (DuckDB replaying the same
sketches) runs in test_oracle_differential.py via the registry.
"""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from ghcrawler_datalake_etl_spark.operators import sketches as SK


def _py_hll_registers(values):
    """Pure-Python reference: bucket -> max rho, same md5 split."""
    regs: dict[int, int] = {}
    for v in values:
        h = hashlib.md5(str(v).encode()).hexdigest()
        bucket = int(h[:2], 16)
        tail = int(h[2 : 2 + SK.HLL_TAIL_HEX], 16)
        bits = 4 * SK.HLL_TAIL_HEX
        rho = bits + 1 if tail == 0 else bits - tail.bit_length() + 1
        regs[bucket] = max(regs.get(bucket, 0), rho)
    return regs


def test_hll_state_matches_python_reference(spark, sf_dir):
    """register_sum and n_registers are EXACT integers: the Spark
    string-ops rho and the Python bit-length rho must agree on every
    value, or the sums differ."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    got = {
        r["event_type"]: r
        for r in SK.hll_distinct(ev, "event_id", ["event_type"]).collect()
    }
    rows = ev.select("event_type", "event_id").collect()
    by_type: dict[str, list] = {}
    for r in rows:
        if r["event_id"] is not None:
            by_type.setdefault(r["event_type"], []).append(r["event_id"])
    rho_max = 4 * SK.HLL_TAIL_HEX + 1
    for et, vals in by_type.items():
        regs = _py_hll_registers(vals)
        s_present = sum(1 << (rho_max - m) for m in regs.values())
        s_total = s_present + (SK.HLL_M - len(regs)) * (1 << rho_max)
        assert got[et]["n_registers"] == len(regs), et
        assert got[et]["register_sum"] == s_total, et


def test_hll_estimate_within_error_bound(spark, sf_dir):
    """Both estimator branches stay within ~4 sigma of 1.04/sqrt(256)
    (= 26%) of the exact count - loose enough to be robust, tight
    enough to catch a broken register or correction branch."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    est = SK.hll_distinct(ev, "event_id", ["event_type"]).collect()
    exact = {
        r["event_type"]: r["d"]
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("event_id").alias("d"))
        .collect()
    }
    for r in est:
        e, t = r["hll_estimate"], exact[r["event_type"]]
        assert abs(e - t) / t < 0.26, (r["event_type"], e, t)


def test_hll_merge_of_arbitrary_partials_equals_direct_sketch(spark, sf_dir):
    """Mergeability: partial sketches over ANY disjoint split of the
    data, merged, produce bit-identical registers to sketching the
    union directly - max is associative/commutative/idempotent. Split
    by a hash unrelated to the sketch's own, with overlapping values
    across parts (idempotence), then compare register frames row by
    row."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    # three overlapping parts: % 3 slices plus a duplicated slice
    parts = [ev.filter(F.col("event_id") % 3 == i) for i in range(3)]
    parts.append(ev.filter(F.col("event_id") % 7 == 0))  # overlap
    partials = None
    for p in parts:
        r = SK.hll_registers(p, "event_id", [])
        partials = r if partials is None else partials.unionByName(r)
    merged = {
        (r["bucket"], r["m_rho"])
        for r in SK.hll_merge(partials, []).collect()
    }
    direct = {
        (r["bucket"], r["m_rho"])
        for r in SK.hll_registers(ev, "event_id", []).collect()
    }
    assert merged == direct


def test_stream_hll_registers_static_twin_equals_batch_sketch(spark, sf_dir):
    """stream_hll_registers on a static frame produces exactly the
    per-window register rows of the batch sketch grouped by day - the
    same-hash contract that makes the streaming state bit-comparable
    to a batch replay (the registry query runs the REAL stream)."""
    from ghcrawler_datalake_etl_spark.streaming.ingest import (
        stream_hll_registers,
    )

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    got = {
        (str(r["window_start"]), r["bucket"], r["m_rho"])
        for r in stream_hll_registers(ev, "user_id").collect()
    }
    day = F.date_trunc("day", F.col("ts").cast("timestamp"))
    expect = {
        (str(r["day"]), r["bucket"], r["m_rho"])
        for r in SK.hll_registers(
            ev.filter(F.col("ts").isNotNull()).withColumn("day", day),
            "user_id",
            ["day"],
        ).collect()
    }
    assert got == expect


def test_cms_never_undercounts_and_is_tight_on_heavy_hitters(spark, sf_dir):
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    from ghcrawler_datalake_etl_spark.operators import text as TX

    tok = d.select(F.explode(TX.tokenize(F.col("text"))).alias("term"))
    sk = SK.cms_sketch(tok, "term")
    cand = tok.groupBy("term").agg(F.count("*").cast("long").alias("n"))
    est = SK.cms_estimate(cand, sk, "term").collect()
    n_total = sum(r["n"] for r in est)
    for r in est:
        # the CMS guarantee: min-of-d counters >= the true count ...
        assert r["cms_estimate"] >= r["n"], r
        # ... and within eps*N with eps = e/w (Markov bound holds per
        # row with prob 1/2^d; assert the bound itself, which holds
        # deterministically in expectation-scale for every candidate)
        assert r["cms_estimate"] - r["n"] <= 3 * 2.71828 * n_total / SK.CMS_WIDTH, r


def test_cms_merge_of_disjoint_slices_equals_direct_sketch(spark, sf_dir):
    """Counters add: CMS frames over disjoint slices, merged, equal
    the direct sketch of the whole stream - same rollup contract as
    hll_merge/histogram_merge."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    parts = [ev.filter(F.col("event_id") % 3 == i) for i in range(3)]
    unioned = None
    for p in parts:
        sk = SK.cms_sketch(p, "event_type")
        unioned = sk if unioned is None else unioned.unionByName(sk)
    merged = {
        (r["seed"], r["bucket"], r["c"])
        for r in SK.cms_merge(unioned).collect()
    }
    direct = {
        (r["seed"], r["bucket"], r["c"])
        for r in SK.cms_sketch(ev, "event_type").collect()
    }
    assert merged == direct


def test_cms_sketch_counter_mass_is_exact(spark, sf_dir):
    """Every seed row of the sketch sums to the total token count -
    the counters partition the stream per seed."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    from ghcrawler_datalake_etl_spark.operators import text as TX

    tok = d.select(F.explode(TX.tokenize(F.col("text"))).alias("term"))
    n = tok.count()
    sums = (
        SK.cms_sketch(tok, "term")
        .groupBy("seed")
        .agg(F.sum("c").alias("s"))
        .collect()
    )
    assert len(sums) == SK.CMS_DEPTH
    assert all(r["s"] == n for r in sums)


def test_kmv_exact_path_below_k(spark):
    """Fewer distinct values than k: the sketch saw everything, the
    estimate IS the exact count and kth_hash is the -1 sentinel."""
    df = spark.createDataFrame(
        [(g, v) for g in ("a", "b") for v in range(10)], ["g", "v"]
    )
    rows = {r["g"]: r for r in SK.kmv_distinct(df, "v", ["g"], k=64).collect()}
    for g in ("a", "b"):
        assert rows[g]["n_seen"] == 10
        assert rows[g]["kth_hash"] == -1
        assert rows[g]["kmv_estimate"] == 10.0


def test_kmv_estimate_within_error_bound(spark, sf_dir):
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    est = SK.kmv_distinct(o, "o_custkey", ["o_orderpriority"], k=64).collect()
    exact = {
        r["o_orderpriority"]: r["d"]
        for r in o.groupBy("o_orderpriority")
        .agg(F.countDistinct("o_custkey").alias("d"))
        .collect()
    }
    for r in est:
        t = exact[r["o_orderpriority"]]
        if r["kth_hash"] == -1:
            assert r["kmv_estimate"] == float(r["n_seen"]) == float(t)
        else:
            # ~4/sqrt(64) = 50% bound: loose, catches broken hashing
            assert abs(r["kmv_estimate"] - t) / t < 0.5, (r, t)
    # the kth hash is the exact sketch state: cross-check one group
    # against a pure-Python bottom-k
    some = est[0]["o_orderpriority"]
    vals = [
        r["o_custkey"]
        for r in o.filter(F.col("o_orderpriority") == some)
        .select("o_custkey")
        .distinct()
        .collect()
    ]
    hs = sorted(
        int(hashlib.md5(str(v).encode()).hexdigest()[: SK.KMV_HASH_HEX], 16)
        for v in set(vals)
    )
    expect = -1 if len(hs) < 64 else hs[63]
    got = {r["o_orderpriority"]: r["kth_hash"] for r in est}[some]
    assert got == expect


def test_histogram_quantiles_within_one_bin_of_exact(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    hist = SK.histogram_sketch(ev, "value", ["event_type"], 0.0, 1024.0, 1024)
    est = {
        r["event_type"]: r
        for r in SK.histogram_quantiles(
            hist, ["event_type"], [0.5, 0.9], 0.0, 1024.0, 1024
        ).collect()
    }
    ev.createOrReplaceTempView("_ev_hist_t")
    exact = spark.sql(
        """SELECT event_type,
           percentile_disc(0.5) WITHIN GROUP (ORDER BY value) AS p50,
           percentile_disc(0.9) WITHIN GROUP (ORDER BY value) AS p90
           FROM _ev_hist_t GROUP BY event_type"""
    ).collect()
    for r in exact:
        e = est[r["event_type"]]
        # lower-edge estimate: within one bin width BELOW the exact value
        assert e["p50_est"] <= r["p50"] <= e["p50_est"] + 1.0, r
        assert e["p90_est"] <= r["p90"] <= e["p90_est"] + 1.0, r


def test_histogram_merge_is_lossless_and_edges_clamp(spark):
    df = spark.createDataFrame(
        [("a", -5.0), ("a", 0.0), ("a", 3.7), ("a", 9999.0), ("b", 1.2)],
        "g string, v double",
    )
    hist = SK.histogram_sketch(df, "v", ["g"], 0.0, 10.0, 10)
    rows = {(r["g"], r["bin"]): r["c"] for r in hist.collect()}
    # -5 clamps to bin 0 (with 0.0), 3.7 -> bin 3, 9999 clamps to bin 9
    assert rows[("a", 0)] == 2 and rows[("a", 3)] == 1 and rows[("a", 9)] == 1
    # merging the per-group histograms to global == direct global
    merged = {
        (r["bin"], r["c"])
        for r in SK.histogram_merge(hist, []).collect()
    }
    direct = {
        (r["bin"], r["c"])
        for r in SK.histogram_sketch(df, "v", [], 0.0, 10.0, 10).collect()
    }
    assert merged == direct


def test_bloom_no_false_negatives_and_bounded_bits(spark):
    """Every inserted value probes positive (the Bloom guarantee) and
    the bits frame never exceeds k*n (or m) rows."""
    vals = spark.range(500).select(F.concat(F.lit("v"), "id").alias("v"))
    bits = SK.bloom_bits(vals, "v")
    nbits = bits.count()
    assert nbits <= min(SK.BLOOM_K * 500, SK.BLOOM_M)
    probed = SK.bloom_probe(vals, "v", bits)
    assert probed.filter(~F.col("bloom_maybe")).count() == 0
    # disjoint probes at this fill level (~4.6% of m) are mostly
    # negative: false-positive rate (k*n/m)^k ~ 1e-4
    other = spark.range(500).select(
        F.concat(F.lit("w"), "id").alias("v")
    )
    fp = SK.bloom_probe(other, "v", bits).filter("bloom_maybe").count()
    assert fp <= 5


def test_bloom_probe_matches_python_reference(spark):
    """The k positions replay exactly in pure Python - same tagged
    md5, same modulus - for inserted AND non-inserted values."""
    vals = [f"v{i}" for i in range(50)]
    df = spark.createDataFrame([(v,) for v in vals], ["v"])
    bits = {
        int(hashlib.md5(f"{s}\x1f{v}".encode()).hexdigest()[:15], 16)
        % SK.BLOOM_M
        for v in vals
        for s in range(SK.BLOOM_K)
    }
    got = {r["pos"] for r in SK.bloom_bits(df, "v").collect()}
    assert got == bits
    probe_vals = vals[:5] + [f"w{i}" for i in range(5)]
    pdf = spark.createDataFrame([(v,) for v in probe_vals], ["v"])
    got_probe = {
        r["v"]: r["bloom_maybe"]
        for r in SK.bloom_probe(pdf, "v", SK.bloom_bits(df, "v")).collect()
    }
    for v in probe_vals:
        expect = all(
            int(hashlib.md5(f"{s}\x1f{v}".encode()).hexdigest()[:15], 16)
            % SK.BLOOM_M
            in bits
            for s in range(SK.BLOOM_K)
        )
        assert got_probe[v] == expect, v


def test_bloom_probe_plan_broadcasts_and_stays_jvm(spark):
    vals = spark.range(100).select(F.col("id").cast("string").alias("v"))
    plan = SK.bloom_probe(vals, "v", SK.bloom_bits(vals, "v"))
    phys = plan._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in phys and "ArrowEvalPython" not in phys
    assert "BroadcastHashJoin" in phys


def test_kmv_overlap_exact_below_k_and_estimator_sane(spark, sf_dir):
    # exact path: two small overlapping sets, union < k
    a = spark.createDataFrame([(v,) for v in range(20)], ["v"])
    b = spark.createDataFrame([(v,) for v in range(10, 30)], ["v"])
    r = SK.kmv_overlap(a, b, "v", k=64).collect()[0]
    assert r["kth_hash"] == -1
    assert r["n_union_seen"] == 30 and r["n_shared"] == 10
    assert r["jaccard_est"] == 10 / 30 and r["intersection_est"] == 10.0
    # estimator path on real data: within a loose 4/sqrt(64) bound
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    a = o.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    b = o.filter(F.col("o_orderpriority") == "5-LOW").select("o_custkey")
    r = SK.kmv_overlap(a, b, "o_custkey", k=64).collect()[0]
    exact_union = (
        a.unionByName(b).select("o_custkey").distinct().count()
    )
    if r["kth_hash"] != -1:
        assert abs(r["union_est"] - exact_union) / exact_union < 0.5
    # plan: distributed TakeOrdered, never a single-partition sort
    phys = (
        SK.kmv_overlap(a, b, "o_custkey", k=8)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "TakeOrderedAndProject" in phys
    assert "Window" not in phys


def test_bloom_prefiltered_join_is_transparent_and_filters_early(
    spark, sf_dir
):
    """The runtime-filter join returns EXACTLY the plain join (no
    false negatives; false positives die in the exact join), and the
    physical plan applies the bloom probe's filter to the fact side
    BEFORE the final join."""
    from ghcrawler_datalake_etl_spark.operators import joins as JN

    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_custkey", "o_totalprice"
    )
    dim = (
        spark.read.parquet(f"{sf_dir}/customer.parquet")
        .filter(F.col("c_acctbal") > 5000)
        .select(F.col("c_custkey").alias("o_custkey"), "c_mktsegment")
    )
    wrapped = JN.bloom_prefiltered_join(o, dim, "o_custkey")
    plain = o.join(dim, "o_custkey")
    assert sorted(map(tuple, wrapped.collect())) == sorted(
        map(tuple, plain.collect())
    )
    phys = wrapped._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in phys and "ArrowEvalPython" not in phys
    # the probe joins (bloom bit lookups) broadcast
    assert "BroadcastHashJoin" in phys


def test_bloom_prefilter_sits_below_the_shuffle_join(spark, sf_dir):
    """With broadcast disabled (the large-dim case the operator
    exists for), the fact side's bloom filter must run BEFORE the
    exchange that feeds the shuffle join - the whole point is that
    non-matching fact rows never enter that exchange."""
    from ghcrawler_datalake_etl_spark.operators import joins as JN

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
            "o_custkey", "o_totalprice"
        )
        dim = (
            spark.read.parquet(f"{sf_dir}/customer.parquet")
            .filter(F.col("c_acctbal") > 5000)
            .select(F.col("c_custkey").alias("o_custkey"), "c_mktsegment")
        )
        plan = JN.bloom_prefiltered_join(o, dim, "o_custkey")
        phys = plan._jdf.queryExecution().executedPlan().toString()
        # the final join shuffles (no broadcast available for it) ...
        assert "SortMergeJoin" in phys or "ShuffledHashJoin" in phys
        lines = phys.splitlines()
        big_join = min(
            i for i, ln in enumerate(lines)
            if "SortMergeJoin" in ln or "ShuffledHashJoin" in ln
        )
        # ... while Catalyst rewrites the probe's left-join+filter
        # chain into k INNER bit-lookup BroadcastHashJoins that sit
        # INSIDE the fact branch - i.e. below the shuffle join, so
        # non-matching fact rows never reach its exchange. With the
        # main-join broadcast disabled, every BroadcastHashJoin in the
        # plan IS a bit lookup.
        lookups = [
            i for i, ln in enumerate(lines) if "BroadcastHashJoin" in ln
        ]
        from ghcrawler_datalake_etl_spark.operators import sketches as SK

        assert len(lookups) == SK.BLOOM_K, phys[:1500]
        assert all(i > big_join for i in lookups), phys[:1500]
        # the materialized bits frame feeds the lookups from cache,
        # not k separate dim scans
        assert "InMemoryTableScan" in phys
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


@pytest.mark.parametrize(
    "op",
    ["hll", "cms", "kmv"],
)
def test_sketch_plans_are_jvm_only_and_cms_broadcasts(spark, sf_dir, op):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    if op == "hll":
        plan = SK.hll_distinct(ev, "event_id", ["event_type"])
    elif op == "cms":
        sk = SK.cms_sketch(ev, "event_type")
        cand = ev.groupBy("event_type").agg(F.count("*").alias("n"))
        plan = SK.cms_estimate(cand, sk, "event_type")
    else:
        plan = SK.kmv_distinct(ev, "user_id", ["event_type"], k=16)
    phys = plan._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in phys and "ArrowEvalPython" not in phys
    if op == "cms":
        assert "BroadcastHashJoin" in phys


def test_stats_state_merge_equals_direct(spark, tmp_path):
    """Mergeable aggregate state (round-9): fold per-'day' states and
    the result must be BIT-identical to the state built from the
    unioned raw rows - counts/sums add, min/max fold, registers take
    per-bucket max - including a key whose distinct column is all NULL
    (empty register map, estimate 0). Persistence goes through parquet
    like the standing stats table would."""
    rows = [
        # (key, value, user) - key 'c' has only NULL users
        ("a", 1.0, 10), ("a", 2.5, 11), ("a", 2.5, 10),
        ("b", -3.0, 12), ("b", 7.0, None),
        ("c", 0.5, None), ("c", 1.5, None),
    ]
    df = spark.createDataFrame(rows, "k string, value double, user_id long")
    days = [
        df.filter(F.col("value") < 1.0),
        df.filter((F.col("value") >= 1.0) & (F.col("value") < 2.5)),
        df.filter(F.col("value") >= 2.5),
    ]
    parts = []
    for i, d in enumerate(days):
        p = str(tmp_path / f"d{i}")
        SK.stats_state(d, ["k"], "value", "user_id").write.parquet(p)
        parts.append(spark.read.parquet(p))
    states = parts[0].unionByName(parts[1]).unionByName(parts[2])
    merged = SK.stats_merge(states, ["k"])
    direct = SK.stats_state(df, ["k"], "value", "user_id")

    def snap(frame):
        return {
            r.k: (r.n, r.sum_v, r.min_v, r.max_v, sorted(r.regs.items()))
            for r in frame.collect()
        }

    assert snap(merged) == snap(direct)
    fin = {r.k: r for r in SK.stats_finalize(merged, ["k"]).collect()}
    assert fin["a"].n == 3 and fin["a"].sum_v == 6.0
    assert fin["a"].min_v == 1.0 and fin["a"].max_v == 2.5
    assert fin["b"].n == 2 and fin["b"].min_v == -3.0
    # all-NULL distinct column: empty registers, estimate exactly 0
    assert snap(direct)["c"][4] == []
    assert fin["c"].distinct_est == 0.0
    # low-cardinality linear counting: 2 distinct users for 'a'
    assert abs(fin["a"].distinct_est - 2.0) < 0.1
