"""Sketch-operator parity: the docstrings of a6 (dictionary advisor)
and a7 (percentiles) name `approx_count_distinct` (HyperLogLog++) and
`percentile_approx` (KLL-ish quantile sketch) as their 100 TB scale
paths — these tests pin that the approximate operators actually land
within their published error envelopes against the exact answers on
the live testdata, so the "swap exact for approx at scale" claim is
load-bearing, not lore.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from orc_release_hdp_2_6_5_99_1_tag_spark.tables import load_table


def test_hll_distinct_within_error_bound(spark, sf_dir):
    """approx_count_distinct's documented default relative error is
    0.05 (rsd); check every column class — dense int key, low-card
    string, double — lands within 3x rsd of exact (HLL++ bias
    correction makes the typical error far smaller; 3x gives a
    non-flaky determinstic bound)."""
    l = load_table(spark, sf_dir, "lineitem")
    cols = ["l_orderkey", "l_partkey", "l_returnflag", "l_extendedprice"]
    exact = l.agg(
        *[F.count_distinct(c).alias(f"e_{c}") for c in cols]
    ).collect()[0]
    approx = l.agg(
        *[F.approx_count_distinct(c).alias(f"a_{c}") for c in cols]
    ).collect()[0]
    for c in cols:
        e, a = exact[f"e_{c}"], approx[f"a_{c}"]
        assert abs(a - e) <= max(3, 3 * 0.05 * e), (
            f"HLL estimate for {c} outside bound: approx={a} exact={e}"
        )


def test_hll_custom_rsd_tightens_estimate(spark, sf_dir):
    """rsd is a real knob: at rsd=0.01 the estimate must be within 5%
    of exact on the dense key column."""
    l = load_table(spark, sf_dir, "lineitem")
    e = l.agg(F.count_distinct("l_orderkey")).collect()[0][0]
    a = l.agg(F.approx_count_distinct("l_orderkey", rsd=0.01)).collect()[0][0]
    assert abs(a - e) <= 0.05 * e


def test_percentile_approx_within_rank_error(spark, sf_dir):
    """percentile_approx(accuracy=10000) guarantees rank error
    ≤ n/accuracy; verify the returned value's true rank is within
    that bound of the target rank for p50/p90/p99."""
    l = load_table(spark, sf_dir, "lineitem").select("l_extendedprice")
    n = l.count()
    ps = [0.5, 0.9, 0.99]
    acc = 10_000
    approx = l.agg(
        F.percentile_approx("l_extendedprice", ps, acc).alias("q")
    ).collect()[0]["q"]
    for p, v in zip(ps, approx):
        rank = l.filter(F.col("l_extendedprice") <= v).count()
        assert abs(rank - p * n) <= n / acc + 1, (
            f"p{int(p * 100)}: value {v} has rank {rank}, target {p * n:.0f}, "
            f"allowed slack {n / acc + 1:.0f}"
        )


def test_percentile_approx_matches_exact_on_small_groups(spark, sf_dir):
    """On group sizes far below the sketch capacity the approx result
    collapses to the exact percentile — per-returnflag medians must
    equal percentile(0.5) exactly."""
    l = load_table(spark, sf_dir, "lineitem")
    rows = (
        l.groupBy("l_returnflag")
        .agg(
            F.expr("percentile(l_quantity, 0.5)").alias("exact_med"),
            F.percentile_approx("l_quantity", F.lit(0.5), F.lit(100000)).alias("approx_med"),
        )
        .collect()
    )
    assert rows
    for r in rows:
        assert abs(r["exact_med"] - r["approx_med"]) < 1e-9, r


# ---------------------------------------------------------------------------
# sk2: fixed-bin histogram quantile sketch
# ---------------------------------------------------------------------------


def test_sk2_partial_merge_is_bit_exact(spark, sf_dir):
    """The sketch's mergeability claim: histograms built on two
    disjoint halves of the data and merged by plain addition must
    equal the histogram built in one pass — bit-exact, not
    approximately (the merge IS addition of bin counts; nothing else
    may depend on which partition saw which row)."""
    from orc_release_hdp_2_6_5_99_1_tag_spark.operators.stats import _H_BINS

    e = load_table(spark, sf_dir, "events").select("event_type", "value", "event_id")
    mn, mx = e.agg(F.min("value"), F.max("value")).collect()[0]
    width = (mx - mn) / _H_BINS
    bin_ = F.least(
        F.lit(_H_BINS - 1), F.floor((F.col("value") - F.lit(mn)) / F.lit(width))
    ).cast("int")

    def hist(df):
        rows = df.select("event_type", bin_.alias("b")).groupBy(
            "event_type", "b"
        ).count().collect()
        return {(r["event_type"], r["b"]): r["count"] for r in rows}

    whole = hist(e)
    h1 = hist(e.filter(F.col("event_id") % 2 == 0))
    h2 = hist(e.filter(F.col("event_id") % 2 == 1))
    merged: dict = {}
    for h in (h1, h2):
        for k, v in h.items():
            merged[k] = merged.get(k, 0) + v
    assert merged == whole


def test_sk2_selected_bin_contains_exact_order_statistic(spark, sf_dir):
    """The sketch contract, exactly: quantile q reports the lower edge
    of the first bin whose cumulative count reaches q·n, i.e. the bin
    CONTAINING the order statistic at rank ceil(q·n) — so that order
    statistic must lie inside [edge, edge + width]. (A looser
    'within one width of the interpolated percentile' bound is NOT
    implied: interpolation at p99 straddles ranks that can sit in a
    lower bin across empty bins.)"""
    import math

    from orc_release_hdp_2_6_5_99_1_tag_spark.operators.stats import (
        _H_BINS,
        _H_QS,
        sk2_histogram_quantiles,
    )

    e = load_table(spark, sf_dir, "events")
    mn, mx = e.agg(F.min("value"), F.max("value")).collect()[0]
    width = (mx - mn) / _H_BINS
    vals: dict[str, list[float]] = {}
    for r in e.select("event_type", "value").collect():
        vals.setdefault(r["event_type"], []).append(r["value"])
    for v in vals.values():
        v.sort()
    for r in sk2_histogram_quantiles(spark, sf_dir).collect():
        v = vals[r["event_type"]]
        for q, col in zip(_H_QS, ("p50", "p90", "p99")):
            rank = max(1, math.ceil(q * len(v)))
            stat = v[rank - 1]
            edge = r[col]
            assert edge - 1e-6 <= stat <= edge + width + 1e-6, (
                f"{r['event_type']} {col}: order stat {stat} (rank {rank}) "
                f"not inside selected bin [{edge}, {edge + width}]"
            )


# ---------------------------------------------------------------------------
# sk3: Count-Min sketch
# ---------------------------------------------------------------------------


def test_sk3_one_sided_error_guarantee(spark, sf_dir):
    """Count-Min NEVER under-counts: estimate >= exact for every
    probe token (hash collisions only ever ADD) — the sketch's
    defining guarantee, visible in the result's overcount column."""
    from orc_release_hdp_2_6_5_99_1_tag_spark.operators.stats import (
        sk3_countmin_heavy_hitters,
    )

    rows = sk3_countmin_heavy_hitters(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["estimate"] >= r["exact"], (
            f"{r['token']}: estimate {r['estimate']} < exact {r['exact']}"
        )
        assert r["overcount"] == r["estimate"] - r["exact"]
    # the sketch must be informative, not saturated: hot probes
    # ('the','a' at this corpus) should dominate rare ones
    by = {r["token"]: r for r in rows}
    assert by["the"]["exact"] > 0 and by["the"]["estimate"] > 0


def test_sk3_counters_merge_by_addition(spark, sf_dir):
    """Mergeability (the map-side-partials argument): counters built
    on two disjoint halves of the corpus and added must equal the
    one-pass counters — bit-exact, the same merge-by-addition
    contract as sk2's histogram."""
    from orc_release_hdp_2_6_5_99_1_tag_spark.operators.stats import (
        _CM_DEPTH,
        _cm_bucket,
    )
    from orc_release_hdp_2_6_5_99_1_tag_spark.tables import load_table

    d = load_table(spark, sf_dir, "documents")

    def counters(df):
        toks = df.select(
            F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("w")
        ).filter(F.col("w") != "")
        rows = (
            toks.select(*[_cm_bucket(F.col("w"), i) for i in range(_CM_DEPTH)])
            .selectExpr(
                "stack({n}, {args}) AS (d, b)".format(
                    n=_CM_DEPTH,
                    args=", ".join(f"{i}, b{i}" for i in range(_CM_DEPTH)),
                )
            )
            .groupBy("d", "b")
            .count()
            .collect()
        )
        return {(r["d"], r["b"]): r["count"] for r in rows}

    whole = counters(d)
    h1 = counters(d.filter(F.col("doc_id") % 2 == 0))
    h2 = counters(d.filter(F.col("doc_id") % 2 == 1))
    merged: dict = {}
    for h in (h1, h2):
        for k, v in h.items():
            merged[k] = merged.get(k, 0) + v
    assert merged == whole


def test_sk4_registers_merge_by_max(spark, sf_dir):
    """The sk4 HLL register tables must be mergeable by MAX: registers
    built on two disjoint halves of the corpus, MAX-merged, must equal
    the whole-corpus registers bit-for-bit — the partial/final
    contract that lets stripe-level sketches roll up to file level
    (and 1000 executors' sketches roll up to one) without re-scanning."""
    from orc_release_hdp_2_6_5_99_1_tag_spark.operators.dedup import ngram_shingle_col
    from orc_release_hdp_2_6_5_99_1_tag_spark.operators.stats import (
        _HLL_M,
        _HLL_RHO_MAX,
    )

    d = load_table(spark, sf_dir, "documents")

    def registers(frame):
        toks = frame.select(
            F.split(F.trim(F.lower(F.col("text"))), r"\s+").alias("t")
        )
        sh = toks.select(F.explode(ngram_shingle_col(3)).alias("s"))
        per = sh.select(
            F.conv(F.substring(F.md5("s"), 1, 14), 16, 10)
            .cast("bigint")
            .alias("h")
        ).selectExpr(
            f"h % {_HLL_M} AS b",
            f"CASE WHEN h DIV {_HLL_M} = 0 THEN {_HLL_RHO_MAX} "
            f"ELSE {_HLL_RHO_MAX} - length(bin(h DIV {_HLL_M})) END AS rho",
        )
        rows = per.groupBy("b").agg(F.max("rho").alias("r")).collect()
        return {r["b"]: r["r"] for r in rows}

    whole = registers(d)
    h1 = registers(d.filter(F.col("doc_id") % 2 == 0))
    h2 = registers(d.filter(F.col("doc_id") % 2 == 1))
    merged: dict = {}
    for h in (h1, h2):
        for b, r in h.items():
            merged[b] = max(merged.get(b, 0), r)
    assert merged == whole


def test_sk4_linear_counting_table_matches_libm(spark):
    """The build-time linear-counting lookup must equal m*ln(m/V) —
    pinned against Python's libm so a table regeneration bug can't
    silently skew the small-cardinality branch."""
    import math

    from orc_release_hdp_2_6_5_99_1_tag_spark.operators.stats import _HLL_LC, _HLL_M

    assert set(_HLL_LC) == set(range(1, _HLL_M))
    for v, e in _HLL_LC.items():
        assert e == int(round(_HLL_M * math.log(_HLL_M / v)))
    # monotone decreasing: more empty registers -> smaller estimate
    vals = [_HLL_LC[v] for v in range(1, _HLL_M)]
    assert vals == sorted(vals, reverse=True)


def test_sk4_estimate_within_error_bound(spark, sf_dir):
    """HLL with m=256 has ~1.04/sqrt(m) = 6.5% relative std error; the
    graded estimates must land within 4 sigma of exact on every source
    and on the register-merged union row."""
    from orc_release_hdp_2_6_5_99_1_tag_spark.operators.stats import sk4_hll_distinct

    rows = sk4_hll_distinct(spark, sf_dir).collect()
    assert any(r["source"] == "<union>" for r in rows)
    for r in rows:
        rel = abs(r["hll_estimate"] - r["exact_distinct"]) / r["exact_distinct"]
        assert rel < 4 * 0.065, (r["source"], rel)


def test_sk5_sketches_merge_by_union_relimit(spark, sf_dir):
    """Theta/KMV sketches must merge by union + re-limit: bottom-k
    sets built on two disjoint halves of a source's hash universe,
    unioned and re-limited to k, must equal the whole-source bottom-k
    exactly — the partial/final contract that lets 1000 executors'
    sketches roll up without re-scanning, and the property the
    pairwise intersection/union estimators rely on."""
    from orc_release_hdp_2_6_5_99_1_tag_spark.operators.stats import _TH_K

    d = load_table(spark, sf_dir, "documents")

    def bottom_k(frame):
        toks = frame.select(
            F.explode(
                F.split(F.trim(F.lower(F.col("text"))), r"\s+")
            ).alias("w")
        ).filter(F.col("w") != "")
        hashed = toks.select(
            F.conv(F.substring(F.md5("w"), 1, 8), 16, 10)
            .cast("bigint")
            .alias("h")
        ).distinct()
        return sorted(
            r["h"] for r in hashed.orderBy("h").limit(_TH_K).collect()
        )

    whole = bottom_k(d)
    h1 = bottom_k(d.filter(F.col("doc_id") % 2 == 0))
    h2 = bottom_k(d.filter(F.col("doc_id") % 2 == 1))
    merged = sorted(set(h1) | set(h2))[:_TH_K]
    assert merged == whole


def test_sk5_estimates_within_theta_error_bound(spark, sf_dir):
    """The intersection/union ESTIMATES must land within the theta
    sketch's relative standard error (~1/sqrt(k-1), take 4 sigma) of
    the exact values — the accuracy contract the ride-along column
    exists to grade."""
    from orc_release_hdp_2_6_5_99_1_tag_spark.operators.stats import (
        _TH_K,
        sk5_theta_intersection,
    )

    rows = sk5_theta_intersection(spark, sf_dir).collect()
    assert rows, "no source pairs produced"
    rse = 4.0 / (_TH_K - 1) ** 0.5
    for r in rows:
        if r["exact_inter"] == 0:
            continue
        err = abs(r["est_inter"] - r["exact_inter"]) / r["exact_inter"]
        assert err <= rse, (
            f"{r['sa']}x{r['sb']}: est {r['est_inter']} vs exact "
            f"{r['exact_inter']} ({err:.3f} > {rse:.3f})"
        )


def test_sk6_partials_merge_by_vector_addition(spark, sf_dir):
    """AMS mergeability — the property that makes the sketch a
    distributed aggregate: the S_r vector of the whole stream equals
    the elementwise SUM of the two halves' vectors (map-side partials
    on any split combine losslessly)."""
    import pyspark.sql.functions as F

    from orc_release_hdp_2_6_5_99_1_tag_spark.operators.stats import _AMS_R, _ams_sign
    from orc_release_hdp_2_6_5_99_1_tag_spark.tables import load_table

    e = load_table(spark, sf_dir, "events").select(
        F.col("user_id").cast("string").alias("k"), F.col("event_id")
    )

    def vec(df):
        row = df.agg(
            *[F.sum(_ams_sign(F.col("k"), r)).alias(f"s{r}") for r in range(_AMS_R)]
        ).collect()[0]
        return [row[f"s{r}"] or 0 for r in range(_AMS_R)]

    whole = vec(e)
    lo = vec(e.filter(F.col("event_id") % 2 == 0))
    hi = vec(e.filter(F.col("event_id") % 2 == 1))
    assert whole == [a + b for a, b in zip(lo, hi)]


def test_sk6_estimate_within_variance_bound(spark, sf_dir):
    """F2's variance bound: with R averaged estimators the relative
    standard error is <= sqrt(2/R) ≈ 0.25 at R=32; assert the estimate
    sits within 4 RSE of exact (generous, deterministic — the hash is
    fixed, so this pins the chosen seed family forever)."""
    from orc_release_hdp_2_6_5_99_1_tag_spark.operators.stats import sk6_ams_f2

    row = sk6_ams_f2(spark, sf_dir).collect()[0]
    assert row["exact_f2"] > 0
    rel = abs(row["estimate_f2"] - row["exact_f2"]) / row["exact_f2"]
    assert rel <= 1.0, f"AMS estimate off by {rel:.2f}x (4x the 0.25 RSE bound)"
    assert row["rel_err_ppm"] == int(
        abs(row["estimate_f2"] - row["exact_f2"]) * 1_000_000 // row["exact_f2"]
    )
