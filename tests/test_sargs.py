"""SearchArgument builder parity: the reference's builder shapes
(`TestVectorOrcFile.java:2262-2269`, `TestRecordReaderImpl.java:1968`)
transliterated through `functions/sargs.py` must (a) select exactly the
rows the equivalent direct predicate selects, (b) push down into the
file scan, and (c) keep SQL three-valued logic."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from orc_release_hdp_2_6_5_99_1_tag_spark.functions.sargs import (
    new_builder,
    scan_with_sarg,
)
from orc_release_hdp_2_6_5_99_1_tag_spark.plans import pushed_filters
from orc_release_hdp_2_6_5_99_1_tag_spark.sources.orc_io import orc_copy, read_orc
from orc_release_hdp_2_6_5_99_1_tag_spark.tables import load_table


def test_reference_builder_shape_matches_direct_filter(spark, sf_dir):
    """The exact TestVectorOrcFile shape: AND(NOT(lt(x, a)), lt(x, b))."""
    l = load_table(spark, sf_dir, "lineitem")
    sarg = (
        new_builder()
        .startAnd()
        .startNot()
        .lessThan("l_orderkey", 300)
        .end()
        .lessThan("l_orderkey", 600)
        .end()
        .build()
    )
    got = l.filter(sarg).count()
    want = l.filter(~(F.col("l_orderkey") < 300) & (F.col("l_orderkey") < 600)).count()
    assert got == want > 0


def test_leaves_match_direct_predicates(spark, sf_dir):
    l = load_table(spark, sf_dir, "lineitem")
    cases = [
        (new_builder().equals("l_returnflag", "R").build(), F.col("l_returnflag") == "R"),
        (
            new_builder().null_safe_equals("l_returnflag", "R").build(),
            F.col("l_returnflag").eqNullSafe(F.lit("R")),
        ),
        (
            new_builder().in_("l_linenumber", 1, 3, 5).build(),
            F.col("l_linenumber").isin(1, 3, 5),
        ),
        (
            new_builder().between("l_quantity", 10, 20).build(),
            F.col("l_quantity").between(10, 20),
        ),
    ]
    for sarg, direct in cases:
        assert l.filter(sarg).count() == l.filter(direct).count()


def test_is_null_leaf(spark):
    df = spark.createDataFrame([(1, None), (2, "x")], "id int, s string")
    got = [r["id"] for r in df.filter(new_builder().is_null("s").build()).collect()]
    assert got == [1]


def test_or_and_nesting(spark, sf_dir):
    l = load_table(spark, sf_dir, "lineitem")
    sarg = (
        new_builder()
        .startOr()
        .startAnd()
        .equals("l_returnflag", "R")
        .lessThan("l_quantity", 10)
        .end()
        .equals("l_linestatus", "O")
        .end()
        .build()
    )
    direct = ((F.col("l_returnflag") == "R") & (F.col("l_quantity") < 10)) | (
        F.col("l_linestatus") == "O"
    )
    assert l.filter(sarg).count() == l.filter(direct).count()


def test_sarg_pushes_into_orc_scan(spark, sf_dir):
    path = orc_copy(spark, sf_dir, "lineitem")
    sarg = new_builder().startAnd().lessThan("l_quantity", 10).end().build()
    df = scan_with_sarg(read_orc(spark, path), ["l_orderkey", "l_quantity"], sarg)
    pf = pushed_filters(df)
    assert "l_quantity" in pf, f"sarg not pushed to ORC scan: {pf!r}"


def test_three_valued_not_over_null(spark):
    """NOT over NULL stays UNKNOWN (row filtered) — reference/SQL 3VL."""
    df = spark.createDataFrame([(1, None), (2, 5.0), (3, 20.0)], "id int, v double")
    sarg = new_builder().startNot().lessThan("v", 10).end().build()
    got = sorted(r["id"] for r in df.filter(sarg).collect())
    assert got == [3], f"3VL violated: {got}"


def test_builder_errors():
    with pytest.raises(ValueError):
        new_builder().startAnd().build()  # unclosed group
    with pytest.raises(ValueError):
        new_builder().end()  # end without start
    with pytest.raises(ValueError):
        new_builder().startAnd().end().build()  # empty group
    with pytest.raises(ValueError):
        (
            new_builder()
            .startNot()
            .equals("a", 1)
            .equals("a", 2)
            .end()
        )  # NOT with two children


# --- property-based: random predicate trees ≡ direct Column filters ---

from hypothesis import HealthCheck, given, settings, strategies as st


def _leaf_pair(draw):
    kind = draw(st.sampled_from(["eq", "lt", "lte", "in", "between", "nse"]))
    if kind == "eq":
        v = draw(st.integers(0, 9))
        return lambda b: b.equals("n", v), F.col("n") == v
    if kind == "lt":
        v = draw(st.integers(0, 9))
        return lambda b: b.less_than("n", v), F.col("n") < v
    if kind == "lte":
        v = draw(st.integers(0, 9))
        return lambda b: b.less_than_equals("n", v), F.col("n") <= v
    if kind == "in":
        vs = draw(st.lists(st.integers(0, 9), min_size=1, max_size=3))
        return lambda b: b.in_("n", *vs), F.col("n").isin(*vs)
    if kind == "between":
        lo = draw(st.integers(0, 9))
        hi = draw(st.integers(0, 9))
        return lambda b: b.between("n", lo, hi), F.col("n").between(lo, hi)
    v = draw(st.one_of(st.none(), st.integers(0, 9)))
    return lambda b: b.null_safe_equals("n", v), F.col("n").eqNullSafe(F.lit(v))


@st.composite
def _tree(draw, depth=0):
    if depth >= 2 or draw(st.booleans()):
        return ("leaf", _leaf_pair(draw))
    op = draw(st.sampled_from(["and", "or", "not"]))
    n = 1 if op == "not" else draw(st.integers(2, 3))
    return (op, [draw(_tree(depth=depth + 1)) for _ in range(n)])


def _apply(tree, builder):
    kind, payload = tree
    if kind == "leaf":
        bf, direct = payload
        bf(builder)
        return direct
    start = {"and": builder.start_and, "or": builder.start_or, "not": builder.start_not}[kind]
    start()
    directs = [_apply(c, builder) for c in payload]
    builder.end()
    if kind == "not":
        return ~directs[0]
    out = directs[0]
    for d in directs[1:]:
        out = (out & d) if kind == "and" else (out | d)
    return out


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(tree=_tree())
def test_random_sarg_trees_match_direct(spark, sargs_fuzz_df, tree):
    builder = new_builder()
    direct = _apply(tree, builder)
    sarg = builder.build()
    got = sorted(r["id"] for r in sargs_fuzz_df.filter(sarg).collect())
    want = sorted(r["id"] for r in sargs_fuzz_df.filter(direct).collect())
    assert got == want


def test_bloom_hint_roundtrip_all_leaf_types(spark, tmp_path):
    """Write-side bloom-hint pass-through + the full F1-F7 leaf matrix
    with typed literals (int, string, decimal, timestamp, date,
    double), mirroring the reference's write-with-blooms → sarg-scan
    round trip (TestVectorOrcFile.java:2262-2269): the builder's
    write_options() names exactly the point-lookup columns, the ORC
    files carry those bloom indexes, and every leaf — including
    decimal/timestamp literals via the type hint — selects the same
    rows as the direct Catalyst predicate."""
    import datetime as dt

    from orc_release_hdp_2_6_5_99_1_tag_spark.sources.orc_io import write_orc

    rows = [
        (
            i,
            f"u{i % 7}",
            float(i) / 4,
            dt.datetime(2024, 3, 1 + i % 20, 12, 0, i % 60),
            dt.date(2024, 3, 1 + i % 20),
        )
        for i in range(200)
    ]
    df = spark.createDataFrame(
        rows, "id bigint, name string, amount double, ts timestamp, d date"
    ).withColumn("dec", F.col("amount").cast("decimal(12,2)"))

    b = (
        new_builder()
        .startAnd()
        .in_("name", "u1", "u3", type="string")
        .between("dec", "1.00", "30.00", type="decimal(12,2)")
        .startNot()
        .lessThan("ts", "2024-03-05 00:00:00", type="timestamp")
        .end()
        .startOr()
        .equals("id", 7)
        .null_safe_equals("d", "2024-03-11", type="date")
        .lessThanEquals("amount", 40.0)
        .end()
        .end()
    )
    assert b.bloom_filter_columns() == "d,dec,id,name"
    assert b.write_options() == {"orc.bloom.filter.columns": "d,dec,id,name"}

    path = str(tmp_path / "sarg_bloom_orc")
    write_orc(df, path, bloom_filter_columns=b.bloom_filter_columns())
    sarg = b.build()

    direct = (
        F.col("name").isin("u1", "u3")
        & F.col("dec").between(
            F.lit("1.00").cast("decimal(12,2)"), F.lit("30.00").cast("decimal(12,2)")
        )
        & ~(F.col("ts") < F.lit("2024-03-05 00:00:00").cast("timestamp"))
        & (
            (F.col("id") == 7)
            | F.col("d").eqNullSafe(F.lit("2024-03-11").cast("date"))
            | (F.col("amount") <= 40.0)
        )
    )
    back = read_orc(spark, path)
    got = sorted(r["id"] for r in back.filter(sarg).collect())
    want = sorted(r["id"] for r in df.filter(direct).collect())
    assert got == want and len(got) > 0

    # the sarg (including the typed decimal/timestamp leaves) reaches
    # the ORC scan as pushed filters
    pf = pushed_filters(back.filter(sarg).select("id"))
    assert "name" in pf and "ts" in pf, f"typed leaves not pushed: {pf!r}"


def test_in_type_hint_casts_literals(spark):
    """in_'s type hint must cast its literals like the other leaves
    (previously accepted-but-ignored): string literals against an int
    column select correctly when hinted."""
    df = spark.createDataFrame([(1,), (2,), (3,)], "n int")
    got = sorted(
        r["n"]
        for r in df.filter(new_builder().in_("n", "1", "3", type="int").build()).collect()
    )
    assert got == [1, 3]
