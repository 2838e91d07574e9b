"""Stats-level TruthValue parity (reference `TestRecordReaderImpl`'s
pickRowGroups corpus, SURVEY §5.2's 'most valuable corpus to port'):
leaf evaluation against min/max/hasNull stats shapes, the AND/OR/NOT
truth algebra, and — the load-bearing half — the PREDICTION pinned
against ground truth computed from real rows in real ORC files parsed
by the pure-Python footer machinery. A wrong NO is a wrong query
answer; a wrong YES breaks the reference's IS-NULL elimination."""

from __future__ import annotations

import os

import pyspark.sql.functions as F
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from orc_release_hdp_2_6_5_99_1_tag_spark.functions import truth as T


# ---------------------------------------------------------------------------
# leaf evaluation vs stats shapes (TestRecordReaderImpl.testCompareTo*/
# testPredEval* semantics)
# ---------------------------------------------------------------------------

_NN = {"min": 10, "max": 100, "has_null": False, "n_values": 50}
_WN = {"min": 10, "max": 100, "has_null": True, "n_values": 50}
_ALLNULL = {"min": None, "max": None, "has_null": True, "n_values": 0}
_POINT = {"min": 42, "max": 42, "has_null": False, "n_values": 5}


@pytest.mark.parametrize(
    "op,lit,stats,expected",
    [
        # equals
        ("equals", 42, _POINT, T.YES),
        ("equals", 41, _POINT, T.NO),
        ("equals", 50, _NN, T.YES_NO),
        ("equals", 5, _NN, T.NO),
        ("equals", 101, _NN, T.NO),
        ("equals", 50, _WN, T.YES_NO_NULL),
        ("equals", 5, _WN, T.NO_NULL),
        ("equals", 50, _ALLNULL, T.NULL),
        # null-safe equals: null rows compare FALSE, never NULL
        ("null_safe_equals", 50, _WN, T.YES_NO),
        ("null_safe_equals", 5, _WN, T.NO),
        # the reference never claims plain YES for <=>, even on a
        # point range (testNullSafeEquals: stats(15,15) vs 15 -> YES_NO)
        ("null_safe_equals", 42, _POINT, T.YES_NO),
        # less_than
        ("less_than", 101, _NN, T.YES),
        ("less_than", 10, _NN, T.NO),
        ("less_than", 50, _NN, T.YES_NO),
        ("less_than", 101, _WN, T.YES_NULL),
        ("less_than", 10, _WN, T.NO_NULL),
        # less_than_equals
        ("less_than_equals", 100, _NN, T.YES),
        ("less_than_equals", 9, _NN, T.NO),
        ("less_than_equals", 10, _NN, T.YES_NO),
        # in
        ("in", [1, 5, 200], _NN, T.NO),
        ("in", [42], _POINT, T.YES),
        ("in", [50, 200], _NN, T.YES_NO),
        ("in", [50], _WN, T.YES_NO_NULL),
        # between
        ("between", (10, 100), _NN, T.YES),
        ("between", (101, 200), _NN, T.NO),
        ("between", (50, 60), _NN, T.YES_NO),
        ("between", (10, 100), _WN, T.YES_NULL),
        # is_null
        ("is_null", None, _NN, T.NO),
        ("is_null", None, _WN, T.YES_NO),
        ("is_null", None, _ALLNULL, T.YES),
        # string stats: lexicographic range semantics
        ("equals", "hello", {"min": "c", "max": "f", "has_null": False}, T.NO),
        ("equals", "dog", {"min": "c", "max": "f", "has_null": False}, T.YES_NO),
        ("less_than", "z", {"min": "c", "max": "f", "has_null": False}, T.YES),
        ("between", ("a", "b"), {"min": "c", "max": "f", "has_null": False}, T.NO),
        ("in", ["cat", "q"], {"min": "c", "max": "f", "has_null": True}, T.YES_NO_NULL),
        # double stats
        ("less_than", 0.5, {"min": -1.5, "max": 0.25, "has_null": False}, T.YES),
        ("equals", 0.1, {"min": 0.1, "max": 0.1, "has_null": False}, T.YES),
        ("between", (0.0, 1.0), {"min": -1.0, "max": 2.0, "has_null": True}, T.YES_NO_NULL),
    ],
)
def test_leaf_truth_values(op, lit, stats, expected):
    assert T.evaluate_leaf(op, lit, stats) == expected


# ---------------------------------------------------------------------------
# algebra: derived tables must match hand-checked identities and stay
# closed/consistent under Kleene semantics
# ---------------------------------------------------------------------------

_ALL = [T.YES, T.NO, T.NULL, T.YES_NO, T.YES_NULL, T.NO_NULL, T.YES_NO_NULL]


def test_truth_algebra_identities():
    assert T.and_(T.YES, T.YES) == T.YES
    assert T.and_(T.NO, T.YES_NO_NULL) == T.NO          # false absorbs
    assert T.and_(T.YES, T.NULL) == T.NULL
    assert T.and_(T.YES_NULL, T.YES) == T.YES_NULL
    assert T.and_(T.NO_NULL, T.YES) == T.NO_NULL
    assert T.and_(T.NULL, T.NO) == T.NO                  # null AND false = false
    assert T.or_(T.YES, T.NO_NULL) == T.YES              # true absorbs
    assert T.or_(T.NO, T.NO) == T.NO
    assert T.or_(T.NULL, T.NO) == T.NULL
    assert T.or_(T.YES_NULL, T.NO) == T.YES_NULL
    assert T.not_(T.YES_NULL) == T.NO_NULL
    assert T.not_(T.YES_NO) == T.YES_NO
    assert T.not_(T.NULL) == T.NULL


def test_truth_algebra_de_morgan_and_commutativity():
    for a in _ALL:
        for b in _ALL:
            assert T.and_(a, b) == T.and_(b, a)
            assert T.or_(a, b) == T.or_(b, a)
            # De Morgan holds exactly on the outcome-set semantics
            assert T.not_(T.and_(a, b)) == T.or_(T.not_(a), T.not_(b))
            assert T.not_(T.or_(a, b)) == T.and_(T.not_(a), T.not_(b))


# ---------------------------------------------------------------------------
# the load-bearing property: prediction vs ground truth on REAL files
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def pruning_files(spark, sf_dir, tmp_path_factory):
    """lineitem key-sorted and split into 4 ORC files (files stand in
    for row groups: disjoint l_orderkey ranges + a nullable column),
    plus the parsed per-file stats and the actual rows per file."""
    from orc_release_hdp_2_6_5_99_1_tag_spark.sources.orc_io import write_orc
    from orc_release_hdp_2_6_5_99_1_tag_spark.tables import load_table

    d = str(tmp_path_factory.mktemp("prune"))
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_quantity",
        # a genuinely null-bearing column for the _NULL paths
        F.when(F.col("l_linenumber") % 3 == 0, F.col("l_partkey")).alias("maybe_pk"),
    )
    write_orc(li.repartitionByRange(4, "l_orderkey").sortWithinPartitions("l_orderkey"), d)
    files = sorted(
        os.path.join(d, f) for f in os.listdir(d) if f.startswith("part")
    )
    assert len(files) == 4
    rows_per_file = [
        spark.read.orc(f).collect() for f in files
    ]
    return files, rows_per_file


def _file_stats(path):
    from orc_release_hdp_2_6_5_99_1_tag_spark.sources.footer_tail import (
        parse_tail_of_file,
    )

    meta = parse_tail_of_file(path)
    out = {}
    for c in meta["columns"]:
        typed = c.get("typed") or {}
        out[c["name"]] = {
            "min": typed.get("min"),
            "max": typed.get("max"),
            "has_null": c.get("has_null"),
            "n_values": c.get("n_values"),
        }
    return out


def _eval_row(tree, row):
    """Three-valued evaluation of the predicate tree on one row —
    the ground truth the TruthValue must be a superset of."""
    head = tree[0]
    if head in ("and", "or"):
        vals = [_eval_row(c, row) for c in tree[1:]]
        if head == "and":
            if False in vals:
                return False
            return None if None in vals else True
        if True in vals:
            return True
        return None if None in vals else False
    if head == "not":
        v = _eval_row(tree[1], row)
        return None if v is None else not v
    op, col, lit = tree
    v = row[col]
    if op == "is_null":
        return v is None
    if op == "null_safe_equals":
        return v == lit if v is not None else False
    if v is None:
        return None
    if op == "equals":
        return v == lit
    if op == "less_than":
        return v < lit
    if op == "less_than_equals":
        return v <= lit
    if op == "in":
        return v in lit
    if op == "between":
        return lit[0] <= v <= lit[1]
    raise AssertionError(op)


_TREES = [
    ("equals", "l_orderkey", 3000),
    ("less_than", "l_orderkey", 1500),
    ("between", "l_orderkey", (100, 200)),
    ("in", "l_orderkey", [1, 2, 999999]),
    ("is_null", "maybe_pk", None),
    ("null_safe_equals", "maybe_pk", 1),
    ("and", ("less_than", "l_orderkey", 4000), ("equals", "l_quantity", 25.0)),
    ("or", ("less_than", "l_orderkey", 10), ("between", "l_orderkey", (5000, 5100))),
    ("not", ("less_than", "l_orderkey", 100000)),
    ("and", ("is_null", "maybe_pk", None), ("less_than", "l_orderkey", 50)),
]


def test_truth_prediction_is_sound_on_real_files(pruning_files):
    """For every (file, predicate): the predicted TruthValue's outcome
    set must CONTAIN every actual per-row outcome — NO forbids any
    true row, YES forbids any false row, the _NULL marker is required
    whenever a row evaluates to null. This is the exact contract
    pickRowGroups relies on."""
    files, rows_per_file = pruning_files
    for tree in _TREES:
        for path, rows in zip(files, rows_per_file):
            tv = T.evaluate_tree(tree, _file_stats(path))
            allowed = T._TO_SET[tv]
            for row in rows:
                got = _eval_row(tree, row)
                mark = {True: "t", False: "f", None: "n"}[got]
                assert mark in allowed, (
                    f"{tree} on {os.path.basename(path)}: row outcome "
                    f"{got} not allowed by predicted {tv}"
                )


def test_truth_prediction_actually_prunes(pruning_files):
    """The range-partitioned layout must make the evaluator SKIP files
    for selective point/range predicates — soundness alone would pass
    with an evaluator that always says YES_NO_NULL. Literals are
    derived from the parsed per-file stats so the test is
    scale-independent."""
    files, _ = pruning_files
    stats = [_file_stats(p)["l_orderkey"] for p in files]
    # a key guaranteed inside file 2 and outside files 0/1/3
    for tree in [
        ("equals", "l_orderkey", stats[2]["min"]),
        ("less_than", "l_orderkey", stats[1]["min"]),
        ("between", "l_orderkey", (stats[0]["min"], stats[0]["max"])),
    ]:
        decisions = [
            T.keeps_unit(T.evaluate_tree(tree, _file_stats(p))) for p in files
        ]
        assert any(decisions), f"{tree}: every file skipped — stats parse broke"
        assert decisions.count(False) >= 2, (
            f"{tree}: expected >=2 of 4 range-disjoint files skipped, got {decisions}"
        )


def test_explain_file_pruning_on_multistripe_file(spark, tmp_path):
    """explain_file_pruning reads per-STRIPE stats (Metadata section)
    and must skip stripes outside a key range on a key-sorted
    multi-stripe file (small orc.stripe.size forces several stripes)."""
    from orc_release_hdp_2_6_5_99_1_tag_spark.sources.orc_io import write_orc

    df = spark.range(200_000).select(
        F.col("id").alias("k"),
        # heavy unique payload so the writer's memory check actually
        # flushes stripes at the small stripe size (pure-int columns
        # RLE below the flush threshold)
        F.concat(F.lit("u"), F.col("id").cast("string"), F.lit("x" * 40)).alias("pad"),
    )
    write_orc(
        df.coalesce(1).sortWithinPartitions("k"),
        str(tmp_path / "ms"),
        stripe_size=64 * 1024,
    )
    f = [x for x in os.listdir(tmp_path / "ms") if x.startswith("part")][0]
    path = os.path.join(str(tmp_path / "ms"), f)
    lo = T.explain_file_pruning(path, ("less_than", "k", 50))
    assert len(lo) >= 2, "expected a multi-stripe file"
    assert lo[0]["keep"], "first stripe holds the smallest keys"
    assert not lo[-1]["keep"], "last stripe is out of range and must be skipped"


def test_pick_row_groups_end_to_end(spark, tmp_path):
    """Full pickRowGroups parity on a real multi-row-group file: a
    key-sorted single-stripe file with blooms; per row group (10k-row
    stride) the prediction must be SOUND (never skip a group holding
    a matching row) and EFFECTIVE (skip the out-of-range groups), and
    a bloom probe must skip in-range-but-absent keys that min/max
    alone cannot."""
    from orc_release_hdp_2_6_5_99_1_tag_spark.sources.orc_io import write_orc

    n = 100_000
    df = spark.range(n).select(
        (F.col("id") * 2).alias("k"),  # even keys only: odd = in-range absent
        F.concat(F.lit("pad"), F.col("id").cast("string")).alias("pad"),
    )
    write_orc(
        df.coalesce(1).sortWithinPartitions("k"),
        str(tmp_path / "rg"),
        bloom_filter_columns="k",
    )
    path = os.path.join(
        str(tmp_path / "rg"),
        [f for f in os.listdir(tmp_path / "rg") if f.startswith("part")][0],
    )

    # row group g holds keys [2*10000*g, 2*10000*(g+1))
    def rg_of(key):
        return (key // 2) // 10_000

    # point lookup, present key
    present = 2 * 34_567
    picks = T.pick_row_groups(path, ("equals", "k", present))
    assert len(picks) == 1 and len(picks[0]) == 10
    kept = [d["row_group"] for d in picks[0] if d["keep"]]
    assert rg_of(present) in kept, "sound: the matching group must be kept"
    assert len(kept) == 1, f"effective: exactly one group in range, kept {kept}"

    # in-range ABSENT key: min/max says maybe, the bloom proves NO
    absent = present + 1  # odd → never inserted
    with_bloom = T.pick_row_groups(path, ("equals", "k", absent), use_bloom=True)
    without = T.pick_row_groups(path, ("equals", "k", absent), use_bloom=False)
    assert sum(d["keep"] for d in without[0]) == 1, "min/max alone keeps the range group"
    assert sum(d["keep"] for d in with_bloom[0]) == 0, (
        "bloom must eliminate the in-range absent key"
    )

    # range predicate spanning three groups
    lo, hi = 2 * 25_000, 2 * 45_000
    picks = T.pick_row_groups(path, ("between", "k", (lo, hi)))
    kept = [d["row_group"] for d in picks[0] if d["keep"]]
    assert set(kept) == {2, 3, 4}, f"between should keep groups 2-4, kept {kept}"


def test_orc_scan_explain_tool(spark, tmp_path):
    """The tools-surface face of the pruning stack: one call returns
    stripe- and row-group-level keep/skip for a predicate tree."""
    from orc_release_hdp_2_6_5_99_1_tag_spark.sources.orc_io import write_orc
    from orc_release_hdp_2_6_5_99_1_tag_spark.sources.tools import orc_scan_explain

    df = spark.range(50_000).select(
        F.col("id").alias("k"),
        F.concat(F.lit("p"), F.col("id").cast("string")).alias("pad"),
    )
    write_orc(df.coalesce(1).sortWithinPartitions("k"), str(tmp_path / "t"))
    path = os.path.join(
        str(tmp_path / "t"),
        [f for f in os.listdir(tmp_path / "t") if f.startswith("part")][0],
    )
    rep = orc_scan_explain(path, ("less_than", "k", 5_000))
    assert rep["n_stripes_kept"] >= 1
    assert rep["n_row_groups"] == 5  # 50k rows / 10k stride
    assert rep["n_row_groups_kept"] == 1, rep  # only the first group qualifies
    # the IO consequence: 1 of 5 groups on the predicate column plans
    # well under the column's full data section
    assert 0 < rep["bytes_planned"] < rep["bytes_total_data"]


@given(
    mn=st.integers(-50, 50),
    width=st.integers(0, 40),
    lit=st.integers(-60, 100),
    has_null=st.booleans(),
    op=st.sampled_from(["equals", "less_than", "less_than_equals", "null_safe_equals"]),
)
@settings(max_examples=300, deadline=None)
def test_leaf_soundness_fuzz(mn, width, lit, has_null, op):
    """Hypothesis fuzz of the leaf evaluator: for a unit whose
    non-null values are exactly {mn, mn+width} (the stats' own
    boundary values — the hardest case), plus a null when has_null,
    the predicted TruthValue's outcome set must contain every actual
    outcome. Catches boundary slips (>= vs >) the table cases miss."""
    mx = mn + width
    stats = {"min": mn, "max": mx, "has_null": has_null, "n_values": 2}
    tv = T.evaluate_leaf(op, lit, stats)
    allowed = T._TO_SET[tv]
    values = [mn, mx] + ([None] if has_null else [])
    for v in values:
        if v is None:
            got = False if op == "null_safe_equals" else None
        elif op == "equals" or op == "null_safe_equals":
            got = v == lit
        elif op == "less_than":
            got = v < lit
        else:
            got = v <= lit
        mark = {True: "t", False: "f", None: "n"}[got]
        assert mark in allowed, (
            f"{op} lit={lit} stats=[{mn},{mx}] null={has_null}: "
            f"value {v} -> {got} not allowed by {tv}"
        )


def test_row_index_positions_and_entry_count(spark, tmp_path):
    """RowIndexEntry structure: one entry per 10k-row stride, each
    carrying non-empty monotone stream positions (the seek offsets
    `seekToRow` uses) and per-row-group stats whose min/max tile the
    sorted key range without overlap."""
    from orc_release_hdp_2_6_5_99_1_tag_spark.sources.footer_tail import (
        parse_row_index,
    )
    from orc_release_hdp_2_6_5_99_1_tag_spark.sources.orc_io import write_orc

    n = 50_000
    df = spark.range(n).select(F.col("id").alias("k"))
    write_orc(df.coalesce(1).sortWithinPartitions("k"), str(tmp_path / "ri"))
    path = os.path.join(
        str(tmp_path / "ri"),
        [f for f in os.listdir(tmp_path / "ri") if f.startswith("part")][0],
    )
    stripes = parse_row_index(path, 1)
    entries = [e for st in stripes for e in st]
    assert len(entries) == n // 10_000
    prev_max = None
    total = 0
    for e in entries:
        assert e["positions"], "every entry carries seek positions"
        typed = e["typed"]
        assert typed["min"] <= typed["max"]
        if prev_max is not None:
            assert typed["min"] > prev_max, "sorted key: row groups must tile"
        prev_max = typed["max"]
        total += e["n_values"]
    assert total == n
