"""PPD safety under schema evolution × row-group stats shapes — the
second half of the reference's truth-table corpus
(`TestRecordReaderImpl.java:83+` stats-shape cases ×
`SchemaEvolution.isPPDSafeConversion` / `validatePPDConversion`,
reference `SchemaEvolution.java:222-310`).

The reference's rule: under evolution, row-group skipping may trust
file stats only for the widening chains byte→short→int→long and
string↔varchar; float→double and decimal precision changes are UNSAFE
(float stats are stored as doubles; filter literals convert through a
different path — the `f = 74.72` lore case), so the reader must fall
back to scanning every row group. This engine reads ORC through
Spark + the embedded Java ORC reader, which applies that exact logic;
these tests pin the END-TO-END property the rule protects: a
predicate over an evolved column returns exactly the rows the logical
(cast-then-filter) semantics demand — for the safe chains AND the
unsafe ones — across row groups whose stats shapes (no-null,
all-null, constant min==max, NaN-bearing, negative) are the ones the
truth table enumerates.
"""

from __future__ import annotations

import math
from decimal import Decimal

import duckdb
import pandas as pd
import pytest

from orc_release_hdp_2_6_5_99_1_tag_spark.plans import pushed_filters
from orc_release_hdp_2_6_5_99_1_tag_spark.sources.orc_io import read_orc, write_orc

_STRIDE = 1000  # ORC minimum row-index stride → 3 row groups over 3000 rows


def _build_rows():
    """3000 rows in three 1000-row blocks with distinct per-column
    row-group stats shapes (written single-partition so blocks align
    with row groups):

    - i  (int):    block0 ascending 0..999 · block1 ALL NULL ·
                   block2 CONSTANT 5000 (min == max)
    - b  (tinyint) / s (smallint): small widening-chain values w/ nulls
    - f  (float):  74.72f rows sprinkled in block0 (the unsafe-PPD
                   lore value), 74.5f (exactly representable) in
                   block1, negative in block2
    - d  (double): block0 normal · block1 NaN-bearing · block2 negative
    - dec (decimal(10,2)): ascending with nulls
    - st (string): short strings, empty string, nulls
    """
    rows = []
    for idx in range(3000):
        block = idx // 1000
        i = idx if block == 0 else (None if block == 1 else 5000)
        b = (idx % 100) - 50 if idx % 7 else None
        s = (idx % 1000) - 500 if idx % 11 else None
        if block == 0:
            f = 74.72 if idx % 10 == 0 else float(idx) / 8
        elif block == 1:
            f = 74.5 if idx % 10 == 0 else float(idx) / 16
        else:
            f = -float(idx) / 4
        if block == 0:
            d = idx * 0.5
        elif block == 1:
            d = math.nan if idx % 5 == 0 else idx * 0.25
        else:
            d = -idx * 0.125
        dec = None if idx % 13 == 0 else Decimal(idx * 7).scaleb(-2)
        stv = "" if idx % 17 == 0 else (None if idx % 19 == 0 else f"k{idx % 23}")
        rows.append((idx, i, b, s, f, d, dec, stv))
    return rows


_FILE_DDL = (
    "idx bigint, i int, b tinyint, s smallint, f float, d double,"
    " dec decimal(10,2), st string"
)


@pytest.fixture(scope="module")
def evo_orc(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("ppd_evo") / "chain_orc")
    df = spark.createDataFrame(_build_rows(), _FILE_DDL).coalesce(1)
    write_orc(df, path, row_index_stride=_STRIDE)
    con = duckdb.connect()
    pdf = pd.DataFrame(
        _build_rows(), columns=["idx", "i", "b", "s", "f", "d", "dec", "st"]
    )
    # the ORC file stores f as float32 — quantize the replay identically
    # (this is precisely what makes the 74.72 equality case sharp)
    pdf["f"] = pdf["f"].astype("float32")
    con.register("t", pdf)
    yield path, con
    con.close()


def _check(spark, path, con, reader_ddl: str, spark_where: str, duck_where: str):
    """Rows selected through the evolved ORC read must equal DuckDB
    replaying the cast-then-filter semantics on the logical data."""
    got = sorted(
        r["idx"] for r in read_orc(spark, path, schema=reader_ddl)
        .filter(spark_where).select("idx").collect()
    )
    want = sorted(
        r[0] for r in con.sql(f"SELECT idx FROM t WHERE {duck_where}").fetchall()
    )
    assert got == want, (
        f"evolved-PPD divergence for [{spark_where}] under reader "
        f"schema [{reader_ddl}]: {len(got)} vs {len(want)} rows"
    )
    return got


_WIDER = (
    "idx bigint, i bigint, b int, s bigint, f double, d double,"
    " dec decimal(12,2), st string"
)

# (case id, reader ddl, spark predicate, duckdb predicate, expect_pushdown_col)
_CASES = [
    # --- safe widening chains (byte→short→int→long): skipping may
    # trust stats, and results must be exact on every stats shape ----
    ("int_to_long_eq", _WIDER, "i = 500", "CAST(i AS BIGINT) = 500", "i"),
    ("int_to_long_eq_const_block", _WIDER, "i = 5000", "CAST(i AS BIGINT) = 5000", "i"),
    ("int_to_long_eq_allnull_miss", _WIDER, "i = 1500", "CAST(i AS BIGINT) = 1500", "i"),
    ("int_to_long_lt_boundary", _WIDER, "i < 0", "CAST(i AS BIGINT) < 0", "i"),
    ("int_to_long_lte_max", _WIDER, "i <= 999", "CAST(i AS BIGINT) <= 999", "i"),
    ("int_to_long_between", _WIDER, "i BETWEEN 990 AND 5000",
     "CAST(i AS BIGINT) BETWEEN 990 AND 5000", "i"),
    ("int_to_long_in", _WIDER, "i IN (0, 999, 5000, 7777)",
     "CAST(i AS BIGINT) IN (0, 999, 5000, 7777)", "i"),
    ("int_to_long_isnull", _WIDER, "i IS NULL", "i IS NULL", "i"),
    ("byte_to_int_eq", _WIDER, "b = -50", "CAST(b AS INT) = -50", "b"),
    ("byte_to_int_isnull", _WIDER, "b IS NULL", "b IS NULL", "b"),
    ("short_to_long_lt", _WIDER, "s < -400", "CAST(s AS BIGINT) < -400", "s"),
    ("short_to_long_nse", _WIDER, "s <=> 250", "s IS NOT DISTINCT FROM 250", "s"),
    # --- UNSAFE conversions (reference validatePPDConversion returns
    # false → reader must scan all groups; results must STILL be exact)
    # float→double equality: 74.72f widens to 74.72000122…, so the
    # double literal 74.72 matches NOTHING — both engines must agree
    ("float_to_double_eq_lore", _WIDER, "f = 74.72", "CAST(f AS DOUBLE) = 74.72", None),
    # exactly-representable float: equality DOES match through widening
    ("float_to_double_eq_exact", _WIDER, "f = 74.5", "CAST(f AS DOUBLE) = 74.5", None),
    ("float_to_double_lt", _WIDER, "f < 0.0", "CAST(f AS DOUBLE) < 0.0", None),
    # decimal precision widening (reference: unsafe for PPD, equality
    # must still be exact)
    ("decimal_widen_eq", _WIDER, "dec = CAST(6.93 AS DECIMAL(12,2))",
     "CAST(dec AS DECIMAL(12,2)) = 6.93", None),
    ("decimal_widen_isnull", _WIDER, "dec IS NULL", "dec IS NULL", None),
    # --- stats-shape hazards on the unevolved read -------------------
    # NaN-bearing row group: NaN poisons naive min/max; comparisons
    # must not skip the group's real values (NaN itself never matches)
    ("nan_block_lt", _FILE_DDL, "d < 300.0", "d < 300.0", "d"),
    ("nan_block_gt", _FILE_DDL, "d > 270.0 AND NOT isnan(d)", "d > 270.0 AND NOT isnan(d)", "d"),
    # empty-string vs NULL are distinct in stats and in semantics
    ("empty_string_eq", _FILE_DDL, "st = ''", "st = ''", "st"),
    ("string_isnull", _FILE_DDL, "st IS NULL", "st IS NULL", "st"),
]


@pytest.mark.parametrize("case", _CASES, ids=[c[0] for c in _CASES])
def test_evolved_ppd_exactness(spark, evo_orc, case):
    name, reader_ddl, spark_where, duck_where, push_col = case
    path, con = evo_orc
    _check(spark, path, con, reader_ddl, spark_where, duck_where)
    if push_col is not None:
        df = read_orc(spark, path, schema=reader_ddl).filter(spark_where).select("idx")
        pf = pushed_filters(df)
        assert push_col in pf, (
            f"safe-chain predicate not pushed to the ORC scan for {name}: {pf!r}"
        )


def test_unsafe_float_eq_returns_zero_and_safe_variant_matches(spark, evo_orc):
    """The lore case end-to-end: under float→double evolution the
    equality literal misses every 74.72f row (100 of them exist), while
    the range rewrite the reference recommends ("convert equality on
    floats to range predicates") recovers them exactly."""
    path, con = evo_orc
    got_eq = _check(spark, path, con, _WIDER, "f = 74.72", "CAST(f AS DOUBLE) = 74.72")
    assert got_eq == []  # the sharp edge, pinned
    got_rng = _check(
        spark, path, con, _WIDER,
        "f > 74.7199 AND f < 74.7201",
        "CAST(f AS DOUBLE) > 74.7199 AND CAST(f AS DOUBLE) < 74.7201",
    )
    assert len(got_rng) == 100


# ---------------------------------------------------------------------------
# Property-based fuzz: random predicate trees over the EVOLVED read
# ---------------------------------------------------------------------------

import re  # noqa: E402

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402


def _leaves(col: str, lits: list[str]) -> st.SearchStrategy[str]:
    lit = st.sampled_from(lits)
    return st.one_of(
        lit.map(lambda v: f"{col} = {v}"),
        lit.map(lambda v: f"{col} < {v}"),
        lit.map(lambda v: f"{col} >= {v}"),
        st.lists(lit, min_size=1, max_size=3, unique=True).map(
            lambda vs: f"{col} IN ({', '.join(vs)})"
        ),
        st.just(f"{col} IS NULL"),
        st.just(f"{col} IS NOT NULL"),
    )


_EVO_LEAF = st.one_of(
    _leaves("i", ["0", "500", "999", "1500", "5000"]),
    _leaves("s", ["-500", "-400", "0", "250", "499"]),
    _leaves("f", ["0.0", "74.5", "74.72", "-100.0"]),
    _leaves("st", ["''", "'k0'", "'k11'", "'k22'", "'zz'"]),
)


def _trees(leaf):
    return st.recursive(
        leaf,
        lambda inner: st.one_of(
            st.tuples(inner, inner).map(lambda t: f"({t[0]} AND {t[1]})"),
            st.tuples(inner, inner).map(lambda t: f"({t[0]} OR {t[1]})"),
            inner.map(lambda p: f"(NOT {p})"),
        ),
        max_leaves=4,
    )


@settings(max_examples=40, deadline=None, suppress_health_check=list(HealthCheck))
@given(pred=_trees(_EVO_LEAF))
def test_evolved_ppd_fuzz(spark, evo_orc, pred):
    """Random AND/OR/NOT predicate trees over the WIDENED reader schema
    (int→long, short→long, float→double) must select exactly the rows
    DuckDB's cast-then-filter replay selects, across every stats shape
    in the file (all-null, constant, NaN-bearing, negative blocks) —
    the property the reference's isPPDSafeConversion rule protects,
    fuzzed instead of enumerated."""
    path, con = evo_orc
    got = sorted(
        r["idx"]
        for r in read_orc(spark, path, schema=_WIDER)
        .filter(pred).select("idx").collect()
    )
    # the replay must CAST f to double explicitly: for a bare binary
    # comparison DuckDB promotes the float32 column to double (matching
    # the widened read), but IN unifies at the COLUMN type — the
    # double literal 74.72 would silently round to float32 and match
    # rows the evolved double read correctly misses (found by this
    # fuzz; the cast pins cast-then-filter semantics for every shape)
    duck_pred = re.sub(r"\bf\b", "CAST(f AS DOUBLE)", pred)
    want = sorted(
        r[0] for r in con.sql(f"SELECT idx FROM t WHERE {duck_pred}").fetchall()
    )
    assert got == want, f"evolved-PPD fuzz divergence for {pred!r}"


def test_positional_vs_name_based_mapping(spark, sf_dir, tmp_path):
    """The reference supports TWO file->reader mapping modes
    (`SchemaEvolution.java:38-130`; `OrcConf.java:141-145`
    `orc.force.positional.evolution`): name-based (c1) and positional
    (Hive-written files). Pin both against each other on the same
    data: a file with MEANINGFUL names read under a renamed reader
    schema nulls the renamed column (name mapping finds no match),
    while the _colN-named twin of the same rows read under the same
    reader schema delivers every value BY POSITION — including a
    widened int->bigint on a middle field, proving conversions
    compose with positional mapping."""
    import pyspark.sql.functions as F

    from orc_release_hdp_2_6_5_99_1_tag_spark.operators.evolution import (
        c3_positional_evolution,
    )
    from orc_release_hdp_2_6_5_99_1_tag_spark.sources.orc_io import (
        read_orc,
        write_orc,
    )
    from orc_release_hdp_2_6_5_99_1_tag_spark.tables import load_table

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_returnflag"
    )
    named = str(tmp_path / "named_orc")
    hive = str(tmp_path / "hive_orc")
    write_orc(li, named)
    write_orc(li.toDF("_col0", "_col1", "_col2", "_col3"), hive)
    reader = "l_orderkey bigint, line_no bigint, l_quantity double, l_returnflag string"

    # name-based: the renamed middle column has no name match -> NULLs
    by_name = read_orc(spark, named, schema=reader)
    n = by_name.count()
    assert n == li.count()
    assert by_name.filter(F.col("line_no").isNotNull()).count() == 0
    # matched names still deliver values
    assert by_name.filter(F.col("l_orderkey").isNull()).count() == 0

    # positional: every column delivers by position despite the rename
    by_pos = read_orc(spark, hive, schema=reader)
    want = li.agg(
        F.sum("l_orderkey"), F.sum(F.col("l_linenumber").cast("bigint"))
    ).collect()[0]
    got = by_pos.agg(F.sum("l_orderkey"), F.sum("line_no")).collect()[0]
    assert tuple(got) == tuple(want)
    assert dict(by_pos.dtypes)["line_no"] == "bigint"  # widened in-flight

    # and the registered extra returns the same rollup as its oracle
    # shape computed straight from the parquet source
    ref = (
        li.groupBy(F.col("l_returnflag").alias("ret_flag"))
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum("l_orderkey").alias("order_key_checksum"),
            F.sum(F.col("l_linenumber").cast("bigint")).alias("line_no_sum"),
            F.sum(
                F.floor(F.col("l_quantity") * 100 + F.lit(0.5)).cast("bigint")
            ).alias("qty_cents"),
        )
        .orderBy("ret_flag")
        .collect()
    )
    assert c3_positional_evolution(spark, sf_dir).collect() == ref
