"""Property-based three-valued-logic truth tests — the engine's port
of the reference's PPD truth-table corpus (`TestRecordReaderImpl.java:83+`,
SURVEY §5.2): random AND/OR/NOT predicate trees over EQUALS /
NULL-SAFE-EQUALS / LESS_THAN(_EQUALS) / IN / BETWEEN / IS_NULL leaves,
evaluated over a null-bearing table, must select and NULL-classify
identically in Spark and DuckDB (identical SQL text runs on both)."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
from hypothesis import HealthCheck, assume, given, settings
from hypothesis import strategies as st

ROWS = [
    (None, None, None),
    (0, "", 0.0),
    (1, "a", 0.5),
    (2, "b", -1.5),
    (3, "a", None),
    (None, "c", 2.5),
    (5, None, 3.5),
    (7, "zz", -0.5),
    (10, "b", 0.0),
    (-3, "a", 1.0),
]
PDF = pd.DataFrame(ROWS, columns=["i", "s", "d"]).astype({"i": "Int64"})

_INT_LITS = ["0", "1", "3", "-3", "10", "42"]
_STR_LITS = ["''", "'a'", "'b'", "'zz'", "'q'"]
_DBL_LITS = ["0.0", "0.5", "-1.5", "2.5"]


def _leaves(col: str, lits: list[str]) -> st.SearchStrategy[str]:
    lit = st.sampled_from(lits)
    two = st.tuples(lit, lit)
    return st.one_of(
        lit.map(lambda v: f"{col} = {v}"),
        lit.map(lambda v: f"{col} IS NOT DISTINCT FROM {v}"),
        lit.map(lambda v: f"{col} < {v}"),
        lit.map(lambda v: f"{col} <= {v}"),
        st.lists(lit, min_size=1, max_size=3, unique=True).map(
            lambda vs: f"{col} IN ({', '.join(vs)})"
        ),
        two.map(lambda t: f"{col} BETWEEN {min(t, key=len)} AND {max(t, key=len)}"),
        st.just(f"{col} IS NULL"),
        st.just(f"{col} IS NOT NULL"),
    )


_LEAF = st.one_of(_leaves("i", _INT_LITS), _leaves("s", _STR_LITS), _leaves("d", _DBL_LITS))


def _trees(leaf: st.SearchStrategy[str]) -> st.SearchStrategy[str]:
    return st.recursive(
        leaf,
        lambda inner: st.one_of(
            st.tuples(inner, inner).map(lambda t: f"({t[0]} AND {t[1]})"),
            st.tuples(inner, inner).map(lambda t: f"({t[0]} OR {t[1]})"),
            inner.map(lambda p: f"(NOT {p})"),
        ),
        max_leaves=4,
    )


def _fresh_con() -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    con.register("tv3", PDF)
    return con


@pytest.fixture(scope="module")
def engines(spark):
    spark.createDataFrame(PDF).createOrReplaceTempView("tv3")
    holder = {"con": _fresh_con()}
    yield spark, holder
    holder["con"].close()


@settings(max_examples=60, deadline=None, suppress_health_check=list(HealthCheck))
@given(pred=_trees(_LEAF))
def test_3vl_parity(engines, pred):
    spark, holder = engines
    q = (
        "SELECT COUNT(*) AS n, "
        f"COUNT(CASE WHEN ({pred}) THEN 1 END) AS n_true, "
        f"COUNT(CASE WHEN NOT ({pred}) THEN 1 END) AS n_false, "
        f"COUNT(CASE WHEN ({pred}) IS NULL THEN 1 END) AS n_unknown "
        "FROM tv3"
    )
    s = tuple(spark.sql(q).collect()[0])
    try:
        dk = holder["con"].execute(q).fetchone()
    except duckdb.InternalException:
        # DuckDB optimizer assertion bug (e.g. '(i IS NULL AND i
        # BETWEEN 0 AND 0) OR (same)' dereferences a NULL unique_ptr)
        # — the ORACLE crashed, not the engine. An InternalException
        # also poisons the connection (every later query raises
        # InvalidInputError), so reopen it before skipping.
        holder["con"].close()
        holder["con"] = _fresh_con()
        assume(False)
    assert s == dk, f"3VL divergence for {pred!r}: spark={s} duckdb={dk}"
