"""Predicate-vs-stats type coercion truth tables, ported cell-by-cell
from the reference's TestRecordReaderImpl (testPredEvalWith*Stats at
:470-792, operator tables at :793-1105) against
`getBaseObjectForComparison` (RecordReaderImpl.java:661-762), the
timestamp-column PPD gate (:408-422), and the SargApplier cast-error
fallback (:852-874).

Value-class mapping (Python ~ Java): bool~Boolean, int~Long,
float~Double, str~String, datetime.date~Date, datetime.datetime~
Timestamp, Decimal~HiveDecimal. The reference's proto stats builders
leave hasNull unset, which deserializes to hasNull()==true — the
table stats here pass has_null=True to match, and the fallback tests
cover the hasHasNull()-present-and-false split explicitly."""

from __future__ import annotations

import datetime as dt
import os
from decimal import Decimal

import pytest

from orc_release_hdp_2_6_5_99_1_tag_spark.functions import truth as T
from orc_release_hdp_2_6_5_99_1_tag_spark.functions.truth import (
    SargCastError,
    coerce_for_comparison,
    evaluate_leaf,
    evaluate_leaf_typed,
    evaluate_predicate_typed,
)


def _stats(mn, mx, has_null=True, n=10):
    return {"min": mn, "max": mx, "has_null": has_null, "n_values": n}


def _day(d):  # DateWritable(d).get()
    return dt.date(1970, 1, 1) + dt.timedelta(days=d)


def _ms(ms):  # new Timestamp(ms), UTC-anchored
    return dt.datetime(1970, 1, 1) + dt.timedelta(milliseconds=ms)


NSE = "null_safe_equals"


# ---------------------------------------------------------------------------
# testPredEvalWith{Int,Double,String,Date,Decimal}Stats: every
# pred_type x stats-value-class cell, including the SargCastError rows
# ---------------------------------------------------------------------------

_INT = _stats(10, 100)
_DBL = _stats(10.0, 100.0)
_STR = _stats("10", "1000")
_DATE = _stats(_day(10), _day(100))
_DEC = _stats(Decimal("10.0"), Decimal("100.0"))


@pytest.mark.parametrize(
    "stats,pred_type,literal,expected",
    [
        # --- int (Long) stats, TestRecordReaderImpl:494-535 ---
        pytest.param(_INT, "long", 15, T.YES_NO, id="int-stats/LONG-15"),
        pytest.param(_INT, "float", 15.0, T.YES_NO, id="int-stats/FLOAT-15.0"),
        # stats coerce to the PREDICATE type: "15" is lexically outside ["10","100"]
        pytest.param(_INT, "string", "15", T.NO, id="int-stats/STRING-15-lex-outside"),
        pytest.param(_INT, "decimal", Decimal("15"), T.YES_NO, id="int-stats/DECIMAL-15"),
        # --- double stats, :537-579 ---
        pytest.param(_DBL, "long", 15, T.YES_NO, id="double-stats/LONG-15"),
        pytest.param(_DBL, "float", 15.0, T.YES_NO, id="double-stats/FLOAT-15.0"),
        pytest.param(_DBL, "string", "15", T.NO, id="double-stats/STRING-15-lex-outside"),
        pytest.param(_DBL, "decimal", Decimal("15"), T.YES_NO, id="double-stats/DECIMAL-15"),
        # double -> timestamp is SECONDS (TimestampUtils.doubleToTimestamp)
        pytest.param(_DBL, "timestamp", _ms(15_000), T.YES_NO, id="double-stats/TIMESTAMP-15s-inside"),
        pytest.param(_DBL, "timestamp", _ms(150_000), T.NO, id="double-stats/TIMESTAMP-150s-outside"),
        # --- string stats, :581-617 ---
        pytest.param(_STR, "long", 100, T.YES_NO, id="string-stats/LONG-100"),
        pytest.param(_STR, "float", 100.0, T.YES_NO, id="string-stats/FLOAT-100.0"),
        pytest.param(_STR, "string", "100", T.YES_NO, id="string-stats/STRING-100"),
        pytest.param(_STR, "decimal", Decimal("100"), T.YES_NO, id="string-stats/DECIMAL-100"),
        # --- date stats, :619-700 (Date.toString comparison domain) ---
        pytest.param(_DATE, "string", "15", T.NO, id="date-stats/STRING-15-before"),
        pytest.param(_DATE, "string", "1970-01-11", T.YES_NO, id="date-stats/STRING-min-date"),
        pytest.param(_DATE, "string", "15.1", T.NO, id="date-stats/STRING-15.1-before"),
        pytest.param(_DATE, "string", "__a15__1", T.NO, id="date-stats/STRING-garbage-after"),
        pytest.param(_DATE, "string", "2000-01-16", T.NO, id="date-stats/STRING-2000-after"),
        pytest.param(_DATE, "string", "1970-01-16", T.YES_NO, id="date-stats/STRING-inside"),
        pytest.param(_DATE, "date", _day(15), T.YES_NO, id="date-stats/DATE-day15-inside"),
        pytest.param(_DATE, "date", _day(150), T.NO, id="date-stats/DATE-day150-outside"),
        # date -> timestamp is midnight (new Timestamp(date.getTime()))
        pytest.param(_DATE, "timestamp", _ms(15), T.NO, id="date-stats/TIMESTAMP-15ms-before"),
        pytest.param(_DATE, "timestamp", _ms(15 * 86_400_000), T.YES_NO, id="date-stats/TIMESTAMP-day15-inside"),
        # --- decimal stats, :702-744 (HiveDecimal.toString strips .0) ---
        pytest.param(_DEC, "long", 15, T.YES_NO, id="decimal-stats/LONG-15"),
        pytest.param(_DEC, "float", 15.0, T.YES_NO, id="decimal-stats/FLOAT-15.0"),
        pytest.param(_DEC, "string", "15", T.NO, id="decimal-stats/STRING-15-lex-outside"),
        pytest.param(_DEC, "decimal", Decimal("15"), T.YES_NO, id="decimal-stats/DECIMAL-15"),
        # decimal -> timestamp is SECONDS (TimestampUtils.decimalToTimestamp)
        pytest.param(_DEC, "timestamp", _ms(15_000), T.YES_NO, id="decimal-stats/TIMESTAMP-15s-inside"),
        pytest.param(_DEC, "timestamp", _ms(150_000), T.NO, id="decimal-stats/TIMESTAMP-150s-outside"),
    ],
)
def test_pred_eval_coercion_cells(stats, pred_type, literal, expected):
    assert evaluate_predicate_typed(NSE, pred_type, literal, stats) == expected


@pytest.mark.parametrize(
    "stats,pred_type,literal,msg",
    [
        # Long stats never convert to DATE (days/seconds/millis ambiguity)
        pytest.param(_INT, "date", _day(15), "int to DATE", id="int-stats/DATE-raises"),
        # Long stats never convert to TIMESTAMP (only Java Integer = millis does)
        pytest.param(_INT, "timestamp", _ms(15), "int to TIMESTAMP", id="int-stats/TIMESTAMP-raises"),
        pytest.param(_DBL, "date", _day(15), "float to DATE", id="double-stats/DATE-raises"),
        pytest.param(_STR, "timestamp", _ms(100), "str to TIMESTAMP", id="string-stats/TIMESTAMP-raises"),
        pytest.param(_DATE, "long", 15, "date to LONG", id="date-stats/LONG-raises"),
        pytest.param(_DATE, "float", 15.0, "date to FLOAT", id="date-stats/FLOAT-raises"),
        pytest.param(_DATE, "decimal", Decimal("15"), "date to DECIMAL", id="date-stats/DECIMAL-raises"),
        pytest.param(_DEC, "date", _day(15), "Decimal to DATE", id="decimal-stats/DATE-raises"),
    ],
)
def test_pred_eval_sarg_cast_exceptions(stats, pred_type, literal, msg):
    """The reference's SargCastException rows, with the class-to-type
    message pinned ('ORC SARGS could not convert from Long to DATE'
    becomes 'from int to DATE' in the Python value-class names)."""
    with pytest.raises(SargCastError, match=msg):
        evaluate_predicate_typed(NSE, pred_type, literal, stats)


@pytest.mark.parametrize(
    "stats,pred_type,literal,expected",
    [
        # String stats + DATE predicate: Date.valueOf("10") raises
        # IllegalArgumentException (not SargCast) -> same fallback; the
        # operator is NULL_SAFE_EQUALS so the answer is YES_NO
        pytest.param(_STR, "date", _day(100), T.YES_NO, id="string-stats/DATE-malformed-falls-back"),
        # Long.valueOf("15.1") raises NumberFormatException
        pytest.param(_stats("15.1", "99.9"), "long", 20, T.YES_NO, id="string-stats/LONG-15.1-malformed"),
    ],
)
def test_malformed_string_conversions_fall_back(stats, pred_type, literal, expected):
    assert evaluate_leaf_typed(NSE, pred_type, literal, stats) == expected


# ---------------------------------------------------------------------------
# testPredEvalWithBooleanStats :470-492 (BucketStatistics-derived
# min/max via stats_to_domain, the getMin/getMax falseCount rule)
# ---------------------------------------------------------------------------


def _bool_stats(n, true_count, has_null=True):
    return T.stats_to_domain(
        "boolean",
        {"n_values": n, "has_null": has_null, "typed": {"true_count": true_count}},
    )


@pytest.mark.parametrize(
    "n,true_count,literal,expected",
    [
        pytest.param(10, 10, True, T.YES_NO, id="all-true/TRUE"),
        pytest.param(10, 0, True, T.NO, id="all-false/TRUE"),
        pytest.param(10, 10, False, T.NO, id="all-true/FALSE"),
        pytest.param(10, 0, False, T.YES_NO, id="all-false/FALSE"),
    ],
)
def test_pred_eval_with_boolean_stats(n, true_count, literal, expected):
    assert evaluate_predicate_typed(NSE, "boolean", literal, _bool_stats(n, true_count)) == expected


def test_boolean_coercion_only_true_string_is_true():
    # Boolean.valueOf: only (case-insensitive) "true" converts to true
    assert coerce_for_comparison("boolean", "true") is True
    assert coerce_for_comparison("boolean", "TRUE") is True
    assert coerce_for_comparison("boolean", "false") is False
    assert coerce_for_comparison("boolean", "1") is False
    assert coerce_for_comparison("boolean", 1) is False


def test_unknown_stats_kind_disables_ppd():
    """getMin's 'null is not safe here' UNKNOWN_VALUE path (binary and
    complex columns): YES_NO_NULL, never the all-null NULL answer."""
    s = T.stats_to_domain("binary", {"n_values": 10, "has_null": False, "typed": {"sum": 40}})
    assert s["min"] is T.UNKNOWN_VALUE
    assert evaluate_leaf("equals", 5, s) == T.YES_NO_NULL
    assert evaluate_predicate_typed("equals", "long", 5, s) == T.YES_NO_NULL


# ---------------------------------------------------------------------------
# testPredEvalWithTimestampStats :746-791 + testTimestampStatsOldFiles
# :1065-1080: the timestamp-column PPD gate
# ---------------------------------------------------------------------------

_TS17 = _stats(dt.datetime(2017, 1, 1), dt.datetime(2018, 1, 1))
_TSPOINT = _stats(dt.datetime(2017, 1, 1), dt.datetime(2017, 1, 1))
_TS15 = _stats(dt.datetime(2015, 1, 1), dt.datetime(2016, 1, 1))


@pytest.mark.parametrize(
    "stats,pred_type,literal,orc135,expected",
    [
        pytest.param(_TS17, "timestamp", dt.datetime(2017, 1, 1), True, T.YES_NO, id="TIMESTAMP-at-min"),
        # FLOAT/DECIMAL predicates on a timestamp column: PPD disabled
        pytest.param(_TS17, "float", 15.0, True, T.YES_NO_NULL, id="FLOAT-gated"),
        pytest.param(_TS15, "decimal", Decimal("15"), True, T.YES_NO_NULL, id="DECIMAL-gated"),
        # pre-ORC-135 writers: always YES_NO_NULL
        pytest.param(_TSPOINT, "timestamp", dt.datetime(2017, 1, 1), False, T.YES_NO_NULL, id="pre-ORC135-gated"),
        # Timestamp.toString comparison domain (trailing ".0")
        pytest.param(_TS17, "string", "2017-01-01 00:00:00.0", True, T.YES_NO, id="STRING-ts-tostring"),
        pytest.param(_TSPOINT, "date", dt.date(2016, 1, 1), True, T.NO, id="DATE-before"),
        pytest.param(_TS15, "date", dt.date(2016, 1, 1), True, T.YES_NO, id="DATE-at-max"),
    ],
)
def test_timestamp_column_gating(stats, pred_type, literal, orc135, expected):
    assert (
        evaluate_predicate_typed(
            NSE, pred_type, literal, stats,
            column_type="timestamp", writer_has_orc135=orc135,
        )
        == expected
    )


def test_timestamp_tostring_renders_fraction():
    assert coerce_for_comparison("string", dt.datetime(2017, 1, 1)) == "2017-01-01 00:00:00.0"
    assert (
        coerce_for_comparison("string", dt.datetime(2017, 1, 1, microsecond=120_000))
        == "2017-01-01 00:00:00.12"
    )


# ---------------------------------------------------------------------------
# Operator truth tables, testEquals..testIsNull :793-930 (hasNull=true
# stats — the proto-default the reference's builders produce) and the
# WithNullInStats string variants :931-1063
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "op,lit,mn,mx,expected",
    [
        # testEquals
        ("equals", 15, 20, 30, T.NO_NULL),
        ("equals", 15, 15, 30, T.YES_NO_NULL),
        ("equals", 15, 10, 30, T.YES_NO_NULL),
        ("equals", 15, 10, 15, T.YES_NO_NULL),
        ("equals", 15, 0, 10, T.NO_NULL),
        ("equals", 15, 15, 15, T.YES_NULL),
        # testNullSafeEquals — never a *_NULL variant, never plain YES
        (NSE, 15, 20, 30, T.NO),
        (NSE, 15, 15, 30, T.YES_NO),
        (NSE, 15, 10, 30, T.YES_NO),
        (NSE, 15, 10, 15, T.YES_NO),
        (NSE, 15, 0, 10, T.NO),
        (NSE, 15, 15, 15, T.YES_NO),
        # testLessThan
        ("less_than", 15, 20, 30, T.NO_NULL),
        ("less_than", 15, 15, 30, T.NO_NULL),
        ("less_than", 15, 10, 30, T.YES_NO_NULL),
        ("less_than", 15, 10, 15, T.YES_NO_NULL),
        ("less_than", 15, 0, 10, T.YES_NULL),
        # testLessThanEquals
        ("less_than_equals", 15, 20, 30, T.NO_NULL),
        ("less_than_equals", 15, 15, 30, T.YES_NO_NULL),
        ("less_than_equals", 15, 10, 30, T.YES_NO_NULL),
        ("less_than_equals", 15, 10, 15, T.YES_NULL),
        ("less_than_equals", 15, 0, 10, T.YES_NULL),
        # testIn
        ("in", [10, 20], 20, 20, T.YES_NULL),
        ("in", [10, 20], 30, 30, T.NO_NULL),
        ("in", [10, 20], 10, 30, T.YES_NO_NULL),
        ("in", [10, 20], 12, 18, T.NO_NULL),
        # testBetween
        ("between", (10, 20), 0, 5, T.NO_NULL),
        ("between", (10, 20), 30, 40, T.NO_NULL),
        ("between", (10, 20), 5, 15, T.YES_NO_NULL),
        ("between", (10, 20), 15, 25, T.YES_NO_NULL),
        ("between", (10, 20), 5, 25, T.YES_NO_NULL),
        ("between", (10, 20), 10, 20, T.YES_NULL),
        ("between", (10, 20), 12, 18, T.YES_NULL),
        # empty BETWEEN list: YES_NO even with hasNull stats
        ("between", (), 0, 5, T.YES_NO),
        ("between", (), 10, 20, T.YES_NO),
        # testIsNull
        ("is_null", None, 20, 30, T.YES_NO),
    ],
)
def test_operator_truth_tables_long(op, lit, mn, mx, expected):
    assert evaluate_leaf(op, lit, _stats(mn, mx)) == expected
    # identical through the typed front-end (long coercion = identity)
    pt = "long" if op != "is_null" else None
    if pt:
        assert evaluate_predicate_typed(op, pt, lit, _stats(mn, mx)) == expected


@pytest.mark.parametrize(
    "op,lit,mn,mx,expected",
    [
        # testEqualsWithNullInStats
        ("equals", "c", "d", "e", T.NO_NULL),
        ("equals", "c", "a", "b", T.NO_NULL),
        ("equals", "c", "b", "c", T.YES_NO_NULL),
        ("equals", "c", "c", "d", T.YES_NO_NULL),
        ("equals", "c", "b", "d", T.YES_NO_NULL),
        ("equals", "c", "c", "c", T.YES_NULL),
        # testNullSafeEqualsWithNullInStats
        (NSE, "c", "d", "e", T.NO),
        (NSE, "c", "a", "b", T.NO),
        (NSE, "c", "b", "c", T.YES_NO),
        (NSE, "c", "c", "d", T.YES_NO),
        (NSE, "c", "b", "d", T.YES_NO),
        (NSE, "c", "c", "c", T.YES_NO),
        # testLessThanWithNullInStats
        ("less_than", "c", "d", "e", T.NO_NULL),
        ("less_than", "c", "a", "b", T.YES_NULL),
        ("less_than", "c", "b", "c", T.YES_NO_NULL),
        ("less_than", "c", "c", "d", T.NO_NULL),
        ("less_than", "c", "b", "d", T.YES_NO_NULL),
        ("less_than", "c", "c", "c", T.NO_NULL),
        # testLessThanEqualsWithNullInStats
        ("less_than_equals", "c", "d", "e", T.NO_NULL),
        ("less_than_equals", "c", "a", "b", T.YES_NULL),
        ("less_than_equals", "c", "b", "c", T.YES_NULL),
        ("less_than_equals", "c", "c", "d", T.YES_NO_NULL),
        ("less_than_equals", "c", "b", "d", T.YES_NO_NULL),
        ("less_than_equals", "c", "c", "c", T.YES_NO_NULL),
        # testInWithNullInStats
        ("in", ["c", "f"], "d", "e", T.NO_NULL),
        ("in", ["c", "f"], "a", "b", T.NO_NULL),
        ("in", ["c", "f"], "e", "f", T.YES_NO_NULL),
        ("in", ["c", "f"], "c", "d", T.YES_NO_NULL),
        ("in", ["c", "f"], "b", "d", T.YES_NO_NULL),
        ("in", ["c", "f"], "c", "c", T.YES_NULL),
        # testBetweenWithNullInStats
        ("between", ("c", "f"), "d", "e", T.YES_NULL),
        ("between", ("c", "f"), "e", "f", T.YES_NULL),
        ("between", ("c", "f"), "h", "g", T.NO_NULL),
        ("between", ("c", "f"), "f", "g", T.YES_NO_NULL),
        ("between", ("c", "f"), "e", "g", T.YES_NO_NULL),
        ("between", ("c", "f"), "c", "e", T.YES_NULL),
        ("between", ("c", "f"), "c", "f", T.YES_NULL),
        ("between", ("c", "f"), "c", "g", T.YES_NO_NULL),
        ("between", ("c", "f"), "a", "b", T.NO_NULL),
        ("between", ("c", "f"), "a", "c", T.YES_NO_NULL),
        ("between", ("c", "f"), "b", "d", T.YES_NO_NULL),
        ("between", ("c", "f"), "c", "c", T.YES_NULL),
    ],
)
def test_operator_truth_tables_string(op, lit, mn, mx, expected):
    assert evaluate_leaf(op, lit, _stats(mn, mx)) == expected
    pt = "string"
    assert evaluate_predicate_typed(op, pt, lit, _stats(mn, mx)) == expected


def test_is_null_with_null_in_stats():
    # testIsNullWithNullInStats
    assert evaluate_leaf("is_null", None, _stats("c", "d", has_null=True)) == T.YES_NO
    assert evaluate_leaf("is_null", None, _stats("c", "d", has_null=False)) == T.NO


# ---------------------------------------------------------------------------
# The SargApplier catch-fallback (RecordReaderImpl.java:852-874):
# YES_NO iff NULL_SAFE_EQUALS or hasNull EXPLICITLY present-and-false
# ---------------------------------------------------------------------------

_CASTFAIL = (_INT["min"], _INT["max"], "date", _day(15))  # Long->DATE always raises


@pytest.mark.parametrize(
    "op,stats,expected",
    [
        pytest.param("equals", _stats(10, 100, has_null=False), T.YES_NO, id="equals/no-null-explicit"),
        pytest.param("equals", _stats(10, 100, has_null=True), T.YES_NO_NULL, id="equals/has-null"),
        # hasHasNull() && !getHasNull(): a MISSING key is NOT no-null
        pytest.param("equals", {"min": 10, "max": 100}, T.YES_NO_NULL, id="equals/has-null-key-missing"),
        pytest.param("equals", {"min": 10, "max": 100, "has_null": None}, T.YES_NO_NULL, id="equals/has-null-none"),
        pytest.param(NSE, _stats(10, 100, has_null=True), T.YES_NO, id="nse/always-yes-no"),
        pytest.param("less_than", _stats(10, 100, has_null=False), T.YES_NO, id="lt/no-null-explicit"),
        pytest.param("in", _stats(10, 100, has_null=True), T.YES_NO_NULL, id="in/has-null"),
    ],
)
def test_cast_failure_fallback_split(op, stats, expected):
    lit = [_day(15)] if op == "in" else _day(15)
    assert evaluate_leaf_typed(op, "date", lit, stats) == expected


def test_lazy_in_between_coercion_matches_reference_loop_order():
    """The reference coerces IN/BETWEEN list elements one at a time
    and early-returns; a malformed later element must not poison a
    leaf an earlier element already decided."""
    # IN: first element matches the point range -> YES_NULL before the
    # malformed second element is ever coerced
    assert (
        evaluate_predicate_typed("in", "long", [20, "xx"], _stats(20, 20)) == T.YES_NULL
    )
    # IN on a spread range: first in-range element decides
    assert (
        evaluate_predicate_typed("in", "long", [15, "xx"], _stats(10, 100))
        == T.YES_NO_NULL
    )
    # BETWEEN: lo AFTER the range decides NO without coercing hi
    assert (
        evaluate_predicate_typed("between", "long", (200, "xx"), _stats(10, 100))
        == T.NO_NULL
    )
    # but a malformed element that IS reached still falls back one layer up
    assert (
        evaluate_leaf_typed("in", "long", ["xx", 15], _stats(10, 100, has_null=False))
        == T.YES_NO
    )


# ---------------------------------------------------------------------------
# Wired end-to-end: the typed kernel is the front-end of the real
# pick_row_groups path on real ORC files
# ---------------------------------------------------------------------------


def _one_part_file(d):
    return os.path.join(str(d), [f for f in os.listdir(d) if f.startswith("part")][0])


@pytest.fixture(scope="module")
def typed_file(spark, tmp_path_factory):
    """A key-sorted single-stripe file with long + string + date +
    timestamp columns, 5 row groups of 10k."""
    import pyspark.sql.functions as F

    from orc_release_hdp_2_6_5_99_1_tag_spark.sources.orc_io import write_orc

    d = tmp_path_factory.mktemp("typed") / "t"
    df = spark.range(50_000).select(
        F.col("id").alias("k"),
        F.format_string("s%07d", F.col("id")).alias("s"),
        F.date_add(F.lit("2020-01-01").cast("date"), (F.col("id") / 100).cast("int")).alias("d"),
        (F.lit("2021-01-01 00:00:00").cast("timestamp")
         + F.make_interval(secs=F.col("id"))).alias("ts"),
    )
    write_orc(df.coalesce(1).sortWithinPartitions("k"), str(d))
    return _one_part_file(d)


def test_pick_row_groups_typed_long_predicate(typed_file):
    picks = T.pick_row_groups(typed_file, ("equals", "k", 34_567), use_bloom=False)
    kept = [x["row_group"] for x in picks[0] if x["keep"]]
    assert kept == [3]


def test_pick_row_groups_date_domain(typed_file):
    """date literal vs DateStatistics epoch-days: stats_to_domain +
    date-type coercion must prune on the real wire values."""
    lit = dt.date(2020, 1, 1) + dt.timedelta(days=250)  # rows 25_000..25_099
    picks = T.pick_row_groups(typed_file, ("equals", "d", lit), use_bloom=False)
    kept = [x["row_group"] for x in picks[0] if x["keep"]]
    assert kept == [2]


def test_pick_row_groups_timestamp_domain(typed_file):
    """timestamp literal vs TimestampStatistics UTC millis (ORC-135
    writer): prunes to the single 10k-second row group. The probe is
    derived from the file's own parsed minimumUtc so the test holds
    under any session time zone."""
    from orc_release_hdp_2_6_5_99_1_tag_spark.sources.footer_tail import (
        parse_row_index,
        parse_tail_of_file,
    )

    meta = parse_tail_of_file(typed_file)
    ids = {c["name"]: c["col_id"] for c in meta["columns"]}
    entry = parse_row_index(typed_file, ids["ts"])[0][4]["typed"]
    lit = dt.datetime(1970, 1, 1) + dt.timedelta(milliseconds=entry["min_utc"] + 1000)
    picks = T.pick_row_groups(typed_file, ("equals", "ts", lit), use_bloom=False)
    kept = [x["row_group"] for x in picks[0] if x["keep"]]
    assert kept == [4]


def test_pick_row_groups_cast_failure_keeps_everything(typed_file):
    """A DATE-typed predicate over the LONG column raises Long->DATE
    inside every row group; the SargApplier fallback must keep ALL
    groups (PPD disabled, never a wrong skip)."""
    picks = T.pick_row_groups(
        typed_file, ("equals", "k", dt.date(2020, 1, 1), "date"), use_bloom=False
    )
    assert all(x["keep"] for x in picks[0])
    assert all(x["truth"] == T.YES_NO for x in picks[0])  # k has no nulls, explicit


def test_pick_row_groups_string_domain_semantics(typed_file):
    """A STRING-typed predicate over the LONG column compares in the
    string domain exactly as the reference does (stats coerce to the
    predicate's type): '15000' finds only the lexical matches."""
    picks = T.pick_row_groups(typed_file, ("equals", "k", "15000", "string"), use_bloom=False)
    kept = [x["row_group"] for x in picks[0] if x["keep"]]
    # group 1 holds 10000..19999 -> strings "10000".."19999"; "15000"
    # is lexically inside. Group 0 ["0".."9999"] also contains it
    # lexically ("15000" > "0", < "9999"), group 2+ ["20000"...] do not.
    assert 1 in kept and 2 not in kept and 3 not in kept and 4 not in kept


def test_typed_bloom_probes_prune_absent_keys(spark, tmp_path):
    """The writer encodes bloom entries per type (WriterImpl:
    timestamps as UTC millis addLong, dates as epoch-day addLong,
    decimals as trailing-zero-stripped addString); might_contain must
    probe with the SAME encodings so an in-range-but-absent
    timestamp/date/decimal key is eliminated by the bloom where
    min/max alone says maybe — and a present key is always kept."""
    import pyspark.sql.functions as F

    from orc_release_hdp_2_6_5_99_1_tag_spark.sources.footer_tail import (
        parse_row_index,
        parse_tail_of_file,
    )
    from orc_release_hdp_2_6_5_99_1_tag_spark.sources.orc_io import write_orc

    n = 20_000
    # even-keyed rows only: odd keys are in-range but absent everywhere
    df = spark.range(n).select(
        (F.col("id") * 2).alias("k"),
        F.date_add(F.lit("2020-01-01").cast("date"), (F.col("id") * 2).cast("int")).alias("d"),
        (F.col("id") * 2).cast("decimal(12,2)").alias("m"),
    )
    dest = str(tmp_path / "tb")
    write_orc(
        df.coalesce(1).sortWithinPartitions("k"), dest, bloom_filter_columns="k,d,m"
    )
    path = os.path.join(dest, [f for f in os.listdir(dest) if f.startswith("part")][0])

    # timestamp column needs its own file: build from the date file's
    # keys so present/absent probes are known
    def kept(tree, use_bloom):
        picks = T.pick_row_groups(path, tree, use_bloom=use_bloom)
        return sum(x["keep"] for st in picks for x in st)

    for col, present, absent in [
        ("k", 2_468, 2_469),
        ("d", dt.date(2020, 1, 1) + dt.timedelta(days=2_468),
              dt.date(2020, 1, 1) + dt.timedelta(days=2_469)),
        ("m", Decimal("2468.00"), Decimal("2469.00")),
    ]:
        assert kept(("equals", col, present), True) >= 1, f"{col}: present key kept"
        assert kept(("equals", col, absent), False) >= 1, f"{col}: min/max alone keeps"
        assert kept(("equals", col, absent), True) == 0, (
            f"{col}: bloom must eliminate the absent key"
        )


def test_timestamp_bloom_probe_utc_millis(spark, tmp_path):
    """Timestamp blooms carry addLong(utcMillis); a datetime literal
    probes with the same floor-to-millis encoding."""
    import pyspark.sql.functions as F

    from orc_release_hdp_2_6_5_99_1_tag_spark.sources.orc_io import write_orc

    prev = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    try:
        df = spark.range(20_000).select(
            F.col("id").alias("k"),
            (F.lit("2021-01-01 00:00:00").cast("timestamp")
             + F.make_interval(secs=(F.col("id") * 2))).alias("ts"),
        )
        dest = str(tmp_path / "tsb")
        write_orc(
            df.coalesce(1).sortWithinPartitions("k"), dest, bloom_filter_columns="ts"
        )
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)
    path = os.path.join(dest, [f for f in os.listdir(dest) if f.startswith("part")][0])

    present = dt.datetime(2021, 1, 1) + dt.timedelta(seconds=2_468)
    absent = dt.datetime(2021, 1, 1) + dt.timedelta(seconds=2_469)  # odd: never written

    def kept(lit, use_bloom):
        picks = T.pick_row_groups(path, ("equals", "ts", lit), use_bloom=use_bloom)
        return sum(x["keep"] for st in picks for x in st)

    assert kept(present, True) >= 1
    assert kept(absent, False) >= 1
    assert kept(absent, True) == 0


# ---------------------------------------------------------------------------
# SargApplier.pickRowGroups parity, TestRecordReaderImpl:1961-2052 —
# the AND-composed include decisions over per-row-group stats,
# including the cast-failure scenario (exceptionAnswer semantics)
# ---------------------------------------------------------------------------


def _pick(tree, groups):
    """The include decision per row group from per-column stats — the
    stats-level core of SargApplier.pickRowGroups."""
    return [
        T.keeps_unit(T.evaluate_tree(tree, g, col_types={"x": "int", "y": "int"}))
        for g in groups
    ]


def test_pick_row_groups_reference_scenario():
    """testPickRowGroups: sarg (x = 100 AND y = 10) over four row
    groups; only the group where BOTH ranges can match stays."""
    groups = [
        {"x": _stats(0, 10), "y": _stats(0, 9)},
        {"x": _stats(100, 200), "y": _stats(11, 20)},
        {"x": _stats(300, 500), "y": _stats(10, 10)},
        {"x": _stats(100, 100), "y": _stats(0, 100)},
    ]
    tree = ("and", ("equals", "x", 100), ("equals", "y", 10))
    assert _pick(tree, groups) == [False, False, False, True]


def test_pick_row_groups_error_reference_scenario():
    """testPickRowGroupsError: the x leaf is a DATE predicate over
    LONG stats — every evaluation throws SargCastException, the
    fallback answers YES_NO_NULL (stats carry hasNull), and the
    decision degrades gracefully to y alone."""
    groups = [
        {"x": _stats(0, 10), "y": _stats(0, 9)},
        {"x": _stats(10, 20), "y": _stats(10, 20)},
        {"x": _stats(20, 30), "y": _stats(0, 30)},
    ]
    tree = (
        "and",
        ("equals", "x", dt.date(2017, 1, 2), "date"),  # Long->DATE: always throws
        ("equals", "y", 10),
    )
    assert _pick(tree, groups) == [False, True, True]
    # the leaf itself lands on the exceptionAnswer, not a wrong NO
    assert (
        evaluate_leaf_typed("equals", "date", dt.date(2017, 1, 2), _stats(0, 10))
        == T.YES_NO_NULL
    )


_GOLDEN_1900 = "/root/reference/examples/TestOrcFile.testDate1900.orc"


@pytest.mark.skipif(not os.path.exists(_GOLDEN_1900), reason="golden absent")
def test_pre_orc135_golden_disables_timestamp_ppd():
    """The ORC-135 writer gate read off a REAL pre-135 file: the
    reference golden testDate1900.orc was written by writerVersion 1
    (HIVE_8732 — local-timezone timestamp stats), so every timestamp
    predicate must answer YES_NO_NULL and keep every row group; a
    DATE predicate on the date column stays fully functional."""
    from orc_release_hdp_2_6_5_99_1_tag_spark.sources.footer_tail import (
        parse_tail_of_file,
    )

    meta = parse_tail_of_file(_GOLDEN_1900)
    assert meta["writer_version"] < 6
    picks = T.pick_row_groups(
        _GOLDEN_1900,
        ("less_than", "time", dt.datetime(1, 1, 1), "timestamp"),
        use_bloom=False,
    )
    flat = [x for st in picks for x in st]
    assert flat and all(x["keep"] for x in flat), (
        "pre-ORC-135 timestamp stats are local-tz and must not prune"
    )
    assert all(x["truth"] == T.YES_NO_NULL for x in flat)


def test_spark_written_files_report_orc135(typed_file):
    from orc_release_hdp_2_6_5_99_1_tag_spark.sources.footer_tail import (
        parse_tail_of_file,
    )

    assert parse_tail_of_file(typed_file)["writer_version"] >= 6


# ---------------------------------------------------------------------------
# Evolved-PPD safety rule (SchemaEvolution.validatePPDConversion,
# SchemaEvolution.java:253-310) — the third PPD gate, now a kernel
# function wired into evaluate_leaf_typed's reader_type path
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "file_type,reader_type,safe",
    [
        # identical primitive categories are safe
        ("int", "int", True), ("string", "string", True),
        ("double", "double", True), ("timestamp", "timestamp", True),
        # integer widening chain byte -> short -> int -> long
        ("tinyint", "smallint", True), ("tinyint", "int", True),
        ("tinyint", "bigint", True), ("smallint", "int", True),
        ("smallint", "bigint", True), ("int", "bigint", True),
        # narrowing is NOT safe
        ("bigint", "int", False), ("int", "smallint", False),
        # float -> double is explicitly NOT safe (floats index as
        # doubles but filter literals parse at different precision)
        ("float", "double", False), ("double", "float", False),
        # string <-> varchar safe; anything with char is NOT (padded)
        ("string", "varchar", True), ("varchar", "string", True),
        ("string", "char", False), ("char", "string", False),
        ("char", "varchar", False), ("varchar", "char", False),
        # cross-family conversions never safe
        ("int", "string", False), ("string", "bigint", False),
        ("date", "timestamp", False),
        # added column (no file type)
        (None, "int", False),
    ],
)
def test_ppd_safe_conversion_rule(file_type, reader_type, safe):
    assert T.is_ppd_safe_conversion(file_type, reader_type) is safe


def test_unsafe_evolution_disables_leaf_without_touching_stats():
    """pickRowGroups' isPPDSafeConversion else-branch: an unsafe
    file->reader conversion answers YES_NO_NULL unconditionally —
    even when the stats would prove NO under the naive comparison
    (exactly the wrong skip the gate exists to prevent)."""
    stats = _stats(10.0, 100.0, has_null=False)  # float file column
    assert (
        evaluate_leaf_typed(
            "equals", "float", 500.0, stats,
            column_type="float", reader_type="double",
        )
        == T.YES_NO_NULL
    )
    # same stats, no evolution: the range proves NO
    assert (
        evaluate_leaf_typed("equals", "float", 500.0, stats, column_type="float")
        == T.NO
    )
    # safe widening still evaluates normally
    assert (
        evaluate_leaf_typed(
            "equals", "long", 500, _stats(10, 100, has_null=False),
            column_type="int", reader_type="bigint",
        )
        == T.NO
    )
