"""Stats-level predicate TruthValue evaluation — the decision kernel
of the reference's row-group/stripe pruning (`RecordReaderImpl.java`
`evaluatePredicateProto`/`pickRowGroups`, truth algebra
`TruthValue.java`): given a column's min/max/hasNull statistics and a
SearchArgument leaf, decide one of the seven TruthValues (YES, NO,
NULL, YES_NO, YES_NULL, NO_NULL, YES_NO_NULL), fold through the
AND/OR/NOT algebra, and keep the unit (row group, stripe, file) only
if a TRUE outcome is possible.

This is the *predictive* half of PPD: `sources/footer_tail` parses the
real statistics out of ORC files, this module says which units a
predicate will skip, and the tests pin the prediction against ground
truth computed from the actual rows (a wrong NO here is a wrong query
answer, not a performance bug).

Semantics ported from public behavior, not code. Each TruthValue IS
the set of per-row outcomes possible in the unit ({true}, {false},
{null}, and their unions); the AND/OR/NOT tables are derived by
applying Kleene three-valued logic elementwise over those sets —
which is exactly how the reference's hand-written tables behave.
"""

from __future__ import annotations

from typing import Any

YES = "YES"                 # {true}
NO = "NO"                   # {false}
NULL = "NULL"               # {null}
YES_NO = "YES_NO"           # {true, false}
YES_NULL = "YES_NULL"       # {true, null}
NO_NULL = "NO_NULL"         # {false, null}
YES_NO_NULL = "YES_NO_NULL" # {true, false, null}

_TO_SET = {
    YES: frozenset("t"),
    NO: frozenset("f"),
    NULL: frozenset("n"),
    YES_NO: frozenset("tf"),
    YES_NULL: frozenset("tn"),
    NO_NULL: frozenset("fn"),
    YES_NO_NULL: frozenset("tfn"),
}
_FROM_SET = {v: k for k, v in _TO_SET.items()}

# Kleene three-valued logic on single outcomes
_AND3 = {
    ("t", "t"): "t", ("t", "f"): "f", ("t", "n"): "n",
    ("f", "t"): "f", ("f", "f"): "f", ("f", "n"): "f",
    ("n", "t"): "n", ("n", "f"): "f", ("n", "n"): "n",
}
_OR3 = {
    ("t", "t"): "t", ("t", "f"): "t", ("t", "n"): "t",
    ("f", "t"): "t", ("f", "f"): "f", ("f", "n"): "n",
    ("n", "t"): "t", ("n", "f"): "n", ("n", "n"): "n",
}
_NOT3 = {"t": "f", "f": "t", "n": "n"}


def _combine(table, a: str, b: str) -> str:
    outcomes = frozenset(
        table[(x, y)] for x in _TO_SET[a] for y in _TO_SET[b]
    )
    return _FROM_SET[outcomes]


def and_(a: str, b: str) -> str:
    """AND truth table (reference `TruthValue.and()`), derived as the
    elementwise Kleene AND over the outcome sets."""
    return _combine(_AND3, a, b)


def or_(a: str, b: str) -> str:
    """OR truth table (reference `TruthValue.or()`)."""
    return _combine(_OR3, a, b)


def not_(tv: str) -> str:
    """NOT truth table (reference `TruthValue.not()`)."""
    return _FROM_SET[frozenset(_NOT3[x] for x in _TO_SET[tv])]


def _lift_null(tv: str) -> str:
    """A unit containing nulls can never be a plain YES/NO for a
    comparison leaf: null rows evaluate to NULL under three-valued
    logic, so the null outcome joins the set."""
    return _FROM_SET[_TO_SET[tv] | frozenset("n")]


def evaluate_leaf(op: str, literal: Any, stats: dict) -> str:
    """TruthValue of one SARG leaf against {min, max, has_null,
    n_values} column statistics. `literal` is a scalar, a (lo, hi)
    tuple for BETWEEN, or a list for IN. Missing min/max with
    has_null means every row in the unit is null."""
    mn, mx = stats.get("min"), stats.get("max")
    has_null = bool(stats.get("has_null"))
    empty = mn is None and mx is None  # no non-null values in the unit

    if op == "is_null":
        if not has_null:
            return NO
        if empty:
            return YES
        return YES_NO

    if empty:
        # every row is null: any comparison is NULL for every row
        return NULL

    if op == "null_safe_equals":
        # <=> never yields NULL: null rows compare FALSE to a non-null
        # literal, so the null lift adds a FALSE outcome, not a NULL one
        if mn == mx == literal:
            return YES_NO if has_null else YES
        if literal < mn or literal > mx:
            return NO
        return YES_NO

    if op == "equals":
        if mn == mx == literal:
            tv = YES
        elif literal < mn or literal > mx:
            tv = NO
        else:
            tv = YES_NO
    elif op == "less_than":
        if mx < literal:
            tv = YES
        elif mn >= literal:
            tv = NO
        else:
            tv = YES_NO
    elif op == "less_than_equals":
        if mx <= literal:
            tv = YES
        elif mn > literal:
            tv = NO
        else:
            tv = YES_NO
    elif op == "in":
        values = list(literal)
        if all(v < mn or v > mx for v in values):
            tv = NO
        elif mn == mx and mn in values:
            tv = YES
        else:
            tv = YES_NO
    elif op == "between":
        lo, hi = literal
        if lo <= mn and mx <= hi:
            tv = YES
        elif hi < mn or lo > mx:
            tv = NO
        else:
            tv = YES_NO
    else:
        raise ValueError(f"unknown SARG leaf op: {op}")

    return _lift_null(tv) if has_null else tv


def evaluate_tree(
    tree: Any, stats_by_col: dict[str, dict], blooms: dict[str, dict] | None = None
) -> str:
    """Evaluate a predicate tree over per-column stats. Tree grammar:
    ("and"|"or", child, child, ...), ("not", child), or a leaf
    ("op", column, literal). With `blooms` ({column: bloom}), each
    equality-class leaf is refined through the column's bloom filter
    the way `checkInBloomFilter` does."""
    head = tree[0]
    if head == "and":
        tv = evaluate_tree(tree[1], stats_by_col, blooms)
        for child in tree[2:]:
            tv = and_(tv, evaluate_tree(child, stats_by_col, blooms))
        return tv
    if head == "or":
        tv = evaluate_tree(tree[1], stats_by_col, blooms)
        for child in tree[2:]:
            tv = or_(tv, evaluate_tree(child, stats_by_col, blooms))
        return tv
    if head == "not":
        return not_(evaluate_tree(tree[1], stats_by_col, blooms))
    op, column, literal = tree
    tv = evaluate_leaf(op, literal, stats_by_col[column])
    if blooms and column in blooms:
        tv = refine_with_bloom(tv, op, literal, blooms[column])
    return tv


def refine_with_bloom(tv: str, op: str, literal: Any, bloom: dict) -> str:
    """The reference's `checkInBloomFilter` refinement: when the
    min/max range can only say MAYBE for an equality-class leaf, a
    negative bloom probe proves NO (no false negatives by
    construction); a positive probe proves nothing (false positives
    exist by design). Only YES_NO / YES_NO_NULL are refinable — a
    range YES means min==max==literal (present regardless of what the
    bloom says), and NULL/NO states can't gain a true outcome."""
    if op not in ("equals", "null_safe_equals", "in"):
        return tv
    if tv not in (YES_NO, YES_NO_NULL):
        return tv
    from orc_release_hdp_2_6_5_99_1_tag_spark.sources.bloom import might_contain

    values = list(literal) if op == "in" else [literal]
    if any(might_contain(bloom, v) for v in values):
        return tv
    return NO if tv == YES_NO else NO_NULL


def keeps_unit(tv: str) -> bool:
    """pickRowGroups' include decision (`TruthValue.isNeeded()`): read
    the unit iff a TRUE outcome is possible."""
    return "t" in _TO_SET[tv]


def explain_file_pruning(path: str, tree: Any) -> list[dict]:
    """Tool-side pruning explanation: parse a real ORC file's
    per-stripe statistics (ranged metadata reads only) and report each
    stripe's TruthValue + keep/skip decision for the predicate tree —
    what the reference computes inside pickRowGroups, surfaced the way
    `orc-tools scan` users need it. Column stats come from the
    Metadata section (StripeStatistics) via footer_tail."""
    from orc_release_hdp_2_6_5_99_1_tag_spark.sources.footer_tail import (
        parse_tail_of_file,
    )

    meta = parse_tail_of_file(path, include_stripe_stats=True)
    names = [c["name"] for c in meta["columns"]]
    ids = {c["name"]: c["col_id"] for c in meta["columns"]}
    out = []
    for i, per_col in enumerate(meta.get("stripe_stats", [])):
        stats_by_col = {}
        for name in names:
            s = per_col[ids[name]]
            typed = s.get("typed") or {}
            stats_by_col[name] = {
                "min": typed.get("min"),
                "max": typed.get("max"),
                "has_null": s.get("has_null"),
                "n_values": s.get("n_values"),
            }
        tv = evaluate_tree(tree, stats_by_col)
        out.append({"stripe": i, "truth": tv, "keep": keeps_unit(tv)})
    return out


def _tree_columns(tree: Any) -> set[str]:
    head = tree[0]
    if head in ("and", "or", "not"):
        out: set[str] = set()
        for child in tree[1:]:
            out |= _tree_columns(child)
        return out
    return {tree[1]}


def pick_row_groups(path: str, tree: Any, use_bloom: bool = True) -> list[list[dict]]:
    """The reference's `pickRowGroups`, end to end, from ranged
    metadata reads of a real ORC file: per stripe, each 10k-row
    row group's TruthValue (ROW_INDEX per-row-group min/max/hasNull
    via footer_tail, refined through the row group's bloom filter
    when present and `use_bloom`) and the keep/skip decision. Returns
    [[{row_group, truth, keep}, ...] per stripe]."""
    from orc_release_hdp_2_6_5_99_1_tag_spark.sources.bloom import parse_bloom_index
    from orc_release_hdp_2_6_5_99_1_tag_spark.sources.footer_tail import (
        parse_row_index,
        parse_tail_of_file,
    )

    meta = parse_tail_of_file(path)
    ids = {c["name"]: c["col_id"] for c in meta["columns"]}
    cols = sorted(_tree_columns(tree))
    row_index = {c: parse_row_index(path, ids[c]) for c in cols}
    blooms = (
        {c: parse_bloom_index(path, ids[c]) for c in cols} if use_bloom else {}
    )
    n_stripes = len(next(iter(row_index.values())))
    out: list[list[dict]] = []
    for si in range(n_stripes):
        n_rg = len(row_index[cols[0]][si])
        decisions = []
        for g in range(n_rg):
            stats_by_col = {}
            rg_blooms = {}
            for c in cols:
                e = row_index[c][si][g]
                typed = e.get("typed") or {}
                stats_by_col[c] = {
                    "min": typed.get("min"),
                    "max": typed.get("max"),
                    "has_null": e.get("has_null"),
                    "n_values": e.get("n_values"),
                }
                per_stripe = blooms.get(c, [])
                if per_stripe and si < len(per_stripe) and g < len(per_stripe[si]):
                    rg_blooms[c] = per_stripe[si][g]
            tv = evaluate_tree(tree, stats_by_col, rg_blooms or None)
            decisions.append({"row_group": g, "truth": tv, "keep": keeps_unit(tv)})
        out.append(decisions)
    return out


# ---------------------------------------------------------------------------
# Predicate-vs-stats type coercion (reference getBaseObjectForComparison,
# RecordReaderImpl.java:661-762) and its SargCastException fallback
# (pickRowGroups catch block, RecordReaderImpl.java:852-874)
# ---------------------------------------------------------------------------


class SargCastError(ValueError):
    """Python twin of RecordReaderImpl.SargCastException: the stats or
    literal value cannot be converted to the predicate's comparison
    domain (e.g. Long -> DATE: days/seconds/millis ambiguity)."""


def coerce_for_comparison(pred_type: str, obj: Any) -> Any:
    """Coerce a stats bound or literal to the PREDICATE's type — the
    reference converts both sides to `predicate.getType()` before the
    min/max comparison (`getBaseObjectForComparison`). Value tags
    mirror the Java classes: bool=Boolean, int=Long, float=Double,
    str=String, datetime.date=Date, datetime.datetime=Timestamp,
    Decimal=HiveDecimal.

    Raises SargCastError exactly where the reference throws
    SargCastException; conversions the reference attempts but that can
    fail on malformed input (Long.valueOf("15.1"), Date.valueOf("x"))
    raise ValueError, which the reference catches with the same
    PPD-disabling fallback (evaluate_leaf_typed below)."""
    import datetime as _dt
    from decimal import Decimal as _Dec

    if obj is None:
        return None
    is_ts = isinstance(obj, _dt.datetime)
    is_date = isinstance(obj, _dt.date) and not is_ts
    if pred_type == "boolean":
        if isinstance(obj, bool):
            return obj
        # Boolean.valueOf: only the string "true" is true
        return str(obj).lower() == "true"
    if pred_type == "date":
        if is_date:
            return obj
        if isinstance(obj, str):
            return _dt.date.fromisoformat(obj)  # Date.valueOf, may raise
        if is_ts:
            return obj.date()  # DateWritable.timeToDate
        raise SargCastError(f"could not convert from {type(obj).__name__} to DATE")
    if pred_type == "decimal":
        if isinstance(obj, bool):
            return _Dec(1 if obj else 0)
        if isinstance(obj, int):
            return _Dec(obj)
        if isinstance(obj, (float, str)):
            return _Dec(str(obj))  # may raise on malformed strings
        if isinstance(obj, _Dec):
            return obj
        if is_ts:
            # TimestampUtils.getDouble: seconds with fractional part
            # (naive datetimes anchor to UTC so the result does not
            # depend on the host time zone)
            return _Dec(str(obj.replace(tzinfo=_dt.timezone.utc).timestamp()))
        raise SargCastError(f"could not convert from {type(obj).__name__} to DECIMAL")
    if pred_type == "float":  # Java FLOAT comparison domain is double
        if isinstance(obj, bool):
            raise SargCastError("could not convert from Boolean to FLOAT")
        if isinstance(obj, (int, float)):
            return float(obj)
        if isinstance(obj, _Dec):
            return float(obj)
        if isinstance(obj, str):
            return float(obj)  # Double.valueOf, may raise
        if is_ts:
            return obj.replace(tzinfo=_dt.timezone.utc).timestamp()
        raise SargCastError(f"could not convert from {type(obj).__name__} to FLOAT")
    if pred_type == "long":
        if isinstance(obj, bool):
            raise SargCastError("could not convert from Boolean to LONG")
        if isinstance(obj, (int, float)):
            return int(obj)  # Number.longValue(): truncating
        if isinstance(obj, _Dec):
            return int(obj)
        if isinstance(obj, str):
            # Long.valueOf: "15.1" is NOT a long (unlike float coercion)
            if not obj.lstrip("+-").isdigit():
                raise ValueError(f"malformed long literal {obj!r}")
            return int(obj)
        # Timestamp/Date -> LONG both fall through in the reference
        raise SargCastError(f"could not convert from {type(obj).__name__} to LONG")
    if pred_type == "string":
        if is_ts:
            # Java Timestamp.toString always renders a fractional part
            frac = f".{obj.microsecond:06d}".rstrip("0") if obj.microsecond else ".0"
            return f"{obj:%Y-%m-%d %H:%M:%S}{frac}"
        if isinstance(obj, _Dec):
            s = str(obj)
            if "." in s:
                s = s.rstrip("0").rstrip(".")
            return s or "0"
        if isinstance(obj, bool):
            return "true" if obj else "false"
        return str(obj)
    if pred_type == "timestamp":
        if is_ts:
            return obj
        if is_date:
            return _dt.datetime(obj.year, obj.month, obj.day)
        if isinstance(obj, float):
            # TimestampUtils.doubleToTimestamp: seconds (UTC-anchored
            # naive, the inverse of the FLOAT/DECIMAL coercions above)
            return _dt.datetime.fromtimestamp(obj, _dt.timezone.utc).replace(tzinfo=None)
        if isinstance(obj, _Dec):
            return _dt.datetime.fromtimestamp(float(obj), _dt.timezone.utc).replace(tzinfo=None)
        # int = Java Long (stats and SQL literals): the reference only
        # accepts Integer here (millis) and Long falls through — the
        # days/seconds/millis ambiguity documented at
        # RecordReaderImpl.java:748-752. Strings also fall through.
        raise SargCastError(
            f"could not convert from {type(obj).__name__} to TIMESTAMP"
        )
    raise ValueError(f"unknown predicate type {pred_type!r}")


def evaluate_leaf_typed(
    op: str,
    pred_type: str,
    literal: Any,
    stats: dict,
    *,
    column_type: str | None = None,
    writer_has_orc135: bool = True,
) -> str:
    """evaluate_leaf with the reference's full type front-end:

    - TIMESTAMP columns: PPD disabled (YES_NO_NULL) for pre-ORC-135
      writers and for predicate types other than TIMESTAMP/DATE/STRING
      (`evaluatePredicateProto`, RecordReaderImpl.java:408-422);
    - both stats bounds AND the literal coerce to the predicate type
      (`getBaseObjectForComparison`);
    - any conversion failure disables PPD for the leaf with the
      reference's fallback (RecordReaderImpl.java:866-872): YES_NO for
      NULL_SAFE_EQUALS or no-null stats, else YES_NO_NULL."""
    if column_type == "timestamp":
        if not writer_has_orc135:
            return YES_NO_NULL
        if pred_type not in ("timestamp", "date", "string"):
            return YES_NO_NULL
    mn, mx = stats.get("min"), stats.get("max")
    has_null = bool(stats.get("has_null"))
    if mn is None and mx is None:
        return evaluate_leaf(op, literal, stats)  # all-null / IS_NULL paths
    try:
        cstats = {
            "min": coerce_for_comparison(pred_type, mn),
            "max": coerce_for_comparison(pred_type, mx),
            "has_null": has_null,
        }
        if op == "in":
            clit: Any = [coerce_for_comparison(pred_type, v) for v in literal]
        elif op == "between":
            clit = tuple(coerce_for_comparison(pred_type, v) for v in literal)
        elif op == "is_null":
            clit = None
        else:
            clit = coerce_for_comparison(pred_type, literal)
    except (ValueError, ArithmeticError, OverflowError, OSError):
        # SargCastError is a ValueError; the reference catches every
        # exception class here with the same fallback
        return YES_NO if (op == "null_safe_equals" or not has_null) else YES_NO_NULL
    return evaluate_leaf(op, clit, cstats)
