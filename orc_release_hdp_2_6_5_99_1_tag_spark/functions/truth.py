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
