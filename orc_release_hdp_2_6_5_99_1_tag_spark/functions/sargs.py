"""SearchArgument builder — API-parity facade for reference users.

The reference's programmatic predicate interface is
`SearchArgumentFactory.newBuilder().startAnd()...end().build()` handed
to `Reader.Options.searchArgument(sarg, columns)` (reference
`Reader.java:211`, usage shape `TestVectorOrcFile.java:2262-2269`,
`TestRecordReaderImpl.java:1968`). A user switching to this engine
keeps the same builder calls; `build()` compiles the tree to ONE
Catalyst `Column`, which Spark pushes into the ORC/parquet scan the
same way the reference pushes the sarg into row-group selection —
`tests/test_sargs.py` plan-asserts the pushdown.

Semantics notes:
- three-valued logic matches the reference/SQL exactly (Spark's
  boolean operators are 3VL; `f7_composite_3vl` pins the truth table);
- `nullSafeEquals` maps to Catalyst `<=>` (the reference's
  NULL_SAFE_EQUALS leaf);
- the reference's `PredicateLeaf.Type` argument is accepted for
  signature compatibility and used only as an optional cast hint —
  Catalyst resolves types itself (`f8_predicate_coercion` pins the
  coercion matrix).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


class _Node:
    def __init__(self, op: str, parent: "_Node | None"):
        self.op = op  # "and" | "or" | "not"
        self.parent = parent
        self.children: list[Column] = []

    def compile(self) -> Column:
        if not self.children:
            raise ValueError(f"empty {self.op}() group in SearchArgument")
        if self.op == "not":
            if len(self.children) != 1:
                raise ValueError("startNot() group must contain exactly one child")
            return ~self.children[0]
        out = self.children[0]
        for c in self.children[1:]:
            out = (out & c) if self.op == "and" else (out | c)
        return out


class SearchArgumentBuilder:
    """Fluent builder mirroring the reference's SearchArgumentFactory.

    >>> sarg = (new_builder()
    ...         .start_and()
    ...         .start_not().less_than("l_orderkey", 300000).end()
    ...         .less_than("l_orderkey", 600000)
    ...         .end()
    ...         .build())
    >>> df.filter(sarg)

    camelCase aliases (startAnd, lessThanEquals, nullSafeEquals, isNull)
    are provided so reference code transliterates line-for-line.
    """

    def __init__(self) -> None:
        self._root = _Node("and", None)
        self._cur = self._root
        # columns named by point-lookup-ish leaves (equals /
        # nullSafeEquals / in_ / between) — the bloom-filter write
        # hint, mirroring the reference's pairing of
        # `orc.bloom.filter.columns` at write time with sarg evaluation
        # at read time (TestVectorOrcFile.java:2262-2269)
        self._bloom_cols: list[str] = []

    # -- group structure ------------------------------------------------
    def start_and(self) -> "SearchArgumentBuilder":
        return self._push("and")

    def start_or(self) -> "SearchArgumentBuilder":
        return self._push("or")

    def start_not(self) -> "SearchArgumentBuilder":
        return self._push("not")

    def end(self) -> "SearchArgumentBuilder":
        if self._cur.parent is None:
            raise ValueError("end() without a matching start*()")
        done = self._cur
        self._cur = done.parent
        self._cur.children.append(done.compile())
        return self

    def _push(self, op: str) -> "SearchArgumentBuilder":
        node = _Node(op, self._cur)
        self._cur = node
        return self

    # -- leaves (reference PredicateLeaf operators) ---------------------
    def equals(self, column: str, value, type=None) -> "SearchArgumentBuilder":
        self._bloom_cols.append(column)
        return self._leaf(F.col(column) == self._lit(value, type))

    def null_safe_equals(self, column: str, value, type=None) -> "SearchArgumentBuilder":
        self._bloom_cols.append(column)
        return self._leaf(F.col(column).eqNullSafe(self._lit(value, type)))

    def less_than(self, column: str, value, type=None) -> "SearchArgumentBuilder":
        return self._leaf(F.col(column) < self._lit(value, type))

    def less_than_equals(self, column: str, value, type=None) -> "SearchArgumentBuilder":
        return self._leaf(F.col(column) <= self._lit(value, type))

    def in_(self, column: str, *values, type=None) -> "SearchArgumentBuilder":
        # literals go through the same typed-cast path as the other
        # leaves (the type hint was previously accepted but ignored)
        self._bloom_cols.append(column)
        return self._leaf(F.col(column).isin(*[self._lit(v, type) for v in values]))

    def between(self, column: str, lower, upper, type=None) -> "SearchArgumentBuilder":
        self._bloom_cols.append(column)
        return self._leaf(F.col(column).between(self._lit(lower, type), self._lit(upper, type)))

    def is_null(self, column: str, type=None) -> "SearchArgumentBuilder":
        return self._leaf(F.col(column).isNull())

    def literal(self, condition: Column) -> "SearchArgumentBuilder":
        """Escape hatch: append a prebuilt Column predicate."""
        return self._leaf(condition)

    def _leaf(self, cond: Column) -> "SearchArgumentBuilder":
        self._cur.children.append(cond)
        return self

    @staticmethod
    def _lit(value, type):
        lit = F.lit(value)
        return lit.cast(type) if type else lit

    # -- reference camelCase aliases ------------------------------------
    startAnd = start_and
    startOr = start_or
    startNot = start_not
    nullSafeEquals = null_safe_equals
    lessThan = less_than
    lessThanEquals = less_than_equals
    isNull = is_null

    def build(self) -> Column:
        if self._cur is not self._root:
            raise ValueError("build() with unclosed start*() group")
        return self._root.compile()

    # -- write-side bloom hints -----------------------------------------
    def bloom_filter_columns(self) -> str:
        """Comma-joined columns this sarg point-looks-up (equals /
        nullSafeEquals / in_ / between leaves) — pass to
        `write_orc(..., bloom_filter_columns=...)` so the files carry
        bloom indexes for exactly the predicates that will probe them
        (ORC consults blooms for point ops; a hint on a range-only
        column is harmless)."""
        return ",".join(sorted(set(self._bloom_cols)))

    def write_options(self) -> dict[str, str]:
        """The same hint as raw ORC writer options."""
        cols = self.bloom_filter_columns()
        return {"orc.bloom.filter.columns": cols} if cols else {}


def new_builder() -> SearchArgumentBuilder:
    """`SearchArgumentFactory.newBuilder()` analog."""
    return SearchArgumentBuilder()


def scan_with_sarg(
    reader_df: DataFrame, include: list[str] | None, sarg: Column
) -> DataFrame:
    """`Reader.rows(options.include(...).searchArgument(...))` analog:
    projection + predicate expressed declaratively so Catalyst pushes
    BOTH into the file scan (ReadSchema pruning + PushedFilters)."""
    out = reader_df.filter(sarg)
    if include:
        out = out.select(*include)
    return out
