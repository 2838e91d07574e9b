"""ORC uniontype<...> support (SURVEY §1.2: reference
`TreeReaderFactory.java:1865-1949` byte-tag stream + per-variant child
columns).

Spark has no union type; the engine's convention (documented in
SURVEY/FIXTURES) encodes `uniontype<T0,T1,...>` as
`struct<_tag: tinyint, f0: T0, f1: T1, ...>` with exactly one
non-null variant field matching `_tag` — the same physical layout ORC
itself uses (tag stream + sparse child columns), so ORC files written
by this engine round-trip the semantics."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column


def union_encode(tag: Column, *variants: Column) -> Column:
    """Build a tagged-union struct: variant i is non-null iff tag == i."""
    fields = [tag.cast("tinyint").alias("_tag")]
    for i, v in enumerate(variants):
        fields.append(F.when(tag.cast("int") == i, v).alias(f"f{i}"))
    return F.struct(*fields)


def union_tag(u: Column) -> Column:
    return u.getField("_tag")


def union_decode(u: Column, i: int) -> Column:
    """Variant accessor: value of field i when the tag selects it, else
    NULL (never leaks a stale sibling value)."""
    return F.when(u.getField("_tag").cast("int") == i, u.getField(f"f{i}"))
