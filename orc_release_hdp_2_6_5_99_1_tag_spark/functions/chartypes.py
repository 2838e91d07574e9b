"""char(n)/varchar(n) semantics (SURVEY §1.2: reference pads char to n
and truncates both to maxLength — `WriterImpl.java:1487,1582`,
default maxLength 256 `TypeDescription.java:48`).

Spark normalizes CharType/VarcharType to string on read, so the
length/pad semantics are applied explicitly with built-in functions
(JVM-side, codegen-friendly — no UDF)."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column


def as_char(col: Column, n: int) -> Column:
    """char(n): truncate to n, then right-pad with spaces to n."""
    return F.rpad(F.substring(col, 1, n), n, " ")


def as_varchar(col: Column, n: int) -> Column:
    """varchar(n): truncate to n, no padding."""
    return F.substring(col, 1, n)
