"""Skew-aware join helper (scale toolbox).

AQE's skew-join handling (`spark.sql.adaptive.skewJoin.enabled`, on in
the engine session) covers sort-merge joins at runtime; explicit key
salting is the declarative fallback for pathological producers (one
key holding a large fraction of rows — the 100 TB failure mode where a
single reducer receives a whole hot key).

`salted_join` replicates the (small) right side `salt` times and
scatters the left side's rows uniformly across the replicas, so the
hot key's rows spread over `salt` reducers. Semantics are identical to
an inner equi-join on `key`.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def salted_join(left: DataFrame, right: DataFrame, key: str, salt: int = 8) -> DataFrame:
    """Inner equi-join on `key` with `salt`-way hot-key spreading.
    `right` is replicated `salt` times (keep it the smaller side)."""
    lsalt = left.withColumn("_salt", (F.rand(seed=42) * salt).cast("int"))
    rsalt = right.withColumn("_salt", F.explode(F.array(*[F.lit(i) for i in range(salt)])))
    joined = lsalt.join(rsalt, [key, "_salt"])
    return joined.drop("_salt")
