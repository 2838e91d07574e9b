"""Custom stateful streaming operator via applyInPandasWithState —
the extension point for operators Structured Streaming lacks natively
(SURVEY §2.13 guidance: custom stateful ops as Pandas-UDF state
machines).

Demo operator: per-user running event count + running value sum,
maintained as explicit GroupState across micro-batches. With
availableNow + maxFilesPerTrigger the demo is deterministic; the final
state equals a batch groupBy (the oracle).
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupStateTimeout

from orc_release_hdp_2_6_5_99_1_tag_spark.streaming.ingest import _events_stream
from orc_release_hdp_2_6_5_99_1_tag_spark.tables import scratch_dir

_OUT_SCHEMA = "user_id bigint, n_events bigint, total_value_milli bigint"
_STATE_SCHEMA = "n bigint, v bigint"


def _make_update_fn():
    """Closure (cloudpickle-by-value: workers lack the repo on their
    import path). Value sums are kept in integer millis so state is
    exact and the oracle can reproduce it."""

    def update(key, pdfs, state):
        import numpy as np

        n, v = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            n += len(pdf)
            # floor(x*1000 + 0.5): identical double math to the oracle
            # (pandas .round would use half-even, DuckDB half-away)
            v += int(np.floor(pdf["value"].to_numpy() * 1000.0 + 0.5).sum())
        state.update((n, v))
        import pandas as pd

        yield pd.DataFrame({"user_id": [key[0]], "n_events": [n], "total_value_milli": [v]})

    return update


def r3_stateful_running_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stateful per-user running totals; returns the final state per
    user (last emitted row per key), which must equal the batch
    aggregate."""
    base = scratch_dir(sf_dir)
    name = "r3_state_" + os.path.basename(os.path.normpath(sf_dir)).replace(".", "_")
    stream = _events_stream(spark, sf_dir).select("user_id", "value")
    result = stream.groupBy("user_id").applyInPandasWithState(
        _make_update_fn(),
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    q = (
        result.writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    # update mode appends one row per key per batch: keep the final row
    latest = spark.table(name).groupBy("user_id").agg(
        F.max("n_events").alias("n_events"),
        F.max("total_value_milli").alias("total_value_milli"),
    )
    return latest.orderBy("user_id")


R3_ORACLE = """
SELECT user_id, COUNT(*) AS n_events,
       CAST(SUM(CAST(FLOOR(value * 1000.0 + 0.5) AS BIGINT)) AS BIGINT) AS total_value_milli
FROM events GROUP BY user_id ORDER BY user_id
"""
