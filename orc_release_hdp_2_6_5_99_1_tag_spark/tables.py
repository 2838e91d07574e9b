"""Table loading for the driver's TPC-H-ish parquet testdata.

At 100 TB these reads become partitioned scans over object storage; the
API stays `spark.read.parquet(dir)` — Spark's FileSourceStrategy plans
stripe/row-group-aligned splits exactly like the reference's
`Reader.Options.range` split model (reference
`RecordReaderImpl.java:220-255`).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        # events.ts is parquet TIMESTAMP(NANOS) which Spark's reader
        # rejects; read nanos as long and convert (values carry no
        # sub-microsecond bits, so this is lossless vs the oracle).
        import pyspark.sql.functions as F

        prev = spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false")
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        try:
            df = spark.read.parquet(path)
        finally:
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", prev)
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return spark.read.parquet(path)


def scratch_dir(sf_dir: str) -> str:
    """Per-sf scratch directory for derived artifacts (ORC copies, ACID
    delta dirs, streaming checkpoints). Lives under the repo, gitignored.
    """
    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    d = os.path.join("/root/repo/.scratch", tag)
    os.makedirs(d, exist_ok=True)
    return d
