"""Table loading for the driver's TPC-H-ish parquet testdata.

At 100 TB these reads become partitioned scans over object storage; the
API stays `spark.read.parquet(dir)` — Spark's FileSourceStrategy plans
stripe/row-group-aligned splits exactly like the reference's
`Reader.Options.range` split model (reference
`RecordReaderImpl.java:220-255`).

`events.ts` is special: the driver's testdata has shipped the column as
both parquet TIMESTAMP(NANOS) and timestamp[us] across rounds, so the
loader resolves the FILE's type at read time instead of assuming one —
the same file-vs-reader-type resolution the reference performs in
`SchemaEvolution.buildConversion` (`SchemaEvolution.java:335`).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import TimestampNTZType

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
        return _load_events(spark, path)
    return spark.read.parquet(path)


def events_ts_parquet_type(path: str):
    """The parquet footer's physical type for events.ts (pyarrow type).

    Footer-only read — no data pages touched. At 100 TB (many files)
    one representative footer decides the dispatch, exactly like the
    reference reads one file tail to plan the whole scan.
    """
    import pyarrow.parquet as pq

    f = path
    if os.path.isdir(path):
        for n in sorted(os.listdir(path)):
            if n.endswith(".parquet"):
                f = os.path.join(path, n)
                break
    return pq.read_schema(f).field("ts").type


def _load_events(spark: SparkSession, path: str) -> DataFrame:
    """Dtype-dispatched events load; always returns ts as session-tz
    TIMESTAMP (session tz is pinned UTC, `session.py:47`).

    - timestamp[ns]: Spark's vectorized reader rejects nanos; read as
      raw long via the legacy conf and convert (driver values carry no
      sub-microsecond bits, so this is lossless vs the oracle).
    - timestamp[us] → Spark TIMESTAMP_NTZ: cast to timestamp (identity
      under UTC session tz, matching DuckDB's naive reading).
    - already TIMESTAMP: pass through.
    """
    import pyarrow as pa
    import pyspark.sql.functions as F

    t = events_ts_parquet_type(path)
    if pa.types.is_timestamp(t) and t.unit == "ns":
        prev = spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false")
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        try:
            df = spark.read.parquet(path)
        finally:
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", prev)
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    df = spark.read.parquet(path)
    if isinstance(df.schema["ts"].dataType, TimestampNTZType):
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def scratch_dir(sf_dir: str) -> str:
    """Per-sf scratch directory for derived artifacts (ORC copies, ACID
    delta dirs, streaming checkpoints). Lives under the repo, gitignored.
    """
    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    d = os.path.join("/root/repo/.scratch", tag)
    os.makedirs(d, exist_ok=True)
    return d


def source_fingerprint(sf_dir: str, *names: str) -> str:
    """Fingerprint (path + mtime + size) of the source parquet files a
    derived scratch artifact is built from. Completion markers store
    this string, so artifacts rebuild automatically whenever the driver
    regenerates testdata — the round-2 failure mode was a `_done`
    marker surviving a testdata change and pinning a sink built from
    corrupted values.
    """
    parts = []
    for name in names:
        p = os.path.join(sf_dir, f"{name}.parquet")
        st = os.stat(p)
        parts.append(f"{p}:{st.st_mtime_ns}:{st.st_size}")
    return ";".join(parts)


def marker_valid(marker_path: str, fingerprint: str) -> bool:
    """True iff the completion marker exists AND matches the current
    source fingerprint (empty legacy markers never match)."""
    try:
        with open(marker_path) as fh:
            return fh.read() == fingerprint
    except OSError:
        return False


def write_marker(marker_path: str, fingerprint: str) -> None:
    with open(marker_path, "w") as fh:
        fh.write(fingerprint)
