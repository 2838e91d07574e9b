"""Schema contract: the FIRST test file to run (name-ordered).

Round-2 lesson: the driver regenerated testdata with `events.ts`
switched from parquet TIMESTAMP(NANOS) to timestamp[us], and the only
local signal was 16 opaque pytest failures deep in operator tests (plus
a silently-corrupting streaming path). This file turns any future
testdata drift into ONE loud, named failure before anything else runs.

Three layers:
1. parquet footer dtypes per table (pyarrow, no Spark) — names the
   exact drifted column;
2. the loader contract: `load_table` must hand every consumer
   events.ts as session-tz TIMESTAMP whatever the file had;
3. batch-vs-stream equivalence on min/max(ts)/count — the r2 failure
   mode was the STREAM path silently corrupting timestamps 1000× while
   the batch path failed loudly.
"""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pyspark.sql.functions as F
import pytest

from orc_release_hdp_2_6_5_99_1_tag_spark.tables import TABLE_NAMES, load_table

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

# (table, column) -> set of parquet types the repo knows how to handle.
# events.ts intentionally allows both generations of driver testdata;
# everything else is pinned exactly.
EXPECTED = {
    "region": {"r_regionkey": {"int32"}, "r_name": {"string", "large_string"}},
    "nation": {
        "n_nationkey": {"int32"},
        "n_name": {"string", "large_string"},
        "n_regionkey": {"int32"},
    },
    "customer": {
        "c_custkey": {"int64"},
        "c_name": {"string", "large_string"},
        "c_nationkey": {"int32"},
        "c_acctbal": {"double"},
        "c_mktsegment": {"string", "large_string"},
    },
    "supplier": {
        "s_suppkey": {"int64"},
        "s_name": {"string", "large_string"},
        "s_nationkey": {"int32"},
        "s_acctbal": {"double"},
    },
    "part": {
        "p_partkey": {"int64"},
        "p_name": {"string", "large_string"},
        "p_brand": {"string", "large_string"},
        "p_type": {"string", "large_string"},
        "p_size": {"int32"},
        "p_retailprice": {"double"},
    },
    "orders": {
        "o_orderkey": {"int64"},
        "o_custkey": {"int64"},
        "o_orderstatus": {"string", "large_string"},
        "o_totalprice": {"double"},
        "o_orderdate": {"timestamp[us]", "timestamp[ns]"},
        "o_orderpriority": {"string", "large_string"},
    },
    "lineitem": {
        "l_orderkey": {"int64"},
        "l_partkey": {"int64"},
        "l_suppkey": {"int64"},
        "l_linenumber": {"int32"},
        "l_quantity": {"double"},
        "l_extendedprice": {"double"},
        "l_discount": {"double"},
        "l_tax": {"double"},
        "l_returnflag": {"string", "large_string"},
        "l_linestatus": {"string", "large_string"},
        "l_shipdate": {"timestamp[us]", "timestamp[ns]"},
    },
    "events": {
        "event_id": {"int64"},
        "ts": {"timestamp[us]", "timestamp[ns]", "int64"},
        "user_id": {"int64"},
        "event_type": {"string", "large_string"},
        "value": {"double"},
        "props": {"string", "large_string"},
    },
    "documents": {
        "doc_id": {"int64"},
        "text": {"string", "large_string"},
        "lang": {"string", "large_string"},
        "source": {"string", "large_string"},
        "n_chars": {"int64"},
    },
    "embeddings": {
        "vec_id": {"int64"},
        "embedding": {"list<element: float>", "list<item: float>"},
        "label": {"int32"},
    },
}


@pytest.mark.parametrize("table", TABLE_NAMES)
def test_parquet_footer_schema(table):
    schema = pq.read_schema(os.path.join(SF_DIR, f"{table}.parquet"))
    expected = EXPECTED[table]
    got = {f.name: str(f.type) for f in schema}
    assert set(got) == set(expected), (
        f"TESTDATA DRIFT: {table} columns changed — have {sorted(got)}, "
        f"the repo expects {sorted(expected)}. Update tables.py consumers "
        "and this contract together."
    )
    for col, allowed in expected.items():
        assert got[col] in allowed, (
            f"TESTDATA DRIFT: {table}.{col} is parquet {got[col]!r}; the repo "
            f"handles {sorted(allowed)}. The last drift like this (events.ts "
            "nanos→micros) broke 9 operators and the bench — fix "
            "tables.py/streaming dispatch, then widen this contract."
        )


def test_loader_normalizes_events_ts(spark):
    df = load_table(spark, SF_DIR, "events")
    assert df.schema["ts"].dataType.simpleString() == "timestamp", (
        "load_table must hand consumers events.ts as session-tz TIMESTAMP; got "
        f"{df.schema['ts'].dataType.simpleString()} — the dtype dispatch in "
        "tables.py:_load_events is broken for this testdata generation"
    )


def test_stream_matches_batch_on_ts(spark):
    """Stream and batch paths must agree on min/max(ts) and count — a
    silent unit mismatch (the r2 1000× corruption) fails here loudly."""
    import shutil

    from orc_release_hdp_2_6_5_99_1_tag_spark.streaming.ingest import _events_stream
    from orc_release_hdp_2_6_5_99_1_tag_spark.tables import scratch_dir

    batch = (
        load_table(spark, SF_DIR, "events")
        .agg(
            F.min("ts").alias("mn"), F.max("ts").alias("mx"), F.count("*").alias("n")
        )
        .collect()[0]
    )
    out = os.path.join(scratch_dir(SF_DIR), "stream", "contract_probe")
    ckpt = out + "_ckpt"
    shutil.rmtree(out, ignore_errors=True)
    shutil.rmtree(ckpt, ignore_errors=True)
    q = (
        _events_stream(spark, SF_DIR)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    stream = (
        spark.read.parquet(out)
        .agg(
            F.min("ts").alias("mn"), F.max("ts").alias("mx"), F.count("*").alias("n")
        )
        .collect()[0]
    )
    assert (stream["mn"], stream["mx"], stream["n"]) == (
        batch["mn"],
        batch["mx"],
        batch["n"],
    ), (
        f"STREAM/BATCH DIVERGENCE on events.ts: stream={stream} batch={batch} — "
        "the streaming schema dispatch (streaming/ingest.py:_events_stream) "
        "disagrees with the batch loader (tables.py:_load_events); this is the "
        "silent-corruption failure mode from round 2"
    )


def test_loader_handles_nanos_generation(spark, tmp_path):
    """The dispatch must keep working if the driver ever reverts to the
    TIMESTAMP(NANOS) testdata generation: write a nanos events file and
    assert batch AND stream loaders return identical micros values."""
    import datetime
    import shutil

    import pyarrow as pa
    import pyarrow.parquet as pq2

    sf = str(tmp_path / "sfnanos")
    os.makedirs(sf, exist_ok=True)
    base = datetime.datetime(2024, 3, 1, 12, 0, 0)
    rows = [
        (i, base + datetime.timedelta(seconds=i, microseconds=137 * i), i % 5,
         "click", float(i), "{}")
        for i in range(20)
    ]
    table = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("ns")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([r[4] for r in rows], pa.float64()),
            "props": pa.array([r[5] for r in rows], pa.string()),
        }
    )
    pq2.write_table(table, os.path.join(sf, "events.parquet"))

    df = load_table(spark, sf, "events")
    assert df.schema["ts"].dataType.simpleString() == "timestamp"
    got = [r["ts"] for r in df.orderBy("event_id").collect()]
    assert got == [r[1] for r in rows], "nanos branch corrupted values"

    from orc_release_hdp_2_6_5_99_1_tag_spark.streaming.ingest import _events_stream
    from orc_release_hdp_2_6_5_99_1_tag_spark.tables import scratch_dir

    out = os.path.join(scratch_dir(sf), "stream", "nanos_probe")
    ckpt = out + "_ckpt"
    shutil.rmtree(out, ignore_errors=True)
    shutil.rmtree(ckpt, ignore_errors=True)
    q = (
        _events_stream(spark, sf)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    sgot = [r["ts"] for r in spark.read.parquet(out).orderBy("event_id").collect()]
    assert sgot == got, "stream nanos branch disagrees with batch"
    shutil.rmtree(os.path.join("/root/repo/.scratch", "sfnanos"), ignore_errors=True)


@pytest.mark.parametrize("unit,mult", [("ns", 1000000000), ("us", 1000000), ("ms", 1000), ("s", 1)])
def test_loader_handles_integer_epoch_generation(spark, tmp_path, unit, mult):
    """If events.ts ever arrives as a RAW integer epoch column, the
    loader must resolve the unit from footer-stat magnitude and
    normalize to timestamp — for nanos, micros, millis, and seconds."""
    import datetime

    import pyarrow as pa
    import pyarrow.parquet as pq2

    sf = str(tmp_path / f"sfint_{unit}")
    os.makedirs(sf, exist_ok=True)
    base = datetime.datetime(2024, 5, 1, 8, 30, 0, tzinfo=datetime.timezone.utc)
    expect = [base + datetime.timedelta(seconds=i * 60) for i in range(10)]
    raw = [int(t.timestamp()) * mult for t in expect]
    table = pa.table(
        {
            "event_id": pa.array(range(10), pa.int64()),
            "ts": pa.array(raw, pa.int64()),
            "user_id": pa.array([i % 3 for i in range(10)], pa.int64()),
            "event_type": pa.array(["click"] * 10, pa.string()),
            "value": pa.array([float(i) for i in range(10)], pa.float64()),
            "props": pa.array(["{}"] * 10, pa.string()),
        }
    )
    pq2.write_table(table, os.path.join(sf, "events.parquet"))
    df = load_table(spark, sf, "events")
    assert df.schema["ts"].dataType.simpleString() == "timestamp"
    got = [r["ts"] for r in df.orderBy("event_id").collect()]
    assert got == [t.replace(tzinfo=None) for t in expect], (
        f"integer-epoch {unit} dispatch wrong: {got[0]} vs {expect[0]}"
    )


def test_generic_loader_handles_nanos_in_any_table(spark, tmp_path):
    """A nanos drift in a NON-events table (e.g. lineitem.l_shipdate)
    must load through the generic nanos fallback, not crash."""
    import datetime

    import pyarrow as pa
    import pyarrow.parquet as pq2

    sf = str(tmp_path / "sflns")
    os.makedirs(sf, exist_ok=True)
    d0 = datetime.datetime(2024, 1, 1)
    table = pa.table(
        {
            "l_orderkey": pa.array([1, 2, 3], pa.int64()),
            "l_shipdate": pa.array(
                [d0 + datetime.timedelta(days=i) for i in range(3)], pa.timestamp("ns")
            ),
        }
    )
    pq2.write_table(table, os.path.join(sf, "lineitem.parquet"))
    df = load_table(spark, sf, "lineitem")
    assert df.schema["l_shipdate"].dataType.simpleString() == "timestamp"
    got = [r["l_shipdate"] for r in df.orderBy("l_orderkey").collect()]
    assert got == [d0 + datetime.timedelta(days=i) for i in range(3)]


def test_scratch_caches_rebuild_on_source_change(spark, tmp_path):
    """The fingerprint-marker mechanism end-to-end: a derived ORC copy
    must rebuild when its source parquet changes (the round-2 failure
    was a marker surviving a testdata regeneration)."""
    import time

    import pyarrow as pa
    import pyarrow.parquet as pq2

    from orc_release_hdp_2_6_5_99_1_tag_spark.sources.orc_io import orc_copy

    sf = str(tmp_path / "sffp")
    os.makedirs(sf, exist_ok=True)

    def write_nation(keys):
        table = pa.table(
            {
                "n_nationkey": pa.array(keys, pa.int32()),
                "n_name": pa.array([f"N{k}" for k in keys], pa.string()),
                "n_regionkey": pa.array([k % 3 for k in keys], pa.int32()),
            }
        )
        pq2.write_table(table, os.path.join(sf, "nation.parquet"))

    write_nation([1, 2, 3])
    dest = orc_copy(spark, sf, "nation")
    assert spark.read.orc(dest).count() == 3
    time.sleep(0.01)  # ensure a distinct mtime_ns
    write_nation([1, 2, 3, 4, 5])
    dest2 = orc_copy(spark, sf, "nation")
    assert dest2 == dest
    assert spark.read.orc(dest2).count() == 5, (
        "stale fingerprint marker: ORC copy did not rebuild after the "
        "source parquet changed"
    )
    import shutil

    shutil.rmtree(os.path.join("/root/repo/.scratch", "sffp"), ignore_errors=True)


def test_explicit_ddl_matches_inference(spark):
    """r13 optimization: `_load_generic` reads through an explicit
    footer-derived schema (~20 ms) instead of JVM inference
    (~150-180 ms per call, paid per table per query execution). The
    contract is exact StructType equality with what inference would
    have produced — for every table at every SF present — so the
    planning-cost saving can never change a query's schema. The
    unmapped-type fallback path is exercised separately by
    test_generic_loader_handles_nanos_in_any_table."""
    from orc_release_hdp_2_6_5_99_1_tag_spark.tables import _explicit_ddl

    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        sf_dir = f"/root/testdata/{sf}"
        if not os.path.isdir(sf_dir):
            continue
        for table in TABLE_NAMES:
            path = os.path.join(sf_dir, f"{table}.parquet")
            ddl, ns_cols = _explicit_ddl(path)
            if not ddl or ns_cols:
                continue  # fallback/conversion generations: covered elsewhere
            inferred = spark.read.parquet(path).schema
            explicit = spark.read.schema(ddl).parquet(path).schema
            assert explicit == inferred, (
                f"{sf}/{table}: explicit schema diverges from inference\n"
                f"  explicit: {explicit}\n  inferred: {inferred}"
            )
