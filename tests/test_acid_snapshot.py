"""Snapshot (ValidTxnList) reads over the ACID layout — the reference
contract is a LIST of committed transactions, not a watermark
(acid.md:94-101): an open/aborted txn below the high-water mark is
excluded while later committed txns stay visible.
"""

from __future__ import annotations

import pyspark.sql.functions as F

import os

import pytest

from orc_release_hdp_2_6_5_99_1_tag_spark.operators.acid import (
    OP_DELETE,
    OP_INSERT,
    OP_UPDATE,
    _to_physical,
    acid_table_dir,
    merged_view,
    select_acid_dirs,
    snapshot_view,
)
from orc_release_hdp_2_6_5_99_1_tag_spark.sources.orc_io import write_orc


def test_exceptions_list_skips_open_txn_below_watermark(spark, sf_dir):
    """valid={1,3}: txn 2 (the update) is open/aborted — its changes
    must be invisible even though txn 3's deletes apply."""
    root = acid_table_dir(spark, sf_dir)
    snap = snapshot_view(spark, root, [1, 3])
    rows = {r["id"]: r for r in snap.collect()}
    # deletes (txn 3) applied
    assert not any(k % 100 == 0 for k in rows), "txn-3 deletes missing"
    # updates (txn 2) NOT applied: %10 rows keep their base version
    sample = [r for k, r in rows.items() if k % 10 == 0]
    assert sample and all(r["status"] != "U" for r in sample)
    assert all(r["currentTransaction"] == 1 for r in sample)


def test_snapshot_prunes_unreferenced_delta_dirs(spark, sf_dir):
    """valid={1}: neither delta dir intersects the list, so the scan
    must touch ONLY the base files (metadata-level dir pruning, the
    AcidUtils.getAcidState walk) — and equal the raw base content."""
    root = acid_table_dir(spark, sf_dir)
    snap = snapshot_view(spark, root, [1])
    files = snap.inputFiles()
    assert files and all("base_" in f for f in files), files
    assert snap.count() == spark.read.orc(f"{root}/base_0000001").count()


def test_full_valid_list_equals_merged_view(spark, sf_dir):
    root = acid_table_dir(spark, sf_dir)
    a = snapshot_view(spark, root, [1, 2, 3]).orderBy("id").collect()
    b = merged_view(spark, root).orderBy("id").collect()
    assert a == b


# ---------------------------------------------------------------------------
# Hostile layout: overlapping delta ranges (pre-compaction remnants the
# cleaner has not removed) + an aborted txn below the watermark —
# mirroring the reference's compaction preconditions (acid.md:45-62)
# ---------------------------------------------------------------------------

_N = 60


def _ev(ids, op, txn, status_fn, price_fn):
    return [
        (op, 1, i % 4, i, txn, {"id": i, "status": status_fn(i), "totalprice": price_fn(i)})
        for i in ids
    ]


_EV_DDL = (
    "operation int, originalTransaction bigint, bucket int, rowId bigint,"
    " currentTransaction bigint,"
    " row struct<id: bigint, status: string, totalprice: double>"
)


@pytest.fixture(scope="module")
def hostile_root(spark, tmp_path_factory):
    """base_1 (inserts 1..60) · delta_2_2 + delta_3_3 (pre-compaction
    remnants) · delta_2_3 (their minor compaction — SAME events) ·
    delta_4_4 (ABORTED writer: poison 'X' updates) · delta_5_5
    (committed updates). The remnants overlap the compacted range, so
    a reader that walks every dir double-reads txn 2/3 events; the
    aborted txn sits BELOW the 5 watermark."""
    root = str(tmp_path_factory.mktemp("acid_hostile") / "orders_acid")
    ids = range(1, _N + 1)
    layout = [
        ("base_0000001", _ev(ids, OP_INSERT, 1, lambda i: "O", lambda i: float(i))),
        ("delta_0000002_0000002",
         _ev([i for i in ids if i % 3 == 0], OP_UPDATE, 2,
             lambda i: "U2", lambda i: float(i) + 100.0)),
        ("delta_0000003_0000003",
         _ev([i for i in ids if i % 5 == 0], OP_DELETE, 3,
             lambda i: "O", lambda i: float(i))),
        ("delta_0000002_0000003",
         _ev([i for i in ids if i % 3 == 0], OP_UPDATE, 2,
             lambda i: "U2", lambda i: float(i) + 100.0)
         + _ev([i for i in ids if i % 5 == 0], OP_DELETE, 3,
               lambda i: "O", lambda i: float(i))),
        ("delta_0000004_0000004",
         _ev([i for i in ids if i % 2 == 0], OP_UPDATE, 4,
             lambda i: "X", lambda i: -1.0)),
        # txn 5 updates only rows that still exist (a writer cannot
        # update a row txn 3 already deleted)
        ("delta_0000005_0000005",
         _ev([i for i in ids if i % 7 == 0 and i % 5 != 0], OP_UPDATE, 5,
             lambda i: "U5", lambda i: float(i) + 500.0)),
    ]
    for sub, rows in layout:
        df = spark.createDataFrame(rows, _EV_DDL)
        write_orc(_to_physical(df), os.path.join(root, sub))
    return root


def test_subsumed_remnant_dirs_are_skipped(hostile_root):
    """Directory selection must drop the pre-compaction remnants whose
    ranges the compacted delta_2_3 covers, keep everything else."""
    chosen = select_acid_dirs(hostile_root)
    assert chosen == [
        "base_0000001",
        "delta_0000002_0000003",
        "delta_0000004_0000004",
        "delta_0000005_0000005",
    ]


def test_hostile_snapshot_matches_logical_replay(spark, hostile_root):
    """valid={1,2,3,5} (txn 4 aborted below the watermark): the merged
    view must equal the logical replay — txn-3 deletes applied, txn-5
    update beating txn-2 where both touched a row, and not a single
    aborted-'X' row surviving. Double-application of the remnant
    events would break the per-key row_count==1 invariant; reading
    delta_4_4 would leak 'X'."""
    snap = snapshot_view(spark, hostile_root, [1, 2, 3, 5])
    rows = {r["id"]: r for r in snap.collect()}
    expected = {}
    for i in range(1, _N + 1):
        if i % 5 == 0:
            continue
        if i % 7 == 0:
            expected[i] = ("U5", float(i) + 500.0, 5)
        elif i % 3 == 0:
            expected[i] = ("U2", float(i) + 100.0, 2)
        else:
            expected[i] = ("O", float(i), 1)
    assert {k: (r["status"], r["totalprice"], r["currentTransaction"]) for k, r in rows.items()} == expected


def test_hostile_snapshot_never_reads_aborted_dir(spark, hostile_root):
    """The aborted txn's delta intersects nothing in the valid list, so
    its directory must be pruned at the metadata level — no file IO."""
    snap = snapshot_view(spark, hostile_root, [1, 2, 3, 5])
    files = snap.inputFiles()
    assert files and not any("delta_0000004_0000004" in f for f in files)
    assert not any("delta_0000002_0000002" in f for f in files)
    assert not any("delta_0000003_0000003" in f for f in files)


def test_hostile_snapshot_before_compacted_txns(spark, hostile_root):
    """valid={1,2}: the compacted delta is read (it holds txn-2 events)
    but its txn-3 deletes are filtered out at the event level."""
    snap = snapshot_view(spark, hostile_root, [1, 2])
    rows = {r["id"]: r for r in snap.collect()}
    assert len(rows) == _N  # no deletes visible yet
    assert all(r["status"] == ("U2" if k % 3 == 0 else "O") for k, r in rows.items())


def test_snapshot_txn_filter_pushed_to_scan(spark, sf_dir):
    """The currentTransaction IN (...) filter must reach the ORC scan
    of the surviving dirs (row-group stats can then skip stripes whose
    txn range lies outside the list)."""
    from orc_release_hdp_2_6_5_99_1_tag_spark.plans import formatted_plan

    root = acid_table_dir(spark, sf_dir)
    plan = formatted_plan(snapshot_view(spark, root, [1, 2]))
    assert "In(_currentTransaction, [1,2])" in plan, plan


def test_merge_strategies_are_value_identical(spark, sf_dir):
    """All three merge strategies — full-key window, per-bucket window
    (the reference's merge unit, acid.md:69-109), and max_by hash
    aggregation — must agree row-for-row at every SF (the driver
    additionally grades the bucketed one as t9_bucketed_merge against
    t2's oracle)."""
    root = acid_table_dir(spark, sf_dir)
    a = merged_view(spark, root, strategy="window").orderBy("id").collect()
    for strategy in ("bucketed", "agg"):
        b = merged_view(spark, root, strategy=strategy).orderBy("id").collect()
        assert a == b, f"strategy {strategy} diverged"


def test_bucketed_merge_single_exchange_before_window(spark, sf_dir):
    """The bucketed path's scale contract: ONE exchange, keyed by the
    two small ints (bucket, _sub) — HashPartitioning(bucket, _sub)
    satisfies the window's clustering, so EnsureRequirements must NOT
    insert a second exchange for the Window. (The trailing orderBy in
    t9 adds a rangepartitioning exchange for presentation; asserted
    here on the un-ordered view to isolate the merge itself.)"""
    import re

    root = acid_table_dir(spark, sf_dir)
    plan = (
        merged_view(spark, root, strategy="bucketed")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    hashes = re.findall(r"Exchange hashpartitioning\(([^)]*)", plan)
    assert len(hashes) == 1, f"expected exactly one hash exchange:\n{plan}"
    assert "bucket" in hashes[0] and "_sub" in hashes[0]
    assert "originalTransaction" not in hashes[0], (
        "the merge re-clustered by the full 3-part key — the bucketed "
        f"strategy did not take effect:\n{plan}"
    )
