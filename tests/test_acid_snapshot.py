"""Snapshot (ValidTxnList) reads over the ACID layout — the reference
contract is a LIST of committed transactions, not a watermark
(acid.md:94-101): an open/aborted txn below the high-water mark is
excluded while later committed txns stay visible.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from orc_release_hdp_2_6_5_99_1_tag_spark.operators.acid import (
    acid_table_dir,
    merged_view,
    snapshot_view,
)


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


def test_snapshot_txn_filter_pushed_to_scan(spark, sf_dir):
    """The currentTransaction IN (...) filter must reach the ORC scan
    of the surviving dirs (row-group stats can then skip stripes whose
    txn range lies outside the list)."""
    from orc_release_hdp_2_6_5_99_1_tag_spark.plans import formatted_plan

    root = acid_table_dir(spark, sf_dir)
    plan = formatted_plan(snapshot_view(spark, root, [1, 2]))
    assert "In(_currentTransaction, [1,2])" in plan, plan
