"""salted_join equivalence: a pathologically skewed key joins to the
same multiset of rows as a plain equi-join."""

from __future__ import annotations

import pyspark.sql.functions as F

from orc_release_hdp_2_6_5_99_1_tag_spark.functions.skew import salted_join


def test_salted_join_matches_plain_join(spark):
    # 90% of left rows share one hot key
    left = spark.range(0, 20000).select(
        F.when(F.col("id") % 10 != 0, F.lit(7)).otherwise(F.col("id") % 100).alias("k"),
        F.col("id").alias("payload"),
    )
    right = spark.range(0, 100).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("rv")
    )
    plain = left.join(right, "k").groupBy("k").agg(
        F.count(F.lit(1)).alias("n"), F.sum("payload").alias("s"), F.sum("rv").alias("r")
    )
    salted = salted_join(left, right, "k").groupBy("k").agg(
        F.count(F.lit(1)).alias("n"), F.sum("payload").alias("s"), F.sum("rv").alias("r")
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))
