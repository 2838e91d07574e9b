"""Round-14 d18 stress A/B (r13-verdict Next #3): cache-vs-recompute
of the shingle pipeline at the 1M-doc class, measured exactly like
d2's r13 adjudication (cold, caches cleared per run, min-of-N).

d18's plan references the shingle set 4x (hot-df groupBy, sizes, and
both legs of the inverted-index self-join), so each execution
recomputes the scan->split->explode->distinct lineage 4x. d2's 1M-doc
A/B showed corpus-scale caches are 2.2x WORSE than recompute; this
script measures the same trade for d18's shape, which recomputes more
but would also cache a (hot-capped) set.

Usage: python scripts/d18_stress_ab.py [n_docs] [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F

from orc_release_hdp_2_6_5_99_1_tag_spark import engine_clear_caches, get_spark
from scripts.scale_stress import synth_documents


def d18_shape(docs, cache_sh: bool):
    from pyspark import StorageLevel

    from orc_release_hdp_2_6_5_99_1_tag_spark.operators.dedup import (
        _D18_DF_CAP,
        _shingles,
    )

    all_sh = _shingles(docs).select("doc_id", "s")
    hot = (
        all_sh.groupBy("s")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") > _D18_DF_CAP)
        .select("s")
    )
    sh = all_sh.join(F.broadcast(hot), "s", "left_anti")
    if cache_sh:
        sh = sh.persist(StorageLevel.MEMORY_AND_DISK)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a = sh.select(F.col("doc_id").alias("doc_a"), "s")
    b = sh.select(F.col("doc_id").alias("doc_b"), F.col("s").alias("s2"))
    inter = (
        a.join(b, (F.col("s") == F.col("s2")) & (F.col("doc_a") != F.col("doc_b")))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    contain = inter.join(sizes.toDF("doc_a", "na"), "doc_a").filter(
        F.round(F.col("inter") / F.col("na"), 6) >= 0.8
    )
    return contain.agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum(F.col("doc_a") + F.col("doc_b")).alias("id_checksum"),
        F.sum("inter").alias("inter_sum"),
    )


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark("d18-stress-ab")
    spark.sparkContext.setLogLevel("ERROR")
    docs = synth_documents(spark, n)
    results = {}
    # interleave arms per rep so host drift hits both sides equally
    for rep in range(reps):
        for arm, cache_sh in (("recompute", False), ("cache_sh", True)):
            engine_clear_caches(spark)
            spark.sparkContext.setJobDescription(f"d18-ab:{arm}:{rep}")
            t0 = time.time()
            row = d18_shape(docs, cache_sh).collect()[0]
            dt = round(time.time() - t0, 3)
            results.setdefault(arm, []).append(dt)
            print(f"rep {rep} {arm:10s} {dt:8.3f}s  result={tuple(row)}", flush=True)
    for arm, samples in results.items():
        print(f"{arm:10s} min={min(samples):.3f} all={sorted(samples)}")
    spark.stop()


if __name__ == "__main__":
    main()
