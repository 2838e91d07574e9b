"""Encoding / compression surface (SURVEY §2.6: reference E1-E7).

The encodings themselves (RLEv1/v2, dictionary, varint, timestamp
split, compression framing) live inside the ORC writer Spark embeds —
the reference's own implementation — so the engine's surface is the
codec/encoding *options* and proof that every codec round-trips the
same data (the reference's cross-codec golden-file strategy,
`examples/demo-11-zlib.orc` etc.).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from orc_release_hdp_2_6_5_99_1_tag_spark.sources.orc_io import orc_copy, read_orc

# CompressionKind.java:26 lists NONE/ZLIB/SNAPPY/LZO/LZ4; Spark's ORC
# additionally offers zstd. lzo needs native libs, so the portable set:
_CODECS = ["none", "zlib", "snappy", "lz4", "zstd"]


def e1_codec_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write the same table under every codec (E7 framing per codec),
    read each back, and prove value-identity: one fingerprint row per
    codec, all identical except the codec label."""
    out = None
    for codec in _CODECS:
        path = orc_copy(spark, sf_dir, "orders", variant=f"codec_{codec}", compression=codec)
        fp = (
            read_orc(spark, path)
            .agg(
                F.count(F.lit(1)).alias("cnt"),
                F.sum("o_orderkey").alias("sum_orderkey"),
                F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("sum_totalprice"),
                F.count_distinct("o_orderstatus").alias("nd_status"),
                F.max(F.col("o_orderdate").cast("string")).alias("max_orderdate"),
            )
            .select(F.lit(codec).alias("codec"), "*")
        )
        out = fp if out is None else out.unionAll(fp)
    return out.orderBy("codec")


E1_ORACLE = (
    " UNION ALL ".join(
        f"""SELECT '{codec}' AS codec, COUNT(*) AS cnt, CAST(SUM(o_orderkey) AS BIGINT) AS sum_orderkey,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_totalprice,
        COUNT(DISTINCT o_orderstatus) AS nd_status,
        CAST(MAX(o_orderdate) AS VARCHAR) AS max_orderdate FROM orders"""
        for codec in _CODECS
    )
    + " ORDER BY codec"
)
