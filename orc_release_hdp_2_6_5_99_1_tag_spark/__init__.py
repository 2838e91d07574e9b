"""PySpark-native analytics engine with the capabilities of Apache ORC
1.4.3 (reference tag orc-release-HDP-2.6.5.99-1), re-expressed as
DataFrame-level operators, plus large-scale training-data pipeline
operators (dedup / similarity / text analysis / multimodal).

Architecture: everything is declared through the DataFrame/SQL API so
Catalyst handles pruning, pushdown and join planning; ORC format
capabilities (S1-S3, encodings, indexes) ride on Spark's native ORC
datasource; only genuinely non-relational semantics (ACID merge-on-read,
MinHash-LSH, multimodal decode) are custom compositions or Pandas UDFs.
"""

from orc_release_hdp_2_6_5_99_1_tag_spark.session import engine_clear_caches, get_spark
from orc_release_hdp_2_6_5_99_1_tag_spark.tables import load_table, TABLE_NAMES

__all__ = ["engine_clear_caches", "get_spark", "load_table", "TABLE_NAMES"]
