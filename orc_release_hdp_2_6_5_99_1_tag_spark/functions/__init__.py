from orc_release_hdp_2_6_5_99_1_tag_spark.functions.union_type import (
    union_encode,
    union_decode,
    union_tag,
)
from orc_release_hdp_2_6_5_99_1_tag_spark.functions.chartypes import as_char, as_varchar

__all__ = ["union_encode", "union_decode", "union_tag", "as_char", "as_varchar"]
