from orc_release_hdp_2_6_5_99_1_tag_spark.sources.orc_io import (
    write_orc,
    orc_copy,
    read_orc,
)
from orc_release_hdp_2_6_5_99_1_tag_spark.sources.meta import orc_meta, orc_file_stats_from_footer

__all__ = ["write_orc", "orc_copy", "read_orc", "orc_meta", "orc_file_stats_from_footer"]
