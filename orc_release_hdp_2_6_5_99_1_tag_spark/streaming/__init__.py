from orc_release_hdp_2_6_5_99_1_tag_spark.streaming.ingest import (
    r1_streaming_orc_ingest,
    r2_streaming_windowed_agg,
)

__all__ = ["r1_streaming_orc_ingest", "r2_streaming_windowed_agg"]
