from orc_release_hdp_2_6_5_99_1_tag_spark.plans.inspect import (
    formatted_plan,
    pushed_filters,
    read_schema_columns,
)

__all__ = ["formatted_plan", "pushed_filters", "read_schema_columns"]
