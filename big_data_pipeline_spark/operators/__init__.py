from big_data_pipeline_spark.operators.asof import asof_join  # noqa: F401
from big_data_pipeline_spark.operators.ranges import (  # noqa: F401
    interval_overlap_join,
    range_join_binned,
)
