from big_data_pipeline_spark.operators.asof import asof_join  # noqa: F401
from big_data_pipeline_spark.operators.ranges import range_join_binned  # noqa: F401
