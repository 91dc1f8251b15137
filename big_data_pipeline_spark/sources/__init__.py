from big_data_pipeline_spark.sources.jsonl_sink import (  # noqa: F401
    JsonlDirDataSource,
    register_jsonl_sink,
)
from big_data_pipeline_spark.sources.ticker import (  # noqa: F401
    TickerDataSource,
    register_ticker_source,
)
