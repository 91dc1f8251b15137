from big_data_pipeline_spark.sources.ticker import (  # noqa: F401
    TickerDataSource,
    register_ticker_source,
)
