from big_data_pipeline_spark.streaming.windows import (  # noqa: F401
    dedup_within_watermark,
    run_available_now,
    sliding_counts_stream,
    stream_events,
    session_windows_stream,
    tumbling_counts_stream,
)
