from big_data_pipeline_spark.quality.expectations import (  # noqa: F401
    Expectation,
    expect_accepted_values,
    expect_between,
    expect_not_null,
    expect_unique,
    run_expectations,
)
