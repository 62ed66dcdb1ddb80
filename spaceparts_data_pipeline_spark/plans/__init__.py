from spaceparts_data_pipeline_spark.plans import bronze, gold, logs, runner, silver  # noqa: F401
