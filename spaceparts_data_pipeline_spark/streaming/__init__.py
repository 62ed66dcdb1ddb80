from spaceparts_data_pipeline_spark.streaming import incremental, structured  # noqa: F401
