from spaceparts_data_pipeline_spark.sources import catalog, jdbc, parquet  # noqa: F401
