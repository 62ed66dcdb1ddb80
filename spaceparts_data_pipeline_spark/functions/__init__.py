from spaceparts_data_pipeline_spark.functions import measures, scalars  # noqa: F401
