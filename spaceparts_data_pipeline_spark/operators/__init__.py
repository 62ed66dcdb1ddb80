from spaceparts_data_pipeline_spark.operators import (  # noqa: F401
    dedup,
    identifiers,
    merge,
    quality,
    standardize,
)
