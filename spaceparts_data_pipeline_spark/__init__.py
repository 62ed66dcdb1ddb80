"""spaceparts_data_pipeline_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the capabilities of the
reference pipeline ``ftuga/spaceparts-data-pipeline`` (medallion ETL:
bronze raw ingest → silver clean/dedup/quarantine → gold star schema →
BI measures), plus large-scale training-data operators (dedup families,
similarity search, text analysis, multimodal plumbing).

Layout:
    session        SparkSession builder tuned for the engine
    sources/       scans: parquet, catalog discovery, JDBC, watermark scans
    operators/     schema-generic DataFrame->DataFrame transforms
    functions/     column-expression helpers and business measures
    plans/         layer runners (bronze/silver/gold) + execution logs
    streaming/     batch-incremental upserts + Structured Streaming variant
"""

__version__ = "0.1.0"
