"""Data sources: parquet table readers, Singer message ingestion,
JSON Schema -> Spark schema conversion."""

from target_hdfs_spark.sources.readers import load_table, TABLES

__all__ = ["load_table", "TABLES"]
