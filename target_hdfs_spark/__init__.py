"""target_hdfs_spark — a PySpark-native analytics & ingest engine.

A brand-new engine with the query and data-processing capabilities of
Automattic/target-hdfs (a Singer target that loads JSON record streams
into size-managed Parquet files on HDFS), re-expressed Spark-first:

- Ingest: Singer messages -> typed, flattened, metadata-enriched
  DataFrames -> partitioned / compressed / size-governed Parquet
  (reference: target_hdfs/sinks.py, target_hdfs/utils/hdfs.py).
- Query surface: a registry of named, oracle-checkable DataFrame
  queries (relational + LLM-data-pipeline operators) designed for
  100 TB scale — declarative plans, Catalyst-optimized, no driver-side
  collection in any hot path.
- Streaming: Structured Streaming ingest reusing the batch writer via
  foreachBatch, plus windowed/stateful operators.

Everything here derives from public knowledge only: the PySpark API and
the reference repo's observable behavior.
"""

__version__ = "0.1.0"
