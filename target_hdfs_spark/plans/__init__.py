"""Physical planning concerns the reference handles by hand and we
handle as thin layers over Spark: size-governed parquet writes,
small-file compaction, strict schema guards."""
