"""Engine-level scalar/column function helpers (exact-arithmetic casts,
portable hashing, vector math). All JVM-side pyspark.sql.functions
compositions — no row-at-a-time Python UDFs in any hot path."""
