"""Structured Streaming surface: micro-batch ingest via foreachBatch
(reusing the batch writer), windowed/stateful operators, checkpointed
exactly-once-ish state (the reference's STATE-message semantics)."""
