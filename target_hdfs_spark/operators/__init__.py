"""Operator library: every named, oracle-checkable query the engine
supports (SURVEY.md §2A ingest parity lives in sources/ and plans/;
§2B query surface lives here)."""
