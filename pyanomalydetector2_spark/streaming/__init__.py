"""Incremental-batch machinery: checkpoint ledger + watermark resume (the
re-imagining of the reference's *_updates tables, models/updates.py:10-28).
Structured Streaming is not required for the north_rule (SURVEY §2.9) —
incremental batch over immutable snapshots is the faithful re-expression."""
