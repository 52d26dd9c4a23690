"""Structured Streaming surface (SURVEY.md §2.9) — the reference's
EventBridge/SQS/Firehose semantics re-expressed as triggers, watermarks,
checkpointed sinks, and stateful operators."""
