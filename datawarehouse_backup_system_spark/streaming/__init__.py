"""Structured Streaming operators (streaming analogs of the batch pipeline)."""
