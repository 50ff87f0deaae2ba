"""Structured Streaming: incremental filter+scrub and windowed metrics."""
