"""Structured Streaming execution mode (SURVEY §2.10)."""

from tsp_spark.streaming.job import StreamingPatternJob, incidents_stream

__all__ = ["StreamingPatternJob", "incidents_stream"]
