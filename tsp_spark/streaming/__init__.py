"""Structured Streaming execution mode (SURVEY §2.10)."""

from tsp_spark.streaming.job import StreamingPatternJob, incidents_stream
from tsp_spark.streaming.stateful import stateful_islands

__all__ = ["StreamingPatternJob", "incidents_stream", "stateful_islands"]
