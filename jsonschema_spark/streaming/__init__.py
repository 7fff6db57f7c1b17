"""Structured Streaming variants of the validation executor."""

from jsonschema_spark.streaming.validate import (
    annotate_stream,
    stream_violations,
    windowed_summary,
)

__all__ = ["annotate_stream", "stream_violations", "windowed_summary"]
