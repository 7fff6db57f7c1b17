"""Structured Streaming variants of the validation executor."""

from jsonschema_spark.streaming.stateful import running_validation_totals
from jsonschema_spark.streaming.validate import (
    annotate_stream,
    stream_violations,
    windowed_summary,
)

__all__ = [
    "annotate_stream",
    "stream_violations",
    "windowed_summary",
    "running_validation_totals",
]
