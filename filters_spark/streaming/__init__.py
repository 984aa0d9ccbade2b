"""Structured Streaming surface for the validation engine.

The reference library is strictly batch (SURVEY.md §2.9); these are the
engine additions for validating transcript *streams*:

- :func:`validate_stream` — the compiled chain projection applied to a
  streaming DataFrame (stateless: identical plan to batch).
- :func:`windowed_violation_counts` — watermarked tumbling-window
  violation-code counts for monitoring sinks.
- :func:`stream_dedup` — bounded-state streaming exact dedup
  (``dropDuplicatesWithinWatermark``).
- :func:`stream_sessionize` — session-window aggregation with state
  eviction at the watermark (the streaming analogue of the batch
  ``pipeline.sessionize``).
- :func:`conversation_monitor` — custom stateful operator
  (``applyInPandasWithState``) tracking per-conversation turn progress
  across micro-batches: duplicate / out-of-order / gap detection with
  event-time timeout.
"""

from filters_spark.streaming.validation import (
    conversation_monitor,
    stream_dedup,
    stream_sessionize,
    validate_stream,
    windowed_violation_counts,
)

__all__ = [
    "conversation_monitor",
    "stream_dedup",
    "stream_sessionize",
    "validate_stream",
    "windowed_violation_counts",
]
