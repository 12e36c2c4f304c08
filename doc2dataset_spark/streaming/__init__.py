"""Structured Streaming operators (SURVEY §7 phase 6 — post-parity stretch;
the reference has no streaming at all, only a 5s stats-file poller,
`logger.py:224-231`)."""

from doc2dataset_spark.streaming.events import (  # noqa: F401
    sessionize_stream,
    stream_events,
    tumbling_counts,
)
