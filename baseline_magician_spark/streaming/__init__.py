from .baseline_stream import (  # noqa: F401
    read_events_stream,
    streaming_baseline_aggregate,
    streaming_event_counts,
    streaming_sessionize,
)
