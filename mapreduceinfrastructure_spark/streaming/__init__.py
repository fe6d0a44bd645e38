from .event_stream import (
    read_events_stream,
    streaming_session_agg,
    streaming_windowed_counts,
)

__all__ = [
    "read_events_stream",
    "streaming_windowed_counts",
    "streaming_session_agg",
]
