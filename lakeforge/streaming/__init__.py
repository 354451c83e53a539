from lakeforge.streaming.events import (
    EVENTS_SCHEMA,
    read_events_stream,
    run_available_now,
    windowed_counts,
)

__all__ = [
    "EVENTS_SCHEMA",
    "read_events_stream",
    "windowed_counts",
    "run_available_now",
]
