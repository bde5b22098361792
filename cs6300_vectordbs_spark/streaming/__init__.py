from .events import (  # noqa: F401
    windowed_event_counts,
    windowed_event_counts_batch,
    read_events_stream,
    run_stream_to_memory,
)
