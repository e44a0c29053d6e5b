from .events import (
    hourly_counts_stream,
    run_stream_once,
    sessionless_dedup_stream,
    sliding_counts_stream,
)

__all__ = [
    "hourly_counts_stream",
    "run_stream_once",
    "sessionless_dedup_stream",
    "sliding_counts_stream",
]
