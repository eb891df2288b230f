from .events import (
    read_events_stream,
    run_to_memory,
    stream_to_parquet,
    stream_upsert_to_lake,
)

__all__ = [
    "read_events_stream",
    "run_to_memory",
    "stream_to_parquet",
    "stream_upsert_to_lake",
]
