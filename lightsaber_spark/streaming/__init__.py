from lightsaber_spark.streaming.sessions import session_window_agg
from lightsaber_spark.streaming.stream import (
    read_stream,
    streaming_windowed_agg,
    run_available_now,
)

__all__ = [
    "session_window_agg",
    "read_stream",
    "streaming_windowed_agg",
    "run_available_now",
]
