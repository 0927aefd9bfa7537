from lightsaber_spark.streaming.sessions import session_window_agg
from lightsaber_spark.streaming.stream import (
    read_stream,
    streaming_dedup,
    streaming_post_window_argmax,
    streaming_windowed_agg,
    run_available_now,
)
from lightsaber_spark.streaming.row_windows import streaming_row_window_agg

__all__ = [
    "session_window_agg",
    "read_stream",
    "streaming_dedup",
    "streaming_post_window_argmax",
    "streaming_windowed_agg",
    "run_available_now",
    "streaming_row_window_agg",
]
