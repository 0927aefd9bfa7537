from lightsaber_spark.streaming.anomaly import streaming_zscore_outliers
from lightsaber_spark.streaming.compression import (
    codec_flips,
    codec_log,
    continuous_compression_replan,
)
from lightsaber_spark.streaming.funnel import streaming_funnel
from lightsaber_spark.streaming.gapfill import streaming_gapfill_tumbling
from lightsaber_spark.streaming.sessions import (
    session_window_agg,
    streaming_sessions_timeout,
)
from lightsaber_spark.streaming.stream import (
    read_stream,
    run_available_now,
    streaming_asof_backward,
    streaming_dedup,
    streaming_gapfill_count,
    streaming_line_boilerplate,
    streaming_line_df_counts,
    streaming_line_scrub,
    streaming_neardup_lsh,
    streaming_order_violations,
    streaming_post_window_argmax,
    streaming_url_canonical_dedup,
    streaming_windowed_agg,
)
from lightsaber_spark.streaming.row_windows import streaming_row_window_agg

__all__ = [
    "session_window_agg",
    "streaming_sessions_timeout",
    "read_stream",
    "run_available_now",
    "streaming_asof_backward",
    "streaming_dedup",
    "streaming_funnel",
    "streaming_gapfill_count",
    "streaming_gapfill_tumbling",
    "streaming_line_boilerplate",
    "streaming_line_df_counts",
    "streaming_line_scrub",
    "streaming_neardup_lsh",
    "streaming_order_violations",
    "streaming_post_window_argmax",
    "streaming_url_canonical_dedup",
    "streaming_windowed_agg",
    "streaming_row_window_agg",
    "streaming_zscore_outliers",
    "codec_flips",
    "codec_log",
    "continuous_compression_replan",
]
