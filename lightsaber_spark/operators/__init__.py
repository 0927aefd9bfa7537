from lightsaber_spark.operators.window_agg import (
    gap_filled,
    interpolated_fill,
    window_spine,
    windowed_agg,
)
from lightsaber_spark.operators.row_window import (
    keyed_row_window_agg,
    row_window_agg,
    with_global_row_index,
)
from lightsaber_spark.operators.joins import (
    asof_broadcast_join,
    asof_join,
    range_join,
    salted_join,
    static_hash_join,
    theta_join,
)
from lightsaber_spark.operators.topk import post_window_argmax, window_topk

__all__ = [
    "windowed_agg",
    "window_spine",
    "gap_filled",
    "interpolated_fill",
    "row_window_agg",
    "with_global_row_index",
    "static_hash_join",
    "theta_join",
    "asof_join",
    "asof_broadcast_join",
    "range_join",
    "salted_join",
    "post_window_argmax",
    "window_topk",
]
