"""Property-based check of the pane-decomposed sliding aggregation.

The pane path (`_sliding_panes`, the reference's gcd-slicing trick
expressed as two Catalyst aggregations) must produce EXACTLY the rows
of the naive per-row-expansion path for every (size, slide) — this is
the invariant the reference's whole design rests on
(``WindowDefinition.h:80-90``: every window is a union of whole panes).
"""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from tests.conftest import rows_match

from lightsaber_spark.operators import windowed_agg

AGGS = [
    ("sum", "value", "s"),
    ("count", None, "n"),
    ("min", "value", "mn"),
    ("max", "value", "mx"),
    ("avg", "value", "av"),
]


@settings(max_examples=12, deadline=None)
@given(
    slide=st.integers(min_value=1, max_value=40).map(lambda x: x * 60),
    ratio=st.integers(min_value=2, max_value=12),
    grouped=st.booleans(),
)
def test_pane_path_equals_naive_path(spark_session_holder, slide, ratio, grouped):
    spark, events = spark_session_holder
    size = slide * ratio
    keys = ["event_type"] if grouped else []
    pane = windowed_agg(events, "ts", size, slide, AGGS, keys, use_panes=True)
    naive = windowed_agg(events, "ts", size, slide, AGGS, keys, use_panes=False)
    ok, msg = rows_match(pane.collect(), naive.collect(), float_tol=1e-9)
    assert ok, f"size={size} slide={slide} grouped={grouped}: {msg}"


import pytest


@pytest.fixture(scope="module")
def spark_session_holder(spark, events):
    # hypothesis can't take function-scoped fixtures; bundle session-scoped
    return spark, events.cache()
