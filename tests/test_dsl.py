"""Reference-shaped DSL: construction + compile-to-DataFrame parity.

Shapes taken from the reference's own test/benchmark constructions
(e.g. CM2.cpp:24-39, LRB1.cpp:23-51)."""

from pyspark.sql import functions as F

from lightsaber_spark.dsl import (
    Aggregation,
    AggregationType,
    ANDPredicate,
    BasicType,
    ColumnReference,
    ComparisonPredicate,
    DoubleConstant,
    StringConstant,
    HavingClause,
    IntConstant,
    LongConstant,
    Projection,
    Query,
    QueryApplication,
    Selection,
    StaticHashJoin,
    TupleSchema,
    WindowDefinition,
    WindowMeasure,
    EQ, GT, LT,
)
from lightsaber_spark.dsl.expressions import Division


def test_tuple_schema_defaults():
    s = TupleSchema([BasicType.Long, BasicType.Integer, BasicType.Float])
    assert s.names == ["timestamp", "atr_1", "atr_2"]
    st = s.to_struct_type()
    assert [f.name for f in st.fields] == s.names


def test_window_definition_panes():
    w = WindowDefinition(WindowMeasure.RANGE_BASED, 60, 1)
    assert w.pane_size() == 1 and w.number_of_panes() == 60
    w2 = WindowDefinition(WindowMeasure.RANGE_BASED, 900, 600)
    assert w2.pane_size() == 300


def test_cm2_shaped_query(events, duck):
    """CM2 (CM2.cpp:24-39): WHERE eventType==x → sum GROUP BY jobId,
    window(60,1) — mapped onto events columns by name."""
    q = Query(0, [
        Selection(ComparisonPredicate(EQ, ColumnReference("event_type"),
                                      StringConstant("click"))),
        Aggregation(
            WindowDefinition(WindowMeasure.RANGE_BASED, 3600, 3600),
            [AggregationType.SUM], [ColumnReference("value")],
            [ColumnReference("user_id")],
            ts_column="ts",
        ),
    ])
    out = q.compile(events)
    assert out.columns == ["window_start", "user_id", "sum_value"]
    d = duck.execute("""
        SELECT count(*) FROM (
          SELECT (epoch_us(ts) // 3600000000) * 3600, user_id, sum(value)
          FROM events WHERE event_type = 'click' GROUP BY 1, 2)
    """).fetchone()[0]
    assert out.count() == d


def test_lrb1_shaped_query_with_derived_key_and_having(events):
    """LRB1 (LRB1.cpp:23-51): derived key via integer division +
    HAVING avg < threshold."""
    segment = Division(ColumnReference("user_id"), IntConstant(10))
    q = Query(1, [
        Aggregation(
            WindowDefinition(WindowMeasure.RANGE_BASED, 3600, 3600),
            [AggregationType.AVG], [ColumnReference("value")],
            [segment], ts_column="ts",
        ),
        HavingClause(ComparisonPredicate(LT, ColumnReference("avg_value"),
                                         DoubleConstant(100.0))),
    ])
    out = q.compile(events)
    assert out.columns == ["window_start", "key_0", "avg_value"]
    assert out.filter(F.col("avg_value") >= 100).count() == 0
    # integer division semantics: key is 0..14 for user_id 0..149
    keys = {r.key_0 for r in out.select("key_0").distinct().collect()}
    assert keys <= set(range(15))


def test_projection_with_arithmetic(events):
    p = Projection([
        ColumnReference("ts"),
        ColumnReference("value") * DoubleConstant(2.0),
        ColumnReference("user_id") + LongConstant(1000),
    ], names=["ts", "double_value", "shifted_user"])
    out = p.apply(events)
    assert out.columns == ["ts", "double_value", "shifted_user"]
    row = out.first()
    assert row.shifted_user >= 1000


def test_and_or_predicates(events):
    pred = ANDPredicate([
        ComparisonPredicate(GT, ColumnReference("value"), DoubleConstant(10.0)),
        ComparisonPredicate(EQ, ColumnReference("event_type"), StringConstant("view")),
    ])
    out = Selection(pred).apply(events)
    assert out.filter((F.col("value") <= 10) | (F.col("event_type") != "view")).count() == 0


def test_query_dag_connect_to(events):
    """Two chained queries (Query::connectTo, Query.h:111): windowed agg
    then a having-style downstream filter."""
    q1 = Query(0, [
        Aggregation(WindowDefinition(WindowMeasure.RANGE_BASED, 3600, 3600),
                    [AggregationType.CNT], [ColumnReference("value")],
                    [ColumnReference("event_type")], ts_column="ts"),
    ])
    q2 = Query(1, [
        Selection(ComparisonPredicate(GT, ColumnReference("count_value"),
                                      IntConstant(5))),
    ])
    q1.connect_to(q2)
    app = QueryApplication([q1, q2])
    results = app.run({0: events})
    assert results[1].filter(F.col("count_value") <= 5).count() == 0


def test_theta_join_dsl(events):
    """DSL ThetaJoin (ThetaJoin.h:18-819): two-stream join with a
    comparison predicate + the implicit window time bound."""
    from lightsaber_spark.dsl import GT, ThetaJoin

    l = events.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("err_id"), F.col("ts").alias("l_ts"),
        F.col("value").alias("l_value"),
    )
    r = events.filter(F.col("event_type") == "click").select(
        F.col("ts").alias("r_ts"), F.col("value").alias("r_value")
    )
    w = WindowDefinition(WindowMeasure.RANGE_BASED, 120, 120)
    tj = ThetaJoin(
        ComparisonPredicate(GT, ColumnReference("r_value"), ColumnReference("l_value"))
    ).setup(r, w, w, left_ts="l_ts", right_ts="r_ts")
    out = tj.apply(l)
    got = out.filter(
        (F.col("r_value") <= F.col("l_value"))
        | (F.abs(F.col("r_ts").cast("double") - F.col("l_ts").cast("double")) > 120)
    ).count()
    assert got == 0
    assert out.count() > 0


def test_noop_dsl(events):
    from lightsaber_spark.dsl import NoOp

    out = NoOp().apply(events)
    assert out.columns == events.columns
    assert out.count() == events.count()


def test_static_hash_join_dsl(tables):
    ev = tables["events"]
    dim = tables["customer"].select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    out = StaticHashJoin(dim, "user_id").apply(ev)
    assert "c_mktsegment" in out.columns
    assert out.count() > 0


def test_post_window_operation_dsl(events):
    """NBQ5 assembled exactly as the reference does (Aggregation with
    setPostWindowOperation, NBQ5.cpp:20-44): windowed count per key →
    per-window argmax, ties kept."""
    from lightsaber_spark.dsl import (
        Aggregation, AggregationType, ColumnReference, PostWindowOperation,
        Query, WindowDefinition, WindowMeasure,
    )

    q = Query(0, [
        Aggregation(
            WindowDefinition(WindowMeasure.RANGE_BASED, 3600, 3600),
            [AggregationType.CNT], [ColumnReference("event_id")],
            [ColumnReference("user_id")], ts_column="ts",
        ),
        PostWindowOperation("user_id", "count_event_id"),
    ])
    out = q.compile(events)
    rows = out.collect()
    assert len(rows) > 0
    # every emitted row is a per-window maximum
    counts = (
        events.groupBy(
            F.floor(F.unix_micros("ts") / 3_600_000_000).alias("w"), "user_id"
        ).count().collect()
    )
    best = {}
    for r in counts:
        best[r.w * 3600] = max(best.get(r.w * 3600, 0), r["count"])
    for r in rows:
        assert r["count_event_id"] == best[r["window_start"]]
