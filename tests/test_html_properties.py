"""Property test: the Spark and DuckDB HTML→text pipelines agree over
a generated tag-soup space far wider than the fixed adversarial set in
test_html.py (the same cross-engine-agreement property the driver's
value hash checks on the synthesized corpus, here over hostile
structure: nested/unclosed/cased tags, entity pile-ups, script bodies
full of fake delimiters)."""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from lightsaber_spark.functions.html import duckdb_html_to_text, html_to_text


@pytest.fixture(scope="module")
def spark_holder(spark):
    # hypothesis can't take function-scoped fixtures
    return spark


_text_atoms = st.sampled_from(
    [
        "plain words",
        "a < b",
        "c > d",
        "e & f",
        "&amp;lt;",
        "&quot;q&#39;",
        "&nbsp;",
        "  spaced\tout  ",
        "multi\nline",
        "",
    ]
)

_tags = st.sampled_from(
    [
        ("<p>", "</p>"),
        ("<P class='x'>", "</P>"),
        ("<div>", "</div>"),
        ("<b>", "</b>"),
        ("<li >", "</li>"),
        ("<h2 id=\"t\">", "</h2>"),
        ("<span>", ""),  # unclosed
        ("", "</table>"),  # stray close
        ("<br/>", ""),
        ('<a href="u?x=1&y=2">', "</a>"),
    ]
)

_hostile = st.sampled_from(
    [
        '<script>if (a < b && "</div>") { x(); }</script>',
        "<style>p > li { content: '</p>'; }</style>",
        "<!-- <p>commented out</p> -->",
        '<img src="x.png" alt="a > b"/>',
        "<SCRIPT TYPE='text/js'>1<2</SCRIPT>",
    ]
)


@st.composite
def _documents(draw):
    n = draw(st.integers(min_value=1, max_value=8))
    parts = []
    for _ in range(n):
        kind = draw(st.integers(min_value=0, max_value=2))
        if kind == 0:
            parts.append(draw(_text_atoms))
        elif kind == 1:
            o, c = draw(_tags)
            parts.append(o + draw(_text_atoms) + c)
        else:
            parts.append(draw(_hostile))
    return "".join(parts)


@settings(max_examples=16, deadline=None)
@given(html=_documents())
def test_html_extraction_cross_engine_property(spark_holder, html):
    spark = spark_holder
    con = duckdb.connect()
    want = con.execute(
        "SELECT " + duckdb_html_to_text("?")
    , [html]).fetchone()[0]
    got = (
        spark.createDataFrame([(html,)], "h string")
        .select(html_to_text(F.col("h")).alias("t"))
        .collect()[0]
        .t
    )
    assert got == want, (html, got, want)
