"""HTML → text extraction (functions/html.py): cross-engine agreement
on adversarial fragments, plan purity, and the extraction semantics."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from lightsaber_spark.functions.html import duckdb_html_to_text, html_to_text

# adversarial fragments: script bodies containing fake close tags and
# comparison operators, attribute quotes around '>', double-escaped
# entities, bare '<'/'>' in prose, NULL/empty inputs, case variance
_SAMPLES = [
    '<html><head><title>T</title><style>p { color: "x"; }</style>'
    '<script>var a = 1 < 2 && "</div>";</script></head>'
    "<body><!-- c1 --><h1>Head &amp; shoulders</h1><p>first  para</p>"
    "<p>a<b>b</b>c &lt;tag&gt; &amp;lt;keep&amp;gt; &quot;q&#39;s&quot;&nbsp;end</p>"
    '<ul><li>one</li><li >two</li></ul><br/><div class="z">block</div>'
    "tail</body></html>",
    None,
    "",
    "no tags at all",
    '<p>unclosed <Weird-Tag attr=">">x',
    "a < b and c > d & e",
    "<P>UPPER</P><SCRIPT>s</SCRIPT>ok",
    "<p>\n  multi\n\n  line\t text  </p>\n\n",
    "&amp;amp; stays single-decoded",
    # Unicode case-variant tag names (U+017F LATIN SMALL LETTER LONG S,
    # U+0130 İ): Java's (?i) folds ASCII only, RE2's folds Unicode — the
    # _ci() explicit-class spelling makes both engines treat these as
    # generic tags (body KEPT), not script/style elements
    "<ſcript>kept-by-both</ſcript>ok<STİLE>also kept</STİLE>",
    "<DİV>not-a-block</DİV>end",
]


def test_html_extraction_matches_duckdb(spark):
    con = duckdb.connect()
    want = [
        r[0]
        for r in con.execute(
            "SELECT " + duckdb_html_to_text("h") + " FROM (SELECT unnest(?) AS h)",
            [_SAMPLES],
        ).fetchall()
    ]
    df = spark.createDataFrame([(s,) for s in _SAMPLES], "h string")
    got = [r[0] for r in df.select(html_to_text(F.col("h"))).collect()]
    assert got == want


def test_html_extraction_semantics(spark):
    df = spark.createDataFrame([(s,) for s in _SAMPLES], "h string")
    got = [r[0] for r in df.select(html_to_text(F.col("h"))).collect()]
    first = got[0]
    assert "script" not in first and "color" not in first  # content dropped
    assert "c1" not in first  # comment dropped
    assert "Head & shoulders" in first  # entity decoded
    assert "&lt;keep&gt;" in first  # double-escape decoded exactly once
    assert "a b c" in first  # inline tag did not glue words
    assert "first para" in first  # space run collapsed
    assert "one\ntwo" in first  # block tags kept line structure
    assert got[1] == "" and got[2] == ""  # NULL html = empty text
    assert got[3] == "no tags at all"
    assert got[7] == "multi\nline text"  # edge newlines stripped
    assert got[8] == "&amp; stays single-decoded"
    # Unicode case-variant tag names are generic tags on BOTH engines:
    # bodies kept, tags become spaces (ADVICE r14 — (?i) drift killed)
    assert got[9] == "kept-by-both ok also kept"
    assert got[10] == "not-a-block end"


def test_streaming_html_extract_dedup_matches_batch(spark, tmp_path):
    """The family's streaming rung: crawl pages arrive as a stream,
    text is extracted per row (stateless Catalyst — no state needed)
    and exact-duplicate extractions are dropped on the text hash
    (different boilerplate around the same body dedups together). Kept
    set must equal the batch extract→dedup over the same corpus."""
    import time as _t

    from lightsaber_spark.functions.dedup import shingle_hash
    from lightsaber_spark.streaming import read_stream
    from lightsaber_spark.streaming.stream import streaming_dedup

    src = str(tmp_path / "pages")
    wrappers = [
        "<html><body><p>{0}</p></body></html>",
        '<html><head><script>track("{1}")</script>'
        "<style>div {{ margin: 0; }}</style></head>"
        "<body><!-- v2 --><div>{0}</div></body></html>",
    ]

    def write_file(w, pages):
        rows = [
            (p * 10 + w, wrappers[w].format(f"body text {p}", p))
            for p in pages
        ]
        spark.createDataFrame(rows, "page_id long, html string").coalesce(
            1
        ).write.mode("append").parquet(src)
        _t.sleep(1.1)  # distinct mtimes → deterministic replay order

    write_file(0, range(12))
    write_file(1, range(18))  # 0..11 re-crawled with other boilerplate

    def extract(df):
        return df.select(
            "page_id", html_to_text(F.col("html")).alias("text")
        ).withColumn("text_h", shingle_hash(F.col("text")))

    stream = extract(
        read_stream(
            spark, src, "page_id long, html string", max_files_per_trigger=1
        )
    )
    q = (
        streaming_dedup(stream, ["text_h"])
        .writeStream.format("parquet")
        .option("path", str(tmp_path / "kept"))
        .option("checkpointLocation", str(tmp_path / "ck"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    got = sorted(
        (r.page_id, r.text)
        for r in spark.read.parquet(str(tmp_path / "kept")).collect()
    )
    want = sorted(
        (r.page_id, r.text)
        for r in extract(spark.read.parquet(src))
        .groupBy("text_h")
        .agg(F.min_by(F.struct("page_id", "text"), "page_id").alias("s"))
        .select("s.page_id", "s.text")
        .collect()
    )
    assert got == want and len(got) == 18


def test_streaming_link_frontier_matches_batch(spark, tmp_path):
    """Frontier rung (r14 verdict #3): pages stream in, every
    double-quoted absolute <a href> is extracted and canonicalized,
    and each CANONICAL url is emitted exactly once across
    micro-batches — re-crawled spellings (www./tracking-param/scheme
    noise) and relative/single-quoted hrefs never re-enqueue. Emitted
    canonical-URL set must equal the batch extract→canonical-distinct
    over the same corpus."""
    import time as _t

    from lightsaber_spark.functions.html import extract_hrefs
    from lightsaber_spark.functions.urls import canonicalized_docs
    from lightsaber_spark.streaming import read_stream
    from lightsaber_spark.streaming.stream import streaming_html_link_frontier

    src = str(tmp_path / "pages")

    def page(links):
        body = "".join(
            f'<a href="{u}">l</a>' if u else "<a name=\"x\">n</a>"
            for u in links
        )
        return f"<html><body>{body}</body></html>"

    batches = [
        [
            (0, page(["http://example.com/a?utm_source=f",
                      "https://foo.co.uk/b", "/relative/1"])),
            (1, page(["https://www.example.com/a", None])),
        ],
        [
            # re-spellings of batch-0 urls + one genuinely new
            (2, page(["HTTPS://EXAMPLE.com/a#frag",
                      "http://foo.co.uk/b/", "https://new.example.org/c"])),
        ],
    ]
    for rows in batches:
        spark.createDataFrame(rows, "doc_id long, html string").coalesce(
            1
        ).write.mode("append").parquet(src)
        _t.sleep(1.1)

    stream = read_stream(
        spark, src, "doc_id long, html string", max_files_per_trigger=1
    )
    q = (
        streaming_html_link_frontier(stream)
        .writeStream.format("parquet")
        .option("path", str(tmp_path / "frontier"))
        .option("checkpointLocation", str(tmp_path / "ck"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    emitted = spark.read.parquet(str(tmp_path / "frontier")).collect()
    got = {(r.canonical_url, r.domain) for r in emitted}
    assert len(emitted) == len(got)  # exactly once per canonical url

    links = (
        spark.read.parquet(src)
        .select(
            "doc_id", F.explode(extract_hrefs(F.col("html"))).alias("u")
        )
        .filter(F.col("u").rlike(r"^[A-Za-z][A-Za-z0-9+.-]*://"))
    )
    want = {
        (r.canonical_url, r.domain)
        for r in canonicalized_docs(links, url_col="u")
        .select("canonical_url", "domain")
        .distinct()
        .collect()
    }
    assert got == want
    # canonical identities really collapsed the spellings: 3 urls, and
    # the relative / single-less / no-href anchors never enqueued
    assert len(got) == 3, sorted(got)


def test_html_extraction_plan_is_pure_codegen(spark):
    """Same contract as canonical_url: zero Python in the plan, and the
    whole chain inside whole-stage codegen (NO_CODEGEN audit clean)."""
    from lightsaber_spark.plan_audit import codegen_flags, formatted_plan

    import __spark_entry__ as entrymod
    from tests.conftest import SF_DIR

    df = entrymod.queries()["html_text_extraction"](spark, SF_DIR)
    p = formatted_plan(df, adaptive=False)
    assert "ArrowEvalPython" not in p and "BatchEvalPython" not in p
    assert not codegen_flags(p), p[:800]
