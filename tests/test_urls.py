"""URL canonicalization unit tests — each rule exercised on explicit
fixture URLs (the oracle twin verifies the corpus-scale behavior; these
pin the per-rule edge cases)."""

from __future__ import annotations

from pyspark.sql import functions as F

from lightsaber_spark.functions.urls import (
    canonical_url,
    canonical_url_dedup,
    registrable_domain,
)


def _canon(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    return [
        r.c
        for r in df.select(canonical_url(F.col("url")).alias("c")).collect()
    ]


def test_canonical_url_rules(spark):
    cases = {
        # scheme dropped, host case folded, www stripped
        "HTTPS://WWW.Example.COM/a": "example.com/a",
        "http://example.com/a": "example.com/a",
        # fragment dropped
        "http://example.com/a#sec2": "example.com/a",
        # trailing slashes stripped (also multiple)
        "http://example.com/a/": "example.com/a",
        "http://example.com/a///": "example.com/a",
        # root path collapses to bare host
        "http://example.com/": "example.com",
        "http://example.com": "example.com",
        # tracking params dropped; survivors sorted; bare ? dropped
        "http://example.com/a?utm_source=x&b=2&a=1": "example.com/a?a=1&b=2",
        "http://example.com/a?fbclid=zz&gclid=q": "example.com/a",
        "http://example.com/a?ref=tw&id=3": "example.com/a?id=3",
        # param ORDER is transport noise
        "http://example.com/a?b=2&a=1": "example.com/a?a=1&b=2",
        # path case preserved (case-sensitive on real servers)
        "http://example.com/A": "example.com/A",
        # param value case preserved
        "http://example.com/a?id=X": "example.com/a?id=X",
        # userinfo dropped; default ports dropped, other ports kept
        "http://bob:pw@example.com/a": "example.com/a",
        "http://example.com:80/a": "example.com/a",
        "https://example.com:443/a": "example.com/a",
        "http://example.com:8080/a": "example.com:8080/a",
        "http://u@www.Example.COM:443/a/": "example.com/a",
    }
    got = _canon(spark, list(cases))
    for (raw, want), c in zip(cases.items(), got):
        assert c == want, (raw, c, want)


def test_registrable_domain(spark):
    df = spark.createDataFrame(
        [("https://www.sub.news.example.com/x",), ("http://example.org/",)],
        "url string",
    )
    got = [
        r.d
        for r in df.select(
            registrable_domain(F.col("url")).alias("d")
        ).collect()
    ]
    assert got == ["example.com", "example.org"]


def test_canonical_url_dedup_groups(spark):
    # four spellings of one page + one distinct page
    df = spark.createDataFrame(
        [
            (1, "http://www.example.com/p/1?utm_source=a"),
            (2, "https://example.com/p/1/"),
            (3, "HTTP://EXAMPLE.com/p/1#frag"),
            (4, "http://example.com/p/1?fbclid=x9"),
            (5, "http://example.com/p/2"),
        ],
        "doc_id long, url string",
    )
    rows = {
        r.canonical_url: (r.n_docs, r.rep_doc_id)
        for r in canonical_url_dedup(df).collect()
    }
    assert rows == {
        "example.com/p/1": (4, 1),
        "example.com/p/2": (1, 5),
    }
