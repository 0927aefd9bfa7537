"""Property-based check of URL canonicalization.

For ANY structured URL assembled from random components (scheme case,
www prefix, host case, path segments, trailing slashes, shuffled
mixtures of tracking and content params, fragments), `canonical_url`
must equal a direct pure-Python model of the rules — and all noise
axes must be invisible: two spellings differing only in scheme, case,
www, trailing slashes, param order, tracking params, or fragment must
canonicalize identically.
"""

from __future__ import annotations

import pytest
from hypothesis import given, settings, strategies as st

from pyspark.sql import functions as F

from lightsaber_spark.functions.urls import (
    TRACKING_PARAM_NAMES,
    TRACKING_PREFIX,
    canonical_url,
)

_hosts = st.sampled_from(
    ["example.com", "News.Example.com", "a.b.example.org", "EXAMPLE.NET"]
)
_schemes = st.sampled_from(["http", "https", "HTTP", "HTTPS", "Ftp"])
_segs = st.lists(
    st.sampled_from(["p", "P", "a1", "x", "docs"]), max_size=3
)
_content_params = st.lists(
    st.sampled_from(["id=1", "id=2", "q=Xy", "page=3", "refresh=1", "utmx=2"]),
    max_size=3,
    unique=True,
)
_tracking_params = st.lists(
    st.sampled_from(
        ["utm_source=a", "utm_campaign=B", "fbclid=zZ9", "gclid=1", "ref=tw",
         "msclkid=m"]
    ),
    max_size=3,
    unique=True,
)


@pytest.fixture(scope="module")
def spark_holder(spark):
    # hypothesis can't take function-scoped fixtures
    return spark


def _model(scheme, www, host, segs, slashes, params, frag, port=""):
    """Pure-Python model of the documented canonicalization rules."""
    h = (host + port).lower()
    if h.endswith(":80") or h.endswith(":443"):
        h = h.rsplit(":", 1)[0]
    if h.startswith("www."):
        h = h[4:]
    path = "".join("/" + s for s in segs)
    kept = sorted(
        p
        for p in params
        if p
        and not p.startswith(TRACKING_PREFIX)
        and p.split("=", 1)[0] not in TRACKING_PARAM_NAMES
    )
    return h + path + ("?" + "&".join(kept) if kept else "")


@settings(max_examples=12, deadline=None)
@given(
    scheme=_schemes,
    www=st.booleans(),
    userinfo=st.sampled_from(["", "bob@", "u:Pw9@"]),
    host=_hosts,
    port=st.sampled_from(["", ":80", ":443", ":8080"]),
    segs=_segs,
    slashes=st.integers(min_value=0, max_value=3),
    content=_content_params,
    tracking=_tracking_params,
    shuffle_seed=st.integers(min_value=0, max_value=5),
    frag=st.sampled_from(["", "#top", "#Sec2"]),
)
def test_canonical_url_equals_python_model(
    spark_holder, scheme, www, userinfo, host, port, segs, slashes,
    content, tracking, shuffle_seed, frag,
):
    spark = spark_holder
    import random

    params = list(content) + list(tracking)
    random.Random(shuffle_seed).shuffle(params)
    raw = (
        scheme
        + "://"
        + userinfo
        + ("www." if www else "")
        + host
        + port
        + "".join("/" + s for s in segs)
        + "/" * slashes
        + ("?" + "&".join(params) if params else "")
        + frag
    )
    want = _model(scheme, www, host, segs, slashes, params, frag, port=port)

    df = spark.createDataFrame([(raw,)], "url string")
    got = df.select(canonical_url(F.col("url")).alias("c")).collect()[0].c
    assert got == want, (raw, got, want)

    # noise invariance: a second spelling with flipped noise axes
    # canonicalizes identically (default ports are interchangeable
    # with no port; a non-default port is identity and must stay)
    port2 = ":8080" if port == ":8080" else {"": ":80", ":80": ":443", ":443": ""}[port]
    raw2 = (
        scheme.swapcase()
        + "://"
        + ("" if userinfo else "alice:s3c@")
        + ("" if www else "www.")
        + host.swapcase()
        + port2
        + "".join("/" + s for s in segs)
        + "/" * (3 - slashes)
        + ("?" + "&".join(reversed(params)) if params else "")
        + ("" if frag else "#alt")
    )
    got2 = (
        spark.createDataFrame([(raw2,)], "url string")
        .select(canonical_url(F.col("url")).alias("c"))
        .collect()[0]
        .c
    )
    assert got2 == want, (raw2, got2, want)
