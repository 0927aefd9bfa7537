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
    MULTI_LABEL_PUBLIC_SUFFIXES,
    PSL_WILDCARD_EXCEPTIONS,
    PSL_WILDCARD_TLDS,
    THREE_LABEL_PUBLIC_SUFFIXES,
    TRACKING_PARAM_NAMES,
    TRACKING_PREFIX,
    canonical_url,
    registrable_domain,
)

_hosts = st.sampled_from(
    ["example.com", "News.Example.com", "a.b.example.org", "EXAMPLE.NET",
     "foo.co.uk", "www-less.Sub.Example.CO.UK",
     # hosts whose www. must NOT strip (remainder is a public suffix)
     "co.uk", "Foo.CK", "k12.ca.us", "COM"]
)
_schemes = st.sampled_from(["http", "https", "HTTP", "HTTPS", "Ftp"])
# segments include percent-escape shapes: unreserved (decodes), its
# decoded twin, reserved (stays, hex uppercased), invalid (literal)
_segs = st.lists(
    st.sampled_from(["p", "P", "a1", "x", "docs",
                     "x%7Ey", "x%7ey", "x~y", "f%2fg", "b%zzq", "%41B"]),
    max_size=3,
)
# 'ref' is content-bearing and must survive canonicalization
_content_params = st.lists(
    st.sampled_from(["id=1", "id=2", "q=Xy", "page=3", "refresh=1", "utmx=2",
                     "ref=tw", "v=%31x"]),
    max_size=3,
    unique=True,
)
_tracking_params = st.lists(
    st.sampled_from(
        ["utm_source=a", "utm_campaign=B", "fbclid=zZ9", "gclid=1",
         "msclkid=m", "%75tm_x=1"]
    ),
    max_size=3,
    unique=True,
)

_UNRESERVED_CPS = (
    set(range(48, 58)) | set(range(65, 91)) | set(range(97, 123))
    | {45, 46, 95, 126}
)


def _pct_model(s: str) -> str:
    """Pure-Python twin of `pct_normalize` (RFC 3986 §2.3/§6.2.2.1)."""
    parts = s.split("%")
    out = [parts[0]]
    for seg in parts[1:]:
        h = seg[:2]
        if len(h) == 2 and all(c in "0123456789abcdefABCDEF" for c in h):
            cp = int(h, 16)
            if cp in _UNRESERVED_CPS:
                out.append(chr(cp) + seg[2:])
            else:
                out.append("%" + h.upper() + seg[2:])
        else:
            out.append("%" + seg)
    return "".join(out)


@pytest.fixture(scope="module")
def spark_holder(spark):
    # hypothesis can't take function-scoped fixtures
    return spark


def _strip_www(h: str) -> str:
    """Pure-Python twin of `_host`'s www rule: one leading ``www.``
    strips UNLESS the host is a PSL exception name or the remainder
    would be a bare public suffix (single label, two-label/three-label
    suffix table hit, or a two-label name under a wildcard TLD that is
    not an exception)."""
    if not h.startswith("www.") or h in PSL_WILDCARD_EXCEPTIONS:
        return h
    bare = h[4:]
    labels = bare.split(".")
    bare_is_suffix = (
        "." not in bare
        or bare in MULTI_LABEL_PUBLIC_SUFFIXES
        or bare in THREE_LABEL_PUBLIC_SUFFIXES
        or (
            len(labels) == 2
            and labels[-1] in PSL_WILDCARD_TLDS
            and bare not in PSL_WILDCARD_EXCEPTIONS
        )
    )
    return h if bare_is_suffix else bare


def _model(scheme, www, host, segs, slashes, params, frag, port=""):
    """Pure-Python model of the documented canonicalization rules.
    Percent-normalization runs FIRST on the whole URL; since unreserved
    escapes never decode to a delimiter, normalizing each component is
    equivalent — and the param filter sees the NORMALIZED spelling
    (an escaped `%75tm_` prefix is still tracking)."""
    # pipeline order: pct-normalize first, THEN host case-fold
    h = _pct_model(("www." if www else "") + host + port).lower()
    if h.endswith(":80") or h.endswith(":443"):
        h = h.rsplit(":", 1)[0]
    h = _strip_www(h)
    path = "".join("/" + _pct_model(s) for s in segs)
    norm = [_pct_model(p) for p in params]
    kept = sorted(
        p
        for p in norm
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
    # with no port; a non-default port is identity and must stay).
    # The www axis flips ONLY where www is actually noise — on a host
    # that is itself a public suffix, www.<host> is a DIFFERENT page
    # (the registrable site) by design, so that axis stays put.
    hlow = _pct_model(host + port).lower()
    if hlow.endswith(":80") or hlow.endswith(":443"):
        hlow = hlow.rsplit(":", 1)[0]
    www_is_noise = _strip_www("www." + hlow) != "www." + hlow
    www2 = (not www) if www_is_noise else www
    port2 = ":8080" if port == ":8080" else {"": ":80", ":80": ":443", ":443": ""}[port]
    raw2 = (
        scheme.swapcase()
        + "://"
        + ("" if userinfo else "alice:s3c@")
        + ("www." if www2 else "")
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


def _domain_model(host):
    """Pure-Python twin of `registrable_domain`'s PSL ladder: IP →
    exception → three-label suffix → wildcard TLD → two-label suffix →
    default two labels (bare suffix hosts fall back to themselves)."""
    import re

    h = host.lower()
    if h.endswith(":80") or h.endswith(":443"):
        h = h.rsplit(":", 1)[0]
    h = _strip_www(h)
    if re.fullmatch(r"\d{1,3}(\.\d{1,3}){3}(:\d+)?", h) or h.startswith("["):
        return h
    labels = h.split(".")
    last2 = ".".join(labels[-2:])
    if last2 in PSL_WILDCARD_EXCEPTIONS:
        return last2
    if ".".join(labels[-3:]) in THREE_LABEL_PUBLIC_SUFFIXES:
        return ".".join(labels[-4:]) if len(labels) >= 4 else ".".join(labels[-3:])
    if labels[-1] in PSL_WILDCARD_TLDS:
        return ".".join(labels[-3:]) if len(labels) >= 3 else last2
    if last2 in MULTI_LABEL_PUBLIC_SUFFIXES and len(labels) >= 3:
        return ".".join(labels[-3:])
    return last2


_PSL_PROPERTY_HOSTS = [
    "example.com", "News.Example.com", "foo.co.uk", "Sub.Foo.CO.UK",
    "co.uk", "shop.example.com.au", "x.gov.au", "example.de",
    "a.b.example.org", "1.2.3.4", "10.0.0.1:8080", "192.168.0.1:443",
    "[2001:db8::1]",
    # PSL wildcard (*.ck): 2-label = bare suffix, 3+ labels = last3
    "foo.ck", "shop.Foo.CK", "a.b.foo.ck", "things.np",
    # PSL exception (!www.ck): itself and anything beneath it
    "www.ck", "pages.www.ck", "a.pages.www.ck",
    # three-label US locality suffixes: last FOUR labels
    "k12.ca.us", "District.K12.CA.US", "hs.district.k12.ca.us",
    "lib.ny.us", "branch.lib.ny.us",
    # bare/single-label hosts fall back to themselves; with the
    # www prefix they are registrable sites and must KEEP it
    "ck", "localhost", "co.uk", "things.np",
]


def test_registrable_domain_public_suffix_property(spark):
    """Hosts under every PSL rule class (two-label suffix, three-label
    suffix, wildcard, exception, IP literal) must match the pure-Python
    PSL-ladder model; bare suffix hosts fall back to themselves.

    r16: the FULL cartesian product (scheme × www × host × path, ~320
    cases) runs as ONE batched select — the old hypothesis form
    collected one row per sampled example, paying the PSL ladder's
    big-literal ColumnNode→JVM conversion (~10 s, CLAUDE.md) per
    example: 14 samples cost 197 s where the exhaustive batch costs
    one conversion and covers every combination deterministically."""
    cases = [
        (scheme, www, host, path)
        for scheme in ("http", "HTTPS")
        for www in (False, True)
        for host in _PSL_PROPERTY_HOSTS
        for path in ("", "/a", "/a/b")
    ]
    rows = [
        (i, s + "://" + ("www." if w else "") + h + p)
        for i, (s, w, h, p) in enumerate(cases)
    ]
    df = spark.createDataFrame(rows, "i long, url string")
    got = {
        r.i: r.d
        for r in df.select(
            "i", registrable_domain(F.col("url")).alias("d")
        ).collect()
    }
    for i, (s, w, h, p) in enumerate(cases):
        want = _domain_model(("www." if w else "") + h)
        assert got[i] == want, (s, w, h, p, got[i], want)


@settings(max_examples=60, deadline=None)
@given(
    label=st.text(
        alphabet=st.one_of(
            st.characters(min_codepoint=ord("a"), max_codepoint=ord("z")),
            st.characters(min_codepoint=0x00E0, max_codepoint=0x00FF),  # latin-1 letters
            st.characters(min_codepoint=0x0430, max_codepoint=0x044F),  # cyrillic
            st.characters(min_codepoint=0x3041, max_codepoint=0x3093),  # hiragana
            st.characters(min_codepoint=0x4E00, max_codepoint=0x4E80),  # CJK slice
        ),
        min_size=1,
        max_size=12,
    )
)
def test_punycode_property_matches_stdlib(label):
    """Property fuzz of the RFC 3492 encoder: for ANY lowercase letter
    label drawn from mixed scripts, our ACE form equals the stdlib IDNA
    codec's ToASCII (inputs the stdlib rejects — e.g. nameprep
    prohibited output — are skipped: the encoder's scope is the
    post-mapping encode step)."""
    from hypothesis import assume

    from lightsaber_spark.functions.urls import idn_label_to_ascii

    try:
        want = label.encode("idna").decode("ascii")
    except UnicodeError:
        assume(False)
        return
    # stdlib applies nameprep; restrict the property to labels nameprep
    # maps to themselves so the comparison isolates the ENCODER
    import encodings.idna as _idna

    assume(_idna.nameprep(label) == label)
    assert idn_label_to_ascii(label) == want, label
