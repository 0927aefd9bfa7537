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
        # PSL exception host: www. is the domain's own label, NOT noise
        "http://WWW.CK/x": "www.ck/x",
        "http://www.www.ck/x": "www.ck/x",
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
        # 'ref' is content-bearing (branch refs, pagination) — KEPT
        "http://example.com/a?ref=tw&id=3": "example.com/a?id=3&ref=tw",
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
        # RFC 3986 percent-normalization: unreserved escapes decode
        # (either hex case), reserved escapes stay with UPPER hex,
        # invalid escapes and a lone trailing % pass through literally
        "http://example.com/x%7Ey": "example.com/x~y",
        "http://example.com/x%7ey": "example.com/x~y",
        "http://example.com/x~y": "example.com/x~y",
        "http://example.com/f%2fg": "example.com/f%2Fg",
        "http://example.com/b%zzq": "example.com/b%zzq",
        "http://example.com/%41B%": "example.com/AB%",
        "http://example.com/a?id=%41": "example.com/a?id=A",
        # %75tm_source decodes to utm_source BEFORE the param filter
        "http://example.com/a?%75tm_source=x&id=1": "example.com/a?id=1",
    }
    got = _canon(spark, list(cases))
    for (raw, want), c in zip(cases.items(), got):
        assert c == want, (raw, c, want)


def test_registrable_domain(spark):
    cases = {
        "https://www.sub.news.example.com/x": "example.com",
        "http://example.org/": "example.org",
        # multi-label public suffixes take THREE labels
        "http://foo.co.uk/a": "foo.co.uk",
        "https://www.Sub.Foo.CO.UK/a": "foo.co.uk",
        "http://shop.example.com.au/": "example.com.au",
        # a bare suffix host has no registrable domain below it —
        # falls back to the two-label value
        "http://co.uk/": "co.uk",
        # single-label-suffix ccTLD stays on the two-label rule
        "http://www.example.de/": "example.de",
        # PSL WILDCARD (*.ck): every 2nd-level name is a public suffix
        # -> last THREE labels; a bare 2-label host falls back to itself
        "http://shop.foo.ck/a": "shop.foo.ck",
        "http://x.shop.foo.ck/a": "shop.foo.ck",
        "http://foo.ck/": "foo.ck",
        "http://deals.things.np/": "deals.things.np",
        # PSL EXCEPTION (!www.ck): www.ck IS the registrable domain —
        # for itself (www. must NOT be stripped) and anything beneath
        "http://www.ck/": "www.ck",
        "http://pages.www.ck/": "www.ck",
        "http://a.pages.WWW.CK/": "www.ck",
        # three-label US locality suffixes -> last FOUR labels
        "http://district.k12.ca.us/": "district.k12.ca.us",
        "http://hs.district.k12.ca.us/": "district.k12.ca.us",
        "http://www.branch.lib.ny.us/": "branch.lib.ny.us",
        "http://k12.ca.us/": "k12.ca.us",
        # IP literals have no registrable domain (PSL semantics):
        # the host itself is the rollup key, never a dotted tail
        "http://1.2.3.4/a": "1.2.3.4",
        "http://10.0.0.1:8080/a": "10.0.0.1:8080",
        "http://192.168.0.1:80/a": "192.168.0.1",
        "http://[2001:db8::1]/a": "[2001:db8::1]",
        "http://[2001:db8::1]:443/a": "[2001:db8::1]",
    }
    df = spark.createDataFrame([(u,) for u in cases], "url string")
    got = [
        r.d
        for r in df.select(
            registrable_domain(F.col("url")).alias("d")
        ).collect()
    ]
    assert got == list(cases.values()), dict(zip(cases, got))


def test_pct_normalize_cross_engine_all_bytes(spark):
    """Exhaustive cross-engine lock of the escape rules: %XX for ALL
    256 code points (both hex spellings), plus truncated/invalid/
    doubled escapes, must canonicalize identically in Spark and in the
    shared DuckDB pipeline (`duckdb_url_canon_ctes` — the SAME CTEs the
    url_canonical_dedup oracle runs, so oracle and test can't drift)."""
    import duckdb

    from lightsaber_spark.pipeline_queries import duckdb_url_canon_ctes

    urls = []
    for cp in range(256):
        hx = f"{cp:02x}"
        urls.append(f"http://example.com/p%{hx}q")
        urls.append(f"http://example.com/p%{hx.upper()}q")
    urls += [
        "http://example.com/p%",         # lone trailing %
        "http://example.com/p%z1q",      # invalid first nibble
        "http://example.com/p%1zq",      # invalid second nibble
        "http://example.com/p%%41q",     # literal % then a valid escape
        "http://example.com/%41%42%43",  # run of escapes
        "http://foo.co.uk/%7Ea?id=%31&utm_x=%32",  # query-side escapes
        "http://1.2.3.4/%41",                      # IP host + escape
        "http://[2001:db8::1]:8080/%7Ex",          # bracketed IPv6 + port
        # malformed/unusual frontier inputs: the LOCK here is that both
        # engines agree byte-for-byte, whatever the canonical form is
        "",                                        # empty string
        "example.com/x",                           # schemeless
        "//www.example.com/x",                     # protocol-relative
        "mailto:user@x.com",                       # non-hierarchical
        "http://",                                 # scheme only
        "http:///path-no-host",                    # empty authority
        "http://example.com/a?&&b=1&",             # empty param segments
        "http://example.com/a?=v&x=",              # nameless/valueless
        # PSL-ladder cross-engine lock (r11): the SQL CASE ladder in
        # duckdb_url_canon_ctes mirrors registrable_domain by hand —
        # exactly where drift would creep in, so every rule class and
        # its edge shapes are locked engine-to-engine here
        "http://x.shop.foo.ck/a",         # wildcard TLD -> last3
        "http://foo.ck/a",                # bare wildcard suffix -> itself
        "http://WWW.CK/x",                # exception: www NOT stripped
        "http://www.www.ck/x",            # www noise ON the exception
        "http://a.pages.www.ck/x",        # beneath the exception
        "http://deals.things.np/",        # second wildcard TLD
        "http://hs.district.k12.ca.us/",  # 3-label suffix -> last4
        "http://k12.ca.us/",              # bare 3-label suffix
        "http://www.branch.lib.ny.us/",   # 3-label suffix + www noise
        "http://shop.foo.ck:8080/a",      # wildcard + kept port tail
        "http://sub.foo.co.uk:443/b",     # 2-label suffix + dropped port
        # degenerate empty-label hosts (r12 review): the www-guard's
        # two-label test must reject empty labels on BOTH engines
        "http://www..ck/x",               # bare '.ck' — leading empty label
        "http://www.ck./x",               # bare 'ck.' — trailing empty label
        "http://www./x",                  # bare '' after the strip
        "http://www.../x",                # dots only
    ]
    rows = list(enumerate(urls))
    df = spark.createDataFrame(rows, "doc_id long, url string")
    got_spark = {
        r.doc_id: (r.c, r.d)
        for r in df.select(
            "doc_id",
            canonical_url(F.col("url")).alias("c"),
            registrable_domain(F.col("url")).alias("d"),
        ).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE src(doc_id BIGINT, url VARCHAR)")
    con.executemany("INSERT INTO src VALUES (?, ?)", rows)
    sql = (
        "WITH " + duckdb_url_canon_ctes("src")
        + " SELECT doc_id, canonical_url, domain FROM c"
    )
    got_duck = {i: (cu, dm) for i, cu, dm in con.execute(sql).fetchall()}
    assert got_spark == got_duck


def test_pct_normalize_cross_engine_fuzz(spark):
    """Seeded fuzz lock over delimiter soup, partial escapes, and
    multibyte UTF-8 text: both engines must canonicalize identically
    for ANY input — string_split/substring/upper/chr semantics have to
    agree beyond the systematic %XX sweep (é/中 exercise the UTF-8
    character-vs-byte handling of substring on both sides)."""
    import random

    import duckdb

    from lightsaber_spark.pipeline_queries import duckdb_url_canon_ctes

    rng = random.Random(42)
    alphabet = list("%0129abcfgABCF~._-/?&=#@:") + [
        "é", "ü", "中", "%%", "%4", "%4g", "%C3%A9", "%e4%b8%ad"
    ]
    urls = [
        "http://Example.com/"
        + "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 14)))
        for _ in range(150)
    ] + [
        "https://www.h%6fst.co.uk/p?"
        + "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 10)))
        for _ in range(50)
    ]
    rows = list(enumerate(urls))
    df = spark.createDataFrame(rows, "doc_id long, url string")
    got_s = {
        r.doc_id: (r.c, r.d)
        for r in df.select(
            "doc_id",
            canonical_url(F.col("url")).alias("c"),
            registrable_domain(F.col("url")).alias("d"),
        ).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE src(doc_id BIGINT, url VARCHAR)")
    con.executemany("INSERT INTO src VALUES (?, ?)", rows)
    got_d = {
        i: (c, d)
        for i, c, d in con.execute(
            "WITH " + duckdb_url_canon_ctes("src")
            + " SELECT doc_id, canonical_url, domain FROM c"
        ).fetchall()
    }
    assert got_s == got_d


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


def test_canonical_url_dedup_normalizes_once(spark):
    """r10 ADVICE: canonical_url_dedup must evaluate pct_normalize ONCE
    per row — the normalized URL is a shared intermediate column, and
    the project boundary must survive CollapseProject (it does: the
    alias is referenced twice and the HOF chain is non-cheap). A
    regression reintroducing per-consumer normalization doubles the
    interpreted split/transform work on the hot map-only path."""
    df = spark.createDataFrame(
        [(1, "http://www.Example.com/a%7eb?utm_x=1&id=2")],
        "doc_id long, url string",
    )
    out = canonical_url_dedup(df)
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("split(url") == 1, plan
    # the host is passed as a shared column to both consumers
    # (host_col=). Catalyst's CollapseProject still INLINES it into the
    # domain ladder's conditional branches (conditionals defeat the
    # non-cheap-alias boundary that protects _u above), so the plan
    # text shows one host chain per WHEN branch — but never more: a
    # regression that re-derives the host per consumer would roughly
    # double this count (measured: the shared column cut the isolated
    # warm time from 1.5-2.1 s to ~1.1 s at sf0.1; whole-stage codegen
    # subexpression elimination dedupes the unconditioned copies).
    assert plan.count("[^@]*@") <= 9, plan
    # the results are unchanged by the shared-normalization rewrite
    rows = out.collect()
    assert rows[0].canonical_url == "example.com/a~b?id=2"
    assert rows[0].domain == "example.com"


def test_punycode_matches_stdlib_idna():
    """The RFC 3492 encoder must agree with the stdlib IDNA codec's
    ToASCII on real-script labels (for lowercase letter labels the two
    differ only by nameprep, which is identity there), and with the
    RFC's own published sample vector."""
    from lightsaber_spark.functions.urls import (
        idn_label_to_ascii,
        punycode_encode,
    )

    labels = ["bücher", "münchen", "日本語", "россия", "ñandú", "café",
              "ελλάδα", "한국", "中文网", "עברית", "täst", "øl"]
    for lb in labels:
        want = lb.encode("idna").decode("ascii")
        assert idn_label_to_ascii(lb) == want, lb
    # mixed-case input lowercases first (UTS 46-lite mapping)
    assert idn_label_to_ascii("BÜCHER") == "bücher".encode("idna").decode()
    # ASCII labels (incl. existing ACE) pass through lowercased
    assert idn_label_to_ascii("Example") == "example"
    assert idn_label_to_ascii("xn--bcher-kva") == "xn--bcher-kva"
    # RFC 3492 §7.1 sample (A), Arabic (Egyptian)
    arabic = ("ليهمابتكل"
              "موشعربي؟")
    assert punycode_encode(arabic) == "egbpdaj6bu4bxfgehfvwxn"


def test_idn_url_rewrite_preserves_structure():
    """Only the host is rewritten: scheme, userinfo, port, path, query,
    fragment — and any non-ASCII OUTSIDE the host — stay untouched."""
    from lightsaber_spark.functions.urls import _idn_url_to_ascii

    cases = {
        "http://bücher.de/x": "http://xn--bcher-kva.de/x",
        "https://u:pw@bücher.de:8080/ä?q=ü#f":
            "https://u:pw@xn--bcher-kva.de:8080/ä?q=ü#f",
        "http://shop.日本語.jp/a": "http://shop.xn--wgv71a119e.jp/a",
        "http://example.com/ok": "http://example.com/ok",
        "http://[2001:db8::1]:443/a": "http://[2001:db8::1]:443/a",
        "bücher.de/x": "xn--bcher-kva.de/x",  # schemeless
    }
    for raw, want in cases.items():
        assert _idn_url_to_ascii(raw) == want, raw


def test_idn_opt_in_unifies_unicode_and_ace_spellings(spark):
    """After the opt-in ACE rewrite, the Unicode and xn-- spellings of
    one page canonicalize identically and dedup together — closing the
    documented IDN boundary for crawls that enable it."""
    from lightsaber_spark.functions.urls import idn_hosts_to_ascii_udf

    df = spark.createDataFrame(
        [
            (1, "http://bücher.de/x"),
            (2, "http://xn--bcher-kva.de/x"),
            (3, "https://www.BÜCHER.de/x/"),
            (4, "http://bücher.de/y"),
        ],
        "doc_id long, url string",
    )
    ace = df.select("doc_id", idn_hosts_to_ascii_udf()(F.col("url")).alias("url"))
    rows = {
        r.canonical_url: (r.n_docs, r.rep_doc_id)
        for r in canonical_url_dedup(ace).collect()
    }
    assert rows == {
        "xn--bcher-kva.de/x": (3, 1),
        "xn--bcher-kva.de/y": (1, 4),
    }
    got_domains = {
        r.d
        for r in ace.select(registrable_domain(F.col("url")).alias("d")).collect()
    }
    assert got_domains == {"xn--bcher-kva.de"}


def test_psl_table_sweep_cross_engine_and_model(spark):
    """r13 FULL-PSL sweep: for EVERY rule in the generated ICANN
    tables (3899 two-label + 1971 three-label + 4 four-label plain
    rules incl. all 453 ACE-encoded IDN rules, 9+9 wildcard bases,
    1+7 exceptions — `psl_data.py`, generated from the vendored
    public_suffix_list.dat), synthesize the registrable / sub / www
    shapes and lock (a) Spark == DuckDB ladder byte-for-byte and
    (b) Spark == an independently written Python model of the PSL
    algorithm (longest rule wins, exceptions override wildcards) —
    two implementations agreeing is not enough when both are
    hand-built from the same tables."""
    import duckdb

    from lightsaber_spark.functions.urls import (
        PSL_EXCEPTIONS_2,
        PSL_EXCEPTIONS_3,
        PSL_SUFFIXES_2,
        PSL_SUFFIXES_3,
        PSL_SUFFIXES_4,
        PSL_WILDCARD_BASES_1,
        PSL_WILDCARD_BASES_2,
    )
    from lightsaber_spark.pipeline_queries import duckdb_url_canon_ctes

    suf2, suf3, suf4 = set(PSL_SUFFIXES_2), set(PSL_SUFFIXES_3), set(PSL_SUFFIXES_4)

    def model(host: str) -> str:
        """PSL algorithm over the same rule tables: the public suffix
        is the LONGEST matching rule; registrable = suffix + 1 label
        (or the host itself if nothing sits above the suffix);
        exception rules prevail over everything."""
        labels = host.split(".")
        for exc_set in (PSL_EXCEPTIONS_3, PSL_EXCEPTIONS_2):
            for e in exc_set:
                if host == e or host.endswith("." + e):
                    return e
        suffix_len = 1  # default rule: *
        if len(labels) >= 2 and ".".join(labels[-2:]) in suf2:
            suffix_len = 2
        if labels[-1] in PSL_WILDCARD_BASES_1 and len(labels) >= 2:
            suffix_len = max(suffix_len, 2)  # *.tld rule
        if len(labels) >= 3 and ".".join(labels[-3:]) in suf3:
            suffix_len = max(suffix_len, 3)
        if (
            len(labels) >= 3
            and ".".join(labels[-2:]) in PSL_WILDCARD_BASES_2
        ):
            suffix_len = max(suffix_len, 3)  # *.kawasaki.jp rule
        if len(labels) >= 4 and ".".join(labels[-4:]) in suf4:
            suffix_len = max(suffix_len, 4)
        n = min(len(labels), suffix_len + 1)
        return ".".join(labels[-n:])

    hosts = []
    for sfx in PSL_SUFFIXES_2:
        hosts += [f"foo.{sfx}", f"sub.foo.{sfx}", f"www.foo.{sfx}", sfx]
    for sfx in PSL_SUFFIXES_3:
        hosts += [f"foo.{sfx}", f"sub.foo.{sfx}", sfx]
    for sfx in PSL_SUFFIXES_4:
        hosts += [f"foo.{sfx}", f"sub.foo.{sfx}", f"www.foo.{sfx}", sfx]
    for tld in PSL_WILDCARD_BASES_1:
        hosts += [f"foo.{tld}", f"bar.foo.{tld}", f"x.bar.foo.{tld}"]
    for b in PSL_WILDCARD_BASES_2:
        hosts += [b, f"foo.{b}", f"bar.foo.{b}", f"x.bar.foo.{b}",
                  f"www.foo.{b}", f"www.bar.foo.{b}"]
    for e in PSL_EXCEPTIONS_2:
        hosts += [e, f"pages.{e}", f"www.{e}"]
    for e in PSL_EXCEPTIONS_3:
        hosts += [e, f"pages.{e}", f"www.{e}"]
    rows = [(i, f"http://{h}/p") for i, h in enumerate(hosts)]

    df = spark.createDataFrame(rows, "doc_id long, url string")
    got = {
        r.doc_id: r.d
        for r in df.select(
            "doc_id", registrable_domain(F.col("url")).alias("d")
        ).collect()
    }
    # (a) independent model: www. is subdomain noise unless what
    # remains is a bare suffix / exception (the _host guard)
    for i, h in enumerate(hosts):
        stripped = h
        if h.startswith("www.") and h not in PSL_EXCEPTIONS_2:
            rest = h[4:]
            rest_labels = rest.split(".")
            rest_is_suffix = (
                "." not in rest
                or rest in suf2
                or rest in suf3
                or rest in suf4
                or (
                    len(rest_labels) == 2
                    and rest_labels[-1] in PSL_WILDCARD_BASES_1
                    and rest not in PSL_EXCEPTIONS_2
                )
                or (
                    len(rest_labels) == 3
                    and ".".join(rest_labels[-2:]) in PSL_WILDCARD_BASES_2
                    and rest not in PSL_EXCEPTIONS_3
                )
            )
            if not rest_is_suffix:
                stripped = rest
        assert got[i] == model(stripped), (h, got[i], model(stripped))
    # (b) DuckDB ladder agrees byte-for-byte on every synthesized host
    con = duckdb.connect()
    con.execute("CREATE TABLE src(doc_id BIGINT, url VARCHAR)")
    con.executemany("INSERT INTO src VALUES (?, ?)", rows)
    sql = (
        "WITH " + duckdb_url_canon_ctes("src")
        + " SELECT doc_id, domain FROM c"
    )
    got_duck = dict(con.execute(sql).fetchall())
    assert got == got_duck


def test_psl_private_sweep_cross_engine_and_model(spark):
    """r13 PRIVATE-section sweep: for EVERY rule in the generated
    private tables (1574/331/66/66 plain by depth, 57/30/2 wildcard
    bases by base depth), synthesize registrable / sub / www shapes
    and lock Spark(include_private=True) == the private-mode DuckDB
    ladder == an independent Python model of the merged-rule PSL
    algorithm."""
    import duckdb

    from lightsaber_spark.functions.urls import _PSL_SETS, registrable_domain
    from lightsaber_spark.pipeline_queries import duckdb_url_canon_ctes

    S = {k: set(v) for k, v in _PSL_SETS.items()}

    def model(host: str) -> str:
        labels = host.split(".")
        for exc_key in ("exc3", "exc2"):  # ICANN-only; no private exc
            for e in S[exc_key]:
                if host == e or host.endswith("." + e):
                    return e

        def tail(k):
            return ".".join(labels[-k:]) if len(labels) >= k else None

        suffix_len = 1
        if tail(2) in S["p_suf2"]:
            suffix_len = 2
        if labels[-1] in S["wild1"] and len(labels) >= 2:
            suffix_len = max(suffix_len, 2)
        if tail(3) in S["p_suf3"]:
            suffix_len = max(suffix_len, 3)
        if len(labels) >= 3 and tail(2) in S["p_wild2"]:
            suffix_len = max(suffix_len, 3)
        if tail(4) in S["p_suf4"]:
            suffix_len = max(suffix_len, 4)
        if len(labels) >= 4 and tail(3) in S["p_wild3"]:
            suffix_len = max(suffix_len, 4)
        if tail(5) in S["p_suf5"]:
            suffix_len = max(suffix_len, 5)
        if len(labels) >= 5 and tail(4) in S["p_wild4"]:
            suffix_len = max(suffix_len, 5)
        n = min(len(labels), suffix_len + 1)
        return ".".join(labels[-n:])

    def strip_model(h: str) -> str:
        if not h.startswith("www.") or h in S["exc2"]:
            return h
        rest = h[4:]
        rl = rest.split(".")
        rest_is_suffix = (
            "." not in rest
            or any(rest in S[k] for k in ("p_suf2", "p_suf3", "p_suf4", "p_suf5"))
            or (len(rl) == 2 and rl[-1] in S["wild1"] and rest not in S["exc2"])
            or (len(rl) == 3 and ".".join(rl[-2:]) in S["p_wild2"]
                and rest not in S["exc3"])
            or (len(rl) == 4 and ".".join(rl[-3:]) in S["p_wild3"])
            or (len(rl) == 5 and ".".join(rl[-4:]) in S["p_wild4"])
        )
        return h if rest_is_suffix else rest

    hosts = []
    for key in ("p_suf2", "p_suf3", "p_suf4", "p_suf5"):
        # private plain rules only — the merged ICANN part is already
        # swept by the ICANN test; slice to keep runtime bounded but
        # ALWAYS cover the purely-private depths in full
        rules = sorted(S[key] - S.get(key.replace("p_", ""), set()))
        for sfx in rules:
            hosts += [f"foo.{sfx}", f"sub.foo.{sfx}", f"www.foo.{sfx}", sfx]
    for key in ("p_wild3", "p_wild4"):
        for b in sorted(S[key]):
            hosts += [b, f"foo.{b}", f"bar.foo.{b}", f"www.bar.foo.{b}"]
    for b in sorted(S["p_wild2"] - S["wild2"]):  # private 2-label bases
        hosts += [b, f"foo.{b}", f"bar.foo.{b}", f"www.bar.foo.{b}"]

    rows = [(i, f"http://{h}/p") for i, h in enumerate(hosts)]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    got = {
        r.doc_id: r.d
        for r in df.select(
            "doc_id",
            registrable_domain(F.col("url"), include_private=True).alias("d"),
        ).collect()
    }
    for i, h in enumerate(hosts):
        want = model(strip_model(h))
        assert got[i] == want, (h, got[i], want)

    con = duckdb.connect()
    con.execute("CREATE TABLE src(doc_id BIGINT, url VARCHAR)")
    con.executemany("INSERT INTO src VALUES (?, ?)", rows)
    sql = (
        "WITH " + duckdb_url_canon_ctes("src", include_private=True)
        + " SELECT doc_id, domain FROM c"
    )
    got_duck = dict(con.execute(sql).fetchall())
    assert got == got_duck
