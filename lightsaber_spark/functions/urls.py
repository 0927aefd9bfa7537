"""URL canonicalization + canonical-URL dedup.

The crawl-ingest step upstream of every text operator: a crawl frontier
sees the same page under scheme/case/www/trailing-slash/tracking-param/
fragment noise, and canonical-URL exact dedup collapses that BEFORE any
content-level dedup spends compute on the duplicates (the CCNet /
RefinedWeb ingest ordering).

Canonicalization rules (each a pure Catalyst expression — map-only,
whole-stage codegen; the DuckDB oracle twin applies the identical
regex/list pipeline):

1. drop the scheme (http ≡ https for crawl identity);
2. drop userinfo (``user:pw@host`` — never content identity) and the
   default ports ``:80``/``:443`` (non-default ports are kept: they
   select a different server);
3. lowercase the host; strip one leading ``www.``;
4. drop the fragment;
5. strip trailing slashes from the path;
6. drop tracking query params (names starting ``utm_`` or in
   :data:`TRACKING_PARAM_NAMES`), SORT the survivors (param order is
   transport noise), rebuild ``?a=..&b=..`` only if any survive.

Path and param case is preserved (case-sensitive on real servers);
only scheme and host are case-folded. Percent-encoding is NOT
normalized (%7E vs ~): doing it correctly needs the reserved-set
tables of RFC 3986 §2.2 and is deliberately out of scope — the
synthesis both engines canonicalize never emits percent-escapes.

100 TB shape: canonicalization is per-row expression work (no shuffle,
no Python); the dedup itself is one hash aggregation on the canonical
string — the cheapest possible dedup join key, which is the point of
running it first.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

#: query params that never identify content (click/campaign tracking)
TRACKING_PARAM_NAMES = ("fbclid", "gclid", "msclkid", "ref")

#: any param whose name starts with this is campaign tracking
TRACKING_PREFIX = "utm_"


def _host(url: Column) -> Column:
    """Lowercased host: userinfo and default ports (:80/:443) dropped,
    a single leading ``www.`` stripped."""
    body = F.regexp_replace(url, r"^[A-Za-z][A-Za-z0-9+.-]*://", "")
    auth = F.regexp_extract(body, r"^([^/?#]+)", 1)
    auth = F.regexp_replace(auth, r"^[^@]*@", "")  # userinfo
    host = F.lower(F.regexp_replace(auth, r":(80|443)$", ""))
    return F.regexp_replace(host, r"^www\.", "")


def _path_and_query(url: Column) -> tuple[Column, Column]:
    body = F.regexp_replace(url, r"^[A-Za-z][A-Za-z0-9+.-]*://", "")
    body = F.regexp_replace(body, r"#.*$", "")  # fragment is client-side
    rest = F.regexp_extract(body, r"^[^/?#]+(.*)$", 1)
    path = F.regexp_replace(F.regexp_extract(rest, r"^([^?]*)", 1), r"/+$", "")
    qs = F.regexp_extract(rest, r"\?(.*)$", 1)
    return path, qs


def _kept_params(qs: Column) -> Column:
    """Non-tracking query params, sorted (binary collation — identical
    in DuckDB's list_sort)."""
    return F.array_sort(
        F.filter(
            F.split(qs, "&"),
            lambda p: (p != F.lit(""))
            & (F.substring(p, 1, len(TRACKING_PREFIX)) != F.lit(TRACKING_PREFIX))
            & ~F.split_part(p, F.lit("="), F.lit(1)).isin(
                *TRACKING_PARAM_NAMES
            ),
        )
    )


def canonical_url(url: Column) -> Column:
    """Canonical identity string for a raw URL (rules in the module
    docstring). Pure expression — no UDF, no shuffle."""
    path, qs = _path_and_query(url)
    params = _kept_params(qs)
    return F.concat(
        _host(url),
        path,
        F.when(
            F.size(params) > 0,
            F.concat(F.lit("?"), F.array_join(params, "&")),
        ).otherwise(F.lit("")),
    )


def registrable_domain(url: Column) -> Column:
    """Last two host labels (``sub.a.example.com`` → ``example.com``) —
    the per-domain rollup key. (A real crawl uses the public-suffix
    list; the two-label rule is the deterministic, dependency-free
    stand-in and is exact for ``*.example.com`` test fixtures.)"""
    return F.regexp_extract(_host(url), r"([^.]+\.[^.]+)$", 1)


def canonical_url_dedup(
    df: DataFrame, url_col: str = "url", id_col: str = "doc_id"
) -> DataFrame:
    """Canonical-URL exact dedup: one row per canonical URL with the
    document count and the lowest-id representative. Output columns:
    ``(canonical_url, domain, n_docs, rep_doc_id)``."""
    c = df.select(
        F.col(id_col).cast("bigint").alias("_id"),
        canonical_url(F.col(url_col)).alias("canonical_url"),
        registrable_domain(F.col(url_col)).alias("domain"),
    )
    return c.groupBy("canonical_url", "domain").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.min("_id").cast("bigint").alias("rep_doc_id"),
    )
