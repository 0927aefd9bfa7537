"""HTML → text extraction (crawl-ingest boilerplate stripping).

The first stage of every real training-data pipeline: raw crawled HTML
becomes the plain text the rest of the ladder (quality gates, dedup,
packing) operates on. The reference engine has no crawl stage — this is
one of the beyond-parity pipeline operators (BASELINE.json north star),
same class as the URL canonicalization family.

Design: a pure Catalyst ``regexp_replace``/``replace`` chain — JVM-side,
whole-stage-codegen'd, zero Python in the plan (same contract as
``urls.canonical_url``; the NO_CODEGEN audit covers it). Every stage is
mirrored token-for-token in the DuckDB oracle via
:func:`duckdb_html_to_text`; both engines use RE2-compatible patterns
with case-insensitivity spelled as explicit ASCII classes via
:func:`_ci` — never ``(?i)``, which Java folds ASCII-only but RE2 folds
Unicode, so a case-variant tag like ``<ſcript>`` (U+017F) would diverge
(the ``\\A..\\z`` anchoring lesson from json_props_stats does not arise
— no ``$`` anchors here).

Stages (order is semantics — later stages see earlier output):
  1. ``<script>``/``<style>`` elements dropped WITH their content
     (lazy body match up to the matching close tag).
  2. HTML comments dropped.
  3. Block-level open/close tags become newlines (paragraph structure
     survives tag stripping — downstream line-level dedup needs it).
  4. Every remaining tag becomes a space (inline tags must not glue
     words: ``a<b>b`` → ``a b``).
  5. The six ubiquitous entities decoded, ``&amp;`` LAST (so literal
     ``&amp;lt;`` in the source decodes to the text ``&lt;``, exactly
     once — the standard double-escape rule).
  6. Whitespace normalization: non-newline runs collapse to one space,
     newline runs (with surrounding spaces) to one newline, trim.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

def _ci(word: str) -> str:
    """ASCII-bounded case-insensitive spelling of a tag name. Java's
    ``(?i)`` folds ASCII only while RE2's folds Unicode (U+017F long-s
    matches ``(?i)s`` in DuckDB but not in Spark, so ``<ſcript>`` would
    be stripped WITH its body by the oracle and kept by the engine) —
    spelling each letter as a two-char class makes both engines agree
    by construction, with no ``(?i)`` flag at all."""
    return "".join(
        f"[{c}{c.upper()}]" if c.isalpha() else c for c in word
    )


_BLOCK_TAGS = [
    "p", "div", "br", "h[1-6]", "li", "ul", "ol", "tr", "td", "th",
    "table", "blockquote", "section", "article", "header", "footer",
    "pre", "form",
]

# (pattern, replacement) — applied in order on both engines
_TAG_STAGES: list[tuple[str, str]] = [
    (
        r"(?s)<" + _ci("script") + r"\b[^>]*>.*?</" + _ci("script") + ">",
        " ",
    ),
    (
        r"(?s)<" + _ci("style") + r"\b[^>]*>.*?</" + _ci("style") + ">",
        " ",
    ),
    (r"(?s)<!--.*?-->", " "),
    (
        r"</?(?:" + "|".join(_ci(t) for t in _BLOCK_TAGS)
        + r")\b[^>]*/?>",
        "\n",
    ),
    (r"(?s)<[^>]*>", " "),
]

# literal replacements — &amp; must come last (see module docstring)
_ENTITIES: list[tuple[str, str]] = [
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
]

_WS_STAGES: list[tuple[str, str]] = [
    (r"[^\S\n]+", " "),   # non-newline whitespace runs → one space
    (r" ?\n[\s]*", "\n"),  # newline runs (and their padding) → one \n
    # SQL trim strips spaces only, on both engines — drop edge newlines
    # with \A/\z (never ^/$: Java's $ matches before a trailing
    # newline, RE2's does not — the json_props_stats lesson)
    (r"\A\n+|\n+\z", ""),
]


def html_to_text(col: Column) -> Column:
    """Extracted plain text of an HTML document (NULL html = empty
    text, matching the engine-wide NULL-text = empty-doc rule)."""
    x = F.coalesce(col, F.lit(""))
    for pat, rep in _TAG_STAGES:
        x = F.regexp_replace(x, pat, rep)
    for lit, rep in _ENTITIES:
        x = F.replace(x, F.lit(lit), F.lit(rep))
    for pat, rep in _WS_STAGES:
        x = F.regexp_replace(x, pat, rep)
    return F.trim(x)


def _sql_str(s: str) -> str:
    """A DuckDB string literal. Standard-SQL single-quoted strings do
    NOT process backslashes (``'\\b'`` reaches RE2 as backslash-b), so
    regex patterns embed verbatim; a real newline in a replacement is
    expressed as ``chr(10)`` instead."""
    if "\n" in s:
        parts = [p for p in s.split("\n")]
        out = []
        for i, p in enumerate(parts):
            if i:
                out.append("chr(10)")
            if p:
                out.append("'" + p.replace("'", "''") + "'")
        return " || ".join(out) if len(out) > 1 else out[0]
    return "'" + s.replace("'", "''") + "'"


# hyperlink extraction: one pattern, two capture groups — group 1 the
# double-quoted href value, group 2 the raw anchor body. Extracted
# TWICE (once per group) on both engines: the same pattern matches the
# same occurrences in the same order, so the two arrays align
# positionally (Spark regexp_extract_all and DuckDB regexp_extract_all
# both take ONE group index per call). Scope: double-quoted hrefs only
# — the dominant form; single-quoted/unquoted attrs are skipped
# IDENTICALLY on both engines. href values containing '"' or tags
# whose earlier attribute values contain '>' mis-span identically too
# (regex-over-HTML limits, deterministic cross-engine).
_LINK_PATTERN = (
    r"(?s)<" + _ci("a") + r"\b[^>]*\b" + _ci("href")
    + r'\s*=\s*"([^"]*)"[^>]*>(.*?)</' + _ci("a") + r"\s*>"
)


def extract_hrefs(col: Column) -> Column:
    """``array<string>`` of double-quoted href values of ``<a>``
    elements, in document order (NULL html → empty array)."""
    return F.regexp_extract_all(
        F.coalesce(col, F.lit("")), F.lit(_LINK_PATTERN), F.lit(1)
    )


def extract_anchors(col: Column) -> Column:
    """``array<string>`` of RAW anchor bodies, positionally aligned
    with :func:`extract_hrefs` (same pattern, group 2). Clean each
    element AFTER exploding with :func:`clean_anchor_text` — a plain
    column chain stays in whole-stage codegen where a per-element
    lambda would run interpreted (CLAUDE.md HOF gotcha)."""
    return F.regexp_extract_all(
        F.coalesce(col, F.lit("")), F.lit(_LINK_PATTERN), F.lit(2)
    )


def clean_anchor_text(col: Column) -> Column:
    """Anchor body → display text: the full :func:`html_to_text`
    pipeline (anchors may contain inline tags and entities), then
    newline runs folded to spaces — anchor text is a one-line label."""
    return F.trim(F.regexp_replace(html_to_text(col), r"\s+", " "))


def duckdb_extract_links(expr: str) -> tuple[str, str]:
    """DuckDB twins of :func:`extract_hrefs` / :func:`extract_anchors`
    as SQL expression strings (same pattern, groups 1 and 2)."""
    pat = _sql_str(_LINK_PATTERN)
    base = f"COALESCE({expr}, '')"
    return (
        f"regexp_extract_all({base}, {pat}, 1)",
        f"regexp_extract_all({base}, {pat}, 2)",
    )


def duckdb_clean_anchor(expr: str) -> str:
    """DuckDB twin of :func:`clean_anchor_text`."""
    inner = duckdb_html_to_text(expr)
    return f"trim(regexp_replace({inner}, '\\s+', ' ', 'g'))"


def duckdb_html_to_text(expr: str) -> str:
    """The identical pipeline as a DuckDB SQL expression over ``expr``.
    DuckDB's ``regexp_replace`` is first-match-only by default — every
    stage passes the ``'g'`` flag (the Spark builtin is always
    global)."""
    x = f"COALESCE({expr}, '')"
    for pat, rep in _TAG_STAGES:
        x = f"regexp_replace({x}, {_sql_str(pat)}, {_sql_str(rep)}, 'g')"
    for lit, rep in _ENTITIES:
        x = f"replace({x}, {_sql_str(lit)}, {_sql_str(rep)})"
    for pat, rep in _WS_STAGES:
        x = f"regexp_replace({x}, {_sql_str(pat)}, {_sql_str(rep)}, 'g')"
    return f"trim({x})"
