"""Shared DuckDB oracle SQL fragments — a LEAF module (no imports
back into the query catalogs), so both ``pipeline_queries`` and
``staged_queries`` can use them without forming an import cycle when
the staged registry is merged into the main one (round-5 ADVICE.md
item: a back-edge from staged_queries into pipeline_queries would let
a partially-populated staged dict be merged).

Cross-engine invariants these encode (CLAUDE.md exactness policy):
- tokenization = lowercase [a-z0-9]+ runs, identical regex semantics
  in Spark (`regexp_extract_all`) and DuckDB;
- 3-gram word shingles, space-joined, de-duplicated;
- 60-bit hashing = md5-hex-prefix folded to BIGINT — bit-identical on
  both engines and below 2^63 so no HUGEINT appears.
"""

TOKS = "regexp_extract_all(lower(text), '[a-z0-9]+')"
SHINGLES = (
    "list_distinct(list_transform(range(greatest(len(t) - 2, 0)), "
    "i -> array_to_string(t[i+1:i+3], ' ')))"
)
H60 = "('0x' || substr(md5({x}), 1, 15))::BIGINT"
NORM = "regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')"
