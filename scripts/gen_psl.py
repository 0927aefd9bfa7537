#!/usr/bin/env python
"""Generate lightsaber_spark/functions/psl_data.py from the vendored
Public Suffix List snapshot.

Source: ``lightsaber_spark/data/public_suffix_list.dat`` — the Mozilla
Public Suffix List (MPL 2.0, header retained in the file), vendored
from the Debian ``publicsuffix`` package snapshot shipped in this build
environment (no network here; refresh the .dat from
https://publicsuffix.org/list/public_suffix_list.dat when available
and re-run this script).

Scope: the ICANN section only (the registry-mandated suffixes — the
standard choice for crawl canonical grouping; the PRIVATE section
would make ``user.github.io``-style hosts their own registrable
domains, a different, opt-in semantics).

Rule classification (mirrors the engine ladder in
``functions/urls.py`` and the DuckDB twin in
``pipeline_queries.duckdb_url_canon_ctes``):

- plain rules by label depth 2/3/4 (depth-1 rules — the 1.5k TLDs —
  are deliberately NOT emitted: the PSL's default ``*`` rule gives any
  unlisted TLD the same one-label-suffix semantics, so the engine's
  default branch already produces identical results for listed and
  unlisted TLDs alike);
- wildcard rules ``*.B`` split by base depth 1 (``*.ck``) and 2
  (``*.kawasaki.jp``);
- exception rules by name depth 2 (``!www.ck``) and 3
  (``!city.kawasaki.jp``).

Unicode rules (453 IDN entries) are converted label-by-label to their
``xn--`` ACE form, because hosts reach the engine's matcher in ASCII
(either natively or via the opt-in ``idn_hosts_to_ascii_udf`` rewrite
upstream). The repo's own RFC 3492 encoder is used when importable
(keeping the table bit-consistent with the runtime path); the stdlib
IDNA codec is the bootstrap fallback and both are cross-checked when
available.
"""

from __future__ import annotations

import hashlib
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DAT = os.path.join(ROOT, "lightsaber_spark", "data", "public_suffix_list.dat")
OUT = os.path.join(ROOT, "lightsaber_spark", "functions", "psl_data.py")


def _encoders():
    repo_enc = None
    try:
        sys.path.insert(0, ROOT)
        from lightsaber_spark.functions.urls import idn_label_to_ascii

        repo_enc = idn_label_to_ascii
    except Exception:
        pass  # bootstrap: psl_data.py not generated yet

    def stdlib_enc(label: str) -> str:
        return label.encode("idna").decode("ascii")

    return repo_enc, stdlib_enc


def ace(label: str, repo_enc, stdlib_enc) -> str:
    if all(ord(c) < 128 for c in label):
        return label.lower()
    if repo_enc is not None:
        got = repo_enc(label)
        try:
            std = stdlib_enc(label)
        except Exception:
            std = None
        if std is not None and std != got:
            raise SystemExit(
                f"gen_psl: encoder disagreement on {label!r}: "
                f"repo={got!r} stdlib={std!r}"
            )
        return got
    return stdlib_enc(label)


def main() -> int:
    raw = open(DAT, encoding="utf-8").read()
    sha = hashlib.sha256(raw.encode("utf-8")).hexdigest()
    repo_enc, stdlib_enc = _encoders()

    section = None
    suf = {2: [], 3: [], 4: []}
    wild = {1: [], 2: []}
    exc = {2: [], 3: []}
    psuf = {2: [], 3: [], 4: [], 5: []}
    pwild = {2: [], 3: [], 4: []}
    n_unicode = n_depth1 = 0
    for ln in raw.splitlines():
        if "===BEGIN ICANN DOMAINS===" in ln:
            section = "icann"
            continue
        if "===END ICANN DOMAINS===" in ln:
            section = None
            continue
        if "===BEGIN PRIVATE DOMAINS===" in ln:
            section = "private"
            continue
        if "===END PRIVATE DOMAINS===" in ln:
            break
        if section is None:
            continue
        rule = ln.strip()
        if not rule or rule.startswith("//"):
            continue
        kind = "plain"
        if rule.startswith("!"):
            kind, rule = "exc", rule[1:]
        elif rule.startswith("*."):
            kind, rule = "wild", rule[2:]
        if any(ord(c) > 127 for c in rule):
            n_unicode += 1
        labels = [ace(lb, repo_enc, stdlib_enc) for lb in rule.split(".")]
        name = ".".join(labels)
        depth = len(labels)
        if section == "icann":
            if kind == "plain":
                if depth == 1:
                    n_depth1 += 1  # default-rule-equivalent, not emitted
                    continue
                suf[depth].append(name)
            elif kind == "wild":
                wild[depth].append(name)
            else:
                exc[depth].append(name)
        else:  # private section (opt-in tables)
            if kind == "exc":
                # no private exceptions exist in this snapshot and the
                # engine ladder does not implement them — fail loudly
                # rather than silently drop a future snapshot's rule
                raise SystemExit(
                    f"gen_psl: private-section exception rule {rule!r} — "
                    "extend the engine ladder before regenerating"
                )
            if kind == "plain":
                if depth == 1:
                    n_depth1 += 1
                    continue
                psuf[depth].append(name)
            else:
                pwild[depth].append(name)

    def tup(name: str, vals: list[str]) -> str:
        body = "\n".join(f'    "{v}",' for v in sorted(set(vals)))
        return f"{name} = (\n{body}\n)\n"

    header = f'''"""GENERATED by scripts/gen_psl.py — do not edit by hand.

Public Suffix List rule tables (ICANN section), ACE-encoded. Source:
lightsaber_spark/data/public_suffix_list.dat (Mozilla PSL, MPL 2.0;
sha256 {sha}).
ICANN: {len(suf[2])} two-label + {len(suf[3])} three-label +
{len(suf[4])} four-label plain rules, {len(wild[1])}+{len(wild[2])}
wildcard bases, {len(exc[2])}+{len(exc[3])} exceptions.
PRIVATE (opt-in tables): {len(psuf[2])}/{len(psuf[3])}/{len(psuf[4])}/
{len(psuf[5])} plain by depth, {len(pwild[2])}/{len(pwild[3])}/
{len(pwild[4])} wildcard bases by base depth, no exceptions (the
generator refuses if a future snapshot adds one).
{n_unicode} IDN rules total encoded to xn--; {n_depth1} single-label
TLD rules intentionally omitted (identical to the PSL default rule in
the engine ladder). Regenerate with: python scripts/gen_psl.py
"""

'''
    sha_fn = f'''def psl_snapshot_sha() -> str:
    """sha256 of the vendored .dat this module was generated from.

    A FUNCTION rather than a constant on purpose: the staleness chaser
    hashes the SOURCE of functions in a query's call closure but does
    not chase module-level data constants — referencing this from
    urls._in_psl puts the snapshot identity into every URL query's
    impl hash, so regenerating the tables fronts those queries for the
    next driver sweep instead of silently changing vouched outputs."""
    return "{sha}"
'''
    parts = [
        header,
        tup("PSL_SUFFIXES_2", suf[2]),
        tup("PSL_SUFFIXES_3", suf[3]),
        tup("PSL_SUFFIXES_4", suf[4]),
        tup("PSL_WILDCARD_BASES_1", wild[1]),
        tup("PSL_WILDCARD_BASES_2", wild[2]),
        tup("PSL_EXCEPTIONS_2", exc[2]),
        tup("PSL_EXCEPTIONS_3", exc[3]),
        tup("PSL_PRIVATE_SUFFIXES_2", psuf[2]),
        tup("PSL_PRIVATE_SUFFIXES_3", psuf[3]),
        tup("PSL_PRIVATE_SUFFIXES_4", psuf[4]),
        tup("PSL_PRIVATE_SUFFIXES_5", psuf[5]),
        tup("PSL_PRIVATE_WILDCARD_BASES_2", pwild[2]),
        tup("PSL_PRIVATE_WILDCARD_BASES_3", pwild[3]),
        tup("PSL_PRIVATE_WILDCARD_BASES_4", pwild[4]),
        sha_fn,
    ]
    with open(OUT, "w", encoding="utf-8") as f:
        f.write("\n".join(parts))
    print(
        f"wrote {OUT}: suf2={len(suf[2])} suf3={len(suf[3])} "
        f"suf4={len(suf[4])} wild={len(wild[1])}+{len(wild[2])} "
        f"exc={len(exc[2])}+{len(exc[3])} private="
        f"{len(psuf[2])}/{len(psuf[3])}/{len(psuf[4])}/{len(psuf[5])}"
        f"+w{len(pwild[2])}/{len(pwild[3])}/{len(pwild[4])} "
        f"(idn={n_unicode}, tld_omitted={n_depth1})"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
