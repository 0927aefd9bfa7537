#!/usr/bin/env python
"""Local mirror of the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry on Spark and its
``oracle_sql()`` twin on DuckDB over the same parquet tables, then
compares row count, column names, and order-insensitive values
(floats rounded). Usage::

    python scripts/check_parity.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
import time

sys.path.insert(0, ".")

import duckdb

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def _norm_cell(v):
    if isinstance(v, bool):
        return int(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # EXACT — the driver hashes raw values, so the fast gate must
        # too (every query's exactness policy makes floats bit-identical
        # cross-engine; a 1e-7 drift passing here would fail the sweep)
        return v
    if isinstance(v, list):
        return tuple(_norm_cell(x) for x in v)
    return v


def _normalize(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: tuple((x is None, str(type(x)), x) for x in t))
    return out


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from lightsaber_spark import get_spark

    spark = get_spark(app_name="check-parity")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures, checked, weak = [], 0, []

    from lightsaber_spark.functions.dedup import release_shingle_caches

    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as ex:  # noqa: BLE001
            failures.append((name, f"spark error: {ex}"))
            print(f"[FAIL] {name}: spark error: {ex}")
            continue
        finally:
            release_shingle_caches()
        # driver-canonicalizer compatibility: the driver sorts columns
        # into a pandas frame and hashes cell values — list/dict cells
        # crash it (round-2's text_feature_hash_vectors failure), even
        # though this script's own tuple-normalization would cope.
        bad_cell = next(
            (v for r in srows[:100] for v in r if isinstance(v, (list, dict, set))),
            None,
        )
        if bad_cell is not None:
            failures.append((name, f"driver-unhashable cell type {type(bad_cell).__name__}"))
            print(f"[FAIL] {name}: driver-unhashable cell type {type(bad_cell).__name__}")
            continue
        if name not in oracles:
            weak.append(name)
            print(f"[weak] {name}: {len(srows)} rows (no oracle, rows-only)")
            continue
        try:
            res = con.execute(oracles[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as ex:  # noqa: BLE001
            failures.append((name, f"duckdb error: {ex}"))
            print(f"[FAIL] {name}: duckdb error: {ex}")
            continue

        problems = []
        if sorted(scols) != sorted(dcols):
            problems.append(f"columns spark={sorted(scols)} duck={sorted(dcols)}")
        if len(srows) != len(drows):
            problems.append(f"rowcount spark={len(srows)} duck={len(drows)}")
        if not problems:
            a, b = _normalize(srows, scols), _normalize(drows, dcols)
            if a != b:
                bad = next(i for i, (x, y) in enumerate(zip(a, b)) if x != y)
                problems.append(f"values differ at sorted row {bad}: spark={a[bad]} duck={b[bad]}")
        if problems:
            failures.append((name, "; ".join(problems)))
            print(f"[FAIL] {name}: {'; '.join(problems)}")
        else:
            checked += 1
            print(f"[ ok ] {name}: {len(srows)} rows ({time.time()-t0:.1f}s)")

    print(
        f"\n{checked} strong-checked ok, {len(weak)} weak (rows-only), "
        f"{len(failures)} failed, sf_dir={sf_dir}"
    )
    if not only:
        _write_parity_log(sf_dir, checked, weak, failures, len(queries))
    return 1 if failures else 0


def _write_parity_log(sf_dir, checked, weak, failures, total):
    """Record a full-catalog run as ``PARITY.json`` — the bridge
    ``round_start.py`` accepts when more queries front than one driver
    sweep can re-vouch (the r14 table-cache lesson: a hash-closure move
    can front all 171 at once, and the only honest cover is a
    full-catalog parity run on the same tree). Only written when no
    query filter was given (partial runs prove nothing about the
    catalog) and keyed to the git HEAD so a later commit invalidates
    it."""
    import json
    import os
    import subprocess

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    try:
        head = subprocess.run(
            ["git", "rev-parse", "HEAD"], cwd=root,
            capture_output=True, text=True, timeout=30,
        ).stdout.strip() or None
        # dirty query-implementation files mean HEAD does not describe
        # the verified code — round_start must not accept such a log
        dirty = bool(subprocess.run(
            ["git", "status", "--porcelain", "--",
             "lightsaber_spark", "__spark_entry__.py"], cwd=root,
            capture_output=True, text=True, timeout=30,
        ).stdout.strip())
    except Exception:
        head, dirty = None, True
    path = os.path.join(root, "PARITY.json")
    prior = {}
    try:
        with open(path) as f:
            prior = {
                k: v for k, v in json.load(f).items()
                if isinstance(v, dict)
            }
    except (OSError, ValueError):
        pass
    prior[sf_dir] = {
        "git_head": head,
        "dirty_query_files": dirty,
        "checked": checked,
        "weak": len(weak),
        "failed": len(failures),
        "total": total,
    }
    with open(path, "w") as f:
        json.dump(prior, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"parity log → {path} (HEAD {str(head)[:9]})")


if __name__ == "__main__":
    sys.exit(main())
