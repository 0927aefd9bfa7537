#!/usr/bin/env python
"""Dump ``.explain("formatted")`` evidence files for named queries.

Writes ``plans/<tag>/<query>_<suffix>.txt`` with the AQE-OFF formatted
physical plan (authoritative codegen stars + static exchange/join
shape, per plan_audit.formatted_plan) for each named query — the
before/after evidence the optimization rounds commit.

Usage: python scripts/dump_plans.py [sf_dir] --tag r15 --suffix before name...
"""

from __future__ import annotations

import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)


def main() -> int:
    args = sys.argv[1:]
    sf_dir = next((a for a in args if a.startswith("/")), "/root/testdata/sf0.1")
    tag, suffix = "r15", "before"
    names: list[str] = []
    skip: set[int] = set()
    for i, a in enumerate(args):
        if i in skip:
            continue
        if a == "--tag":
            tag = args[i + 1]; skip.add(i + 1)
        elif a == "--suffix":
            suffix = args[i + 1]; skip.add(i + 1)
        elif not a.startswith("/"):
            names.append(a)

    from lightsaber_spark import get_spark
    from lightsaber_spark.functions.dedup import release_shingle_caches
    from lightsaber_spark.plan_audit import formatted_plan
    import __spark_entry__ as entrymod

    queries = entrymod.queries()
    names = [n for n in names if n in queries]
    spark = get_spark(app_name="dump-plans")
    spark.sparkContext.setLogLevel("ERROR")
    outdir = os.path.join(_REPO, "plans", tag)
    os.makedirs(outdir, exist_ok=True)
    for name in names:
        df = queries[name](spark, sf_dir)
        plan = formatted_plan(df, adaptive=False)
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(f"# {name} — {suffix} (AQE-off formatted plan, {sf_dir})\n")
            f.write(plan)
        release_shingle_caches()
        print(f"wrote {path}")
    # conf restored by formatted_plan; session reused only for explains
    return 0


if __name__ == "__main__":
    sys.exit(main())
