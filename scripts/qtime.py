#!/usr/bin/env python
"""Per-query micro-profiler for optimization work (guide §1).

For each named query: P passes, each split into BUILD (python plan
construction, ``fn(spark, sf_dir)``) and EXEC (noop-sink write of the
built frame, guide §1.4), plus the number of Spark jobs the pass ran
(from the status tracker) — the job count separates queries whose cost
is scheduling/roundtrip overhead (many tiny jobs: eager collects,
iterative fits) from queries with genuinely heavy stages.

Usage: python scripts/qtime.py [sf_dir] [--passes N] [--top N] [name...]

``--top N`` picks the N slowest queries from BENCH.json instead of an
explicit name list.
"""

from __future__ import annotations

import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)


def main() -> int:
    args = sys.argv[1:]
    sf_dir = next((a for a in args if a.startswith("/")), "/root/testdata/sf0.1")
    passes = 3
    top = 0
    names: list[str] = []
    it = iter(enumerate(args))
    skip = set()
    for i, a in enumerate(args):
        if i in skip:
            continue
        if a == "--passes":
            passes = int(args[i + 1]); skip.add(i + 1)
        elif a == "--top":
            top = int(args[i + 1]); skip.add(i + 1)
        elif not a.startswith("/"):
            names.append(a)

    from lightsaber_spark import get_spark
    from lightsaber_spark.functions.dedup import release_shingle_caches
    from lightsaber_spark.session import load_tables
    import __spark_entry__ as entrymod

    queries = entrymod.queries()
    if top:
        bench = json.load(open(os.path.join(_REPO, "BENCH.json")))
        ranked = sorted(bench["queries"].items(), key=lambda kv: -kv[1])
        names = [n for n, _ in ranked[:top]] + names
    names = [n for n in names if n in queries]
    if not names:
        print("no valid query names", file=sys.stderr)
        return 2

    spark = get_spark(app_name="qtime")
    spark.sparkContext.setLogLevel("ERROR")
    from pyspark.sql import functions as F

    tables = load_tables(spark, sf_dir)
    tables["events"].groupBy("event_type").count().write.format("noop").mode(
        "overwrite"
    ).save()
    pup = F.pandas_udf(lambda s: s, "bigint")
    tables["events"].select(pup(F.col("event_id"))).limit(1000).write.format(
        "noop"
    ).mode("overwrite").save()

    st = spark.sparkContext.statusTracker()

    print(f"{'query':42s} {'pass':>4s} {'build':>7s} {'exec':>7s} {'total':>7s} {'jobs':>5s}")
    results = {}
    for name in names:
        fn = queries[name]
        rows = []
        for p in range(passes):
            group = f"qtime-{name}-{p}"
            spark.sparkContext.setJobGroup(group, name)
            t0 = time.time()
            df = fn(spark, sf_dir)
            t1 = time.time()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.time()
            nj = len(st.getJobIdsForGroup(group) or [])
            spark.sparkContext.setJobGroup(None, None)
            release_shingle_caches()
            rows.append((t1 - t0, t2 - t1, t2 - t0, nj))
            print(
                f"{name:42s} {p:4d} {t1 - t0:7.2f} {t2 - t1:7.2f} "
                f"{t2 - t0:7.2f} {nj:5d}"
            )
        best = min(rows, key=lambda r: r[2])
        results[name] = {
            "build": round(best[0], 3),
            "exec": round(best[1], 3),
            "total": round(best[2], 3),
            "jobs": best[3],
        }
    print(json.dumps(results, indent=1))
    with open("/tmp/qtime.json", "w") as f:
        json.dump(results, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
