#!/usr/bin/env python
"""Warm-repeat adjudication for one query (default
dedup_fuzzy_keep_representatives) at sf0.1 — VERDICT r12 watch item #1.

Runs the query N warm passes back-to-back (caches released between
passes, same protocol as bench.py) and prints each pass's wall time.
If HEAD lands in the r11 band (~3.7 s) the 8.20 s driver number was VM
weather; a consistent ~8 s indicates a real regression needing a tree
A/B.
"""

from __future__ import annotations

import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)


def main() -> None:
    qname = sys.argv[1] if len(sys.argv) > 1 else "dedup_fuzzy_keep_representatives"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from lightsaber_spark import get_spark
    import __spark_entry__ as entrymod

    spark = get_spark(app_name="ab-fuzzy")
    spark.sparkContext.setLogLevel("ERROR")

    from lightsaber_spark.session import load_tables
    from lightsaber_spark.functions.dedup import release_shingle_caches
    from pyspark.sql import functions as F

    tables = load_tables(spark, sf_dir)
    tables["events"].groupBy("event_type").agg(F.count(F.lit(1)).alias("n")).write.format(
        "noop"
    ).mode("overwrite").save()
    pup = F.pandas_udf(lambda s: s, "bigint")
    tables["events"].select(pup(F.col("event_id"))).limit(1000).write.format(
        "noop"
    ).mode("overwrite").save()

    fn = entrymod.queries()[qname]
    for i in range(n):
        t0 = time.time()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        print(f"pass {i}: {dt:.2f} s", flush=True)
        release_shingle_caches()
    spark.stop()


if __name__ == "__main__":
    main()
