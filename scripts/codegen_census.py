#!/usr/bin/env python
"""Starless-node census: which operators run OUTSIDE whole-stage
codegen, across every registered query's AQE-off physical plan.

This is the data behind plan_audit's NO_CODEGEN check-set decision
(r14): Project/Filter are flagged because their starless occurrences
are exactly the bounded HOF-fallback set, while other row operators
either never codegen structurally (Window, ObjectHashAggregate,
exchanges, python nodes, ...) or have rare legitimately-starless
shapes (pivot HashAggregates, non-inner BroadcastHashJoin builds,
non-codegen generators). Re-run after Spark upgrades or large catalog
changes to confirm the exemption story still holds.

Usage: python scripts/codegen_census.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from lightsaber_spark import get_spark
    from lightsaber_spark.plan_audit import (
        _plan_segments,
        _tree_nodes_cg,
        formatted_plan,
    )

    import __spark_entry__ as entrymod

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="codegen-census")
    spark.sparkContext.setLogLevel("ERROR")

    starless: Counter = Counter()
    starred: Counter = Counter()
    example: dict[str, str] = {}
    for name, fn in entrymod.queries().items():
        plan = formatted_plan(fn(spark, sf_dir), adaptive=False)
        for seg in _plan_segments(plan):
            skip = None
            for depth, star, nname, _nid in _tree_nodes_cg(seg):
                if skip is not None:
                    if depth > skip:
                        continue
                    skip = None
                if nname == "AdaptiveSparkPlan":
                    skip = depth  # cached subtree: codegen deferred
                    continue
                (starred if star else starless)[nname] += 1
                if not star:
                    example.setdefault(nname, name)

    for n, c in sorted(starless.items(), key=lambda kv: -kv[1]):
        print(
            f"{c:6d} starless {n:30s} starred={starred.get(n, 0):<6d}"
            f" e.g. {example[n]}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
