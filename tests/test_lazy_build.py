"""Mechanized 'queries stay lazy' invariant (CLAUDE.md): building a
registered query must trigger NO distributed work — driver actions at
build time are the anti-pattern that turns a declarative catalog into
hidden eager jobs at 100 TB. The only allowed build-time jobs are
1-task parquet footer/schema reads (load_tables) and the documented
bounded-eager whitelist below.

Before r14 this rule was prose + review; a per-query job-group probe
makes it a failing test. Method: each build runs under its own Spark
job group; any job in that group with MORE than one task is a real
distributed action (schema reads are single-task), so a non-whitelisted
query with one fails."""

from __future__ import annotations

import pytest

from tests.conftest import SF_DIR

# CLAUDE.md "Keep queries lazy" documented exceptions — every entry is
# a bounded eager class (k-centroid collect, merge-table learn,
# iterative CC/pagerank localCheckpoint, frozen-state reload, or a
# composition that calls one of those).
_EAGER_BUILD_WHITELIST = {
    "dedup_duplicate_groups",            # iterative CC, localCheckpoint/round
    "dedup_fuzzy_keep_representatives",  # calls duplicate_groups
    "sim_ivf_topk",                      # collects the tiny centroid set
    "sim_ivf_kmeans_topk",               # k-means fit (bounded k)
    "dedup_semantic_groups",             # same bounded centroid class
    "dedup_semantic_delta",              # frozen corpus fit reuse
    "dedup_embedding_cosine",            # centroid-bucketed GEMM setup
    "dedup_embedding_lsh",               # shared similarity setup
    "bpe_tokenize_docs",                 # merge-table learning (bounded)
    "pagerank_customer_supplier",        # setup-only localCheckpoint
    "pipeline_quality_dedup_split_pack", # composes duplicate_groups
    "quality_learned_classifier",        # perceptron fit: rounds+1
                                         # one-row collects (r15)
}


def test_catalog_builds_are_lazy(spark):
    import __spark_entry__ as entrymod

    sc = spark.sparkContext
    tracker = sc.statusTracker()
    offenders = []
    for name, fn in entrymod.queries().items():
        if name in _EAGER_BUILD_WHITELIST:
            continue
        group = f"lazy-{name}"
        sc.setJobGroup(group, name)
        try:
            fn(spark, SF_DIR)
        finally:
            sc.setJobGroup(None, None)
        for j in tracker.getJobIdsForGroup(group):
            info = tracker.getJobInfo(j)
            if info is None:
                continue
            tasks = 0
            for s in info.stageIds:
                st = tracker.getStageInfo(s)
                if st is not None:
                    tasks += st.numTasks
            if tasks > 1:
                offenders.append(f"{name}: build job {j} ran {tasks} tasks")
    assert not offenders, (
        "non-whitelisted queries ran distributed work at BUILD time "
        "(CLAUDE.md lazy invariant):\n" + "\n".join(offenders)
    )


def test_whitelisted_eager_builds_are_bounded(spark):
    """The whitelist itself stays honest: every documented eager build
    must finish its build-time jobs over the testdata without touching
    a job bigger than the input partition count (a bounded collect or
    checkpoint, never a blow-up)."""
    import __spark_entry__ as entrymod

    sc = spark.sparkContext
    tracker = sc.statusTracker()
    default_par = sc.defaultParallelism
    queries = entrymod.queries()
    for name in sorted(_EAGER_BUILD_WHITELIST):
        group = f"eager-{name}"
        sc.setJobGroup(group, name)
        try:
            queries[name](spark, SF_DIR)
        finally:
            sc.setJobGroup(None, None)
        for j in tracker.getJobIdsForGroup(group):
            info = tracker.getJobInfo(j)
            if info is None:
                continue
            for s in info.stageIds:
                st = tracker.getStageInfo(s)
                assert st is None or st.numTasks <= 4 * default_par, (
                    f"{name}: build stage {s} has {st.numTasks} tasks — "
                    "the bounded-eager contract broke"
                )
