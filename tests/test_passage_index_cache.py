"""The shared passage index must be built once per (session, sf, k),
prune (and unpersist) entries of dead sessions, and offer the 100 TB
parquet-materialization escape hatch."""

from __future__ import annotations

import os

from lightsaber_spark.pipeline_queries import (
    _PASSAGE_INDEX_CACHE,
    _passage_index,
    release_passage_index,
)

SF = "/root/testdata/sf0.001"


def test_passage_index_is_cached_per_session(spark):
    _PASSAGE_INDEX_CACHE.clear()
    a = _passage_index(spark, SF, 10)
    b = _passage_index(spark, SF, 10)
    assert a is b, "second call must return the same persisted DataFrame"
    # distinct k -> distinct entry
    c = _passage_index(spark, SF, 5)
    assert c is not a
    assert len(_PASSAGE_INDEX_CACHE) == 2
    # the index is persisted (StorageLevel set), so both consumer
    # queries share one materialization
    assert a.storageLevel.useMemory or a.storageLevel.useDisk
    # schema contract both consumers rely on
    assert [f.name for f in a.schema.fields] == ["doc_id", "pos", "h"]
    # cache key carries the SESSION identity, not just applicationId
    # (a fresh session on the same context must not see a cached
    # DataFrame bound to a dead session)
    assert all(k[0] == id(spark) for k in _PASSAGE_INDEX_CACHE)
    assert release_passage_index() == 2
    assert not _PASSAGE_INDEX_CACHE
    assert not a.storageLevel.useMemory and not a.storageLevel.useDisk


def test_passage_index_prunes_dead_sessions_keeps_live(spark):
    """Entries of DEAD sessions are pruned+unpersisted; an entry owned
    by a second LIVE session must be left alone (two live sessions
    alternating passage queries must not thrash each other's index)."""
    _PASSAGE_INDEX_CACHE.clear()
    a = _passage_index(spark, SF, 10)
    key = next(iter(_PASSAGE_INDEX_CACHE))

    class _DeadDF:
        # looks like a DataFrame whose owning session was stopped:
        # sparkContext._jsc is None
        unpersisted = False

        class sparkSession:
            class sparkContext:
                _jsc = None

        def unpersist(self):
            self.unpersisted = True

    dead = _DeadDF()
    dead_key = (key[0] + 1,) + key[1:]
    _PASSAGE_INDEX_CACHE[dead_key] = dead
    # a second LIVE session's entry: same live DataFrame under a
    # different session identity
    live_key = (key[0] + 2,) + key[1:]
    _PASSAGE_INDEX_CACHE[live_key] = a
    b = _passage_index(spark, SF, 5)
    assert b is not a
    assert dead_key not in _PASSAGE_INDEX_CACHE, "dead entry pruned"
    assert dead.unpersisted, "dead entry unpersisted (best-effort)"
    assert live_key in _PASSAGE_INDEX_CACHE, "live-session entry kept"
    assert a.storageLevel.useMemory or a.storageLevel.useDisk, (
        "live entry must stay persisted"
    )
    release_passage_index()


def test_passage_index_bounds_live_sibling_churn(spark):
    """r10 ADVICE: abandoned sessions sharing one live SparkContext are
    never classified dead, so other-session entries must be CAPPED
    (oldest unpersisted first) or session churn grows executor memory
    without bound. The current session's own entries are never evicted
    by the cap."""
    from lightsaber_spark.pipeline_queries import _PASSAGE_SIBLING_CAP

    _PASSAGE_INDEX_CACHE.clear()
    a = _passage_index(spark, SF, 10)
    key = next(iter(_PASSAGE_INDEX_CACHE))

    class _LiveDF:
        unpersisted = False

        def __init__(self, spark):
            self.sparkSession = spark  # live context -> never "dead"

        def unpersist(self):
            self.unpersisted = True

    churned = []
    for i in range(_PASSAGE_SIBLING_CAP + 3):
        df = _LiveDF(spark)
        churned.append(df)
        _PASSAGE_INDEX_CACHE[(key[0] + 1 + i,) + key[1:]] = df
    b = _passage_index(spark, SF, 5)  # triggers the prune
    siblings = [k for k in _PASSAGE_INDEX_CACHE if k[0] != id(spark)]
    assert len(siblings) == _PASSAGE_SIBLING_CAP, siblings
    # oldest evicted AND unpersisted; newest survivors untouched
    n_evicted = len(churned) - _PASSAGE_SIBLING_CAP
    assert all(df.unpersisted for df in churned[:n_evicted])
    assert not any(df.unpersisted for df in churned[n_evicted:])
    # own-session entries immune to the cap
    assert a is _PASSAGE_INDEX_CACHE[key] and b is not a
    release_passage_index()


def test_passage_index_key_includes_materialize_dir(spark, tmp_path):
    """Switching representations mid-session (persist → parquet) must
    build the requested representation, not return the other one."""
    _PASSAGE_INDEX_CACHE.clear()
    a = _passage_index(spark, SF, 10)  # persisted representation
    d = str(tmp_path / "pidx_switch")
    b = _passage_index(spark, SF, 10, materialize_dir=d)
    assert b is not a, "materialize_dir call must not reuse the persist"
    assert not b.storageLevel.useMemory and not b.storageLevel.useDisk
    assert len(_PASSAGE_INDEX_CACHE) == 2
    release_passage_index()


def test_passage_index_materialize_dir(spark, tmp_path):
    _PASSAGE_INDEX_CACHE.clear()
    d = str(tmp_path / "pidx")
    os.makedirs(d, exist_ok=True)
    a = _passage_index(spark, SF, 10, materialize_dir=d)
    # parquet-backed: no executor-memory persist
    assert not a.storageLevel.useMemory and not a.storageLevel.useDisk
    sub = [p for p in os.listdir(d) if p.startswith("passage_index_k10_")]
    assert len(sub) == 1, "index written once under materialize_dir"
    # same values as the persisted path
    release_passage_index()
    b = _passage_index(spark, SF, 10)
    assert a.count() == b.count()
    assert (
        a.selectExpr("sum(h % 1000003) s").collect()[0].s
        == b.selectExpr("sum(h % 1000003) s").collect()[0].s
    )
    release_passage_index()


def test_materialize_parquet_once_publishes_by_rename(spark, tmp_path):
    """r10 ADVICE: the one-time write must go to a private temp dir and
    publish via rename — a reader never sees a half-written `path`, a
    lost race discards the temp dir and reuses the winner's complete
    output, and a race loser with NO complete output fails loudly."""
    from lightsaber_spark.session import materialize_parquet_once

    calls = {"n": 0}

    def build():
        calls["n"] += 1
        return spark.range(5).selectExpr("id", "id * id AS sq")

    d = str(tmp_path / "once")
    a = materialize_parquet_once(spark, build, d)
    assert a.count() == 5 and calls["n"] == 1
    # no temp dirs left behind after a clean publish
    assert [p for p in os.listdir(str(tmp_path)) if "tmp" in p] == []
    b = materialize_parquet_once(spark, build, d)
    assert b.count() == 5 and calls["n"] == 1, "complete output reused"

    # simulated lost race where the winner's output IS complete:
    # build() itself plants a finished dest (as a concurrent writer
    # landing between the marker check and our rename would)
    d2 = str(tmp_path / "race_won_by_other")

    def build_racing():
        spark.range(3).write.parquet(d2)
        return spark.range(7).selectExpr("id")

    c = materialize_parquet_once(spark, build_racing, d2)
    assert c.count() == 3, "loser must adopt the winner's output"

    # lost race with an INCOMPLETE winner: loud failure, no silent mix
    d3 = str(tmp_path / "race_lost_partial")

    def build_racing_partial():
        os.makedirs(d3, exist_ok=True)  # dest appears, no _SUCCESS
        return spark.range(7).selectExpr("id")

    import pytest

    with pytest.raises(RuntimeError, match="publish race"):
        materialize_parquet_once(spark, build_racing_partial, d3)


def test_passage_index_materialize_rejects_partial_write(spark, tmp_path):
    """A materialized index missing its _SUCCESS marker (mid-write
    kill) must be rewritten, not silently reused incomplete."""
    _PASSAGE_INDEX_CACHE.clear()
    d = str(tmp_path / "pidx_partial")
    a = _passage_index(spark, SF, 10, materialize_dir=d)
    n = a.count()
    sub = os.path.join(
        d, [p for p in os.listdir(d) if p.startswith("passage_index_k10_")][0]
    )
    os.remove(os.path.join(sub, "_SUCCESS"))  # simulate mid-write kill
    release_passage_index()
    _PASSAGE_INDEX_CACHE.clear()
    b = _passage_index(spark, SF, 10, materialize_dir=d)
    assert os.path.exists(os.path.join(sub, "_SUCCESS")), "index rewritten"
    assert b.count() == n
    release_passage_index()


def test_passage_index_sibling_cap_is_per_session(spark):
    """r10 ADVICE follow-up: the churn cap counts DISTINCT sibling
    sessions, not entries — a single live sibling holding more than
    _PASSAGE_SIBLING_CAP (sf_dir, k) indexes keeps them ALL (no
    eviction with zero session churn)."""
    from lightsaber_spark.pipeline_queries import _PASSAGE_SIBLING_CAP

    _PASSAGE_INDEX_CACHE.clear()
    a = _passage_index(spark, SF, 10)
    key = next(iter(_PASSAGE_INDEX_CACHE))

    class _LiveDF:
        unpersisted = False

        def __init__(self, spark):
            self.sparkSession = spark

        def unpersist(self):
            self.unpersisted = True

    # ONE sibling session with cap+2 distinct (k) entries
    one_sid = key[0] + 1
    own = []
    for i in range(_PASSAGE_SIBLING_CAP + 2):
        df = _LiveDF(spark)
        own.append(df)
        _PASSAGE_INDEX_CACHE[(one_sid, key[1], key[2], 100 + i, key[4])] = df
    _passage_index(spark, SF, 5)  # triggers the prune
    assert not any(df.unpersisted for df in own), (
        "a single sibling session's entries must never be evicted"
    )
    # now churn in TWO more sibling sessions: the oldest session
    # (one_sid) exceeds the cap and loses ALL its entries at once
    newer = []
    for j in range(_PASSAGE_SIBLING_CAP):
        df = _LiveDF(spark)
        newer.append(df)
        _PASSAGE_INDEX_CACHE[(one_sid + 1 + j, key[1], key[2], 10, key[4])] = df
    _passage_index(spark, SF, 7)
    assert all(df.unpersisted for df in own), "oldest session evicted whole"
    assert not any(df.unpersisted for df in newer)
    sib_sessions = {k[0] for k in _PASSAGE_INDEX_CACHE if k[0] != id(spark)}
    assert len(sib_sessions) == _PASSAGE_SIBLING_CAP
    release_passage_index()


def test_materialize_parquet_once_trailing_slash(spark, tmp_path):
    """r10 ADVICE: a path with a trailing slash must behave identically
    to the bare path — the temp dir is built from the normalized path
    (a sibling of dest), so the post-write race check can't fire
    spuriously on our own nested temp dir."""
    from lightsaber_spark.session import materialize_parquet_once

    calls = {"n": 0}

    def build():
        calls["n"] += 1
        return spark.range(4).selectExpr("id")

    d = str(tmp_path / "slashed")
    a = materialize_parquet_once(spark, build, d + "/")
    assert a.count() == 4 and calls["n"] == 1
    # no leftover temp dirs anywhere (neither sibling nor nested)
    assert [p for p in os.listdir(str(tmp_path)) if "tmp" in p] == []
    assert [p for p in os.listdir(d) if "tmp" in p] == []
    # the slashed and bare spellings address the SAME materialization
    b = materialize_parquet_once(spark, build, d)
    assert b.count() == 4 and calls["n"] == 1, "complete output reused"


def test_materialize_nested_rename_race_cleans_up(spark, tmp_path):
    """Review finding (r11 continuation): a winner publishing INSIDE
    the check->rename window makes Hadoop rename nest our temp dir
    inside the published dest; the old marker-gated cleanup skipped it
    whenever the winner was complete, leaking a duplicate parquet tree
    inside the published path. The loser must delete the nested dir
    and adopt the winner's output."""
    from lightsaber_spark.session import materialize_parquet_once

    d = str(tmp_path / "race_nested")

    def plant_winner():
        # a complete competing publish lands in the window
        spark.range(3).write.parquet(d)

    out = materialize_parquet_once(
        spark,
        lambda: spark.range(7).selectExpr("id"),
        d,
        _pre_rename_hook=plant_winner,
    )
    assert out.count() == 3, "loser adopts the winner's output"
    assert [p for p in os.listdir(d) if "__tmp-" in p] == [], (
        "no nested duplicate tree inside the published dest"
    )
    assert [p for p in os.listdir(str(tmp_path)) if "__tmp-" in p] == [], (
        "loser's sibling temp dir removed"
    )
    # subsequent reuse is clean and does not rebuild
    again = materialize_parquet_once(
        spark, lambda: spark.range(7).selectExpr("id"), d
    )
    assert again.count() == 3
