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
