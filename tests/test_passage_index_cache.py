"""The shared passage index must be built once per (session, sf, k)."""

from __future__ import annotations

from lightsaber_spark.pipeline_queries import (
    _PASSAGE_INDEX_CACHE,
    _passage_index,
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
    for df in (a, c):
        df.unpersist()
    _PASSAGE_INDEX_CACHE.clear()
