"""passage_delta_vs_corpus — the delta-ingest rung of exact-substring
dedup (Lee et al. 2021): pinned against an independently written
brute-force Python model on a hand-crafted corpus∪delta, plus the
exact-copy full-coverage invariant."""

from __future__ import annotations

import re

from lightsaber_spark.pipeline_queries import (
    _PASSAGE_K,
    q_passage_delta_vs_corpus,
    release_passage_index,
)

K = _PASSAGE_K  # 10

A = " ".join(f"t{i}" for i in range(1, 16))               # 15 tokens
RUN = " ".join(f"t{i}" for i in range(3, 13))             # A's tokens 3..12
DOCS = {
    1: A,                                                 # corpus
    2: "u1 u2 u3 " + RUN + " u4",                         # corpus, shares RUN
    3: "v1 v2 v3 v4 v5 v6 v7 v8 v9 v10 v11",              # corpus, unique
    10: "x1 x2 x3 x4 x5 " + RUN,                          # delta: 1 shared k-gram
    20: "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12",         # delta: no hits
    30: "s1 s2 s3 s4 s5",                                 # delta: < k tokens
}
# delta convention of the query: doc_id % 10 == 0, plus re-keyed exact
# copies of corpus docs with doc_id % 50 == 1 (here: doc 1 -> 1000001)


def _model():
    tok = lambda s: re.findall(r"[a-z0-9]+", s.lower()) if s else []  # noqa: E731
    grams = lambda ts: [  # noqa: E731
        tuple(ts[p : p + K]) for p in range(max(len(ts) - K + 1, 0))
    ]
    corpus_grams: dict[tuple, set[int]] = {}
    for i, t in DOCS.items():
        if i % 10 != 0:
            for g in grams(tok(t)):
                corpus_grams.setdefault(g, set()).add(i)
    delta = {i: tok(t) for i, t in DOCS.items() if i % 10 == 0}
    delta.update({i + 1000000: tok(t) for i, t in DOCS.items() if i % 50 == 1})
    out = {}
    for i, ts in delta.items():
        hits = [p for p, g in enumerate(grams(ts)) if g in corpus_grams]
        cov = {p + j for p in hits for j in range(K)}
        cds: set[int] = set()
        for p in hits:
            cds |= corpus_grams[tuple(ts[p : p + K])]
        out[i] = (len(ts), len(hits), len(cov), len(cds))
    return out


def test_passage_delta_matches_brute_force_model(spark, tmp_path):
    sf_dir = str(tmp_path / "sf")
    spark.createDataFrame(
        sorted(DOCS.items()), "doc_id long, text string"
    ).write.parquet(sf_dir + "/documents.parquet")
    try:
        got = {
            r.doc_id: (r.n_tokens, r.n_dup_positions, r.n_covered, r.n_corpus_docs)
            for r in q_passage_delta_vs_corpus(spark, sf_dir).collect()
        }
    finally:
        release_passage_index()
    want = _model()
    assert got == want
    # the law the delta rung must satisfy: an exact re-keyed COPY of a
    # corpus doc collides on EVERY k-gram — full coverage
    n_tok = len(DOCS[1].split())
    assert got[1000001] == (n_tok, n_tok - K + 1, n_tok, 2)
    # partial overlap: exactly the one shared k-gram, covering k tokens
    # of the delta doc, shared with both corpus holders of RUN
    assert got[10] == (15, 1, K, 2)
    # no-hit and shorter-than-k docs are still emitted, with zeros
    assert got[20] == (12, 0, 0, 0)
    assert got[30] == (5, 0, 0, 0)


def test_streaming_passage_coverage_matches_batch(spark, tmp_path):
    """The streaming twin must emit exactly the batch
    passage_delta_vs_corpus rows when fed the same delta docs against
    the same frozen corpus index — split across two micro-batches to
    prove per-doc independence (stateless contract)."""
    import time as _t

    from lightsaber_spark.pipeline_queries import _passage_index
    from lightsaber_spark.streaming.stream import (
        read_stream,
        run_available_now,
        streaming_passage_coverage,
    )

    sf_dir = str(tmp_path / "sf")
    spark.createDataFrame(
        sorted(DOCS.items()), "doc_id long, text string"
    ).write.parquet(sf_dir + "/documents.parquet")

    delta = [(i, t) for i, t in DOCS.items() if i % 10 == 0] + [
        (i + 1000000, t) for i, t in DOCS.items() if i % 50 == 1
    ]
    src = str(tmp_path / "delta_src")
    half = len(delta) // 2
    for part in (delta[:half], delta[half:]):
        spark.createDataFrame(
            part, "doc_id long, text string"
        ).coalesce(1).write.mode("append").parquet(src)
        _t.sleep(1.1)

    try:
        from pyspark.sql import functions as F

        cidx = _passage_index(spark, sf_dir, K).filter(
            F.col("doc_id") % 10 != 0
        )
        stream = read_stream(
            spark, src, spark.read.parquet(src).schema, max_files_per_trigger=1
        )
        got = {
            tuple(r)
            for r in run_available_now(
                streaming_passage_coverage(stream, cidx, k=K),
                str(tmp_path / "ck_pc"),
                output_mode="update",
                table_name="t_spc",
            ).collect()
        }
        want = {tuple(r) for r in q_passage_delta_vs_corpus(spark, sf_dir).collect()}
    finally:
        release_passage_index()
    assert got == want
    assert len(got) == len(delta)  # zero-hit and short docs emitted too


def test_streaming_passage_coverage_null_doc_id_survives(spark, tmp_path):
    """A NULL doc_id must not kill the streaming query (r12 review:
    int(None) in the stateful fold raised and terminated the stream).
    The null-key group emits one null-id row; other docs unaffected."""
    import time as _t

    from pyspark.sql import functions as F

    from lightsaber_spark.functions.dedup import (
        positional_shingles_udf,
        shingle_hash,
    )
    from lightsaber_spark.streaming.stream import (
        read_stream,
        run_available_now,
        streaming_passage_coverage,
    )

    corpus = spark.createDataFrame([(1, A)], "doc_id long, text string")
    cidx = corpus.select(
        "doc_id",
        F.posexplode(positional_shingles_udf(K)(F.col("text"))).alias(
            "pos", "_sh"
        ),
    ).select(
        "doc_id",
        F.col("pos").cast("bigint").alias("pos"),
        shingle_hash(F.col("_sh")).alias("h"),
    )
    src = str(tmp_path / "null_src")
    spark.createDataFrame(
        [(None, A), (5, A), (None, "short text")],
        "doc_id long, text string",
    ).coalesce(1).write.parquet(src)
    _t.sleep(0.2)
    stream = read_stream(
        spark, src, spark.read.parquet(src).schema, max_files_per_trigger=1
    )
    out = run_available_now(
        streaming_passage_coverage(stream, cidx, k=K),
        str(tmp_path / "ck_null"),
        output_mode="update",
        table_name="t_spc_null",
    ).collect()
    by_id = {r.doc_id: r for r in out}
    n_tok = len(A.split())
    assert by_id[5].n_covered == n_tok  # the real doc still scores fully
    assert None in by_id and len(out) == 2  # one combined null-id row


def test_streaming_passage_coverage_foreach_batch_matches_batch(spark, tmp_path):
    """The pure-JVM foreachBatch scale path: per-batch relational
    aggregation (shared passage_coverage_vs_index core) must emit the
    batch rows exactly, and a checkpointed re-run adds nothing
    (idempotent replay via dynamic partition overwrite)."""
    import time as _t

    from pyspark.sql import functions as F

    from lightsaber_spark.pipeline_queries import _passage_index
    from lightsaber_spark.streaming.stream import (
        read_stream,
        streaming_passage_coverage_foreach_batch,
    )

    sf_dir = str(tmp_path / "sf")
    spark.createDataFrame(
        sorted(DOCS.items()), "doc_id long, text string"
    ).write.parquet(sf_dir + "/documents.parquet")
    delta = [(i, t) for i, t in DOCS.items() if i % 10 == 0] + [
        (i + 1000000, t) for i, t in DOCS.items() if i % 50 == 1
    ]
    src = str(tmp_path / "delta_src_fb")
    half = len(delta) // 2
    for part in (delta[:half], delta[half:]):
        spark.createDataFrame(
            part, "doc_id long, text string"
        ).coalesce(1).write.mode("append").parquet(src)
        _t.sleep(1.1)

    out = str(tmp_path / "cov_out")
    ck = str(tmp_path / "ck_fb")

    def run():
        cidx = _passage_index(spark, sf_dir, K).filter(
            F.col("doc_id") % 10 != 0
        )
        stream = read_stream(
            spark, src, spark.read.parquet(src).schema, max_files_per_trigger=1
        )
        q = streaming_passage_coverage_foreach_batch(stream, cidx, out, ck, k=K)
        q.awaitTermination()

    cols = ["doc_id", "n_tokens", "n_dup_positions", "n_covered", "n_corpus_docs"]
    try:
        run()
        got = {tuple(r) for r in spark.read.parquet(out).select(*cols).collect()}
        want = {tuple(r) for r in q_passage_delta_vs_corpus(spark, sf_dir).collect()}
        assert got == want and len(got) == len(delta)
        run()  # checkpointed restart: input already committed, no dupes
        again = {tuple(r) for r in spark.read.parquet(out).select(*cols).collect()}
        assert again == want
    finally:
        release_passage_index()
