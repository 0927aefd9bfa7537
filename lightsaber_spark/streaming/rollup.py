"""Continuous pane rollup — a streaming materialized aggregate on a
data lake, maintained exactly-once.

The reference forwards completed window fragments downstream and merges
them pairwise in memory (``src/result/PartialResultSlot.h:288-368``).
At 100 TB the durable analog is a *partial-aggregate table*: each
micro-batch appends its pane-level partials (sum/count/min/max are all
mergeable), and readers finish the merge at query time. Two properties
make this scale:

* **Idempotent replay** — partials land in a ``_batch_id=<n>``
  partition written with dynamic partition overwrite, so a replayed
  micro-batch (checkpoint recovery) overwrites its own partition
  instead of double-counting. Exactly-once without any transaction
  log.
* **Bounded merge cost** — the reader's final merge touches
  O(panes × batches) partial rows, not raw events; periodic
  ``compact`` folds history into one partition to keep that bounded.

This is the ``foreachBatch`` sink pattern (SURVEY §2.6): everything
the stream writes is also a normal parquet table for batch readers.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

# measure spec: (fn, src_col, alias) with fn in sum/count/min/max —
# exactly the mergeable subset (AVG = sum+count, SURVEY §2.4
# "invertible" aggregates)
_MERGE_FN = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}


def _pane_col(ts_col: str, pane_sec: int) -> Column:
    # the SAME exact-integer bucketing as batch windows — one source
    # (review finding: this used to re-implement the formula verbatim,
    # inviting silent divergence from the window_start it composes with)
    from lightsaber_spark.operators.window_agg import _exact_bucket

    return _exact_bucket(F.unix_micros(F.col(ts_col)), pane_sec)


def _partial_aggs(measures: Sequence[tuple[str, str | None, str]]) -> list[Column]:
    out = []
    for fn, col, alias in measures:
        if fn == "count":
            # honor the src col like window_agg._agg_exprs: a
            # ('count', col, a) spec ported from the batch aggregates
            # must skip nulls, not count rows (r12 review)
            out.append(
                (F.count(F.col(col)) if col else F.count(F.lit(1))).alias(alias)
            )
        elif fn in ("sum", "min", "max"):
            out.append(getattr(F, fn)(col).alias(alias))
        else:  # pragma: no cover - guarded by callers
            raise ValueError(f"non-mergeable measure {fn!r}")
    return out


def _merge_aggs(measures: Sequence[tuple[str, str | None, str]]) -> list[Column]:
    return [_MERGE_FN[fn](alias).alias(alias) for fn, _, alias in measures]


def continuous_pane_rollup(
    stream: DataFrame,
    ts_col: str,
    pane_sec: int,
    measures: Sequence[tuple[str, str | None, str]],
    keys: Sequence[str],
    out_path: str,
    checkpoint_dir: str,
):
    """Start an availableNow foreachBatch query appending pane partials
    to ``out_path`` (parquet, partitioned by ``_batch_id``). Returns the
    StreamingQuery; await it, then read with :func:`rollup_view`."""
    keys = list(keys)
    paggs = _partial_aggs(measures)

    def _write_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        partial = (
            batch_df.withColumn("pane_start", _pane_col(ts_col, pane_sec))
            .groupBy("pane_start", *keys)
            .agg(*paggs)
            .withColumn("_batch_id", F.lit(int(batch_id)))
        )
        old = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            partial.write.mode("overwrite").partitionBy("_batch_id").parquet(out_path)
        finally:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", old)

    return (
        stream.writeStream.foreachBatch(_write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def rollup_view(
    spark: SparkSession,
    out_path: str,
    measures: Sequence[tuple[str, str | None, str]],
    keys: Sequence[str],
) -> DataFrame:
    """Finish the merge: partial rows → one row per (pane, keys).

    ``_batch_id=-2`` is :func:`compact`'s staging partition — never
    part of the readable state (partition pruning skips its files)."""
    return (
        spark.read.parquet(out_path)
        .filter(F.col("_batch_id") != -2)
        .groupBy("pane_start", *list(keys))
        .agg(*_merge_aggs(measures))
    )


def sliding_view(
    spark: SparkSession,
    out_path: str,
    measures: Sequence[tuple[str, str | None, str]],
    keys: Sequence[str],
    size_sec: int,
    slide_sec: int,
    pane_sec: int,
) -> DataFrame:
    """Serve a SLIDING window aggregate from the maintained pane table —
    the streaming answer to the reference's high-ratio sliding windows
    (its raison d'être, window(3600,1)): the stream maintains O(panes)
    state once, and ANY window whose size and slide are multiples of
    ``pane_sec`` is reconstructed at read time by pane expansion + merge
    (LightSaber's slicing, ``WindowDefinition.h:80-90``, as a lakehouse
    read pattern — no per-window streaming state, no re-ingestion).

    Returns one row per (window_start, keys) over windows fully covered
    by panes containing data."""
    if size_sec % pane_sec or slide_sec % pane_sec:
        raise ValueError("size and slide must be multiples of pane_sec")
    if slide_sec > size_sec:
        # with slide > size some panes belong to NO window (s_min > s_max
        # below) and F.sequence with a positive step throws at runtime;
        # hopping-with-gaps is not a supported view shape.
        raise ValueError("slide_sec must be <= size_sec")
    panes = rollup_view(spark, out_path, measures, keys)
    p = F.col("pane_start")
    # window starts s (multiples of slide) whose [s, s+size) fully
    # contains pane [p, p+pane): p + pane - size <= s <= p
    lo = p + F.lit(pane_sec - size_sec)
    s_min = -F.floor(-lo / F.lit(slide_sec)) * F.lit(slide_sec)  # ceil to slide
    s_max = F.floor(p / F.lit(slide_sec)) * F.lit(slide_sec)
    expanded = panes.withColumn(
        "window_start",
        F.explode(
            F.sequence(
                s_min.cast("bigint"), s_max.cast("bigint"),
                F.lit(slide_sec).cast("bigint"),
            )
        ),
    )
    return (
        expanded.groupBy("window_start", *list(keys))
        .agg(*_merge_aggs(measures))
    )


def compact(
    spark: SparkSession,
    out_path: str,
    measures: Sequence[tuple[str, str | None, str]],
    keys: Sequence[str],
) -> None:
    """Fold CLOSED batch partitions into the single ``_batch_id=-1``
    partition (run between streaming runs; readers see identical
    results before and after).

    The HIGHEST live ``_batch_id`` partition is deliberately LEFT
    UNFOLDED: micro-batches commit sequentially, so it is the only
    partition whose checkpoint commit may not have landed before the
    last run stopped — folding it would break idempotent replay (the
    recovered run re-appends its partition and the fold would
    double-count it; review finding). It folds on the next compact,
    once a later batch exists above it.

    Consistency (r11 ADVICE — staged swap, self-healing): the merge is
    STAGED under the ``_batch_id=-2`` sentinel partition, which every
    reader (:func:`rollup_view`) filters out, then committed by ONE
    atomic rename publishing a hidden ``_folds`` marker whose BODY
    names the entire fold set (the id list used to live in the marker
    FILENAME, which breaks past ~60 ids — 255-byte filename component
    limit on local FS/HDFS; the body is unbounded and the tmp-write +
    rename keeps the commit a single atomic op), and only
    then swapped in: folded directories (including the old ``-1``) are
    deleted and the stage is RENAMED to ``-1``. A concurrent reader
    therefore never double-counts — the old state stays fully readable
    until the swap begins. A crash anywhere is repaired AUTOMATICALLY
    by the next compact: an uncommitted stage (no marker) is
    discarded; a committed stage is rolled forward (the marker names
    exactly the directories still to prune — later appended batches
    are untouched and ids never recur, the checkpoint survives the
    crash). The only residual window is the swap itself, where a
    concurrent reader can transiently UNDERCOUNT the folded ids;
    quiesce readers across compact when strict monotonic reads are
    required. All FS ops use the Hadoop API; the atomicity story
    assumes atomic directory rename, i.e. local FS and HDFS. On S3A,
    rename is a non-atomic per-file copy — a crash mid-publish can
    leave a PARTIAL ``-1`` alongside the committed stage; recovery
    handles that (``_swap`` deletes any existing ``-1`` before the
    publish rename, since the committed stage supersedes it), but a
    concurrent reader during the S3A copy window can see a torn
    ``-1`` — quiesce readers across compact on object stores."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path
    fs = hpath(out_path).getFileSystem(spark._jsc.hadoopConfiguration())
    base = out_path.rstrip("/")
    stage = f"{base}/_batch_id=-2"

    def _write_marker(dir_path: str, fold_ids: list[int]) -> None:
        # ONE marker file names the ENTIRE fold set — per-id marker
        # files would make a crash mid-loop look like a committed
        # smaller fold and permanently double-count the unlisted ids
        # (review finding). The id list is the file's CONTENT, not its
        # name (a name grows past the 255-byte filename component
        # limit at ~60 ids and wedges compact forever; r12 ADVICE).
        # Commit point = the atomic RENAME from the tmp name: a crash
        # mid-write leaves only `_folds.tmp`, which recovery treats as
        # uncommitted.
        payload = ".".join(str(i) for i in sorted(fold_ids))
        tmp = hpath(f"{dir_path}/_folds.tmp")
        out = fs.create(tmp, True)
        out.write(bytearray(payload.encode("ascii")))
        out.close()
        if not fs.rename(tmp, hpath(f"{dir_path}/_folds")):
            raise IOError(f"compact: failed to commit marker in {dir_path}")

    def _markers(path: str) -> list[int]:
        if not fs.exists(hpath(path)):
            return []
        for st in fs.listStatus(hpath(path)):
            name = st.getPath().getName()
            if name == "_folds":
                inp = fs.open(st.getPath())
                try:
                    body = jvm.org.apache.commons.io.IOUtils.toString(
                        inp, "US-ASCII"
                    )
                finally:
                    inp.close()
                return [int(x) for x in body.strip().split(".") if x]
            if name.startswith("_folds.") and name != "_folds.tmp":
                # legacy name-encoded marker (pre-r13 layout)
                return [int(x) for x in name[len("_folds."):].split(".")]
        return []

    def _swap(fold_ids: list[int]) -> None:
        # prune the folded dirs (incl. old -1), then publish the stage.
        # Hadoop FS signals most failures by returning FALSE, not
        # throwing (r12 review): an unchecked failed delete of old -1
        # would make the rename land the stage INSIDE it (rename-into-
        # existing-dir semantics) and double-count; a failed rename
        # after the prune would lose the folded partials. Check every
        # boolean and abort loudly — the committed stage + marker make
        # the next compact's recovery roll the swap forward.
        for i in fold_ids:
            p = hpath(f"{base}/_batch_id={i}")
            if not fs.delete(p, True) and fs.exists(p):
                raise IOError(f"compact: failed to prune {p}")
        tgt = hpath(f"{base}/_batch_id=-1")
        # any -1 still existing here is a torn artifact of a crashed
        # non-atomic publish (S3A per-file copy): the committed stage
        # supersedes it, and renaming into an EXISTING dir would NEST
        # the stage inside it (Hadoop returns true!) — delete first
        # (r12 ADVICE)
        if fs.exists(tgt) and not fs.delete(tgt, True):
            raise IOError(f"compact: failed to clear torn {tgt}")
        if not fs.rename(hpath(stage), tgt):
            raise IOError(f"compact: failed to publish stage as {tgt}")
        # tidy the (hidden) marker off the new -1 (best-effort)
        fs.delete(hpath(f"{base}/_batch_id=-1/_folds"), False)

    # recovery: a leftover stage is rolled forward iff committed
    if fs.exists(hpath(stage)):
        prior = _markers(stage)
        if prior:
            _swap(prior)
        else:
            fs.delete(hpath(stage), True)

    raw = spark.read.parquet(out_path)
    # bounded collect: one id per micro-batch partition
    ids = sorted(r[0] for r in raw.select("_batch_id").distinct().collect())
    live = [i for i in ids if i >= 0]
    if not live:
        return
    keep = max(live)
    fold = [i for i in ids if i != keep]
    if not fold or fold == [-1]:
        return  # nothing new to fold
    merged = (
        raw.filter(F.col("_batch_id").isin(fold))
        .groupBy("pane_start", *list(keys))
        .agg(*_merge_aggs(measures))
    )
    # stage: plain parquet dir whose NAME carries the partition value —
    # identical layout to a partitionBy write (no _batch_id in files)
    merged.write.mode("overwrite").parquet(stage)
    # commit point: ONE atomic marker publish naming the whole fold set
    _write_marker(stage, fold)
    _swap(fold)
