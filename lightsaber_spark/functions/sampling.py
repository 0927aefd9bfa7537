"""Deterministic sampling & dataset splitting for training pipelines.

``df.sample()`` is seed-dependent *per partitioning* (a repartition or
retry changes the sample), which is unacceptable for reproducible
training data. Everything here derives the keep/route decision from
md5 of a stable row key — the repo's cross-engine hash — so:

- the sample is a pure function of the data (stable under partitioning,
  retries, engine version, and engine itself: DuckDB twins match
  bit-for-bit);
- re-runs over grown data keep previously-selected rows selected
  (append-only corpora get consistent incremental samples);
- at 100 TB it is one embarrassingly-parallel filter — no shuffle, no
  state, pushed right above the scan.

The uniformity argument is the usual one: md5 is uniform on [0, 2^60)
over distinct keys, so ``hash < rate·2^60`` keeps each key with
probability ``rate`` (exactly the expected fraction in distribution,
not exactly ``rate·n`` rows — use rank-based selection when an exact
count is required).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, functions as F

from lightsaber_spark.functions.dedup import shingle_hash

TWO60 = 1 << 60


def _key_hash(key_cols: Sequence[str], salt: str) -> Column:
    """60-bit md5 hash of the salted, ','-joined key columns.
    DuckDB twin: ``('0x'||substr(md5(<salt>||','||cols...),1,15))::BIGINT``."""
    parts = [F.lit(salt)] + [F.col(c).cast("string") for c in key_cols]
    return shingle_hash(F.concat_ws(",", *parts))


def hash_sample(
    df: DataFrame,
    rate: float,
    key_cols: Sequence[str],
    salt: str = "sample",
) -> DataFrame:
    """Deterministic ~``rate`` sample: keep rows whose key hash falls in
    the first ``rate`` fraction of hash space. Same keys always sample
    together (e.g. key on user_id → per-user all-or-nothing, the
    leakage-safe grouping for train/eval splits)."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError("rate must be in [0, 1]")
    threshold = int(round(rate * TWO60))
    return df.filter(_key_hash(key_cols, salt) < F.lit(threshold))


def hash_split(
    df: DataFrame,
    weights: Sequence[float],
    key_cols: Sequence[str],
    salt: str = "split",
    split_col: str = "split_id",
) -> DataFrame:
    """Deterministic n-way split: adds ``split_col`` in [0, len(weights))
    routing each row by key hash, with fractions ~``weights`` (must sum
    to 1). The standard train/val/test split — keyed, so all rows of a
    key land in one split (no leakage across splits)."""
    if abs(sum(weights) - 1.0) > 1e-9:
        raise ValueError("weights must sum to 1")
    h = _key_hash(key_cols, salt)
    # cumulative integer thresholds — exact, no float boundary ambiguity
    cum, bounds = 0.0, []
    for w in weights[:-1]:
        cum += w
        bounds.append(int(round(cum * TWO60)))
    expr = F.lit(len(weights) - 1)
    for i in range(len(bounds) - 1, -1, -1):
        expr = F.when(h < F.lit(bounds[i]), F.lit(i)).otherwise(expr)
    return df.withColumn(split_col, expr.cast("int"))


def sample_oracle_pred(key_exprs: Sequence[str], rate: float, salt: str = "sample") -> str:
    """DuckDB WHERE-clause twin of :func:`hash_sample`'s filter."""
    threshold = int(round(rate * TWO60))
    joined = " || ',' || ".join(f"CAST({e} AS VARCHAR)" for e in key_exprs)
    return (
        f"('0x'||substr(md5('{salt}' || ',' || {joined}),1,15))::BIGINT"
        f" < {threshold}"
    )


def split_oracle_expr(
    key_exprs: Sequence[str], weights: Sequence[float], salt: str = "split"
) -> str:
    """DuckDB CASE-expression twin of :func:`hash_split`'s routing."""
    joined = " || ',' || ".join(f"CAST({e} AS VARCHAR)" for e in key_exprs)
    h = f"('0x'||substr(md5('{salt}' || ',' || {joined}),1,15))::BIGINT"
    cum, cases = 0.0, []
    for i, w in enumerate(weights[:-1]):
        cum += w
        cases.append(f"WHEN {h} < {int(round(cum * (1 << 60)))} THEN {i}")
    return f"CASE {' '.join(cases)} ELSE {len(weights) - 1} END"
