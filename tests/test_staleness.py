"""Mechanized-staleness invariants (round-3 verdict #2).

The contract under test: a green driver CORRECTNESS row vouches for a
query only while ``impl_hash`` of its implementation matches the hash
recorded at that green — mutating the query body, a transitively
called engine helper, or the oracle SQL must change the hash, and a
hash mismatch must rotate the query into the front (stale) tier of the
driver sweep ordering.
"""

from __future__ import annotations

import importlib.util
import json
import os
import sys

import pytest

from lightsaber_spark.staleness import impl_hash, is_vouched

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_MODULE_V1 = '''
def helper(x):
    return x + 1

def query(spark, sf_dir):
    return helper(10)
'''

# same query source, helper body mutated — the transitive case
_MODULE_V2_HELPER = _MODULE_V1.replace("return x + 1", "return x + 2")

# helper untouched, query body mutated — the direct case
_MODULE_V3_QUERY = _MODULE_V1.replace("return helper(10)", "return helper(11)")


def _load(tmp_path, tag: str, source: str):
    """Import ``source`` as an on-disk lightsaber_spark submodule.
    The module NAME is the same for every variant (a rewrite keeps the
    module path — only the source changes); the file path is distinct
    per variant because linecache caches source by path, so rewriting
    one file in place would serve stale source."""
    path = tmp_path / f"probe_{tag}.py"
    path.write_text(source)
    name = "lightsaber_spark._staleness_probe"
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def test_identical_source_same_hash(tmp_path):
    a = _load(tmp_path, "id_a", _MODULE_V1)
    b = _load(tmp_path, "id_b", _MODULE_V1)
    assert impl_hash(a.query) == impl_hash(b.query)


def test_query_body_mutation_changes_hash(tmp_path):
    a = _load(tmp_path, "qb_a", _MODULE_V1)
    b = _load(tmp_path, "qb_b", _MODULE_V3_QUERY)
    assert impl_hash(a.query) != impl_hash(b.query)


def test_transitive_helper_mutation_changes_hash(tmp_path):
    """Rewriting an engine function a query calls — without touching
    the query wrapper — must stale the query (the exact failure mode
    the manual _FORCE_RECHECK list could silently miss)."""
    a = _load(tmp_path, "tr_a", _MODULE_V1)
    b = _load(tmp_path, "tr_b", _MODULE_V2_HELPER)
    assert a.query.__code__.co_code == b.query.__code__.co_code
    assert impl_hash(a.query) != impl_hash(b.query)


def test_function_local_import_is_chased():
    """The catalog's dominant pattern — ``from lightsaber_spark.x
    import y`` INSIDE the query function — must pull y's source into
    the hash closure (it binds a local name, invisible to
    ``__globals__``)."""
    from lightsaber_spark.staleness import _sources_for

    def q(spark, sf_dir):
        from lightsaber_spark.functions.dedup import minhash_levenshtein_pairs

        return minhash_levenshtein_pairs(None)

    quals = set(_sources_for(q))
    assert any("minhash_levenshtein_pairs" in s for s in quals), quals
    # and the chase is transitive: the pairs fn calls the candidate fn
    assert any("minhash_lsh_candidates" in s for s in quals), quals


def test_oracle_mutation_changes_hash(tmp_path):
    a = _load(tmp_path, "or_a", _MODULE_V1)
    h1 = impl_hash(a.query, "SELECT 1 AS x")
    h2 = impl_hash(a.query, "SELECT 2 AS x")
    assert h1 != h2
    assert h1 == impl_hash(a.query, "SELECT 1 AS x")


def test_is_vouched_semantics():
    cur = {"q": "abc"}
    assert is_vouched("q", cur, {"q": {"hash": "abc", "round": 3}})
    assert not is_vouched("q", cur, {"q": {"hash": "OLD", "round": 3}})
    assert not is_vouched("q", cur, {})  # never recorded → never vouched


def test_hash_mismatch_fronts_query_in_sweep_order():
    """End-to-end through __spark_entry__: tamper one green query's
    recorded hash and assert its tier drops to stale (fronted, before
    every vouched-green query)."""
    import __spark_entry__ as e
    from lightsaber_spark.staleness import current_hashes

    # synthetic all-vouched records built FROM the current hashes: the
    # on-disk QUERY_HASHES.json is legitimately fully stale right after
    # a universal-dependency change (e.g. the r14 load_tables cache
    # moved every hash), and this test is about the ORDERING mechanics,
    # not sweep freshness
    cur = current_hashes()
    rec = {n: {"hash": h, "round": 1} for n, h in cur.items()}
    # never-green queries (no CORRECTNESS row at all) front in their own
    # tier BEFORE stale — exclude them from the green/victim pools
    last = e._last_green_round()
    vouched = [n for n in rec if n not in e._CANONICAL and n in last]
    victim = sorted(vouched)[0]

    tampered = {k: dict(v) for k, v in rec.items()}
    tampered[victim]["hash"] = "0" * 64
    e._VOUCH_CACHE = (cur, tampered)
    try:
        order = list(e.queries())
        # stale tier ends where the first vouched-green query appears
        first_green = next(
            i for i, n in enumerate(order)
            if n not in e._CANONICAL and n in last
            and is_vouched(n, cur, tampered)
        )
        assert order.index(victim) < first_green
    finally:
        e._VOUCH_CACHE = None

    # untampered control: the victim sorts by its green round, i.e. at
    # or after the first vouched position
    e._VOUCH_CACHE = (cur, rec)
    try:
        order2 = list(e.queries())
        first_green2 = next(
            i for i, n in enumerate(order2)
            if n not in e._CANONICAL and n in last
            and is_vouched(n, cur, rec)
        )
        assert order2.index(victim) >= first_green2
    finally:
        e._VOUCH_CACHE = None


def test_recorded_file_well_formed():
    path = os.path.join(REPO, "QUERY_HASHES.json")
    with open(path) as f:
        rec = json.load(f)
    assert rec, "QUERY_HASHES.json must be seeded"
    for name, row in rec.items():
        assert isinstance(row["hash"], str) and len(row["hash"]) == 64, name
        assert isinstance(row["round"], int) and row["round"] >= 1, name


def test_catalog_hashes_deterministic():
    from lightsaber_spark.staleness import current_hashes

    a = current_hashes()
    b = current_hashes()
    assert a == b
    assert len(a) >= 145
