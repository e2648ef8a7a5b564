"""Connected components (operators/components.py): correctness on
known graph shapes + the transitive dedup property on real LSH pairs."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from radares_spark.operators.components import (
    canonical_near_dup_drops,
    connected_components,
)


def _cc(spark, edges):
    df = spark.createDataFrame(edges, "doc_a long, doc_b long")
    return {
        r["node"]: r["component"] for r in connected_components(df).collect()
    }


def test_chain_collapses_to_min(spark):
    # 1-2-3-4-5 chain: everything labels 1, needs > 1 propagation round
    got = _cc(spark, [(1, 2), (2, 3), (3, 4), (4, 5)])
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1}


def test_disjoint_groups_stay_disjoint(spark):
    got = _cc(spark, [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22)])
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 20: 20, 21: 20, 22: 20}


def test_star_and_cycle(spark):
    # star around 7 + a cycle 30-31-32-30 bridged to the star via (7, 30)
    got = _cc(spark, [(7, 8), (7, 9), (7, 10), (30, 31), (31, 32), (30, 32), (7, 30)])
    assert set(got.values()) == {7}


def test_string_node_ids(spark):
    # md5-keyed pair tables key docs by strings; min-label propagation
    # and the changed-label fixed point must both work on them (r2
    # ADVICE: a sum(label) convergence check crashes here)
    df = spark.createDataFrame(
        [("aa", "bb"), ("bb", "cc"), ("zz", "yy")], "doc_a string, doc_b string"
    )
    got = {r["node"]: r["component"] for r in connected_components(df).collect()}
    assert got == {"aa": "aa", "bb": "aa", "cc": "aa", "zz": "yy", "yy": "yy"}


def test_canonical_drops_keep_one_per_group(spark):
    pairs = spark.createDataFrame(
        [(1, 5), (3, 5), (10, 11)], "doc_a long, doc_b long"
    )
    # transitive group {1, 3, 5} (1 and 3 connected only via 5) + {10, 11}
    dropped = {r["doc_id"] for r in canonical_near_dup_drops(pairs).collect()}
    assert dropped == {3, 5, 11}  # keeps 1 and 10


def test_on_real_lsh_pairs(spark):
    """Canonicalizing the testdata LSH pairs: every pair ends up with
    at least one member dropped, minima survive."""
    from radares_spark.operators.dedup import dedup_minhash_pairs
    from tests.conftest import SF_ORACLE

    pairs = dedup_minhash_pairs(spark, SF_ORACLE).select("doc_a", "doc_b").cache()
    dropped = {r["doc_id"] for r in canonical_near_dup_drops(pairs).collect()}
    # every pair loses at least one member...
    for r in pairs.collect():
        assert r["doc_a"] in dropped or r["doc_b"] in dropped
    # ...but each group's minimum always survives
    cc = connected_components(pairs)
    minima = {r["component"] for r in cc.collect()}
    assert minima.isdisjoint(dropped)
