"""Connected components (operators/components.py): correctness on
known graph shapes + the transitive dedup property on real LSH pairs."""

from __future__ import annotations

import pytest

# Whole-module slow tier (r15): multi-second Spark e2e tests dominate
# this module's wall; deselected by default so the driver's verify
# window fits — run with -m slow (see COVERAGE.md).
pytestmark = pytest.mark.slow

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


# ---- PageRank ----


def test_pagerank_matches_numpy_power_iteration(spark):
    """Distributed PageRank == an independent numpy replica of the
    same update rule (damping, weights, dangling redistribution) on a
    planted graph with a dangling node and weighted edges."""
    import numpy as np
    import pandas as pd

    from radares_spark.operators.components import pagerank

    # nodes: a,b,c,d ; d is dangling (no out-edges)
    edges = pd.DataFrame(
        {
            "src_host": ["a", "a", "b", "c"],
            "dst_host": ["b", "c", "c", "d"],
            "n_links": [2.0, 1.0, 1.0, 1.0],
        }
    )
    got = {
        r["node"]: r["rank"]
        for r in pagerank(spark.createDataFrame(edges), iters=25).collect()
    }

    idx = {x: i for i, x in enumerate("abcd")}
    M = np.zeros((4, 4))
    for s, t, w in edges.itertuples(index=False):
        M[idx[t], idx[s]] = w
    out = M.sum(axis=0)
    d = 0.85
    r = np.full(4, 0.25)
    for _ in range(25):
        dangling = r[out == 0].sum()
        inflow = np.zeros(4)
        for j in range(4):
            if out[j] > 0:
                inflow += M[:, j] / out[j] * r[j]
        r = (1 - d) / 4 + d * dangling / 4 + d * inflow
    for x, i in idx.items():
        assert abs(got[x] - r[i]) < 1e-6, (x, got[x], r[i])
    assert abs(sum(got.values()) - 1.0) < 1e-6


def test_pagerank_on_extracted_host_graph(spark):
    """End-to-end: links extracted from planted pages -> canonical
    host graph -> pagerank; the host every page links to outranks the
    ones that only link out."""
    import pandas as pd

    from radares_spark.operators.components import pagerank
    from radares_spark.operators.urls import outlink_host_graph

    pages = pd.DataFrame(
        {
            "doc_id": range(4),
            "url": [f"https://site{i}.com/p" for i in range(4)],
            "html": [
                '<a href="https://HUB.com/x">h</a> <a href="https://www.hub.com/y/">h2</a>'
            ]
            * 3
            + ['<a href="https://site0.com/p?utm_source=z">back</a>'],
        }
    )
    g = {
        (r["src_host"], r["dst_host"]): r["n_links"]
        for r in outlink_host_graph(spark.createDataFrame(pages)).collect()
    }
    # both link forms canonicalize onto hub.com
    assert g[("site0.com", "hub.com")] == 2
    assert g[("site3.com", "site0.com")] == 1
    ranks = {
        r["node"]: r["rank"]
        for r in pagerank(
            outlink_host_graph(spark.createDataFrame(pages)), iters=20
        ).collect()
    }
    assert ranks["hub.com"] == max(ranks.values())


def test_pagerank_empty_graph_and_zero_weight_dangling(spark):
    """Review findings: an empty edge table yields an empty result
    (not ZeroDivisionError at plan build), and a node whose out-edges
    all weigh 0 is treated as DANGLING so ranks still sum to 1."""
    import pandas as pd
    from radares_spark.operators.components import pagerank

    empty = spark.createDataFrame([], "src_host string, dst_host string, n_links double")
    assert pagerank(empty, iters=2).count() == 0

    edges = pd.DataFrame(
        {
            "src_host": ["a", "b"],
            "dst_host": ["b", "a"],
            "n_links": [1.0, 0.0],  # b's only out-edge carries no mass
        }
    )
    ranks = {
        r["node"]: r["rank"]
        for r in pagerank(spark.createDataFrame(edges), iters=10).collect()
    }
    assert abs(sum(ranks.values()) - 1.0) < 1e-9


def test_cluster_representatives_keeps_best_not_min(spark):
    """Chain 1~2~3 is one transitive group; doc 3 is the longest so it
    is the representative — min-id canonicalization would keep doc 1,
    losing the long original. Separate pair (10, 11) ties on score and
    falls back to min id."""
    from radares_spark.operators.components import (
        cluster_representatives,
        connected_components,
    )

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "doc_a long, doc_b long"
    )
    scores = spark.createDataFrame(
        [(1, 5), (2, 8), (3, 50), (10, 7), (11, 7)],
        "doc_id long, score int",
    )
    cc = connected_components(pairs)
    out = {
        r["doc_id"]: (r["component"], r["rep_doc_id"], r["keep"])
        for r in cluster_representatives(cc, scores).collect()
    }
    assert out[3] == (1, 3, 1) and out[1] == (1, 3, 0) and out[2] == (1, 3, 0)
    # tie -> min id wins
    assert out[10] == (10, 10, 1) and out[11] == (10, 10, 0)
