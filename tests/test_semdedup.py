"""Planted-structure tests for SemDeDup (operators/semdedup.py) and
cross-doc duplicate-span detection (operators/text_ext.dup_span_stats).
The oracle-parity sweep (test_oracle_parity.py over ALL_LIBRARY_SPECS)
value-checks both against DuckDB on testdata; these tests pin the
SEMANTICS on hand-built inputs where the right answer is computable by
eye."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from radares_spark.functions.vectors import l2norm
from radares_spark.operators.semdedup import semdedup_audit
from radares_spark.operators.text_ext import dup_span_stats


def _members(spark, rows):
    """rows: (vec_id, cell, vector list) -> members frame with norms."""
    df = spark.createDataFrame(
        [(i, c, [float(x) for x in v]) for i, c, v in rows],
        "vec_id long, cell string, v array<double>",
    )
    return df.select("vec_id", "cell", "v", l2norm("v", dim=4).alias("nrm"))


def _centroids(spark, rows):
    df = spark.createDataFrame(
        [(c, [float(x) for x in v]) for c, v in rows],
        "cell string, cv array<double>",
    )
    return df.select("cell", "cv", l2norm("cv", dim=4).alias("cn"))


def test_semdedup_drops_the_more_central_twin(spark):
    """Two near-identical vectors: the one MORE similar to the centroid
    drops; the diversity-preserving outlier is kept (paper keep rule)."""
    cen = _centroids(spark, [("a", [1, 0, 0, 0])])
    # v1 is the centroid direction exactly; v2 is v1 slightly rotated
    # (cos(v1,v2) ~ 0.995, both well above tau); v3 is orthogonal.
    members = _members(
        spark,
        [
            (1, "a", [1, 0, 0, 0]),
            (2, "a", [1, 0.1, 0, 0]),
            (3, "a", [0, 0, 1, 0]),
        ],
    )
    out = {
        r["vec_id"]: r["kept"]
        for r in semdedup_audit(members, cen, tau=0.9).collect()
    }
    assert out == {1: False, 2: True, 3: True}


def test_semdedup_never_compares_across_cells(spark):
    """Identical vectors in DIFFERENT cells both survive — blocking is
    the scale contract (cluster id == LSH band role)."""
    cen = _centroids(spark, [("a", [1, 0, 0, 0]), ("b", [1, 0, 0, 0])])
    members = _members(
        spark, [(1, "a", [1, 0, 0, 0]), (2, "b", [1, 0, 0, 0])]
    )
    out = {
        r["vec_id"]: r["kept"]
        for r in semdedup_audit(members, cen, tau=0.99).collect()
    }
    assert out == {1: True, 2: True}


def test_semdedup_tie_breaks_on_vec_id(spark):
    """Exactly identical vectors (same centroid_sim): the smaller
    vec_id is 'lower rank' and survives; the larger drops."""
    cen = _centroids(spark, [("a", [1, 1, 0, 0])])
    members = _members(
        spark, [(7, "a", [1, 0, 0, 0]), (9, "a", [1, 0, 0, 0])]
    )
    out = {
        r["vec_id"]: r["kept"]
        for r in semdedup_audit(members, cen, tau=0.99).collect()
    }
    assert out == {7: True, 9: False}


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


SPAN = "alpha bravo charlie delta echo foxtrot golf hotel"  # 8 words


def test_dup_spans_flags_shared_window(spark):
    docs = _docs(
        spark,
        [
            (1, f"intro words here {SPAN} and a unique one two three tail"),
            (2, f"totally different opening {SPAN} different closing words four"),
            (3, "no shared material in this document at all nine ten eleven"),
        ],
    )
    out = {r["doc_id"]: r for r in dup_span_stats(docs, w=8).collect()}
    assert out[1]["n_dup_windows"] == 1 and out[2]["n_dup_windows"] == 1
    assert out[3]["n_dup_windows"] == 0
    n_tokens_1 = len(f"intro words here {SPAN} and a unique one two three tail".split())
    assert out[1]["n_windows"] == n_tokens_1 - 7
    assert math.isclose(
        out[1]["dup_frac"], round(1 / out[1]["n_windows"], 6), rel_tol=0, abs_tol=1e-9
    )


def test_dup_spans_short_and_empty_docs_survive(spark):
    docs = _docs(spark, [(1, "only four words here"), (2, None), (3, "")])
    out = {r["doc_id"]: r for r in dup_span_stats(docs, w=8).collect()}
    assert set(out) == {1, 2, 3}
    for r in out.values():
        assert r["n_windows"] == 0 and r["n_dup_windows"] == 0 and r["dup_frac"] == 0.0


def test_semdedup_with_trained_kmeans_cells(spark):
    """End-to-end production path: IVF k-means trainer supplies the
    cells, semdedup audits within them — verified against a driver-side
    brute force replay of the keep rule on the collected vectors."""
    from radares_spark.operators.semdedup import semdedup_audit
    from radares_spark.operators.similarity import _normed, build_ivf_index
    from tests.conftest import SF_SMOKE

    normed = _normed(spark, SF_SMOKE)
    assignment, centroids = build_ivf_index(normed, n_cells=8, iters=2)
    members = normed.join(assignment, "vec_id").select("vec_id", "cell", "v", "nrm")
    tau = 0.3
    out = {
        r["vec_id"]: (r["cell"], r["centroid_sim"], r["kept"])
        for r in semdedup_audit(members, centroids, tau=tau).collect()
    }
    assert len(out) == normed.count()  # every vector audited exactly once

    # brute-force replay on the driver
    vecs = {r["vec_id"]: r["v"] for r in normed.collect()}
    cents = {r["cell"]: r["cv"] for r in centroids.collect()}

    def cos(a, b):
        num = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(y * y for y in b))
        return num / (na * nb)

    for vid, (cell, csim, kept) in out.items():
        assert round(cos(vecs[vid], cents[cell]), 4) == round(csim, 4)
        peers = [
            (o, oc, ocs)
            for o, (oc, ocs, _) in out.items()
            if oc == cell and o != vid
        ]
        should_drop = any(
            ((ocs, o) < (csim, vid)) and round(cos(vecs[vid], vecs[o]), 4) >= tau
            for o, _, ocs in peers
        )
        assert kept == (not should_drop), vid


def test_plan_shapes_are_pinned(spark):
    """The scale claims in the docstrings, held in the executed plans
    (same contract as tests/test_plans.py for registered queries)."""
    from radares_spark.plans.library import ALL_LIBRARY_SPECS
    from tests.conftest import SF_SMOKE

    sd = ALL_LIBRARY_SPECS["dedup_semantic"].fn(spark, SF_SMOKE)
    plan = sd._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan  # no corpus-wide join back
    assert "BatchEvalPython" not in plan  # Arrow-batched dots only
    # centroid rank + pair join are broadcast/equi on the cluster id
    assert "BroadcastHashJoin [cell" in plan

    ds = ALL_LIBRARY_SPECS["text_dup_spans"].fn(spark, SF_SMOKE)
    plan = ds._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # single-pass: (doc,h) rollup + window-on-h + doc regroup — exactly
    # three hash shuffles; the doc-spine join is broadcast
    assert plan.count("Exchange hashpartitioning") == 3, plan
    assert "BroadcastHashJoin [doc_id" in plan


def test_dup_spans_internal_repeat_is_not_cross_doc(spark):
    """A window repeated twice WITHIN one doc only is not shared
    boilerplate — the >= 2 distinct-docs rule must not fire."""
    docs = _docs(
        spark,
        [
            (1, f"{SPAN} filler middle words go here {SPAN}"),
            (2, "entirely unrelated second document with enough words to window"),
        ],
    )
    out = {r["doc_id"]: r for r in dup_span_stats(docs, w=8).collect()}
    assert out[1]["n_dup_windows"] == 0
    assert out[2]["n_dup_windows"] == 0
