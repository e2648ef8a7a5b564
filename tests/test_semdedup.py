"""Planted-structure tests for SemDeDup (operators/semdedup.py) and
cross-doc duplicate-span detection (operators/text_ext.dup_span_stats).
The oracle-parity sweep (test_oracle_parity.py over ALL_LIBRARY_SPECS)
value-checks both against DuckDB on testdata; these tests pin the
SEMANTICS on hand-built inputs where the right answer is computable by
eye."""

from __future__ import annotations

import pytest

# Whole-module slow tier (r15): multi-second Spark e2e tests dominate
# this module's wall; deselected by default so the driver's verify
# window fits — run with -m slow (see COVERAGE.md).
pytestmark = pytest.mark.slow

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


def test_dup_spans_capped_excludes_universal_span(spark):
    """r5 hot-hash hardening (dup_span_stats_capped): a planted
    universal boilerplate span shared by 20 docs with max_docs_per_span=5
    must (a) land in the hot report with its distinct-doc count,
    (b) never reach the count window (broadcast anti-join feeds it), and
    (c) leave the final stats EXACTLY equal to the uncapped operator —
    the cap re-routes work, it does not approximate."""
    from radares_spark.operators.text_ext import dup_span_stats_capped

    universal = "all rights reserved by the original content owner llc two"  # 10 words
    rows = [
        (i, f"u{i} v{i} w{i} x{i} {universal} y{i} z{i}") for i in range(20)
    ]
    cold_span = "shared cold span of exactly eight contiguous words"  # 8 words
    rows += [
        (100, f"begin one {cold_span} here end alpha"),
        (101, f"other opening {cold_span} there closing beta"),
        (200, "completely unique document with no shared material at all"),
    ]
    docs = _docs(spark, rows)

    stats, hot = dup_span_stats_capped(docs, w=8, max_docs_per_span=5)
    hot_rows = hot.collect()
    # the 10-word universal phrase yields exactly 3 rolling 8-word
    # windows fully inside it, each shared by all 20 docs
    assert len(hot_rows) == 3
    assert all(r["n_docs"] == 20 for r in hot_rows)

    got = sorted(tuple(r) for r in stats.collect())
    expect = sorted(tuple(r) for r in dup_span_stats(docs, w=8).collect())
    assert got == expect

    by_id = {r[0]: r for r in got}
    # hot docs: 16 tokens -> 9 windows, 3 of them the hot universal ones
    assert by_id[0][1] == 9 and by_id[0][2] == 3
    # the 2-doc cold span stays below the cap and flows through the
    # window path: exactly one shared window each
    assert by_id[100][2] == 1 and by_id[101][2] == 1
    assert by_id[200][2] == 0

    # plan: the Window consumes the hot-marked broadcast LEFT join, and
    # the (doc, hash) stream appears ONCE per branch — two gram
    # pipelines total (sizes + marked), never three (review finding)
    plan = stats._jdf.queryExecution().executedPlan().toString()
    assert "Window" in plan
    assert "BroadcastHashJoin" in plan and "LeftOuter" in plan
    # AQE's toString appends the pre-execution plan — count the final only
    final = plan.split("== Initial Plan ==")[0]
    assert final.count("Generate explode") <= 2, final


@pytest.mark.slow  # >=10 s in the r15 full-suite durations log
def test_semdedup_at_paper_tau_drops_exactly_the_planted_twins(spark):
    """r5 (VERDICT ask #5): the registered tau=0.35 exists only because
    the testdata embeddings are near-orthogonal. This runs the audit at
    the PAPER'S operating point (tau=0.95) on real 64-dim testdata
    embeddings with planted near-identical twins: exactly one member of
    each planted pair drops, nothing else does, and the whole audit
    matches a driver-side brute-force replay of the keep rule."""
    from radares_spark.operators.semdedup import semdedup_audit
    from radares_spark.operators.similarity import _normed, build_ivf_index
    from radares_spark.functions.vectors import l2norm
    from tests.conftest import SF_SMOKE

    base = _normed(spark, SF_SMOKE).filter(F.col("vec_id") < 100)
    # twins: copies of vecs 0..9 with a tiny deterministic perturbation
    # (+1% of the first coordinate) -> pair cosine > 0.999, far above tau
    twins = (
        base.filter(F.col("vec_id") < 10)
        .select(
            (F.col("vec_id") + 1_000).alias("vec_id"),
            F.transform(
                "v", lambda x, i: F.when(i == 0, x * 1.01).otherwise(x)
            ).alias("v"),
        )
        .select("vec_id", "v", l2norm("v").alias("nrm"))
    )
    normed = base.select("vec_id", "v", "nrm").unionByName(twins)

    assignment, centroids = build_ivf_index(normed, n_cells=4, iters=2)
    members = normed.join(assignment, "vec_id").select("vec_id", "cell", "v", "nrm")
    tau = 0.95
    out = {
        r["vec_id"]: (r["cell"], r["centroid_sim"], r["kept"])
        for r in semdedup_audit(members, centroids, tau=tau).collect()
    }
    assert len(out) == 110

    dropped = {vid for vid, (_, _, kept) in out.items() if not kept}
    # exactly one member of each planted twin pair drops — no more, no
    # less: at tau 0.95 the original near-orthogonal corpus is untouched
    assert len(dropped) == 10
    for i in range(10):
        assert (i in dropped) != (i + 1_000 in dropped), i
    assert all(v in dropped or v - 1_000 in dropped for v in dropped)

    # full brute-force replay (same contract as the kmeans test above)
    vecs = {r["vec_id"]: r["v"] for r in normed.collect()}
    cents = {r["cell"]: r["cv"] for r in centroids.collect()}

    def cos(a, b):
        num = sum(x * y for x, y in zip(a, b))
        return num / math.sqrt(sum(x * x for x in a) * sum(y * y for y in b))

    for vid, (cell, csim, kept) in out.items():
        assert round(cos(vecs[vid], cents[cell]), 4) == round(csim, 4)
        should_drop = any(
            ((ocs, o) < (csim, vid))
            and round(cos(vecs[vid], vecs[o]), 4) >= tau
            for o, (oc, ocs, _) in out.items()
            if oc == cell and o != vid
        )
        assert kept == (not should_drop), vid
