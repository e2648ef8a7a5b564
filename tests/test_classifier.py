"""Trainable quality classifier (operators/classifier.py): the
distributed GD must match an independent numpy replica of the same
update rule on the same features (~1e-6 — float sum order differs),
separate planted classes, and keep every doc in the scoring spine."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from radares_spark.operators.classifier import (
    doc_features,
    score_quality,
    train_quality_classifier,
)

ITERS, LR, L2 = 50, 5.0, 1e-4


@pytest.fixture(scope="module")
def planted(spark):
    """Two separable classes: natural English vs digit-gibberish."""
    good = [
        "the quick brown fox jumps over the lazy dog in the morning sun",
        "a gentle rain fell over the quiet town as people walked home",
        "she read the book by the fire while the kettle slowly boiled",
        "the children played in the park until the light began to fade",
        "he wrote a long letter to his friend about the summer garden",
        "the train arrived on time and the platform filled with voices",
    ]
    bad = [
        "x9 q7 zz4 plok 00 qq2 v8n 3j 9k2m zzt 4r 77q",
        "9dk 3mz qp0 11x vv7 8s2 k4 j9 q0q 5t 66y plf",
        "zq 88 mn3 0x0 7pl 2v9 kk1 t5 r8 3zz q6 9mw",
        "4f 7g2 x0x p9 qq8 2k 5vv m1m 6z 3t9 8r wj0",
        "1a2 b3c 4d5 e6f 7g8 h9i 0j1 k2l 3m4 n5o 6p7 q8r",
        "pp0 9xz 5kq 2mv 7jt 4rn 8wl 1fy 6gs 3hd 0bc zz9",
    ]
    rows = [(i, t, 1) for i, t in enumerate(good)] + [
        (100 + i, t, 0) for i, t in enumerate(bad)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, y int")


def _numpy_replica(feat_rows, label_map, n_docs, iters, lr, l2):
    """The identical update rule, single-node: full-batch GD on
    (doc, bucket, tf) rows with dict weights."""
    w: dict[int, float] = {}
    bias = 0.0
    docs = sorted(label_map)
    for _ in range(iters):
        margins = {d: 0.0 for d in docs}
        for d, b, tf in feat_rows:
            margins[d] += tf * w.get(b, 0.0)
        errs = {
            d: 1.0 / (1.0 + np.exp(-(margins[d] + bias))) - label_map[d]
            for d in docs
        }
        grads: dict[int, float] = {}
        for d, b, tf in feat_rows:
            grads[b] = grads.get(b, 0.0) + tf * errs[d]
        for b, g in grads.items():
            w[b] = w.get(b, 0.0) - lr * (g / n_docs + l2 * w.get(b, 0.0))
        bias -= lr * sum(errs.values()) / n_docs
    return w, bias


@pytest.fixture(scope="module")
def trained(spark, planted):
    return train_quality_classifier(
        planted, F.col("y") == 1, iters=ITERS, lr=LR, l2=L2
    )


@pytest.mark.slow  # >=10 s in the r15 full-suite durations log
def test_distributed_gd_matches_numpy_replica(spark, planted, trained):
    weights, bias = trained
    feat_rows = [
        (r["doc_id"], r["b"], r["tf"]) for r in doc_features(planted).collect()
    ]
    label_map = {r["doc_id"]: r["y"] for r in planted.collect()}
    w_ref, bias_ref = _numpy_replica(
        feat_rows, label_map, len(label_map), ITERS, LR, L2
    )
    assert set(weights) == set(w_ref)
    for b in w_ref:
        assert weights[b] == pytest.approx(w_ref[b], rel=1e-6, abs=1e-9), b
    assert bias == pytest.approx(bias_ref, rel=1e-6, abs=1e-9)


def test_classifier_separates_planted_classes(spark, planted, trained):
    weights, bias = trained
    probs = {
        r["doc_id"]: r["quality_prob"]
        for r in score_quality(planted, weights, bias).collect()
    }
    good = [p for d, p in probs.items() if d < 100]
    bad = [p for d, p in probs.items() if d >= 100]
    assert min(good) > max(bad)  # perfect separation on the train set
    assert min(good) > 0.6 and max(bad) < 0.4


def test_scoring_spine_keeps_gramless_docs(spark, planted):
    weights, bias = train_quality_classifier(
        planted, F.col("y") == 1, iters=3, lr=LR, l2=L2
    )
    docs = spark.createDataFrame(
        [(1, "the quick brown fox and the dog"), (2, None), (3, "")],
        "doc_id long, text string",
    )
    probs = {
        r["doc_id"]: r["quality_prob"]
        for r in score_quality(docs, weights, bias).collect()
    }
    assert set(probs) == {1, 2, 3}  # every doc scored exactly once
    sigmoid_bias = 1.0 / (1.0 + np.exp(-bias))
    assert probs[2] == pytest.approx(sigmoid_bias, abs=1e-12)
    assert probs[3] == pytest.approx(sigmoid_bias, abs=1e-12)


def test_serving_plan_is_broadcast_only(spark, planted):
    weights, bias = train_quality_classifier(
        planted, F.col("y") == 1, iters=2, lr=LR, l2=L2
    )
    df = score_quality(planted, weights, bias)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan  # the kilobyte weight table
