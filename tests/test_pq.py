"""Product quantization (operators/pq.py): codebook/code invariants,
self-retrieval, above-chance recall on the (near-orthogonal) testdata
embeddings, planted-near-dup retrieval, and determinism. Iterative
k-means is not SQL-expressible, so like the IVF trainer the quality
gate is recall, not a DuckDB oracle."""

from __future__ import annotations

import pandas as pd
import pytest

# Whole-module slow tier (r15): multi-second Spark e2e tests dominate
# this module's wall; deselected by default so the driver's verify
# window fits — run with -m slow (see COVERAGE.md).
pytestmark = pytest.mark.slow
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from radares_spark.functions.vectors import pair_dot
from radares_spark.io.tables import load_table
from radares_spark.operators.pq import PQ_K, PQ_M, SUB_DIM, encode_pq, pq_topk, train_pq
from tests.conftest import SF_ORACLE


@pytest.fixture(scope="module")
def pq(spark):
    emb = load_table(spark, SF_ORACLE, "embeddings").select("vec_id", "embedding")
    cb = train_pq(emb, iters=3)
    codes = encode_pq(emb, cb)
    return emb, cb, codes


def test_codebook_and_code_invariants(pq):
    emb, cb, codes = pq
    rows = cb.collect()
    assert len(rows) == PQ_M * PQ_K  # empty cells must not vanish
    assert all(len(r["cv"]) == SUB_DIM for r in rows)
    c = codes.select(
        F.size("codes").alias("m"),
        F.array_min("codes").alias("lo"),
        F.array_max("codes").alias("hi"),
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.min("m").alias("m_lo"),
        F.max("m").alias("m_hi"),
        F.min("lo").alias("lo"),
        F.max("hi").alias("hi"),
    ).collect()[0]
    assert c["n"] == emb.count()
    assert c["m_lo"] == c["m_hi"] == PQ_M
    assert 0 <= c["lo"] and c["hi"] < PQ_K


def test_adc_self_retrieval_and_above_chance_recall(spark, pq):
    emb, cb, codes = pq
    queries = emb.filter(F.col("vec_id") < 8)
    top = pq_topk(codes, cb, queries, k=5).collect()
    by_q = {}
    for r in top:
        by_q.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    # a stored vector queried against the store must find itself
    assert all(q in ns for q, ns in by_q.items())

    v = emb.select("vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v"))
    q = v.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    rw = W.partitionBy("query_id").orderBy(F.desc("d"), F.asc("neighbor_id"))
    exact = (
        v.crossJoin(F.broadcast(q))
        .select("query_id", F.col("vec_id").alias("neighbor_id"), pair_dot("v", "qv").alias("d"))
        .withColumn("rn", F.row_number().over(rw))
        .filter("rn <= 5")
        .collect()
    )
    et = {(r["query_id"], r["neighbor_id"]) for r in exact}
    pt = {(r["query_id"], r["neighbor_id"]) for r in top}
    recall = len(et & pt) / len(et)
    # near-orthogonal random vectors are PQ's worst case; chance is
    # 5/500 = 1%. Measured 25% with (M=4, K=16); floor set well below.
    assert recall >= 0.15, recall


def test_planted_near_dup_is_retrieved(spark, pq):
    """A query that is a stored vector with small per-dim noise must
    retrieve its source — the clustered-data case PQ exists for."""
    emb, cb, codes = pq
    noisy = emb.filter(F.col("vec_id").isin(3, 7, 11)).select(
        (F.col("vec_id") + 10_000).alias("vec_id"),
        F.transform(
            F.col("embedding"),
            lambda x: x.cast("double") * 1.02 + 0.001,
        ).alias("embedding"),
    )
    top = pq_topk(codes, cb, noisy, k=3).collect()
    by_q = {}
    for r in top:
        by_q.setdefault(r["query_id"] - 10_000, set()).add(r["neighbor_id"])
    assert all(src in ns for src, ns in by_q.items())


def test_training_and_encoding_deterministic(spark, pq):
    emb, cb, codes = pq
    cb2 = train_pq(emb.repartition(7, "vec_id"), iters=3)
    # centroid means are float aggregates: partial-agg order may differ
    # across partitionings, so compare to 1e-9, not bit-for-bit
    a = sorted((r["sub"], r["code"], tuple(r["cv"])) for r in cb.collect())
    b = sorted((r["sub"], r["code"], tuple(r["cv"])) for r in cb2.collect())
    assert [(s, c) for s, c, _ in a] == [(s, c) for s, c, _ in b]
    for (_, _, va), (_, _, vb) in zip(a, b):
        assert all(abs(x - y) < 1e-9 for x, y in zip(va, vb))
    codes2 = encode_pq(emb.repartition(5), cb2)
    ca = sorted((r["vec_id"], tuple(r["codes"])) for r in codes.collect())
    cb_ = sorted((r["vec_id"], tuple(r["codes"])) for r in codes2.collect())
    assert ca == cb_


@pytest.mark.slow  # >=10 s in the r15 full-suite durations log
def test_ivfpq_store_probe_prunes_partitions_and_retrieves_self(spark, pq, tmp_path):
    from radares_spark.operators.pq import probe_ivfpq_topk, write_ivfpq_layout
    from radares_spark.operators.similarity import _normed, build_ivf_index

    emb, cb, codes = pq
    normed = _normed(spark, SF_ORACLE)
    assignment, centroids = build_ivf_index(normed)
    path = str(tmp_path / "ivfpq")
    write_ivfpq_layout(
        normed.select("vec_id", F.col("v").alias("embedding")), assignment, cb, path
    )
    queries = normed.filter(F.col("vec_id") < 8)
    top = probe_ivfpq_topk(spark, path, centroids, cb, queries)
    rows = top.collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    # a stored vector routes to its own cell and finds itself there
    assert all(q in ns for q, ns in by_q.items())
    # the probe's cell keys must reach the scan as dynamic PARTITION
    # pruning — unprobed cells' files are never read
    plan = (
        probe_ivfpq_topk(spark, path, centroids, cb, queries)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "dynamicpruning" in plan.lower(), plan


def test_train_pq_guards(spark, pq):
    """r5 ADVICE: an undersized corpus underfills the codebook and the
    ADC index reads past the folded table (silent NULL-score drops);
    m not dividing DIM silently discards trailing dimensions. Both
    must fail fast instead."""
    emb, _, _ = pq
    with pytest.raises(ValueError, match="distinct vectors"):
        train_pq(emb.filter(F.col("vec_id") < PQ_K - 1))
    with pytest.raises(ValueError, match="must divide DIM"):
        train_pq(emb, m=7)
    from radares_spark.operators.pq import _sub_rows

    with pytest.raises(ValueError, match="must divide DIM"):
        _sub_rows(emb, m=7)


SF_BIG = "/root/testdata/sf0.1"


@pytest.fixture(scope="module")
def pq_big(spark):
    emb = load_table(spark, SF_BIG, "embeddings").select("vec_id", "embedding")
    cb = train_pq(emb, iters=3)
    codes = encode_pq(emb, cb).cache()
    codes.count()
    return emb, cb, codes


@pytest.mark.slow  # >=10 s in the r15 full-suite durations log
def test_pq_recall_pinned_at_sf01(spark, pq_big, tmp_path):
    """r5 verdict #6: pin PQ and IVF-PQ recall at sf0.1 (5000 vectors)
    the way test_ivf.py pins the float index. Near-uniform random
    vectors are PQ's structurally worst case (fixed 4x16 code
    resolution, 10x the distractors of the oracle SF) — measured
    recall@5 is 0.05 vs 0.001 chance (50x); floors set below measured.
    Two stronger invariants ride along: IVF-PQ at FULL probe is
    bit-identical to un-pruned pq_topk (pruning composes without
    changing ADC scores), and planted near-dups are retrieved through
    the pruned store (the clustered-data case PQ exists for)."""
    from radares_spark.operators.pq import probe_ivfpq_topk, write_ivfpq_layout
    from radares_spark.operators.similarity import _normed, build_ivf_index, cosine_topk

    emb, cb, codes = pq_big
    queries = emb.filter(F.col("vec_id") < 8)
    top = pq_topk(codes, cb, queries, k=5).collect()
    normed = _normed(spark, SF_BIG)
    q = normed.filter(F.col("vec_id") < 8)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in cosine_topk(normed, q, k=5).collect()
    }
    pt = {(r["query_id"], r["neighbor_id"]) for r in top}
    recall = len(exact & pt) / len(exact)
    assert recall >= 0.025, f"pq_topk recall {recall} at sf0.1 (chance 0.001)"

    assignment, centroids = build_ivf_index(normed, n_cells=8, iters=3)
    path = str(tmp_path / "ivfpq_big")
    write_ivfpq_layout(
        normed.select("vec_id", F.col("v").alias("embedding")), assignment, cb, path
    )
    pruned = {
        (r["query_id"], r["neighbor_id"])
        for r in probe_ivfpq_topk(
            spark, path, centroids, cb, q, n_probe=2, k=5
        ).collect()
    }
    assert len(exact & pruned) / len(exact) >= 0.02, "ivfpq n_probe=2 recall"
    full = {
        (r["query_id"], r["neighbor_id"])
        for r in probe_ivfpq_topk(
            spark, path, centroids, cb, q, n_probe=8, k=5
        ).collect()
    }
    assert full == pt, "full-probe IVF-PQ must equal un-pruned ADC"

    # planted near-dups: a stored vector with small per-dim noise must
    # retrieve its source THROUGH the pruned store at corpus scale
    noisy = emb.filter(F.col("vec_id").isin(3, 7, 11)).select(
        (F.col("vec_id") + 10_000).alias("vec_id"),
        F.transform(
            F.col("embedding"), lambda x: x.cast("double") * 1.02 + 0.001
        ).alias("v"),
    )
    noisy = noisy.withColumn(
        "nrm", F.sqrt(F.aggregate("v", F.lit(0.0), lambda a, x: a + x * x))
    )
    rows = probe_ivfpq_topk(spark, path, centroids, cb, noisy, n_probe=2, k=3).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"] - 10_000, set()).add(r["neighbor_id"])
    assert all(src in ns for src, ns in by_q.items()), by_q


@pytest.mark.slow  # >=10 s in the r15 full-suite durations log
def test_residual_ivfpq_halves_adc_error_on_clustered_data(spark, tmp_path):
    """Jégou 2011 §5.1: quantizing RESIDUALS (v - centroid[cell])
    instead of raw vectors spends the same MxK codebook on a
    lower-variance distribution. On a planted 8-cluster corpus the
    residual store's mean |ADC - true dot| must come in well under the
    plain store's (measured 4.8 vs 10.4 — a 2.2x error reduction at
    identical storage), recall must not regress, and a stored vector
    must retrieve itself through the pruned residual store. (On the
    near-uniform testdata embeddings the two stores tie — no cluster
    structure for the coarse quantizer to remove; that is expected
    and why THIS test plants clusters.)"""
    import numpy as np

    from radares_spark.functions.vectors import pair_dot
    from radares_spark.operators.pq import (
        encode_residuals,
        probe_ivfpq_topk,
        train_ivfpq_residual,
        write_ivfpq_layout,
    )
    from radares_spark.operators.similarity import build_ivf_index

    rng = np.random.default_rng(7)
    centers = rng.normal(size=(8, 64)) * 3.0
    vecs = [centers[i % 8] + rng.normal(size=64) * 0.3 for i in range(512)]
    emb = spark.createDataFrame(
        pd.DataFrame(
            {"vec_id": range(512), "embedding": [list(map(float, v)) for v in vecs]}
        )
    )
    v = emb.select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
    )
    normed = v.withColumn(
        "nrm", F.sqrt(F.aggregate("v", F.lit(0.0), lambda a, x: a + x * x))
    ).withColumn("label", F.lit("x"))
    emb_n = v.select("vec_id", F.col("v").alias("embedding"))
    assignment, centroids = build_ivf_index(normed, n_cells=8, iters=3)
    q = normed.filter(F.col("vec_id") < 8)
    qq = q.select(F.col("vec_id").alias("query_id"), F.col("v").alias("qv"))
    truth = v.crossJoin(F.broadcast(qq)).select(
        "query_id", F.col("vec_id").alias("neighbor_id"), pair_dot("v", "qv").alias("d")
    )
    rw = W.partitionBy("query_id").orderBy(F.desc("d"), F.asc("neighbor_id"))
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in truth.withColumn("rn", F.row_number().over(rw))
        .filter("rn <= 5")
        .collect()
    }

    def build_and_measure(residual: bool, path: str):
        if residual:
            cb = train_ivfpq_residual(emb_n, assignment, centroids, iters=3)
            store_in = encode_residuals(emb_n, assignment, centroids)
        else:
            cb = train_pq(emb_n, iters=3)
            store_in = emb_n
        write_ivfpq_layout(store_in, assignment, cb, path)
        full = probe_ivfpq_topk(
            spark, path, centroids, cb, q, n_probe=8, k=512, residual_store=residual
        )
        err = (
            full.join(truth, ["query_id", "neighbor_id"])
            .agg(F.avg(F.abs(F.col("adc_score") - F.col("d"))).alias("e"))
            .collect()[0]["e"]
        )
        got = {
            (r["query_id"], r["neighbor_id"])
            for r in probe_ivfpq_topk(
                spark, path, centroids, cb, q, n_probe=2, k=5, residual_store=residual
            ).collect()
        }
        return err, len(exact & got) / len(exact), got

    err_p, rec_p, _ = build_and_measure(False, str(tmp_path / "plain"))
    err_r, rec_r, got_r = build_and_measure(True, str(tmp_path / "resid"))
    assert err_r < 0.75 * err_p, (err_r, err_p)
    assert rec_r >= rec_p, (rec_r, rec_p)
    # cluster fidelity: every retrieved neighbor comes from the
    # query's own planted cluster (vec_id % 8). Strict self-retrieval
    # is NOT asserted here — inside a dense cluster dozens of members
    # quantize to identical codes and tie-break can outrank the query
    # itself; same-cluster membership is the property residual
    # quantization must preserve.
    assert got_r and all(qid % 8 == nid % 8 for qid, nid in got_r), got_r
