"""Feature-hashing text embeddings (operators/embed.py): near-dup
separation, unit norms, spine rules, IDF downweighting, and the
end-to-end bridge into the similarity stack (cosine_topk over vectors
derived from TEXT, no external model)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from radares_spark.operators.embed import EMBED_DIM, hashed_tf


@pytest.fixture(scope="module")
def frame(spark):
    base = "the quick brown fox jumps over the lazy dog near the river bank today"
    return spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [0, 1, 2, 3, 4],
                "text": [
                    base,
                    base + " again",  # near-dup of 0
                    "completely different subject matter about stellar fusion physics",
                    None,  # no tokens -> dropped
                    "",  # no tokens -> dropped
                ],
            }
        )
    )


def _vecs(df):
    return {r["doc_id"]: np.array(r["embedding"]) for r in df.collect()}


def test_norms_spine_and_neardup_separation(spark, frame):
    vecs = _vecs(hashed_tf(frame))
    assert set(vecs) == {0, 1, 2}  # token-less docs dropped, by contract
    for v in vecs.values():
        assert len(v) == EMBED_DIM
        assert abs(np.linalg.norm(v) - 1.0) < 1e-9
    sim_near = float(vecs[0] @ vecs[1])
    sim_far_a = float(vecs[0] @ vecs[2])
    assert sim_near > 0.9, sim_near
    assert sim_near > sim_far_a + 0.3, (sim_near, sim_far_a)


def test_tf_idf_downweights_ubiquitous_tokens(spark):
    """A token present in EVERY doc gets IDF ln(N+1 / N+1) = 0 — it
    must vanish from the tf-idf vectors entirely, so two docs whose
    only overlap is the ubiquitous token become orthogonal."""
    docs = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [0, 1, 2],
                "text": [
                    "common alpha beta",
                    "common gamma delta",
                    "common epsilon zeta",
                ],
            }
        )
    )
    plain = _vecs(hashed_tf(docs))
    weighted = _vecs(hashed_tf(docs, tf_idf=True))
    # with plain TF the shared token gives positive similarity
    assert float(plain[0] @ plain[1]) != 0.0
    # with IDF=0 on 'common', remaining vocab is disjoint AND (checked
    # by construction at dim=16) hashes to non-overlapping buckets up
    # to sign cancellation: similarity collapses toward 0
    assert abs(float(weighted[0] @ weighted[1])) < abs(float(plain[0] @ plain[1]))


def test_bridges_into_similarity_stack(spark, frame):
    """The point of the operator: ANN over vectors derived from text.
    cosine_topk consumes (vec_id, label, v, nrm); the near-dup doc
    must be every query's nearest non-self neighbor."""
    from radares_spark.operators.similarity import cosine_topk

    emb = hashed_tf(frame)
    normed = emb.select(
        F.col("doc_id").alias("vec_id"),
        F.lit("doc").alias("label"),
        F.col("embedding").alias("v"),
    ).withColumn("nrm", F.sqrt(F.aggregate("v", F.lit(0.0), lambda a, x: a + x * x)))
    q = normed.filter(F.col("vec_id") == 0)
    rows = cosine_topk(normed, q, k=2).orderBy("rank").collect()
    assert [r["neighbor_id"] for r in rows] == [1, 2]  # near-dup first
    assert rows[0]["cos_sim"] > rows[1]["cos_sim"] + 0.3


def test_zero_norm_vectors_are_dropped_not_emitted(spark):
    """Review finding: a doc whose every token is corpus-ubiquitous
    gets IDF 0 on all of them -> zero raw vector; the old nrm==0
    branch EMITTED it (poisoning downstream cosines with divide-by-
    zero NULLs). It must be dropped, same as token-less docs."""
    docs = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [0, 1, 2],
                "text": ["common", "common alpha beta", "common gamma delta"],
            }
        )
    )
    out = hashed_tf(docs, tf_idf=True)
    ids = {r["doc_id"] for r in out.collect()}
    assert ids == {1, 2}  # doc 0's only token has IDF 0 -> dropped
    for r in out.collect():
        assert abs(np.linalg.norm(np.array(r["embedding"])) - 1.0) < 1e-9
