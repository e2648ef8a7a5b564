"""Measured recall of the hyperplane-LSH near-dup detector at its
registered threshold (VERDICT r2 ask #3).

The testdata embeddings are near-uniform random (max pair cosine
~0.51), so true near-duplicates are PLANTED: for 50 corpus vectors a
copy is constructed at exactly cos = 0.99 (unit-sphere rotation toward
a seeded orthogonal direction). The detector must recover >= 95% of
the planted pairs — matching the stated recall(0.99) ~ 0.991 of the
4-band x 8-bit banding (see operators/dedup.NEARDUP_COS) — while
returning no false positives below the threshold (exact in-bucket
cosine check).
"""

from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql import functions as F

from radares_spark.io.tables import load_table
from radares_spark.operators.dedup import (
    NEARDUP_COS,
    TESTDATA_NEARDUP_COS,
    embedding_lsh_pairs,
)
from tests.conftest import SF_ORACLE

N_PLANT = 50
PLANT_COS = 0.99
PLANT_BASE = 100_000


@pytest.fixture(scope="module")
def planted(spark):
    emb = load_table(spark, SF_ORACLE, "embeddings").select("vec_id", "embedding")
    pdf = emb.toPandas().sort_values("vec_id").reset_index(drop=True)
    vecs = np.array(pdf["embedding"].tolist(), dtype=np.float64)

    rng = np.random.default_rng(42)
    rows = []
    for i in range(N_PLANT):
        v = vecs[i] / np.linalg.norm(vecs[i])
        w = rng.standard_normal(v.shape[0])
        u = w - np.dot(w, v) * v
        u /= np.linalg.norm(u)
        v2 = PLANT_COS * v + np.sqrt(1.0 - PLANT_COS**2) * u
        rows.append((PLANT_BASE + int(pdf["vec_id"][i]), [float(x) for x in v2]))

    planted_df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    full = emb.unionByName(planted_df)
    found = embedding_lsh_pairs(full, threshold=NEARDUP_COS)
    return {(r["vec_a"], r["vec_b"]) for r in found.collect()}, set(
        (int(pdf["vec_id"][i]), PLANT_BASE + int(pdf["vec_id"][i]))
        for i in range(N_PLANT)
    )


def test_recall_at_registered_threshold(planted):
    found, truth = planted
    hit = len(found & truth)
    recall = hit / len(truth)
    assert recall >= 0.95, f"measured recall {recall:.3f} < 0.95 ({hit}/{len(truth)})"


def test_banding_matches_oracle_bit_for_bit(spark):
    """The Arrow-batched hyperplane projection claims bit-identical
    sum order with the DuckDB oracle. The registered query can't prove
    it (0 pairs survive 0.98 on this corpus), so replay BOTH engines at
    threshold -1 (every band collision surfaces) and compare the full
    candidate sets + cosines — a single last-ulp sign flip would move a
    vector to another bucket and show up here."""
    import duckdb

    from radares_spark.plans import REGISTRY
    from radares_spark.io.tables import TABLES
    from tests.conftest import SF_SMOKE
    from pathlib import Path

    spark_pairs = {
        (r["vec_a"], r["vec_b"]): r["cos_sim"]
        for r in embedding_lsh_pairs(
            load_table(spark, SF_SMOKE, "embeddings"), threshold=-1.0
        ).collect()
    }

    sql = REGISTRY["dedup_embedding_lsh"].oracle.replace(
        f">= {TESTDATA_NEARDUP_COS}", ">= -1.0"
    )
    con = duckdb.connect()
    for t in TABLES:
        p = Path(SF_SMOKE) / f"{t}.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    duck_pairs = {
        (a, b): c for a, b, c in con.execute(sql).fetchall()
    }
    con.close()

    assert len(spark_pairs) > 500  # the check is non-vacuous
    assert spark_pairs == duck_pairs


def test_no_false_positives_from_natural_corpus(planted):
    # exact in-bucket verification: a random band collision never
    # produces a pair — the natural corpus (max pair cosine ~0.51)
    # contributes NO pair at the 0.98 threshold
    found, _ = planted
    natural = {(a, b) for a, b in found if a < PLANT_BASE and b < PLANT_BASE}
    assert natural == set()
