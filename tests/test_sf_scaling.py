"""bench.py --sf-scaling (r13 verdict #7): the replicated-corpus
builder must scale ROWS without inflating near-dup DENSITY — each
replica rewrites the text through a per-replica BIJECTIVE character
rotation (length-preserving, so bytes scale exactly with rows), so
pair-forming operators see the original corpus's duplicate structure
at 10x the volume, not a 100x pair explosion manufactured by the
fixture."""

from __future__ import annotations

import pytest

import os

from pyspark.sql import functions as F

from bench import SCALE_QUERIES, _build_scaled_documents

SF_DIR = "/root/testdata/sf0.001"


@pytest.mark.slow  # >=10 s in the r15 full-suite durations log
def test_scaled_documents_invariants(spark, tmp_path):
    out = str(tmp_path / "big")
    n_big = _build_scaled_documents(spark, SF_DIR, out, 4)
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    big = spark.read.parquet(os.path.join(out, "documents.parquet"))

    # exact replication-x rows, ids unique, schema query-compatible
    n_small = docs.count()
    assert n_big == big.count() == 4 * n_small
    assert big.select("doc_id").distinct().count() == n_big
    assert {"doc_id", "text", "lang", "source", "n_chars"} <= set(big.columns)

    # replicas of the SAME doc are not near-duplicates of each other:
    # char-3gram Jaccard between replica 0 and replica 1 stays far
    # below any dedup threshold (every token differs by its suffix)
    from radares_spark.operators.dedup import _char3_gram_sets

    g = _char3_gram_sets(
        big.filter(F.col("doc_id") % 4 < 2).withColumn(
            "pair", (F.col("doc_id") / 4).cast("long")
        )
    )
    a = g.filter(F.col("doc_id") % 4 == 0).select(
        (F.col("doc_id") / 4).cast("long").alias("pair"), F.col("gs").alias("ga")
    )
    b = g.filter(F.col("doc_id") % 4 == 1).select(
        (F.col("doc_id") / 4).cast("long").alias("pair"), F.col("gs").alias("gb")
    )
    j = (
        a.join(b, "pair")
        .select(
            (
                F.size(F.array_intersect("ga", "gb"))
                / (
                    F.size("ga")
                    + F.size("gb")
                    - F.size(F.array_intersect("ga", "gb"))
                ).cast("double")
            ).alias("jac")
        )
        .agg(F.max("jac").alias("mx"), F.avg("jac").alias("av"))
        .head()
    )
    assert j["mx"] is not None and j["mx"] < 0.5, j
    assert j["av"] < 0.35, j

    # every scale query's plan CONSTRUCTS against the scaled dir (the
    # cheap contract — the timed run is the bench mode's job)
    from bench import LIBRARY_PLANS, _late_library_plans
    from radares_spark.plans import REGISTRY

    plans = {**LIBRARY_PLANS, **_late_library_plans()}
    for name in SCALE_QUERIES:
        fn = plans.get(name) or REGISTRY[name].fn
        df = fn(spark, out)
        assert df.columns, name


def test_replication_beyond_alphabet_refused(spark, tmp_path):
    """r14 review find: rotation i % len(alpha) would wrap to the
    IDENTITY map at replication > len(alpha)=10, minting exact
    byte-for-byte duplicate replicas and silently inflating dup
    density — the artifact the bijection exists to avoid. The builder
    must refuse instead."""
    import pytest

    with pytest.raises(ValueError, match="distinct character rotations"):
        _build_scaled_documents(spark, SF_DIR, str(tmp_path / "big"), 11)
