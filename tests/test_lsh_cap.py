"""Hot-bucket cap for LSH pair generation (dedup.lsh_pairs_capped):
the per-bucket quadratic bound that survives boilerplate spam."""

from __future__ import annotations

from pyspark.sql import functions as F

from radares_spark.operators.dedup import (
    lsh_bands,
    lsh_pairs_capped,
    minhash_signatures,
)

SPAM = "identical boilerplate footer text repeated across the mirror farm " * 5
REAL_A = "a genuinely unique document about rivers and their seasonal flooding patterns"
REAL_B = "a genuinely unique document about rivers and their seasonal flooding patterns today"


def _bands(spark, rows):
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    return lsh_bands(minhash_signatures(docs))


def test_cap_excludes_spam_bucket_keeps_real_pairs(spark):
    # 40 identical spam docs (collide in EVERY band) + one true
    # near-dup pair that must survive the cap
    rows = [(i, SPAM) for i in range(40)] + [(100, REAL_A), (101, REAL_B)]
    bands = _bands(spark, rows)
    pairs, hot = lsh_pairs_capped(bands, max_bucket=10)

    got = {(r["doc_a"], r["doc_b"]) for r in pairs.collect()}
    assert (100, 101) in got  # the real near-dup pair survives
    assert all(a >= 100 for a, _ in got)  # no spam pair was generated

    hot_rows = hot.collect()
    assert hot_rows and all(r["n_docs"] == 40 for r in hot_rows)
    # identical docs collide in every band -> every band reports hot
    assert {r["band"] for r in hot_rows} == {r["band"] for r in bands.collect()}


def test_cap_is_a_noop_when_no_bucket_is_hot(spark):
    from radares_spark.operators.dedup import dedup_minhash_pairs  # noqa: F401

    rows = [(100, REAL_A), (101, REAL_B), (102, "something else entirely here")]
    bands = _bands(spark, rows)
    capped, hot = lsh_pairs_capped(bands, max_bucket=10)

    a, b = bands.alias("a"), bands.alias("b")
    uncapped = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_shared_bands"))
    )
    assert hot.count() == 0
    assert sorted(map(tuple, capped.collect())) == sorted(map(tuple, uncapped.collect()))


def test_exclusion_is_broadcast_anti_join(spark):
    rows = [(i, SPAM) for i in range(40)] + [(100, REAL_A), (101, REAL_B)]
    bands = _bands(spark, rows)
    pairs, _ = lsh_pairs_capped(bands, max_bucket=10)
    plan = pairs._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
