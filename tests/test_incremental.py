"""Incremental admission dedup (operators/incremental.py) — the
at-scale generalization of the reference's existence guard
(/root/reference/src/clean_data.py:168-180; unique index at
database/schema.sql:31-33).

Three contracts, per VERDICT r3 ask #4:

1. admission outcomes match an independent DuckDB SQL oracle (the
   outcome logic is plain SQL over the ledger representation:
   semi-joins + band-match scoring + priority CASE);
2. the nightly band join over a bucketed+sorted ledger
   (io/bucketing.write_bucketed) shuffles ONLY the new batch — the
   ledger side scans its buckets in place with zero Exchange;
3. admission is idempotent: append the kept rows, re-admit the same
   batch, and every doc comes back ``exact_dup_corpus``.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from radares_spark.io.bucketing import write_bucketed
from radares_spark.io.tables import load_table
from radares_spark.operators.incremental import (
    N_PERM,
    NEAR_MIN_MATCH,
    OUT_EXACT_BATCH,
    OUT_EXACT_CORPUS,
    OUT_KEPT,
    OUT_NEAR_BATCH,
    OUT_NEAR_CORPUS,
    incremental_dedup,
    ledger_rows,
)
from tests.conftest import SF_SMOKE
from tests.oracle import duckdb_conn


@pytest.fixture(scope="module")
def corpus_and_batch(spark):
    """Accepted corpus = docs 0..399. Tonight's batch (re-keyed to
    fresh ids 10_000+) plants every outcome:

    - 30 docs re-sent verbatim            -> exact_dup_corpus
    - one batch doc sent twice            -> exact_dup_batch (higher id)
    - 10 accepted docs lightly perturbed  -> near_dup_corpus
    - one fresh doc + its light perturb   -> near_dup_batch (higher id)
    - docs 400..499 (never accepted)      -> kept
    """
    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text")
    accepted = docs.filter(F.col("doc_id") < 400)

    resent = (
        docs.filter(F.col("doc_id") < 30)
        .select((F.col("doc_id") + 10_000).alias("doc_id"), "text")
    )
    twice_a = docs.filter(F.col("doc_id") == 450).select(
        F.lit(20_000).alias("doc_id"), "text"
    )
    twice_b = docs.filter(F.col("doc_id") == 450).select(
        F.lit(20_001).alias("doc_id"), "text"
    )
    # light perturbation: append two words — shingle sets stay ~identical
    near_corpus = (
        docs.filter((F.col("doc_id") >= 100) & (F.col("doc_id") < 110))
        .select(
            (F.col("doc_id") + 30_000).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" trailing noise")).alias("text"),
        )
    )
    fresh_near_a = docs.filter(F.col("doc_id") == 460).select(
        F.lit(40_000).alias("doc_id"), "text"
    )
    fresh_near_b = docs.filter(F.col("doc_id") == 460).select(
        F.lit(40_001).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" tiny suffix")).alias("text"),
    )
    fresh = docs.filter(F.col("doc_id") >= 400).select(
        (F.col("doc_id") + 50_000).alias("doc_id"), "text"
    )
    batch = (
        resent.unionByName(twice_a)
        .unionByName(twice_b)
        .unionByName(near_corpus)
        .unionByName(fresh_near_a)
        .unionByName(fresh_near_b)
        .unionByName(fresh)
    )
    return accepted, batch


def test_outcomes_match_duckdb_oracle(spark, corpus_and_batch, tmp_path):
    """Independent SQL re-derivation of the admission outcomes from the
    ledger representation (semi-joins + band scoring + priority CASE) —
    same rigor class as the driver's oracle rows."""
    accepted, batch_docs = corpus_and_batch
    ledger = ledger_rows(accepted)
    batch = ledger_rows(batch_docs)

    lp, bp = str(tmp_path / "ledger.parquet"), str(tmp_path / "batch.parquet")
    ledger.write.mode("overwrite").parquet(lp)
    batch.write.mode("overwrite").parquet(bp)

    audit, _ = incremental_dedup(batch_docs, ledger)
    got = {r["doc_id"]: r["outcome"] for r in audit.collect()}

    score = " + ".join(
        f"CASE WHEN s.s{i} = l.s{i} THEN 1 ELSE 0 END" for i in range(N_PERM)
    )
    score_batch = " + ".join(
        f"CASE WHEN sa.s{i} = sb.s{i} THEN 1 ELSE 0 END" for i in range(N_PERM)
    )
    con = duckdb_conn(SF_SMOKE)
    con.execute(f"CREATE VIEW ledger AS SELECT * FROM read_parquet('{lp}/*.parquet')")
    con.execute(f"CREATE VIEW batch AS SELECT * FROM read_parquet('{bp}/*.parquet')")
    oracle = con.execute(
        f"""
        WITH exact AS (SELECT DISTINCT doc_id, content_hash FROM batch),
        sig AS (SELECT DISTINCT doc_id, {', '.join(f's{i}' for i in range(N_PERM))} FROM batch),
        bands AS (SELECT doc_id, band, band_hash FROM batch),
        f_exact_corpus AS (
            SELECT doc_id FROM exact
            WHERE content_hash IN (SELECT content_hash FROM ledger)),
        keeper AS (
            SELECT content_hash, min(doc_id) AS keep_id FROM exact GROUP BY content_hash),
        f_exact_batch AS (
            SELECT e.doc_id FROM exact e JOIN keeper k USING (content_hash)
            WHERE e.doc_id <> k.keep_id),
        f_near_corpus AS (
            SELECT DISTINCT b.doc_id
            FROM bands b JOIN sig s USING (doc_id)
            JOIN ledger l ON b.band = l.band AND b.band_hash = l.band_hash
            WHERE {score} >= {NEAR_MIN_MATCH}),
        f_near_batch AS (
            SELECT DISTINCT a.doc_id
            FROM bands a JOIN sig sa ON sa.doc_id = a.doc_id
            JOIN bands b ON a.band = b.band AND a.band_hash = b.band_hash
                         AND a.doc_id > b.doc_id
            JOIN sig sb ON sb.doc_id = b.doc_id
            WHERE {score_batch} >= {NEAR_MIN_MATCH})
        SELECT e.doc_id,
               CASE WHEN e.doc_id IN (SELECT doc_id FROM f_exact_corpus) THEN '{OUT_EXACT_CORPUS}'
                    WHEN e.doc_id IN (SELECT doc_id FROM f_exact_batch)  THEN '{OUT_EXACT_BATCH}'
                    WHEN e.doc_id IN (SELECT doc_id FROM f_near_corpus)  THEN '{OUT_NEAR_CORPUS}'
                    WHEN e.doc_id IN (SELECT doc_id FROM f_near_batch)   THEN '{OUT_NEAR_BATCH}'
                    ELSE '{OUT_KEPT}' END AS outcome
        FROM exact e
        """
    ).fetchall()
    expect = {doc_id: outcome for doc_id, outcome in oracle}
    assert got == expect

    # the planted structure actually exercised every outcome
    by_outcome = {o: {d for d, x in got.items() if x == o} for o in set(got.values())}
    assert set(range(10_000, 10_030)) <= by_outcome[OUT_EXACT_CORPUS]
    # 20_001 = verbatim copy of 20_000 within the batch; the re-sent
    # fresh twins (50_450 of 20_000, 50_460 of 40_000) drop the same way
    assert {20_001, 50_450, 50_460} <= by_outcome[OUT_EXACT_BATCH]
    assert set(range(30_100, 30_110)) <= by_outcome[OUT_NEAR_CORPUS]
    assert 40_001 in by_outcome[OUT_NEAR_BATCH]
    assert 40_000 in by_outcome[OUT_KEPT]
    assert {50_400, 50_401, 50_402, 50_403} <= by_outcome[OUT_KEPT]


def test_band_join_shuffles_only_the_batch(spark, corpus_and_batch, tmp_path):
    """Ledger persisted bucketed+sorted on (band, band_hash): the
    nightly candidate join is a SortMergeJoin whose ledger side is a
    bucketed scan with NO Exchange and NO Sort — exactly one
    Exchange in the whole plan, and it is on the batch side."""
    accepted, batch_docs = corpus_and_batch
    write_bucketed(
        ledger_rows(accepted),
        "dedup_ledger_b",
        str(tmp_path / "ledger_b"),
        ["band", "band_hash"],
        4,
    )
    # batch side pre-shaped as incremental_dedup's step-3 probe
    batch = ledger_rows(batch_docs).localCheckpoint()  # cut lineage: isolate the join plan

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
    try:
        joined = batch.join(
            spark.table("dedup_ledger_b").select(
                "band",
                "band_hash",
                *[F.col(f"s{i}").alias(f"t{i}") for i in range(N_PERM)],
            ),
            ["band", "band_hash"],
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert plan.count("Exchange hashpartitioning") == 1, plan
        assert "SelectedBucketsCount: 4 out of 4" in plan
        # scoring on top of the bucketed candidates still matches the
        # plain-DataFrame ledger path
        scored = joined.filter(
            sum(
                (F.col(f"s{i}") == F.col(f"t{i}")).cast("int") for i in range(N_PERM)
            )
            >= NEAR_MIN_MATCH
        )
        assert scored.count() > 0
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
        spark.conf.unset("spark.sql.legacy.bucketedTableScan.outputOrdering")


def test_idempotent_readmission(spark, corpus_and_batch):
    """Same batch admitted twice: after appending round-1's kept rows
    to the ledger, round 2 must mark EVERY batch doc exact_dup_corpus
    and emit zero append rows — the reference's unique-index guarantee
    (schema.sql:31-33), reproduced without an index."""
    accepted, batch_docs = corpus_and_batch
    ledger = ledger_rows(accepted)

    audit1, append1 = incremental_dedup(batch_docs, ledger)
    kept1 = {r["doc_id"] for r in audit1.filter(F.col("outcome") == OUT_KEPT).collect()}
    assert kept1  # something was admitted

    ledger2 = ledger.unionByName(append1)
    audit2, append2 = incremental_dedup(batch_docs, ledger2)
    out2 = {r["doc_id"]: r["outcome"] for r in audit2.collect()}

    # every previously-kept doc is now an exact corpus dup; every
    # previously-dropped doc keeps a non-kept outcome
    assert all(out2[d] == OUT_EXACT_CORPUS for d in kept1)
    assert all(o != OUT_KEPT for o in out2.values())
    assert append2.count() == 0


def test_empty_ledger_bootstrap(spark, corpus_and_batch):
    """First-ever run: empty ledger — no corpus outcomes possible,
    in-batch dedup still applies."""
    _, batch_docs = corpus_and_batch
    empty = ledger_rows(batch_docs).filter(F.lit(False))
    audit, append = incremental_dedup(batch_docs, empty)
    outcomes = {r["doc_id"]: r["outcome"] for r in audit.collect()}
    assert OUT_EXACT_CORPUS not in outcomes.values()
    assert OUT_NEAR_CORPUS not in outcomes.values()
    assert outcomes[20_001] == OUT_EXACT_BATCH
    assert append.count() > 0


def test_short_docs_survive_the_audit_spine(spark):
    """ADVICE r4: docs too short to shingle (<3 normalized words) must
    still get exactly one audit row and a hash-only ledger row — they
    dedup exactly, and kept ones classify exact_dup_corpus when the
    same content is re-admitted the next night."""
    docs = spark.createDataFrame(
        [
            (1, "hi"),
            (2, "hi"),
            (3, ""),
            (4, "one two"),
            (5, "a perfectly ordinary document with plenty of words in it"),
            (6, None),  # NULL text: hashes like '' (review fix) — never
            # a NULL content_hash that would re-admit forever
        ],
        "doc_id long, text string",
    )
    empty = ledger_rows(docs).filter(F.lit(False))
    audit, append = incremental_dedup(docs, empty)
    out = {r["doc_id"]: r["outcome"] for r in audit.collect()}
    # full spine: nothing vanishes, exactly one row per doc
    assert set(out) == {1, 2, 3, 4, 5, 6}
    assert audit.count() == 6
    assert out[2] == OUT_EXACT_BATCH  # duplicate short content, higher id
    assert out[6] == OUT_EXACT_BATCH  # NULL == '' content, dup of doc 3
    for d in (1, 3, 4, 5):
        assert out[d] == OUT_KEPT, d
    # hash-only ledger rows exist for sig-less kept docs
    short_rows = append.filter(F.col("doc_id").isin(1, 3, 4)).collect()
    assert {r["doc_id"] for r in short_rows} == {1, 3, 4}
    assert all(r["band_hash"] is None for r in short_rows)
    # re-admission: every kept doc (short ones included) is now a
    # corpus duplicate and nothing is appended
    audit2, append2 = incremental_dedup(docs, append)
    out2 = {r["doc_id"]: r["outcome"] for r in audit2.collect()}
    for d in (1, 3, 4, 5):
        assert out2[d] == OUT_EXACT_CORPUS, d
    assert append2.count() == 0
