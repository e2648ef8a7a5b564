"""Incremental corpus dedup — admit a NEW batch of documents against
the already-accepted corpus without rescanning corpus bytes.

The accepted corpus is represented by a compact *dedup ledger*: one
row per (accepted doc, LSH band) carrying the content hash and the
full minhash signature::

    (doc_id, content_hash, s0..s7, band, band_hash)

Hashes and sketches only — at a 100 TB corpus the ledger is hundreds
of GB of longs, and the nightly admission join never touches corpus
text. This is the missing half of the batch dedup family
(operators/dedup.py): those operators dedup a corpus against itself;
this one dedups tonight's crawl against everything ever accepted.

Admission outcomes (first hit wins, mirroring the stage-priority
audit idiom of pipeline/corpus.curate):

1. ``exact_dup_corpus`` — content hash already in the ledger;
2. ``exact_dup_batch``  — duplicate content within the batch (the
   minimum doc_id is kept);
3. ``near_dup_corpus``  — an LSH band collision with an accepted doc
   whose signature agrees on >= ``min_match`` of the 8 minhash mins
   (signature-estimated Jaccard — candidates come from band buckets,
   never all-pairs);
4. ``near_dup_batch``   — same estimate within the batch; the higher
   doc_id of a pair drops (min of each pairwise-connected group stays
   reachable — same contract as curate's near stage);
5. ``kept``             — survivor; its ledger rows are the append
   set that makes the next run see tonight's corpus.

Precision contract (stated, not hidden): near-dup drops use the
SIGNATURE estimate (matching mins / 8), not exact Jaccard — the
ledger stores no text to verify against. E[matches/8] equals the true
Jaccard, so ``min_match=7`` targets ~0.875+ overlap. The in-batch
curation path (pipeline/corpus.curate) keeps its exact-Jaccard
verification; this operator is the at-scale admission gate where
re-reading accepted text would cost more than a rare false drop.

Scale shape: persist the ledger bucketed+sorted on the band join keys
(io/bucketing.write_bucketed) and the nightly band join shuffles ONLY
the new batch — the ledger side scans its buckets in place with zero
Exchange (plan-asserted in tests/test_incremental.py). All joins are
equi-joins on hash keys; nothing is quadratic in either the batch or
the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from radares_spark.operators.dedup import (
    N_PERM,
    _md5,
    lsh_bands,
    minhash_signatures,
    normalize_text,
)

NEAR_MIN_MATCH = 7  # of N_PERM=8 — signature-estimated Jaccard ~0.875
SIG_COLS = [f"s{i}" for i in range(N_PERM)]

OUT_EXACT_CORPUS = "exact_dup_corpus"
OUT_EXACT_BATCH = "exact_dup_batch"
OUT_NEAR_CORPUS = "near_dup_corpus"
OUT_NEAR_BATCH = "near_dup_batch"
OUT_KEPT = "kept"


def ledger_rows(docs: DataFrame) -> DataFrame:
    """(doc_id, content_hash, s0..s7, band, band_hash) — the dedup
    ledger representation of ``docs`` (one row per doc per band).
    The signature ride-along on every band row is deliberate: the
    admission join scores candidates from the band row alone, no
    second lookup against a signature table."""
    sig = minhash_signatures(docs)
    exact = docs.select(
        "doc_id", _md5(normalize_text(F.col("text"))).alias("content_hash")
    )
    return exact.join(sig, "doc_id").join(lsh_bands(sig), "doc_id")


def _sig_score(left_prefix: str, right_prefix: str):
    return sum(
        (F.col(f"{left_prefix}{i}") == F.col(f"{right_prefix}{i}")).cast("int")
        for i in range(N_PERM)
    )


def incremental_dedup(
    new_docs: DataFrame, ledger: DataFrame, min_match: int = NEAR_MIN_MATCH
) -> tuple[DataFrame, DataFrame]:
    """Admit ``new_docs`` against ``ledger`` (rows shaped like
    :func:`ledger_rows`; may be empty).

    Returns ``(audit, append_rows)``: ``audit`` is one
    ``(doc_id, outcome)`` row per batch doc; ``append_rows`` is the
    ledger rows of the kept docs — append them (idempotently) and the
    next batch dedups against tonight's corpus too.
    """
    batch = ledger_rows(new_docs)
    exact = batch.select("doc_id", "content_hash").distinct()
    sig = batch.select("doc_id", *SIG_COLS).distinct()
    bands = batch.select("doc_id", "band", "band_hash")

    # 1. exact vs corpus — NO distinct on the ledger side: a semi-join
    # ignores right-side multiplicity, and a distinct here would be a
    # full-ledger shuffle before the join even starts.
    led_hashes = ledger.select("content_hash")
    f_exact_corpus = (
        exact.join(led_hashes, "content_hash", "left_semi")
        .select("doc_id")
        .withColumn("f_exact_corpus", F.lit(True))
    )

    # 2. exact within batch (min doc_id keeps)
    keeper = exact.groupBy("content_hash").agg(F.min("doc_id").alias("keep_id"))
    f_exact_batch = (
        exact.join(keeper, "content_hash")
        .filter(F.col("doc_id") != F.col("keep_id"))
        .select("doc_id")
        .withColumn("f_exact_batch", F.lit(True))
    )

    # 3. near vs corpus: band-bucket candidates, signature-scored
    led_bands = ledger.select(
        "band",
        "band_hash",
        *[F.col(f"s{i}").alias(f"t{i}") for i in range(N_PERM)],
    )
    f_near_corpus = (
        bands.join(sig, "doc_id")
        .join(led_bands, ["band", "band_hash"])
        .filter(_sig_score("s", "t") >= min_match)
        .select("doc_id")
        .distinct()
        .withColumn("f_near_corpus", F.lit(True))
    )

    # 4. near within batch: band self-join, higher doc_id drops
    a = bands.join(sig, "doc_id")
    b = a.select(
        F.col("doc_id").alias("other_id"),
        "band",
        "band_hash",
        *[F.col(f"s{i}").alias(f"t{i}") for i in range(N_PERM)],
    )
    f_near_batch = (
        a.join(b, ["band", "band_hash"])
        .filter(F.col("doc_id") > F.col("other_id"))
        .filter(_sig_score("s", "t") >= min_match)
        .select("doc_id")
        .distinct()
        .withColumn("f_near_batch", F.lit(True))
    )

    audit = (
        exact.select("doc_id")
        .join(f_exact_corpus, "doc_id", "left")
        .join(f_exact_batch, "doc_id", "left")
        .join(f_near_corpus, "doc_id", "left")
        .join(f_near_batch, "doc_id", "left")
        .select(
            "doc_id",
            F.when(F.col("f_exact_corpus"), OUT_EXACT_CORPUS)
            .when(F.col("f_exact_batch"), OUT_EXACT_BATCH)
            .when(F.col("f_near_corpus"), OUT_NEAR_CORPUS)
            .when(F.col("f_near_batch"), OUT_NEAR_BATCH)
            .otherwise(OUT_KEPT)
            .alias("outcome"),
        )
    )
    append_rows = batch.join(
        audit.filter(F.col("outcome") == OUT_KEPT).select("doc_id"), "doc_id", "left_semi"
    )
    return audit, append_rows
