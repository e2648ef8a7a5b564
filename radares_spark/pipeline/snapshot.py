"""Corpus snapshot diff — what changed between two crawls.

A recrawl pipeline (reference crawl loop:
/root/reference/src/scrape.py — each run lands a fresh batch of the
same logical corpus) needs to answer "what did tonight's run add,
remove, or rewrite?" before any downstream stage re-runs: changed
docs must re-enter curation, removed docs must leave the serving
index, unchanged docs should cost nothing.  This module computes that
delta as one narrow join:

1. Each snapshot is projected to ``(key, content_fingerprint)``
   BEFORE the join — at 100 TB the shuffle carries two slim columns
   (8-byte key + 32-char md5), never the document bytes.  Hashing is
   a map-side codegen'd projection over the scan.
2. One full-outer equi-join on the key classifies every doc:
   ``added`` (new only), ``removed`` (old only), ``changed``
   (both, fingerprints differ), ``unchanged``.
3. Snapshots persisted bucketed on the key (io/bucketing.py) diff
   with ZERO Exchange — the join reads both bucket layouts in place
   (plan-asserted in tests/test_snapshot.py).  That is the steady
   state for nightly runs: write each snapshot bucketed once, diff
   any two for free.

The fingerprint NULL-tags every column (NULL hashes differently from
every real value, including ``''``) and is the same md5 the exact
dedup stage uses, so both engines in the oracle pair agree byte for
byte.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from radares_spark.io.tables import load_table
from radares_spark.registry import QuerySpec


ADDED = "added"
REMOVED = "removed"
CHANGED = "changed"
UNCHANGED = "unchanged"


def content_fingerprint(cols: Sequence[str]) -> Column:
    """md5 over per-column md5 slots: each column contributes
    ``md5('V' || cast(col as string))`` (or ``md5('N')`` when NULL),
    and the fingerprint is the md5 of the fixed-width slots
    concatenated.  Hash-of-hashes makes slot boundaries unambiguous —
    a value containing any separator-looking bytes cannot imitate a
    different column split (a review catch: the earlier raw
    0x1f-joined form collided ``("x\\x1fVy", NULL)`` with
    ``("x", "y\\x1fN")``).  The V/N tag keeps NULL distinct from both
    ``''`` and the literal string ``'N'``; casting through string
    keeps the expression one codegen'd projection for any type."""
    slots = [
        F.md5(
            F.when(F.col(c).isNull(), F.lit("N")).otherwise(
                F.concat(F.lit("V"), F.col(c).cast("string"))
            )
        )
        for c in cols
    ]
    return F.md5(F.concat(*slots))


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key: str = "doc_id",
    content_cols: Sequence[str] = ("text",),
) -> DataFrame:
    """Per-doc delta between two corpus snapshots:
    ``(key, status, old_hash, new_hash)`` with status one of
    added / removed / changed / unchanged.

    Both sides are reduced to ``(key, fingerprint)`` before the
    full-outer join, so the only shuffle in the plan moves two narrow
    columns — the 100 TB-safe shape (document bytes never cross the
    wire; the hash rides the scan).  With both snapshots stored
    bucketed on ``key`` the join plans with zero Exchange."""
    o = old.select(F.col(key).alias("_ok"), content_fingerprint(content_cols).alias("old_hash"))
    n = new.select(F.col(key).alias("_nk"), content_fingerprint(content_cols).alias("new_hash"))
    j = o.join(n, F.col("_ok") == F.col("_nk"), "full_outer")
    return j.select(
        F.coalesce(F.col("_ok"), F.col("_nk")).alias(key),
        F.when(F.col("_ok").isNull(), F.lit(ADDED))
        .when(F.col("_nk").isNull(), F.lit(REMOVED))
        .when(F.col("old_hash") == F.col("new_hash"), F.lit(UNCHANGED))
        .otherwise(F.lit(CHANGED))
        .alias("status"),
        "old_hash",
        "new_hash",
    )


def snapshot_diff_summary(diff: DataFrame) -> DataFrame:
    """Four-ish-row rollup of :func:`snapshot_diff` — the number a
    nightly report prints before deciding whether to re-run curation
    (one map-side-combined aggregate on a 4-value key)."""
    return diff.groupBy("status").agg(F.count("*").alias("n_docs"))


# --- library spec ----------------------------------------------------
#
# Deterministic two-snapshot derivation from the single `documents`
# table (the same style the URL-ledger spec uses for its nightly
# batches): old = doc_id % 11 != 0, new = doc_id % 13 != 0 with every
# doc_id % 7 == 0 doc rewritten (text || ' [rev2]').  Every status is
# populated: % 11 hits are added, % 13 hits removed, % 7 survivors
# changed (NULL-text "rewrites" concat to NULL in BOTH engines and
# correctly classify unchanged), the rest unchanged.


def corpus_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    old = docs.filter(F.col("doc_id") % 11 != 0)
    new = docs.filter(F.col("doc_id") % 13 != 0).withColumn(
        "text",
        F.when(
            F.col("doc_id") % 7 == 0, F.concat(F.col("text"), F.lit(" [rev2]"))
        ).otherwise(F.col("text")),
    )
    return snapshot_diff(old, new)


DIFF_SQL = """
WITH old_snap AS (
    SELECT doc_id,
           md5(md5(CASE WHEN text IS NULL THEN 'N' ELSE 'V' || text END)) AS h
    FROM documents WHERE doc_id % 11 <> 0
),
new_snap AS (
    SELECT doc_id,
           md5(md5(CASE WHEN t IS NULL THEN 'N' ELSE 'V' || t END)) AS h
    FROM (
        SELECT doc_id,
               CASE WHEN doc_id % 7 = 0 THEN text || ' [rev2]' ELSE text END AS t
        FROM documents WHERE doc_id % 13 <> 0
    )
)
SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
       CASE WHEN o.doc_id IS NULL THEN 'added'
            WHEN n.doc_id IS NULL THEN 'removed'
            WHEN o.h = n.h THEN 'unchanged'
            ELSE 'changed' END AS status,
       o.h AS old_hash,
       n.h AS new_hash
FROM old_snap o FULL OUTER JOIN new_snap n ON o.doc_id = n.doc_id
"""


# Promoted to the driver's 50-entry window in r8 (plans/__init__.py
# merges DRIVER_SPECS); LIBRARY_SPECS stays for this module's
# unpromoted entries (none today).
LIBRARY_SPECS: dict[str, QuerySpec] = {}

DRIVER_SPECS: dict[str, QuerySpec] = {
    "corpus_snapshot_diff": QuerySpec(
        name="corpus_snapshot_diff",
        fn=corpus_snapshot_diff,
        oracle=DIFF_SQL,
        survey="LLM-pipeline (recrawl delta: added/removed/changed/"
        "unchanged per doc between two corpus snapshots)",
        doc="Full-outer join of two NULL-tagged md5 fingerprint "
        "projections — the shuffle carries (key, hash) only, never "
        "document bytes; bucketed snapshots diff with zero Exchange "
        "(plan-asserted). Statuses all populated by the modulo-derived "
        "snapshot pair, including NULL-text rewrite no-ops.",
    ),
}
