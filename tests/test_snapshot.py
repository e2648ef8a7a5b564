"""Corpus snapshot diff (pipeline/snapshot.py).

Strict DuckDB parity for the library spec rides the
tests/test_oracle_parity.py sweep; here: planted-status truth, NULL
semantics, multi-column fingerprints, and the zero-Exchange plan for
bucketed snapshots (the steady-state nightly shape)."""

from __future__ import annotations

import pandas as pd

from radares_spark.pipeline.snapshot import (
    snapshot_diff,
    snapshot_diff_summary,
)


def _frame(spark, rows):
    return spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))


def test_planted_statuses(spark):
    old = _frame(spark, [(1, "a"), (2, "b"), (3, "c"), (4, "d")])
    new = _frame(spark, [(2, "b"), (3, "c-edited"), (4, "d"), (5, "e")])
    got = {r["doc_id"]: r["status"] for r in snapshot_diff(old, new).collect()}
    assert got == {
        1: "removed",
        2: "unchanged",
        3: "changed",
        4: "unchanged",
        5: "added",
    }


def test_null_text_semantics(spark):
    """NULL == NULL is unchanged; NULL vs '' and NULL vs value are
    changed; NULL vs the literal string 'N' is changed (the tag keeps
    NULL distinct from every real value)."""
    old = _frame(spark, [(1, None), (2, None), (3, None), (4, None)])
    new = _frame(spark, [(1, None), (2, ""), (3, "x"), (4, "N")])
    got = {r["doc_id"]: r["status"] for r in snapshot_diff(old, new).collect()}
    assert got == {1: "unchanged", 2: "changed", 3: "changed", 4: "changed"}


def test_hash_columns_present_only_where_defined(spark):
    old = _frame(spark, [(1, "a"), (2, "b")])
    new = _frame(spark, [(2, "b"), (3, "c")])
    rows = {r["doc_id"]: r for r in snapshot_diff(old, new).collect()}
    assert rows[1]["old_hash"] is not None and rows[1]["new_hash"] is None
    assert rows[3]["old_hash"] is None and rows[3]["new_hash"] is not None
    assert rows[2]["old_hash"] == rows[2]["new_hash"]


def test_multi_column_fingerprint(spark):
    cols = ["doc_id", "text", "lang"]
    old = spark.createDataFrame(
        pd.DataFrame([(1, "a", "en"), (2, "b", "en")], columns=cols)
    )
    new = spark.createDataFrame(
        pd.DataFrame([(1, "a", "pt"), (2, "b", "en")], columns=cols)
    )
    got = {
        r["doc_id"]: r["status"]
        for r in snapshot_diff(old, new, content_cols=["text", "lang"]).collect()
    }
    assert got == {1: "changed", 2: "unchanged"}


def test_summary_counts(spark):
    old = _frame(spark, [(1, "a"), (2, "b"), (3, "c")])
    new = _frame(spark, [(2, "b"), (3, "cc"), (4, "d"), (5, "e")])
    got = {
        r["status"]: r["n_docs"]
        for r in snapshot_diff_summary(snapshot_diff(old, new)).collect()
    }
    assert got == {"removed": 1, "unchanged": 1, "changed": 1, "added": 2}


def test_bucketed_snapshots_diff_with_zero_exchange(spark, tmp_path):
    """The steady-state nightly shape: both snapshots persisted
    bucketed+sorted on doc_id (io/bucketing.write_bucketed) and the
    full-outer diff plans with ZERO Exchange — each side scans its
    bucket layout in place.  This is the claim the module docstring
    makes for 100 TB recrawls."""
    from radares_spark.io.bucketing import write_bucketed
    from radares_spark.pipeline.snapshot import content_fingerprint
    import pyspark.sql.functions as F

    old = _frame(spark, [(i, f"doc {i}") for i in range(200)])
    new = _frame(
        spark,
        [(i, f"doc {i}" if i % 5 else f"doc {i} v2") for i in range(20, 220)],
    )
    for name, df in (("snap_old_b", old), ("snap_new_b", new)):
        write_bucketed(
            df.select(
                F.col("doc_id"), content_fingerprint(["text"]).alias("h")
            ),
            name,
            str(tmp_path / name),
            ["doc_id"],
            4,
        )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        diff = snapshot_diff(
            spark.table("snap_old_b"),
            spark.table("snap_new_b"),
            content_cols=["h"],
        )
        plan = diff._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        n = diff.count()
        assert n == 220  # 0..219 union of keys
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_multi_column_fingerprint_separator_cannot_be_imitated(spark):
    """Review finding: the raw separator-joined form collided
    ('x\\x1fVy', NULL) with ('x', 'y\\x1fN'). Hash-of-hashes slots
    must classify this pair as changed."""
    cols = ["doc_id", "a", "b"]
    old = spark.createDataFrame(
        pd.DataFrame([(1, "x\x1fVy", None)], columns=cols)
    )
    new = spark.createDataFrame(pd.DataFrame([(1, "x", "y\x1fN")], columns=cols))
    got = snapshot_diff(old, new, content_cols=["a", "b"]).collect()
    assert got[0]["status"] == "changed"
