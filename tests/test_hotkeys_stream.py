"""Streaming heavy-hitter monitor (streaming/hotkeys_stream.py):
stream fold == batch skew_report over everything landed, crash-replay
bit-identity, compaction."""

from __future__ import annotations

import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from radares_spark.operators.skew import skew_report
from radares_spark.streaming.hotkeys_stream import (
    compact_hot_ledger,
    current_top,
    run_hotkeys_stream,
)

TOP_N = 5


@pytest.fixture(scope="module")
def dirs(tmp_path_factory):
    root = tmp_path_factory.mktemp("hotkeys")
    return {
        "landing": str(root / "landing"),
        "ledger": str(root / "ledger"),
        "top": str(root / "top"),
        "ckpt": str(root / "ckpt"),
    }


def _land(spark, dirs, keys):
    spark.createDataFrame(pd.DataFrame({"k": keys})).coalesce(1).write.mode(
        "append"
    ).parquet(dirs["landing"])


def _run(spark, dirs):
    run_hotkeys_stream(
        spark,
        dirs["landing"],
        "k string",
        ["k"],
        dirs["ledger"],
        dirs["top"],
        dirs["ckpt"],
        top_n=TOP_N,
    )


def _top(spark, dirs):
    return sorted(
        (r["k"], r["n_rows"], r["share"])
        for r in current_top(spark, dirs["top"]).collect()
    )


def _batch(spark, all_keys):
    df = spark.createDataFrame(pd.DataFrame({"k": all_keys}))
    return sorted(
        (r["k"], r["n_rows"], r["share"])
        for r in skew_report(df, ["k"], TOP_N).drop("key_rank").collect()
    )


def test_stream_fold_matches_batch_report(spark, dirs):
    first = ["hot"] * 50 + [f"c{i}" for i in range(20)]
    _land(spark, dirs, first)
    _run(spark, dirs)
    assert _top(spark, dirs) == _batch(spark, first)

    # second landing shifts the ranking: a new key overtakes
    second = ["surge"] * 80 + ["hot"] * 10
    _land(spark, dirs, second)
    _run(spark, dirs)
    assert _top(spark, dirs) == _batch(spark, first + second)
    top_keys = {k for k, _, _ in _top(spark, dirs)}
    assert {"surge", "hot"} <= top_keys


def test_replay_after_crash_is_idempotent(spark, dirs):
    before_top = _top(spark, dirs)
    before_ledger = sorted(
        tuple(r) for r in spark.read.parquet(dirs["ledger"]).collect()
    )
    commits_dir = os.path.join(dirs["ckpt"], "commits")
    commits = sorted((f for f in os.listdir(commits_dir) if f.isdigit()), key=int)
    assert len(commits) >= 2
    os.remove(os.path.join(commits_dir, commits[-1]))
    crc = os.path.join(commits_dir, f".{commits[-1]}.crc")
    if os.path.exists(crc):
        os.remove(crc)
    _run(spark, dirs)
    assert _top(spark, dirs) == before_top
    assert (
        sorted(tuple(r) for r in spark.read.parquet(dirs["ledger"]).collect())
        == before_ledger
    )


def test_compaction_preserves_totals_then_folds_more(spark, dirs):
    before = _top(spark, dirs)
    compact_hot_ledger(spark, dirs["ledger"], dirs["ckpt"])
    eps = [d for d in os.listdir(dirs["ledger"]) if d.startswith("epoch=")]
    assert len(eps) == 1 and eps[0].startswith("epoch=-")
    assert _top(spark, dirs) == before  # compaction changes no totals
    # a post-compaction landing folds against the compacted totals
    _land(spark, dirs, ["hot"] * 5)
    _run(spark, dirs)
    after = {k: n for k, n, _ in _top(spark, dirs)}
    want = {k: n for k, n, _ in before}
    assert after["hot"] == want["hot"] + 5


def test_half_finished_compaction_never_double_counts(spark, dirs):
    """Review finding: additive folds are NOT superset-safe, so a
    crash between writing the new generation and deleting the old
    partitions must leave totals EXACT (the generation's watermark
    rides in its epoch value; readers never combine it with the
    deltas it already folded)."""
    from radares_spark.streaming.hotkeys_stream import _effective_rows, last_committed_epoch

    import pyspark.sql.functions as F

    before = {
        r["k"]: r["n_rows"]
        for r in _effective_rows(spark, dirs["ledger"])
        .groupBy("k").agg(F.sum("n_rows").alias("n_rows")).collect()
    }
    # simulate the crash window: run compaction, then RESTORE a
    # superseded delta dir as if GC never ran
    import shutil

    w = last_committed_epoch(spark, dirs["ckpt"])
    backup = {}
    for d in os.listdir(dirs["ledger"]):
        if d.startswith("epoch=") and not d.startswith("epoch=-"):
            backup[d] = dirs["ledger"] + "__bk_" + d
            shutil.copytree(os.path.join(dirs["ledger"], d), backup[d])
    compact_hot_ledger(spark, dirs["ledger"], dirs["ckpt"])
    for d, bk in backup.items():
        dst = os.path.join(dirs["ledger"], d)
        if not os.path.exists(dst):
            shutil.copytree(bk, dst)
        shutil.rmtree(bk)
    # superseded deltas present alongside the generation: totals exact
    after = {
        r["k"]: r["n_rows"]
        for r in _effective_rows(spark, dirs["ledger"])
        .groupBy("k").agg(F.sum("n_rows").alias("n_rows")).collect()
    }
    assert after == before


def test_compaction_never_folds_uncommitted_epochs(spark, dirs):
    """Review finding: a crashed, not-yet-replayed epoch must stay an
    excludable delta — folding it into the generation would hide it
    from the replay's own-epoch exclusion and double-count the batch."""
    import pandas as pd

    from radares_spark.streaming.hotkeys_stream import last_committed_epoch

    w = last_committed_epoch(spark, dirs["ckpt"])
    # plant a delta for an epoch BEYOND the last commit (as a crashed
    # batch would leave behind)
    fake_epoch = w + 1
    spark.createDataFrame(pd.DataFrame({"k": ["ghost"], "n_rows": [7]})).withColumn(
        "epoch", F.lit(fake_epoch)
    ).write.mode("append").partitionBy("epoch").parquet(dirs["ledger"])
    compact_hot_ledger(spark, dirs["ledger"], dirs["ckpt"])
    eps = sorted(d for d in os.listdir(dirs["ledger"]) if d.startswith("epoch="))
    # the uncommitted delta survives as its own partition, unfolded
    assert f"epoch={fake_epoch}" in eps
    gen = [d for d in eps if d.startswith("epoch=-")]
    assert gen == [f"epoch=-{w + 1}"]
