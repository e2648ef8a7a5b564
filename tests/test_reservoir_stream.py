"""Streaming weighted reservoir (streaming/reservoir_stream.py):
incremental fold == batch weighted_sample over everything landed,
cross-epoch carry, crash-replay bit-identity, snapshot pruning."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from radares_spark.io.tables import load_table
from radares_spark.operators.dedup import normalize_text
from radares_spark.pipeline.corpus import weighted_sample
from radares_spark.streaming.reservoir_stream import (
    current_reservoir,
    prune_snapshots,
    run_reservoir_stream,
)
from tests.conftest import SF_SMOKE

K = 25


@pytest.fixture(scope="module")
def dirs(tmp_path_factory):
    root = tmp_path_factory.mktemp("reservoir")
    return {
        "landing": str(root / "landing"),
        "reservoir": str(root / "res"),
        "ckpt": str(root / "ckpt"),
    }


def _docs(spark, lo, hi):
    return (
        load_table(spark, SF_SMOKE, "documents")
        .select("doc_id", "text")
        .filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
    )


def _batch_draw(spark, docs):
    # the reservoir's weight expression: token count, 0 for empty text
    norm = normalize_text(F.coalesce(F.col("text"), F.lit("")))
    w = F.when(norm == "", F.lit(0)).otherwise(F.size(F.split(norm, " ")))
    return sorted(
        tuple(r) for r in weighted_sample(docs, w, K).collect()
    )


def _reservoir(spark, dirs):
    return sorted(
        tuple(r)
        for r in current_reservoir(spark, dirs["reservoir"])
        .select("doc_id", "weight", "sel_rank")
        .collect()
    )


def test_stream_reservoir_matches_batch_draw(spark, dirs):
    _docs(spark, 0, 200).coalesce(1).write.mode("append").parquet(dirs["landing"])
    run_reservoir_stream(
        spark, dirs["landing"], dirs["reservoir"], dirs["ckpt"], K
    )
    assert _reservoir(spark, dirs) == _batch_draw(spark, _docs(spark, 0, 200))

    # second landing folds in: reservoir == batch draw over the UNION
    _docs(spark, 200, 400).coalesce(1).write.mode("append").parquet(
        dirs["landing"]
    )
    run_reservoir_stream(
        spark, dirs["landing"], dirs["reservoir"], dirs["ckpt"], K
    )
    assert _reservoir(spark, dirs) == _batch_draw(spark, _docs(spark, 0, 400))
    # and the fold actually changed the sample (new docs won slots)
    assert _reservoir(spark, dirs) != _batch_draw(spark, _docs(spark, 0, 200))


def test_replay_after_crash_is_idempotent(spark, dirs):
    before = _reservoir(spark, dirs)
    commits_dir = os.path.join(dirs["ckpt"], "commits")
    commits = sorted((f for f in os.listdir(commits_dir) if f.isdigit()), key=int)
    assert len(commits) >= 2
    os.remove(os.path.join(commits_dir, commits[-1]))
    crc = os.path.join(commits_dir, f".{commits[-1]}.crc")
    if os.path.exists(crc):
        os.remove(crc)
    run_reservoir_stream(
        spark, dirs["landing"], dirs["reservoir"], dirs["ckpt"], K
    )
    assert _reservoir(spark, dirs) == before


def test_prune_keeps_newest_snapshots(spark, dirs):
    before = _reservoir(spark, dirs)
    prune_snapshots(spark, dirs["reservoir"], keep=1)
    eps = [d for d in os.listdir(dirs["reservoir"]) if d.startswith("epoch=")]
    assert len(eps) == 1
    assert _reservoir(spark, dirs) == before


def test_changed_text_relanding_keeps_consistent_pair(spark, tmp_path):
    """Review finding: a doc re-landed with CHANGED text must carry a
    self-consistent (weight, e) pair — the best key's own weight, not
    a min-of-each-column hybrid."""
    import pandas as pd
    from pyspark.sql import functions as F

    from radares_spark.streaming.reservoir_stream import (
        current_reservoir,
        run_reservoir_stream,
    )

    d = {
        "landing": str(tmp_path / "landing"),
        "res": str(tmp_path / "res"),
        "ckpt": str(tmp_path / "ckpt"),
    }
    long_text = " ".join(f"w{i}" for i in range(100))
    short_text = " ".join(f"w{i}" for i in range(10))
    spark.createDataFrame(
        pd.DataFrame({"doc_id": [7], "text": [long_text]})
    ).coalesce(1).write.mode("append").parquet(d["landing"])
    run_reservoir_stream(spark, d["landing"], d["res"], d["ckpt"], 5)
    # re-land the same doc id with different (shorter) text
    spark.createDataFrame(
        pd.DataFrame({"doc_id": [7], "text": [short_text]})
    ).coalesce(1).write.mode("append").parquet(d["landing"])
    run_reservoir_stream(spark, d["landing"], d["res"], d["ckpt"], 5)
    row = current_reservoir(spark, d["res"]).collect()[0]
    # e depends on weight: the smaller key belongs to the HEAVIER
    # landing (e = -ln(u)/w decreases in w), so weight must be 100
    assert row["doc_id"] == 7 and row["weight"] == 100.0
