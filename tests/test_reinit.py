"""corpus-reinit (cli.py): the knob-migration path the knobs-meta
fail-fast points at — rebuild the state ledger + ALL serving stores
from the kept residents under NEW curation knobs into .m<k> candidate
dirs, flip state_ledger + kept_store + postings_store + ivf_store in
ONE pointer append (r11 verdict #1: nothing rebuilt in place), and
keep the nightly cadence delta-direct afterwards."""

from __future__ import annotations

import os

import pytest

from radares_spark.cli import (
    cmd_corpus_nightly,
    cmd_corpus_reinit,
    cmd_nightly_verify,
)
from radares_spark.pipeline.stores import resolve_store
from tests.test_nightly_e2e import _body, _write_pages


@pytest.mark.slow
def test_corpus_reinit_migrates_knobs_end_to_end(spark, tmp_path):
    A, B, C, D = (_body(t) for t in ("alpha", "beta", "gamma", "delta"))
    root = str(tmp_path / "root")
    src1, src2, src3 = tmp_path / "p1", tmp_path / "p2", tmp_path / "p3"
    _write_pages(spark, src1, [(1, "https://a.example.com/1", A),
                               (2, "https://b.example.com/2", B)])
    _write_pages(spark, src2, [(10, "https://c.example.com/10", C)])
    _write_pages(spark, src3, [(20, "https://d.example.com/20", D)])
    cmd_corpus_nightly(spark, str(src1), root, "n1", n_merges=8, ctx_len=16)
    cmd_corpus_nightly(spark, str(src2), root, "n2", n_merges=8)

    # reinit under the CURRENT (default) knobs is a recognized no-op
    with pytest.raises(ValueError, match="no-op"):
        cmd_corpus_reinit(spark, root)

    # a crashed earlier attempt left a completed snapshot: the rerun
    # reuses it (the _SUCCESS-gated crash ladder), then cleans it up
    snap = f"{root}/reinit_snapshot"
    spark.read.parquet(f"{root}/kept_store").select("doc_id", "text").write.parquet(snap)

    counts = cmd_corpus_reinit(
        spark, root, jaccard_threshold=0.7, max_bucket=8
    )
    assert counts["n_residents"] == 3  # docs 1, 2, 10
    assert counts["n_kept_after"] == 3
    assert counts["state_epoch"] == 1  # n_nights - 1
    assert not os.path.exists(snap)

    # the flip landed: ALL FOUR stores serve from .m0 dirs (one
    # pointer append — never observable half-migrated), the new knobs
    # are recorded once at the new ledger's root
    led = resolve_store(spark, root, "state_ledger")
    assert led == os.path.join(root, "state_ledger.m0")
    for store in ("kept_store", "postings_store", "ivf_store"):
        assert resolve_store(spark, root, store) == os.path.join(
            root, f"{store}.m0"
        ), store
    row = spark.read.parquet(f"{led}/knobs").head()
    assert row["jaccard_threshold"] == 0.7 and row["max_bucket"] == 8
    # the old stores are archived, not destroyed
    assert os.path.isdir(os.path.join(root, "state_ledger"))
    assert os.path.isdir(os.path.join(root, "kept_store"))
    assert os.path.isdir(os.path.join(root, "postings_store"))

    checks = cmd_nightly_verify(spark, root)
    assert checks["ok"], checks

    # the next night runs delta-direct under the NEW knobs
    c3 = cmd_corpus_nightly(
        spark, str(src3), root, "n3", n_merges=8,
        jaccard_threshold=0.7, max_bucket=8,
    )
    assert c3["night_index"] == 2 and c3["kept"] == 1
    checks = cmd_nightly_verify(spark, root)
    assert checks["ok"], checks

    # ...and the OLD knobs now fail fast instead of mixing semantics
    src4 = tmp_path / "p4"
    _write_pages(
        spark, src4,
        [(30, "https://e.example.com/30",
          _body("delta", tail="a different closing line"))],
    )
    with pytest.raises(ValueError, match="knobs"):
        cmd_corpus_nightly(spark, str(src4), root, "n4", n_merges=8)


@pytest.mark.slow
def test_corpus_reinit_crash_before_flip_leaves_old_stores_serving(
    spark, tmp_path, monkeypatch
):
    """r11 verdict #1: a crash between the store rebuilds and the flip
    must leave ALL old stores serving (the rebuilds land in .m<k>
    candidates, never in place) with nightly-verify green on the old
    generation; the rerun completes and the flip is observed
    atomically — all four pointers in one idx."""
    from radares_spark.pipeline import stores as stores_mod
    from radares_spark.pipeline.stores import pointer_history

    A, B = _body("alpha"), _body("beta")
    root = str(tmp_path / "root")
    src1 = tmp_path / "p1"
    _write_pages(spark, src1, [(1, "https://a.example.com/1", A),
                               (2, "https://b.example.com/2", B)])
    cmd_corpus_nightly(spark, str(src1), root, "n1", n_merges=8, ctx_len=16)

    real_flip = stores_mod.flip_stores

    def crash(*a, **k):
        raise RuntimeError("planted crash before the flip")

    monkeypatch.setattr(stores_mod, "flip_stores", crash)
    with pytest.raises(RuntimeError, match="planted crash"):
        cmd_corpus_reinit(spark, root, jaccard_threshold=0.7)
    monkeypatch.setattr(stores_mod, "flip_stores", real_flip)

    # every store still serves its OLD generation; the candidates sit
    # unadopted next to them; the root audits green as-is
    for store in ("state_ledger", "kept_store", "postings_store", "ivf_store"):
        assert resolve_store(spark, root, store) == os.path.join(root, store)
        assert os.path.isdir(os.path.join(root, f"{store}.m0")), store
    checks = cmd_nightly_verify(spark, root)
    assert checks["ok"], checks

    # rerun completes (candidate rebuilds overwrite deterministically)
    # and the flip carries all four stores in ONE pointer index
    counts = cmd_corpus_reinit(spark, root, jaccard_threshold=0.7)
    flips = [
        (idx, store)
        for idx, store, _ in pointer_history(spark, root)
        if idx == counts["reinit_flip_idx"]
    ]
    assert {s for _, s in flips} == {
        "state_ledger", "kept_store", "postings_store", "ivf_store"
    }
    for store in ("state_ledger", "kept_store", "postings_store", "ivf_store"):
        assert resolve_store(spark, root, store) == os.path.join(
            root, f"{store}.m0"
        )
    checks = cmd_nightly_verify(spark, root)
    assert checks["ok"], checks
