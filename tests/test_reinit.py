"""corpus-reinit (cli.py): the knob-migration path the knobs-meta
fail-fast points at — rebuild the state ledger + serving stores from
the kept residents under NEW curation knobs, flip state_ledger +
ivf_store in one pointer append, and keep the nightly cadence
delta-direct afterwards."""

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

    # the flip landed: state ledger + IVF store serve from .m0 dirs,
    # the new knobs are recorded once at the new ledger's root
    led = resolve_store(spark, root, "state_ledger")
    assert led == os.path.join(root, "state_ledger.m0")
    assert resolve_store(spark, root, "ivf_store") == os.path.join(
        root, "ivf_store.m0"
    )
    row = spark.read.parquet(f"{led}/knobs").head()
    assert row["jaccard_threshold"] == 0.7 and row["max_bucket"] == 8
    # the old ledger is archived, not destroyed
    assert os.path.isdir(os.path.join(root, "state_ledger"))

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
