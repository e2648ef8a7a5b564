"""corpus-maintain + the crash-safe store-pointer log
(pipeline/stores.py): maintenance rebuilds land in a fresh dir, ONE
appended pointer partition flips serving, corpus-nightly reads through
the pointer, a crash mid-swap leaves the old store serving, and
old-night replays stay no-ops after a shard swap (reshard carries the
completed-night tags)."""

from __future__ import annotations

import os
import shutil

import pytest

# Whole-module slow tier (r15): multi-second Spark e2e tests dominate
# this module's wall; deselected by default so the driver's verify
# window fits — run with -m slow (see COVERAGE.md).
pytestmark = pytest.mark.slow
from radares_spark.cli import (
    cmd_corpus_maintain,
    cmd_corpus_nightly,
    cmd_ivf_retrain,
    cmd_tokenizer_train,
)
from radares_spark.pipeline.stores import (
    flip_stores,
    pointer_history,
    resolve_store,
)
from tests.test_nightly_e2e import _body, _write_pages


def test_pointer_log_resolve_flip_and_refusal(spark, tmp_path):
    root = str(tmp_path / "root")
    # no log yet: canonical fallback
    assert resolve_store(spark, root, "ivf_store") == os.path.join(root, "ivf_store")
    # refuse to point at nothing
    with pytest.raises(ValueError, match="no parquet"):
        flip_stores(spark, root, {"ivf_store": str(tmp_path / "missing")})
    # a real target flips; the latest entry wins; unrelated names
    # keep their canonical fallback
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    spark.createDataFrame([(1,)], ["x"]).write.parquet(a)
    spark.createDataFrame([(2,)], ["x"]).write.parquet(b)
    assert flip_stores(spark, root, {"ivf_store": a}) == 0
    assert resolve_store(spark, root, "ivf_store") == a
    assert resolve_store(spark, root, "shards") == os.path.join(root, "shards")
    # one flip may carry a PAIR (shards + tokenizer move together)
    assert flip_stores(spark, root, {"shards": a, "tokenizer": b}) == 1
    assert resolve_store(spark, root, "shards") == a
    assert resolve_store(spark, root, "tokenizer") == b
    assert flip_stores(spark, root, {"ivf_store": b}) == 2
    assert resolve_store(spark, root, "ivf_store") == b
    assert [i for i, _, _ in pointer_history(spark, root)] == [0, 1, 1, 2]


def test_flip_claim_blocks_second_writer(spark, tmp_path):
    """r10 verdict #2: two concurrent maintenance runs minting the
    same flip idx must fail fast instead of silently dynamic-
    overwriting each other's pointer partition — while a re-run of a
    flip that crashed between its claim and its append (same moves)
    recognizes its own claim and completes."""
    from radares_spark.io import fs as iofs
    from radares_spark.pipeline.stores import _to_logged

    root = str(tmp_path / "root")
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    spark.createDataFrame([(1,)], ["x"]).write.parquet(a)
    spark.createDataFrame([(2,)], ["x"]).write.parquet(b)
    assert flip_stores(spark, root, {"ivf_store": a}) == 0

    # a concurrent writer claimed idx 1 first, for a DIFFERENT swap
    planted = repr(sorted({"shards": _to_logged(root, b)}.items()))
    assert iofs.claim_marker(
        spark, f"{root}/store_pointers/_claim_idx_1", planted
    )
    with pytest.raises(ValueError, match="DIFFERENT swap"):
        flip_stores(spark, root, {"ivf_store": b})
    # serving pointer untouched by the refused flip
    assert resolve_store(spark, root, "ivf_store") == a

    # the claim's own writer (crash-between-claim-and-append replay)
    # completes against its existing claim
    assert flip_stores(spark, root, {"shards": b}) == 1
    assert resolve_store(spark, root, "shards") == b


def test_pointer_log_survives_root_relocation(spark, tmp_path):
    """r10 ADVICE: entries for stores UNDER the root are recorded
    root-relative, so moving/renaming the root keeps every flipped
    store resolving; paths outside the root stay absolute."""
    root = str(tmp_path / "root_v1")
    inside = os.path.join(root, "ivf_store.m0")
    outside = str(tmp_path / "shared_tok")
    spark.createDataFrame([(1,)], ["x"]).write.parquet(inside)
    spark.createDataFrame([(2,)], ["x"]).write.parquet(outside)
    flip_stores(spark, root, {"ivf_store": inside, "tokenizer": outside})
    assert resolve_store(spark, root, "ivf_store") == inside
    # relocate the root wholesale
    root2 = str(tmp_path / "root_v2")
    shutil.move(root, root2)
    assert resolve_store(spark, root2, "ivf_store") == os.path.join(
        root2, "ivf_store.m0"
    )
    assert resolve_store(spark, root2, "tokenizer") == outside
    hist = pointer_history(spark, root2)
    assert (0, "ivf_store", os.path.join(root2, "ivf_store.m0")) in hist


def _run_night(spark, tmp_path, root, night, pages, tag=""):
    src = tmp_path / f"pages_{night}{tag}"
    _write_pages(spark, src, pages)
    return cmd_corpus_nightly(
        spark, str(src), root, night, n_merges=8, ctx_len=16
    )


@pytest.mark.slow
def test_maintain_swap_story_end_to_end(spark, tmp_path):
    A, B, C, D = (_body(t) for t in ("alpha", "beta", "gamma", "delta"))
    root = str(tmp_path / "root")
    _run_night(spark, tmp_path, root, "n1",
               [(1, "https://a.example.com/1", A),
                (2, "https://b.example.com/2", B)])
    c2 = _run_night(spark, tmp_path, root, "n2",
                    [(10, "https://c.example.com/10", C)])
    assert c2["kept"] == 1

    # the nightly refresh persisted its telemetry verdict
    tel_dir = os.path.join(root, "ivf_store", "_telemetry")
    assert os.path.isdir(tel_dir)

    # --- auto mode consumes the sidecar: not due -> no-op -------------
    # (drift/skew legitimately trip at this toy scale, so pin not-due)
    def _plant(due):
        spark.createDataFrame(
            [(0.5, 99.0, due)],
            "drift double, cell_skew double, retrain_due boolean",
        ).repartition(1).write.mode("overwrite").parquet(tel_dir)

    _plant(False)
    counts = cmd_corpus_maintain(spark, root, ivf="auto")
    assert counts == {"ivf_retrain_due": 0, "lease_heartbeat_misses": 0}
    assert resolve_store(spark, root, "ivf_store") == os.path.join(root, "ivf_store")

    # --- retrain_due set (what a drifted/skewed store reports) --------
    _plant(True)
    counts = cmd_corpus_maintain(spark, root, ivf="auto")
    assert counts["ivf_retrain_due"] == 1 and counts["ivf_n_vectors"] > 0
    new_ivf = resolve_store(spark, root, "ivf_store")
    assert new_ivf == os.path.join(root, "ivf_store.m0")
    # old store byte-untouched and still on disk (serving until now)
    assert os.path.isdir(os.path.join(root, "ivf_store"))

    # --- crash mid-swap: a rebuilt store WITHOUT a pointer append
    # changes nothing (the flip is the last, atomic step)
    cmd_ivf_retrain(spark, new_ivf, os.path.join(root, "ivf_store.crashed"))
    assert resolve_store(spark, root, "ivf_store") == new_ivf

    # --- the next night reads THROUGH the pointer: a semantic twin of
    # doc 10 (resident only in the RETRAINED store's corpus) is gated
    C_twin = " ".join(reversed(C.split()))
    c3 = _run_night(spark, tmp_path, root, "n3",
                    [(20, "https://d.example.com/20", C_twin),
                     (21, "https://e.example.com/21", D)])
    assert c3["semantic_dup"] == 1 and c3["kept"] == 1
    # and the refresh applied tonight's delta to the NEW store
    assert 21 in {
        r["vec_id"]
        for r in spark.read.parquet(f"{new_ivf}/_assignment").collect()
    }

    # --- reshard under a NEW tokenizer; shards+tokenizer flip together
    new_tok = str(tmp_path / "tok16")
    cmd_tokenizer_train(
        spark, os.path.join(root, "kept_store"), new_tok, n_merges=16
    )
    counts = cmd_corpus_maintain(
        spark, root, ivf="skip", reshard_tokenizer=new_tok, night="m1"
    )
    new_shards = resolve_store(spark, root, "shards")
    assert new_shards.endswith(".m1")  # one prior pointer row (the ivf flip)
    assert resolve_store(spark, root, "tokenizer") == new_tok
    assert counts["shards_n_sealed"] >= 1
    assert counts["shards_tokenizer_changed"] == 1

    # --- old-night replay after the swap stays a no-op: roll the
    # night log back to its post-n2 state and replay n3 — the
    # resharded store carried the completed-night tags, the crawl
    # preserves its outputs, and every store converges
    want_meta = spark.read.parquet(f"{new_shards}/_meta").head().asDict()
    want_kept = sorted(
        r["doc_id"] for r in spark.read.parquet(f"{root}/kept_store").collect()
    )
    log = f"{root}/night_log"
    saved = str(tmp_path / "log_n2")
    shutil.copytree(log, saved)
    shutil.rmtree(f"{log}/idx=2")
    c3b = _run_night(spark, tmp_path, root, "n3",
                     [(20, "https://d.example.com/20", C_twin),
                      (21, "https://e.example.com/21", D)], tag="_replay")
    assert c3b["shards_already_appended"] == 1
    assert spark.read.parquet(f"{new_shards}/_meta").head().asDict() == want_meta
    assert sorted(
        r["doc_id"] for r in spark.read.parquet(f"{root}/kept_store").collect()
    ) == want_kept

    # --- ledger compaction: per-night epochs fold into epoch=-1,
    # dedup history survives, the audit stays green, and the next
    # night numbers from zero again
    from radares_spark.cli import cmd_nightly_verify

    def _eps(d):
        return sorted(
            int(x.split("=", 1)[1])
            for x in os.listdir(os.path.join(root, d))
            if x.startswith("epoch=")
        )

    assert _eps("url_ledger") == [0, 1, 2]
    counts = cmd_corpus_maintain(spark, root, ivf="skip", compact_ledgers=True)
    assert counts["ledger_epochs_folded"] >= 3
    assert _eps("url_ledger") == [-1]
    assert _eps("content_ledger") == [-1]
    assert cmd_nightly_verify(spark, root)["ok"]
    # compacted history still dedups: re-discovering night-1's URL
    # admits nothing (and appends no new epoch)
    c4 = _run_night(spark, tmp_path, root, "n4",
                    [(1, "https://a.example.com/1", A)])
    assert c4.get("fetched", 0) == 0 and c4["url_dup_ledger"] == 1
    assert _eps("url_ledger") == [-1]
    assert cmd_nightly_verify(spark, root)["ok"]

    # --- shard-store compaction: epoch dirs fold into epoch=-1 in a
    # new store, content-identical (rows, meta, tags, frontier), the
    # verifier passes, the audit stays green, and the next night
    # appends to the compacted store under the carried numbering
    from radares_spark.cli import cmd_shards_verify
    from radares_spark.pipeline.shards import read_shards

    def _shard_rows(store):
        return sorted(
            (r["seq_id"], tuple(r["input_ids"]))
            for r in read_shards(spark, store).collect()
        )

    cur = resolve_store(spark, root, "shards")
    want_rows = _shard_rows(cur)
    want_meta2 = spark.read.parquet(f"{cur}/_meta").head().asDict()
    counts = cmd_corpus_maintain(spark, root, ivf="skip", compact_shards=True)
    assert counts["shards_compact_n_epochs_folded"] >= 1
    compacted = resolve_store(spark, root, "shards")
    assert compacted != cur
    assert _shard_rows(compacted) == want_rows
    assert spark.read.parquet(f"{compacted}/_meta").head().asDict() == want_meta2
    assert [
        d for d in os.listdir(compacted) if d.startswith("epoch=")
    ] == ["epoch=-1"]
    checks = cmd_shards_verify(
        spark, compacted, resolve_store(spark, root, "tokenizer")
    )
    assert checks["ok"], checks
    assert cmd_nightly_verify(spark, root)["ok"]
    # template-disjoint prose (a shared template with one word swapped
    # is itself a near-dup — the r8 test-corpus lesson)
    E = (
        "meanwhile the observatory logbook records wind pressure and "
        "the slow drift of instruments across a cold clear evening " * 5
    ) + "ends here tonight"
    c5 = _run_night(spark, tmp_path, root, "n5",
                    [(50, "https://f.example.com/50", E)])
    assert c5["kept"] == 1
    meta5 = spark.read.parquet(f"{compacted}/_meta").head()
    assert "n5" in list(meta5["nights"])
    assert meta5["next_epoch"] == want_meta2["next_epoch"] + 1

    # --- state-ledger compaction: completed per-night epochs fold
    # into the epoch=-1 base (gated on the night log), the audit stays
    # green, and the NEXT night runs delta-direct against the
    # compacted ledger, appending exactly its own epoch above the base
    assert _eps("state_ledger/features")  # per-night epochs exist
    counts = cmd_corpus_maintain(spark, root, ivf="skip", compact_states=True)
    assert counts["state_compacted_thru"] == 4  # n1..n5 = epochs 0..4
    assert counts["state_epochs_folded"] >= 1
    assert _eps("state_ledger/features") == [-1]
    assert _eps("state_ledger/audit") == [-1]
    assert cmd_nightly_verify(spark, root)["ok"]
    G = (
        "harbor ledgers tally the evening catch while lantern keepers "
        "note the tide tables in a worn canvas journal every night " * 5
    ) + "closing line six"
    c6 = _run_night(spark, tmp_path, root, "n6",
                    [(60, "https://g.example.com/60", G)])
    assert c6["kept"] == 1 and c6["night_index"] == 5
    assert _eps("state_ledger/audit") == [-1, 5]
    assert 60 in {
        r["doc_id"]
        for r in spark.read.parquet(f"{root}/kept_store").collect()
    }
    assert cmd_nightly_verify(spark, root)["ok"]

    # --- night-output pruning: all but the last K completed nights'
    # nights/<tag>/ dirs go; an UN-logged dir (crashed night awaiting
    # replay) is never touched; the audit stays green and the next
    # night still runs
    os.makedirs(os.path.join(root, "nights", "crashed-n7", "kept"))
    counts = cmd_corpus_maintain(spark, root, ivf="skip", prune_nights=2)
    assert counts["nights_pruned"] == 4  # n1..n4 of the 6 completed
    left = sorted(os.listdir(os.path.join(root, "nights")))
    assert left == ["crashed-n7", "n5", "n6"]
    assert cmd_nightly_verify(spark, root)["ok"]
    with pytest.raises(ValueError, match="at least the most recent"):
        cmd_corpus_maintain(spark, root, ivf="skip", prune_nights=0)
    H = (
        "quarry engineers chart the seams of granite and record blast "
        "timings in triplicate for the county inspector every week " * 5
    ) + "line seven ends"
    c7 = _run_night(spark, tmp_path, root, "n7",
                    [(70, "https://h.example.com/70", H)])
    assert c7["kept"] == 1 and c7["night_index"] == 6
