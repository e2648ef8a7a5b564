"""Train-ready shard store (pipeline/shards.py): BPE token-id
packing verified against an independent pure-Python replica (the
iterative-algorithm tier — token ids are not SQL-expressible), plus
the lifecycle pins: three-night append == replica, full/contiguous
sealed sequences, history never read or rewritten, crash-rerun
byte-equivalence, tokenizer-change fail-fast, empty-night no-op."""

from __future__ import annotations

import hashlib
import shutil

import pytest

# Whole-module slow tier (r15): multi-second Spark e2e tests dominate
# this module's wall; deselected by default so the driver's verify
# window fits — run with -m slow (see COVERAGE.md).
pytestmark = pytest.mark.slow

from pyspark.sql import functions as F

from radares_spark.operators.bpe import EOW, train_bpe, word_counts
from radares_spark.pipeline.shards import (
    SHARD_CTX,
    UNK_ID,
    append_shards,
    encode_ids,
    init_shards,
    read_shards,
    token_vocab,
)
from tests.test_bpe import (
    _ref_apply_bpe,
    _ref_normalize,
    _ref_syms,
    _ref_train,
    _ref_word_counts,
)

CTX = 16

TRAIN = [
    "low lower lowest low low",
    "new newer newest new newer",
    "the new low price the low price",
    "wider wide widest wider",
]

NIGHTS = [
    [(10, "low lower the new price"), (11, "newest wide lowest"), (12, None)],
    [
        (20, "an unseen word zzz9 rides the oov path " * 3),
        (21, "low " * 40),  # spans multiple ctx=16 sequences on its own
        (22, ""),
    ],
    [(30, "price price price wider"), (31, "the the the the")],
]


# --- independent replica -------------------------------------------------


def _ref_vocab(table: dict, merges: list) -> dict[str, int]:
    syms = {s for ss in table.values() for s in ss}
    syms |= {s for l, r in merges for s in (l, r, l + r)}
    return {s: i + 1 for i, s in enumerate(sorted(syms))}


def _ref_encode(text, table: dict, merges: list, vocab: dict) -> list[int]:
    out: list[int] = []
    norm = _ref_normalize(text or "")
    if not norm:
        return out
    for w in norm.split(" "):
        syms = table[w] if w in table else _ref_apply_bpe(w, merges)
        out.extend(vocab.get(s, UNK_ID) for s in syms)
    return out


def _ref_bucket(doc_id: int) -> int:
    return int(hashlib.md5(str(doc_id).encode()).hexdigest()[:8], 16) % 1024


def _ref_pack(nights, ctx, table, merges, vocab):
    """Returns (sealed, frontier_toks): sealed = list per epoch of
    (seq_id, input_ids, doc_spans) with doc_spans [(doc_id, begin,
    n)]; the token stream is per-night (md5-bucket, doc_id) order."""
    toks: list[int] = []
    owner: list[int] = []
    sealed_per_epoch = []
    prior_sealed = 0
    for night in nights:
        for doc_id, text in sorted(
            night, key=lambda d: (_ref_bucket(d[0]), d[0])
        ):
            ids = _ref_encode(text, table, merges, vocab)
            toks.extend(ids)
            owner.extend([doc_id] * len(ids))
        hi = len(toks) // ctx
        epoch_rows = []
        for k in range(prior_sealed, hi):
            ids = toks[k * ctx : (k + 1) * ctx]
            own = owner[k * ctx : (k + 1) * ctx]
            spans = []
            i = 0
            while i < ctx:
                j = i
                while j < ctx and own[j] == own[i]:
                    j += 1
                spans.append((own[i], i, j - i))
                i = j
            epoch_rows.append((k, ids, spans))
        sealed_per_epoch.append(epoch_rows)
        prior_sealed = hi
    return sealed_per_epoch, toks[prior_sealed * ctx :]


# --- fixtures ------------------------------------------------------------


@pytest.fixture(scope="module")
def tokenizer(spark):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TRAIN)], ["doc_id", "text"]
    )
    merges, word_syms = train_bpe(word_counts(docs), n_merges=12)
    return word_syms.localCheckpoint(), merges


@pytest.fixture(scope="module")
def replica(tokenizer):
    merges_ref, table_ref = _ref_train(_ref_word_counts(TRAIN), 12)
    _, merges = tokenizer
    assert merges_ref == merges  # replica and engine agree on training
    vocab = _ref_vocab(table_ref, merges_ref)
    return table_ref, merges_ref, vocab


def _night_df(spark, night):
    return spark.createDataFrame(night, "doc_id long, text string")


def _run_nights(spark, tmp_path, tokenizer, n_nights=3):
    word_syms, merges = tokenizer
    store = str(tmp_path / "shards")
    init_shards(spark, store, token_vocab(word_syms, merges), ctx_len=CTX)
    stats = [
        append_shards(spark, store, _night_df(spark, night), word_syms, merges)
        for night in NIGHTS[:n_nights]
    ]
    return store, stats


# --- tests ---------------------------------------------------------------


def test_encode_ids_matches_replica(spark, tokenizer, replica):
    word_syms, merges = tokenizer
    table, merges_ref, vocab = replica
    all_docs = [d for night in NIGHTS for d in night]
    got = {
        r["doc_id"]: list(r["input_ids"])
        for r in encode_ids(
            _night_df(spark, all_docs), word_syms, merges
        ).collect()
    }
    assert set(got) == {d[0] for d in all_docs}  # spine: empty docs stay
    for doc_id, text in all_docs:
        assert got[doc_id] == _ref_encode(text, table, merges_ref, vocab), doc_id


def test_vocab_ids_deterministic_and_unk_reserved(spark, tokenizer, replica):
    word_syms, merges = tokenizer
    _, _, ref_vocab = replica
    got = {r["sym"]: r["tok_id"] for r in token_vocab(word_syms, merges).collect()}
    assert got == ref_vocab
    assert UNK_ID not in got.values()


def test_unseen_symbol_encodes_as_unk(spark, tokenizer):
    word_syms, merges = tokenizer
    # TRAIN has no digit words: a digit-only OOV word yields char
    # symbols outside the trained vocabulary -> UNK ids
    out = encode_ids(
        _night_df(spark, [(1, "777")]), word_syms, merges
    ).collect()[0]
    assert UNK_ID in set(out["input_ids"])


@pytest.mark.slow  # >=10 s in the r15 full-suite durations log
def test_three_night_append_matches_replica(spark, tmp_path, tokenizer, replica):
    table, merges_ref, vocab = replica
    store, stats = _run_nights(spark, tmp_path, tokenizer)
    ref_sealed, ref_frontier = _ref_pack(NIGHTS, CTX, table, merges_ref, vocab)

    rows = read_shards(spark, store).collect()
    got = {
        r["seq_id"]: (
            list(r["input_ids"]),
            [(s["doc_id"], s["begin"], s["n"]) for s in r["doc_spans"]],
            r["epoch"],
            r["n_docs"],
        )
        for r in rows
    }
    want = {
        k: (ids, spans, epoch, len(spans))
        for epoch, epoch_rows in enumerate(ref_sealed)
        for (k, ids, spans) in epoch_rows
    }
    assert got == want
    # frontier tokens in (off, doc) order == replica tail
    fr = sorted(
        spark.read.parquet(f"{store}/_frontier_2").collect(),
        key=lambda r: r["off"],
    )
    assert [t for r in fr for t in r["input_ids"]] == ref_frontier
    # stats recompose: sealed counts per night
    assert [s["n_sealed"] for s in stats] == [len(e) for e in ref_sealed]
    total = sum(len(_ref_encode(t, table, merges_ref, vocab)) for n in NIGHTS for _, t in n)
    assert stats[-1]["n_total_tokens"] == total


@pytest.mark.slow  # >=10 s in the r15 full-suite durations log
def test_sealed_sequences_full_and_contiguous(spark, tmp_path, tokenizer):
    store, _ = _run_nights(spark, tmp_path, tokenizer)
    rows = read_shards(spark, store).collect()
    seq_ids = sorted(r["seq_id"] for r in rows)
    assert seq_ids == list(range(len(rows)))
    for r in rows:
        assert len(r["input_ids"]) == CTX
        assert sum(s["n"] for s in r["doc_spans"]) == CTX
        # spans tile the sequence in order
        pos = 0
        for s in r["doc_spans"]:
            assert s["begin"] == pos
            pos += s["n"]


@pytest.mark.slow  # >=10 s in the r15 full-suite durations log
def test_append_never_reads_or_rewrites_history(spark, tmp_path, tokenizer):
    import os

    word_syms, merges = tokenizer
    store, _ = _run_nights(spark, tmp_path, tokenizer, n_nights=1)
    epoch0 = f"{store}/epoch=0"
    before = {
        f: os.stat(f"{epoch0}/{f}").st_mtime_ns for f in os.listdir(epoch0)
    }
    # a COPY with night 1's sealed partition deleted outright: night 2
    # must still succeed -- the append provably never reads history
    crippled = str(tmp_path / "crippled")
    shutil.copytree(store, crippled)
    shutil.rmtree(f"{crippled}/epoch=0")
    out = append_shards(
        spark, crippled, _night_df(spark, NIGHTS[1]), word_syms, merges
    )
    assert out["epoch"] == 1 and out["n_sealed"] > 0

    append_shards(spark, store, _night_df(spark, NIGHTS[1]), word_syms, merges)
    after = {
        f: os.stat(f"{epoch0}/{f}").st_mtime_ns for f in os.listdir(epoch0)
    }
    assert after == before  # untouched partition byte-for-byte intact


@pytest.mark.slow  # >=10 s in the r15 full-suite durations log
def test_crash_rerun_is_byte_equivalent(spark, tmp_path, tokenizer):
    word_syms, merges = tokenizer
    store, _ = _run_nights(spark, tmp_path, tokenizer, n_nights=1)
    # snapshot the inputs night 2 reads (meta + frontier 0)
    saved = str(tmp_path / "saved")
    shutil.copytree(f"{store}/_meta", f"{saved}/_meta")
    shutil.copytree(f"{store}/_frontier_0", f"{saved}/_frontier_0")
    append_shards(spark, store, _night_df(spark, NIGHTS[1]), word_syms, merges)
    first = sorted(
        (r["seq_id"], list(r["input_ids"]))
        for r in spark.read.parquet(f"{store}/epoch=1").collect()
    )
    meta_first = spark.read.parquet(f"{store}/_meta").head().asDict()
    # crash anywhere before the meta write => rerun sees the old
    # meta/frontier and must reproduce the night exactly
    shutil.rmtree(f"{store}/_meta")
    shutil.copytree(f"{saved}/_meta", f"{store}/_meta")
    shutil.copytree(f"{saved}/_frontier_0", f"{store}/_frontier_0")
    append_shards(spark, store, _night_df(spark, NIGHTS[1]), word_syms, merges)
    second = sorted(
        (r["seq_id"], list(r["input_ids"]))
        for r in spark.read.parquet(f"{store}/epoch=1").collect()
    )
    assert second == first
    assert spark.read.parquet(f"{store}/_meta").head().asDict() == meta_first


def test_tokenizer_change_fails_fast(spark, tmp_path, tokenizer):
    word_syms, merges = tokenizer
    store, _ = _run_nights(spark, tmp_path, tokenizer, n_nights=1)
    with pytest.raises(ValueError, match="tokenizer changed"):
        append_shards(
            spark,
            store,
            _night_df(spark, NIGHTS[1]),
            word_syms,
            merges[:-2],  # a different (shorter) merge list
        )


def test_empty_night_is_a_numbered_noop(spark, tmp_path, tokenizer):
    word_syms, merges = tokenizer
    store, _ = _run_nights(spark, tmp_path, tokenizer, n_nights=1)
    fr_before = sorted(
        (r["doc_id"], list(r["input_ids"]), r["off"])
        for r in spark.read.parquet(f"{store}/_frontier_0").collect()
    )
    out = append_shards(
        spark,
        store,
        _night_df(spark, []).filter(F.lit(False)),
        word_syms,
        merges,
    )
    assert out["n_sealed"] == 0 and out["n_delta_tokens"] == 0
    meta = spark.read.parquet(f"{store}/_meta").head()
    assert meta["next_epoch"] == 2
    fr_after = sorted(
        (r["doc_id"], list(r["input_ids"]), r["off"])
        for r in spark.read.parquet(f"{store}/_frontier_1").collect()
    )
    assert fr_after == fr_before


def test_completed_night_rerun_is_a_recognized_noop(spark, tmp_path, tokenizer):
    import os

    word_syms, merges = tokenizer
    store = str(tmp_path / "shards")
    init_shards(spark, store, token_vocab(word_syms, merges), ctx_len=CTX)
    first = append_shards(
        spark, store, _night_df(spark, NIGHTS[0]), word_syms, merges, night="n0"
    )
    assert "already_appended" not in first
    epoch0 = f"{store}/epoch=0"
    before = {
        f: os.stat(f"{epoch0}/{f}").st_mtime_ns for f in os.listdir(epoch0)
    }
    meta_before = spark.read.parquet(f"{store}/_meta").head().asDict()
    again = append_shards(
        spark, store, _night_df(spark, NIGHTS[0]), word_syms, merges, night="n0"
    )
    assert again["already_appended"] == 1 and again["n_sealed"] == 0
    assert again["epoch"] == first["epoch"]
    assert again["n_total_tokens"] == first["n_total_tokens"]
    after = {
        f: os.stat(f"{epoch0}/{f}").st_mtime_ns for f in os.listdir(epoch0)
    }
    assert after == before
    assert spark.read.parquet(f"{store}/_meta").head().asDict() == meta_before
    # a DIFFERENT night proceeds normally
    nxt = append_shards(
        spark, store, _night_df(spark, NIGHTS[1]), word_syms, merges, night="n1"
    )
    assert "already_appended" not in nxt and nxt["epoch"] == 1


@pytest.mark.slow  # >=10 s in the r15 full-suite durations log
def test_older_completed_night_rerun_is_a_noop(spark, tmp_path, tokenizer):
    """The tag guard covers EVERY completed night, not just the most
    recent: re-running night n0 after n1 has completed must no-op
    (the last-tag-only form silently double-appended n0's tokens)."""
    word_syms, merges = tokenizer
    store = str(tmp_path / "shards")
    init_shards(spark, store, token_vocab(word_syms, merges), ctx_len=CTX)
    append_shards(
        spark, store, _night_df(spark, NIGHTS[0]), word_syms, merges, night="n0"
    )
    second = append_shards(
        spark, store, _night_df(spark, NIGHTS[1]), word_syms, merges, night="n1"
    )
    meta_before = spark.read.parquet(f"{store}/_meta").head().asDict()
    again = append_shards(
        spark, store, _night_df(spark, NIGHTS[0]), word_syms, merges, night="n0"
    )
    assert again["already_appended"] == 1 and again["n_sealed"] == 0
    assert again["n_total_tokens"] == second["n_total_tokens"]
    assert spark.read.parquet(f"{store}/_meta").head().asDict() == meta_before
    # and an unseen tag still proceeds
    nxt = append_shards(
        spark, store, _night_df(spark, NIGHTS[2]), word_syms, merges, night="n2"
    )
    assert "already_appended" not in nxt and nxt["epoch"] == 2


def _tree_mtimes(root: str) -> dict:
    import os

    out = {}
    for dirpath, _dirs, files in os.walk(root):
        for f in files:
            p = os.path.join(dirpath, f)
            out[p] = os.stat(p).st_mtime_ns
    return out


@pytest.mark.slow  # >=10 s in the r15 full-suite durations log
def test_reshard_on_tokenizer_bump(spark, tmp_path, tokenizer):
    """The documented remedy for the vocab fail-fast (r8 verdict #1):
    rebuild the store from the kept corpus under the BUMPED tokenizer
    into a NEW dir — replica-checked against from-scratch packing —
    while the serving store stays byte-untouched until swap, and
    nightly appends resume on the new store under the new tokenizer."""
    from radares_spark.pipeline.shards import reshard_shards

    word_syms, merges = tokenizer
    store, _ = _run_nights(spark, tmp_path, tokenizer, n_nights=2)
    kept = [d for night in NIGHTS[:2] for d in night]
    kept_df = _night_df(spark, kept)

    # the bumped tokenizer: 4 merges instead of 12 => new fingerprint
    docs_train = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TRAIN)], ["doc_id", "text"]
    )
    merges2, word_syms2 = train_bpe(word_counts(docs_train), n_merges=4)
    word_syms2 = word_syms2.localCheckpoint()
    # (sanity: the bump really fail-fasts on the serving store)
    with pytest.raises(ValueError, match="tokenizer changed"):
        append_shards(spark, store, kept_df, word_syms2, merges2)

    before = _tree_mtimes(store)
    out = str(tmp_path / "resharded")
    stats = reshard_shards(
        spark, store, out, kept_df, word_syms2, merges2, night="reshard-0"
    )
    assert stats["tokenizer_changed"] == 1
    assert stats["new_vocab_fp"] != stats["old_vocab_fp"]
    assert _tree_mtimes(store) == before  # serving store untouched

    # the new store == the pure replica packing the SAME corpus from
    # scratch under the new tokenizer (ctx carried from the old store)
    merges2_ref, table2_ref = _ref_train(_ref_word_counts(TRAIN), 4)
    assert merges2_ref == merges2
    vocab2 = _ref_vocab(table2_ref, merges2_ref)
    ref_sealed, _ref_tail = _ref_pack(
        [kept], CTX, table2_ref, merges2_ref, vocab2
    )
    got = {
        r["seq_id"]: (
            list(r["input_ids"]),
            [(s["doc_id"], s["begin"], s["n"]) for s in r["doc_spans"]],
        )
        for r in read_shards(spark, out).collect()
    }
    want = {k: (ids, spans) for (k, ids, spans) in ref_sealed[0]}
    assert got == want

    # lifecycle resumes: the rebuild night no-ops on re-run, the next
    # night appends under the NEW tokenizer
    again = append_shards(
        spark, out, kept_df, word_syms2, merges2, night="reshard-0"
    )
    assert again["already_appended"] == 1
    nxt = append_shards(
        spark, out, _night_df(spark, NIGHTS[2]), word_syms2, merges2, night="n2"
    )
    assert "already_appended" not in nxt and nxt["epoch"] == 1

    with pytest.raises(ValueError, match="must differ"):
        reshard_shards(spark, store, store, kept_df, word_syms2, merges2)


def test_export_empty_store_returns_zeros(spark, tmp_path, tokenizer):
    from radares_spark.pipeline.shards import export_training_shards

    word_syms, merges = tokenizer
    store = str(tmp_path / "virgin")
    init_shards(spark, store, token_vocab(word_syms, merges), ctx_len=CTX)
    stats = export_training_shards(
        spark, store, str(tmp_path / "epoch0"), seed=7, n_shards=4
    )
    assert stats == {"n_sequences": 0, "n_shards_written": 0}


def test_save_load_tokenizer_roundtrip(spark, tmp_path, tokenizer):
    from radares_spark.operators.bpe import load_tokenizer, save_tokenizer

    word_syms, merges = tokenizer
    save_tokenizer(spark, str(tmp_path / "tok"), word_syms, merges)
    ws2, merges2 = load_tokenizer(spark, str(tmp_path / "tok"))
    assert merges2 == merges  # ORDER preserved — the tokenizer identity
    want = {r["word"]: list(r["syms"]) for r in word_syms.collect()}
    got = {r["word"]: list(r["syms"]) for r in ws2.collect()}
    assert got == want
    # the loaded artifact drives the same vocabulary => same fingerprint
    from radares_spark.pipeline.shards import vocab_fingerprint

    assert vocab_fingerprint(token_vocab(ws2, merges2)) == vocab_fingerprint(
        token_vocab(word_syms, merges)
    )


def test_read_shards_empty_store(spark, tmp_path, tokenizer):
    word_syms, merges = tokenizer
    store = str(tmp_path / "virgin")
    init_shards(spark, store, token_vocab(word_syms, merges), ctx_len=CTX)
    df = read_shards(spark, store)
    assert df.count() == 0
    assert "input_ids" in df.columns and "doc_spans" in df.columns


def test_pack_ids_equals_append_path(spark, tmp_path, tokenizer, replica):
    """The pure packing plan == the store's sealed rows plus the
    partial tail, on a single-night corpus."""
    from radares_spark.pipeline.shards import encode_ids, pack_ids

    word_syms, merges = tokenizer
    store, _ = _run_nights(spark, tmp_path, tokenizer, n_nights=1)
    sealed = {
        (r["seq_id"], tuple(r["input_ids"]))
        for r in read_shards(spark, store).collect()
    }
    packed = pack_ids(
        encode_ids(_night_df(spark, NIGHTS[0]), word_syms, merges), ctx_len=CTX
    ).collect()
    full = {
        (r["seq_id"], tuple(r["input_ids"]))
        for r in packed
        if len(r["input_ids"]) == CTX
    }
    assert full == sealed
    # exactly one partial row beyond the sealed set (this night's
    # token count is not ctx-aligned), matching the frontier tokens
    partial = [r for r in packed if len(r["input_ids"]) < CTX]
    fr = sorted(
        spark.read.parquet(f"{store}/_frontier_0").collect(),
        key=lambda r: r["off"],
    )
    assert len(partial) == 1
    assert list(partial[0]["input_ids"]) == [
        t for r in fr for t in r["input_ids"]
    ]


@pytest.mark.slow  # >=10 s in the r15 full-suite durations log
def test_training_order_replica_and_determinism(spark, tmp_path, tokenizer):
    import hashlib as _hl

    from radares_spark.pipeline.shards import training_order

    store, _ = _run_nights(spark, tmp_path, tokenizer)
    sealed = read_shards(spark, store)
    n_shards = 8

    def key(seed, sid):
        return _hl.md5(f"{seed}:{sid}".encode()).hexdigest()

    got = {
        r["seq_id"]: (r["shard"], r["pos"])
        for r in training_order(sealed, seed=42, n_shards=n_shards).collect()
    }
    seq_ids = sorted(got)
    # independent replica: bucket by md5 prefix, rank within shard
    want: dict[int, tuple[int, int]] = {}
    by_shard: dict[int, list] = {}
    for sid in seq_ids:
        k = key(42, sid)
        by_shard.setdefault(int(k[:8], 16) % n_shards, []).append((k, sid))
    for sh, rows in by_shard.items():
        for pos, (_, sid) in enumerate(sorted(rows), start=1):
            want[sid] = (sh, pos)
    assert got == want
    # a permutation: pos contiguous from 1 within each shard
    for sh, rows in by_shard.items():
        assert sorted(p for s, p in got.values() if s == sh) == list(
            range(1, len(rows) + 1)
        )
    # partitioning-independent: same order after an adversarial reshuffle
    re = {
        r["seq_id"]: (r["shard"], r["pos"])
        for r in training_order(
            sealed.repartition(7), seed=42, n_shards=n_shards
        ).collect()
    }
    assert re == got
    # seed changes the order
    other = {
        r["seq_id"]: (r["shard"], r["pos"])
        for r in training_order(sealed, seed=43, n_shards=n_shards).collect()
    }
    assert other != got


@pytest.mark.slow  # >=10 s in the r15 full-suite durations log
def test_export_training_shards_one_ordered_file_per_shard(
    spark, tmp_path, tokenizer
):
    """The epoch export contract: every sealed sequence exactly once;
    one parquet file per shard dir; FILE ROW ORDER == training order
    (read with no sort — the trainer streams bytes)."""
    import glob
    import os

    import pyarrow.parquet as pq

    from radares_spark.pipeline.shards import (
        export_training_shards,
        training_order,
    )

    store, _ = _run_nights(spark, tmp_path, tokenizer)
    out = str(tmp_path / "epoch42")
    n_shards = 4
    stats = export_training_shards(spark, store, out, seed=42, n_shards=n_shards)
    sealed_ids = {r["seq_id"] for r in read_shards(spark, store).collect()}
    assert stats["n_sequences"] == len(sealed_ids)

    want = {
        r["seq_id"]: (r["shard"], r["pos"])
        for r in training_order(
            read_shards(spark, store), seed=42, n_shards=n_shards
        ).collect()
    }
    seen: set[int] = set()
    for d in sorted(glob.glob(f"{out}/shard=*")):
        shard = int(os.path.basename(d).split("=")[1])
        files = [f for f in glob.glob(f"{d}/*.parquet")]
        assert len(files) == 1, f"shard {shard} must be exactly one file"
        tbl = pq.read_table(files[0], columns=["seq_id", "pos"])
        rows = list(zip(tbl["seq_id"].to_pylist(), tbl["pos"].to_pylist()))
        # physical row order IS the training order
        assert [p for _, p in rows] == list(range(1, len(rows) + 1))
        for sid, pos in rows:
            assert want[sid] == (shard, pos)
            seen.add(sid)
    assert seen == sealed_ids
    assert stats["n_shards_written"] == len(
        {s for s, _ in want.values()}
    )


@pytest.mark.slow  # >=10 s in the r15 full-suite durations log
def test_shards_health_report(spark, tmp_path, tokenizer, replica, capsys):
    from radares_spark.cli import main
    from radares_spark.pipeline.shards import shards_health

    table, merges_ref, vocab = replica
    store, stats = _run_nights(spark, tmp_path, tokenizer)
    h = shards_health(spark, store)
    total = sum(
        len(_ref_encode(t, table, merges_ref, vocab)) for n in NIGHTS for _, t in n
    )
    assert h["ctx_len"] == CTX
    assert h["next_epoch"] == 3
    assert h["next_token_offset"] == total
    assert h["n_sequences"] == total // CTX
    assert h["n_sealed_tokens"] == (total // CTX) * CTX
    assert h["n_bad_len"] == 0 and h["n_bad_manifest"] == 0
    assert h["n_epochs"] == sum(1 for s in stats if s["n_sealed"])
    # CLI face
    assert main(["shards-stats", "--shards", store]) == 0
    printed = capsys.readouterr().out
    assert f"n_sequences: {total // CTX}" in printed
    assert "n_bad_len: 0" in printed


def test_shards_health_empty_store(spark, tmp_path, tokenizer):
    from radares_spark.pipeline.shards import shards_health

    word_syms, merges = tokenizer
    store = str(tmp_path / "virgin")
    init_shards(spark, store, token_vocab(word_syms, merges), ctx_len=CTX)
    h = shards_health(spark, store)
    assert h["n_sequences"] == 0 and h["n_sealed_tokens"] == 0
    assert h["next_epoch"] == 0 and h["n_bad_len"] == 0


def test_default_ctx_is_sane():
    assert SHARD_CTX == 256


@pytest.mark.slow  # >=10 s in the r15 full-suite durations log
def test_shards_reshard_cli_face(spark, tmp_path, tokenizer, capsys):
    from radares_spark.cli import main
    from radares_spark.operators.bpe import save_tokenizer
    from radares_spark.pipeline.shards import read_shards

    store, _ = _run_nights(spark, tmp_path, tokenizer, n_nights=2)
    kept = str(tmp_path / "kept_docs")
    _night_df(spark, [d for n in NIGHTS[:2] for d in n]).write.parquet(kept)
    docs_train = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TRAIN)], ["doc_id", "text"]
    )
    merges2, word_syms2 = train_bpe(word_counts(docs_train), n_merges=4)
    tok2 = str(tmp_path / "tok2")
    save_tokenizer(spark, tok2, word_syms2.localCheckpoint(), merges2)
    out = str(tmp_path / "new_store")
    rc = main(
        [
            "shards-reshard", "--docs", kept, "--tokenizer", tok2,
            "--shards", store, "--out", out, "--night", "reshard-0",
        ]
    )
    assert rc == 0
    printed = capsys.readouterr().out
    assert "tokenizer_changed: 1" in printed
    assert read_shards(spark, out).count() > 0


@pytest.mark.slow  # >=10 s in the r15 full-suite durations log
def test_shards_verify_detects_planted_corruption(
    spark, tmp_path, tokenizer, capsys
):
    """r8 verdict #7: shards-export trusted the store. shards_verify
    recomputes the invariants from the parquet itself — a healthy
    store passes every check (and the vocab seal against the frozen
    tokenizer artifact); a store with a deleted epoch, a truncated
    sealed row, or a swapped tokenizer each trip their own flag."""
    import os

    from radares_spark.cli import main
    from radares_spark.operators.bpe import save_tokenizer
    from radares_spark.pipeline.shards import shards_verify

    word_syms, merges = tokenizer
    store, _ = _run_nights(spark, tmp_path, tokenizer, n_nights=2)
    tok = str(tmp_path / "tok")
    save_tokenizer(spark, tok, word_syms, merges)

    healthy = shards_verify(spark, store, tok)
    assert healthy["ok"] and healthy["vocab_ok"] is True, healthy
    assert healthy["n_sequences"] > 0
    rc = main(["shards-verify", "--shards", store, "--tokenizer", tok])
    assert rc == 0
    assert "ok: True" in capsys.readouterr().out

    # corruption 1: an epoch partition vanishes -> seq_id gap
    gone = str(tmp_path / "gone_epoch")
    shutil.copytree(store, gone)
    shutil.rmtree(f"{gone}/epoch=0")
    bad = shards_verify(spark, gone)
    assert not bad["ok"] and not bad["sealed_ok"], bad
    assert bad["len_ok"] and bad["manifest_ok"]  # surviving rows intact
    assert main(["shards-verify", "--shards", gone]) == 1

    # corruption 2: a sealed row loses tokens -> len + manifest trip
    trunc = str(tmp_path / "truncated")
    shutil.copytree(store, trunc)
    rows = spark.read.parquet(f"{trunc}/epoch=0")
    mangled = rows.withColumn(
        "input_ids", F.slice("input_ids", 1, CTX - 3)
    ).localCheckpoint()
    for f in os.listdir(f"{trunc}/epoch=0"):
        os.remove(f"{trunc}/epoch=0/{f}")
    mangled.write.mode("overwrite").parquet(f"{trunc}/epoch=0")
    bad2 = shards_verify(spark, trunc)
    assert not bad2["ok"] and not bad2["len_ok"] and not bad2["manifest_ok"], bad2

    # corruption 3: the tokenizer artifact was swapped under the store
    docs_train = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TRAIN)], ["doc_id", "text"]
    )
    merges2, word_syms2 = train_bpe(word_counts(docs_train), n_merges=4)
    tok2 = str(tmp_path / "tok_swapped")
    save_tokenizer(spark, tok2, word_syms2.localCheckpoint(), merges2)
    bad3 = shards_verify(spark, store, tok2)
    assert not bad3["ok"] and bad3["vocab_ok"] is False, bad3
    assert bad3["sealed_ok"]  # the data itself is untouched

    # the export-fused gate: --verify refuses a corrupt store, exports
    # a healthy one
    with pytest.raises(ValueError, match="refusing to export"):
        main(["shards-export", "--shards", gone, "--out",
              str(tmp_path / "ep_bad"), "--seed", "1", "--n-shards", "2",
              "--verify"])
    assert main(["shards-export", "--shards", store, "--out",
                 str(tmp_path / "ep_ok"), "--seed", "1", "--n-shards", "2",
                 "--verify", "--tokenizer", tok]) == 0
    capsys.readouterr()


@pytest.mark.slow  # >=10 s in the r15 full-suite durations log
def test_reshard_carries_completed_night_tags(spark, tmp_path, tokenizer):
    """Review find: the resharded store contains every logged night's
    docs (they ARE the kept corpus), so replaying an old completed
    night against the NEW store must stay a recognized no-op — the
    rebuild-tag-only seed made it double-append."""
    word_syms, merges = tokenizer
    store = str(tmp_path / "shards")
    init_shards(spark, store, token_vocab(word_syms, merges), ctx_len=CTX)
    append_shards(
        spark, store, _night_df(spark, NIGHTS[0]), word_syms, merges, night="n1"
    )
    append_shards(
        spark, store, _night_df(spark, NIGHTS[1]), word_syms, merges, night="n2"
    )
    kept_df = _night_df(spark, [d for n in NIGHTS[:2] for d in n])
    docs_train = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TRAIN)], ["doc_id", "text"]
    )
    merges2, word_syms2 = train_bpe(word_counts(docs_train), n_merges=4)
    word_syms2 = word_syms2.localCheckpoint()
    from radares_spark.pipeline.shards import reshard_shards

    out = str(tmp_path / "resharded")
    reshard_shards(
        spark, store, out, kept_df, word_syms2, merges2, night="rebuild"
    )
    total = spark.read.parquet(f"{out}/_meta").head()["next_token_offset"]
    # both OLD night tags are carried: replays no-op on the new store
    for old_night in ("n1", "n2", "rebuild"):
        again = append_shards(
            spark, out, _night_df(spark, NIGHTS[0]), word_syms2, merges2,
            night=old_night,
        )
        assert again["already_appended"] == 1, old_night
        assert again["n_total_tokens"] == total
    # a genuinely new night proceeds
    nxt = append_shards(
        spark, out, _night_df(spark, NIGHTS[2]), word_syms2, merges2,
        night="n3",
    )
    assert "already_appended" not in nxt


@pytest.mark.slow  # >=10 s in the r15 full-suite durations log
def test_budgeted_export_is_training_order_prefix(spark, tmp_path, tokenizer):
    """--max-tokens exports exactly the first ceil(N/ctx) sequences of
    the seed's training order — the deterministic shuffled subsample a
    token-budgeted epoch wants — computed as a prefix over per-shard
    counts, never a corpus sort."""
    from radares_spark.pipeline.shards import (
        export_training_shards,
        training_order,
    )

    store, _ = _run_nights(spark, tmp_path, tokenizer)
    sealed = read_shards(spark, store)
    full_order = sorted(
        ((r["shard"], r["pos"]), r["seq_id"])
        for r in training_order(sealed, seed=9, n_shards=4).collect()
    )
    total = len(full_order)
    assert total >= 4
    budget_seqs = total // 2
    out = str(tmp_path / "half_epoch")
    stats = export_training_shards(
        spark, store, out, seed=9, n_shards=4,
        max_tokens=budget_seqs * CTX - 3,  # partial last seq rounds UP
    )
    assert stats["n_sequences"] == budget_seqs
    got = {r["seq_id"] for r in spark.read.parquet(out).collect()}
    want = {sid for _, sid in full_order[:budget_seqs]}
    assert got == want
    # over-budget degrades to the full epoch; zero budget exports none
    out2 = str(tmp_path / "all")
    s2 = export_training_shards(
        spark, store, out2, seed=9, n_shards=4, max_tokens=10**9
    )
    assert s2["n_sequences"] == total
    s3 = export_training_shards(
        spark, store, str(tmp_path / "none"), seed=9, n_shards=4, max_tokens=0
    )
    assert s3 == {"n_sequences": 0, "n_shards_written": 0}


@pytest.mark.slow  # >=10 s in the r15 full-suite durations log
def test_compact_shards_files_hold_contiguous_seq_spans(
    spark, tmp_path, tokenizer, monkeypatch
):
    """r10 advice: compaction range-partitions on seq_id, so each
    compacted file holds a CONTIGUOUS, non-overlapping span of the
    training order (a sequential trainer reads files in order instead
    of hopping) — content identity is pinned by the maintain e2e; this
    pins the file layout with the per-file budget forced tiny."""
    import glob
    import os

    from radares_spark.pipeline import shards as shards_mod
    from radares_spark.pipeline.shards import compact_shards

    store, _ = _run_nights(spark, tmp_path, tokenizer)
    want = sorted(
        (r["seq_id"], tuple(r["input_ids"]))
        for r in read_shards(spark, store).collect()
    )
    monkeypatch.setattr(shards_mod, "_COMPACT_TOKENS_PER_FILE", 2 * CTX)
    out = str(tmp_path / "compacted")
    stats = compact_shards(spark, store, out)
    assert stats["n_files"] >= 3
    spans = []
    for f in glob.glob(f"{out}/epoch=-1/*.parquet"):
        ids = [r["seq_id"] for r in spark.read.parquet(f"file:{os.path.abspath(f)}").collect()]
        if ids:
            spans.append((min(ids), max(ids), len(ids)))
    spans.sort()
    # non-overlapping AND gap-free: consecutive files' spans tile the
    # whole 0..n-1 training order
    assert spans[0][0] == 0
    for (lo_a, hi_a, n_a), (lo_b, _hi_b, _n_b) in zip(spans, spans[1:]):
        assert hi_a < lo_b, spans
        assert hi_a - lo_a + 1 == n_a, spans  # contiguous inside a file
        assert lo_b == hi_a + 1, spans
    assert sorted(
        (r["seq_id"], tuple(r["input_ids"]))
        for r in read_shards(spark, out).collect()
    ) == want
