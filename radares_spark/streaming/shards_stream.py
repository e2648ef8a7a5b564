"""Streaming shards-append — the train-ready shard store
(``pipeline/shards.py``) as a Structured Streaming sink: curated
document files land, each micro-batch tokenizes under the FROZEN
tokenizer artifact and appends sealed sequences, so training shards
grow continuously instead of waiting for a nightly batch.

Exactly-once story — leaner than the admission/URL streams because
the store's own lifecycle already provides the replay guard:

- the checkpoint's file log gives each landed file to exactly one
  micro-batch (the admission-stream recipe);
- ``append_shards`` writes its ``_meta`` LAST carrying a night tag of
  ``epoch-<run-namespace>-<id>``. A replayed micro-batch (crash
  between the append completing and the checkpoint commit) is
  recognized by the tag and no-ops; a batch that crashed MID-append
  left ``_meta`` untouched, so its replay re-reads the same
  meta/frontier and reruns byte-identically (pinned batch-side in
  tests/test_shards.py's crash-rerun test). No epoch-partition
  overwrite dance is needed — the meta-write-last ladder IS the
  idempotency mechanism. The run namespace is a marker PERSISTED
  INSIDE THE CHECKPOINT DIR, minted when the checkpoint is born:
  Spark restarts epoch ids at 0 for every fresh checkpoint, so
  un-namespaced tags from an earlier run against the same store would
  silently no-op a NEW run's first batches (r9 find — the
  completed-tag set made the collision certain instead of rare).
  Restarts reuse the marker (replays still dedup); WIPING the
  checkpoint — same path or new — mints a fresh namespace, so new
  data always lands. A checkpoint-path hash would not survive the
  wipe-and-reuse-the-same-path case. Upgrade window: a marker-miss
  over a checkpoint that ALREADY committed batches (one born before
  the marker existed) pins the legacy un-namespaced tag format
  instead of minting — otherwise a batch that crashed between its
  append and its commit would replay under a new tag and
  double-append once.

Sequencing: ``append_shards`` is inherently serial (each night reads
the meta the previous one wrote). foreachBatch delivers micro-batches
serially by contract, so the stream satisfies the store's
single-writer requirement for free; do not run a second writer (CLI
``shards-append`` or another stream) against the same store
concurrently.

Scale: per micro-batch cost is the ``append_shards`` contract — the
delta plus the < ctx_len-token frontier sidecar; sealed history is
never listed, read, or rewritten, so epochs stay O(batch) forever.
"""

from __future__ import annotations

import re
import uuid
import warnings

from pyspark.sql import DataFrame, SparkSession

from radares_spark.io import fs
from radares_spark.operators.bpe import load_tokenizer
from radares_spark.pipeline.shards import (
    _completed_nights,
    append_shards,
    token_vocab,
)
from radares_spark.streaming.admission_stream import stream_docs

# the namespaced stream tag format this module mints: epoch-<ns>-<id>
_NAMESPACED_TAG = re.compile(r"epoch-([0-9a-f]{12})-\d+")


def run_shards_stream(
    spark: SparkSession,
    landing_dir: str,
    tok_dir: str,
    shards_dir: str,
    checkpoint: str,
    max_files_per_trigger: int | None = None,
) -> None:
    """One AvailableNow pass: every new landed file's docs encoded and
    appended to the shard store, stop. Re-runnable; the store must be
    initialized first (``tokenizer-train --shards`` / ``init_shards``)
    so appends fail fast on a tokenizer swap instead of mixing id
    spaces."""
    if not fs.has_parquet(spark, f"{shards_dir}/_meta"):
        raise ValueError(
            f"shard store {shards_dir!r} is not initialized — run "
            "tokenizer-train --shards (init_shards) before streaming"
        )
    word_syms, merges = load_tokenizer(spark, tok_dir)
    # reused by EVERY micro-batch: pin once per run, not per epoch —
    # the word table AND the derived id vocabulary (the r9 epoch
    # profile measured the per-epoch vocab rebuild at ~0.5 s of pure
    # fixed cost; the fingerprint check still runs per append)
    word_syms = word_syms.localCheckpoint(eager=True)
    vocab = token_vocab(word_syms, merges).localCheckpoint(eager=True)
    docs = stream_docs(spark, landing_dir, max_files_per_trigger)
    # tag namespace per CHECKPOINT INCARNATION (see module doc): read
    # the marker minted when this checkpoint was born, or mint one —
    # before the stream starts, so no batch can race the marker write
    ns_path = f"{checkpoint}/_radares_run_ns"
    if fs.has_parquet(spark, ns_path):
        run_ns = spark.read.parquet(ns_path).head()["ns"]
    else:
        # upgrade window: a checkpoint born BEFORE the namespace marker
        # existed already committed batches under legacy un-namespaced
        # tags (epoch-<id>). Minting a fresh namespace for it would let
        # a batch that crashed between a completed append and its
        # checkpoint commit replay under a NEW tag and double-append
        # once — so a marker-miss over a checkpoint with committed
        # batches pins the LEGACY format (ns = "") for that
        # checkpoint's lifetime: replays keep matching their recorded
        # tags, and epoch ids inside one checkpoint are monotonic so
        # the r9 fresh-checkpoint collision cannot occur here.
        legacy = fs.exists(spark, f"{checkpoint}/commits") and any(
            not n.startswith(".")
            for n in fs.list_names(spark, f"{checkpoint}/commits")
        )
        run_ns = "" if legacy else uuid.uuid4().hex[:12]
        if legacy:
            # cross-check before pinning (r10 advice): a POST-upgrade
            # checkpoint that lost only its marker file would
            # otherwise silently pin ns="" and a crashed batch's
            # replay tag would not match its recorded namespaced tag
            # (one double-append). The store's own completed tags
            # carry the namespace — recover it when they name exactly
            # one, warn loudly when they are ambiguous.
            ns_seen = {
                m.group(1)
                for m in (
                    _NAMESPACED_TAG.fullmatch(t)
                    for t in _completed_nights(
                        spark.read.parquet(f"{shards_dir}/_meta").head()
                    )
                )
                if m
            }
            if len(ns_seen) == 1:
                run_ns = next(iter(ns_seen))
            elif ns_seen:
                warnings.warn(
                    f"checkpoint {checkpoint!r} has committed batches but "
                    "no namespace marker, and the shard store records "
                    f"tags under {len(ns_seen)} distinct namespaces — "
                    "pinning the legacy un-namespaced format; a batch "
                    "that crashed between its append and its commit may "
                    "replay under a non-matching tag and double-append "
                    "once",
                    stacklevel=2,
                )
        # overwrite, not errorifexists: a crash MID-mint leaves the dir
        # with no committed parquet — has_parquet stays False and the
        # re-mint must not brick on the leftover directory
        spark.createDataFrame([(run_ns,)], "ns string").repartition(
            1
        ).write.mode("overwrite").parquet(ns_path)

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        batch = batch_df.localCheckpoint(eager=True)
        if batch.isEmpty():
            return
        append_shards(
            batch.sparkSession,
            shards_dir,
            batch,
            word_syms,
            merges,
            night=(
                f"epoch-{run_ns}-{epoch_id}" if run_ns else f"epoch-{epoch_id}"
            ),
            vocab=vocab,
        )

    q = (
        docs.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
