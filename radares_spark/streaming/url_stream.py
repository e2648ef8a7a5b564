"""Streaming URL admission — ``operators/urls.incremental_url_dedup``
as a Structured Streaming sink: each micro-batch of freshly-discovered
URLs is admitted against the canonical-URL ledger of every prior
crawl, so the NEXT micro-batch (and the next nightly run) skips
everything already fetched. The URL twin of ``admission_stream`` —
same landing-dir file source, same foreachBatch shape, same
exactly-once recipe:

- the checkpoint's file log gives each landed file to one micro-batch;
- audit and kept-URL ledger rows write ``epoch=<id>`` partitions with
  dynamic overwrite — a crash-replay overwrites its own partition;
- the ledger loads with the replaying epoch EXCLUDED
  (``admission_stream._load_ledger``'s rule), reconstructing the exact
  pre-epoch state so a replay recomputes the same outcomes;
- admission itself is idempotent by construction (a re-landed URL
  classifies ``url_dup_ledger`` and appends nothing — pinned in
  tests/test_urls.py), so even a lost checkpoint degrades to
  correct-but-reclassified, never to duplicate fetches.

Scale: the per-batch cost is one canonicalization projection over the
micro-batch plus a semi-join whose shuffle is batch-sized — the ledger
side is a string-table scan, never corpus bytes. This is the stage
that pays for itself hardest at 100 TB: every URL dropped here is a
fetch, an HTML parse, and a dedup shuffle that never happen."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from radares_spark.io import fs
from radares_spark.operators.urls import incremental_url_dedup, url_ledger_rows

URLS_SCHEMA = "doc_id long, url string"


def _load_url_ledger(
    spark: SparkSession, ledger_dir: str, exclude_epoch: int | None = None
) -> DataFrame:
    """Current URL ledger, or an empty correctly-shaped frame on first
    run; ``exclude_epoch`` reconstructs the pre-epoch state for crash
    replays (see module docstring)."""
    if fs.has_parquet(spark, ledger_dir):
        ledger = spark.read.parquet(ledger_dir)
        if exclude_epoch is not None:
            ledger = ledger.filter(F.col("epoch") != F.lit(exclude_epoch))
        return ledger.drop("epoch")
    return spark.createDataFrame([], "doc_id long, canonical_url string")


def run_url_admission_stream(
    spark: SparkSession,
    landing_dir: str,
    ledger_dir: str,
    audit_dir: str,
    checkpoint: str,
    max_files_per_trigger: int | None = None,
) -> None:
    """One AvailableNow pass: admit every new file's URLs against the
    canonical-URL ledger, append audit + kept rows, stop. Re-runnable:
    the next invocation picks up only files the checkpoint has not
    assigned yet."""
    reader = spark.readStream.schema(URLS_SCHEMA).option(
        "recursiveFileLookup", "true"
    )
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    stream = reader.parquet(landing_dir)

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        s = batch_df.sparkSession
        batch = batch_df.localCheckpoint(eager=True)
        if batch.isEmpty():
            return
        ledger = _load_url_ledger(s, ledger_dir, exclude_epoch=epoch_id)
        audit, append_rows = incremental_url_dedup(batch, ledger)
        (
            append_rows.withColumn("epoch", F.lit(epoch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("epoch")
            .parquet(ledger_dir)
        )
        (
            audit.withColumn("epoch", F.lit(epoch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("epoch")
            .parquet(audit_dir)
        )

    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def compact_url_ledger(
    spark: SparkSession, ledger_dir: str, checkpoint: str | None = None
) -> None:
    """Offline maintenance between stream runs: fold every COMMITTED
    epoch's canonical URLs into one distinct ``epoch=-1`` partition —
    the admission stream's ``compact_ledger`` recipe verbatim (distinct
    is a no-op on a healthy ledger but makes compaction idempotent and
    self-healing; crash states are superset-monotone; batch ids never
    go negative so compacted history stays visible to replays).

    ``checkpoint`` gates folding on ``fs.last_committed_epoch``: a
    written-but-uncommitted epoch must stay an excludable delta for
    its crash-replay — folded into ``epoch=-1`` it would escape
    ``_load_url_ledger``'s own-epoch exclusion and the replayed audit
    would misclassify kept docs as ``url_dup_ledger`` (ledger SET
    content stays right either way; the audit would not). Without
    ``checkpoint`` every epoch folds — only safe when the caller knows
    the last stream run stopped cleanly."""
    if not fs.has_parquet(spark, ledger_dir):
        return
    led = spark.read.parquet(ledger_dir)
    if checkpoint is not None:
        # the gate lives in fs.committed_view — ONE implementation
        # shared with compact_ledger, same rationale as fold_epochs
        view = fs.committed_view(spark, led, checkpoint, -1)
        if view is None:
            return  # nothing committed yet — nothing is safe to fold
        led, committed = view
    else:
        committed = lambda e: True  # noqa: E731
    fs.fold_epochs(
        spark,
        ledger_dir,
        led.drop("epoch").distinct(),
        -1,
        supersedes=lambda e: e != -1 and committed(e),
    )


# url_ledger_rows re-exported: batch bootstrap (seed the stream's
# ledger from an existing batch crawl) uses the same row shape
__all__ = [
    "run_url_admission_stream",
    "compact_url_ledger",
    "url_ledger_rows",
]
