"""Streaming heavy-hitter monitor — ``operators/skew.skew_report`` as
a Structured Streaming fold: maintain running per-key counts over
everything that has ever landed and snapshot the current top-N each
micro-batch, so the hot keys that motivate the engine's caps
(``dedup.lsh_pairs_capped``, ``text_ext.dup_span_stats_capped``,
``skew.salted_agg``) are visible AS DATA LANDS, not after a nightly
batch job finds the straggler.

Why it folds exactly: counts are an associative, commutative monoid —
``count(A ∪ B) = count(A) + count(B)`` per key — so adding each
micro-batch's per-key counts to a running ledger reproduces the batch
count over the union (pinned in tests). Unlike the weighted reservoir
(k-row snapshots), the LEDGER here is one row per distinct key; the
top-N SNAPSHOT derived from it is N rows.

Ledger layout (crash-safe for ADDITIVE data — review finding: the
admission/reservoir "write then delete" compaction order is only safe
for idempotent folds like distinct(); summing the same delta twice is
silent corruption):

- each epoch writes its batch's per-key counts as an ``epoch=<id>``
  DELTA partition (dynamic overwrite => replay rewrites, never
  double-appends);
- compaction writes a GENERATION partition ``epoch = -(W+1)`` holding
  the exact totals of every delta with epoch <= W — the watermark W
  rides IN the partition value, so no marker file and no schema
  change;
- readers use the newest generation (most negative epoch) plus only
  the deltas ABOVE its watermark. A crash anywhere in compaction
  leaves old generation + old deltas in place — readers still compute
  exact totals, because superseded partitions are simply never
  selected. Deleting them afterwards is pure GC.

Exactly-once: checkpointed file log; a replay loads totals with its
own delta epoch excluded, so the batch folds into the pre-epoch
state. Compaction folds ONLY COMMITTED epochs (watermark =
``last_committed_epoch(spark, checkpoint)`` — maintenance helpers
take the SparkSession first since the Hadoop-FS refactor) — folding
a crashed, not-yet-replayed epoch would hide it inside the generation
where the replay's exclusion cannot reach it (review finding).

Scale: per epoch, one map-side-combined count aggregate over the
micro-batch, a key-equi merge against the selected ledger rows, and
an N-row snapshot via orderBy/limit — TakeOrderedAndProject over the
already-aggregated totals (one row per distinct key), unlike the
batch report whose bin-prefix shape exists because ITS input is raw
rows. Top-dir snapshots are per-epoch N-row partitions; prune with
:func:`radares_spark.streaming.reservoir_stream.prune_snapshots`
(re-exported here), the same small-files hygiene as the reservoir.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from radares_spark.io import fs
from radares_spark.streaming.reservoir_stream import prune_snapshots  # noqa: F401

__all__ = [
    "run_hotkeys_stream",
    "current_top",
    "compact_hot_ledger",
    "last_committed_epoch",
    "prune_snapshots",
]


def last_committed_epoch(spark: SparkSession, checkpoint: str) -> int | None:
    """Highest batch id with a commit marker, or None before the first
    commit — the only epochs compaction may fold. Moved to ``io/fs``
    (r7) so the admission and URL compactors share the same watermark
    gate; re-exported here for the original callers."""
    return fs.last_committed_epoch(spark, checkpoint)


def _effective_rows(
    spark: SparkSession, ledger_dir: str, exclude_epoch: int | None = None
) -> DataFrame | None:
    """The exactly-once view of the ledger: newest generation (most
    negative epoch; watermark W = -epoch - 1) plus deltas with
    epoch > W. Superseded generations/deltas are never selected, so a
    half-finished compaction changes nothing."""
    if not fs.has_parquet(spark, ledger_dir):
        return None
    led = spark.read.parquet(ledger_dir)
    gen = led.agg(F.min("epoch")).collect()[0][0]
    if gen is None:
        return None
    if gen >= 0:
        rows = led
        watermark = -1
    else:
        watermark = -gen - 1
        rows = led.filter(
            (F.col("epoch") == gen)
            | ((F.col("epoch") >= 0) & (F.col("epoch") > watermark))
        )
    if exclude_epoch is not None:
        rows = rows.filter(F.col("epoch") != F.lit(exclude_epoch))
    return rows.drop("epoch")


def run_hotkeys_stream(
    spark: SparkSession,
    landing_dir: str,
    schema: str,
    key_cols: list[str],
    ledger_dir: str,
    top_dir: str,
    checkpoint: str,
    top_n: int = 20,
    max_files_per_trigger: int | None = None,
) -> None:
    """One AvailableNow pass: fold every new file's key counts into
    the ledger, snapshot the running top-N, stop. Re-runnable."""
    reader = spark.readStream.schema(schema).option("recursiveFileLookup", "true")
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    stream = reader.parquet(landing_dir)

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        s = batch_df.sparkSession
        delta = batch_df.groupBy(*key_cols).agg(F.count(F.lit(1)).alias("n_rows"))
        (
            delta.withColumn("epoch", F.lit(epoch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("epoch")
            .parquet(ledger_dir)
        )
        prior = _effective_rows(s, ledger_dir, exclude_epoch=epoch_id)
        totals = (
            delta
            if prior is None
            else prior.unionByName(delta)
            .groupBy(*key_cols)
            .agg(F.sum("n_rows").alias("n_rows"))
        )
        grand = totals.agg(F.sum("n_rows").alias("__total"))
        top = (
            # asc_nulls_last: the batch skew_report pins the DuckDB
            # NULL rule; the stream's tie-break must match it or a
            # NULL key could displace a real one at the boundary
            totals.orderBy(
                F.desc("n_rows"), *[F.asc_nulls_last(k) for k in key_cols]
            )
            .limit(top_n)
            .crossJoin(F.broadcast(grand))
            .withColumn(
                "share",
                F.round(F.col("n_rows") / F.col("__total").cast("double"), 6),
            )
            .drop("__total")
        )
        (
            top.withColumn("epoch", F.lit(epoch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("epoch")
            .parquet(top_dir)
        )

    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def current_top(spark: SparkSession, top_dir: str) -> DataFrame | None:
    """Newest top-N snapshot (one read of the store)."""
    if not fs.has_parquet(spark, top_dir):
        return None
    snaps = spark.read.parquet(top_dir)
    latest = snaps.agg(F.max("epoch")).collect()[0][0]
    if latest is None:
        return None
    return snaps.filter(F.col("epoch") == latest).drop("epoch")


def compact_hot_ledger(
    spark: SparkSession, ledger_dir: str, checkpoint: str
) -> None:
    """Fold every COMMITTED delta into a new generation partition.

    Crash-safe by construction (not by ordering): the new generation
    ``epoch = -(W+1)`` is a partition that did not exist before, so
    writing it is a pure ADD; readers only ever combine the newest
    generation with deltas above its watermark, so a crash before the
    GC loop leaves exact totals (superseded partitions are selected
    by NO reader). Uncommitted epochs are never folded — a crashed
    batch must stay an excludable delta for its replay.
    """
    w = last_committed_epoch(spark, checkpoint)
    if w is None or not fs.has_parquet(spark, ledger_dir):
        return
    led = spark.read.parquet(ledger_dir)
    gen = led.agg(F.min("epoch")).collect()[0][0]
    old_watermark = -gen - 1 if gen is not None and gen < 0 else -1
    if w <= old_watermark:
        return  # nothing new committed since the last generation
    keys = [c for c in led.columns if c not in ("n_rows", "epoch")]
    selected = led.filter(
        (F.col("epoch") == gen) if gen is not None and gen < 0 else F.lit(False)
    )
    deltas = led.filter(
        (F.col("epoch") >= 0)
        & (F.col("epoch") > old_watermark)
        & (F.col("epoch") <= w)
    )
    folded = (
        selected.unionByName(deltas)
        .drop("epoch")
        .groupBy(*keys)
        .agg(F.sum("n_rows").alias("n_rows"))
    )
    # stage/fold/GC via the shared crash-safe core; superseded =
    # folded deltas (0..w) and any older generation
    fs.fold_epochs(
        spark,
        ledger_dir,
        folded,
        -(w + 1),
        supersedes=lambda e: (0 <= e <= w) or (e < 0 and e != -(w + 1)),
    )
