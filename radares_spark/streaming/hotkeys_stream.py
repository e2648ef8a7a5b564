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

Exactly-once story (same recipe as admission/reservoir): checkpointed
file log; both sinks write ``epoch=<id>`` partitions with dynamic
overwrite; a replay loads the ledger with its own epoch excluded, so
the batch folds into the pre-epoch state. Epoch partitions of the
ledger are DELTAS (that epoch's batch counts), summed at read time —
``compact_hot_ledger`` folds history into one ``epoch=-1`` partition
between runs, the ``admission_stream.compact_ledger`` pattern.

Scale: per epoch, one map-side-combined count aggregate over the
micro-batch, a key-equi merge against the ledger deltas (summed in
the same aggregate), and an N-row snapshot via orderBy/limit —
TakeOrderedAndProject over the already-aggregated totals (one row
per distinct key), unlike the batch report whose bin-prefix shape
exists because ITS input is raw rows. The ledger
carries one row per distinct key ever seen — for unbounded key spaces
cap it by pruning keys whose count can never reach the top (not
implemented here; the testdata key spaces are bounded).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

COMPACTED_EPOCH = -1


def _load_deltas(
    spark: SparkSession, ledger_dir: str, exclude_epoch: int | None = None
) -> DataFrame | None:
    if not (
        os.path.isdir(ledger_dir)
        and any(
            f.endswith(".parquet")
            for _, _, files in os.walk(ledger_dir)
            for f in files
        )
    ):
        return None
    led = spark.read.parquet(ledger_dir)
    if exclude_epoch is not None:
        led = led.filter(F.col("epoch") != F.lit(exclude_epoch))
    return led.drop("epoch")


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
    from radares_spark.operators.skew import skew_report

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
        # running totals = sum of all delta partitions INCLUDING the
        # one just written; on replay the exclusion + rewrite make
        # this the same set of rows either way
        prior = _load_deltas(s, ledger_dir, exclude_epoch=epoch_id)
        totals = (
            delta
            if prior is None
            else prior.unionByName(delta)
            .groupBy(*key_cols)
            .agg(F.sum("n_rows").alias("n_rows"))
        )
        # top-N over the running totals: totals is one row per distinct
        # key — already the aggregated form — so a plain
        # orderBy/limit (TakeOrderedAndProject: per-partition top-N,
        # single small reduce) is the right plan here, unlike the
        # batch report whose input is raw rows; share rides in as the
        # usual single-row broadcast
        grand = totals.agg(F.sum("n_rows").alias("__total"))
        top = (
            totals.orderBy(F.desc("n_rows"), *[F.asc(k) for k in key_cols])
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
    """Newest top-N snapshot."""
    snap = _load_deltas(spark, top_dir)
    if snap is None:
        return None
    latest = (
        spark.read.parquet(top_dir).agg(F.max("epoch")).collect()[0][0]
    )
    return spark.read.parquet(top_dir).filter(F.col("epoch") == latest).drop("epoch")


def compact_hot_ledger(spark: SparkSession, ledger_dir: str) -> None:
    """Fold all delta partitions into one epoch=-1 partition — the
    superset-monotone order of admission_stream.compact_ledger:
    stage, write into the dir, then delete superseded epochs."""
    if not (
        os.path.isdir(ledger_dir)
        and any(
            f.endswith(".parquet")
            for _, _, files in os.walk(ledger_dir)
            for f in files
        )
    ):
        return
    tmp = ledger_dir.rstrip("/") + "__compact_tmp"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    led = spark.read.parquet(ledger_dir).drop("epoch")
    keys = [c for c in led.columns if c != "n_rows"]
    led.groupBy(*keys).agg(F.sum("n_rows").alias("n_rows")).write.mode(
        "overwrite"
    ).parquet(tmp)
    (
        spark.read.parquet(tmp)
        .withColumn("epoch", F.lit(COMPACTED_EPOCH))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("epoch")
        .parquet(ledger_dir)
    )
    for d in os.listdir(ledger_dir):
        if d.startswith("epoch=") and d != f"epoch={COMPACTED_EPOCH}":
            shutil.rmtree(os.path.join(ledger_dir, d))
    shutil.rmtree(tmp)
