"""Streaming weighted reservoir — ``pipeline/corpus.weighted_sample``
as a Structured Streaming sink: maintain the k-doc weighted-without-
replacement sample of EVERYTHING that has ever landed, updated per
micro-batch (the A-ES reservoir of Efraimidis & Spirakis 2006 §3, in
its distributed, deterministic form).

Why it works incrementally: each doc's exponential race key
``e = -ln(u)/w`` is a pure function of (doc_id, weight) — the same
key in every epoch and in the batch operator — and "k smallest keys"
is an associative, idempotent fold:

    topk(A ∪ B ∪ C) == topk(topk(A ∪ B) ∪ C) == topk(topk(A∪B) ∪ B ∪ C)

so the reservoir after N micro-batches is BIT-IDENTICAL to running
:func:`radares_spark.pipeline.corpus.weighted_sample` over the union
of all landed docs (pinned in tests/test_reservoir_stream.py), and a
replayed batch folded twice changes nothing.

Exactly-once story (same recipe as ``admission_stream``):

- the checkpoint's file log gives each landed file to one micro-batch;
- each epoch writes its full k-row reservoir SNAPSHOT as an
  ``epoch=<id>`` partition with dynamic overwrite — a crash-replay
  overwrites its own partition;
- the current reservoir = the newest snapshot partition, loaded with
  the replaying epoch EXCLUDED (``admission_stream._load_ledger``'s
  rule), so a replay folds the batch into the pre-epoch state — and
  even folding against its own post-epoch snapshot would reproduce the
  same rows, because the fold is idempotent (see above). Two
  independent safety nets.

Scale: the per-epoch merge input is (k reservoir rows) + (one
micro-batch), never the corpus; snapshots are k rows each, so even
years of epochs stay tiny — ``prune_snapshots`` deletes superseded
ones. The sort inside the merge runs on k + batch rows, which is why
a plain orderBy/limit is the right plan HERE while the batch operator
needs its bin-prefix shape (a batch draw sorts the whole corpus).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from radares_spark.io import fs
from radares_spark.operators.dedup import normalize_text
from radares_spark.pipeline.corpus import _unit_hash
from radares_spark.streaming.admission_stream import stream_docs

RESERVOIR_SEED = "ws"  # same stream as the batch operator by default


def _keyed(batch: DataFrame, seed: str) -> DataFrame:
    """(doc_id, weight, e) for one micro-batch — weight is the
    whitespace token count, the key the batch operator's exact
    expression (corpus_weighted_sample)."""
    norm = normalize_text(F.coalesce(F.col("text"), F.lit("")))
    weight = F.when(norm == "", F.lit(0)).otherwise(F.size(F.split(norm, " ")))
    u = (_unit_hash(F.col("doc_id"), seed) + F.lit(0.5)) / F.lit(1_000_000.0)
    return (
        batch.select(
            "doc_id",
            weight.cast("double").alias("weight"),
            (-F.log(u)).alias("__nlu"),
        )
        .filter(F.col("weight") > 0)
        .select("doc_id", "weight", (F.col("__nlu") / F.col("weight")).alias("e"))
    )


def _load_snapshot(
    spark: SparkSession, reservoir_dir: str, exclude_epoch: int | None = None
) -> DataFrame | None:
    """Newest reservoir snapshot, or None before the first epoch."""
    if not fs.has_parquet(spark, reservoir_dir):
        return None
    snap = spark.read.parquet(reservoir_dir)
    if exclude_epoch is not None:
        snap = snap.filter(F.col("epoch") != F.lit(exclude_epoch))
    # newest remaining epoch holds the complete current reservoir; the
    # epoch column is tiny (k rows per snapshot), so the scalar max is a
    # kilobyte-scale aggregate
    latest = snap.agg(F.max("epoch").alias("m")).collect()[0]["m"]
    if latest is None:
        return None
    return snap.filter(F.col("epoch") == F.lit(latest)).drop("epoch")


def run_reservoir_stream(
    spark: SparkSession,
    landing_dir: str,
    reservoir_dir: str,
    checkpoint: str,
    k: int,
    seed: str = RESERVOIR_SEED,
    max_files_per_trigger: int | None = None,
) -> None:
    """One AvailableNow pass: fold every new file's docs into the
    weighted reservoir, snapshot per epoch, stop. Re-runnable."""
    docs = stream_docs(spark, landing_dir, max_files_per_trigger)

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        s = batch_df.sparkSession
        fresh = _keyed(batch_df, seed)
        old = _load_snapshot(s, reservoir_dir, exclude_epoch=epoch_id)
        merged = fresh if old is None else old.unionByName(fresh)
        topk = (
            # same doc re-landed: fold duplicates so the reservoir
            # never holds a doc twice. The winning (e, weight) PAIR is
            # taken together via min-of-struct — independent
            # min(weight)/min(e) could combine one landing's weight
            # with the other's key when a doc re-lands with CHANGED
            # text (review finding); best-key-wins keeps the row
            # self-consistent (byte-identical re-landings are
            # unaffected: both pairs are equal)
            merged.groupBy("doc_id")
            .agg(F.min(F.struct("e", "weight")).alias("b"))
            .select("doc_id", F.col("b.weight").alias("weight"), F.col("b.e").alias("e"))
            .orderBy(F.asc("e"), F.asc("doc_id"))
            .limit(k)
        )
        (
            topk.withColumn("epoch", F.lit(epoch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("epoch")
            .parquet(reservoir_dir)
        )

    q = (
        docs.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def current_reservoir(spark: SparkSession, reservoir_dir: str) -> DataFrame | None:
    """The live sample: newest snapshot, ranked."""
    snap = _load_snapshot(spark, reservoir_dir)
    if snap is None:
        return None
    from pyspark.sql import Window as W

    return snap.withColumn(
        "sel_rank", F.row_number().over(W.orderBy(F.asc("e"), F.asc("doc_id")))
    ).drop("e")


def prune_snapshots(
    spark: SparkSession, reservoir_dir: str, keep: int = 2
) -> None:
    """Offline maintenance between stream runs: superseded snapshots
    are pure history (each epoch's partition is complete), keep the
    newest ``keep`` for post-crash forensics and drop the rest.
    Scheme-agnostic: deletes through Hadoop FileSystem, so the same
    call maintains a file:, hdfs:, or s3a: snapshot store."""
    epochs = sorted(fs.epoch_partitions(spark, reservoir_dir), reverse=True)
    for e in epochs[keep:]:
        fs.delete(spark, f"{reservoir_dir.rstrip('/')}/epoch={e}")
