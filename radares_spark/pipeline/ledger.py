"""Idempotent fact-table writes + the ingestion ledger.

The reference enforces at-most-one report per (pubdate, equipment)
with a Postgres unique index + check-then-insert
(database/schema.sql:31-33, src/clean_data.py:168-180). Without a
transactional RDBMS, the engine gets the same exactly-once semantics
from: deterministic surrogate keys (hash of the natural key — replaces
SERIAL, SURVEY §1.2), a left-anti join against the ledger before
append, and partition-scoped parquet writes.

Scale: the anti-join broadcasts the *new* side's keys when small, or
shuffles on (pubdate, equipment) otherwise; the fact write is
``partitionBy(pubdate)`` so each ingest touches only its own
partitions (dynamic overwrite would give atomic re-ingest per
partition; Delta/Iceberg MERGE is the drop-in upgrade when those jars
are on the classpath).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

NATURAL_KEY = ["pubdate", "equipment"]


def file_id(pubdate_col, equipment_col):
    """Deterministic 64-bit surrogate for the (pubdate, equipment)
    natural key — idempotent across re-ingests, unlike SERIAL."""
    return F.xxhash64(pubdate_col.cast("string"), equipment_col)


def build_ledger(flows: DataFrame) -> DataFrame:
    """One ledger row per ingested (pubdate, equipment) — the
    equipment_files table (schema.sql:22-29) with a hash id."""
    return (
        flows.select(*NATURAL_KEY)
        .distinct()
        .select(
            file_id(F.col("pubdate"), F.col("equipment")).alias("id"),
            F.concat_ws(
                "/", F.col("equipment"), F.concat(F.col("pubdate").cast("string"), F.lit(".csv"))
            ).alias("file_name"),
            "pubdate",
            "equipment",
            F.current_timestamp().alias("date_created"),
        )
    )


def idempotent_append(
    spark: SparkSession, flows: DataFrame, warehouse: str
) -> tuple[int, int]:
    """Append only not-yet-ingested (pubdate, equipment) groups.

    Returns (n_rows_written, n_groups_skipped). Re-running the same
    input is a no-op — the reference's unique-index guard, as a plan.
    """
    flows_path = os.path.join(warehouse, "flows")
    ledger_path = os.path.join(warehouse, "equipment_files")

    new = flows
    skipped = 0
    # First-write detection must be EXPLICIT: a broad except here would
    # treat any transient read failure (corrupt footer, permissions,
    # storage blip) as "no ledger yet" and re-append the full input,
    # silently breaking the unique-(pubdate, equipment) guarantee the
    # reference enforces with a DB index (schema.sql:31-33). Only a
    # genuinely missing ledger path skips the anti-join; every other
    # error propagates and fails the ingest.
    jvm_path = spark._jvm.org.apache.hadoop.fs.Path(ledger_path)  # type: ignore[union-attr]
    fs = jvm_path.getFileSystem(spark._jsc.hadoopConfiguration())  # type: ignore[union-attr]
    if fs.exists(jvm_path):
        existing = spark.read.parquet(ledger_path).select(*NATURAL_KEY)
        before = flows.select(*NATURAL_KEY).distinct()
        new_keys = before.join(existing, NATURAL_KEY, "left_anti")
        skipped = before.count() - new_keys.count()
        new = flows.join(F.broadcast(new_keys), NATURAL_KEY, "left_semi")

    new = new.withColumn("equipment_files_id", file_id(F.col("pubdate"), F.col("equipment")))
    n = new.count()
    if n:
        new.write.mode("append").partitionBy("pubdate").parquet(flows_path)
        build_ledger(new).write.mode("append").parquet(ledger_path)
    return n, skipped


def merge_flows(spark: SparkSession, updates: DataFrame, warehouse: str) -> int:
    """MERGE semantics without Delta: for every (pubdate, equipment)
    group in ``updates``, replace the stored group; groups not in
    ``updates`` are kept. Equivalent to ``MERGE INTO flows USING
    updates ON (pubdate, equipment) WHEN MATCHED THEN REPLACE GROUP
    WHEN NOT MATCHED THEN INSERT`` — the upsert the reference's
    unique-index + check-then-insert cannot express (it can only skip).

    Physical shape: only the pubdate partitions present in ``updates``
    are rewritten (dynamic partition overwrite); inside each touched
    partition the kept remainder is ``existing LEFT ANTI updates`` on
    the natural key. Cost is proportional to the touched days, never
    the table. Returns rows written into the touched partitions.
    """
    flows_path = os.path.join(warehouse, "flows")
    ledger_path = os.path.join(warehouse, "equipment_files")
    # localCheckpoint BEFORE the partition overwrite below: the natural
    # repair flow builds ``updates`` by READING flows_path (read, fix
    # rows, merge back). Without materializing here, the post-overwrite
    # ledger update re-executes a plan whose source files were just
    # replaced — FileNotFoundException at best, silently re-reading the
    # merged output at worst. Same self-read hazard the ``merged``
    # checkpoint guards; ``stamped`` needs the guard for the same reason.
    stamped = updates.withColumn(
        "equipment_files_id", file_id(F.col("pubdate"), F.col("equipment"))
    ).localCheckpoint(eager=True)

    days = stamped.select("pubdate").distinct()
    existing = spark.read.parquet(flows_path).join(
        F.broadcast(days), "pubdate", "left_semi"
    )
    kept = existing.join(
        F.broadcast(stamped.select(*NATURAL_KEY).distinct()), NATURAL_KEY, "left_anti"
    )
    merged = kept.unionByName(stamped)
    n = merged.count()

    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        # merged reads flows_path too (via ``kept``) — same guard
        merged.localCheckpoint(eager=True).write.mode("overwrite").partitionBy(
            "pubdate"
        ).parquet(flows_path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)

    # ledger gains any genuinely new natural keys (idempotent)
    new_keys = (
        stamped.select(*NATURAL_KEY)
        .distinct()
        .join(spark.read.parquet(ledger_path).select(*NATURAL_KEY), NATURAL_KEY, "left_anti")
    )
    if new_keys.count():
        build_ledger(new_keys).write.mode("append").parquet(ledger_path)
    return n


def compact_partitions(
    spark: SparkSession, path: str, partition_col: str = "pubdate"
) -> int:
    """Bin small files: rewrite each partition of a partitioned parquet
    table as one file (append-heavy ingest leaves one file per batch;
    at 100 TB the scan's file-listing and per-file open costs dominate
    long before the bytes do). Returns partitions compacted.

    One-file-per-partition fits this table's grain (a day is ≤ ~19k
    rows); for partitions beyond a row-group target, swap the
    ``repartition(col)`` for ``repartitionByRange(n, col, key)``.
    """
    df = spark.read.parquet(path)
    n_parts = df.select(partition_col).distinct().count()
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        df.repartition(F.col(partition_col)).localCheckpoint(eager=True).write.mode(
            "overwrite"
        ).partitionBy(partition_col).parquet(path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    return n_parts


def reingest_overwrite(spark: SparkSession, flows: DataFrame, warehouse: str) -> int:
    """Re-ingest corrected data for the pubdates present in ``flows``,
    atomically replacing ONLY those partitions (dynamic partition
    overwrite). This is the repair path the reference lacks entirely —
    its fix for a bad day is manual DELETE + re-run. Partitions not in
    the input are untouched, so a repair of one day never rewrites the
    other ~3650 days of a 10-year fact table.
    """
    flows_path = os.path.join(warehouse, "flows")
    stamped = flows.withColumn(
        "equipment_files_id", file_id(F.col("pubdate"), F.col("equipment"))
    )
    n = stamped.count()
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        stamped.write.mode("overwrite").partitionBy("pubdate").parquet(flows_path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    return n
