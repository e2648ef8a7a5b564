"""Crash-safe serving-store pointers — the swap half of the
artifact-maintenance story.

``shards-reshard`` and ``ivf-retrain`` both build a NEW store next to
the serving one and end at "the caller flips the path" (write-new-
then-swap). This module is that flip, made crash-safe and consumable
by the nightly orchestrator:

- the pointer log is an APPEND-ONLY parquet under
  ``<root>/store_pointers``, one ``idx=<n>`` partition per flip (the
  night-log discipline: prior partitions are never rewritten, so no
  crash window can destroy history and silently repoint every store);
- one flip may carry SEVERAL rows (e.g. ``shards`` + ``tokenizer``
  move together after a reshard) — they land in ONE partition write,
  so a reader never observes the pair half-flipped;
- ``resolve_store`` returns the highest-idx entry for a name, falling
  back to the canonical ``<root>/<name>`` dir when a store was never
  repointed — existing roots keep working untouched;
- entries for stores living UNDER the root are recorded root-RELATIVE
  and re-joined to ``root_dir`` at resolve time, so relocating or
  renaming a root never leaves the log pointing at dangling absolute
  paths (pre-existing absolute entries keep resolving as written);
- a crash BEFORE the append leaves the old store serving; a crash
  AFTER it leaves the new one serving; there is no in-between state;
- single-writer, ENFORCED (r10 verdict #2): each flip atomically
  claims ``_claim_idx_<n>`` inside the log dir (claim content = the
  moves) before appending its partition, so two concurrent
  maintenance runs minting the same idx fail fast instead of silently
  dynamic-overwriting each other — while a deterministic re-run of a
  flip that crashed between claim and append recognizes its own claim
  and completes.

Reference parity: the reference swaps tables by transactional rename
(``/root/reference/database/schema.sql`` unique-index + replace);
here the swap is a metadata append because object stores have no
atomic directory rename at 100 TB.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from radares_spark.io import fs as iofs

POINTER_LOG = "store_pointers"


def _log_dir(root_dir: str) -> str:
    return os.path.join(root_dir, POINTER_LOG)


def _to_logged(root_dir: str, path: str) -> str:
    """Root-relative form for a path under ``root_dir`` (portability:
    a relocated root keeps resolving); paths OUTSIDE the root stay
    absolute — they name shared artifacts the root genuinely points
    away to (e.g. a tokenizer trained elsewhere)."""
    base = root_dir.rstrip("/") + "/"
    return path[len(base):] if path.startswith(base) else path


def _from_logged(root_dir: str, logged: str) -> str:
    """Resolve a logged entry: relative entries join the CURRENT root;
    absolute/URI entries (including every pre-relative-log entry)
    resolve as written."""
    if "://" in logged or os.path.isabs(logged):
        return logged
    return os.path.join(root_dir, logged)


def resolve_store(spark: SparkSession, root_dir: str, name: str) -> str:
    """The current serving path for ``name`` under ``root_dir``: the
    latest pointer-log entry, else the canonical ``<root>/<name>``."""
    log = _log_dir(root_dir)
    default = os.path.join(root_dir, name)
    if not iofs.has_parquet(spark, log):
        return default
    rows = (
        spark.read.parquet(log)
        .filter(F.col("store") == name)
        .orderBy(F.col("idx").desc())
        .limit(1)
        .collect()
    )
    return _from_logged(root_dir, rows[0]["path"]) if rows else default


def next_flip_index(spark: SparkSession, root_dir: str) -> int:
    """The idx the NEXT flip will take (max recorded idx + 1, or 0) —
    maintenance names its candidate dirs ``<store>.m<idx>`` with this,
    so dir suffixes always match pointer-log flip indices."""
    log = _log_dir(root_dir)
    if not iofs.has_parquet(spark, log):
        return 0
    top = spark.read.parquet(log).agg(F.max("idx").alias("m")).head()["m"]
    return int(top) + 1


def flip_stores(
    spark: SparkSession, root_dir: str, moves: dict[str, str]
) -> int:
    """Atomically repoint the stores in ``moves`` (name -> new path):
    ONE appended ``idx=<n>`` partition carries every row, so paired
    artifacts (shard store + its tokenizer) can never be observed
    half-flipped. Refuses a path that does not hold parquet — a flip
    to a missing/empty store would brick every reader. Returns the
    flip index."""
    for name, path in moves.items():
        if not iofs.has_parquet(spark, path):
            raise ValueError(
                f"refusing to point {name!r} at {path!r}: no parquet "
                "there — build the new store first (write-new-then-swap)"
            )
    log = _log_dir(root_dir)
    next_idx = next_flip_index(spark, root_dir)
    # single-writer fail-fast (r10 verdict #2): two concurrent
    # maintenance runs both compute the same next_idx and would
    # silently dynamic-overwrite each other's flip partition — an
    # atomic claim on the idx turns that into a loud error (the
    # `_`-prefix keeps the marker invisible to parquet reads of the
    # log). The claim carries the moves, so a re-run of a flip that
    # crashed between claim and append recognizes its own claim and
    # proceeds (the partition rewrite is deterministic); a DIFFERENT
    # writer's claim raises.
    claim = f"{log}/_claim_idx_{next_idx}"
    content = repr(sorted({n: _to_logged(root_dir, p) for n, p in moves.items()}.items()))
    if not iofs.claim_marker(spark, claim, content):
        if iofs.read_marker(spark, claim) != content:
            raise ValueError(
                f"flip idx {next_idx} is already claimed ({claim!r}) by a "
                "DIFFERENT swap: another maintenance writer is (or was) "
                "flipping this root — serialize maintenance; if that run "
                "is dead, delete the claim file and re-run"
            )
    (
        spark.createDataFrame(
            [
                (next_idx, n, _to_logged(root_dir, p))
                for n, p in sorted(moves.items())
            ],
            "idx int, store string, path string",
        )
        .repartition(1)
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("idx")
        .parquet(log)
    )
    return next_idx


def pointer_history(spark: SparkSession, root_dir: str) -> list[tuple[int, str, str]]:
    """Every flip ever taken, oldest first (paths resolved against the
    current root) — the audit surface nightly-verify cross-checks
    stores against."""
    log = _log_dir(root_dir)
    if not iofs.has_parquet(spark, log):
        return []
    return [
        (int(r["idx"]), r["store"], _from_logged(root_dir, r["path"]))
        for r in spark.read.parquet(log).orderBy("idx", "store").collect()
    ]
