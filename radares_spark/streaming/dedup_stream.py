"""Streaming exact dedup — the streaming twin of operators/dedup
``dedup_exact`` for a live document feed.

``dropDuplicatesWithinWatermark`` on the normalized-text hash keeps
per-key state only until the watermark passes, so state is bounded by
(arrival skew window x ingest rate) instead of growing with the whole
corpus — the property that makes streaming dedup viable at 100 TB/day.
Duplicates separated by more than the watermark are the batch layer's
job (the corpus pipeline's exact-dedup stage catches them on the next
compaction), which is the standard lambda split for dedup state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from radares_spark.operators.dedup import _md5, normalize_text


def dedup_doc_stream(docs: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Streaming docs (doc_id, text, ingest_ts) -> first arrival per
    normalized-text hash within the watermark; later identical texts
    are dropped by keyed state."""
    hashed = docs.withColumn("text_hash", _md5(normalize_text(F.col("text"))))
    return hashed.withWatermark("ingest_ts", watermark).dropDuplicatesWithinWatermark(
        ["text_hash"]
    )
