"""Stream-stream interval join — the streaming twin of the as-of /
range joins (SURVEY §2.6, batch forms in plans/relational.py and
operators/asof.py).

Spark's stream-stream join requires BOTH sides watermarked plus a
time-interval condition; together they bound the join state: a
buffered click can only ever match errors within ``lookback`` of it,
so once the error-side watermark passes ``click_ts + lookback`` the
row is evicted. Without the interval bound the state grows forever —
the unbounded-state mistake this module exists to not make.

At scale: the join shuffles both streams on the equality key
(user_id), state lives in the state store partitioned the same way,
and throughput is bounded by state-store I/O — exactly the same
layout a batch sort-merge join would pick, kept incremental.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def clicks_before_errors(
    errors: DataFrame,
    clicks: DataFrame,
    lookback: str = "10 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Every (error, click) pair where the click happened within
    ``lookback`` at-or-before the error, per user — the "what did the
    user do right before it broke" join, computed incrementally.

    ``errors``: (event_id, user_id, ts); ``clicks``: (user_id, ts).
    Output: (event_id, user_id, error_ts, click_ts). Works identically
    on batch frames (the watermark is a no-op there) — the tests run
    the same plan both ways and compare.
    """
    e = errors.select(
        "event_id", "user_id", F.col("ts").alias("error_ts")
    ).withWatermark("error_ts", watermark)
    c = clicks.select(
        F.col("user_id").alias("click_user"), F.col("ts").alias("click_ts")
    ).withWatermark("click_ts", watermark)
    cond = (
        (F.col("user_id") == F.col("click_user"))
        & (F.col("click_ts") <= F.col("error_ts"))
        & (F.col("click_ts") >= F.col("error_ts") - F.expr(f"INTERVAL {lookback}"))
    )
    return e.join(c, cond, "inner").select(
        "event_id", "user_id", "error_ts", "click_ts"
    )
