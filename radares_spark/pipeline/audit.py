"""Completeness audit — the verify_dates.py replacement.

The reference runs one scalar COUNT query per day since 2018 in a
Python loop (src/verify_dates.py:25-42 — ~2,900 round trips per run).
Here: ONE job — groupBy day, left-join a generated calendar, filter
days below the expected device count. Missing days (zero files) are
included, which the reference's loop gets implicitly and a naive
groupBy would miss.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TOTAL_EQUIP = 99  # reference src/verify_dates.py:12


def completeness_audit(ledger: DataFrame, expected: int = TOTAL_EQUIP) -> DataFrame:
    """Days whose ingested-device count < expected, including fully
    missing days. Returns (pubdate, n_equipments)."""
    daily = ledger.groupBy("pubdate").agg(F.countDistinct("equipment").alias("n_equipments"))
    calendar = ledger.agg(
        F.min("pubdate").alias("lo"), F.max("pubdate").alias("hi")
    ).select(F.explode(F.sequence("lo", "hi")).alias("pubdate"))
    return (
        calendar.join(daily, "pubdate", "left")
        .select("pubdate", F.coalesce("n_equipments", F.lit(0)).alias("n_equipments"))
        .filter(F.col("n_equipments") < expected)
    )
