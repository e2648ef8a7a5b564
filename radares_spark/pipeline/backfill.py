"""Backfill planner — the backload_scrape.py replacement.

The reference builds a {date: [equipments]} dict of the full cross
product on the driver, queries the ledger, and ``.remove()``s each
collected pair (src/backload_scrape.py:56-86) — O(days x devices)
driver memory and a latent KeyError (SURVEY §4 anti-checklist). Here:
``expected = calendar x devices`` (a generated cross join) anti-joined
against the ledger — no driver state at any scale.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def backfill_plan(
    spark: SparkSession,
    equipments: DataFrame,
    ledger: DataFrame,
    start: dt.date,
    end: dt.date,
) -> DataFrame:
    """(pubdate, equipment) pairs still missing from the ledger in
    [start, end] — the download work list."""
    calendar = spark.range(1).select(
        F.explode(
            F.sequence(F.lit(start.isoformat()).cast("date"), F.lit(end.isoformat()).cast("date"))
        ).alias("pubdate")
    )
    # device dim is tiny (~100 rows): broadcast the cross join
    expected = calendar.crossJoin(F.broadcast(equipments.select("equipment").distinct()))
    collected = ledger.select("pubdate", "equipment").filter(
        F.col("pubdate").between(F.lit(start.isoformat()), F.lit(end.isoformat()))
    )
    return expected.join(collected, ["pubdate", "equipment"], "left_anti")
