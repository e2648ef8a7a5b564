"""Loaders for the driver TESTDATA tables (one parquet per table).

Reads are plain ``spark.read.parquet`` — Catalyst handles column
pruning and predicate pushdown into the scan, so callers just express
their query and the scan narrows itself (verify with
``df.explain('formatted')``: ``PushedFilters`` / ``ReadSchema``).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Genuine dimensions: always small, always broadcast-joinable.
DIM_TABLES = frozenset({"region", "nation", "supplier"})


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        # events.parquet stores ts as TIMESTAMP(NANOS), which the Spark
        # parquet reader rejects. Read nanos as long and truncate to
        # microseconds — exactly what DuckDB/Arrow do when narrowing.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
        from pyspark.sql import functions as F

        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view for ``spark.sql`` plans."""
    for t in TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
