"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query smoke check on sf0.001.
``queries()`` — one entry per implemented operator (SURVEY.md §2);
    each callable takes (spark, sf_dir) and returns a DataFrame.
``oracle_sql()`` — per-query ANSI SQL for the DuckDB oracle (column
    names aliased identically on both sides).

The actual catalog lives in ``radares_spark.plans`` — importing it
registers every query family (relational §2.3-2.9, radar-domain
histogram/cleaning semantics, dedup, similarity search, text
analysis, multimodal plumbing).
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from radares_spark.plans import REGISTRY  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on sf0.001: grouped multi-aggregate pricing summary
    (TPC-H Q1 shape — SURVEY §2.7 A3)."""
    return REGISTRY["q1_pricing_summary"].fn(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.fn for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle is not None}
