"""Registry mapping query names to (Spark plan, DuckDB oracle SQL).

The driver contract (``__spark_entry__.py``) needs, per query, a
callable ``(spark, sf_dir) -> DataFrame`` and an equivalent ANSI-SQL
string for the DuckDB oracle. Registering both side by side keeps the
column aliases in lock-step (the driver's comparator sorts columns by
name before hashing, so names must match exactly).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: SparkQuery
    oracle: str | None  # None => non-SQL-expressible; rows-only check
    survey: str  # SURVEY.md §2 operator ids this query covers
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None, survey: str, doc: str = ""):
    """Decorator: add a query to the registry."""

    def wrap(fn: SparkQuery) -> SparkQuery:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, survey=survey, doc=doc)
        return fn

    return wrap
