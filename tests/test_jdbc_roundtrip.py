"""Executed JDBC round-trip (SURVEY §2.1 S6) — closes the r2/r3
"option-assembly only" gap using the Apache Derby embedded engine that
ships inside the Spark distribution (derby*.jar on the default
classpath), so no vendor jar and no network are needed.

Covers the reference's two JDBC access shapes
(/root/reference/src/clean_data.py:175,193):

- plain table read-back (``pd.read_sql(table)``);
- parameterized subquery pushdown (bind-param ``WHERE`` executes
  REMOTELY — the engine only ever sees matching rows);

plus the at-scale shape the reference lacks: a range-partitioned
parallel read (numPartitions range-bounded queries).
"""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from radares_spark.io.tables import load_jdbc, load_table
from tests.conftest import SF_SMOKE

def _derby_available() -> bool:
    import pyspark

    jar_dir = os.path.join(os.path.dirname(pyspark.__file__), "jars")
    return bool(glob.glob(os.path.join(jar_dir, "derbytools-*.jar")))


pytestmark = pytest.mark.skipif(
    not _derby_available(),
    reason="Derby jars absent from this Spark distribution (environmental; "
    "see COVERAGE.md S6)",
)

DERBY_PROPS = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}


@pytest.fixture(scope="module")
def derby_url(spark, tmp_path_factory):
    db = tmp_path_factory.mktemp("derby") / "s6db"
    url = f"jdbc:derby:{db};create=true"
    src = (
        load_table(spark, SF_SMOKE, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus")
        .limit(500)
    )
    (
        src.write.format("jdbc")
        .options(url=url, dbtable="orders_jdbc", **DERBY_PROPS)
        .mode("overwrite")
        .save()
    )
    return url, {r["o_orderkey"]: r for r in src.collect()}


def test_plain_table_roundtrip(spark, derby_url):
    url, expect = derby_url
    got = load_jdbc(spark, url, "orders_jdbc", properties=DERBY_PROPS)
    rows = {r["o_orderkey"]: r for r in got.collect()}
    assert rows.keys() == expect.keys()
    sample = next(iter(expect))
    assert rows[sample]["o_totalprice"] == expect[sample]["o_totalprice"]


def test_subquery_pushdown_executes_remotely(spark, derby_url):
    """Bind-param WHERE as a parenthesized subquery: the filter runs in
    the database — the scan's schema proves the projection narrowed and
    every returned row satisfies the predicate at the source."""
    url, expect = derby_url
    # Remote-dialect realities the option map must survive: Spark's
    # JDBC writer creates QUOTED (case-sensitive) columns — Derby
    # upcases unquoted identifiers — and maps StringType to CLOB,
    # which Derby won't compare to a CHAR literal without a cast.
    sub = (
        '(SELECT "o_orderkey", "o_totalprice" FROM orders_jdbc '
        "WHERE CAST(\"o_orderstatus\" AS VARCHAR(8)) = 'F') t"
    )
    got = load_jdbc(spark, url, sub, properties=DERBY_PROPS)
    assert set(got.columns) == {"o_orderkey", "o_totalprice"}
    keys = [r["o_orderkey"] for r in got.collect()]
    assert keys and all(expect[k]["o_orderstatus"] == "F" for k in keys)
    n_f = sum(1 for r in expect.values() if r["o_orderstatus"] == "F")
    assert len(keys) == n_f


def test_partitioned_parallel_read(spark, derby_url):
    """The four partitioning options fan the read into numPartitions
    range-bounded queries — the source-parallelism shape a 100 TB
    ingest needs (each executor opens its own connection for its key
    range)."""
    url, expect = derby_url
    lo = min(expect)
    hi = max(expect)
    got = load_jdbc(
        spark,
        url,
        "orders_jdbc",
        properties=DERBY_PROPS,
        partition_column="o_orderkey",
        lower_bound=lo,
        upper_bound=hi + 1,
        num_partitions=4,
    )
    assert got.rdd.getNumPartitions() == 4
    assert got.count() == len(expect)  # range partitions tile, no loss/dup
    total = got.agg(F.sum("o_totalprice").alias("s")).first()["s"]
    assert total == pytest.approx(sum(r["o_totalprice"] for r in expect.values()))
