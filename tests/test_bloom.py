"""Runtime bloom-filter join pre-filtering — the 100 TB shuffle-join
complement to broadcast dims: when the build side of a shuffle join is
selectively filtered (but too big to broadcast), Spark's runtime
bloom-filter rule plants a `might_contain` pre-filter on the probe
side, dropping rows that cannot match BEFORE they pay the shuffle.

At production sizes the rule self-activates under the session defaults
(creation side under spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold,
probe scan over the 10 GB applicationSideScanSizeThreshold). Test data
is far below those sizes, so these tests lower the thresholds ONLY to
make the planner behavior observable — the assertion is about plan
shape and result equality, not about the thresholds themselves."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def bloom_spark():
    from radares_spark.session import get_spark

    spark = get_spark(
        "bloom-test",
        shuffle_partitions=8,
        extra_conf={
            # force the shuffle-join path (no broadcast) and let the
            # bloom rule see the tiny test tables
            "spark.sql.autoBroadcastJoinThreshold": "-1",
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
            "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
        },
    )
    yield spark
    # leave the shared session for other modules in its default state
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
        "10GB",
    )
    spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "10MB"
    )


def _joined(spark, sf_dir="/root/testdata/sf0.01"):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return li.join(orders, li.l_orderkey == orders.o_orderkey).select(
        "l_orderkey", "l_quantity", "o_orderpriority"
    )


def test_bloom_prefilter_is_injected(bloom_spark):
    plan = _joined(bloom_spark)._jdf.queryExecution().optimizedPlan().toString()
    assert "might_contain" in plan, plan


def test_bloom_prefilter_preserves_results(bloom_spark):
    got = _joined(bloom_spark).groupBy().agg(
        F.count(F.lit(1)).alias("n"), F.sum("l_quantity").alias("q")
    ).collect()[0]
    # same join under the session defaults (bloom rule dormant at this
    # scan size): the pre-filter must not change a single row
    bloom_spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
        "10GB",
    )
    try:
        want = _joined(bloom_spark).groupBy().agg(
            F.count(F.lit(1)).alias("n"), F.sum("l_quantity").alias("q")
        ).collect()[0]
    finally:
        bloom_spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "0",
        )
    assert got == want and got["n"] > 0
