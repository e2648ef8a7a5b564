"""spread() sizing: small single-split inputs are rebalanced for CPU
parallelism; inputs whose scan already yields enough splits are
returned untouched (no payload shuffle at corpus scale)."""

from __future__ import annotations

import os

from radares_spark.io.tables import _size_bytes, load_table, spread

from .conftest import SF_SMOKE


def test_size_bytes_parses_spark_forms():
    assert _size_bytes("134217728") == 134217728
    assert _size_bytes("128m") == 128 << 20
    assert _size_bytes("128mb") == 128 << 20
    assert _size_bytes("1g") == 1 << 30
    assert _size_bytes("4k") == 4 << 10
    assert _size_bytes("512b") == 512


def test_small_input_is_rebalanced(spark):
    # documents at sf0.001 is a single tiny file -> one scan split;
    # spread() must fan it to the CORE-AWARE floor for CPU-dense
    # per-row work: defaultParallelism/4 clamped to [4, 8] (r15 —
    # 4 on narrow sessions, 8 from 32 cores up).
    base = load_table(spark, SF_SMOKE, "documents")
    assert base.rdd.getNumPartitions() == 1
    df = spread(spark, SF_SMOKE, "documents")
    want = min(8, max(4, spark.sparkContext.defaultParallelism // 4))
    assert df.rdd.getNumPartitions() == want
    # an explicit floor still pins the fan-out exactly
    assert spread(spark, SF_SMOKE, "documents", floor=4).rdd.getNumPartitions() == 4


def test_already_parallel_scan_skips_the_rebalance(spark):
    # Force the scan to split the same file many ways; spread() must
    # recognize the input as already parallel and skip the repartition
    # (at 100 TB the scan has thousands of splits and a repartition
    # would shuffle the payload for nothing).
    size = os.path.getsize(os.path.join(SF_SMOKE, "documents.parquet"))
    old = spark.conf.get("spark.sql.files.maxPartitionBytes", "128m")
    try:
        spark.conf.set("spark.sql.files.maxPartitionBytes", str(max(size // 8, 1)))
        df = spread(spark, SF_SMOKE, "documents")
        base = load_table(spark, SF_SMOKE, "documents")
        # identical partitioning to the raw scan: no Exchange added
        assert df.rdd.getNumPartitions() == base.rdd.getNumPartitions()
        assert "Exchange" not in df._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", old)
