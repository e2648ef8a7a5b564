"""SparkSession factory.

Local-mode defaults are tuned for the test container (local[32],
128 GiB); cluster deployments override via ``extra_conf`` or
``spark-submit --conf``. The knobs that matter at 100 TB (AQE,
skew-join handling, partition sizing) are on by default so the same
plans scale without code changes.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "radares_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with scale-aware defaults.

    - AQE + partition coalescing + skew-join: runtime re-planning so the
      same declarative plan survives skew and scale changes.
    - ``spark.sql.shuffle.partitions`` ~ cores locally; on a real
      cluster AQE coalescing makes the static value less critical.
    - Session timezone pinned to UTC (oracle comparisons, determinism).
    - Arrow enabled: pandas UDF / createDataFrame fast path.
    """
    cpus = DEFAULT_CPUS
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "90g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.parquet.filterPushdown", "true")
        # Long sessions run dozens of distinct codegen'd plans; the JVM
        # default 240m code cache fills and silently stops JIT'ing.
        .config(
            "spark.driver.extraJavaOptions",
            "-XX:ReservedCodeCacheSize=512m -XX:+UseCodeCacheFlushing",
        )
    )
    if master:
        builder = builder.master(master)
    elif not os.environ.get("SPARK_MASTER"):
        builder = builder.master(f"local[{cpus}]")
        # Local mode only: shuffle/spill files on tmpfs — the container's
        # root disk stalls unpredictably (seconds-long fsync pauses that
        # dwarf sub-second stages). A cluster deployment configures fast
        # local SSDs via spark.local.dir / YARN dirs instead.
        shm = "/dev/shm/spark-local"
        if os.path.isdir("/dev/shm") and os.access("/dev/shm", os.W_OK):
            os.makedirs(shm, exist_ok=True)
            builder = builder.config("spark.local.dir", shm)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
