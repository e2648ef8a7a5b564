"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]; prints ONE JSON line.

Times each registered query end-to-end (plan + execute + count via a
cheap no-op action that materializes every row: ``count()`` after a
``cache``-free plan — we use ``write.format('noop')`` so the full
result is produced without driver collection).
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from radares_spark.plans import REGISTRY  # noqa: E402
from radares_spark.session import DEFAULT_CPUS, DEFAULT_SF_DIR, get_spark  # noqa: E402

# Headline set: one per operator family, weighted toward shuffle-heavy
# plans (the ones that matter at scale).
HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_nation_revenue",
    "window_topk_parts_per_brand",
    "calendar_gap_fill_orders",
    "events_15min_window",
    "radar_histogram_build",
    "radar_p85",
    "dedup_exact",
    "dedup_minhash_pairs",
    "similarity_cosine_topk",
    "text_quality_score",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", DEFAULT_SF_DIR)
    spark = get_spark("radares-spark-bench", shuffle_partitions=DEFAULT_CPUS)

    # warm the JVM + parquet footers once so timings measure the plans
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).count()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        spec = REGISTRY[name]
        t0 = time.perf_counter()
        df = spec.fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
