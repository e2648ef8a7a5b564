"""A/B: _apply_merges_udf duplication in text_bpe_encode / shards_pack."""
from __future__ import annotations

import os
import statistics
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[2]
sys.path.insert(0, str(REPO))

from radares_spark.session import DEFAULT_SF_DIR, get_spark  # noqa: E402

REPS = 5


def timeit(df):
    df.write.format("noop").mode("overwrite").save()
    out = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        out.append(time.perf_counter() - t0)
    return round(statistics.median(out), 3)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", DEFAULT_SF_DIR)
    spark = get_spark("radares-ab-enc")
    os.environ.setdefault("SPARK_GRAFT_SF_DIR", sf_dir)
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).count()

    from radares_spark.operators import bpe
    import radares_spark.pipeline.shards as shards
    import bench

    orig = bpe._apply_merges_udf

    def nd(merges):
        return orig(merges).asNondeterministic()

    for name in ("text_bpe_encode", "shards_pack"):
        fn = bench.LIBRARY_PLANS[name]
        for tag, factory in (("base", orig), ("nd", nd)):
            bpe._apply_merges_udf = factory
            shards._apply_merges_udf = factory
            df = fn(spark, sf_dir)
            w = timeit(df)
            n = df._jdf.queryExecution().executedPlan().toString().count(
                "ArrowEvalPython"
            )
            print(f"{name} {tag}: {w}s arrow_nodes={n}", flush=True)
    bpe._apply_merges_udf = orig
    shards._apply_merges_udf = orig
    spark.stop()


if __name__ == "__main__":
    main()
