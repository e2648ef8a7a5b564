"""A/B: duplicated ArrowEvalPython (guide 4.4) vs asNondeterministic.

Monkeypatches the UDF factories so both arms run in ONE session,
interleaved — no source edit needed for the measurement.
"""
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
    df.write.format("noop").mode("overwrite").save()  # warm
    return round(
        statistics.median(
            (lambda t0: (df.write.format("noop").mode("overwrite").save(), time.perf_counter() - t0)[1])(
                time.perf_counter()
            )
            for _ in range(REPS)
        ),
        3,
    )


def n_arrow_nodes(df):
    return df._jdf.queryExecution().executedPlan().toString().count(
        "ArrowEvalPython"
    )


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", DEFAULT_SF_DIR)
    spark = get_spark("radares-ab-nd")
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).count()

    from radares_spark.operators import embed, dedup
    import bench

    results = {}

    # --- arm 1: text_hash_embed_4k, baseline vs nd-dense ---
    orig_dense = embed._dense_unit_udf

    def nd_dense(dim):
        return orig_dense(dim).asNondeterministic()

    for tag, factory in (("base", orig_dense), ("nd", nd_dense)):
        embed._dense_unit_udf = factory
        df = bench.LIBRARY_PLANS["text_hash_embed_4k"](spark, sf_dir)
        w = timeit(df)
        results[f"hash_embed_4k_{tag}"] = (w, n_arrow_nodes(df))
        print(f"hash_embed_4k {tag}: {w}s arrow_nodes={n_arrow_nodes(df)}", flush=True)
    embed._dense_unit_udf = orig_dense

    # --- arm 2: dedup_embedding_lsh, baseline vs nd pair_dot ---
    import radares_spark.functions.vectors as vecs

    orig_pd = vecs.pair_dot
    nd_pd = orig_pd.asNondeterministic()
    for tag, f in (("base", orig_pd), ("nd", nd_pd)):
        dedup.pair_dot = f
        df = dedup.dedup_embedding_lsh(spark, sf_dir)
        w = timeit(df)
        results[f"emb_lsh_{tag}"] = (w, n_arrow_nodes(df))
        print(f"emb_lsh {tag}: {w}s arrow_nodes={n_arrow_nodes(df)}", flush=True)
    dedup.pair_dot = orig_pd

    print(results)
    spark.stop()


if __name__ == "__main__":
    main()
