"""A/B: pair_dot kernel variants for dedup_semantic (r15 item 8, §4.2).

Variants of functions/vectors.pair_dot:
  base    — 64-iteration python loop of strided column mul-adds
  cumsum  — (m1*m2).cumsum(axis=1)[:, -1]: one contiguous pass, still
            the sequential left-to-right fold (bit-identical by
            cumsum's definition — same argument as embed's norm fold)
  f32     — float32 accumulation (halves kernel bytes; NOT bit-exact —
            timed for the record, adoptable only if the rounded output
            is row-identical, which the equality check decides)
Also sweeps spark.sql.execution.arrow.maxRecordsPerBatch.
"""
from __future__ import annotations

import os
import statistics
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[2]
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql.types import DoubleType  # noqa: E402

from radares_spark.session import DEFAULT_SF_DIR, get_spark  # noqa: E402

REPS = 4


def noop(df):
    df.write.format("noop").mode("overwrite").save()


@F.pandas_udf(DoubleType())
def pair_dot_cumsum(a, b):
    import numpy as np
    import pandas as pd

    if len(a) == 0:
        return pd.Series([], dtype=np.float64)
    m1 = np.stack(a.to_numpy()).astype(np.float64)
    m2 = np.stack(b.to_numpy()).astype(np.float64)
    return pd.Series(np.cumsum(m1 * m2, axis=1)[:, -1])


@F.pandas_udf(DoubleType())
def pair_dot_f32(a, b):
    import numpy as np
    import pandas as pd

    if len(a) == 0:
        return pd.Series([], dtype=np.float64)
    m1 = np.stack(a.to_numpy()).astype(np.float32)
    m2 = np.stack(b.to_numpy()).astype(np.float32)
    return pd.Series(np.cumsum(m1 * m2, axis=1)[:, -1].astype(np.float64))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", DEFAULT_SF_DIR)
    spark = get_spark("radares-ab-pairdot")
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).count()

    from radares_spark.functions import vectors
    from radares_spark.operators import semdedup

    base = vectors.pair_dot
    variants = {
        "base": base,
        "cumsum": pair_dot_cumsum,
        "f32": pair_dot_f32,
    }

    def build(fn):
        vectors.pair_dot = fn
        semdedup.pair_dot = fn
        try:
            return semdedup.dedup_semantic(spark, sf_dir)
        finally:
            vectors.pair_dot = base
            semdedup.pair_dot = base

    frames = {tag: build(fn) for tag, fn in variants.items()}
    a = frames["base"]
    for tag in ("cumsum", "f32"):
        d = a.exceptAll(frames[tag]).count() + frames[tag].exceptAll(a).count()
        print(f"{tag}: row diff vs base = {d}", flush=True)

    for tag, df in frames.items():
        noop(df)
    for tag, df in frames.items():
        walls = []
        for _ in range(REPS):
            t0 = time.perf_counter(); noop(df); walls.append(time.perf_counter() - t0)
        print(
            f"{tag}: min={min(walls):.3f} med={statistics.median(walls):.3f}",
            flush=True,
        )

    # batch-size sweep on the best bit-exact variant
    for rec in ("10000", "40000", "100000"):
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", rec)
        df = frames["cumsum"]
        noop(df)
        walls = []
        for _ in range(REPS):
            t0 = time.perf_counter(); noop(df); walls.append(time.perf_counter() - t0)
        print(
            f"cumsum batch={rec}: min={min(walls):.3f} med={statistics.median(walls):.3f}",
            flush=True,
        )
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
    spark.stop()


if __name__ == "__main__":
    main()
