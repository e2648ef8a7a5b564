"""A/B: text_hash_embed_4k Arrow payload (r15 item 6, guide §4.3).

FROZEN MEASUREMENT RECORD against the r14 pandas-UDF kernel
(`_dense_unit_udf`), which change 7 later replaced with the
mapInArrow assembly (`_dense_unit_assemble`) — this script no longer
runs against HEAD; its numbers are the documented f32/batch-size
rejections.

Variants:
  f32    — the dense-assembly UDF declared array<float>, cast back to
           array<double> outside: halves the Python->JVM Arrow bytes
           but changes low bits (float32 quantization). Adoptable ONLY
           if row-identical — the equality check decides (expected
           reject: hashed_tf emits full-precision doubles).
  batch  — spark.sql.execution.arrow.maxRecordsPerBatch sweep: at
           dim=4096 a 10k-row output batch is ~330 MB of float64;
           smaller batches bound Python-side buffering (§4.2 caveat:
           'lower it for very wide rows').
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

from radares_spark.session import DEFAULT_SF_DIR, get_spark  # noqa: E402

REPS = 4


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def _dense_unit_udf_f32(dim: int):
    import numpy as np
    import pandas as pd

    @F.pandas_udf("array<float>")
    def dense(ii, xx):
        n = len(ii)
        out = np.empty(n, dtype=object)
        if n:
            lens = np.fromiter((len(a) for a in ii), dtype=np.int64, count=n)
            rows = np.repeat(np.arange(n, dtype=np.int64), lens)
            mat = np.zeros((n, dim), dtype=np.float64)
            if rows.size:
                flat_i = np.concatenate([np.asarray(a, dtype=np.int64) for a in ii])
                flat_x = np.concatenate([np.asarray(a, dtype=np.float64) for a in xx])
                mat[rows, flat_i] = flat_x
            acc = np.zeros(n, dtype=np.float64)
            if rows.size:
                sq = flat_x * flat_x
                ends = np.cumsum(lens)
                starts = ends - lens
                for r in range(n):
                    if lens[r]:
                        acc[r] = np.cumsum(sq[starts[r] : ends[r]])[-1]
            ok = acc > 0
            mat[ok] /= np.sqrt(acc[ok])[:, None]
            matf = mat.astype(np.float32)
            for r in np.flatnonzero(ok):
                out[r] = matf[r]
        return pd.Series(out)

    return dense.asNondeterministic()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", DEFAULT_SF_DIR)
    spark = get_spark("radares-ab-embed4k")
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).count()

    from radares_spark.operators import embed
    import bench

    base_fn = bench.LIBRARY_PLANS["text_hash_embed_4k"]
    a = base_fn(spark, sf_dir)

    orig = embed._dense_unit_udf
    embed._dense_unit_udf = _dense_unit_udf_f32
    try:
        b_f32 = base_fn(spark, sf_dir).select(
            "doc_id", F.col("embedding").cast("array<double>").alias("embedding")
        )
    finally:
        embed._dense_unit_udf = orig

    d = a.exceptAll(b_f32).count() + b_f32.exceptAll(a).count()
    print(f"f32: row diff vs base = {d}", flush=True)

    noop(a)
    noop(b_f32)
    wa, wb = [], []
    for _ in range(REPS):
        t0 = time.perf_counter(); noop(a); wa.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); noop(b_f32); wb.append(time.perf_counter() - t0)
    print(
        f"base min={min(wa):.3f} med={statistics.median(wa):.3f} | "
        f"f32 min={min(wb):.3f} med={statistics.median(wb):.3f}",
        flush=True,
    )

    for rec in ("10000", "2000", "500"):
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", rec)
        noop(a)
        walls = []
        for _ in range(REPS):
            t0 = time.perf_counter(); noop(a); walls.append(time.perf_counter() - t0)
        print(
            f"base batch={rec}: min={min(walls):.3f} "
            f"med={statistics.median(walls):.3f}",
            flush=True,
        )
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
    spark.stop()


if __name__ == "__main__":
    main()
