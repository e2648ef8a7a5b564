import os, statistics, sys, time
from pathlib import Path
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType
from radares_spark.session import DEFAULT_SF_DIR, get_spark

@F.pandas_udf(DoubleType())
def pair_dot_cumsum(a, b):
    import numpy as np, pandas as pd
    if len(a) == 0:
        return pd.Series([], dtype=np.float64)
    m1 = np.stack(a.to_numpy()).astype(np.float64)
    m2 = np.stack(b.to_numpy()).astype(np.float64)
    return pd.Series(np.cumsum(m1 * m2, axis=1)[:, -1])

def noop(df): df.write.format("noop").mode("overwrite").save()

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", DEFAULT_SF_DIR)
spark = get_spark("radares-ab-pairdot2")
spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).count()
from radares_spark.functions import vectors
from radares_spark.operators import semdedup
base = vectors.pair_dot
frames = {}
for tag, fn in (("base", base), ("cumsum", pair_dot_cumsum)):
    vectors.pair_dot = fn; semdedup.pair_dot = fn
    frames[tag] = semdedup.dedup_semantic(spark, sf_dir)
vectors.pair_dot = base; semdedup.pair_dot = base
for df in frames.values(): noop(df)
walls = {t: [] for t in frames}
for _ in range(8):
    for t, df in frames.items():
        t0 = time.perf_counter(); noop(df); walls[t].append(time.perf_counter()-t0)
for t, ws in walls.items():
    print(f"{t}: min={min(ws):.3f} med={statistics.median(ws):.3f}", flush=True)
spark.stop()
