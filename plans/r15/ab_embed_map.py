import os, sys, time, tempfile, statistics
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from radares_spark.session import get_spark
import bench

sf_dir = "/root/testdata/sf0.1"
spark = get_spark("ab-embed-map")
spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).count()

import numpy as np
import pandas as pd

def old_udf(dim):
    @F.pandas_udf("array<double>")
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
                ends = np.cumsum(lens); starts = ends - lens
                for r in range(n):
                    if lens[r]:
                        acc[r] = np.cumsum(sq[starts[r]:ends[r]])[-1]
            ok = acc > 0
            mat[ok] /= np.sqrt(acc[ok])[:, None]
            for r in np.flatnonzero(ok):
                out[r] = mat[r]
        return pd.Series(out)
    return dense.asNondeterministic()

from radares_spark.operators import embed
from radares_spark.operators.dedup import normalize_text
from radares_spark.io.tables import spread

def old_hashed_tf(docs, dim):
    norm = normalize_text(F.coalesce(F.col("text"), F.lit("")))
    toks = (docs.select("doc_id", norm.alias("__t")).filter(F.col("__t")!="")
            .select("doc_id", F.explode(F.split("__t"," ")).alias("tok"))
            .withColumn("w", F.lit(1.0)))
    cells = (toks.select("doc_id", embed._bucket(F.col("tok"),dim).alias("i"),
                         (embed._sign(F.col("tok"))*F.col("w")).alias("x"))
             .groupBy("doc_id","i").agg(F.sum("x").alias("x")))
    if dim >= embed.DENSE_SPREAD_DIM:
        cap = int(docs.sparkSession.conf.get("spark.sql.shuffle.partitions"))
        cells = cells.repartition(cap, "doc_id")
    ix = cells.groupBy("doc_id").agg(F.array_sort(F.collect_list(F.struct("i","x"))).alias("ix"))
    split = ix.select("doc_id", F.transform("ix", lambda s: s.i).alias("ii"),
                      F.transform("ix", lambda s: s.x).alias("xx"))
    return (split.select("doc_id", old_udf(dim)("ii","xx").alias("embedding"))
            .filter(F.col("embedding").isNotNull()))

def noop(df): df.write.format("noop").mode("overwrite").save()
def t4(df, tag, reps=4):
    noop(df); w=[]
    for _ in range(reps):
        t0=time.perf_counter(); noop(df); w.append(time.perf_counter()-t0)
    print(f"{tag}: min={min(w):.3f} med={statistics.median(w):.3f}", flush=True)

docs = spread(spark, sf_dir, "documents").select("doc_id","text")
for dim in (16, 4096):
    a = old_hashed_tf(docs, dim)
    b = embed.hashed_tf(docs, dim)
    d = a.exceptAll(b).count() + b.exceptAll(a).count()
    print(f"dim={dim}: row diff old-vs-new = {d}", flush=True)
t4(old_hashed_tf(docs,4096), "small dim4096 OLD")
t4(embed.hashed_tf(docs,4096), "small dim4096 NEW")

big = tempfile.mkdtemp(prefix="abmap_")
bench._build_scaled_documents(spark, sf_dir, big, 10)
bdocs = spread(spark, big, "documents").select("doc_id","text")
a = old_hashed_tf(bdocs, 4096); b = embed.hashed_tf(bdocs, 4096)
d = a.exceptAll(b).count() + b.exceptAll(a).count()
print(f"BIG dim=4096: row diff = {d}", flush=True)
t4(a, "big dim4096 OLD", 3)
t4(b, "big dim4096 NEW", 3)
import shutil; shutil.rmtree(big, ignore_errors=True)
spark.stop()
