import os, sys, time, tempfile, statistics
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from radares_spark.session import get_spark
import bench

sf_dir = "/root/testdata/sf0.1"
spark = get_spark("embed-scale-probe")
spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).count()
big = tempfile.mkdtemp(prefix="probe_scale_")
n = bench._build_scaled_documents(spark, sf_dir, big, 10)
print("big rows:", n, flush=True)

from radares_spark.operators.embed import hashed_tf, _bucket, _sign, DENSE_SPREAD_DIM
from radares_spark.operators.dedup import normalize_text
from radares_spark.io.tables import spread

def noop(df): df.write.format("noop").mode("overwrite").save()
def t3(df, tag):
    noop(df)
    w=[]
    for _ in range(3):
        t0=time.perf_counter(); noop(df); w.append(time.perf_counter()-t0)
    print(f"{tag}: min={min(w):.2f} med={statistics.median(w):.2f}", flush=True)

for tag, d in (("small", sf_dir), ("big", big)):
    docs = spread(spark, d, "documents").select("doc_id", "text")
    norm = normalize_text(F.coalesce(F.col("text"), F.lit("")))
    toks = (docs.select("doc_id", norm.alias("__t")).filter(F.col("__t")!="")
            .select("doc_id", F.explode(F.split("__t"," ")).alias("tok")))
    cells = (toks.select("doc_id", _bucket(F.col("tok"),4096).alias("i"),
                         (_sign(F.col("tok"))*F.lit(1.0)).alias("x"))
             .groupBy("doc_id","i").agg(F.sum("x").alias("x")))
    t3(cells, f"{tag} cells-agg")
    cap = int(spark.conf.get("spark.sql.shuffle.partitions"))
    rep = cells.repartition(cap, "doc_id")
    ix = rep.groupBy("doc_id").agg(F.array_sort(F.collect_list(F.struct("i","x"))).alias("ix"))
    t3(ix, f"{tag} regroup")
    t3(hashed_tf(docs, 4096), f"{tag} full")
import shutil; shutil.rmtree(big, ignore_errors=True)
spark.stop()
