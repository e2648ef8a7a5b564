import os, sys, time, tempfile, statistics
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from radares_spark.session import get_spark
import bench

sf_dir = "/root/testdata/sf0.1"
spark = get_spark("embed-scale-probe2")
spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).count()
big = tempfile.mkdtemp(prefix="probe_scale2_")
bench._build_scaled_documents(spark, sf_dir, big, 10)
from radares_spark.operators.embed import hashed_tf
from radares_spark.io.tables import spread
def noop(df): df.write.format("noop").mode("overwrite").save()
docs = spread(spark, big, "documents").select("doc_id", "text")
for rec in ("10000","1000","256"):
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", rec)
    df = hashed_tf(docs, 4096)
    noop(df)
    w=[]
    for _ in range(3):
        t0=time.perf_counter(); noop(df); w.append(time.perf_counter()-t0)
    print(f"big full batch={rec}: min={min(w):.2f} med={statistics.median(w):.2f}", flush=True)
spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
import shutil; shutil.rmtree(big, ignore_errors=True)
spark.stop()
