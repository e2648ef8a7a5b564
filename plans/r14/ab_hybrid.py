"""A/B: text_hybrid_rrf_topk — share ONE token/tf subtree between the
BM25 branch and the sparse-cosine branch (the current form tokenizes
the corpus from scratch in each branch, and the dense branch assembles
dense arrays via the Arrow scatter only to re-explode them to sparse
cells).

Variant v1 (shared-tf, sparse-native dense branch):
  toks -> tf(doc_id, tok, tf) is computed once; BM25's postings/df/
  stats derive from it as before, and the dense branch derives its
  (doc_id, i, x) cells from tf algebraically:
      sum over token INSTANCES of sign(tok)  ==  sum over token TYPES
      of sign(tok) * tf
  x stays integral (w = 1.0), so the cell sums, the norm
  sqrt(sum(x^2)) and the unit values x/n are bit-identical to the
  hashed_tf dense-fold path; cos rounds to 4 decimals as before.

Protocol: full row-multiset equality asserted BEFORE timing, then
interleaved warm noop reps in one session.
"""
from __future__ import annotations

import os
import statistics
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[2]
sys.path.insert(0, str(REPO))

from pyspark.sql import Window as W  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from radares_spark.session import DEFAULT_SF_DIR, get_spark  # noqa: E402

REPS = int(os.environ.get("AB_REPS", "4"))


def timeit_interleaved(dfs: dict):
    # one cold materialization each, then interleaved warm reps
    for df in dfs.values():
        df.write.format("noop").mode("overwrite").save()
    walls = {k: [] for k in dfs}
    for _ in range(REPS):
        for k, df in dfs.items():
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            walls[k].append(time.perf_counter() - t0)
    med = {k: round(statistics.median(v), 3) for k, v in walls.items()}
    mn = {k: round(min(v), 3) for k, v in walls.items()}
    return med, mn, walls


def build_v1(spark, sf_dir):
    from radares_spark.operators.dedup import _docs
    from radares_spark.operators.embed import EMBED_DIM, _bucket, _sign
    from radares_spark.operators.retrieval import (
        B,
        K1,
        N_QUERY_DOCS,
        RRF_POOL,
        TOP_K,
        _bm25_term_score,
        _corpus_stats,
        _seed_queries,
        query_terms,
        rrf_fuse,
        tokenize,
    )

    docs = _docs(spark, sf_dir)
    toks = tokenize(docs)
    tf = toks.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("tf"))
    postings = tf.withColumn("dl", F.sum("tf").over(W.partitionBy("doc_id")))
    df_tab, stats = _corpus_stats(postings)
    qterms = query_terms(_seed_queries(docs))
    scored = (
        postings.join(F.broadcast(qterms), "tok")
        .join(df_tab, "tok")
        .crossJoin(F.broadcast(stats))
        .groupBy("query_id", "doc_id")
        .agg(F.round(F.sum(_bm25_term_score(K1, B)), 6).alias("score"))
    )
    rn = F.row_number().over(
        W.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    )
    lex = (
        scored.withColumn("rank", rn)
        .filter(F.col("rank") <= RRF_POOL)
        .select("query_id", "doc_id", "score", "rank")
    )

    # dense branch from the SAME tf
    cells = (
        tf.select(
            "doc_id",
            _bucket(F.col("tok"), EMBED_DIM).alias("i"),
            (_sign(F.col("tok")) * F.col("tf").cast("double")).alias("x"),
        )
        .groupBy("doc_id", "i")
        .agg(F.sum("x").alias("x"))
        .filter(F.col("x") != 0)
    )
    nrm = cells.groupBy("doc_id").agg(
        F.sqrt(F.sum(F.col("x") * F.col("x"))).alias("n")
    )
    unit = (
        cells.join(nrm, "doc_id")
        .filter(F.col("n") > 0)
        .select("doc_id", "i", (F.col("x") / F.col("n")).alias("v"))
    )
    qunit = unit.filter(F.col("doc_id") < N_QUERY_DOCS).select(
        F.col("doc_id").alias("query_id"), "i", F.col("v").alias("qv")
    )
    cos_scored = (
        unit.join(F.broadcast(qunit), "i")
        .groupBy("query_id", "doc_id")
        .agg(F.round(F.sum(F.col("qv") * F.col("v")), 4).alias("cos"))
    )
    rnd = F.row_number().over(
        W.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("doc_id"))
    )
    dense = (
        cos_scored.withColumn("rank", rnd)
        .filter(F.col("rank") <= RRF_POOL)
        .select("query_id", "doc_id", "cos", "rank")
    )
    return rrf_fuse([lex, dense], k=TOP_K)


def build_v2(spark, sf_dir):
    """Base structure, but the dense QUERY branch computes hashed_tf
    over a doc_id-filtered scan instead of joining the full-corpus
    embedding output: hashed_tf is per-doc (no corpus statistics at
    tf_idf=False), so filter commutes with it exactly."""
    from radares_spark.operators.dedup import _docs
    from radares_spark.operators.embed import EMBED_DIM, hashed_tf
    from radares_spark.operators.retrieval import (
        N_QUERY_DOCS,
        RRF_POOL,
        TOP_K,
        _seed_queries,
        bm25_topk,
        rrf_fuse,
    )

    docs = _docs(spark, sf_dir)
    lex = bm25_topk(docs, _seed_queries(docs), k=RRF_POOL)
    emb = hashed_tf(docs, EMBED_DIM)
    qemb = hashed_tf(docs.filter(F.col("doc_id") < N_QUERY_DOCS), EMBED_DIM)
    cells = emb.select(
        "doc_id", F.posexplode("embedding").alias("i", "v")
    ).filter(F.col("v") != 0)
    qcells = (
        qemb.select("doc_id", F.posexplode("embedding").alias("i", "v"))
        .filter(F.col("v") != 0)
        .select(F.col("doc_id").alias("query_id"), "i", F.col("v").alias("qv"))
    )
    scored = (
        cells.join(F.broadcast(qcells), "i")
        .groupBy("query_id", "doc_id")
        .agg(F.round(F.sum(F.col("qv") * F.col("v")), 4).alias("cos"))
    )
    rn = F.row_number().over(
        W.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("doc_id"))
    )
    dense = (
        scored.withColumn("rank", rn)
        .filter(F.col("rank") <= RRF_POOL)
        .select("query_id", "doc_id", "cos", "rank")
    )
    return rrf_fuse([lex, dense], k=TOP_K)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", DEFAULT_SF_DIR)
    spark = get_spark("radares-ab-hybrid")
    os.environ.setdefault("SPARK_GRAFT_SF_DIR", sf_dir)

    from radares_spark.plans import REGISTRY

    base = REGISTRY["text_hybrid_rrf_topk"].fn(spark, sf_dir)
    v1 = build_v2(spark, sf_dir)

    rows_b = sorted(map(tuple, base.collect()))
    rows_v = sorted(map(tuple, v1.collect()))
    print(f"rows base={len(rows_b)} v1={len(rows_v)} equal={rows_b == rows_v}")
    if rows_b != rows_v:
        for a, b in zip(rows_b, rows_v):
            if a != b:
                print("DIFF", a, b)
                break
        spark.stop()
        sys.exit(1)

    for tag, df in (("base", base), ("v1", v1)):
        p = df._jdf.queryExecution().executedPlan().toString()
        print(
            f"{tag}: scans={p.count('Scan parquet')} "
            f"exch={p.count('Exchange')} arrow={p.count('ArrowEvalPython')} "
            f"reused={p.count('ReusedExchange') + p.count('reused')}"
        )

    med, mn, walls = timeit_interleaved({"base": base, "v1": v1})
    print("medians:", med)
    print("mins:", mn)
    print("walls:", {k: [round(x, 3) for x in v] for k, v in walls.items()})
    spark.stop()


if __name__ == "__main__":
    main()
