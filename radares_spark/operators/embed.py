"""Engine-native text embeddings via feature hashing (Weinberger et
al. 2009, "Feature Hashing for Large Scale Multitask Learning") —
the bridge between the text stack and the similarity/ANN stack: every
similarity operator here (cosine/IVF/PQ top-k, SemDeDup, hyperplane
LSH) consumes an ``array<double>`` column, and until now only the
synthetic embeddings table provided one. ``hashed_tf`` turns raw text
into such a column with no external model:

- token -> bucket ``md5(token) % dim``, with a SIGN from an
  independent hash bit (the Weinberger sign trick: collisions add
  with random sign, so inner products stay unbiased);
- bucket values are (signed) token counts, optionally IDF-weighted
  (``tf_idf=True`` — ln((N+1)/(df+1)) from one document-frequency
  aggregate, broadcast);
- L2-normalized, so downstream cosine is a plain dot.

Scale shape: one gram-stream aggregate per doc x bucket (map-side
combined; at most ``dim`` rows per doc), one regroup to assemble the
array. The IDF table is vocabulary-sized, so it joins WITHOUT a
broadcast hint — AQE picks broadcast vs shuffle from runtime stats
(small curated vocab broadcasts itself; a web-scale one shuffles
instead of OOMing the driver). Everything is md5-deterministic, so the
DuckDB mirror hash-matches bit-for-bit and dedup/banding downstream
stays engine-portable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from radares_spark.io.tables import load_table
from radares_spark.operators.dedup import NORM_SQL, _md5, normalize_text
from radares_spark.registry import QuerySpec

EMBED_DIM = 16
# dims at/above this spread the dense-assembly regroup explicitly —
# see the DENSE_SPREAD_DIM comment in hashed_tf
DENSE_SPREAD_DIM = 512


def _bucket(tok: Column, dim: int) -> Column:
    # shared _md5 (explicit UTF-8 encode) — the cross-engine hashing
    # recipe every other operator standardized on (review finding:
    # this module was the one call site relying on the implicit cast)
    return F.conv(F.substring(_md5(tok), 1, 8), 16, 10).cast("long") % dim


def _sign(tok: Column) -> Column:
    # independent hash bit (salted stream): +1 / -1
    return F.when(
        F.conv(F.substring(_md5(F.concat(F.lit("sgn:"), tok)), 1, 8), 16, 10)
        .cast("long")
        % 2
        == 0,
        F.lit(1.0),
    ).otherwise(F.lit(-1.0))


def hashed_tf(
    docs: DataFrame,
    dim: int = EMBED_DIM,
    tf_idf: bool = False,
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, embedding array<double>) — L2-normalized hashed
    bag-of-words vectors. Docs with no tokens (empty normalized text)
    AND docs whose raw vector has zero norm (all-ubiquitous tokens
    under tf_idf — every IDF weight 0 — or full sign cancellation) are
    DROPPED: a zero vector poisons every cosine, the same rule
    ``embedding_store_health`` audits. Preserve a doc spine downstream
    with a left join."""
    norm = normalize_text(F.coalesce(F.col(text_col), F.lit("")))
    toks = (
        docs.select("doc_id", norm.alias("__t"))
        .filter(F.col("__t") != "")
        .select("doc_id", F.explode(F.split("__t", " ")).alias("tok"))
    )
    if tf_idf:
        # pin the token stream ONCE: both the document-frequency
        # aggregate and the join probe consume it, and lazily each
        # re-runs the 4-regexp normalize chain + explode over the
        # corpus (review finding; measured 1.9 s lazy vs 1.4 s pinned
        # warm at sf0.1 — unlike winnow's post-shuffle aggregate,
        # this subtree is a pre-shuffle projection AQE cannot reuse)
        toks = toks.localCheckpoint(eager=True)
        n_docs = docs.select(F.count(F.lit(1)).alias("n"))
        df_tab = (
            toks.select("doc_id", "tok")
            .distinct()
            .groupBy("tok")
            .agg(F.count(F.lit(1)).alias("df"))
            .crossJoin(F.broadcast(n_docs))
            .select(
                "tok", F.log((F.col("n") + 1) / (F.col("df") + 1)).alias("w")
            )
        )
        # no broadcast HINT: the IDF table is vocabulary-sized (~10^8
        # rows at web scale) — let AQE pick broadcast vs shuffle from
        # runtime stats instead of forcing a driver OOM at scale
        toks = toks.join(df_tab, "tok")
    else:
        toks = toks.withColumn("w", F.lit(1.0))
    cells = (
        toks.select(
            "doc_id",
            _bucket(F.col("tok"), dim).alias("i"),
            (_sign(F.col("tok")) * F.col("w")).alias("x"),
        )
        .groupBy("doc_id", "i")
        .agg(F.sum("x").alias("x"))
    )
    # Dense assembly + L2 normalization in ONE Arrow-batched numpy
    # scatter (r7). The previous JVM form — transform(sequence(0,
    # dim-1), i -> coalesce(m[i], 0.0)) + two more interpreted HOF
    # passes — paid an O(nnz) LINEAR map probe per dense index
    # (ArrayBasedMapData has no hash lookup), O(dim * nnz) per doc:
    # unmeasurable at dim=16, but at a production dim=4096 it turned
    # a 5000-doc corpus into >8 min of interpreted expression time
    # (never finished); the scatter form runs the same corpus in
    # seconds. This is the third documented Arrow-Python node, same
    # dense-linear-algebra justification as functions/vectors.pair_dot.
    # Parity is bit-exact: cells are scattered and accumulated in
    # ascending index order, which equals the dense left-to-right
    # fold (interleaved zeros add exactly nothing to a float sum).
    # The regroup + scatter's per-ROW cost scales with dim (a dense
    # dim-width array is built per doc), but the post-agg cell frame is
    # BYTE-small, so AQE coalesces its shuffle to ~1 partition and
    # single-threads the whole assembly — measured 7.1 s vs 1.x s at
    # dim=4096/sf0.1. Above DENSE_SPREAD_DIM the regroup is explicitly
    # spread to the session shuffle width (explicit-count repartition
    # on the group key: AQE never coalesces it, and the groupBy reuses
    # the partitioning — no second Exchange). Below the threshold the
    # extra Exchange would cost more than the scatter (the fixed-32-
    # on-kilobytes lesson, io/tables.spread docstring), so dim-16
    # oracle-spec plans are unchanged.
    if dim >= DENSE_SPREAD_DIM:
        cap = int(docs.sparkSession.conf.get("spark.sql.shuffle.partitions"))
        cells = cells.repartition(cap, "doc_id")
    ix = cells.groupBy("doc_id").agg(
        F.array_sort(F.collect_list(F.struct("i", "x"))).alias("ix")
    )
    split = ix.select(
        "doc_id",
        F.transform("ix", lambda s: s.i).alias("ii"),
        F.transform("ix", lambda s: s.x).alias("xx"),
    )
    # zero-norm vectors are DROPPED, not emitted (review finding: the
    # previous nrm==0 branch returned the all-zero vector, which the
    # docstring forbids and embedding_store_health flags — reachable
    # via all-ubiquitous-token docs under tf_idf (every IDF weight 0)
    # or full sign cancellation under plain TF). The UDF returns NULL
    # for them; the filter drops the rows.
    return (
        split.select("doc_id", _dense_unit_udf(dim)("ii", "xx").alias("embedding"))
        .filter(F.col("embedding").isNotNull())
    )


def _dense_unit_udf(dim: int):
    """Arrow-batched (indices, values) -> L2-normalized dense
    array<double> of length ``dim``; NULL when the norm is zero.
    The norm accumulates left-to-right over ascending indices in
    float64 — exactly the old dense F.aggregate fold's bracketing
    and DuckDB's list_reduce, so oracle hashes are unchanged."""
    import numpy as np
    import pandas as pd

    # no type-hint signature: locally-imported pd makes the string
    # annotations unresolvable for Spark's hint inference — same
    # explicit-returnType style as functions/vectors.pair_dot
    @F.pandas_udf("array<double>")
    def dense(ii, xx):
        # One flattened scatter for the whole batch (r8: the r7 form
        # looped rows in Python). (row, index) pairs are unique —
        # groupBy(doc_id, i) upstream — so plain fancy assignment
        # scatters everything at once. The norm must stay the
        # SEQUENTIAL ascending-index fold (np.sum/reduceat use
        # pairwise summation — measurably different low bits, and the
        # oracle's list_reduce is sequential), so it folds across the
        # dense matrix's columns in index order: interleaved zeros add
        # exactly nothing to a float sum, making the column fold
        # bit-identical to the per-row fold over present cells only.
        n = len(ii)
        out = np.empty(n, dtype=object)
        if n:
            lens = np.fromiter((len(a) for a in ii), dtype=np.int64, count=n)
            rows = np.repeat(np.arange(n, dtype=np.int64), lens)
            mat = np.zeros((n, dim), dtype=np.float64)
            if rows.size:
                flat_i = np.concatenate(
                    [np.asarray(a, dtype=np.int64) for a in ii]
                )
                flat_x = np.concatenate(
                    [np.asarray(a, dtype=np.float64) for a in xx]
                )
                mat[rows, flat_i] = flat_x
            # Sequential ascending-index norm fold WITHOUT the dim-wide
            # column loop: per row, np.cumsum over the PRESENT cells'
            # squares — cumsum is sequential by definition, and the
            # interleaved zeros of the dense fold add exactly nothing,
            # so the last prefix equals the column fold bit-for-bit
            # (asserted against the r8 loop on random data; np.sum and
            # add.reduceat are pairwise and do NOT match). The column
            # loop was 4096 numpy passes per batch — measured 2.6 s vs
            # 0.05 s for 20k rows at dim=4096.
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
            for r in np.flatnonzero(ok):
                out[r] = mat[r]
        return pd.Series(out)

    # Nondeterministic marking stops the optimizer from cloning the
    # UDF below the isNotNull filter (one ArrowEvalPython node instead
    # of two — the filter-over-UDF duplication): every doc otherwise
    # pays the dim-wide scatter + Arrow transfer twice. Values are
    # unchanged (the function is pure); measured 2.2x at dim=4096.
    #
    # NOTE (r15 A/B, plans/r15/ab_embed4k.py): a float32 return type
    # (halving the Python->JVM Arrow bytes at dim=4096) measured
    # row-DIFFERENT (9888 rows at sf0.1 — float32 quantizes the
    # full-precision doubles) and was rejected by the equality gate;
    # Arrow batch-size sweeps (10k/2k/500 records) showed the default
    # best. The de-cloned float64 kernel is the measured floor.
    return dense.asNondeterministic()


def text_hash_embed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exploded, rounded form for the oracle (array<double> outputs
    don't hash-compare; (doc_id, i, v) rows do)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    emb = hashed_tf(docs, EMBED_DIM)
    return emb.select(
        "doc_id", F.posexplode("embedding").alias("i", "v")
    ).select("doc_id", "i", F.round("v", 6).alias("v"))


HASH_EMBED_SQL = f"""
    WITH toks AS (
        SELECT doc_id, unnest(string_split(t, ' ')) AS tok
        FROM (SELECT doc_id, {NORM_SQL.format(c="coalesce(text, '')")} AS t
              FROM documents)
        WHERE t <> ''
    ),
    cells AS (
        SELECT doc_id,
               ('0x' || substr(md5(tok), 1, 8))::BIGINT % {EMBED_DIM} AS i,
               sum(CASE WHEN ('0x' || substr(md5('sgn:' || tok), 1, 8))::BIGINT % 2 = 0
                        THEN 1.0 ELSE -1.0 END) AS x
        FROM toks GROUP BY doc_id, i
    ),
    nrm AS (
        SELECT doc_id, sqrt(sum(x * x)) AS n FROM cells GROUP BY doc_id
    ),
    grid AS (
        SELECT d.doc_id, g.i
        FROM (SELECT DISTINCT doc_id FROM cells) d,
             (SELECT unnest(generate_series(0, {EMBED_DIM - 1})) AS i) g
    )
    SELECT g.doc_id, g.i,
           round(coalesce(c.x, 0.0) / n.n, 6) AS v
    FROM grid g
    LEFT JOIN cells c ON c.doc_id = g.doc_id AND c.i = g.i
    JOIN nrm n ON n.doc_id = g.doc_id
    WHERE n.n > 0
"""


def text_hash_embed_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    emb = hashed_tf(docs, EMBED_DIM, tf_idf=True)
    return emb.select(
        "doc_id", F.posexplode("embedding").alias("i", "v")
    ).select("doc_id", "i", F.round("v", 6).alias("v"))


# N counts ALL docs (incl. NULL/empty text — they are corpus members
# even though they emit no tokens), mirroring hashed_tf's count(*)
HASH_EMBED_TFIDF_SQL = f"""
    WITH toks AS (
        SELECT doc_id, unnest(string_split(t, ' ')) AS tok
        FROM (SELECT doc_id, {NORM_SQL.format(c="coalesce(text, '')")} AS t
              FROM documents)
        WHERE t <> ''
    ),
    idf AS (
        SELECT tok,
               ln(((SELECT count(*) FROM documents) + 1)
                  / (count(DISTINCT doc_id) + 1)::DOUBLE) AS w
        FROM toks GROUP BY tok
    ),
    cells AS (
        SELECT t.doc_id,
               ('0x' || substr(md5(t.tok), 1, 8))::BIGINT % {EMBED_DIM} AS i,
               sum((CASE WHEN ('0x' || substr(md5('sgn:' || t.tok), 1, 8))::BIGINT % 2 = 0
                         THEN 1.0 ELSE -1.0 END) * idf.w) AS x
        FROM toks t JOIN idf USING (tok) GROUP BY t.doc_id, i
    ),
    nrm AS (
        SELECT doc_id, sqrt(sum(x * x)) AS n FROM cells GROUP BY doc_id
    ),
    grid AS (
        SELECT d.doc_id, g.i
        FROM (SELECT DISTINCT doc_id FROM cells) d,
             (SELECT unnest(generate_series(0, {EMBED_DIM - 1})) AS i) g
    )
    SELECT g.doc_id, g.i,
           round(coalesce(c.x, 0.0) / n.n, 6) AS v
    FROM grid g
    LEFT JOIN cells c ON c.doc_id = g.doc_id AND c.i = g.i
    JOIN nrm n ON n.doc_id = g.doc_id
    WHERE n.n > 0
"""


LIBRARY_SPECS: dict[str, QuerySpec] = {
    "text_hash_embed": QuerySpec(
        name="text_hash_embed",
        fn=text_hash_embed,
        oracle=HASH_EMBED_SQL,
        survey="LLM-pipeline (feature-hashing text embeddings, "
        "Weinberger 2009 — engine-native vectors feeding the "
        "similarity/ANN/SemDeDup stack)",
        doc=f"L2-normalized {EMBED_DIM}-bucket signed hashed "
        "bag-of-words per doc, exploded to (doc_id, i, v) for the "
        "oracle; one map-side-combined (doc, bucket) aggregate + one "
        "doc regroup, md5-deterministic across engines.",
    ),
    "text_hash_embed_tfidf": QuerySpec(
        name="text_hash_embed_tfidf",
        fn=text_hash_embed_tfidf,
        oracle=HASH_EMBED_TFIDF_SQL,
        survey="LLM-pipeline (IDF-weighted feature-hashing embeddings)",
        doc="The tf_idf=True branch hash-verified end to end: per-token "
        "ln((N+1)/(df+1)) from one document-frequency aggregate (N "
        "counts ALL docs incl. token-less ones), signed-bucket "
        "accumulation, L2 normalization — same shapes as the TF form "
        "plus one vocabulary-keyed equi-join (AQE-sized, no forced "
        "broadcast).",
    ),
}
