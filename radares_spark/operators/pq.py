"""Product quantization (PQ) for the embedding store — the ANN
compression standard beyond scalar int8 (Jégou et al. 2011, "Product
quantization for nearest neighbor search"): split each D-dim vector
into M subspaces, k-means each subspace to K centroids, store M small
codes per vector (M bytes at K<=256 vs 4·D float bytes), and score
queries with asymmetric distance computation (ADC) — exact query
subvectors against a per-query lookup table of centroid dots.

Relationship to the rest of the family: ``quantize.py`` is the 4x
scalar compression (no training, exact integer dots), IVF is the
partition-pruning coarse quantizer; PQ is the fine quantizer that
takes the store from 4x to ~{D}x smaller. IVF-PQ composes: partition
by IVF cell, store PQ codes per cell.

Spark-first shapes (everything is DataFrame ops, no NumPy on the
corpus path):

- **train**: ONE exploded (vec_id, sub, subvector) frame trains ALL M
  subspaces in the same Lloyd iterations — per iteration: an equi-join
  against the (M x K)-row broadcast codebook, a per-(vec, sub) top-1
  window, and a (sub, code, dim) mean aggregate. No per-subspace
  driver loop, no crossJoin on the corpus.
- **encode**: same join + top-1, codes collected to an M-array per
  vector — one (vec, sub) shuffle.
- **ADC top-k**: the per-query table of dot(q_sub, centroid) is
  (n_queries x M x K) rows — kilobytes — folded into one array per
  query and broadcast; scoring is a codegen'd sum of M element_at
  lookups per corpus row, zero Python, corpus scanned in place.

Determinism: seeds are the K smallest-md5 vectors per subspace (no
RNG), ties in assignment break on code asc — stable across runs,
partitionings, and engines. Iterative k-means is not reasonably
SQL-expressible, so like ``build_ivf_index`` this module's quality
gate is recall tests (tests/test_pq.py), not a DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from radares_spark.functions.vectors import DIM

PQ_M = 4  # subspaces
PQ_K = 16  # centroids per subspace (codes fit a nibble at testdata SF)
SUB_DIM = DIM // PQ_M


def _sub_rows(emb: DataFrame, m: int = PQ_M, vec_col: str = "embedding") -> DataFrame:
    """(vec_id, sub, sv array<double>) — each vector split into its M
    subvectors; the array is materialized in a projection above the
    generator (the CollapseProject trap, see dedup.shingle_rows)."""
    if DIM % m != 0:
        raise ValueError(f"m={m} must divide DIM={DIM}: trailing dimensions "
                         "would be silently dropped from every distance")
    d = DIM // m
    v = emb.select(
        "vec_id", F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v")
    )
    return v.select(
        "vec_id",
        "v",
        F.explode(F.sequence(F.lit(0), F.lit(m - 1))).alias("sub"),
    ).select(
        "vec_id",
        "sub",
        F.slice(F.col("v"), F.col("sub") * d + 1, F.lit(d)).alias("sv"),
    )


def _l2sq(a: str, b: str, d: int) -> F.Column:
    """Squared L2 between two d-length arrays, unrolled per dimension
    (lambda HOFs are interpreted per element; unrolled terms stay in
    whole-stage codegen). d MUST match the caller's m (DIM // m) — a
    hard-coded module constant here silently produced NULL distances
    for any m != PQ_M (review finding)."""
    return sum(
        (F.element_at(F.col(a), i + 1) - F.element_at(F.col(b), i + 1)) ** 2
        for i in range(d)
    )


def train_pq(
    emb: DataFrame, m: int = PQ_M, k: int = PQ_K, iters: int = 3
) -> DataFrame:
    """Codebook (sub, code, cv array<double>) — M x K rows.

    Fails fast when the corpus has fewer than k vectors: the seeds are
    the k smallest-md5 vectors per subspace, so an undersized corpus
    would underfill the codebook and every downstream ADC index
    (sub*n_codes + code) would read past the folded table, silently
    dropping rows from top-k as NULL scores. The DIM % m check is
    hoisted here, BEFORE the distinct-count guard, so an invalid m
    never pays a corpus scan (it also re-fires inside _sub_rows for
    that function's other callers)."""
    if DIM % m != 0:
        raise ValueError(f"m={m} must divide DIM={DIM}: trailing dimensions "
                         "would be silently dropped from every distance")
    d = DIM // m
    n_avail = emb.select("vec_id").distinct().limit(k).count()
    if n_avail < k:
        raise ValueError(
            f"train_pq needs >= k={k} distinct vectors to fill each "
            f"subspace codebook; corpus has only {n_avail}"
        )
    rows = _sub_rows(emb, m)
    seeds = (
        rows.withColumn("h", F.md5(F.concat_ws(":", "sub", "vec_id")))
        .withColumn("rn", F.row_number().over(W.partitionBy("sub").orderBy("h", "vec_id")))
        .filter(F.col("rn") <= k)
    )
    codebook = seeds.select(
        "sub", (F.col("rn") - 1).alias("code"), F.col("sv").alias("cv")
    )
    assign_w = W.partitionBy("vec_id", "sub").orderBy(F.asc("d2"), F.asc("code"))
    for _ in range(iters):
        assigned = (
            rows.join(F.broadcast(codebook), "sub")
            .select("vec_id", "sub", "sv", "code", _l2sq("sv", "cv", d).alias("d2"))
            .withColumn("rn", F.row_number().over(assign_w))
            .filter(F.col("rn") == 1)
        )
        dims = (
            assigned.select("sub", "code", F.posexplode("sv").alias("i", "x"))
            .groupBy("sub", "code", "i")
            .agg(F.avg("x").alias("c"))
        )
        updated = (
            dims.groupBy("sub", "code")
            .agg(F.array_sort(F.collect_list(F.struct("i", "c"))).alias("ic"))
            .select(
                "sub", "code", F.transform(F.col("ic"), lambda s: s.c).alias("nv")
            )
        )
        # a cell nobody chose this round keeps its previous centroid —
        # the codebook must stay exactly M x K rows or the ADC table's
        # sub*K+code indexing (and the code space itself) misaligns
        codebook = (
            codebook.join(updated, ["sub", "code"], "left")
            .select("sub", "code", F.coalesce("nv", "cv").alias("cv"))
        )
    return codebook


def encode_pq(emb: DataFrame, codebook: DataFrame, m: int = PQ_M) -> DataFrame:
    """(vec_id, codes array<int>) — M codes per vector; ~M bytes vs
    4·D float bytes, the PQ compression itself."""
    d = DIM // m
    rows = _sub_rows(emb, m)
    assign_w = W.partitionBy("vec_id", "sub").orderBy(F.asc("d2"), F.asc("code"))
    best = (
        rows.join(F.broadcast(codebook), "sub")
        .select("vec_id", "sub", "code", _l2sq("sv", "cv", d).alias("d2"))
        .withColumn("rn", F.row_number().over(assign_w))
        .filter(F.col("rn") == 1)
    )
    return best.groupBy("vec_id").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("sub", "code"))),
            lambda s: s.code,
        ).alias("codes")
    )


def pq_topk(
    codes: DataFrame,
    codebook: DataFrame,
    queries: DataFrame,
    k: int = 5,
    m: int = PQ_M,
    n_codes: int = PQ_K,
) -> DataFrame:
    """(query_id, neighbor_id, adc_score) — ADC top-k: approximate
    dot(q, x) = sum over subspaces of dot(q_sub, centroid[code_sub]).

    The per-query lookup table is folded into ONE array (index
    sub*K + code) and broadcast; scoring is M element_at lookups per
    corpus row — codegen'd, no Python, corpus scanned in place."""
    d = DIM // m
    qrows = _sub_rows(queries, m).withColumnRenamed("vec_id", "query_id")
    qdot = sum(
        F.element_at(F.col("sv"), i + 1) * F.element_at(F.col("cv"), i + 1)
        for i in range(d)
    )
    table = (
        qrows.join(F.broadcast(codebook), "sub")
        .select("query_id", "sub", "code", qdot.alias("t"))
        .groupBy("query_id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("sub", "code", "t"))),
                lambda s: s.t,
            ).alias("tarr")
        )
    )
    score = sum(
        F.element_at(
            F.col("tarr"),
            (F.lit(s * n_codes) + F.element_at(F.col("codes"), s + 1) + 1).cast("int"),
        )
        for s in range(m)
    )
    scored = codes.crossJoin(F.broadcast(table)).select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        F.round(score, 6).alias("adc_score"),
    )
    rw = W.partitionBy("query_id").orderBy(F.desc("adc_score"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(rw))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "adc_score")
    )


def write_ivfpq_layout(
    emb: DataFrame,
    assignment: DataFrame,
    codebook: DataFrame,
    path: str,
    m: int = PQ_M,
    max_records_per_file: int = 4_000_000,
) -> None:
    """IVF-PQ serving store: PQ codes partitioned by trained IVF cell
    — the composition both families were built for. A row is
    (vec_id, codes array<int>) under ``cell=<id>`` partitions, so a
    probe (a) PARTITION-PRUNES to n_probe/n_cells of the files, like
    the float IVF store, and (b) reads M-byte codes instead of 4·D
    float bytes inside them — the two compressions multiply."""
    from radares_spark.io.layout import write_layout

    codes = encode_pq(emb, codebook, m)
    write_layout(
        codes.join(assignment, "vec_id"),
        path,
        partition_col="cell",
        sort_col="vec_id",
        max_records_per_file=max_records_per_file,
    )


def encode_residuals(
    emb: DataFrame, assignment: DataFrame, centroids: DataFrame
) -> DataFrame:
    """(vec_id, embedding = v - centroid[cell]) — the residual frame
    Jégou 2011's IVF-ADC actually quantizes (§5.1): residuals carry
    far less variance than raw vectors (the coarse quantizer already
    explained the cell-level structure), so the SAME MxK codebook
    spends its 16 codes per subspace on a tighter distribution —
    smaller quantization error at identical storage. One broadcast
    join + one zip_with projection; ``emb`` is (vec_id, embedding),
    ``assignment``/``centroids`` are build_ivf_index's outputs."""
    v = emb.select(
        "vec_id",
        F.transform(F.col("embedding"), lambda x: x.cast("double")).alias("v"),
    )
    return (
        v.join(assignment, "vec_id")
        .join(F.broadcast(centroids.select("cell", "cv")), "cell")
        .select(
            "vec_id",
            F.zip_with("v", "cv", lambda a, b: a - b).alias("embedding"),
        )
    )


def train_ivfpq_residual(
    emb: DataFrame,
    assignment: DataFrame,
    centroids: DataFrame,
    m: int = PQ_M,
    k: int = PQ_K,
    iters: int = 3,
) -> DataFrame:
    """Residual-PQ codebook: :func:`train_pq` over the residual frame.
    Pair with ``write_ivfpq_layout(encode_residuals(...), ...)`` and
    ``probe_ivfpq_topk(..., residual_store=True)``."""
    return train_pq(encode_residuals(emb, assignment, centroids), m, k, iters)


def probe_ivfpq_topk(
    spark,
    path: str,
    centroids: DataFrame,
    codebook: DataFrame,
    queries: DataFrame,
    n_probe: int = 2,
    k: int = 5,
    m: int = PQ_M,
    n_codes: int = PQ_K,
    residual_store: bool = False,
) -> DataFrame:
    """ADC top-k against a :func:`write_ivfpq_layout` store: queries
    route to their n_probe nearest IVF cells (broadcast centroids),
    the store scan partition-prunes to those cells, and scoring is the
    same M-lookup codegen'd ADC as :func:`pq_topk` — per-probe I/O is
    (n_probe/n_cells) x (M bytes per vector).

    ``residual_store=True`` scores a store whose codes quantize
    RESIDUALS (:func:`encode_residuals` + :func:`train_ivfpq_residual`):
    dot(q, x) decomposes exactly as dot(q, c) + dot(q, x - c), so the
    score adds the per-(query, cell) constant dot(q, centroid) to the
    ADC sum over the residual codebook — same lookup count, the only
    extra work is one scalar per probe row, and the approximation
    error drops to PQ-of-residual error (measurably better recall,
    pinned in tests/test_pq.py).

    ``queries`` here carries (vec_id, embedding, v, nrm) as produced
    by the similarity loaders; ``centroids`` is build_ivf_index's
    (cell, cv, cn)."""
    from radares_spark.functions.vectors import dot

    d = DIM // m
    q = queries.select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qn"),
    )
    qcos = dot("qv", "cv") / (F.col("qn") * F.col("cn"))
    # the raw dot rides along: it is the exact dot(q, centroid) term a
    # residual store adds back to every ADC score in that cell
    qdotc = dot("qv", "cv") if residual_store else F.lit(0.0)
    pw = W.partitionBy("query_id").orderBy(F.desc("qc"), F.asc("cell"))
    probes = (
        q.crossJoin(F.broadcast(centroids))
        .select("query_id", "qv", "cell", qcos.alias("qc"), qdotc.alias("qdc"))
        .withColumn("prn", F.row_number().over(pw))
        .filter(F.col("prn") <= n_probe)
        .select("query_id", "qv", "cell", "qdc")
    )
    # per-(query, cell) ADC tables — same fold as pq_topk, built from
    # the probe rows' query subvectors
    qsub = probes.select(
        "query_id",
        "cell",
        "qdc",
        F.explode(F.sequence(F.lit(0), F.lit(m - 1))).alias("sub"),
        F.col("qv"),
    ).select(
        "query_id",
        "cell",
        "qdc",
        "sub",
        F.slice(F.col("qv"), F.col("sub") * d + 1, F.lit(d)).alias("sv"),
    )
    qdot = sum(
        F.element_at(F.col("sv"), i + 1) * F.element_at(F.col("cv"), i + 1)
        for i in range(d)
    )
    table = (
        qsub.join(F.broadcast(codebook), "sub")
        .select("query_id", "cell", "qdc", "sub", "code", qdot.alias("t"))
        .groupBy("query_id", "cell")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("sub", "code", "t"))),
                lambda s: s.t,
            ).alias("tarr"),
            F.first("qdc").alias("qdc"),
        )
    )
    stored = spark.read.parquet(path)
    score = F.col("qdc") + sum(
        F.element_at(
            F.col("tarr"),
            (F.lit(s * n_codes) + F.element_at(F.col("codes"), s + 1) + 1).cast("int"),
        )
        for s in range(m)
    )
    scored = stored.join(F.broadcast(table), "cell").select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        F.round(score, 6).alias("adc_score"),
    )
    rw = W.partitionBy("query_id").orderBy(F.desc("adc_score"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(rw))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "adc_score")
    )
