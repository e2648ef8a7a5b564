"""Connected components over a pair table — transitive dedup groups.

The near-dup stage produces PAIRS (a ~ b). Pairwise keep-first dropping
handles chains reachable through kept docs, but full canonicalization
("every doc maps to the minimum id of its transitive group") needs
connected components. This is the iterated min-label propagation:

    label(v) <- min(label(v), min over neighbors(label(u)))

run as DataFrame self-joins until a fixed point. Convergence is
O(diameter) rounds; near-dup graphs are unions of small cliques/chains
(diameter rarely > a handful), so 5-10 rounds close ~any real corpus.
Each round is two shuffles over the edge list — the same cost profile
GraphX/graphframes pays, with zero extra dependencies.

The fixed-point check counts CHANGED labels (join new vs previous on
the node, count label <> prev) — type-agnostic, so node ids may be
longs OR strings (md5-keyed pair tables); an aggregate like
``sum(label)`` would crash on string ids. No driver-side collect of
data, one scalar per round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame, a: str = "doc_a", b: str = "doc_b", max_iter: int = 10
) -> DataFrame:
    """(node, component) for every node in ``pairs``; component = min
    node id of the transitive group. Raises if not converged within
    ``max_iter`` (pathological diameter — raise the bound)."""
    edges = (
        pairs.select(F.col(a).alias("u"), F.col(b).alias("v"))
        .unionByName(pairs.select(F.col(b).alias("u"), F.col(a).alias("v")))
        .distinct()
    )
    labels = (
        edges.groupBy("u")
        .agg(F.min("v").alias("nbr_min"))
        .select("u", F.least(F.col("u"), F.col("nbr_min")).alias("label"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        # propagate: each node takes min(own label, neighbors' labels)
        nbr = (
            edges.join(labels.withColumnRenamed("u", "v"), "v")
            .groupBy("u")
            .agg(F.min("label").alias("nbr_label"))
        )
        new_labels = (
            labels.join(nbr, "u", "left")
            .select(
                "u",
                F.least(F.col("label"), F.coalesce("nbr_label", F.col("label"))).alias(
                    "label"
                ),
            )
            .localCheckpoint(eager=True)  # truncate the iterative lineage
        )
        # type-agnostic fixed point: count labels that changed this round
        # (works for string node ids too — min/least order strings fine,
        # but sum() would not). Both frames are checkpointed => cheap.
        changed = (
            new_labels.join(labels.withColumnRenamed("label", "prev"), "u")
            .filter(F.col("label") != F.col("prev"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            return labels.select(F.col("u").alias("node"), F.col("label").alias("component"))
    raise RuntimeError(f"connected_components: no fixed point in {max_iter} rounds")


def canonical_near_dup_drops(pairs: DataFrame) -> DataFrame:
    """doc_ids to drop so each transitive near-dup GROUP keeps exactly
    its minimum member — the exhaustive alternative to pairwise
    keep-first (pipeline/corpus.near_dup_drops)."""
    cc = connected_components(pairs)
    return cc.filter(F.col("node") != F.col("component")).select(
        F.col("node").alias("doc_id")
    )


def cluster_representatives(
    members: DataFrame,
    scores: DataFrame,
    id_col: str = "doc_id",
    score_col: str = "score",
) -> DataFrame:
    """(doc_id, component, score, rep_doc_id, keep) — pick ONE
    representative per transitive duplicate group: the highest-score
    member, tie-broken by minimum id. ``members`` is
    ``connected_components`` output (node, component); ``scores`` maps
    every member id to a quality signal (length for the SlimPajama
    keep-longest policy, a classifier probability, PageRank of the
    source host, ...).

    min-id canonicalization (canonical_near_dup_drops) keeps an
    ARBITRARY member; real pipelines keep the best one — dropping a
    long original in favor of its truncated copy loses data for no
    reason. One window per component (groups are near-dup cliques —
    small by construction, no skew concern), emitted for every member
    so the caller gets both the keep-list and the drop-list in one
    frame."""
    m = members.select(
        F.col("node").alias(id_col), "component"
    ).join(scores.select(id_col, score_col), id_col)
    w = W.partitionBy("component").orderBy(
        F.col(score_col).desc_nulls_last(), F.col(id_col).asc()
    )
    return m.select(
        id_col,
        "component",
        score_col,
        F.first(id_col).over(w).alias("rep_doc_id"),
    ).withColumn(
        "keep", F.when(F.col(id_col) == F.col("rep_doc_id"), 1).otherwise(0)
    )


def pagerank(
    edges: DataFrame,
    iters: int = 15,
    damping: float = 0.85,
    src: str = "src_host",
    dst: str = "dst_host",
    weight: str | None = "n_links",
) -> DataFrame:
    """(node, rank) — weighted PageRank over an edge table (e.g. the
    host link graph from ``urls.outlink_host_graph``), the standard
    crawl-prioritization signal.

    Power iteration as DataFrame ops: per round, one equi-join of the
    edge list against the rank table (contribution = rank x
    weight/out-weight), one sum-per-destination aggregate, plus the
    damping/teleport terms. Dangling nodes' mass is redistributed
    uniformly each round (the standard stochastic-matrix fix) — its
    total is the ONE scalar collected per round, same budget as
    ``connected_components``' convergence counter. localCheckpoint per
    round truncates the iterative lineage.

    Ranks sum to 1 (up to float error) every round by construction.
    """
    # zero/negative-weight edges carry no mass: dropping them up front
    # makes a node whose out-edges all weigh 0 correctly DANGLING
    # (keeping them left it in out_w with ow=0, whose rank*w/ow inflow
    # was NULL and silently leaked its mass — review finding). Nodes
    # stay in the node set either way via the pre-filter endpoints.
    raw = edges.select(
        F.col(src).alias("u"),
        F.col(dst).alias("v"),
        (F.col(weight) if weight else F.lit(1)).cast("double").alias("w"),
    )
    # pin once: e/out_w/nodes are consumed 2x PER ITERATION (dangling
    # scalar + rank rebuild); without the pin the entire upstream edge
    # pipeline (e.g. link extraction + canonicalization) re-executes
    # ~2*iters times (review finding)
    nodes = (
        raw.select("u")
        .unionByName(raw.select(F.col("v").alias("u")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = nodes.count()
    if n == 0:
        # empty edge table (a crawl batch with no parseable outlinks):
        # an empty result, not a ZeroDivisionError at plan build
        return nodes.select(
            F.col("u").alias("node"), F.lit(0.0).alias("rank")
        )
    e = raw.filter(F.col("w") > 0).localCheckpoint(eager=True)
    out_w = e.groupBy("u").agg(F.sum("w").alias("ow")).localCheckpoint(eager=True)
    ranks = nodes.select("u", F.lit(1.0 / n).alias("rank")).localCheckpoint(
        eager=True
    )
    for _ in range(iters):
        # mass sitting on nodes with no out-edges
        dangling = (
            ranks.join(out_w, "u", "left_anti").agg(F.sum("rank")).collect()[0][0]
            or 0.0
        )
        contribs = (
            e.join(out_w, "u")
            .join(ranks, "u")
            .select("v", (F.col("rank") * F.col("w") / F.col("ow")).alias("c"))
            .groupBy("v")
            .agg(F.sum("c").alias("inflow"))
        )
        base = (1.0 - damping) / n + damping * dangling / n
        ranks = (
            nodes.join(contribs.withColumnRenamed("v", "u"), "u", "left")
            .select(
                "u",
                (
                    F.lit(base) + F.lit(damping) * F.coalesce("inflow", F.lit(0.0))
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks.select(F.col("u").alias("node"), F.round("rank", 9).alias("rank"))
