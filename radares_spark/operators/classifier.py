"""Trainable quality classifier — logistic regression over hashed
token-bucket features, trained entirely in DataFrame operations.

This is the trainable tier of the quality-scoring family: production
LLM pipelines (CCNet-descended; the LLaMA data notes) filter with a
lightweight linear classifier over bag-of-words features trained on
"known good vs crawl" labels — fastText without the external binary.
The heuristic tier lives in ``operators/text.py::text_quality_score``;
the LM tier in ``operators/dsir.py::unigram_logprob``; this adds the
supervised tier. (Reference anchor: the reference has no ML, but its
declared purpose is downstream analysis — README.md:3 — and the
engine's north star adds the LLM-pipeline operator families.)

Architecture (the part that matters at 100 TB):

- features are HASHED unigram buckets (``dsir.gram_buckets`` — the
  same trick that keeps DSIR's model broadcast-sized: the weight
  vector is ``n_buckets + 1`` floats, kilobytes, FOREVER, regardless
  of corpus size or vocabulary);
- the per-doc feature rollup ``(doc_id, b, tf)`` is computed ONCE and
  pinned with ``localCheckpoint`` — an iterative trainer re-reading a
  lazy plan would re-run the gram pipeline every iteration (the same
  pin-the-batch rationale as ``streaming/admission_stream.py``);
- each GD iteration is two map-side-combined aggregates: margins =
  one broadcast join (weights onto the feature rows) + per-doc sum;
  gradients = one join of the per-doc error back onto the feature
  rows + per-bucket sum. Nothing corpus-sized ever moves to the
  driver — only the ``n_buckets`` gradient rows (kilobytes) collect
  per iteration, the standard scalar-per-iteration convergence idiom
  (cf. ``operators/components.py``).

Determinism note: distributed float sums are order-dependent, so the
trained weights match a single-node replay to ~1e-6 relative (pinned
in tests/test_classifier.py against an independent numpy replica of
the identical update rule), not bit-for-bit — which is why this is
pytest-tier rather than a DuckDB-oracle row.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from radares_spark.operators.dsir import N_BUCKETS, gram_buckets


def doc_features(docs: DataFrame, n: int = 1) -> DataFrame:
    """(doc_id, b, tf) — term-frequency per hashed bucket: count of the
    doc's grams landing in bucket b divided by the doc's gram total.
    Docs with zero grams produce no rows (they score sigmoid(bias))."""
    grams = gram_buckets(docs.select("doc_id", "text"), n=n)
    counts = grams.groupBy("doc_id", "b").agg(F.count(F.lit(1)).alias("c"))
    totals = counts.groupBy("doc_id").agg(F.sum("c").alias("n_grams"))
    return counts.join(totals, "doc_id").select(
        "doc_id", "b", (F.col("c") / F.col("n_grams")).alias("tf")
    )


def train_quality_classifier(
    docs: DataFrame,
    is_positive: Column,
    iters: int = 20,
    lr: float = 2.0,
    l2: float = 1e-4,
    n_buckets: int = N_BUCKETS,
) -> tuple[dict[int, float], float]:
    """Full-batch gradient descent; returns ``(weights, bias)`` with
    ``weights`` a bucket->float dict of at most ``n_buckets`` entries.

    ``is_positive`` is a boolean Column over ``docs`` labeling the
    high-quality class (e.g. a curated slice; any predicate works).
    """
    spark = docs.sparkSession
    labeled = docs.select("doc_id", "text", is_positive.cast("int").alias("y"))
    feats = doc_features(labeled).localCheckpoint()  # pin: see module doc
    labels = labeled.select("doc_id", "y").localCheckpoint()
    n_docs = labels.count()

    weights: dict[int, float] = {}
    bias = 0.0
    for _ in range(iters):
        w_df = spark.createDataFrame(
            list(weights.items()) or [(0, 0.0)], "b long, w double"
        )
        margins = (
            feats.join(F.broadcast(w_df), "b", "left")
            .groupBy("doc_id")
            .agg(F.sum(F.col("tf") * F.coalesce("w", F.lit(0.0))).alias("m"))
        )
        errs = (
            labels.join(margins, "doc_id", "left")
            .select(
                "doc_id",
                (
                    1.0 / (1.0 + F.exp(-(F.coalesce("m", F.lit(0.0)) + F.lit(bias))))
                    - F.col("y")
                ).alias("e"),
            )
        )
        grad_rows = (
            feats.join(errs, "doc_id")
            .groupBy("b")
            .agg(F.sum(F.col("tf") * F.col("e")).alias("g"))
            .collect()
        )
        grad_bias = errs.agg(F.sum("e")).collect()[0][0] or 0.0
        for r in grad_rows:
            b = r["b"]
            weights[b] = weights.get(b, 0.0) - lr * (
                r["g"] / n_docs + l2 * weights.get(b, 0.0)
            )
        bias -= lr * grad_bias / n_docs
    return weights, bias


def score_quality(
    docs: DataFrame, weights: dict[int, float], bias: float
) -> DataFrame:
    """(doc_id, quality_prob) for EVERY doc — sigmoid of the linear
    score; gram-less docs get sigmoid(bias). Serving is one broadcast
    join + one per-doc aggregate, zero Python in the hot path."""
    spark = docs.sparkSession
    w_df = spark.createDataFrame(
        list(weights.items()) or [(0, 0.0)], "b long, w double"
    )
    feats = doc_features(docs)
    scores = (
        feats.join(F.broadcast(w_df), "b", "left")
        .groupBy("doc_id")
        .agg(F.sum(F.col("tf") * F.coalesce("w", F.lit(0.0))).alias("m"))
    )
    return (
        docs.select("doc_id")
        .join(scores, "doc_id", "left")
        .select(
            "doc_id",
            (
                1.0
                / (1.0 + F.exp(-(F.coalesce("m", F.lit(0.0)) + F.lit(bias))))
            ).alias("quality_prob"),
        )
    )
