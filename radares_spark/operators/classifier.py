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

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

from radares_spark.operators.dsir import gram_buckets

BIAS_BUCKET = -1  # pseudo-bucket carrying the intercept during training


def doc_features(docs: DataFrame, n: int = 1) -> DataFrame:
    """(doc_id, b, tf) — term-frequency per hashed bucket: count of the
    doc's grams landing in bucket b divided by the doc's gram total.
    Docs with zero grams produce no rows (they score sigmoid(bias)).
    The bucket space is fixed by the hashing (``dsir.N_BUCKETS``).

    The per-doc total comes from a window over the doc's <= N_BUCKETS
    count rows, not a totals-aggregate joined back — the join form
    embeds the gram/shingle+md5 subtree in BOTH join inputs (the exact
    double-evaluation dsir_weights and bucket_pairs were rewritten to
    avoid)."""
    grams = gram_buckets(docs.select("doc_id", "text"), n=n)
    counts = grams.groupBy("doc_id", "b").agg(F.count(F.lit(1)).alias("c"))
    w_doc = W.partitionBy("doc_id").rowsBetween(
        W.unboundedPreceding, W.unboundedFollowing
    )
    return counts.select(
        "doc_id", "b", (F.col("c") / F.sum("c").over(w_doc)).alias("tf")
    )


def _weights_df(spark, weights: dict[int, float]) -> DataFrame:
    return spark.createDataFrame(
        list(weights.items()) or [(0, 0.0)], "b long, w double"
    )


def _margins(feats: DataFrame, w_df: DataFrame) -> DataFrame:
    """(doc_id, m) — one broadcast join + per-doc sum."""
    return (
        feats.join(F.broadcast(w_df), "b", "left")
        .groupBy("doc_id")
        .agg(F.sum(F.col("tf") * F.coalesce("w", F.lit(0.0))).alias("m"))
    )


def train_quality_classifier(
    docs: DataFrame,
    is_positive: Column,
    iters: int = 20,
    lr: float = 2.0,
    l2: float = 1e-4,
) -> tuple[dict[int, float], float]:
    """Full-batch gradient descent; returns ``(weights, bias)`` with
    ``weights`` a bucket->float dict of at most ``dsir.N_BUCKETS``
    entries.

    ``is_positive`` is a boolean Column over ``docs`` labeling the
    high-quality class (e.g. a curated slice). A NULL predicate result
    counts as negative (same NULL->0 convention as dsir_weights'
    target flag), so NULL-labeled docs shape the gradient instead of
    silently vanishing from the sums while still inflating ``n_docs``.

    The intercept trains as pseudo-bucket ``BIAS_BUCKET`` with tf=1.0
    on every doc: ONE gradient aggregate per iteration yields every
    bucket gradient AND the bias gradient (two separate collect()s
    would re-run the corpus-sized margins/errs pipeline twice per
    iteration). The bias is not L2-regularized, per convention.
    """
    spark = docs.sparkSession
    labeled = docs.select(
        "doc_id",
        "text",
        F.coalesce(is_positive.cast("int"), F.lit(0)).alias("y"),
    )
    bias_rows = labeled.select(
        "doc_id", F.lit(BIAS_BUCKET).cast("long").alias("b"), F.lit(1.0).alias("tf")
    )
    # pin: see module doc — iterations must not re-run the gram pipeline
    feats = doc_features(labeled).unionByName(bias_rows).localCheckpoint()
    labels = labeled.select("doc_id", "y").localCheckpoint()
    try:
        n_docs = labels.count()
        weights: dict[int, float] = {}
        for _ in range(iters):
            errs = labels.join(_margins(feats, _weights_df(spark, weights)), "doc_id", "left").select(
                "doc_id",
                (
                    1.0 / (1.0 + F.exp(-F.coalesce("m", F.lit(0.0))))
                    - F.col("y")
                ).alias("e"),
            )
            grad_rows = (
                feats.join(errs, "doc_id")
                .groupBy("b")
                .agg(F.sum(F.col("tf") * F.col("e")).alias("g"))
                .collect()
            )
            for r in grad_rows:
                b = r["b"]
                reg = 0.0 if b == BIAS_BUCKET else l2 * weights.get(b, 0.0)
                weights[b] = weights.get(b, 0.0) - lr * (r["g"] / n_docs + reg)
        bias = weights.pop(BIAS_BUCKET, 0.0)
        return weights, bias
    finally:
        # release the pinned blocks deterministically — a session that
        # trains many models must not accumulate checkpointed RDDs
        feats.unpersist()
        labels.unpersist()


def score_quality(
    docs: DataFrame, weights: dict[int, float], bias: float
) -> DataFrame:
    """(doc_id, quality_prob) for EVERY doc — sigmoid of the linear
    score; gram-less docs get sigmoid(bias). Serving is one broadcast
    join + one per-doc aggregate, zero Python in the hot path."""
    scores = _margins(doc_features(docs), _weights_df(docs.sparkSession, weights))
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
