"""Streaming corpus intake statistics — the live twin of the batch
curation gates (``pipeline/corpus.py``) for a document feed.

Batch curation answers "which docs survive"; a 100 TB/day ingest also
needs the OPERATIONAL view while data lands: docs/tokens per window
per language, quality-gate pass rate — the numbers that page someone
when a crawler starts shipping garbage. That is a windowed streaming
aggregate, and it only works if per-doc scoring is STATELESS:

- ``lang_id_per_doc`` (batch) is explode → per-doc aggregate: keyed
  state on doc_id, unbounded in a stream. :func:`doc_features`
  re-expresses the same classification as per-row ``regexp_count``
  marker hits (the proven trick from
  ``operators/text.py::stopword_hits`` — one codegen'd regex pass
  beats a per-token interpreted lambda) — zero state, identical
  answers (pinned by ``tests/test_corpus_stream.py`` against the
  batch operator on the real documents table).
- the quality gate reuses the exact expressions of the registered
  ``text_quality_score`` / ``pipeline.corpus._quality_pass``.

State is then bounded by (windows in flight x languages): the
watermark closes windows, append mode emits each exactly once —
the same late-data contract as ``streaming/windows.py``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from radares_spark.operators.dedup import normalize_text
from radares_spark.operators.text import EN_STOPWORDS, LANG_MARKERS, stopword_hits


def _pred_lang(norm_text: Column) -> Column:
    """Marker-voting language id as a pure per-row expression: one
    ``regexp_count`` per language over the normalized text. Counting
    with multiplicity, fixed en>es>fr>de tie order, zero hits →
    'und' — exactly ``lang_id_per_doc``'s semantics without its
    per-doc Aggregate."""
    hits = {lang: stopword_hits(norm_text, words) for lang, words in LANG_MARKERS.items()}
    best = F.greatest(*hits.values())
    pick = F.when(best == F.lit(0), "und")
    for lang in LANG_MARKERS:
        pick = pick.when(hits[lang] == best, lang)
    return pick


def doc_features(docs: DataFrame) -> DataFrame:
    """Stateless per-doc scoring: (all input columns) + n_tokens,
    quality_pass, pred_lang. Works identically on a batch frame and a
    streaming frame — it is a projection, nothing else."""
    t = normalize_text(F.coalesce(F.col("text"), F.lit("")))
    toks = F.split(t, " ")
    n_tokens = F.size(toks)
    stop_ratio = stopword_hits(t, EN_STOPWORDS) / n_tokens.cast("double")
    n_punct = F.length(F.regexp_replace(F.col("text"), "[a-zA-Z0-9\\s]", ""))
    punct_ratio = n_punct / F.length("text").cast("double")
    quality = (n_tokens >= 20) & stop_ratio.between(0.01, 0.6) & (punct_ratio < 0.1)
    return docs.select(
        "*",
        n_tokens.alias("n_tokens"),
        quality.alias("quality_pass"),
        _pred_lang(t).alias("pred_lang"),
    )


def corpus_stats_stream(
    docs: DataFrame, window: str = "5 minutes", watermark: str = "10 minutes"
) -> DataFrame:
    """Streaming (doc_id, text, ingest_ts) → per-(window, language)
    intake stats: doc count, token volume, quality pass rate.

    Append-mode emits each window once, after the watermark passes its
    end; state is |open windows| x |languages| rows — constant in
    corpus size. The same plan runs in batch (for backfill audits) by
    passing a batch frame: the watermark is a no-op there and every
    window emits."""
    feats = doc_features(docs)
    return (
        feats.withWatermark("ingest_ts", watermark)
        .groupBy(F.window("ingest_ts", window).alias("win"), "pred_lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("sum_tokens"),
            F.avg(F.col("quality_pass").cast("int")).alias("quality_rate"),
        )
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            "pred_lang",
            "n_docs",
            "sum_tokens",
            "quality_rate",
        )
    )
