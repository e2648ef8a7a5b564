"""Streaming corpus intake stats (streaming/corpus_stream.py):
the stateless per-row scorer must match the batch operators exactly,
and the streamed windowed stats must equal the batch computation of
the same aggregate over the same files."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from radares_spark.io.tables import load_table
from radares_spark.operators.text import lang_id_per_doc
from radares_spark.pipeline.corpus import _quality_pass
from radares_spark.streaming.corpus_stream import corpus_stats_stream, doc_features

SF = "/root/testdata/sf0.001"


def test_doc_features_match_batch_operators(spark):
    """pred_lang and quality_pass from the per-row (regex) form must
    agree with the explode+aggregate batch operators on every real
    doc, plus a NULL-text row (the r2 ADVICE edge case)."""
    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    null_row = spark.createDataFrame([(99999, None)], "doc_id long, text string")
    docs = docs.unionByName(null_row)

    feats = doc_features(docs).select(
        "doc_id",
        F.col("quality_pass").alias("f_quality"),
        F.col("pred_lang").alias("f_lang"),
    )
    lang = lang_id_per_doc(docs)
    qual = _quality_pass(docs).select(
        "doc_id", F.col("quality_pass").alias("b_quality")
    )
    joined = feats.join(lang, "doc_id").join(qual, "doc_id")
    assert joined.count() == docs.count()
    mismatch = joined.filter(
        (F.col("f_lang") != F.col("pred_lang"))
        | (
            F.coalesce(F.col("f_quality"), F.lit(False))
            != F.coalesce(F.col("b_quality"), F.lit(False))
        )
    )
    assert mismatch.count() == 0, mismatch.limit(5).collect()
    # the classification is non-degenerate on real data
    n_langs = feats.select("f_lang").distinct().count()
    assert n_langs >= 1 and feats.filter(F.col("f_quality")).count() > 0


EN = (
    "the quick brown fox jumps over the lazy dog and then runs off to "
    "the forest in search of a meal because it is hungry and the day "
    "is long so it keeps going"
)
ES = "el perro corre por la casa y el gato duerme en la cama que es de madera y la madera es vieja"
JUNK = "!!! ??? ###"


def test_corpus_stats_stream_matches_batch(spark, tmp_path):
    base = dt.datetime(2024, 5, 1, 12, 0, 0)
    rows = []
    for w in range(3):  # three 5-minute windows
        t0 = base + dt.timedelta(minutes=5 * w)
        for i in range(4):
            rows.append((w * 10 + i, EN + f" extra {i}", t0 + dt.timedelta(seconds=30 * i)))
        rows.append((w * 10 + 7, ES, t0 + dt.timedelta(minutes=1)))
        rows.append((w * 10 + 8, JUNK, t0 + dt.timedelta(minutes=2)))
    df = spark.createDataFrame(rows, "doc_id long, text string, ingest_ts timestamp")
    src = str(tmp_path / "docs")
    df.repartition(2).write.parquet(src)

    stream = spark.readStream.schema(df.schema).parquet(src)
    out = corpus_stats_stream(stream, window="5 minutes", watermark="1 minute")
    q = (
        out.writeStream.format("memory")
        .queryName("corpus_stats_t")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = sorted(tuple(r) for r in spark.table("corpus_stats_t").collect())

    want_df = corpus_stats_stream(
        spark.read.parquet(src), window="5 minutes", watermark="1 minute"
    )
    want = sorted(tuple(r) for r in want_df.collect())

    assert got == want
    langs = {r[2] for r in want}
    assert {"en", "es", "und"} <= langs
    assert len({(r[0], r[1]) for r in want}) == 3  # three closed windows
    # quality: the EN docs pass, ES (short) and JUNK fail -> per-window
    # en rate 1.0, others 0.0
    for r in want:
        assert r[5] == (1.0 if r[2] == "en" else 0.0)
