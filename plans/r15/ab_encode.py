"""A/B: encode_ids per-doc regroup forms (r15 item 7, guide §2.3).

base      — groupBy(doc_id).agg(flatten(transform(array_sort(
            collect_list(struct(pos, wids))), s -> s.wids)))
sortgroup — repartition(cap, doc_id) + sortWithinPartitions(doc_id,
            pos) + groupBy(doc_id).agg(flatten(collect_list(wids))):
            the groupBy reuses the partitioning (no second exchange)
            and hash-agg appends rows in partition order, so the
            collect is already pos-ordered — no struct wrap, no
            per-doc sort.
mappandas — same repartition+sort, then a mapInPandas assembly with
            carry-over across Arrow batches (zero JVM agg machinery,
            one numpy concatenate per doc).
Equality asserted on the full encode output; timed on encode_ids
alone plus the two consuming queries.
"""
from __future__ import annotations

import os
import statistics
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[2]
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F  # noqa: E402

from radares_spark.session import DEFAULT_SF_DIR, get_spark  # noqa: E402

REPS = 4


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def regroup_base(toks, wids):
    return (
        toks.join(wids, "word", "left")
        .groupBy("doc_id")
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "wids"))),
                    lambda s: s["wids"],
                )
            ).alias("input_ids")
        )
    )


def regroup_sortgroup(toks, wids):
    j = toks.join(wids, "word", "left").select("doc_id", "pos", "wids")
    cap = int(j.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    return (
        j.repartition(cap, "doc_id")
        .sortWithinPartitions("doc_id", "pos")
        .groupBy("doc_id")
        .agg(F.flatten(F.collect_list("wids")).alias("input_ids"))
    )


def regroup_mappandas(toks, wids):
    import pandas as pd

    j = toks.join(wids, "word", "left").select("doc_id", "pos", "wids")
    cap = int(j.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    srt = j.repartition(cap, "doc_id").sortWithinPartitions("doc_id", "pos")

    def assemble(batches):
        import numpy as np

        cur_id, cur = None, []
        for pdf in batches:
            if pdf.empty:
                continue
            ids = pdf["doc_id"].to_numpy()
            ws = pdf["wids"].to_numpy()
            # boundaries of contiguous doc runs inside this batch
            cut = np.flatnonzero(ids[1:] != ids[:-1]) + 1
            starts = np.concatenate(([0], cut))
            ends = np.concatenate((cut, [len(ids)]))
            out_ids, out_arrs = [], []
            for s, e in zip(starts, ends):
                did = ids[s]
                parts = list(ws[s:e])
                if cur_id is not None and did == cur_id:
                    cur.extend(parts)
                    continue
                if cur_id is not None:
                    out_ids.append(cur_id)
                    out_arrs.append(np.concatenate(cur) if cur else np.array([], dtype="int32"))
                cur_id, cur = did, parts
            if out_ids:
                yield pd.DataFrame({"doc_id": out_ids, "input_ids": out_arrs})
        if cur_id is not None:
            import numpy as np

            yield pd.DataFrame(
                {
                    "doc_id": [cur_id],
                    "input_ids": [np.concatenate(cur) if cur else np.array([], dtype="int32")],
                }
            )

    return srt.mapInPandas(assemble, "doc_id long, input_ids array<int>")


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", DEFAULT_SF_DIR)
    spark = get_spark("radares-ab-encode")
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).count()

    from radares_spark.operators.bpe import _initial_symbols, normalize_text
    from radares_spark.io.tables import spread
    import radares_spark.pipeline.shards as sh

    docs = spread(spark, sf_dir, "documents").select("doc_id", "text")
    norm = normalize_text(F.coalesce(F.col("text"), F.lit("")))
    word_syms = (
        docs.select(F.explode(F.split(norm, " ")).alias("word"))
        .filter(F.col("word") != "")
        .distinct()
        .select("word", _initial_symbols(F.col("word")).alias("syms"))
        .localCheckpoint(eager=True)
    )

    vocab = sh.token_vocab(word_syms)
    toks = docs.select(
        "doc_id", F.posexplode(F.split(norm, " ")).alias("pos", "word")
    ).filter(F.col("word") != "")
    dwords = toks.select("word").distinct()
    fallback = _initial_symbols(F.col("word"))
    wids = (
        dwords.join(word_syms.select("word", "syms"), "word", "left")
        .select("word", F.coalesce(F.col("syms"), fallback).alias("syms"))
        .select("word", F.posexplode("syms").alias("sp", "sym"))
        .join(vocab, "sym", "left")
        .groupBy("word")
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            "sp",
                            F.coalesce(F.col("tok_id"), F.lit(sh.UNK_ID)).alias("tid"),
                        )
                    )
                ),
                lambda s: s["tid"],
            ).alias("wids")
        )
    )

    def finish(agg):
        return (
            docs.select("doc_id")
            .join(agg, "doc_id", "left")
            .select(
                "doc_id",
                F.coalesce(
                    F.col("input_ids"), F.expr("cast(array() as array<int>)")
                ).alias("input_ids"),
            )
            .select(
                "doc_id", "input_ids", F.size("input_ids").cast("long").alias("n_tokens")
            )
        )

    frames = {
        "base": finish(regroup_base(toks, wids)),
        "sortgroup": finish(regroup_sortgroup(toks, wids)),
        "mappandas": finish(regroup_mappandas(toks, wids)),
    }
    a = frames["base"]
    for tag in ("sortgroup", "mappandas"):
        d = a.exceptAll(frames[tag]).count() + frames[tag].exceptAll(a).count()
        print(f"{tag}: row diff vs base = {d}", flush=True)

    for df in frames.values():
        noop(df)
    walls: dict[str, list[float]] = {tag: [] for tag in frames}
    for _ in range(REPS):
        for tag, df in frames.items():
            t0 = time.perf_counter()
            noop(df)
            walls[tag].append(time.perf_counter() - t0)
    for tag, ws in walls.items():
        print(
            f"{tag}: min={min(ws):.3f} med={statistics.median(ws):.3f}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
