"""A/B: spread() floor 4 (r14 constant) vs core-aware 8 (r15 item 3).

Interleaved in ONE session per the bench-noise protocol: for each
query, build the frame under floor=4 and floor=8 (patching
``spread.__defaults__`` — every call site uses the default), assert
full row-multiset equality once, then time warm noop reps A/B/A/B and
report MIN and median walls.  Usage:
    python plans/r15/ab_spread_floor.py [query ...]
"""
from __future__ import annotations

import os
import statistics
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[2]
sys.path.insert(0, str(REPO))

from radares_spark.session import DEFAULT_SF_DIR, get_spark  # noqa: E402

REPS = 4


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", DEFAULT_SF_DIR)
    spark = get_spark("radares-ab-spread-floor")
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).count()

    from radares_spark.io import tables
    from radares_spark.plans import REGISTRY
    import bench

    plans = {name: spec.fn for name, spec in REGISTRY.items()}
    lib = {**bench.LIBRARY_PLANS, **bench._late_library_plans()}
    for name in bench.HEADLINE + bench.EXTRA:
        if name not in plans and name in lib:
            plans[name] = lib[name]

    names = sys.argv[1:] or [
        "text_dup_spans",
        "text_dup_span_removal",
        "text_longest_dup_span",
        "text_winnow_pairs",
        "corpus_dsir_select",
        "shards_manifest_audit",
        "text_hash_embed_4k",
        "text_bpe_encode",
        "dedup_ngram_jaccard",
        "dedup_exact",
        "similarity_cosine_topk",
        "dedup_semantic",
    ]
    base_defaults = tables.spread.__defaults__

    def build(name, floor):
        tables.spread.__defaults__ = (floor,)
        try:
            return plans[name](spark, sf_dir)
        finally:
            tables.spread.__defaults__ = base_defaults

    for name in names:
        try:
            a = build(name, 4)
            b = build(name, 8)
            # full row-multiset equality FIRST (protocol step 1)
            diff = a.exceptAll(b).count() + b.exceptAll(a).count()
            if diff:
                print(f"{name}: ROWS DIFFER ({diff}) — NOT ADOPTABLE", flush=True)
                continue
            noop(a)
            noop(b)  # both warm
            wa, wb = [], []
            for _ in range(REPS):
                t0 = time.perf_counter(); noop(a); wa.append(time.perf_counter() - t0)
                t0 = time.perf_counter(); noop(b); wb.append(time.perf_counter() - t0)
            print(
                f"{name}: floor4 min={min(wa):.3f} med={statistics.median(wa):.3f} | "
                f"floor8 min={min(wb):.3f} med={statistics.median(wb):.3f}",
                flush=True,
            )
        except Exception as exc:  # noqa: BLE001
            print(f"{name}: ERROR {type(exc).__name__}: {exc}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
