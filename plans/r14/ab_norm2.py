"""End-to-end A/B of the 2-regexp normalize_text on heavy consumers.

Patches every module-level `normalize_text` binding in one process,
builds each query both ways, asserts full row-multiset equality, then
interleaves warm noop reps.
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

REPS = int(os.environ.get("AB_REPS", "5"))
QUERIES = os.environ.get(
    "AB_QUERIES", "corpus_dsir_select,text_dup_span_removal,text_bm25_topk"
).split(",")


def norm_v2(col):
    x = F.regexp_replace(col, "[^A-Za-z0-9 ]", " ")
    x = F.lower(x)
    x = F.regexp_replace(x, " +", " ")
    return F.trim(x)


def patch_everywhere(fn):
    import radares_spark.operators.dedup as dedup

    targets = []
    for mod in list(sys.modules.values()):
        if mod is None or not getattr(mod, "__name__", "").startswith(
            ("radares_spark", "bench")
        ):
            continue
        if getattr(mod, "normalize_text", None) is not None:
            targets.append(mod)
    for mod in targets:
        mod.normalize_text = fn
    return targets


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", DEFAULT_SF_DIR)
    spark = get_spark("radares-ab-norm2")
    os.environ.setdefault("SPARK_GRAFT_SF_DIR", sf_dir)

    import bench
    from radares_spark.operators.dedup import normalize_text as orig
    from radares_spark.plans import REGISTRY

    lib = {**bench.LIBRARY_PLANS, **bench._late_library_plans()}

    def plan_fn(name):
        if name in REGISTRY:
            return REGISTRY[name].fn
        return lib[name]

    # import every module first so patching sees them
    import radares_spark.operators.text_ext  # noqa: F401
    import radares_spark.operators.dsir  # noqa: F401
    import radares_spark.operators.retrieval  # noqa: F401
    import radares_spark.operators.embed  # noqa: F401
    import radares_spark.operators.bpe  # noqa: F401
    import radares_spark.pipeline.shards  # noqa: F401

    built = {}
    for q in QUERIES:
        fn = plan_fn(q)
        patch_everywhere(orig)
        base = fn(spark, sf_dir)
        mods = patch_everywhere(norm_v2)
        v2 = fn(spark, sf_dir)
        patch_everywhere(orig)
        rb = sorted(map(tuple, base.collect()))
        rv = sorted(map(tuple, v2.collect()))
        print(f"{q}: rows={len(rb)} equal={rb == rv} patched_mods={len(mods)}")
        if rb != rv:
            spark.stop()
            sys.exit(1)
        built[q] = (base, v2)

    for q, (base, v2) in built.items():
        for df in (base, v2):
            df.write.format("noop").mode("overwrite").save()
        walls = {"base": [], "v2": []}
        for _ in range(REPS):
            for tag, df in (("base", base), ("v2", v2)):
                t0 = time.perf_counter()
                df.write.format("noop").mode("overwrite").save()
                walls[tag].append(time.perf_counter() - t0)
        print(
            f"{q}: med base={statistics.median(walls['base']):.3f} "
            f"v2={statistics.median(walls['v2']):.3f} | "
            f"min base={min(walls['base']):.3f} v2={min(walls['v2']):.3f}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
