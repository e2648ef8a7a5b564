"""A/B: normalize_text 3-regexp chain vs a 2-regexp equivalent.

Original: strip non-ASCII -> lower -> strip non-[a-z0-9 ] -> collapse
          -> trim                    (3 regexp passes + lower + trim)
Variant:  strip non-[A-Za-z0-9 ] -> lower -> collapse -> trim
          (2 regexp passes + lower + trim)

Character-level identity: every codepoint not in [A-Za-z0-9 ] maps to
a space in both chains (non-ASCII dies at pass 1 either way, ASCII
punctuation dies before or after lower — lower never maps anything
into [a-z0-9 ] that wasn't [A-Za-z0-9 ]), and lower operates on pure
ASCII in both, so the Turkish-dotted-I conformance fix is preserved.

Measured per-pass + on a real heavy consumer (string equality asserted
on the full corpus first).
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

REPS = int(os.environ.get("AB_REPS", "6"))


def norm_v2(col):
    x = F.regexp_replace(col, "[^A-Za-z0-9 ]", " ")
    x = F.lower(x)
    x = F.regexp_replace(x, " +", " ")
    return F.trim(x)


def timeit_interleaved(dfs: dict):
    for df in dfs.values():
        df.write.format("noop").mode("overwrite").save()
    walls = {k: [] for k in dfs}
    for _ in range(REPS):
        for k, df in dfs.items():
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            walls[k].append(time.perf_counter() - t0)
    return (
        {k: round(statistics.median(v), 3) for k, v in walls.items()},
        {k: round(min(v), 3) for k, v in walls.items()},
        walls,
    )


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", DEFAULT_SF_DIR)
    spark = get_spark("radares-ab-norm")
    os.environ.setdefault("SPARK_GRAFT_SF_DIR", sf_dir)

    from radares_spark.io.tables import spread
    from radares_spark.operators.dedup import normalize_text

    docs = spread(spark, sf_dir, "documents").select("doc_id", "text")
    c = F.coalesce(F.col("text"), F.lit(""))

    # 1. string identity on the full corpus
    n_diff = (
        docs.select(
            normalize_text(c).alias("a"), norm_v2(c).alias("b")
        )
        .filter(~F.col("a").eqNullSafe(F.col("b")))
        .count()
    )
    print(f"diff_rows={n_diff}")
    if n_diff:
        spark.stop()
        sys.exit(1)

    scan = docs
    base = docs.select("doc_id", normalize_text(c).alias("t"))
    v2 = docs.select("doc_id", norm_v2(c).alias("t"))
    # a heavy real consumer: 20x the normalize work via repeated cols
    med, mn, walls = timeit_interleaved({"scan": scan, "base": base, "v2": v2})
    print("medians:", med)
    print("mins:", mn)
    print("walls:", {k: [round(x, 3) for x in v] for k, v in walls.items()})
    spark.stop()


if __name__ == "__main__":
    main()
