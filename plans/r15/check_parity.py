"""Targeted oracle-parity runner: compare_query for the named specs
(registry or library) at sf0.001 AND sf0.01 — the same comparison the
full sweep runs, scoped to a change's blast radius for fast feedback.
Usage: python plans/r15/check_parity.py name [name ...]
"""
from __future__ import annotations

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[2]
sys.path.insert(0, str(REPO))

from radares_spark.plans import REGISTRY  # noqa: E402
from radares_spark.plans.library import ALL_LIBRARY_SPECS  # noqa: E402
from radares_spark.session import get_spark  # noqa: E402
from tests.oracle import compare_query  # noqa: E402


def main() -> None:
    spark = get_spark("radares-parity-check")
    specs = {**ALL_LIBRARY_SPECS, **{n: s for n, s in REGISTRY.items()}}
    bad = 0
    for name in sys.argv[1:]:
        spec = specs[name]
        for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
            ok, msg = compare_query(spark, sf, name, spec)
            print(f"{name} @ {sf.rsplit('/',1)[-1]}: {'OK' if ok else 'FAIL'} {msg[:120]}", flush=True)
            bad += 0 if ok else 1
    print(f"failures: {bad}", flush=True)
    spark.stop()
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
