"""SimHash hamming-ball pairs (operators/dedup.py::simhash_pairs):
parity against an ALL-PAIRS brute-force oracle (proving the disjoint-
band blocking loses nothing), plus the pigeonhole guarantee on a
planted adversarial signature set."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from radares_spark.operators.dedup import (
    SH_MAX_HAMMING,
    SH_N_BANDS,
    simhash_pairs,
)
from tests.conftest import SF_ORACLE

# The all-pairs brute-force DuckDB parity for dedup_simhash_pairs runs
# in the consolidated library sweep
# (tests/test_oracle_parity.py::test_library_parity).


def test_pigeonhole_recall_on_planted_signatures(spark):
    """Adversarial plant: pairs at every hamming distance 0..4, each
    differing in bits spread across DIFFERENT bands (the worst case
    for banding). Everything <= SH_MAX_HAMMING must be found — banding
    with 4 disjoint bands is exact below 4 differing bits."""
    base = 0b1010_1100_0011_0101_1111_0000_1001_0110
    plants = {
        0: base,
        # hamming 1..4 from base, flipped bits in distinct bands
        1: base ^ 0x01,
        2: base ^ 0x01 ^ 0x100,
        3: base ^ 0x01 ^ 0x100 ^ 0x10000,
        4: base ^ 0x01 ^ 0x100 ^ 0x10000 ^ 0x1000000,
        # far away: inverted
        5: base ^ 0xFFFFFFFF,
    }
    sigs = spark.createDataFrame(
        pd.DataFrame(
            {"doc_id": list(plants), "simhash": [v & 0xFFFFFFFF for v in plants.values()]}
        )
    )
    got = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in simhash_pairs(sigs).collect()
    }
    # brute-force expectation
    want = {}
    ids = sorted(plants)
    for i in ids:
        for j in ids:
            if i < j:
                h = bin(plants[i] ^ plants[j]).count("1")
                if h <= SH_MAX_HAMMING:
                    want[(i, j)] = h
    assert got == want
    assert (0, 3) in got and got[(0, 3)] == 3  # 3 bits, 3 different bands
    assert (0, 4) not in got  # hamming 4 correctly outside the ball
    assert SH_MAX_HAMMING < SH_N_BANDS  # the guarantee's precondition


def test_candidate_join_is_equi_not_all_pairs(spark):
    from radares_spark.operators.dedup import dedup_simhash_pairs

    df = dedup_simhash_pairs(spark, SF_ORACLE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan
