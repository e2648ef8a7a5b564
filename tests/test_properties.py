"""Property-based invariants (SURVEY §5.4) over the cleaning and
dedup column expressions. Each hypothesis example batch evaluates as
ONE Spark job (rows generated together) to keep runtime sane."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from pyspark.sql import functions as F

from radares_spark.functions.cleaning import clean_direction, split_time_range
from radares_spark.operators.dedup import normalize_text
from radares_spark.schemas import DIRECTION_MAP

import pytest

# printable-ish text without '/' so the suffix position is unambiguous
street = st.text(
    alphabet=st.characters(blacklist_characters="/\x00", min_codepoint=32, max_codepoint=0x2FF),
    min_size=0,
    max_size=30,
)
suffix = st.one_of(st.sampled_from(list(DIRECTION_MAP)), st.text(min_size=1, max_size=3))


@pytest.fixture(scope="module")
def sql(spark):
    return spark


@settings(max_examples=15, deadline=None)
@given(st.lists(st.tuples(street, suffix), min_size=1, max_size=40))
def test_direction_cleaning_total(sql, cases):
    """Mapped suffixes -> canonical names; everything else -> NULL
    (quarantine, never a crash) — reference clean_data.py:44-50."""
    df = sql.createDataFrame(
        [(i, f"{s}/{suf}") for i, (s, suf) in enumerate(cases)], "i long, raw string"
    )
    got = {
        r["i"]: r["d"] for r in df.select("i", clean_direction(F.col("raw")).alias("d")).collect()
    }
    for i, (_, suf) in enumerate(cases):
        assert got[i] == DIRECTION_MAP.get(suf)


@settings(max_examples=15, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(0, 23), st.integers(0, 59), st.integers(0, 23), st.integers(0, 59)
        ),
        min_size=1,
        max_size=40,
    )
)
def test_time_range_slicing_roundtrip(sql, cases):
    """'HH:MM as HH:MM' slices back to its two components exactly
    (reference clean_data.py:200-204 fixed positions)."""
    rows = [
        (i, f"{h1:02d}:{m1:02d} as {h2:02d}:{m2:02d}")
        for i, (h1, m1, h2, m2) in enumerate(cases)
    ]
    df = sql.createDataFrame(rows, "i long, time_range string")
    got = {r["i"]: (r["initial_time"], r["end_time"]) for r in split_time_range(df).collect()}
    for i, (h1, m1, h2, m2) in enumerate(cases):
        assert got[i] == (f"{h1:02d}:{m1:02d}", f"{h2:02d}:{m2:02d}")


@settings(max_examples=10, deadline=None)
@given(st.lists(st.text(max_size=60), min_size=1, max_size=30))
def test_normalize_text_idempotent(sql, texts):
    """normalize(normalize(x)) == normalize(x), output is lowercase
    alnum+single-space, and equal inputs hash equal (exact-dedup key)."""
    df = sql.createDataFrame([(i, t) for i, t in enumerate(texts)], "i long, t string")
    out = df.select(
        "i",
        normalize_text(F.col("t")).alias("n1"),
        normalize_text(normalize_text(F.col("t"))).alias("n2"),
    ).collect()
    for r in out:
        assert r["n1"] == r["n2"]
        assert "  " not in r["n1"]
        assert r["n1"] == r["n1"].strip().lower()
