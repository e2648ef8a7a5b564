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

# Whole-module slow tier (r15): multi-second Spark e2e tests dominate
# this module's wall; deselected by default so the driver's verify
# window fits — run with -m slow (see COVERAGE.md).
pytestmark = pytest.mark.slow

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


# ---------------------------------------------------------------------------
# Round-3 operators: token-budget sampling, connected components,
# time-salted as-of — each checked against an independent pure-Python
# reference implementation on random inputs.
# ---------------------------------------------------------------------------

import datetime as dt
import hashlib
import re

from radares_spark.operators.asof import asof_join, asof_join_salted
from radares_spark.operators.components import connected_components
from radares_spark.pipeline.corpus import N_BUDGET_BUCKETS, sample_to_token_budget

words = st.lists(st.sampled_from("the a cat dog runs fast blue sky".split()), min_size=0, max_size=12)


def _py_norm(s: str) -> str:
    # mirror normalize_text exactly, incl. the ASCII pre-strip
    s = re.sub(r"[^\x00-\x7F]", " ", s)
    return re.sub(" +", " ", re.sub("[^a-z0-9 ]", " ", s.lower())).strip()


@settings(max_examples=8, deadline=None)
@given(
    st.lists(st.tuples(st.integers(0, 10_000), words), min_size=1, max_size=30, unique_by=lambda t: t[0]),
    st.integers(0, 60),
)
def test_token_budget_matches_python_reference(sql, docs, budget):
    """The two-phase distributed prefix sum must select EXACTLY the
    docs a naive sequential scan in (md5-bucket, doc_id) order selects."""
    rows = [(i, " ".join(ws)) for i, ws in docs]
    df = sql.createDataFrame(rows, "doc_id long, text string")
    got = sorted(r["doc_id"] for r in sample_to_token_budget(df, budget).collect())

    def bucket(i):
        return int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) % N_BUDGET_BUCKETS

    expect, cum = [], 0
    for i, text in sorted(rows, key=lambda r: (bucket(r[0]), r[0])):
        cum += len(_py_norm(text).split(" "))
        if cum > budget:
            break
        expect.append(i)
    assert got == sorted(expect)


@settings(max_examples=8, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 25), st.integers(0, 25)), min_size=1, max_size=25))
@pytest.mark.slow  # >=10 s in the r15 full-suite durations log
def test_components_match_union_find(sql, edges):
    edges = [(a, b) for a, b in edges if a != b]
    if not edges:
        return
    df = sql.createDataFrame(edges, "doc_a long, doc_b long")
    got = {r["node"]: r["component"] for r in connected_components(df, max_iter=30).collect()}

    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    expect = {n: find(n) for n in parent}
    assert got == expect


@settings(max_examples=6, deadline=None)
@given(
    st.lists(st.tuples(st.integers(0, 2), st.integers(0, 5000)), min_size=1, max_size=40),
    st.lists(st.tuples(st.integers(0, 2), st.integers(0, 5000)), min_size=0, max_size=40),
    st.sampled_from([60, 600, 3600]),
)
@pytest.mark.slow  # >=10 s in the r15 full-suite durations log
def test_salted_asof_equals_plain(sql, lefts, rights, bucket_s):
    """Time-salted as-of == plain grouped-map as-of on arbitrary event
    sets, for any bucket width (boundary carries restore exactness)."""
    base = dt.datetime(2024, 1, 1)
    lrows = [
        (i, f"u{u}", base + dt.timedelta(seconds=s)) for i, (u, s) in enumerate(lefts)
    ]
    rrows = [(f"u{u}", base + dt.timedelta(seconds=s)) for u, s in rights]
    left = sql.createDataFrame(lrows, "event_id long, user_id string, ts timestamp")
    right = sql.createDataFrame(rrows, "user_id string, ts timestamp") if rrows else (
        sql.createDataFrame([], "user_id string, ts timestamp")
    )
    plain = {r["event_id"]: r["value_ts"] for r in asof_join(left, right, by="user_id").collect()}
    salted = {
        r["event_id"]: r["value_ts"]
        for r in asof_join_salted(left, right, by="user_id", bucket_seconds=bucket_s).collect()
    }
    assert salted == plain
