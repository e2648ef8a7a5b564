"""Salted two-phase aggregation: result parity with the plain groupBy
and the expected two-exchange plan shape (operators/skew.py)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from radares_spark.io.tables import load_table
from radares_spark.operators.skew import salted_agg
from tests.conftest import SF_SMOKE

SPECS = [
    ("l_quantity", "sum", "sum_qty"),
    ("l_extendedprice", "max", "max_price"),
    ("l_discount", "min", "min_disc"),
    ("l_orderkey", "count", "n"),
    ("l_extendedprice", "avg", "avg_price"),
]


def test_salted_agg_matches_plain_agg(spark):
    li = load_table(spark, SF_SMOKE, "lineitem")
    plain = {
        r["l_returnflag"]: (r["sum_qty"], r["max_price"], r["min_disc"], r["n"], r["avg_price"])
        for r in li.groupBy("l_returnflag")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            F.max("l_extendedprice").alias("max_price"),
            F.min("l_discount").alias("min_disc"),
            F.count("l_orderkey").alias("n"),
            F.avg("l_extendedprice").alias("avg_price"),
        )
        .collect()
    }
    salted = {
        r["l_returnflag"]: (r["sum_qty"], r["max_price"], r["min_disc"], r["n"], r["avg_price"])
        for r in salted_agg(li, ["l_returnflag"], SPECS, n_salts=8).collect()
    }
    assert set(plain) == set(salted)
    for k, (s, mx, mn, n, _) in plain.items():
        s2, mx2, mn2, n2, _ = salted[k]
        assert (mx, mn, n) == (mx2, mn2, n2)
        assert s == pytest.approx(s2, rel=1e-9)
        assert plain[k][4] == pytest.approx(salted[k][4], rel=1e-9)


def test_salted_agg_spreads_hot_key(spark):
    li = load_table(spark, SF_SMOKE, "lineitem")
    out = salted_agg(li, ["l_returnflag"], SPECS, n_salts=8)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # two-phase: (key, salt) exchange then key exchange
    assert plan.count("Exchange hashpartitioning") == 2
    # the partial groupBy really fans the hot key out over the salts
    partial = li.withColumn(
        "__salt", F.pmod(F.xxhash64(*[F.col(c) for c in li.columns]), F.lit(8))
    ).groupBy("l_returnflag", "__salt").count()
    per_key = partial.groupBy("l_returnflag").count().collect()
    assert all(r["count"] == 8 for r in per_key)


def test_rejects_non_decomposable(spark):
    li = load_table(spark, SF_SMOKE, "lineitem")
    with pytest.raises(ValueError, match="non-decomposable"):
        salted_agg(li, ["l_returnflag"], [("l_quantity", "median", "m")])


_AQE_CONFS = {
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # shrink the detection thresholds so a few-MB local fixture is
    # "skewed"; at cluster scale the defaults (256 MB / factor 5) play
    # the same role
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "65536",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32768",
    "spark.sql.autoBroadcastJoinThreshold": "-1",  # force the shuffle join
}


def test_aqe_splits_skewed_shuffle_join(spark):
    """The claim operators/asof.py and skew.py's docstrings rest on:
    AQE really does split a skewed SHUFFLE-JOIN partition at runtime
    (it does NOT apply to grouped-map aggregation — that is what
    salted_agg / asof_join_salted are for). 90% of the left side
    shares one key; after execution the final adaptive plan must show
    the skew-split merge join, and the result must be exact."""
    old = {k: spark.conf.get(k, None) for k in _AQE_CONFS}
    for k, v in _AQE_CONFS.items():
        spark.conf.set(k, v)
    try:
        left = spark.range(0, 300_000).select(
            F.when(F.col("id") % 10 < 9, F.lit(0)).otherwise(F.col("id")).alias("k"),
            F.concat(F.lit("payload-"), F.col("id").cast("string")).alias("payload"),
        )
        right = spark.range(0, 2_000).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("val")
        )
        joined = left.join(right, "k")
        n = len(joined.collect())  # executes THIS plan; AQE finalizes it
        # exact expectation: 270k rows of key 0 match once; the 30k
        # distinct-key rows match iff k = 10i+9 < 2000 (200 of them)
        assert n == 270_000 + 200

        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "SortMergeJoin(skew=true)" in plan
        assert "AQEShuffleRead coalesced and skewed" in plan
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


# ---- heavy-hitter report ----


def test_skew_report_planted_hot_key(spark):
    import pandas as pd
    from radares_spark.operators.skew import skew_report

    pdf = pd.DataFrame({"k": ["hot"] * 800 + [f"cold{i}" for i in range(200)]})
    rows = skew_report(spark.createDataFrame(pdf), ["k"], 5).collect()
    by_rank = {r["key_rank"]: r for r in rows}
    assert len(rows) == 5
    assert by_rank[1]["k"] == "hot" and by_rank[1]["n_rows"] == 800
    assert by_rank[1]["share"] == 0.8
    # cold keys are all count-1: deterministic tie-break by key asc
    assert by_rank[2]["k"] == "cold0" and by_rank[2]["n_rows"] == 1


def test_skew_report_equals_naive_global_window(spark):
    import pandas as pd
    from pyspark.sql import Window
    from pyspark.sql import functions as F
    from radares_spark.operators.skew import skew_report

    pdf = pd.DataFrame({"k": [f"k{i % 37}" for i in range(1000)]})
    docs = spark.createDataFrame(pdf)
    got = sorted(map(tuple, skew_report(docs, ["k"], 10).collect()))
    counts = docs.groupBy("k").agg(F.count(F.lit(1)).alias("n_rows"))
    naive = (
        counts.crossJoin(F.broadcast(counts.agg(F.sum("n_rows").alias("t"))))
        .withColumn(
            "key_rank", F.row_number().over(Window.orderBy(F.desc("n_rows"), "k"))
        )
        .filter(F.col("key_rank") <= 10)
        .select(
            "k",
            "n_rows",
            F.round(F.col("n_rows") / F.col("t").cast("double"), 6).alias("share"),
            "key_rank",
        )
    )
    want = sorted(map(tuple, naive.collect()))
    assert got == want


def test_skew_report_uses_window_group_limit(spark):
    import pandas as pd
    from radares_spark.operators.skew import skew_report

    pdf = pd.DataFrame({"k": [f"k{i % 37}" for i in range(1000)]})
    plan = (
        skew_report(spark.createDataFrame(pdf), ["k"], 10)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "WindowGroupLimit" in plan, plan
