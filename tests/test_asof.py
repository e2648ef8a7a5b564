"""merge_asof-based as-of join (operators/asof.py) must agree with the
window-based registered query on the same data; the time-salted
variant must agree with both while spreading a hot key over multiple
(key, bucket) tasks."""

from __future__ import annotations

from pyspark.sql import functions as F

from radares_spark.io.tables import load_table
from radares_spark.operators.asof import asof_join, asof_join_salted
from radares_spark.plans.relational import asof_join_error_click
from tests.conftest import SF_SMOKE


def test_matches_window_implementation(spark):
    ev = load_table(spark, SF_SMOKE, "events")
    errors = ev.filter(F.col("event_type") == "error").select("event_id", "user_id", "ts")
    clicks = ev.filter(F.col("event_type") == "click").select("user_id", "ts")

    got = {
        (r["event_id"], r["user_id"]): r["last_click_ts"]
        for r in asof_join(
            errors, clicks, by="user_id", value="last_click_ts"
        )
        .filter(F.col("last_click_ts").isNotNull())
        .collect()
    }
    expect = {
        (r["event_id"], r["user_id"]): r["last_click_ts"]
        for r in asof_join_error_click(spark, SF_SMOKE).collect()
    }
    assert got == expect


def test_salted_matches_unsalted_on_testdata(spark):
    ev = load_table(spark, SF_SMOKE, "events")
    errors = ev.filter(F.col("event_type") == "error").select("event_id", "user_id", "ts")
    clicks = ev.filter(F.col("event_type") == "click").select("user_id", "ts")

    def to_map(df):
        return {
            (r["event_id"], r["user_id"]): r["last_click_ts"] for r in df.collect()
        }

    plain = to_map(asof_join(errors, clicks, by="user_id", value="last_click_ts"))
    # 6-hour buckets: the testdata event span covers many buckets, so
    # boundary carries are exercised heavily
    salted = to_map(
        asof_join_salted(
            errors, clicks, by="user_id", bucket_seconds=6 * 3600, value="last_click_ts"
        )
    )
    assert salted == plain


def test_salted_spreads_hot_key(spark):
    """One user with 2000 events across 50 hours; 1-hour buckets must
    split it into >1 task-group, each bounded by rows-per-bucket, and
    still match the unsalted semantics exactly (boundary carries)."""
    base = 1_700_000_000
    hot = [(i, "hot", base + i * 90) for i in range(2000)]  # every 90 s
    cold = [(10_000 + i, "cold", base + i * 7200) for i in range(5)]
    left = (
        spark.createDataFrame(hot + cold, "event_id long, user_id string, epoch long")
        .select("event_id", "user_id", F.timestamp_seconds("epoch").alias("ts"))
    )
    # sparse rights: one click every ~4 hours -> most buckets have no
    # right row and must match via the carried boundary
    rights = [("hot", base + 10 + i * 14_400) for i in range(13)] + [
        ("cold", base + 5)
    ]
    right = spark.createDataFrame(rights, "user_id string, epoch long").select(
        "user_id", F.timestamp_seconds("epoch").alias("ts")
    )

    bucket = 3600
    n_hot_buckets = (
        left.filter(F.col("user_id") == "hot")
        .select(F.floor(F.col("ts").cast("long") / bucket).alias("b"))
        .distinct()
        .count()
    )
    assert n_hot_buckets > 1  # the hot key really is split across tasks

    plain = {
        r["event_id"]: r["value_ts"]
        for r in asof_join(left, right, by="user_id").collect()
    }
    salted = {
        r["event_id"]: r["value_ts"]
        for r in asof_join_salted(left, right, by="user_id", bucket_seconds=bucket).collect()
    }
    assert salted == plain
    assert sum(v is not None for v in salted.values()) > 1900  # matches exist


def test_no_preceding_right_row_yields_null(spark):
    left = spark.createDataFrame(
        [(1, "u1", "2024-01-01 10:00:00"), (2, "u1", "2024-01-01 12:00:00")],
        "event_id long, user_id string, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    right = spark.createDataFrame(
        [("u1", "2024-01-01 11:00:00")], "user_id string, ts string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    rows = {r["event_id"]: r["value_ts"] for r in asof_join(left, right, by="user_id").collect()}
    assert rows[1] is None  # no click before 10:00
    assert rows[2] is not None and rows[2].hour == 11
