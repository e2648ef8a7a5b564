"""merge_asof-based as-of join (operators/asof.py) must agree with the
window-based registered query on the same data."""

from __future__ import annotations

from pyspark.sql import functions as F

from radares_spark.io.tables import load_table
from radares_spark.operators.asof import asof_join
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
