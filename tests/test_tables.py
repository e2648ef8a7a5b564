"""Loader contract for io/tables.load_table.

The r3 regression (commit fbf0a83) shipped because nothing pinned the
post-load type of ``events.ts``: the loader silently started returning
TIMESTAMP_NTZ and seven downstream consumers (sessionize, salted as-of,
every event-time streaming op) broke at once. These tests pin the
invariant — ``ts`` is ALWAYS TimestampType (LTZ, UTC session semantics),
never NTZ, never long — across every testdata scale factor, and prove
the two formerly LTZ-assuming epoch-second sites survive an NTZ input.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import TimestampNTZType, TimestampType

from radares_spark.io.tables import TABLES, load_table
from radares_spark.operators.asof import asof_join, asof_join_salted
from radares_spark.plans.relational import events_sessionize

from .conftest import SF_SMOKE

SF_DIRS = [
    d
    for d in ("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")
    if os.path.isdir(d)
]


@pytest.mark.parametrize("sf", SF_DIRS)
def test_events_ts_is_always_ltz_timestamp(spark, sf):
    """ts must be TimestampType — never TIMESTAMP_NTZ, never long."""
    dt = load_table(spark, sf, "events").schema["ts"].dataType
    assert isinstance(dt, TimestampType), f"{sf}: events.ts loaded as {dt}"


def test_events_ts_values_match_raw_micros(spark):
    """The NTZ->LTZ normalization must be byte-identical to the naive
    UTC micros stored in the parquet (session TZ is pinned UTC at the
    load chokepoint), i.e. the same values the DuckDB oracle sees."""
    raw = spark.read.parquet(os.path.join(SF_SMOKE, "events.parquet"))
    raw_first = (
        raw.select(F.col("ts").cast("timestamp_ntz").cast("string").alias("s"))
        .orderBy("s")
        .first()["s"]
    )
    loaded = load_table(spark, SF_SMOKE, "events")
    got = loaded.select(F.col("ts").cast("string").alias("s")).orderBy("s").first()["s"]
    assert got == raw_first


def test_all_tables_load(spark):
    for t in TABLES:
        assert load_table(spark, SF_SMOKE, t).limit(1).count() >= 0


def _ntz_events(spark):
    """An events frame with ts deliberately left as TIMESTAMP_NTZ —
    the exact shape that broke r3 when it leaked past the loader."""
    df = spark.read.parquet(os.path.join(SF_SMOKE, "events.parquet"))
    df = df.withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    assert isinstance(df.schema["ts"].dataType, TimestampNTZType)
    return df


def test_sessionize_epoch_math_survives_ntz(spark):
    """plans/relational.py's epoch-second derivation must be legal on
    NTZ input (cast-through-timestamp), not just on the loader's LTZ."""
    ntz = _ntz_events(spark)
    ntz.createOrReplaceTempView("__ntz_events")
    w_ntz = (
        ntz.withColumn("epoch", F.col("ts").cast("timestamp").cast("long"))
        .agg(F.sum("epoch").alias("s"))
        .first()["s"]
    )
    ltz = load_table(spark, SF_SMOKE, "events")
    w_ltz = (
        ltz.withColumn("epoch", F.col("ts").cast("long"))
        .agg(F.sum("epoch").alias("s"))
        .first()["s"]
    )
    assert w_ntz == w_ltz  # UTC session TZ: identical epoch seconds


def test_sessionize_runs_green_via_loader(spark):
    out = events_sessionize(spark, SF_SMOKE)
    assert out.count() > 0
    assert set(out.columns) == {"user_id", "n_sessions", "n_events"}


def test_salted_asof_survives_ntz_input(spark):
    """asof_join_salted must produce identical output for NTZ and LTZ
    inputs — the salt derivation casts through 'timestamp' first."""
    ev = load_table(spark, SF_SMOKE, "events")
    errors = ev.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select("user_id", "ts")

    ntz = _ntz_events(spark)
    errors_ntz = ntz.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts"
    )
    clicks_ntz = ntz.filter(F.col("event_type") == "click").select("user_id", "ts")

    def to_map(df):
        return {(r["event_id"], r["user_id"]): r["value_ts"] for r in df.collect()}

    ltz_out = to_map(
        asof_join_salted(errors, clicks, by="user_id", bucket_seconds=6 * 3600)
    )
    ntz_out = to_map(
        asof_join_salted(errors_ntz, clicks_ntz, by="user_id", bucket_seconds=6 * 3600)
    )
    plain = to_map(asof_join(errors, clicks, by="user_id"))
    assert ltz_out == plain
    assert ntz_out == plain
