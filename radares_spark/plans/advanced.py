"""Advanced relational coverage: grouping sets, correlated subqueries,
exact percentiles, min_by/max_by, hopping windows, deterministic
sampling, and the approximate-sketch family.

These run through ``spark.sql`` where the SQL form is the clearer
declaration (grouping sets, correlated subqueries — Catalyst
decorrelates); Catalyst produces the same plans either way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from radares_spark.io.tables import load_table
from radares_spark.registry import register


def _view(spark: SparkSession, sf_dir: str, name: str) -> None:
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    load_table(spark, sf_dir, name).createOrReplaceTempView(name)


@register(
    "grouping_sets_revenue",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_extendedprice), 2) AS revenue, count(*) AS n
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), (l_returnflag, l_linestatus))
    """,
    survey="A3 grouping sets (beyond rollup/cube)",
)
def grouping_sets_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    _view(spark, sf_dir, "lineitem")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               round(sum(l_extendedprice), 2) AS revenue, count(*) AS n
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), (l_returnflag, l_linestatus))
        """
    )


@register(
    "correlated_subquery_parts",
    oracle="""
    SELECT p_brand, count(*) AS n_above
    FROM part p
    WHERE p_retailprice > (SELECT avg(p2.p_retailprice) FROM part p2
                           WHERE p2.p_brand = p.p_brand)
    GROUP BY p_brand
    """,
    survey="§4 optimizer (correlated scalar subquery -> decorrelated agg+join)",
    doc="Catalyst decorrelates the per-brand average into one aggregate "
    "+ join — declared correlated, executed as two scans and a "
    "broadcast join, never N+1 subqueries (the reference's "
    "insert-then-select-id anti-pattern, clean_data.py:180-194, is the "
    "procedural version of this mistake).",
)
def correlated_subquery_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    _view(spark, sf_dir, "part")
    return spark.sql(
        """
        SELECT p_brand, count(*) AS n_above
        FROM part p
        WHERE p_retailprice > (SELECT avg(p2.p_retailprice) FROM part p2
                               WHERE p2.p_brand = p.p_brand)
        GROUP BY p_brand
        """
    )


@register(
    "exact_percentiles",
    oracle="""
    SELECT o_orderpriority,
           round(quantile_cont(o_totalprice, 0.5), 4)  AS median_price,
           round(quantile_cont(o_totalprice, 0.9), 4)  AS p90_price,
           round(min(o_totalprice), 2)                 AS min_price,
           round(max(o_totalprice), 2)                 AS max_price
    FROM orders GROUP BY o_orderpriority
    """,
    survey="A3 exact percentiles (continuous interpolation)",
)
def exact_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return orders.groupBy("o_orderpriority").agg(
        F.round(F.expr("percentile(o_totalprice, 0.5)"), 4).alias("median_price"),
        F.round(F.expr("percentile(o_totalprice, 0.9)"), 4).alias("p90_price"),
        F.round(F.min("o_totalprice"), 2).alias("min_price"),
        F.round(F.max("o_totalprice"), 2).alias("max_price"),
    )


@register(
    "min_by_max_by",
    oracle="""
    SELECT c_mktsegment,
           min_by(c_name, c_acctbal) AS poorest_customer,
           max_by(c_name, c_acctbal) AS richest_customer,
           arg_max(c_custkey, c_acctbal) AS richest_key
    FROM customer GROUP BY c_mktsegment
    """,
    survey="A3 min_by/max_by (argmin/argmax aggregates)",
    doc="Deterministic: c_acctbal has no ties per segment in TESTDATA "
    "(driver seed 42); with ties these would need a struct-ordering "
    "tie-break.",
)
def min_by_max_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return cust.groupBy("c_mktsegment").agg(
        F.expr("min_by(c_name, c_acctbal)").alias("poorest_customer"),
        F.expr("max_by(c_name, c_acctbal)").alias("richest_customer"),
        F.expr("max_by(c_custkey, c_acctbal)").alias("richest_key"),
    )


@register(
    "hopping_window_events",
    oracle="""
    WITH offsets AS (SELECT unnest([0, 15]) AS off_min),
    hopped AS (
        SELECT time_bucket(INTERVAL '30 minutes', ts - to_minutes(off_min))
                   + to_minutes(off_min) AS window_start,
               value
        FROM events, offsets
        WHERE ts < TIMESTAMP '2024-01-02 00:00:00'
    )
    SELECT window_start, count(*) AS n, round(sum(value), 2) AS total_value
    FROM hopped GROUP BY window_start
    """,
    survey="§2.11 hopping (sliding) window",
    doc="30-min windows sliding every 15: each event lands in 2 windows "
    "(F.window with slideDuration). Oracle replays the same assignment "
    "with bucket arithmetic.",
)
def hopping_window_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    ev = ev.filter(F.col("ts") < F.lit("2024-01-02").cast("timestamp"))
    return (
        ev.groupBy(F.window("ts", "30 minutes", "15 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(F.col("w.start").alias("window_start"), "n", "total_value")
    )


@register(
    "deterministic_sample",
    oracle="""
    SELECT count(*) AS n_sampled,
           round(sum(o_totalprice), 2) AS sampled_total
    FROM orders
    WHERE ('0x' || substr(md5(o_orderkey::VARCHAR), 1, 8))::BIGINT % 100 < 10
    """,
    survey="LLM-pipeline: deterministic corpus sampling",
    doc="10% sample by content hash — reproducible across engines and "
    "runs, unlike rand()-based sampling; the standard way to carve "
    "held-out corpus slices. The hash-mod predicate is a plain column "
    "expression, so it pushes into the scan pipeline (no shuffle).",
)
def deterministic_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    bucket = (
        F.conv(F.substring(F.md5(F.encode(F.col("o_orderkey").cast("string"), "UTF-8")), 1, 8), 16, 10)
        .cast("long") % 100
    )
    return orders.filter(bucket < 10).agg(
        F.count(F.lit(1)).alias("n_sampled"),
        F.round(F.sum("o_totalprice"), 2).alias("sampled_total"),
    )


@register(
    "approx_sketches",
    oracle=None,  # approximate results differ across engines by design
    survey="A3 approximate aggregates (HLL / quantile sketch)",
    doc="approx_count_distinct (HyperLogLog++) and percentile_approx "
    "(t-digest-ish): the constant-memory sketch family 100 TB "
    "cardinality work needs. No oracle — sketch results are "
    "engine-specific by design; the driver records a rows-only check "
    "(exact counterparts are oracle-checked in distinct_agg_suppliers "
    "and exact_percentiles).",
)
def approx_sketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey").alias("approx_parts"),
        F.approx_count_distinct("l_suppkey").alias("approx_suppliers"),
        F.percentile_approx("l_extendedprice", 0.5).alias("approx_median_price"),
        F.count(F.lit(1)).alias("n"),
    )
