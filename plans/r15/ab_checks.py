"""A/B: relational_checks_suite shared scans (r15 item 4, guide §2.4/§6).

Base = the registered plan (orders scanned 3x, customer 3x, supplier
2x at the logical level).  V2 merges branches that re-scan a table the
plan already aggregates:
  - supplier: the countDistinct branch counts the SAME distinct frame
    the EXCEPT/INTERSECT branches build (2 scans -> 1);
  - customer: the anti-join + semi-join pair becomes ONE left join
    with two conditional counts (3 scans -> 2);
  - orders: the hash-sample filtered aggregate folds into the global
    conditional aggregate as two more conditional aggregates
    (3 scans -> 2).
Row-multiset equality asserted first; warm noop reps interleaved.
"""
from __future__ import annotations

import os
import statistics
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[2]
sys.path.insert(0, str(REPO))

from pyspark.sql import DataFrame, functions as F  # noqa: E402
from pyspark.sql import Window as W  # noqa: E402

from radares_spark.session import DEFAULT_SF_DIR, get_spark  # noqa: E402

REPS = 6


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def build_v2(spark, sf_dir: str) -> DataFrame:
    from radares_spark.io.tables import load_table

    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")

    def tag(name: str, df: DataFrame) -> DataFrame:
        return df.agg(F.count(F.lit(1)).alias("n")).select(
            F.lit(name).alias("check_name"), "n"
        )

    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    per_cust = (
        orders.withColumn(
            "gap_days", F.datediff(F.col("o_orderdate"), F.lag("o_orderdate").over(w))
        )
        .groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.max("gap_days").alias("max_gap"),
            F.sum(F.when(F.col("o_orderstatus") == "O", 1).otherwise(0)).alias("n_open"),
        )
    )
    big = tag("big_customers", per_cust.filter(F.col("n_orders") >= 20))
    gappy = tag("gap_gt_60d", per_cust.filter(F.col("max_gap") > 60))

    # ONE left join of customer against the per-customer aggregate
    # covers both the anti-join (no match) and the semi-join-with-
    # open-orders (match with n_open > 0) audits
    cflag = cust.join(
        F.broadcast(per_cust.select("o_custkey", "n_open")),
        cust.c_custkey == F.col("o_custkey"),
        "left",
    ).agg(
        F.count(F.when(F.col("o_custkey").isNull(), 1)).alias("n_none"),
        F.count(F.when(F.col("n_open") > 0, 1)).alias("n_act"),
    )
    no_orders = cflag.select(
        F.lit("cust_no_orders").alias("check_name"), F.col("n_none").alias("n")
    )
    active = cflag.select(
        F.lit("cust_open_orders").alias("check_name"), F.col("n_act").alias("n")
    )

    in_window = F.col("o_orderdate").between(
        F.lit("1996-01-01").cast("timestamp"), F.lit("1997-12-31").cast("timestamp")
    )
    bucket = (
        F.conv(
            F.substring(F.md5(F.encode(F.col("o_orderkey").cast("string"), "UTF-8")), 1, 8),
            16,
            10,
        ).cast("long")
        % 100
    )
    both = orders.agg(
        F.sum(
            F.when(
                F.col("o_orderpriority").isin("1-URGENT", "2-HIGH") & in_window, 1
            ).otherwise(0)
        )
        .cast("long")
        .alias("urgent"),
        F.countDistinct(
            F.when(
                F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp"),
                F.date_trunc("month", "o_orderdate"),
            )
        ).alias("months"),
        F.count(F.when(bucket < 10, 1)).alias("n_sampled"),
        F.round(F.round(F.sum(F.when(bucket < 10, F.col("o_totalprice"))), 2) * 100)
        .cast("long")
        .alias("cents"),
    )
    urgent = both.select(F.lit("urgent_96_97").alias("check_name"), F.col("urgent").alias("n"))
    months = both.select(
        F.lit("order_months_2000").alias("check_name"), F.col("months").alias("n")
    )
    sample_n = both.select(
        F.lit("sample_10pct_n").alias("check_name"), F.col("n_sampled").alias("n")
    )
    sample_cents = both.select(
        F.lit("sample_10pct_total_cents").alias("check_name"), F.col("cents").alias("n")
    )

    cn = cust.select(F.col("c_nationkey").alias("k")).distinct()
    sn = supp.select(F.col("s_nationkey").alias("k")).distinct()
    # the countDistinct branch counts the SAME distinct frame the set
    # ops consume (count(k) skips nulls exactly like countDistinct)
    supp_nations = sn.agg(F.count("k").alias("n")).select(
        F.lit("supp_nations").alias("check_name"), "n"
    )
    nations_only = tag("nations_cust_only", cn.exceptAll(sn).distinct())
    nations_both = tag("nations_both", cn.intersect(sn))

    parts = [
        urgent,
        no_orders,
        active,
        big,
        supp_nations,
        gappy,
        months,
        nations_only,
        nations_both,
        sample_n,
        sample_cents,
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def _rows(pairs):
    """One (check_name, n) row per pair out of a SINGLE one-row
    aggregate: explode(array(struct...)) keeps ONE copy of the
    upstream subtree in the plan, where one select-per-pair clones the
    whole subtree per consumer (the v2 lesson: the textual plan kept
    8 orders scans because every tagged select re-expanded its
    source)."""
    arr = F.array(
        *[
            F.struct(
                F.lit(name).alias("check_name"),
                F.col(col).cast("long").alias("n"),
            )
            for name, col in pairs
        ]
    )
    return F.explode(arr).alias("kv")


def build_v3(spark, sf_dir: str) -> DataFrame:
    from radares_spark.io.tables import load_table

    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")

    def tag(name: str, df: DataFrame) -> DataFrame:
        return df.agg(F.count(F.lit(1)).alias("n")).select(
            F.lit(name).alias("check_name"), "n"
        )

    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    per_cust = (
        orders.withColumn(
            "gap_days", F.datediff(F.col("o_orderdate"), F.lag("o_orderdate").over(w))
        )
        .groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.max("gap_days").alias("max_gap"),
            F.sum(F.when(F.col("o_orderstatus") == "O", 1).otherwise(0)).alias("n_open"),
        )
    )
    big_gappy = (
        per_cust.agg(
            F.count(F.when(F.col("n_orders") >= 20, 1)).alias("n_big"),
            F.count(F.when(F.col("max_gap") > 60, 1)).alias("n_gappy"),
        )
        .select(_rows([("big_customers", "n_big"), ("gap_gt_60d", "n_gappy")]))
        .select("kv.check_name", "kv.n")
    )

    cflag = (
        cust.join(
            F.broadcast(per_cust.select("o_custkey", "n_open")),
            cust.c_custkey == F.col("o_custkey"),
            "left",
        )
        .agg(
            F.count(F.when(F.col("o_custkey").isNull(), 1)).alias("n_none"),
            F.count(F.when(F.col("n_open") > 0, 1)).alias("n_act"),
        )
        .select(_rows([("cust_no_orders", "n_none"), ("cust_open_orders", "n_act")]))
        .select("kv.check_name", "kv.n")
    )

    in_window = F.col("o_orderdate").between(
        F.lit("1996-01-01").cast("timestamp"), F.lit("1997-12-31").cast("timestamp")
    )
    bucket = (
        F.conv(
            F.substring(F.md5(F.encode(F.col("o_orderkey").cast("string"), "UTF-8")), 1, 8),
            16,
            10,
        ).cast("long")
        % 100
    )
    both = (
        orders.agg(
            F.sum(
                F.when(
                    F.col("o_orderpriority").isin("1-URGENT", "2-HIGH") & in_window, 1
                ).otherwise(0)
            )
            .cast("long")
            .alias("urgent"),
            F.countDistinct(
                F.when(
                    F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp"),
                    F.date_trunc("month", "o_orderdate"),
                )
            ).alias("months"),
            F.count(F.when(bucket < 10, 1)).alias("n_sampled"),
            F.round(F.round(F.sum(F.when(bucket < 10, F.col("o_totalprice"))), 2) * 100)
            .cast("long")
            .alias("cents"),
        )
        .select(
            _rows(
                [
                    ("urgent_96_97", "urgent"),
                    ("order_months_2000", "months"),
                    ("sample_10pct_n", "n_sampled"),
                    ("sample_10pct_total_cents", "cents"),
                ]
            )
        )
        .select("kv.check_name", "kv.n")
    )

    cn = cust.select(F.col("c_nationkey").alias("k")).distinct()
    sn = supp.select(F.col("s_nationkey").alias("k")).distinct()
    supp_nations = sn.agg(F.count("k").alias("n")).select(
        F.lit("supp_nations").alias("check_name"), "n"
    )
    nations_only = tag("nations_cust_only", cn.exceptAll(sn).distinct())
    nations_both = tag("nations_both", cn.intersect(sn))

    parts = [both, cflag, big_gappy, supp_nations, nations_only, nations_both]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", DEFAULT_SF_DIR)
    spark = get_spark("radares-ab-checks")
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).count()

    from radares_spark.plans import REGISTRY

    a = REGISTRY["relational_checks_suite"].fn(spark, sf_dir)
    b = build_v3(spark, sf_dir)
    diff = a.exceptAll(b).count() + b.exceptAll(a).count()
    print(f"row diff: {diff}", flush=True)
    if diff:
        spark.stop()
        return

    def scans(df, tbl):
        s = df._jdf.queryExecution().executedPlan().toString()
        return s.count(f"{tbl}.parquet")

    for tag_, df in (("base", a), ("v2", b)):
        print(
            f"{tag_}: orders_scans={scans(df,'orders')} cust={scans(df,'customer')} "
            f"supp={scans(df,'supplier')} "
            f"exchanges={df._jdf.queryExecution().executedPlan().toString().count('Exchange')}",
            flush=True,
        )
    noop(a)
    noop(b)
    wa, wb = [], []
    for _ in range(REPS):
        t0 = time.perf_counter(); noop(a); wa.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); noop(b); wb.append(time.perf_counter() - t0)
    print(
        f"base min={min(wa):.3f} med={statistics.median(wa):.3f} | "
        f"v2 min={min(wb):.3f} med={statistics.median(wb):.3f}",
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    main()
