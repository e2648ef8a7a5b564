"""Extended TPC-H-shaped query coverage over the TESTDATA star schema.

Fills the relational patterns the first library (``relational.py``)
did not exercise: non-equi EXISTS/semi-joins (Q4), multi-hop
dimension self-pair joins (Q7), large-group top-k over a 3-way join
(Q10), IN-subquery against an aggregated derived table (Q18),
disjunctive mixed fact/dim predicates (Q19), and a scalar-subquery
threshold + anti-join (Q22). (Conditional-aggregate ratios — the Q14
shape — are covered by radar_stats_suite and pivot_status_by_segment.)

Reference parity: the reference delegates all analysis to "querying
and analysis with another datas" (``/root/reference/README.md:3``);
SURVEY §2.7-2.8 declares this analytical surface. These are the
standard decision-support shapes over the driver's TPC-H-ish schema.

Scale notes (100 TB):

- ``nation``/``region``/``part``-sized sides are ``F.broadcast`` —
  the lineitem side never shuffles for a dimension lookup.
- Q18's IN-subquery is an aggregated semi-join: Spark plans the
  HAVING-filtered aggregate first (partial agg map-side), then a
  broadcast/shuffled semi join — no driver collection of keys.
- Q4's EXISTS is a left-semi join with a non-equi conjunct
  (``l_shipdate > o_orderdate``); the equi part (orderkey) still
  drives the hash join, the range conjunct is a post-join filter
  inside the same operator — no nested-loop explosion.
- Q22's scalar subquery broadcasts one row (the global average);
  Catalyst turns the cross join into BroadcastNestedLoopJoin over a
  single-row side, which is free.
- All money sums rounded for order-stable cross-engine comparison.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from radares_spark.io.tables import load_table
from radares_spark.registry import QuerySpec, register

# Library tier (plans/library.py aggregates): demoted from the 50-entry
# driver window in r8 to make room for the retrieval/snapshot flagships;
# still swept by the same strict DuckDB comparison in test_oracle_parity.
LIBRARY_SPECS: dict[str, QuerySpec] = {}


def _library(name: str, oracle: str, survey: str, doc: str = ""):
    def wrap(fn):
        LIBRARY_SPECS[name] = QuerySpec(
            name=name, fn=fn, oracle=oracle, survey=survey, doc=doc
        )
        return fn
    return wrap


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@_library(
    # r9 window rotation: demoted to library tier to make room for
    # shards_manifest_audit — every SURVEY id stays driver-covered
    # (J3 via q18/q21, F2 via relational_checks_suite, A1 via
    # calendar_gap_fill_orders); still strict-hash-swept here.
    "q4_priority_exists",
    oracle="""
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
    GROUP BY o_orderpriority
    """,
    survey="J3 (semi), F2, A1",
    doc="TPC-H Q4 shape: EXISTS with a non-equi conjunct -> left-semi "
    "hash join on orderkey with the range predicate evaluated in-join.",
)
def q4_priority_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        orders.join(
            li,
            (orders.o_orderkey == li.l_orderkey) & (li.l_shipdate > orders.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@_library(
    # r12 window rotation: demoted to the library tier to put the
    # nightly PSI drift monitor (operators/drift.events_drift_psi)
    # under the driver oracle — J4 (broadcast dim join) stays
    # driver-covered via q5/q3 and A3 via q1/q11; still
    # strict-hash-swept here.
    "q7_nation_volume",
    oracle="""
    SELECT supp_nation, cust_nation, l_year, round(sum(volume), 2) AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(year(l_shipdate) AS INTEGER) AS l_year,
             l_extendedprice * (1 - l_discount) AS volume
      FROM supplier
        JOIN lineitem ON s_suppkey = l_suppkey
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
         OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    """,
    survey="J4 (multi-hop broadcast), A3",
    doc="TPC-H Q7 shape: fact joined to the same dimension twice under "
    "different roles; both nation sides broadcast, one shuffle at the agg.",
)
def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    # Pre-filter BOTH nation roles to the two named nations before any
    # fact join: the inner joins against the shrunken broadcast dims then
    # semi-filter supplier/customer (and transitively the fact rows)
    # early — at 100x scale this discards ~(1 - 2/25) of lineitem at the
    # first join instead of carrying it to a post-join filter.
    two = F.col("n_name").isin("NATION_1", "NATION_2")
    n1 = nation.filter(two).withColumnsRenamed({"n_nationkey": "n1_key", "n_name": "supp_nation"})
    n2 = nation.filter(two).withColumnsRenamed({"n_nationkey": "n2_key", "n_name": "cust_nation"})
    supp2 = supp.join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
    cust2 = cust.join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
    return (
        li.join(F.broadcast(supp2), li.l_suppkey == F.col("s_suppkey"))
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust2, orders.o_custkey == F.col("c_custkey"))
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
        .withColumn("l_year", F.year("l_shipdate").cast("int"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
    )


@_library(
    "q10_returned_items",
    oracle="""
    SELECT c_custkey, c_name, n_name,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           round(c_acctbal, 2) AS acctbal
    FROM customer
      JOIN orders   ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN nation   ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-07-01 00:00:00'
    GROUP BY c_custkey, c_name, n_name, c_acctbal
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    survey="J4, A3, top-k (§2.8)",
    doc="TPC-H Q10 shape: returned-item revenue per customer; 3-way join "
    "+ broadcast dim + deterministic top-20.",
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-07-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nation = _t(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name", "c_acctbal")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
        .withColumn("acctbal", F.round("c_acctbal", 2))
        .drop("c_acctbal")
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@register(
    "q18_large_orders",
    oracle="""
    SELECT c_custkey, o_orderkey, o_orderdate,
           round(o_totalprice, 2) AS totalprice,
           round(sum(l_quantity), 2) AS sum_qty
    FROM customer
      JOIN orders   ON c_custkey = o_custkey
      JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                         GROUP BY l_orderkey HAVING sum(l_quantity) > 250)
    GROUP BY c_custkey, o_orderkey, o_orderdate, o_totalprice
    ORDER BY totalprice DESC, o_orderkey
    LIMIT 20
    """,
    survey="J3 (agg semi), A3, top-k",
    doc="TPC-H Q18 shape: IN-subquery over an aggregated derived table. "
    "The HAVING-filtered per-order aggregate IS the quantity sum the "
    "output needs (an order has one customer/date/price), so the "
    "filter set and the final measure come from ONE lineitem shuffle — "
    "the textbook semi-join-then-rejoin form scans and shuffles the "
    "fact twice for identical results.",
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer").select("c_custkey")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("s"))
        .filter(F.col("s") > 250)
    )
    return (
        orders.join(big, orders.o_orderkey == big.l_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            F.round("o_totalprice", 2).alias("totalprice"),
            F.round("s", 2).alias("sum_qty"),
        )
        .orderBy(F.desc("totalprice"), F.asc("o_orderkey"))
        .limit(20)
    )


@_library(
    "q19_disjunctive_pred",
    oracle="""
    SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35
           AND l_quantity BETWEEN 20 AND 30)
    """,
    survey="F (disjunctive mixed-table), J4",
    doc="TPC-H Q19 shape: disjunction mixing fact and dim columns; the "
    "common-term (brand IN / size / qty bounds) still prunes both scans.",
)
def q19_disjunctive_pred(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    joined = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    cond = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 25)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#34")
            & F.col("p_size").between(1, 35)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return joined.filter(cond).agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue")
    )


@register(
    "q22_idle_customers",
    oracle="""
    WITH avg_bal AS (
      SELECT avg(c_acctbal) AS a FROM customer WHERE c_acctbal > 0
    )
    SELECT c_mktsegment AS segment,
           count(*) AS numcust,
           round(sum(c_acctbal), 2) AS totacctbal
    FROM customer, avg_bal
    WHERE c_acctbal > a
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderdate >= TIMESTAMP '2001-01-01 00:00:00')
    GROUP BY c_mktsegment
    """,
    survey="J2 (anti), scalar subquery, A3",
    doc="TPC-H Q22 shape: scalar-subquery threshold (single-row "
    "broadcast) + anti join against recent orders.",
)
def q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    recent = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("2001-01-01").cast("timestamp"))
        .select("o_custkey")
    )
    avg_bal = cust.filter(F.col("c_acctbal") > 0).agg(F.avg("c_acctbal").alias("a"))
    return (
        cust.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("a"))
        .join(recent, cust.c_custkey == recent.o_custkey, "left_anti")
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
    )
