"""Additional hard TPC-H shapes.

Registered since round 3 (the registry window was freed by merging
narrow entries into multi-audit suites), so the driver oracle-checks
them directly.

Shapes covered (and why they're hard):

- **Q11** — HAVING against a GLOBAL scalar aggregate of the same
  input (important-stock shares): the global value is a one-row
  broadcast, not a second full scan per group.
- **Q15** — top-revenue supplier(s) via a derived revenue view joined
  against its own MAX: ties must all surface.
- **Q21** — EXISTS + NOT-EXISTS against the same fact table under
  different correlations (suppliers who kept multi-supplier orders
  waiting): two semi/anti joins with non-equi conjuncts.

(Q2's correlated-MIN decorrelation shape is already registered as
``correlated_subquery_parts``; TESTDATA has no partsupp table.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from radares_spark.io.tables import load_table
from radares_spark.registry import QuerySpec, register

# Library tier: q15 demoted from the driver window in r8 (A3 coverage
# retained by q11_important_stock); swept by test_oracle_parity.
LIBRARY_SPECS: dict[str, QuerySpec] = {}


def _library(name: str, oracle: str, survey: str, doc: str = ""):
    def wrap(fn):
        LIBRARY_SPECS[name] = QuerySpec(
            name=name, fn=fn, oracle=oracle, survey=survey, doc=doc
        )
        return fn
    return wrap

Q11_ORACLE = """
SELECT o_custkey, round(sum(o_totalprice), 2) AS value
FROM orders
GROUP BY o_custkey
HAVING round(sum(o_totalprice), 2) >
       (SELECT sum(o_totalprice) * 0.001 FROM orders)
"""


@register(
    "q11_important_stock",
    oracle=Q11_ORACLE,
    survey="F4 (HAVING vs global scalar), J4 (1-row broadcast)",
    doc="Q11 shape: HAVING against a GLOBAL scalar aggregate of the "
    "same input. The global threshold is a one-row broadcast joined "
    "under the filter - one fact shuffle total, never a second scan "
    "per group.",
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers whose order value exceeds 0.1% of ALL order value —
    HAVING against a global scalar of the same input (Q11 shape)."""
    orders = load_table(spark, sf_dir, "orders")
    per_cust = orders.groupBy("o_custkey").agg(
        F.round(F.sum("o_totalprice"), 2).alias("value")
    )
    total = orders.agg((F.sum("o_totalprice") * 0.001).alias("threshold"))
    return (
        per_cust.join(F.broadcast(total))
        .filter(F.col("value") > F.col("threshold"))
        .select("o_custkey", "value")
    )


Q15_ORACLE = """
WITH revenue AS (
    SELECT l_suppkey,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-07-01 00:00:00'
    GROUP BY l_suppkey
)
SELECT r.l_suppkey AS s_suppkey, s.s_name, r.total_revenue
FROM revenue r JOIN supplier s ON s.s_suppkey = r.l_suppkey
WHERE r.total_revenue = (SELECT max(total_revenue) FROM revenue)
"""


@_library(
    "q15_top_supplier",
    oracle=Q15_ORACLE,
    survey="derived view vs own MAX (Q15), ties surface",
    doc="Q15 shape: revenue view joined against its own MAX (1-row "
    "broadcast); ties all surface. Supplier dim broadcast.",
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier(s) with the maximum 1997-H1 revenue — derived view
    joined to its own MAX; ties all surface (Q15 shape)."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-07-01").cast("timestamp"))
    )
    supp = load_table(spark, sf_dir, "supplier")
    revenue = li.groupBy("l_suppkey").agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "total_revenue"
        )
    )
    mx = revenue.agg(F.max("total_revenue").alias("mr"))
    return (
        revenue.join(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("mr"))
        .join(F.broadcast(supp), F.col("l_suppkey") == supp.s_suppkey)
        .select(F.col("l_suppkey").alias("s_suppkey"), "s_name", "total_revenue")
    )


Q21_ORACLE = """
SELECT s_name, count(*) AS numwait
FROM lineitem l1 JOIN supplier ON s_suppkey = l1.l_suppkey
WHERE l1.l_returnflag = 'R'
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_returnflag = 'R')
GROUP BY s_name
"""


@register(
    "q21_waiting_suppliers",
    oracle=Q21_ORACLE,
    survey="J3+J2 double correlation (EXISTS + NOT EXISTS, non-equi "
    "conjuncts) - the hardest remaining relational shape",
    doc="Q21 shape (reference anti-join in miniature: "
    "src/backload_scrape.py:61-86): two differently-correlated "
    "semi/anti joins against the same fact table with a non-equi "
    "suppkey conjunct, then a broadcast dim join + count.",
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21 SHAPE on TESTDATA columns: suppliers whose lineitem was the
    ONLY returned one on a multi-supplier order — EXISTS (another
    supplier on the order) AND NOT EXISTS (another supplier's RETURNED
    line on the order). TESTDATA lacks l_receiptdate, so 'problem line'
    is l_returnflag = 'R' instead of receipt-after-ship; the two
    differently-correlated semi/anti joins — the hard part of Q21 —
    are identical."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_returnflag"
    )
    supp = load_table(spark, sf_dir, "supplier")
    late = li.filter(F.col("l_returnflag") == "R")

    l2 = li.select(F.col("l_orderkey").alias("o2"), F.col("l_suppkey").alias("s2"))
    l3 = late.select(F.col("l_orderkey").alias("o3"), F.col("l_suppkey").alias("s3"))
    cand = late.join(
        l2, (F.col("l_orderkey") == F.col("o2")) & (F.col("l_suppkey") != F.col("s2")), "left_semi"
    )
    lonely_late = cand.join(
        l3, (F.col("l_orderkey") == F.col("o3")) & (F.col("l_suppkey") != F.col("s3")), "left_anti"
    )
    return (
        lonely_late.join(F.broadcast(supp), F.col("l_suppkey") == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )



