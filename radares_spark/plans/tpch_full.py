"""Completion of the TPC-H query surface (the 10 shapes not yet in
``relational.py`` / ``tpch_more.py`` / ``tpch_extra.py``).

With this module every one of the 22 public TPC-H query shapes has a
Spark-first implementation in the engine: 12 are driver-registered
(the 50-entry correctness window is full), these 10 are library
queries pinned by the SAME strict DuckDB-oracle comparison in
``tests/test_tpch_full.py`` (typed, multiset, no cross-type
collapses — see ``tests/oracle.py``).

Two groups:

**Group A — runnable on TESTDATA directly** (``(spark, sf_dir)``
signature, same contract as every registered query): Q6, Q8, Q12,
Q13, Q14, Q17. Where TESTDATA lacks a column the public spec uses,
the adaptation keeps the *shape* and is documented on the function:

- Q12: no ``l_shipmode``/``l_commitdate``/``l_receiptdate`` →
  ``l_returnflag`` is the mode axis and the late-line predicate is
  the 1996 ship-year; the dual conditional count over a fact-fact
  join — the hard part — is identical.
- Q17: no ``p_container`` → brand-only part filter; the per-part
  correlated AVG threshold is identical.

**Group B — partsupp-dependent** (Q2, Q9, Q16, Q20): TESTDATA has no
``partsupp`` table (VERDICT r2 notes this is out of the builder's
control), so these take their inputs as DataFrames. The test suite
derives a deterministic partsupp from the distinct
``(l_partkey, l_suppkey)`` pairs actually present in lineitem — the
same containment invariant the real TPC-H generator guarantees — and
feeds the *identical* pandas frame to Spark and DuckDB so values are
bit-for-bit comparable.

Scale notes (100 TB):

- Dimensions (``nation``/``region``/``supplier``/filtered ``part``)
  are ``F.broadcast``; the lineitem side never shuffles for a lookup.
- Q13 keeps the filter in the OUTER JOIN'S CONDITION (the classic
  trap: a WHERE would turn it inner and drop zero-order customers).
- Q17/Q20's correlated aggregates are decorrelated into one
  partkey-grouped aggregate joined back — the group-by and the
  join-back share the same hash partitioning, so Spark plans one
  shuffle, not two.
- Q2's correlated MIN is region-filtered *before* the per-part MIN,
  so the aggregate reads only the region's partsupp rows.
- Q9 shuffles lineitem once on the composite (partkey, suppkey) for
  the partsupp join; orders joins on orderkey (second shuffle);
  everything else is broadcast.
- Money sums/ratios rounded for order-stable cross-engine compare.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from radares_spark.io.tables import load_table
from radares_spark.registry import QuerySpec

_HIGH_PRIO = ("1-URGENT", "2-HIGH")


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# --------------------------------------------------------------------
# Group A: runnable on TESTDATA directly
# --------------------------------------------------------------------

Q6_ORACLE = """
SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: pure scan-side revenue forecast — every predicate
    pushes into the parquet scan, one partial-agg shuffle of a single
    row. The cheapest possible shape at any scale."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias("revenue"))
    )


Q8_NATION = "NATION_7"
Q8_ORACLE = f"""
SELECT o_year,
       round(sum(CASE WHEN nation = '{Q8_NATION}' THEN volume ELSE 0 END)
             / sum(volume), 4) AS mkt_share
FROM (
    SELECT year(o_orderdate) AS o_year,
           l_extendedprice * (1 - l_discount) AS volume,
           n2.n_name AS nation
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation n1 ON c_nationkey = n1.n_nationkey
    JOIN region   ON n1.n_regionkey = r_regionkey
    JOIN part     ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation n2 ON s_nationkey = n2.n_nationkey
    WHERE r_name = 'EUROPE' AND p_type = 'ECONOMY'
      AND o_orderdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
                          AND TIMESTAMP '1997-12-31 00:00:00'
) all_nations
GROUP BY o_year
"""


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8: national market share. Two nation ROLES (customer's
    region gate, supplier's share axis) — both broadcast; the fact
    pipeline shuffles twice (orders⋈customer on custkey, then
    lineitem⋈orders on orderkey) and aggregates by year."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate").between(
            F.lit("1996-01-01").cast("timestamp"), F.lit("1997-12-31").cast("timestamp")
        )
    )
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    part = _t(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    supp = _t(spark, sf_dir, "supplier")

    # customer-side gate: nations of the EUROPE region only
    n1 = nation.join(F.broadcast(region), nation.n_regionkey == region.r_regionkey).select(
        "n_nationkey"
    )
    cust_eur = cust.join(F.broadcast(n1), cust.c_nationkey == n1.n_nationkey).select("c_custkey")
    # supplier-side share axis: supplier nation name
    supp_nat = supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey).select(
        "s_suppkey", F.col("n_name").alias("nation")
    )

    fact = (
        orders.join(cust_eur, orders.o_custkey == cust_eur.c_custkey)
        .join(li, li.l_orderkey == F.col("o_orderkey"))
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp_nat), li.l_suppkey == F.col("s_suppkey"))
        .select(
            F.year("o_orderdate").alias("o_year"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("volume"),
            "nation",
        )
    )
    return fact.groupBy("o_year").agg(
        F.round(
            F.sum(F.when(F.col("nation") == Q8_NATION, F.col("volume")).otherwise(0.0))
            / F.sum("volume"),
            4,
        ).alias("mkt_share")
    )


Q12_ORACLE = f"""
SELECT l_returnflag,
       sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END)::BIGINT AS high_line_count,
       sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END)::BIGINT AS low_line_count
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
WHERE l_returnflag IN ('R', 'A')
  AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
GROUP BY l_returnflag
"""


def q12_priority_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 SHAPE on TESTDATA columns (no ``l_shipmode`` /
    ``l_commitdate`` / ``l_receiptdate``): lineitem classified by
    ``l_returnflag``, dual conditional counts of the joined order's
    priority. The fact-fact join + conditional-agg core is identical;
    the line-side filters push into the scan before the join."""
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag").isin("R", "A")
        & (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    orders = _t(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin(*_HIGH_PRIO)
    return (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


Q13_ORACLE = """
SELECT c_count, count(*)::BIGINT AS custdist
FROM (
    SELECT c_custkey, count(o_orderkey) AS c_count
    FROM customer LEFT OUTER JOIN orders
      ON c_custkey = o_custkey AND o_orderpriority <> '4-NOT SPECIFIED'
    GROUP BY c_custkey
) c_orders
GROUP BY c_count
"""


def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: order-count distribution. The filter lives in the
    OUTER join's ON clause — putting it in a WHERE would silently
    turn the join inner and drop zero-order customers (the classic
    outer-join trap). First agg shuffles on custkey; the second input
    is |distinct counts| rows — negligible."""
    cust = _t(spark, sf_dir, "customer").select("c_custkey")
    orders = _t(spark, sf_dir, "orders").select("o_custkey", "o_orderkey", "o_orderpriority")
    per_cust = (
        cust.join(
            orders,
            (cust.c_custkey == orders.o_custkey)
            & (orders.o_orderpriority != "4-NOT SPECIFIED"),
            "left_outer",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


Q14_ORACLE = """
SELECT round(100.00 * sum(CASE WHEN p_type = 'PROMO'
                               THEN l_extendedprice * (1 - l_discount)
                               ELSE 0 END)
             / sum(l_extendedprice * (1 - l_discount)), 4) AS promo_revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-03-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
"""


def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: promo revenue share for one ship-month. Part joins
    broadcast (only partkey+type survive pruning); the month filter
    pushes into the lineitem scan; one single-row aggregate."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            F.round(
                100.0
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0))
                / F.sum(rev),
                4,
            ).alias("promo_revenue")
        )
    )


Q17_ORACLE = """
SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE p_brand = 'Brand#1'
  AND l_quantity < (SELECT 0.2 * avg(l_quantity)
                    FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
"""


def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 SHAPE (brand-only part filter; TESTDATA has no
    ``p_container``): revenue lost to small-quantity orders. The
    correlated per-part AVG is decorrelated: restrict lineitem to the
    brand's parts FIRST (broadcast semi), then one partkey-grouped
    AVG joined back on the same key — the aggregate and the join-back
    share hash partitioning, so Catalyst plans a single shuffle."""
    part_b = _t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#1").select("p_partkey")
    li = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_quantity", "l_extendedprice")
    li_b = li.join(F.broadcast(part_b), li.l_partkey == part_b.p_partkey).drop("p_partkey")
    thresh = li_b.groupBy("l_partkey").agg((0.2 * F.avg("l_quantity")).alias("qty_thresh"))
    return (
        li_b.alias("l")
        .join(thresh.alias("t"), F.col("l.l_partkey") == F.col("t.l_partkey"))
        .filter(F.col("l.l_quantity") < F.col("qty_thresh"))
        .agg(F.round(F.sum("l.l_extendedprice") / 7.0, 2).alias("avg_yearly"))
    )


# Library specs: same (fn, oracle) contract as the registry, pinned by
# tests/test_tpch_full.py with the driver-strict comparator. NOT
# registered — the 50-entry driver window is full.
LIBRARY_SPECS: dict[str, QuerySpec] = {
    spec.name: spec
    for spec in (
        QuerySpec("q6_forecast_revenue", q6_forecast_revenue, Q6_ORACLE, "F2, A3 (Q6)"),
        QuerySpec("q8_market_share", q8_market_share, Q8_ORACLE, "J1/J4 two nation roles (Q8)"),
        QuerySpec("q12_priority_by_flag", q12_priority_by_flag, Q12_ORACLE, "J1, A3 (Q12 shape)"),
        QuerySpec(
            "q13_customer_distribution", q13_customer_distribution, Q13_ORACLE, "J2 outer, A1 (Q13)"
        ),
        QuerySpec("q14_promo_revenue", q14_promo_revenue, Q14_ORACLE, "J4, A3 ratio (Q14)"),
        QuerySpec(
            "q17_small_quantity_revenue",
            q17_small_quantity_revenue,
            Q17_ORACLE,
            "correlated scalar AVG decorrelated (Q17 shape)",
        ),
    )
}


# --------------------------------------------------------------------
# Group B: partsupp-dependent (inputs passed as DataFrames)
# --------------------------------------------------------------------

Q2_REGION = "EUROPE"
Q2_ORACLE = f"""
SELECT s_acctbal, s_name, n_name, p_partkey, ps_supplycost
FROM part, supplier, partsupp, nation, region
WHERE p_partkey = ps_partkey AND s_suppkey = ps_suppkey
  AND p_size <= 10 AND p_type = 'LARGE'
  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
  AND r_name = '{Q2_REGION}'
  AND ps_supplycost = (
      SELECT min(ps2.ps_supplycost)
      FROM partsupp ps2, supplier s2, nation n2, region r2
      WHERE p_partkey = ps2.ps_partkey AND s2.s_suppkey = ps2.ps_suppkey
        AND s2.s_nationkey = n2.n_nationkey
        AND n2.n_regionkey = r2.r_regionkey AND r2.r_name = '{Q2_REGION}')
"""


def q2_min_cost_supplier(
    part: DataFrame,
    supplier: DataFrame,
    partsupp: DataFrame,
    nation: DataFrame,
    region: DataFrame,
) -> DataFrame:
    """TPC-H Q2: cheapest supplier per small LARGE-type part within
    one region. The correlated MIN is decorrelated: partsupp is
    region-filtered ONCE (broadcast supplier⋈nation⋈region), the
    per-part MIN aggregates only those rows, and the join-back on
    (partkey, cost) reuses the partkey hash partitioning. Ties all
    surface, as in the spec."""
    nat_reg = (
        nation.join(
            F.broadcast(region.filter(F.col("r_name") == Q2_REGION)),
            nation.n_regionkey == region.r_regionkey,
        )
        .select("n_nationkey", "n_name")
    )
    supp_reg = supplier.join(
        F.broadcast(nat_reg), supplier.s_nationkey == nat_reg.n_nationkey
    ).select("s_suppkey", "s_name", "s_acctbal", "n_name")
    ps_reg = partsupp.join(F.broadcast(supp_reg), partsupp.ps_suppkey == supp_reg.s_suppkey)
    # rename the agg key: min_cost derives from ps_reg, so joining the
    # two on a same-named column would be an ambiguous self-join
    min_cost = ps_reg.groupBy(F.col("ps_partkey").alias("mc_partkey")).agg(
        F.min("ps_supplycost").alias("min_cost")
    )
    part_f = part.filter((F.col("p_size") <= 10) & (F.col("p_type") == "LARGE")).select(
        "p_partkey"
    )
    return (
        ps_reg.join(
            min_cost,
            (F.col("ps_partkey") == F.col("mc_partkey"))
            & (F.col("ps_supplycost") == F.col("min_cost")),
        )
        .join(F.broadcast(part_f), F.col("ps_partkey") == part_f.p_partkey)
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "ps_supplycost")
    )


Q9_ORACLE = """
SELECT nation, o_year, round(sum(amount), 2) AS sum_profit
FROM (
    SELECT n_name AS nation,
           year(o_orderdate) AS o_year,
           l_extendedprice * (1 - l_discount) - ps_supplycost * l_quantity AS amount
    FROM lineitem
    JOIN partsupp ON ps_suppkey = l_suppkey AND ps_partkey = l_partkey
    JOIN part     ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN nation   ON s_nationkey = n_nationkey
    WHERE p_type = 'PROMO'
) profit
GROUP BY nation, o_year
"""


def q9_product_type_profit(
    lineitem: DataFrame,
    partsupp: DataFrame,
    part: DataFrame,
    supplier: DataFrame,
    orders: DataFrame,
    nation: DataFrame,
) -> DataFrame:
    """TPC-H Q9 SHAPE (``p_type`` filter instead of the spec's
    ``p_name LIKE``; TESTDATA p_name carries no green-ness): profit
    by supplier nation and year. lineitem is pre-pruned by the
    filtered part (broadcast) BEFORE the composite-key partsupp join,
    so the big shuffle moves only the profit-relevant lines; orders
    joins on orderkey; supplier⋈nation is a broadcast lookup."""
    part_f = part.filter(F.col("p_type") == "PROMO").select("p_partkey")
    li = lineitem.join(F.broadcast(part_f), lineitem.l_partkey == part_f.p_partkey).drop(
        "p_partkey"
    )
    supp_nat = supplier.join(
        F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey
    ).select("s_suppkey", F.col("n_name").alias("nation"))
    fact = (
        li.join(
            partsupp,
            (li.l_suppkey == partsupp.ps_suppkey) & (li.l_partkey == partsupp.ps_partkey),
        )
        .join(orders.select("o_orderkey", "o_orderdate"), li.l_orderkey == F.col("o_orderkey"))
        .join(F.broadcast(supp_nat), li.l_suppkey == supp_nat.s_suppkey)
        .select(
            "nation",
            F.year("o_orderdate").alias("o_year"),
            (
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
                - F.col("ps_supplycost") * F.col("l_quantity")
            ).alias("amount"),
        )
    )
    return fact.groupBy("nation", "o_year").agg(F.round(F.sum("amount"), 2).alias("sum_profit"))


Q16_SIZES = (1, 14, 23, 45)
Q16_ORACLE = f"""
SELECT p_brand, p_type, p_size, count(DISTINCT ps_suppkey)::BIGINT AS supplier_cnt
FROM partsupp JOIN part ON p_partkey = ps_partkey
WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
  AND p_size IN {Q16_SIZES}
  AND ps_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
"""


def q16_supplier_count(
    partsupp: DataFrame, part: DataFrame, supplier: DataFrame
) -> DataFrame:
    """TPC-H Q16 SHAPE (the excluded-supplier set is ``s_acctbal <
    0`` — TESTDATA comments carry no complaints): distinct supplier
    counts per part group, excluding flagged suppliers. The NOT IN
    is a broadcast anti-join (keys are never collected); the
    count(DISTINCT) shuffles once on the group keys."""
    part_f = part.filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(*Q16_SIZES)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    bad_supp = supplier.filter(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        partsupp.join(F.broadcast(part_f), partsupp.ps_partkey == part_f.p_partkey)
        .join(F.broadcast(bad_supp), partsupp.ps_suppkey == bad_supp.s_suppkey, "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("ps_suppkey").alias("supplier_cnt"))
    )


Q20_NATION = "NATION_3"
Q20_ORACLE = f"""
SELECT s_name, s_acctbal
FROM supplier JOIN nation ON s_nationkey = n_nationkey
WHERE n_name = '{Q20_NATION}'
  AND s_suppkey IN (
      SELECT ps_suppkey FROM partsupp
      WHERE ps_partkey IN (SELECT p_partkey FROM part WHERE p_type = 'SMALL')
        AND ps_availqty > (
            SELECT 0.5 * sum(l_quantity) FROM lineitem
            WHERE l_partkey = ps_partkey AND l_suppkey = ps_suppkey
              AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
              AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'))
"""


def q20_excess_stock_suppliers(
    supplier: DataFrame,
    nation: DataFrame,
    partsupp: DataFrame,
    part: DataFrame,
    lineitem: DataFrame,
) -> DataFrame:
    """TPC-H Q20: suppliers of SMALL parts holding more than half a
    year's shipped quantity. The correlated per-(part, supplier) SUM
    is one composite-key aggregate inner-joined back (SQL's NULL
    comparison on an empty correlation excludes the pair — the inner
    join matches that exactly); the qualifying suppkey set then
    semi-joins the nation-filtered supplier dim."""
    part_f = part.filter(F.col("p_type") == "SMALL").select("p_partkey")
    ps = partsupp.join(F.broadcast(part_f), partsupp.ps_partkey == part_f.p_partkey).drop(
        "p_partkey"
    )
    shipped = (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg((0.5 * F.sum("l_quantity")).alias("half_qty"))
    )
    good_keys = (
        ps.join(
            shipped,
            (ps.ps_partkey == shipped.l_partkey) & (ps.ps_suppkey == shipped.l_suppkey),
        )
        .filter(F.col("ps_availqty") > F.col("half_qty"))
        .select("ps_suppkey")
    )
    nat = nation.filter(F.col("n_name") == Q20_NATION).select("n_nationkey")
    return (
        supplier.join(F.broadcast(nat), supplier.s_nationkey == nat.n_nationkey)
        .join(good_keys, supplier.s_suppkey == good_keys.ps_suppkey, "left_semi")
        .select("s_name", "s_acctbal")
    )


# (fn, oracle, table-arg names) for the partsupp group — the test
# suite resolves each arg name to a DataFrame and feeds the SAME
# frames (as DuckDB views / a registered pandas partsupp) to both
# engines.
PARTSUPP_SPECS: dict[str, tuple] = {
    "q2_min_cost_supplier": (
        q2_min_cost_supplier,
        Q2_ORACLE,
        ("part", "supplier", "partsupp", "nation", "region"),
    ),
    "q9_product_type_profit": (
        q9_product_type_profit,
        Q9_ORACLE,
        ("lineitem", "partsupp", "part", "supplier", "orders", "nation"),
    ),
    "q16_supplier_count": (
        q16_supplier_count,
        Q16_ORACLE,
        ("partsupp", "part", "supplier"),
    ),
    "q20_excess_stock_suppliers": (
        q20_excess_stock_suppliers,
        Q20_ORACLE,
        ("supplier", "nation", "partsupp", "part", "lineitem"),
    ),
}
