"""Advanced relational coverage: grouping sets, correlated subqueries,
exact percentiles + min_by/max_by, deterministic sampling, and the
approximate-sketch family.

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
    load_table(spark, sf_dir, name).createOrReplaceTempView(name)


_GROUPING_SQL = """
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2)      AS sum_qty,
           round(sum(l_extendedprice), 2) AS revenue,
           count(*)                       AS n
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag),
                            (l_linestatus), ())
"""


@register(
    "grouping_analytics_lineitem",
    oracle=_GROUPING_SQL,
    survey="A3 rollup + grouping sets (cube lives in cube_orders)",
    doc="ROLLUP(l_returnflag, l_linestatus) is the grouping-set family "
    "{(rf,ls),(rf),()}; this query declares the superset "
    "{(rf,ls),(rf),(ls),()} via GROUPING SETS, covering both the rollup "
    "lattice and arbitrary set selection in one aggregate — Catalyst "
    "expands to a single Expand + hash aggregate (one shuffle), not one "
    "scan per set.",
)
def grouping_analytics_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    _view(spark, sf_dir, "lineitem")
    return spark.sql(_GROUPING_SQL)


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
    SELECT c_mktsegment,
           round(quantile_cont(c_acctbal, 0.5), 4)  AS median_bal,
           round(quantile_cont(c_acctbal, 0.9), 4)  AS p90_bal,
           round(min(c_acctbal), 2)                 AS min_bal,
           round(max(c_acctbal), 2)                 AS max_bal,
           min_by(c_name, c_acctbal)                AS poorest_customer,
           max_by(c_name, c_acctbal)                AS richest_customer,
           arg_max(c_custkey, c_acctbal)            AS richest_key
    FROM customer GROUP BY c_mktsegment
    """,
    survey="A3 exact percentiles (continuous interpolation) + "
    "min_by/max_by (argmin/argmax aggregates)",
    doc="Exact interpolated percentiles and argmin/argmax in one "
    "aggregate over the customer dimension. Deterministic: c_acctbal "
    "has no ties per segment in TESTDATA (driver seed 42); with ties "
    "min_by/max_by would need a struct-ordering tie-break.",
)
def exact_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    return cust.groupBy("c_mktsegment").agg(
        F.round(F.expr("percentile(c_acctbal, 0.5)"), 4).alias("median_bal"),
        F.round(F.expr("percentile(c_acctbal, 0.9)"), 4).alias("p90_bal"),
        F.round(F.min("c_acctbal"), 2).alias("min_bal"),
        F.round(F.max("c_acctbal"), 2).alias("max_bal"),
        F.expr("min_by(c_name, c_acctbal)").alias("poorest_customer"),
        F.expr("max_by(c_name, c_acctbal)").alias("richest_customer"),
        F.expr("max_by(c_custkey, c_acctbal)").alias("richest_key"),
    )


# (deterministic hash-mod sampling is audited inside
# relational_checks_suite — sample_10pct_n / sample_10pct_total_cents —
# and used as a pipeline stage in pipeline/corpus.curate; the
# token-budget variant is registered as corpus_token_budget.)


# HLL++ default relative standard deviation is 0.05
# (approx_count_distinct's documented default rsd); 3 sigma bounds the
# estimate with overwhelming probability — and the check is
# deterministic anyway (Spark's HLL++ has no RNG: fixed hash, fixed
# dataset, fixed estimate).
_HLL_REL_ERR_BOUND = 3 * 0.05
# percentile_approx's guarantee is RANK error <= n/accuracy (default
# accuracy 10000, so ~n/10000 ranks). The check pins the returned
# element between the exact 49.9th and 50.1st percentiles — a +-0.001
# rank-fraction window, ~10x looser than the guarantee at testdata
# group sizes, but catching any real sketch breakage.
_PCT_RANK_EPS = 0.001

_APPROX_SKETCH_ORACLE = """
    SELECT l_returnflag,
           count(DISTINCT l_partkey)                     AS exact_parts,
           count(DISTINCT l_suppkey)                     AS exact_suppliers,
           round(quantile_cont(l_extendedprice, 0.5), 4) AS exact_median_price,
           count(*)                                      AS n,
           1 AS parts_ndv_ok,
           1 AS suppliers_ndv_ok,
           1 AS median_rank_ok
    FROM lineitem GROUP BY l_returnflag
"""


@register(
    "approx_sketches",
    oracle=_APPROX_SKETCH_ORACLE,
    survey="A3 approximate aggregates (HLL / quantile sketch)",
    doc="approx_count_distinct (HyperLogLog++) and percentile_approx "
    "(Greenwald-Khanna): the constant-memory sketch family 100 TB "
    "cardinality work needs — SELF-VALIDATING since r6. Sketch values "
    "are engine-specific, so the row carries the EXACT counterparts "
    "(oracle hash-matches those) plus CHECK-style flags the oracle "
    "declares as 1 and Spark computes from the sketch: NDV relative "
    "error within 3x the documented rsd (0.05), approx median between "
    "the exact 49.9th/50.1st percentiles (rank-error contract). A "
    "sketch drifting out of bounds flips a flag to 0 and fails the "
    "value hash — full value verification, not rows-only.",
)
def approx_sketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    lo, hi = 0.5 - _PCT_RANK_EPS, 0.5 + _PCT_RANK_EPS
    agg = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey").alias("approx_parts"),
        F.approx_count_distinct("l_suppkey").alias("approx_suppliers"),
        F.percentile_approx("l_extendedprice", 0.5).alias("approx_median_price"),
        F.count_distinct("l_partkey").alias("exact_parts"),
        F.count_distinct("l_suppkey").alias("exact_suppliers"),
        F.round(F.expr("percentile(l_extendedprice, 0.5)"), 4).alias(
            "exact_median_price"
        ),
        F.expr(f"percentile(l_extendedprice, {lo})").alias("__p_lo"),
        F.expr(f"percentile(l_extendedprice, {hi})").alias("__p_hi"),
        F.count(F.lit(1)).alias("n"),
    )

    def _ndv_ok(approx: str, exact: str) -> F.Column:
        rel = F.abs(F.col(approx) - F.col(exact)) / F.col(exact)
        return (rel <= _HLL_REL_ERR_BOUND).cast("int")

    return agg.select(
        "l_returnflag",
        "exact_parts",
        "exact_suppliers",
        "exact_median_price",
        "n",
        _ndv_ok("approx_parts", "exact_parts").alias("parts_ndv_ok"),
        _ndv_ok("approx_suppliers", "exact_suppliers").alias("suppliers_ndv_ok"),
        F.col("approx_median_price")
        .between(F.col("__p_lo"), F.col("__p_hi"))
        .cast("int")
        .alias("median_rank_ok"),
    )
