"""TPC-H surface completion (plans/tpch_full.py): all 10 shapes not
in the driver's 50-entry window, pinned by the SAME strict typed
DuckDB-oracle comparison the driver runs (tests/oracle.py).

Group B (Q2/Q9/Q16/Q20) needs a ``partsupp`` table TESTDATA does not
ship. The fixture derives one deterministically from the distinct
``(l_partkey, l_suppkey)`` pairs actually present in lineitem — the
containment invariant the real TPC-H generator guarantees — and
feeds the IDENTICAL pandas frame to Spark and DuckDB, so supplycost
doubles are bit-for-bit the same on both sides.
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import types as T

from radares_spark.io.tables import load_table
from radares_spark.plans.tpch_full import PARTSUPP_SPECS
from tests.conftest import SF_ORACLE
from tests.oracle import compare_frames, duckdb_conn

# Group A (Q6/Q8/Q12/Q13/Q14/Q17) DuckDB parity runs in the
# consolidated library sweep
# (tests/test_oracle_parity.py::test_library_parity).

# ---------------------------------------------------------------- B

PARTSUPP_SCHEMA = T.StructType(
    [
        T.StructField("ps_partkey", T.LongType()),
        T.StructField("ps_suppkey", T.LongType()),
        T.StructField("ps_availqty", T.LongType()),
        T.StructField("ps_supplycost", T.DoubleType()),
    ]
)


@pytest.fixture(scope="module")
def partsupp_pdf() -> pd.DataFrame:
    con = duckdb_conn(SF_ORACLE)
    try:
        pdf = con.execute(
            "SELECT DISTINCT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey "
            "FROM lineitem ORDER BY 1, 2"
        ).df()
    finally:
        con.close()
    pdf = pdf.astype({"ps_partkey": "int64", "ps_suppkey": "int64"})
    pdf["ps_availqty"] = (pdf.ps_partkey * 37 + pdf.ps_suppkey * 11) % 9999 + 1
    pdf["ps_supplycost"] = ((pdf.ps_partkey * 31 + pdf.ps_suppkey * 13) % 20000) / 100.0 + 1.0
    return pdf


@pytest.fixture(scope="module")
def ps_tables(spark, partsupp_pdf):
    tables = {
        name: load_table(spark, SF_ORACLE, name)
        for name in ("part", "supplier", "nation", "region", "lineitem", "orders")
    }
    tables["partsupp"] = spark.createDataFrame(partsupp_pdf, schema=PARTSUPP_SCHEMA)
    return tables


@pytest.mark.parametrize("name", sorted(PARTSUPP_SPECS))
def test_partsupp_oracle_parity(spark, ps_tables, partsupp_pdf, name):
    fn, oracle, argnames = PARTSUPP_SPECS[name]
    sdf = fn(*(ps_tables[a] for a in argnames))
    con = duckdb_conn(SF_ORACLE)
    try:
        con.register("partsupp", partsupp_pdf)
        tbl = con.execute(oracle).arrow()
    finally:
        con.close()
    ok, msg = compare_frames(sdf, tbl)
    assert ok, f"{name}: {msg}"
    assert tbl.num_rows > 0, f"{name}: degenerate empty oracle result"
