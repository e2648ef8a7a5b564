"""Unregistered TPC-H-shaped library queries (plans/tpch_extra.py)
held to the registered bar: strict DuckDB-oracle comparison at sf0.01
via the same comparator the parity suite uses."""

from __future__ import annotations

import pytest

from radares_spark.plans.tpch_extra import EXTRA_ORACLES
from radares_spark.registry import QuerySpec
from tests.conftest import SF_ORACLE
from tests.oracle import compare_query


@pytest.mark.parametrize("name", sorted(EXTRA_ORACLES))
def test_extra_oracle_parity(spark, name):
    fn, oracle = EXTRA_ORACLES[name]
    spec = QuerySpec(name=name, fn=fn, oracle=oracle, survey="tpch-extra")
    ok, msg = compare_query(spark, SF_ORACLE, name, spec)
    assert ok, f"{name}: {msg}"
