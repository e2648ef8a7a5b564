"""Every registered query must hash-match its DuckDB oracle at sf0.01
(the same check the driver runs for CORRECTNESS_r{N}.json)."""

from __future__ import annotations

import pytest

from radares_spark.plans import REGISTRY, radar
from tests.conftest import SF_ORACLE
from tests.oracle import compare_query


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_oracle_parity(spark, name):
    ok, msg = compare_query(spark, SF_ORACLE, name, REGISTRY[name])
    assert ok, f"{name}: {msg}"


@pytest.mark.parametrize("name", sorted(radar.LIBRARY_SPECS))
def test_radar_library_parity(spark, name):
    ok, msg = compare_query(spark, SF_ORACLE, name, radar.LIBRARY_SPECS[name])
    assert ok, f"{name}: {msg}"
