"""Every registered query must hash-match its DuckDB oracle at sf0.01
(the same check the driver runs for CORRECTNESS_r{N}.json) — and every
library-tier spec (plans/library.py) is held to the identical bar, so
"unregistered" never means "less checked"."""

from __future__ import annotations

import pytest

from radares_spark.plans import REGISTRY
from radares_spark.plans.library import ALL_LIBRARY_SPECS
from tests.conftest import SF_ORACLE
from tests.oracle import compare_query

# Whole-module slow tier: every test here is a multi-second e2e /
# sweep (r15 durations log); deselected by default so the driver's
# verify window fits — run with -m slow (see COVERAGE.md).
pytestmark = pytest.mark.slow


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_oracle_parity(spark, name):
    ok, msg = compare_query(spark, SF_ORACLE, name, REGISTRY[name])
    assert ok, f"{name}: {msg}"


@pytest.mark.parametrize("name", sorted(ALL_LIBRARY_SPECS))
def test_library_parity(spark, name):
    ok, msg = compare_query(spark, SF_ORACLE, name, ALL_LIBRARY_SPECS[name])
    assert ok, f"{name}: {msg}"
    assert not msg.startswith("OK: 0 "), f"{name}: degenerate empty result"
