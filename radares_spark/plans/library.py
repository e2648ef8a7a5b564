"""Library-tier query catalog — proven plans kept OUT of the driver's
50-entry registry window (the window is full; registration order is
the contract, see plans/__init__.py).

Every spec here carries the same ``(fn, oracle)`` contract as a
registered query and is pinned by the same strict typed DuckDB
comparison the driver runs — via ``tests/test_oracle_parity.py``'s
sweep over :data:`ALL_LIBRARY_SPECS` — so "library tier" means
"driver-grade checked, just not occupying a registry slot".

Modules contribute their own ``LIBRARY_SPECS`` dicts; this aggregator
exists so there is exactly one place to look (and one test) for what
is proven-but-unregistered. TPC-H group-B shapes (Q2/Q9/Q16/Q20) are
NOT aggregated here: they need the derived partsupp fixture and run
through tests/test_tpch_full.py instead.
"""

from __future__ import annotations

from radares_spark.operators import (
    asof,
    dedup,
    drift,
    dsir,
    embed,
    incremental,
    quantize,
    retrieval,
    semdedup,
    skew,
    text_ext,
    urls,
)
from radares_spark.pipeline import corpus, crawl, snapshot
from radares_spark.plans import radar, relational, tpch_extra, tpch_full, tpch_more
from radares_spark.registry import QuerySpec

ALL_LIBRARY_SPECS: dict[str, QuerySpec] = {}
for _mod in (asof, dedup, drift, dsir, embed, incremental, quantize, retrieval, semdedup, skew, text_ext, urls, radar, corpus, crawl, snapshot, relational, tpch_more, tpch_extra):
    for _name, _spec in _mod.LIBRARY_SPECS.items():
        assert _name not in ALL_LIBRARY_SPECS, f"duplicate library spec {_name}"
        ALL_LIBRARY_SPECS[_name] = _spec

# tpch_full group A needs no fixture — include those too
for _name, _spec in tpch_full.LIBRARY_SPECS.items():
    assert _name not in ALL_LIBRARY_SPECS, f"duplicate library spec {_name}"
    ALL_LIBRARY_SPECS[_name] = _spec
