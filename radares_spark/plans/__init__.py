"""Query registry — the driver-facing catalog of implemented operators.

Every operator family registers its queries here via
:func:`radares_spark.plans.registry.register`; ``__spark_entry__.py``
exposes the registry through ``queries()`` / ``oracle_sql()``.
"""

from radares_spark.registry import REGISTRY, QuerySpec, register

# Import for side effects: each module registers its queries.
#
# ORDER MATTERS for the driver: its CORRECTNESS check walks the
# registry in registration order and stops after 50 entries. The
# LLM-data-pipeline suites (dedup / similarity / text / multimodal)
# register FIRST so they always land inside the checked window; the
# registry is kept at exactly 50 queries so every entry gets a row.
from radares_spark.operators import dedup  # noqa: E402,F401
from radares_spark.operators import similarity  # noqa: E402,F401
from radares_spark.operators import text  # noqa: E402,F401
from radares_spark.operators import multimodal  # noqa: E402,F401
from radares_spark.pipeline import corpus  # noqa: E402,F401
from radares_spark.pipeline import crawl  # noqa: E402,F401
from radares_spark.operators import decontam  # noqa: E402,F401
from radares_spark.operators import incremental  # noqa: E402,F401
from radares_spark.plans import radar  # noqa: E402,F401
from radares_spark.plans import relational  # noqa: E402,F401
from radares_spark.plans import advanced  # noqa: E402,F401
from radares_spark.plans import tpch_more  # noqa: E402,F401
from radares_spark.plans import tpch_extra  # noqa: E402,F401

# r8 window rotation: the retrieval/snapshot flagships enter the
# 50-entry driver window via their DRIVER_SPECS (library-tier rows
# q10/q19/q15 moved to LIBRARY_SPECS in their modules — each keeps a
# same-SURVEY-id sibling registered: J4/A3/top-k via q3/q5/q7+q18,
# F-disjunction via relational_checks_suite, A3 via q11).
# r9 rotation: shards_manifest_audit (the train-shard terminal tier
# under the driver oracle) enters; q4_priority_exists moves to the
# library tier in tpch_more (J3 stays via q18/q21, F2 via
# relational_checks_suite, A1 via calendar_gap_fill_orders).
# r10 rotation: corpus_kn_trigram_logprob (the recursive Kneser-Ney
# LM score) enters; pivot_status_by_segment moves to the library tier
# in relational (R2 stays driver-covered via radar_bins_long).
# r11 rotation: corpus_kn_bigram_logprob enters (the whole KN family
# now under the driver oracle); cube_orders moves to the library tier
# in relational (A3's grouping lattice stays driver-covered via
# grouping_analytics_lineitem + q1 + radar_stats_suite).
# r12 rotation: events_drift_psi enters (the nightly PSI drift
# monitor, strict oracle since r11); q7_nation_volume moves to the
# library tier in tpch_more (J4 stays driver-covered via q5/q3, A3
# via q1/q11).
# r13 rotation: text_chunk_windows enters (context-window chunking,
# strict oracle + fuzz grid since r7, linearity rewrite in r12);
# range_join_price_bands moves to the library tier in relational
# (§2.6's range/as-of capability stays driver-covered via
# asof_join_error_click).
from radares_spark.operators import drift as _drift  # noqa: E402
from radares_spark.operators import dsir as _dsir  # noqa: E402
from radares_spark.operators import retrieval as _retrieval  # noqa: E402
from radares_spark.operators import text_ext as _text_ext  # noqa: E402
from radares_spark.pipeline import shards as _shards  # noqa: E402
from radares_spark.pipeline import snapshot as _snapshot  # noqa: E402

for _spec in (
    *_snapshot.DRIVER_SPECS.values(),
    *_retrieval.DRIVER_SPECS.values(),
    *_shards.DRIVER_SPECS.values(),
    *_dsir.DRIVER_SPECS.values(),
    *_drift.DRIVER_SPECS.values(),
    *_text_ext.DRIVER_SPECS.values(),
):
    assert _spec.name not in REGISTRY, _spec.name
    REGISTRY[_spec.name] = _spec

__all__ = ["REGISTRY", "QuerySpec", "register"]
