"""Query registry — the driver-facing catalog of implemented operators.

Every operator family registers its queries here via
:func:`radares_spark.plans.registry.register`; ``__spark_entry__.py``
exposes the registry through ``queries()`` / ``oracle_sql()``.
"""

from radares_spark.registry import REGISTRY, QuerySpec, register

# Import for side effects: each module registers its queries.
from radares_spark.plans import relational  # noqa: E402,F401
from radares_spark.plans import advanced  # noqa: E402,F401
from radares_spark.plans import radar  # noqa: E402,F401
from radares_spark.plans import tpch_more  # noqa: E402,F401
from radares_spark.operators import dedup  # noqa: E402,F401
from radares_spark.operators import similarity  # noqa: E402,F401
from radares_spark.operators import text  # noqa: E402,F401
from radares_spark.operators import multimodal  # noqa: E402,F401

__all__ = ["REGISTRY", "QuerySpec", "register"]
