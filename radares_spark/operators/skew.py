"""Skew mitigation: salted two-phase aggregation.

AQE's skew-join splitting (on in session.py) fixes skewed JOINS at
runtime, but a skewed AGGREGATION key still lands every row of the hot
key in one reducer — at 100 TB one task runs for hours while the rest
idle. The standard fix is salting: aggregate on (key, salt) first so
the hot key's rows spread over ``n_salts`` reducers, then combine the
per-salt partials. Works for any decomposable aggregate; avg is
decomposed to sum/count.

Salt choice: ``xxhash64`` over all row columns — deterministic (same
input -> same result, unlike rand()) and spreads a hot key as long as
its rows differ anywhere. The cost is one extra (cheap, ``n_keys x
n_salts``-row) shuffle — only worth paying when a key is genuinely
hot; for uniform keys use a plain groupBy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# aggregate -> (partial fn, final fn) names; avg handled specially
_DECOMP = {
    "sum": ("sum", "sum"),
    "count": ("count", "sum"),
    "min": ("min", "min"),
    "max": ("max", "max"),
}


def salted_agg(
    df: DataFrame,
    keys: list[str],
    specs: list[tuple[str, str, str]],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase aggregation over ``keys`` with salt spreading.

    ``specs`` = [(column, agg, alias)] with agg in sum/count/min/max/avg.
    Result is identical to ``df.groupBy(keys).agg(...)`` (tested), with
    the hot-key reduce fanned out over ``n_salts`` partial groups.
    """
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(n_salts))
    partials, finals = [], []
    for col, agg, alias in specs:
        if agg == "avg":
            partials += [
                F.sum(col).alias(f"__s_{alias}"),
                F.count(col).alias(f"__c_{alias}"),
            ]
            finals.append(
                (F.sum(f"__s_{alias}") / F.sum(f"__c_{alias}")).alias(alias)
            )
        elif agg in _DECOMP:
            p, f = _DECOMP[agg]
            partials.append(getattr(F, p)(col).alias(f"__p_{alias}"))
            finals.append(getattr(F, f)(f"__p_{alias}").alias(alias))
        else:
            raise ValueError(f"non-decomposable aggregate: {agg}")
    partial = df.withColumn("__salt", salt).groupBy(*keys, "__salt").agg(*partials)
    return partial.groupBy(*keys).agg(*finals)
