"""As-of join as a grouped-map operator — the skew-proof variant.

The window-function as-of join (plans/relational.asof_join_error_click:
union both sides, ``last(value, ignorenulls)`` over an event-time
window) is one shuffle and ideal when per-key event counts are sane.
Its weakness is a HOT KEY: one user with 10^8 events serializes into a
single window task. This variant keeps the same per-key semantics but
runs each key group through ``applyInPandas`` + ``pandas.merge_asof``
(O(n log n) sort + linear merge per group, Arrow-batched), so the unit
of work is a key group and the scheduler can pack them; combined with
AQE skew splitting on the shuffle this bounds the damage of skew.

Semantics: for every left row, the latest right row with
``right.ts <= left.ts`` for the same ``by`` key (ties included —
pandas ``merge_asof`` default ``allow_exact_matches=True``, matching
the window form's click-sorts-before-error tie rule).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    value: str = "value_ts",
) -> DataFrame:
    """Latest ``right`` at-or-before each ``left`` row per ``by`` key.

    Output: left columns + ``value`` (the matched right timestamp, null
    when no right row precedes the left row).
    """
    lcols = left.columns
    l = left.withColumn("__side", F.lit(0))
    r = (
        right.select(F.col(by), F.col(right_ts).alias("__rts"))
        .withColumn("__side", F.lit(1))
    )
    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in left.schema.fields
    ) + f", {value} timestamp"

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        lp = pdf[pdf["__side"] == 0][lcols].sort_values(left_ts, kind="mergesort")
        rp = (
            pdf[pdf["__side"] == 1][["__rts"]]
            .dropna()
            .sort_values("__rts", kind="mergesort")
        )
        if lp.empty:
            return lp.assign(**{value: pd.Series(dtype="datetime64[us]")})
        merged = pd.merge_asof(
            lp, rp, left_on=left_ts, right_on="__rts", direction="backward"
        )
        return merged.rename(columns={"__rts": value})

    # one unioned shuffle on the key, then per-group linear merges
    both = l.unionByName(r, allowMissingColumns=True)
    return both.groupBy(by).applyInPandas(kernel, schema=schema)
