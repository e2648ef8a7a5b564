"""Local mirror of the driver's DuckDB-oracle comparison.

Runs a registered Spark query and its oracle SQL side by side, sorts
columns by name, normalizes values, and compares the multisets of
rows. This is the feedback loop used while developing: if it passes
here at sf0.01, the driver's CORRECTNESS check should pass too.
"""

from __future__ import annotations

import datetime as dt
import math
from pathlib import Path

import duckdb

from radares_spark.io.tables import TABLES


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def _norm(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return int(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # collapse float noise + integral floats vs ints
        r = round(v, 9)
        return int(r) if r == int(r) else r
    if isinstance(v, dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, (int, str)):
        return v
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    try:  # Decimal
        f = float(v)
        return _norm(f)
    except Exception:
        return str(v)


def rows_to_multiset(columns: list[str], rows) -> dict:
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out: dict = {}
    for row in rows:
        key = tuple(_norm(row[i]) for i in order)
        out[key] = out.get(key, 0) + 1
    return out


def compare_query(spark, sf_dir: str, name: str, spec) -> tuple[bool, str]:
    sdf = spec.fn(spark, sf_dir)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]

    if spec.oracle is None:
        return (len(s_rows) >= 0, f"rows-only: {len(s_rows)} rows")

    con = duckdb_conn(sf_dir)
    try:
        res = con.execute(spec.oracle)
        d_cols = [d[0] for d in res.description]
        d_rows = res.fetchall()
    finally:
        con.close()

    if sorted(s_cols) != sorted(d_cols):
        return (False, f"column mismatch: spark={sorted(s_cols)} duckdb={sorted(d_cols)}")

    ms, md = rows_to_multiset(s_cols, s_rows), rows_to_multiset(d_cols, d_rows)
    if ms == md:
        return (True, f"OK: {len(s_rows)} rows")
    only_s = {k: v for k, v in ms.items() if md.get(k) != v}
    only_d = {k: v for k, v in md.items() if ms.get(k) != v}
    sample_s = list(only_s.items())[:3]
    sample_d = list(only_d.items())[:3]
    return (
        False,
        f"value mismatch: spark_rows={len(s_rows)} duckdb_rows={len(d_rows)} "
        f"spark_only~{sample_s} duckdb_only~{sample_d}",
    )
