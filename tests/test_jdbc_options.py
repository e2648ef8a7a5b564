"""Offline contract test for the JDBC reader (SURVEY §2.1 S6).

The vendor jar is not in the container, so the assembled option map is
pinned WITHOUT connecting — the reader contract (url / dbtable /
range-partitioning bounds / subquery pushdown mirroring the
reference's bind-param ``pd.read_sql``, clean_data.py:175,193) is what
the unit asserts.
"""

from __future__ import annotations

import pytest

from radares_spark.io.tables import jdbc_reader_options

URL = "jdbc:postgresql://dbhost:5432/radares"


def test_plain_table_read():
    opts = jdbc_reader_options(URL, "flows")
    assert opts == {"url": URL, "dbtable": "flows"}


def test_subquery_pushdown_mirrors_bind_params():
    # the reference's parameterized lookup (clean_data.py:175:
    # WHERE equipment = %s AND pubdate = %s) becomes a subquery WHERE
    # executed remotely — never a full-table pull + local filter
    sub = (
        "(SELECT id FROM equipment_files "
        "WHERE equipment = 'FS551JOI' AND pubdate = DATE '2024-05-01') q"
    )
    opts = jdbc_reader_options(URL, sub, properties={"user": "radares"})
    assert opts["dbtable"] == sub
    assert opts["user"] == "radares"


def test_range_partitioned_parallel_read():
    opts = jdbc_reader_options(
        URL,
        "flows",
        partition_column="equipment_files_id",
        lower_bound=0,
        upper_bound=1_000_000,
        num_partitions=32,
    )
    assert opts["partitionColumn"] == "equipment_files_id"
    assert opts["lowerBound"] == "0"
    assert opts["upperBound"] == "1000000"
    assert opts["numPartitions"] == "32"  # 32 parallel range queries


def test_partition_args_must_travel_together():
    with pytest.raises(ValueError):
        jdbc_reader_options(URL, "flows", partition_column="id", lower_bound=0)
