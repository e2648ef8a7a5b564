"""Declared schemas for the radar star schema and engine tables.

Re-expresses the reference DDL (``/root/reference/database/schema.sql:22-71``)
as Spark ``StructType``s, per the SURVEY §1.2 type mapping:

- Postgres ``TIME`` has no Spark equivalent -> we keep the raw
  ``initial_time``/``end_time`` "HH:mm" strings for storage parity AND
  materialize ``slot_start TIMESTAMP = pubdate + initial_time`` which
  unlocks window / watermark semantics.
- ``SERIAL`` surrogate keys -> deterministic 64-bit hashes of the
  natural key (Spark has no auto-increment; a deterministic key is
  also idempotent across re-ingests, which SERIAL is not).
- ``ENUM direction`` -> StringType + validation set ``DIRECTIONS``.
"""

from __future__ import annotations

from pyspark.sql import types as T

# 11 fixed speed-histogram bins (schema.sql:59-69). Bin bounds in km/h;
# the last bin is open-ended (100+) — its "mid" is a convention used by
# the weighted-mean analytics (functions/histogram.py).
SPEED_BINS: list[tuple[str, int, int]] = [
    ("speed_00_10", 0, 10),
    ("speed_11_20", 11, 20),
    ("speed_21_30", 21, 30),
    ("speed_31_40", 31, 40),
    ("speed_41_50", 41, 50),
    ("speed_51_60", 51, 60),
    ("speed_61_70", 61, 70),
    ("speed_71_80", 71, 80),
    ("speed_81_90", 81, 90),
    ("speed_91_100", 91, 100),
    ("speed_100_up", 100, 120),
]
BIN_COLS = [b[0] for b in SPEED_BINS]

DIRECTIONS = ("Norte", "Sul", "Leste", "Oeste")

# Raw direction suffix -> canonical name (reference src/clean_data.py:44-50).
DIRECTION_MAP = {"N": "Norte", "S": "Sul", "L": "Leste", "O": "Oeste"}

# flows fact table, wide histogram form (schema.sql:52-71). Grain: one
# row per (report file, direction, 15-minute slot). ``pubdate`` and
# ``equipment`` are carried denormalized (the reference drops them and
# re-derives via the equipment_files FK — at 100 TB a two-hop join to
# recover the partition key would be a mistake; the ledger stays a pure
# audit table).
FLOWS_SCHEMA = T.StructType(
    [
        T.StructField("pubdate", T.DateType(), False),
        T.StructField("equipment", T.StringType(), False),
        T.StructField("direction", T.StringType(), True),
        T.StructField("initial_time", T.StringType(), True),  # "HH:mm"
        T.StructField("end_time", T.StringType(), True),  # "HH:mm"
        T.StructField("slot_start", T.TimestampType(), True),
        *[T.StructField(c, T.IntegerType(), True) for c in BIN_COLS],
        T.StructField("total", T.IntegerType(), True),
        T.StructField("equipment_files_id", T.LongType(), True),
    ]
)

# equipments device dimension (schema.sql:36-49). ~100 rows -> always
# broadcast-joined.
EQUIPMENTS_SCHEMA = T.StructType(
    [
        T.StructField("equipment", T.StringType(), False),
        T.StructField("date_updated", T.TimestampType(), True),
        T.StructField("address", T.StringType(), True),
        T.StructField("latitude", T.FloatType(), True),
        T.StructField("longitude", T.FloatType(), True),
        T.StructField("direction", T.StringType(), True),
        T.StructField("bike_lane", T.BooleanType(), True),
        T.StructField("bus_lane", T.BooleanType(), True),
        T.StructField("parking_lane", T.BooleanType(), True),
        T.StructField("number_lanes", T.IntegerType(), True),
    ]
)

# equipment_files ingestion ledger (schema.sql:22-33). The unique
# (pubdate, equipment) index is enforced by the idempotent writer
# (pipeline/ledger.py), not by the store.
EQUIPMENT_FILES_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),  # xxhash64(natural key)
        T.StructField("file_name", T.StringType(), True),
        T.StructField("pubdate", T.DateType(), False),
        T.StructField("equipment", T.StringType(), False),
        T.StructField("date_created", T.TimestampType(), True),
    ]
)

# Per-file ingest status (reference src/scrape.py:74-111 JSON log).
RUN_LOG_SCHEMA = T.StructType(
    [
        T.StructField("name", T.StringType(), True),
        T.StructField("dateTime", T.TimestampType(), True),
        T.StructField("status", T.StringType(), True),  # downloaded|processed|fail
        T.StructField("error", T.StringType(), True),
    ]
)

# Parser output before cleaning (reference clean_data.py:22-42 header):
# one row per (file, direction, slot) with raw strings + a status
# column for quarantine semantics (SURVEY §2.11 failure isolation).
RAW_FLOWS_SCHEMA = T.StructType(
    [
        T.StructField("file_path", T.StringType(), True),
        T.StructField("pubdate", T.StringType(), True),  # "YYYY-MM-DD"
        T.StructField("equipment", T.StringType(), True),
        T.StructField("direction_raw", T.StringType(), True),  # "<street>/N"
        T.StructField("time_range", T.StringType(), True),  # "HH:MM as HH:MM"
        *[T.StructField(c, T.IntegerType(), True) for c in BIN_COLS],
        T.StructField("total", T.IntegerType(), True),
        T.StructField("status", T.StringType(), True),  # parsed | quarantined
        T.StructField("error", T.StringType(), True),
    ]
)
