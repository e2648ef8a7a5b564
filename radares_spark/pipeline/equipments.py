"""Device-dimension load — load_equipments.py parity.

The reference loads a pt-BR JSON, drops 3 columns, renames 5, stamps a
timestamp, and casts 0/1 ints to booleans with two row-wise ``.apply``
passes per column (src/load_equipments.py:32-89). Here the same
transform is one projection (P2-P5), vectorized. The CSV variant also
handles the source's real dirtiness (FIXTURES.md §A3): decimal-comma
coordinates inside quotes and a fully duplicated device row
(``drop_duplicates(subset=['equipment'])`` in every reference consumer,
src/scrape.py:60).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# pt-BR -> en renames (reference src/load_equipments.py:58-71)
RENAMES = {
    "equipamento": "equipment",
    "ciclofaixa": "bike_lane",
    "corredor": "bus_lane",
    "estacionamento": "parking_lane",
    "n_faixa_carro_sentido": "number_lanes",
}
DROPS = ["endereco", "endereco_alterado", "radar_2_sentidos"]
BOOL_COLS = ["bike_lane", "bus_lane", "parking_lane"]


def _decimal_comma(col):
    """'-26,2745' -> -26.2745 (src/equipamentos.csv FS655JOI row)."""
    return F.regexp_replace(col.cast("string"), ",", ".").cast("float")


def load_equipments_json(spark: SparkSession, path: str) -> DataFrame:
    """JSON variant (load_equipments.py). Drop pt-only columns, rename,
    cast 0/1 -> boolean (one vectorized cast, not row-wise apply),
    stamp date_updated, dedup on the device id."""
    df = spark.read.json(path)
    for c in DROPS:
        if c in df.columns:
            df = df.drop(c)
    df = df.withColumnsRenamed(RENAMES)
    for c in BOOL_COLS:
        if c in df.columns:
            df = df.withColumn(c, F.coalesce(F.col(c).cast("boolean"), F.lit(False)))
    if "number_lanes" in df.columns:
        df = df.withColumn("number_lanes", F.col("number_lanes").cast("int"))
    for c in ("latitude", "longitude"):
        if c in df.columns:
            df = df.withColumn(c, _decimal_comma(F.col(c)))
    return df.withColumn("date_updated", F.current_timestamp()).dropDuplicates(["equipment"])


def load_equipments_csv(spark: SparkSession, path: str) -> DataFrame:
    """CSV variant (equipamentos.csv shape): quoted fields, decimal-comma
    coordinates, duplicate rows."""
    df = spark.read.csv(path, header=True, quote='"', escape='"')
    for c in ("latitude", "longitude"):
        if c in df.columns:
            df = df.withColumn(c, _decimal_comma(F.col(c)))
    for c in BOOL_COLS:
        if c in df.columns:
            df = df.withColumn(c, F.coalesce(F.col(c).cast("int").cast("boolean"), F.lit(False)))
    if "number_lanes" in df.columns:
        df = df.withColumn("number_lanes", F.col("number_lanes").cast("int"))
    return df.dropDuplicates(["equipment"])
