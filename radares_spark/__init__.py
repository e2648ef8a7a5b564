"""radares_spark — a PySpark-native analytics engine.

Re-expresses the query and data-processing capabilities of the
``pmj-sepud/radares`` reference pipeline (traffic-radar ETL: positional
xlsx reports -> 15-minute speed-histogram fact table -> star schema)
idiomatically on Apache Spark, and extends them with scale-oriented
LLM-data-pipeline operators (dedup, similarity search, text analysis,
multimodal plumbing). Every operator is designed for a multi-executor
cluster at 100 TB: declarative DataFrame plans (Catalyst optimizes),
partitioned storage, broadcast joins for dims, no driver-side loops.

Layout
------
- ``session``     SparkSession factory with scale-aware defaults
- ``schemas``     declared StructTypes (reference: database/schema.sql)
- ``io``          sources/sinks: testdata tables, xlsx parser, ingest
- ``functions``   scalar/cleaning/histogram function library
- ``operators``   dedup / similarity / text / multimodal / asof
- ``plans``       the analytics query library (driver contract)
- ``pipeline``    audit, backfill planner, dimension load, idempotent write
- ``streaming``   Structured Streaming ingest + windowed aggregation
"""

__version__ = "0.1.0"
