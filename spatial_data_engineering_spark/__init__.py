"""PySpark-native analytics engine with the query and data-processing
capabilities of the reference project ``dnsptr-dns/spatial-data-engineering``.

The reference delegates all query execution to PostgreSQL/PostGIS, Google
Earth Engine and R ``terra`` (see SURVEY.md §3).  This package internalizes
those roles on Spark:

- ``session``    — SparkSession factory (Arrow on, AQE on, UTC).
- ``catalog``    — testdata table registry (parquet scans).
- ``operators``  — relational core, dedup, similarity, text analysis,
  zonal/raster queries (SURVEY.md §2 inventory).
- ``functions``  — geometry kernels (WKB), CRS transforms, ST_* UDF registry.
- ``plans``      — multi-operator pipelines (flagship report query).
- ``streaming``  — Structured Streaming extension (SURVEY.md §7 phase 5).

Everything is DataFrame/Catalyst-first; Python touches data only through
Arrow-vectorized pandas UDFs on the genuinely custom spatial kernels.
"""

__version__ = "0.1.0"
