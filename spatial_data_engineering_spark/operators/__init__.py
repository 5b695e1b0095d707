"""Operator inventory (SURVEY.md §2) as (spark, sf_dir) -> DataFrame callables.

Each module exposes ``QUERIES`` (name -> callable) and ``ORACLES``
(name -> ANSI SQL runnable by DuckDB over the same parquet tables).
``spatial_data_engineering_spark.queries_registry`` merges them for the
driver contract in ``__spark_entry__.py``.
"""
