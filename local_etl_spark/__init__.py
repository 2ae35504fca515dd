"""local_etl_spark — a PySpark-native analytics/ETL engine.

A brand-new engine re-expressing the capability surface of the reference
ETL tool (``/root/reference``, surveyed in SURVEY.md) in idiomatic Spark:
DataFrame/SQL plans optimized by Catalyst, partitioned execution, and a
declarative query registry. Designed for 100 TB scale, tested locally.

Layout:
    session     — SparkSession factory with scale-aware defaults
    catalog     — testdata table loader / temp-view registration
    registry    — QuerySpec registry backing ``__spark_entry__``
    queries/    — named engine queries (relational, functions, streaming,
                  llm, udf, etl) with DuckDB-oracle SQL
    etl/        — reference-semantics ETL surface (schema translation,
                  validation/repair routing, transforms, multi-sink writer)
    streaming/  — Structured Streaming jobs mirroring the batch queries
"""

__version__ = "0.1.0"
