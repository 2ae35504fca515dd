"""Structured Streaming surface (SURVEY.md §2.4-I).

The reference is batch-only (SURVEY.md §2.3: no watermarks, no state),
but its file-directory source (main.py:150-151) is exactly the shape of
Spark's streaming file source — ``core`` holds transforms shared by the
batch queries and their streaming twins, ``etl_stream`` runs the M2 ETL
pipeline incrementally via foreachBatch.
"""

from local_etl_spark.streaming import core  # noqa: F401
