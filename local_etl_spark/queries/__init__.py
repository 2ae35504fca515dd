"""Query modules — importing this package populates the registry."""

from local_etl_spark.queries import aggregates  # noqa: F401
