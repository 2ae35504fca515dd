"""Query modules — importing this package populates the registry."""

from local_etl_spark.queries import (  # noqa: F401
    aggregates,
    etl,
    filters,
    functions,
    joins,
    scans,
    sortset,
    streaming,
    windows,
)
