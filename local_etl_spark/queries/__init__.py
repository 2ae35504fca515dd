"""Query modules — importing this package populates the registry."""

from local_etl_spark.queries import (  # noqa: F401
    aggregates,
    etl,
    filters,
    functions,
    joins,
    joins_scale,
    llm_corpus,
    llm_dedup,
    llm_media,
    llm_sim,
    llm_pipeline,
    llm_text,
    scans,
    sortset,
    sql_advanced,
    sql_api,
    sql_tpch,
    streaming,
    udfs,
    windows,
)
