"""Multimodal (binary) column handling — see columns.py."""

from local_etl_spark.multimodal import columns  # noqa: F401
