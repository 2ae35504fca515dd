"""Reference-semantics ETL surface (SURVEY.md §2.2, §2.4-A).

Re-expresses the reference pipeline (/root/reference/main.py, main2.py)
as declarative Spark plans: envelope JSON ingestion, jsonschema-faithful
validation + repair/quarantine routing, string transforms, normalized
(v2) or denormalized (v1) CSV outputs, and run metrics.
"""
