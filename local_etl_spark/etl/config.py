"""TOML pipeline configuration (SURVEY.md §2.2 R17, §3.3).

The reference *intended* TOML config (config.toml spec comment block at
config.toml:1-13) but the loading path is dead code with two bugs: the
key names disagree with v2 (`output_file` vs `payload_file`,
main2.py:20-21) and `users.data_dir` is a copy-paste of "cards"
(config.toml:26). The engine honors the intent with a fixed spec:

    replace_missing_data = true     # optional, default true
    errors_log = "errors.log"       # optional

    [[data]]
    name = "users"
    schema_file = "user-events-schema.json"
    data_dir = "users"
    schema_mismatch_dir = "users_schema_mismatches"
    output_file = "users_flat.csv"   # v1 sink (optional)
    payload_file = "users.csv"       # v2 sinks (optional)
    metadata_file = "metadata.csv"
"""

from __future__ import annotations

import tomllib

from local_etl_spark.etl.pipeline import PipelineConfig, TableConfig


def load_config(path: str, base_dir: str | None = None) -> PipelineConfig:
    with open(path, "rb") as fh:
        doc = tomllib.load(fh)
    tables = tuple(
        TableConfig(
            name=entry["name"],
            schema_file=entry["schema_file"],
            data_dir=entry["data_dir"],
            schema_mismatch_dir=entry["schema_mismatch_dir"],
            output_file=entry.get("output_file"),
            payload_file=entry.get("payload_file"),
            metadata_file=entry.get("metadata_file"),
        )
        for entry in doc.get("data", [])
    )
    return PipelineConfig(
        tables=tables,
        replace_missing_data=doc.get("replace_missing_data", True),
        errors_log=doc.get("errors_log", "errors.log"),
        base_dir=base_dir or ".",
    )


def reference_config(base_dir: str) -> PipelineConfig:
    """The reference's hard-coded registry (main2.py:16-32), with the
    config.toml data_dir bug fixed."""
    return PipelineConfig(
        tables=(
            TableConfig(
                name="users",
                schema_file="user-events-schema.json",
                data_dir="users",
                schema_mismatch_dir="users_schema_mismatches",
                output_file="users_flat.csv",
                payload_file="users.csv",
                # SHARED metadata sink, faithful to main2.py:20,28 —
                # both tables append to one metadata.csv (same columns);
                # append-mode part files union cleanly
                metadata_file="metadata.csv",
            ),
            TableConfig(
                name="cards",
                schema_file="card-events-schema.json",
                data_dir="cards",
                schema_mismatch_dir="cards_schema_mismatches",
                output_file="cards_flat.csv",
                payload_file="cards.csv",
                metadata_file="metadata.csv",
            ),
        ),
        base_dir=base_dir,
    )
