"""JSON Schema (draft-07 subset) → engine schema model (SURVEY.md §2.2 R3).

The reference loads a JSON Schema per table (main.py:153-154) and derives
CSV headers from the ``required`` lists (main.py:87-97, main2.py:148-184).
This module parses the same schema files into a typed model that drives
both the validity compiler (validate.py) and output column layout.

Supported surface = exactly what the reference schemas use: scalar types
integer/number/string/boolean, one level of object nesting, ``required``
lists, ignored ``format`` annotations (jsonschema doesn't enforce them
without a format checker — SURVEY.md §1.2).
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field

from pyspark.sql import types as T

_SPARK_TYPE = {
    "integer": T.LongType(),
    "number": T.DoubleType(),
    "string": T.StringType(),
    "boolean": T.BooleanType(),
}


@dataclass(frozen=True)
class FieldSpec:
    name: str
    json_type: str  # integer | number | string | boolean


@dataclass(frozen=True)
class ObjectSpec:
    """One envelope sub-object (payload or metadata)."""

    name: str
    fields: tuple[FieldSpec, ...]  # in schema `properties` order
    required: tuple[str, ...]  # in schema `required` order


@dataclass(frozen=True)
class EnvelopeSchema:
    """Two-level event-envelope schema: {metadata: {...}, payload: {...}}."""

    objects: tuple[ObjectSpec, ...]  # in top-level `properties` order
    required: tuple[str, ...]  # top-level required, in order
    raw: dict = field(hash=False, compare=False, default=None)

    def obj(self, name: str) -> ObjectSpec:
        for o in self.objects:
            if o.name == name:
                return o
        raise KeyError(name)

    @property
    def payload(self) -> ObjectSpec:
        return self.obj("payload")

    @property
    def metadata(self) -> ObjectSpec:
        return self.obj("metadata")


def parse_schema(schema: dict) -> EnvelopeSchema:
    """Parse a loaded JSON Schema dict into the envelope model."""
    objects = []
    for obj_name, obj_schema in schema.get("properties", {}).items():
        fields = tuple(
            FieldSpec(fname, fschema.get("type", "string"))
            for fname, fschema in obj_schema.get("properties", {}).items()
        )
        objects.append(
            ObjectSpec(
                name=obj_name,
                fields=fields,
                required=tuple(obj_schema.get("required", ())),
            )
        )
    return EnvelopeSchema(
        objects=tuple(objects),
        required=tuple(schema.get("required", ())),
        raw=schema,
    )


def load_schema(path: str) -> EnvelopeSchema:
    with open(path, encoding="utf-8") as fh:
        return parse_schema(json.load(fh))


def to_struct_type(schema: EnvelopeSchema) -> T.StructType:
    """Typed Spark schema for the envelope — used by the batch/streaming
    JSON readers (multiLine one-doc-per-file and JSONL alike).

    Every field is nullable: validation decides presence, not the reader
    (required → nullable=False would make Spark silently null-fail rows
    instead of routing them through the quarantine path).
    """
    return T.StructType(
        [
            T.StructField(
                o.name,
                T.StructType(
                    [
                        T.StructField(f.name, _SPARK_TYPE[f.json_type], True)
                        for f in o.fields
                    ]
                ),
                True,
            )
            for o in schema.objects
        ]
    )


def v1_field_names(schema: EnvelopeSchema) -> list[str]:
    """v1 denormalized header: payload required + metadata required
    (reference main.py:87-97)."""
    return list(schema.payload.required) + list(schema.metadata.required)


def v2_field_names(schema: EnvelopeSchema) -> tuple[list[str], list[str]]:
    """v2 headers: payload fields + event_id FK, with prefix/suffix
    inserted around the name-ish column; metadata fields
    (reference main2.py:148-184)."""
    payload_fields = list(schema.payload.required)
    metadata_fields = list(schema.metadata.required)
    payload_fields.append("event_id")
    for name_col in ("name", "created_by_name"):
        if name_col in payload_fields:
            i = payload_fields.index(name_col)
            payload_fields.insert(i, "prefix")
            payload_fields.insert(i + 2, "suffix")
            break
    return payload_fields, metadata_fields
