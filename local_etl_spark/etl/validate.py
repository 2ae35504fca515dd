"""Validity-predicate compiler (SURVEY.md §2.2 R4/R7).

Compiles an EnvelopeSchema into pure Column expressions that reproduce
``jsonschema.validate`` semantics over a VariantType document — the
error *message*, its *classification* (missing-field vs other, the split
the reference routes on at main.py:183 via ``'is a required property' in
message``), and the validity bit. No UDFs: everything is variant
introspection + a when-chain, so it rides whole-stage codegen at scale.

jsonschema message selection (verified empirically against
jsonschema 4.x ``best_match``, which ``validate()`` raises):
  relevance = (-len(path), path, ...) maximized ⇒
    1. shallowest error depth wins (top-level before sub-object before
       field level);
    2. among same-depth errors, lexicographically GREATEST instance path
       wins ('payload' beats 'metadata', field 'user_id' beats 'id');
    3. remaining ties: first error in keyword/required-list iteration
       order.
The compiler enumerates every possible error of the (static) schema in
exactly that priority order and picks the first firing condition.

Type checks mirror draft-07:
  integer  — JSON int, or float with integral value (2.0 valid, 2.5 not)
  number   — any JSON number
  string/boolean — exact; booleans are NOT integers (True invalid as int)
  explicit null — a type error ("None is not of type 'X'"), not missing
Format annotations (date-time, uuid) are NOT enforced — the reference
calls validate() without a format checker (SURVEY.md §1.2).

Engine-defined divergence (reference crashes): a syntactically corrupt
document (json.load raises at main.py:172) classifies as ``corrupt``.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import lru_cache

from pyspark.sql import Column
from pyspark.sql import functions as F

from local_etl_spark.etl.schema_translate import EnvelopeSchema

CLASS_VALID = "valid"
CLASS_MISSING = "missing_required"  # repairable (reference main.py:183-187)
CLASS_OTHER = "other"  # dropped from output
CLASS_CORRUPT = "corrupt"  # engine-defined (reference would crash)


def _is_numeric(sv: Column) -> Column:
    return (sv == "BIGINT") | (sv == "DOUBLE") | sv.startswith("DECIMAL")


def _type_ok(fv: Column, sv: Column, json_type: str) -> Column:
    """Does a present variant value conform to the draft-07 type?"""
    if json_type == "string":
        return sv == "STRING"
    if json_type == "boolean":
        return sv == "BOOLEAN"
    if json_type == "number":
        return _is_numeric(sv)
    if json_type == "integer":
        dbl = F.try_variant_get(fv, "$", "double")
        return (sv == "BIGINT") | (_is_numeric(sv) & (dbl == F.floor(dbl)))
    raise ValueError(f"unsupported json type {json_type!r}")


def render_value(fv: Column, sv: Column, quote_strings: bool) -> Column:
    """Render a variant scalar the way Python would (reference writes
    ``str(value)`` into CSV; jsonschema messages use ``repr``).

    BIGINT → int digits; DECIMAL/DOUBLE → Python-float-style text;
    true/false → True/False; JSON null → None. Containers get a
    Python-repr-style rendering of their JSON text (quote/space rewrite —
    exact for scalar containers, approximate when member strings contain
    the rewritten characters; documented divergence).
    """
    as_str = F.try_variant_get(fv, "$", "string")
    dbl = F.try_variant_get(fv, "$", "double").cast("string")
    string_form = (
        F.concat(F.lit("'"), as_str, F.lit("'")) if quote_strings else as_str
    )
    container = F.regexp_replace(
        F.regexp_replace(F.regexp_replace(F.to_json(fv), '"', "'"), ",", ", "),
        ":",
        ": ",
    )
    return (
        F.when(fv.isNull(), F.lit(None).cast("string"))
        .when(F.is_variant_null(fv), F.lit("None"))
        .when(sv == "STRING", string_form)
        .when(sv == "BOOLEAN", F.when(as_str == "true", "True").otherwise("False"))
        .when(sv == "BIGINT", as_str)
        .when(_is_numeric(sv), dbl)
        .otherwise(container)
    )


@dataclass(frozen=True)
class Validity:
    """Compiled validity columns for one envelope schema."""

    error_msg: Column  # null when valid
    error_class: Column  # valid | missing_required | other | corrupt
    is_valid: Column


@lru_cache(maxsize=64)
def compiled_validity(schema: EnvelopeSchema) -> Validity:
    """Memoized ``compile_validity`` over the canonical ``v`` document
    column (what every pipeline path uses).

    The ~40-branch expression tree costs real driver time to construct
    (hundreds of py4j round-trips); Columns are immutable and reusable
    across DataFrames, so compiling once per schema — prepared-statement
    style — removes that cost from every run after the first.
    """
    return compile_validity(schema, F.col("v"))


def compile_validity(schema: EnvelopeSchema, doc: Column) -> Validity:
    """Build the validity expressions over ``doc`` (a VariantType column;
    SQL-null doc = corrupt JSON).

    Error slots are emitted in jsonschema best_match priority order (see
    module docstring); the first firing slot provides the message.
    """
    slots: list[tuple[Column, Column]] = []  # (fires, message)

    doc_sv = F.schema_of_variant(doc)
    doc_is_obj = doc_sv.startswith("OBJECT")

    # --- depth 0: document itself ---------------------------------------
    # not-an-object (keyword `type` fires before `required` in file order)
    slots.append(
        (
            ~doc_is_obj,
            F.concat(
                render_value(doc, doc_sv, quote_strings=True),
                F.lit(" is not of type 'object'"),
            ),
        )
    )
    # top-level required, in required-list order (jsonschema yields them
    # in list order; ties at equal depth+path resolve to iteration order)
    for obj_name in schema.required:
        fv = F.variant_get(doc, f"$.{obj_name}", "variant")
        slots.append(
            (
                doc_is_obj & fv.isNull(),
                F.lit(f"'{obj_name}' is a required property"),
            )
        )

    # --- depth 1: sub-objects, lexicographically greatest path first ----
    for obj in sorted(schema.objects, key=lambda o: o.name, reverse=True):
        ov = F.variant_get(doc, f"$.{obj.name}", "variant")
        osv = F.schema_of_variant(ov)
        present = doc_is_obj & ov.isNotNull()
        obj_is_obj = present & osv.startswith("OBJECT")
        # sub-object not an object (incl. explicit null → "None is not…")
        slots.append(
            (
                present & ~osv.startswith("OBJECT"),
                F.concat(
                    render_value(ov, osv, quote_strings=True),
                    F.lit(" is not of type 'object'"),
                ),
            )
        )
        # missing required fields, in required-list order
        for fname in obj.required:
            fv = F.variant_get(doc, f"$.{obj.name}.{fname}", "variant")
            slots.append(
                (
                    obj_is_obj & fv.isNull(),
                    F.lit(f"'{fname}' is a required property"),
                )
            )

    # --- depth 2: field type errors, path-descending ---------------------
    for obj in sorted(schema.objects, key=lambda o: o.name, reverse=True):
        ov = F.variant_get(doc, f"$.{obj.name}", "variant")
        obj_is_obj = doc_is_obj & ov.isNotNull() & F.schema_of_variant(ov).startswith("OBJECT")
        for fspec in sorted(obj.fields, key=lambda f: f.name, reverse=True):
            fv = F.variant_get(doc, f"$.{obj.name}.{fspec.name}", "variant")
            sv = F.schema_of_variant(fv)
            bad = obj_is_obj & fv.isNotNull() & ~_type_ok(fv, sv, fspec.json_type)
            slots.append(
                (
                    bad,
                    F.concat(
                        render_value(fv, sv, quote_strings=True),
                        F.lit(f" is not of type '{fspec.json_type}'"),
                    ),
                )
            )

    corrupt = doc.isNull()
    # ONE flat CaseWhen (first-match-wins = the priority order above).
    # A nested when().otherwise(when()...) fold of the same ~40 branches
    # exceeds janino's method-size limit and silently drops the plan out
    # of whole-stage codegen — flat branches split into methods cleanly.
    msg = F.when(corrupt, F.lit("document is not valid JSON"))
    for fires, message in slots:
        msg = msg.when(fires, message)
    msg = msg.otherwise(F.lit(None).cast("string"))

    error_class = (
        F.when(corrupt, CLASS_CORRUPT)
        .when(msg.isNull(), CLASS_VALID)
        .when(msg.contains("is a required property"), CLASS_MISSING)
        .otherwise(CLASS_OTHER)
    )
    return Validity(
        error_msg=msg,
        error_class=error_class,
        is_valid=msg.isNull(),
    )
