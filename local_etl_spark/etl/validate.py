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


def leaf_name(obj: str | None = None, fname: str | None = None, sv: bool = False) -> str:
    """Internal column name for a pre-extracted variant leaf (``sv`` =
    its schema_of_variant string)."""
    base = "_vx_doc" if obj is None else (
        f"_vx_{obj}" if fname is None else f"_vx_{obj}_{fname}"
    )
    return f"{base}_sv" if sv else base


def _schema_leaves(schema: EnvelopeSchema) -> list[tuple[str | None, str | None]]:
    """Every (obj, field) path the validity/render expressions touch."""
    paths: list[tuple[str | None, str | None]] = [(None, None)]
    for obj in schema.objects:
        paths.append((obj.name, None))
        names = list(dict.fromkeys(
            [f.name for f in obj.fields] + list(obj.required)
        ))
        paths.extend((obj.name, n) for n in names)
    return paths


@lru_cache(maxsize=64)
def leaf_exprs(schema: EnvelopeSchema) -> tuple[tuple[str, Column], ...]:
    """Pre-extraction projection: each variant leaf (and its type string)
    pulled out of the ``v`` document exactly once.

    The validity CASE evaluates every branch condition for valid rows and
    each branch would otherwise re-walk the variant (CASE branches are
    conditionally evaluated, so Spark's subexpression elimination can't
    hoist them). Extracting leaves in a lower projection makes each
    branch an attribute compare — far less generated code (faster janino
    compile) and one variant walk per leaf per row instead of one per
    branch. CollapseProject keeps the split (multi-referenced non-trivial
    aliases are not inlined).
    """
    doc = F.col("v")
    out: list[tuple[str, Column]] = []
    for obj, fname in _schema_leaves(schema):
        if obj is None:
            fv = doc
        elif fname is None:
            fv = F.variant_get(doc, f"$.{obj}", "variant")
        else:
            fv = F.variant_get(doc, f"$.{obj}.{fname}", "variant")
        if obj is not None:
            out.append((leaf_name(obj, fname), fv))
        out.append((leaf_name(obj, fname, sv=True), F.schema_of_variant(fv)))
    return tuple(out)


@lru_cache(maxsize=64)
def compiled_validity(schema: EnvelopeSchema) -> Validity:
    """Memoized self-contained compile over the canonical ``v`` column —
    for callers that don't carry the leaf projection."""
    doc = F.col("v")

    def getv(obj=None, fname=None):
        if obj is None:
            return doc
        path = f"$.{obj}" if fname is None else f"$.{obj}.{fname}"
        return F.variant_get(doc, path, "variant")

    def getsv(obj=None, fname=None):
        return F.schema_of_variant(getv(obj, fname))

    return _compile(schema, getv, getsv)


@lru_cache(maxsize=64)
def compiled_validity_leaves(schema: EnvelopeSchema) -> Validity:
    """Memoized compile against the ``leaf_exprs`` projection (the
    pipeline's hot path): every variant access is a plain column ref."""

    def getv(obj=None, fname=None):
        return F.col("v") if obj is None else F.col(leaf_name(obj, fname))

    def getsv(obj=None, fname=None):
        return F.col(leaf_name(obj, fname, sv=True))

    return _compile(schema, getv, getsv)


def compile_validity(schema: EnvelopeSchema, doc: Column) -> Validity:
    """Build the validity expressions over ``doc`` (a VariantType column;
    SQL-null doc = corrupt JSON). Self-contained (no leaf projection)."""

    def getv(obj=None, fname=None):
        if obj is None:
            return doc
        path = f"$.{obj}" if fname is None else f"$.{obj}.{fname}"
        return F.variant_get(doc, path, "variant")

    def getsv(obj=None, fname=None):
        return F.schema_of_variant(getv(obj, fname))

    return _compile(schema, getv, getsv)


def _compile(schema: EnvelopeSchema, getv, getsv) -> Validity:
    """Shared validity compiler over a leaf resolver.

    Error slots are emitted in jsonschema best_match priority order (see
    module docstring); the first firing slot provides the message.
    """
    slots: list[tuple[Column, Column]] = []  # (fires, message)

    doc = getv()
    doc_sv = getsv()
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
        slots.append(
            (
                doc_is_obj & getv(obj_name).isNull(),
                F.lit(f"'{obj_name}' is a required property"),
            )
        )

    # --- depth 1: sub-objects, lexicographically greatest path first ----
    for obj in sorted(schema.objects, key=lambda o: o.name, reverse=True):
        ov = getv(obj.name)
        osv = getsv(obj.name)
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
            slots.append(
                (
                    obj_is_obj & getv(obj.name, fname).isNull(),
                    F.lit(f"'{fname}' is a required property"),
                )
            )

    # --- depth 2: field type errors, path-descending ---------------------
    for obj in sorted(schema.objects, key=lambda o: o.name, reverse=True):
        ov = getv(obj.name)
        obj_is_obj = (
            doc_is_obj & ov.isNotNull() & getsv(obj.name).startswith("OBJECT")
        )
        for fspec in sorted(obj.fields, key=lambda f: f.name, reverse=True):
            fv = getv(obj.name, fspec.name)
            sv = getsv(obj.name, fspec.name)
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
