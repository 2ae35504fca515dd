"""String transforms reproducing the reference's ad-hoc fixes
(SURVEY.md §2.2 R11/R12/R13) as pure Column expressions.

Each function is property-tested against the reference's own Python
implementation (embedded as an executable spec in tests/test_etl_transforms.py).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Title prefixes consulted by the 3-token branch (reference main2.py:244).
TITLES = ("Dr.", "Mr.", "Mrs.", "Ms.")
# Suffix list declared at main2.py:245 but NEVER consulted by the
# reference — any non-title 3-token name treats token 3 as a suffix.
# Kept here for documentation parity only.
SUFFIXES = ("PhD", "MD", "DDS", "DVM", "IV", "Jr.", "II")

# Python str.lstrip()'s default whitespace set (str.isspace() == True).
# Java's \s is only [ \t\n\x0B\f\r]; Python additionally strips the
# C1 separators \x1c-\x1f, NEL \x85, NBSP \xa0, and the Unicode Zs block.
_PY_WHITESPACE = (
    "[\\t-\\r\\x1c-\\x1f \\x85\\xa0\\u1680\\u2000-\\u200a"
    "\\u2028\\u2029\\u202f\\u205f\\u3000]"
)


def fix_address(address: Column) -> Column:
    """Strip newlines: ``address.replace('\\n', ' ')`` (main.py:111)."""
    return F.regexp_replace(address, "\n", " ")


def capitalize(s: Column) -> Column:
    """Python ``str.capitalize()``: first char upper, ALL the rest lower.

    Not ``initcap`` (which capitalizes every word) — verified in
    SURVEY.md §2.2 R12: 'retail Commercial x'.capitalize() →
    'Retail commercial x'.
    """
    return F.concat(
        F.upper(F.substring(s, 1, 1)),
        F.lower(s.substr(F.lit(2), F.length(s))),
    )


def fix_job(job: Column) -> Column:
    """Reorder a comma'd job title (reference fix_job_field, main.py:118-124):
    'General, specialization' → 'Specialization general' (capitalize()).

    Applied only when the value contains a comma (main.py:112) — the
    when() gate short-circuits per row in codegen exactly like the
    reference's ``if ','``. The reference 2-way-unpacks ``split(',')``
    and CRASHES on >1 comma; the engine uses split-limit-2 so
    'A, b, c' → spec='b, c' (documented divergence, FIXTURES.md §1.4).
    Python ``lstrip()`` strips all leading whitespace → regexp, not
    ltrim (ltrim is space-only).
    """
    parts = F.split(job, ",", 2)
    general = parts.getItem(0)
    spec = F.regexp_replace(parts.getItem(1), f"^{_PY_WHITESPACE}+", "")
    reordered = F.concat_ws(" ", spec, general)
    return F.when(job.contains(","), capitalize(reordered)).otherwise(job)


def name_norm(name: Column) -> dict[str, Column]:
    """Name prefix/suffix normalization (reference main2.py:234-256).

    Split on single spaces; 4 tokens → (prefix=t0, name='t1 t2',
    suffix=t3); 3 tokens → title-prefixed or suffixed (ANY non-title
    first token routes to the suffix branch — the declared suffix list
    is never consulted); otherwise unchanged with '' prefix/suffix
    (DictWriter restval).

    Null-safety is engine-defined: an absent name (repaired row) yields
    ('', '', '') where the reference raises NameError (main2.py:242) —
    documented divergence. An empty string splits to [''] (len 1) →
    unchanged, matching Python exactly.
    """
    toks = F.split(name, " ")
    n = F.size(toks)
    t = [F.element_at(toks, i) for i in range(1, 5)]
    is_title = t[0].isin(*TITLES)

    prefix = (
        F.when(name.isNull(), F.lit(""))
        .when(n == 4, t[0])
        .when((n == 3) & is_title, t[0])
        .otherwise(F.lit(""))
    )
    suffix = (
        F.when(name.isNull(), F.lit(""))
        .when(n == 4, t[3])
        .when((n == 3) & ~is_title, t[2])
        .otherwise(F.lit(""))
    )
    new_name = (
        F.when(name.isNull(), F.lit(""))
        .when(n == 4, F.concat_ws(" ", t[1], t[2]))
        .when((n == 3) & is_title, F.concat_ws(" ", t[1], t[2]))
        .when((n == 3) & ~is_title, F.concat_ws(" ", t[0], t[1]))
        .otherwise(name)
    )
    return {"prefix": prefix, "name": new_name, "suffix": suffix}
