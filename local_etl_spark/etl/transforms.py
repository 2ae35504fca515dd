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


# Python str.capitalize() TITLECASES the first character, which differs
# from uppercase for exactly 135 code points (Unicode digraphs
# ǅǈǋǲ, ß→Ss, Latin/Armenian ligatures, Georgian Mkhedruli, Greek
# iota-subscript composites). Generated from CPython:
#   {c: (c + "x").capitalize()[:-1] for c in all_codepoints
#    if that != c.upper()}
# Found live by the reference-diff fuzz corpus (edge_job_titlecase).
# Split into 112 one-to-one mappings (applied with O(1) ``translate``)
# and 23 one-to-many mappings (a small CASE) — an earlier 135-branch
# CASE tree blew the render expressions past janino's method limit and
# dropped the whole ETL pipeline to interpreted execution (measured
# 1.1s → 10.2s on the 2000-file corpus; SCALE.md §3.4's failure mode).
_TITLE_1TO1_FROM = "\u01c4\u01c6\u01c7\u01c9\u01ca\u01cc\u01f1\u01f3\u1f80\u1f81\u1f82\u1f83\u1f84\u1f85\u1f86\u1f87\u1f90\u1f91\u1f92\u1f93\u1f94\u1f95\u1f96\u1f97\u1fa0\u1fa1\u1fa2\u1fa3\u1fa4\u1fa5\u1fa6\u1fa7\u1fb3\u1fc3\u1ff3"
_TITLE_1TO1_TO = "\u01c5\u01c5\u01c8\u01c8\u01cb\u01cb\u01f2\u01f2\u1f88\u1f89\u1f8a\u1f8b\u1f8c\u1f8d\u1f8e\u1f8f\u1f98\u1f99\u1f9a\u1f9b\u1f9c\u1f9d\u1f9e\u1f9f\u1fa8\u1fa9\u1faa\u1fab\u1fac\u1fad\u1fae\u1faf\u1fbc\u1fcc\u1ffc"
# titlecase(c) == c but upper(c) != c — first char must stay AS-IS
_TITLE_IDENTITY = "\u01c5\u01c8\u01cb\u01f2\u10d0\u10d1\u10d2\u10d3\u10d4\u10d5\u10d6\u10d7\u10d8\u10d9\u10da\u10db\u10dc\u10dd\u10de\u10df\u10e0\u10e1\u10e2\u10e3\u10e4\u10e5\u10e6\u10e7\u10e8\u10e9\u10ea\u10eb\u10ec\u10ed\u10ee\u10ef\u10f0\u10f1\u10f2\u10f3\u10f4\u10f5\u10f6\u10f7\u10f8\u10f9\u10fa\u10fd\u10fe\u10ff\u1f88\u1f89\u1f8a\u1f8b\u1f8c\u1f8d\u1f8e\u1f8f\u1f98\u1f99\u1f9a\u1f9b\u1f9c\u1f9d\u1f9e\u1f9f\u1fa8\u1fa9\u1faa\u1fab\u1fac\u1fad\u1fae\u1faf\u1fbc\u1fcc\u1ffc"
_TITLE_MULTI = {
    "\u00df": "\u0053\u0073",
    "\u0587": "\u0535\u0582",
    "\u1fb2": "\u1fba\u0345",
    "\u1fb4": "\u0386\u0345",
    "\u1fb7": "\u0391\u0342\u0345",
    "\u1fc2": "\u1fca\u0345",
    "\u1fc4": "\u0389\u0345",
    "\u1fc7": "\u0397\u0342\u0345",
    "\u1ff2": "\u1ffa\u0345",
    "\u1ff4": "\u038f\u0345",
    "\u1ff7": "\u03a9\u0342\u0345",
    "\ufb00": "\u0046\u0066",
    "\ufb01": "\u0046\u0069",
    "\ufb02": "\u0046\u006c",
    "\ufb03": "\u0046\u0066\u0069",
    "\ufb04": "\u0046\u0066\u006c",
    "\ufb05": "\u0053\u0074",
    "\ufb06": "\u0053\u0074",
    "\ufb13": "\u0544\u0576",
    "\ufb14": "\u0544\u0565",
    "\ufb15": "\u0544\u056b",
    "\ufb16": "\u054e\u0576",
    "\ufb17": "\u0544\u056d",
}
# used by tests to enumerate every override
_TITLECASE_FIRST = {
    **dict(zip(_TITLE_1TO1_FROM, _TITLE_1TO1_TO)),
    **{c: c for c in _TITLE_IDENTITY},
    **_TITLE_MULTI,
}


def capitalize(s: Column) -> Column:
    """Python ``str.capitalize()``: first char TITLECASED, ALL the rest
    lower.

    Not ``initcap`` (which capitalizes every word) — verified in
    SURVEY.md §2.2 R12: 'retail Commercial x'.capitalize() →
    'Retail commercial x'. First-char titlecase ≠ uppercase for the
    override tables above; everything else upper-cases identically in
    the JVM and CPython (both follow Unicode SpecialCasing).
    """
    # Bind the first char ONCE through a single-element higher-order
    # transform: `s` may be a LARGE derived expression (the render
    # trees feed extraction+format subtrees in here), and Spark does no
    # CSE across CASE branches — referencing `first` from each override
    # branch would embed a full copy of `s` per reference (measured:
    # the 2000-file ETL corpus went 1.1s → 10.2s when this tree blew
    # janino's 64 KB method limit and execution fell back to
    # interpreted). Inside the lambda every reference is to the bound
    # variable, so `s` appears exactly 3× in the final expression.
    def _title_head(fc: Column) -> Column:
        translated = F.translate(fc, _TITLE_1TO1_FROM, _TITLE_1TO1_TO)
        is_identity = (
            F.translate(fc, _TITLE_IDENTITY, "\x01" * len(_TITLE_IDENTITY))
            == "\x01"
        )
        head = None
        for c, tc in _TITLE_MULTI.items():
            cond = fc == F.lit(c)
            head = (
                F.when(cond, F.lit(tc))
                if head is None
                else head.when(cond, F.lit(tc))
            )
        return (
            head.when(is_identity, fc)  # e.g. Georgian ა: titlecase = itself
            .when(translated != fc, translated)  # 1:1 override (ǆ → ǅ)
            .otherwise(F.upper(fc))  # everything else: titlecase ≡ upper
        )

    head = F.element_at(
        F.transform(F.array(F.substring(s, 1, 1)), _title_head), 1
    )
    return F.concat(head, F.lower(s.substr(F.lit(2), F.length(s))))


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
