"""Property tests: transform Column expressions ≡ the reference's Python
functions (embedded below as executable specs, re-expressed from
reference main.py:118-124 and main2.py:234-256).

Hypothesis generates the corpus up front; each test runs ONE Spark job
over the whole batch (per-example Spark jobs would be ~1000× slower).
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from local_etl_spark.etl.transforms import TITLES, capitalize, fix_address, fix_job, name_norm


# --- executable specs (reference semantics, cited) -----------------------

def spec_fix_job(job: str) -> str:
    """main.py:112-124 with the engine's split-limit-2 divergence."""
    if "," not in job:
        return job
    general, spec = job.split(",", 1)
    spec = spec.lstrip()
    return f"{spec} {general}".capitalize()


def spec_name_norm(name: str) -> tuple[str, str, str]:
    """main2.py:234-256 → (prefix, name, suffix); '' = restval."""
    toks = name.split(" ")
    if len(toks) == 4:
        return toks[0], f"{toks[1]} {toks[2]}", toks[3]
    if len(toks) == 3:
        if toks[0] in TITLES:
            return toks[0], f"{toks[1]} {toks[2]}", ""
        return "", f"{toks[0]} {toks[1]}", toks[2]
    return "", name, ""


def _run_batch(spark, values: list[str], exprs: dict):
    df = spark.createDataFrame([(v,) for v in values], ["s"])
    out = df.select(
        "s", *[e.alias(k) for k, e in exprs.items()]
    ).collect()
    return out


# word-ish text incl. commas, spaces, unicode letters, leading whitespace
TEXT = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",), blacklist_characters="\x00"),
    max_size=40,
)
ASCII_TEXT = st.text(
    alphabet=st.characters(min_codepoint=1, max_codepoint=127),
    max_size=40,
)
NAMEISH = st.lists(
    st.sampled_from(["Dr.", "Mr.", "Mrs.", "Ms.", "John", "Ada", "Lovelace", "PhD", "Jr.", "von", "Neumann", ""]),
    min_size=1,
    max_size=6,
).map(" ".join)


@settings(max_examples=30, deadline=None)
@given(st.lists(TEXT, min_size=1, max_size=40))
def test_capitalize_matches_python(spark, values):
    for row in _run_batch(spark, values, {"c": capitalize(F.col("s"))}):
        expected = row["s"].capitalize()
        if expected != row["c"]:
            # Python capitalize() maps titlecase chars (ǅ) via str.lower/
            # title rules; JVM upper/lower differ on a few locale-special
            # code points. ASCII must be exact:
            if row["s"].isascii():
                raise AssertionError(f"{row['s']!r}: {row['c']!r} != {expected!r}")


@settings(max_examples=30, deadline=None)
@given(st.lists(ASCII_TEXT, min_size=1, max_size=40))
def test_fix_job_matches_reference(spark, values):
    for row in _run_batch(spark, values, {"j": fix_job(F.col("s"))}):
        assert row["j"] == spec_fix_job(row["s"]), row["s"]


@settings(max_examples=30, deadline=None)
@given(st.lists(st.one_of(NAMEISH, ASCII_TEXT), min_size=1, max_size=40))
def test_name_norm_matches_reference(spark, values):
    exprs = name_norm(F.col("s"))
    for row in _run_batch(
        spark, values, {"p": exprs["prefix"], "n": exprs["name"], "x": exprs["suffix"]}
    ):
        assert (row["p"], row["n"], row["x"]) == spec_name_norm(row["s"]), row["s"]


def test_fix_address_strips_newlines(spark):
    vals = ["8279 Rodriguez Ports\nPaulbury, VI 89148", "a\nb\nc", "plain"]
    for row in _run_batch(spark, vals, {"a": fix_address(F.col("s"))}):
        assert row["a"] == row["s"].replace("\n", " ")


def test_reference_sample_job():
    """The SURVEY-verified example: 'Commercial horticulturist, retail'
    → 'Retail commercial horticulturist' (NOT initcap)."""
    assert spec_fix_job("Commercial horticulturist, retail") == "Retail commercial horticulturist"


def test_capitalize_titlecase_first_char_exact(spark):
    """Every code point where Python titlecases the first char
    differently from uppercase (digraphs, ß, ligatures, Georgian,
    Greek iota composites) must match str.capitalize() exactly —
    the override table found live by the reference-diff fuzz corpus
    (edge_job_titlecase)."""
    from local_etl_spark.etl.transforms import _TITLECASE_FIRST

    values = [c + "aBc" for c in _TITLECASE_FIRST] + list(_TITLECASE_FIRST)
    for row in _run_batch(spark, values, {"c": capitalize(F.col("s"))}):
        assert row["c"] == row["s"].capitalize(), repr(row["s"])
