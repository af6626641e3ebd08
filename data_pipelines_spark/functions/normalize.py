"""Normalization functions as JVM-side Column expressions.

Reference semantics (cited per function) re-expressed with built-in
``pyspark.sql.functions`` so they stay inside whole-stage codegen — no Python
in the hot path. Each function takes and returns ``Column``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def normalized_text(col: Column) -> Column:
    """Canonical text normal form: whitespace runs collapsed, trimmed,
    lowercased — the single definition every fingerprint/dedup hash uses
    (dedup groups and char-shingle sketches must agree byte-for-byte)."""
    return F.lower(F.trim(F.regexp_replace(col, "\\s+", " ")))


def normalize_id(col: Column) -> Column:
    """Strip leading zeros iff the value is all digits; otherwise unchanged.

    Reference: ``boxing/transform/boxer_id.py:7-24`` — ``'000080'→'80'``,
    ``'000'→'0'``, ``'abc'→'abc'``, ``''→''``.  ``cast('decimal(38,0)')``
    round-trip keeps full precision for ids longer than a long.
    """
    digits_only = col.rlike("^[0-9]+$")
    stripped = F.regexp_replace(col, "^0+", "")
    # all-zeros input ('000') strips to '' -> canonical '0'
    normalized = F.when(stripped == "", F.lit("0")).otherwise(stripped)
    return F.when(digits_only, normalized).otherwise(col)


def slugify(col: Column) -> Column:
    """Lowercase, non-alphanumeric runs → '-', trim leading/trailing '-'.

    Reference: ``boxing/load/to_staging_mirror_db.py:143`` and
    ``boxing/transform/slug.py:7-24``.
    """
    dashed = F.regexp_replace(F.lower(col), "[^a-z0-9]+", "-")
    return F.regexp_replace(dashed, "(^-+)|(-+$)", "")


#: result-string → canonical code, reference boxing/transform/bout_data.py:50-96
_RESULT_MAP = {
    "W": ["w", "win", "won", "victory"],
    "L": ["l", "loss", "lost", "lose", "defeat"],
    "D": ["d", "draw", "tie", "tied"],
    "NC": ["nc", "no contest", "no-contest"],
    "TD": ["td", "technical draw", "technical-draw"],
}


def normalize_result(col: Column) -> Column:
    """win/won/victory→W, loss→L, draw/tie→D, NC, TD; unknown→NULL.

    Reference: ``boxing/transform/bout_data.py:50-96``.
    """
    low = F.trim(F.lower(col))
    expr: Column | None = None
    for code, variants in _RESULT_MAP.items():
        cond = low.isin(variants)
        expr = F.when(cond, F.lit(code)) if expr is None else expr.when(cond, F.lit(code))
    assert expr is not None
    return expr.otherwise(F.lit(None).cast("string"))


#: candidate date formats, most specific first — reference uses ``dateparser``
#: with PREFER_DATES_FROM=past (boxing/transform/bout_data.py:9-47); here the
#: common formats are tried JVM-side and only genuinely ambiguous strings
#: would fall through to NULL.
_DATE_FORMATS = [
    "yyyy-MM-dd",
    "yyyy/MM/dd",
    "MMM d yyyy",
    "MMMM d yyyy",
    "d MMM yyyy",
    "d MMMM yyyy",
    "MM/dd/yyyy",
]


def normalize_date(col: Column, base_year: Column | None = None) -> Column:
    """Arbitrary common date formats → 'yyyy-MM-dd' string; NULL if unparseable.

    Year-less dates like 'Aug 17' get ``base_year`` appended before parsing —
    reference: ``boxing/transform/bout_data.py:9-47``.
    """
    cleaned = F.trim(F.regexp_replace(col, ",", " "))
    cleaned = F.regexp_replace(cleaned, "\\s+", " ")
    candidates = [F.try_to_timestamp(cleaned, F.lit(fmt)) for fmt in _DATE_FORMATS]
    if base_year is not None:
        with_year = F.concat_ws(" ", cleaned, base_year.cast("string"))
        candidates += [
            F.try_to_timestamp(with_year, F.lit("MMM d yyyy")),
            F.try_to_timestamp(with_year, F.lit("MMMM d yyyy")),
            F.try_to_timestamp(with_year, F.lit("d MMM yyyy")),
        ]
    return F.date_format(F.coalesce(*candidates), "yyyy-MM-dd")


def bout_id(boxer_id: Column, index: Column) -> Column:
    """``"{normalized_id}_bout_{i}"`` — reference ``boxing/transform/bout_id.py:4-12``.

    ``concat`` (not ``concat_ws``) so a NULL id yields NULL instead of a
    plausible-looking bare index string.
    """
    return F.concat(normalize_id(boxer_id), F.lit("_bout_"), index.cast("string"))


def id_from_url(col: Column, pattern: str = r"/box-pro/(\d+)") -> Column:
    """Extract a numeric id from a URL path; '' when absent.

    Reference: ``boxing/extract/page/boxer/fields/bouts.py:43-45,126-140``.
    """
    return F.regexp_extract(col, pattern, 1)


def height_to_cm(col: Column) -> Column:
    """Parse height text → cm. Prefers an explicit ``NNNcm`` match, else
    converts ``F'I"`` feet/inches: ``int((ft*12+in) * 2.54)``.

    Reference: ``boxing/extract/page/boxer/fields/height.py:7-31``.
    """
    cm = F.regexp_extract(col, r"(\d+)\s*cm", 1)
    ft = F.regexp_extract(col, r"(\d+)\s*(?:ft|')", 1)
    inch = F.regexp_extract(col, r"(?:ft|')\s*(\d+)", 1)
    converted = F.floor(
        (ft.cast("int") * 12 + F.coalesce(F.nullif(inch, F.lit("")).cast("int"), F.lit(0)))
        * 2.54
    ).cast("int")
    return F.when(cm != "", cm.cast("int")).when(ft != "", converted).otherwise(
        F.lit(None).cast("int")
    )


def normalize_url(col: Column, domain: str = "boxrec.com") -> Column:
    """Append ``allSports=y`` to profile URLs that lack a query string.

    Reference: ``boxing/validators/boxrec_url.py:36-75``.
    """
    needs_param = col.contains("/box-pro/") & ~col.contains("?")
    return F.when(needs_param, F.concat(col, F.lit("?allSports=y"))).otherwise(col)
