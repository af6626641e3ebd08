"""Normalization functions as JVM-side Column expressions.

Reference semantics (cited per function) re-expressed with built-in
``pyspark.sql.functions`` so they stay inside whole-stage codegen — no Python
in the hot path. Each function takes and returns ``Column``.
"""

from __future__ import annotations

from collections.abc import Sequence

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
    "yyyy.MM.dd",
    "MMM d yyyy",
    "MMMM d yyyy",
    "d MMM yyyy",
    "d MMMM yyyy",
    "MM/dd/yyyy",
    "dd.MM.yyyy",
]

#: fixed two-digit-year pivot — years parse into 2000-2099, anything past
#: the pivot is pulled back a century ("PREFER_DATES_FROM=past" without a
#: wall clock: replay determinism forbids now()-relative pivots)
_YY_PIVOT = 2049

#: opt-in non-English month names (the reference's ``dateparser`` accepts
#: them natively; java.time formats are en-locale only, so matching names
#: are pre-translated to the English abbreviation before the format chain).
#: Accent-stripped spellings are included — scraped text frequently loses
#: diacritics in transit.
_LOCALE_MONTHS: dict[str, list[list[str]]] = {
    "de": [["Januar", "Jaenner", "Jänner"], ["Februar"], ["März", "Maerz", "Marz"],
           ["April"], ["Mai"], ["Juni"], ["Juli"], ["August"], ["September"],
           ["Oktober"], ["November"], ["Dezember"]],
    "fr": [["janvier"], ["février", "fevrier"], ["mars"], ["avril"], ["mai"],
           ["juin"], ["juillet"], ["août", "aout"], ["septembre"], ["octobre"],
           ["novembre"], ["décembre", "decembre"]],
    "es": [["enero"], ["febrero"], ["marzo"], ["abril"], ["mayo"], ["junio"],
           ["julio"], ["agosto"], ["septiembre", "setiembre"], ["octubre"],
           ["noviembre"], ["diciembre"]],
    "it": [["gennaio"], ["febbraio"], ["marzo"], ["aprile"], ["maggio"],
           ["giugno"], ["luglio"], ["agosto"], ["settembre"], ["ottobre"],
           ["novembre"], ["dicembre"]],
    "pt": [["janeiro"], ["fevereiro"], ["março", "marco"], ["abril"], ["maio"],
           ["junho"], ["julho"], ["agosto"], ["setembro"], ["outubro"],
           ["novembro"], ["dezembro"]],
}
_EN_MONTH_ABBR = ["Jan", "Feb", "Mar", "Apr", "May", "Jun",
                  "Jul", "Aug", "Sep", "Oct", "Nov", "Dec"]


def _past_pivot(ts: Column) -> Column:
    """Two-digit years parse into 2000-2099; pull anything past the fixed
    pivot back a century (dateparser's PREFER_DATES_FROM=past without a
    wall clock)."""
    return F.when(
        ts.isNotNull() & (F.year(ts) > _YY_PIVOT),
        F.make_date(F.year(ts) - 100, F.month(ts), F.day(ts)).cast("timestamp"),
    ).otherwise(ts)


def normalize_date(
    col: Column,
    base_year: Column | None = None,
    day_first: bool = False,
    locales: "Sequence[str] | None" = None,
) -> Column:
    """Arbitrary common date formats → 'yyyy-MM-dd' string; NULL if unparseable.

    Reference: ``boxing/transform/bout_data.py:9-47`` (``dateparser`` with
    PREFER_DATES_FROM=past). The JVM-side long tail covers: ISO and slashed/
    dotted forms, month names (with or without commas), abbreviated months
    with trailing periods ("Aug. 17 1995", "Sept. 3 2001"), ordinal day
    suffixes ("Aug 17th 1995"), two-digit years — slashed "2/4/24" and the
    dotted day-first "17.8.95", both past-preferring via a fixed 2049
    pivot — and year-less dates ("Aug 17") completed from ``base_year``.
    ``day_first=True`` resolves the slashed all-numeric ambiguity the
    European way ("04/02/2024" → Feb 4; dateparser's DATE_ORDER=DMY),
    month-first otherwise. Genuinely ambiguous leftovers fall to NULL
    rather than a locale-dependent guess.

    ``locales`` (opt-in, e.g. ``("de", "fr")`` — see ``_LOCALE_MONTHS``)
    pre-translates non-English month names to the English abbreviation
    before the format chain (one JVM-side regexp pass per month, all
    requested locales folded into a single alternation), and strips the
    ordinal day period German dates carry ("17. März 1995"). The
    reference's ``dateparser`` accepts these natively; explicitly opt-in
    here so en-only pipelines pay nothing.
    """
    cleaned = F.trim(F.regexp_replace(col, ",", " "))
    # strip ordinal suffixes on day numbers: 17th → 17 (dateparser accepts
    # them natively; JVM formats do not)
    cleaned = F.regexp_replace(cleaned, "(?<=\\d)(st|nd|rd|th)\\b", "")
    # month-abbreviation periods ("Aug." → "Aug") and the four-letter
    # "Sept" dateparser accepts but java.time does not
    cleaned = F.regexp_replace(cleaned, "(?<=[A-Za-z])\\.", "")
    cleaned = F.regexp_replace(cleaned, "(?i)\\bsept\\b", "Sep")
    if locales:
        for i in range(12):
            names = sorted(
                {nm for loc in locales for nm in _LOCALE_MONTHS[loc][i]},
                key=len,
                reverse=True,
            )
            cleaned = F.regexp_replace(
                cleaned,
                "(?iu)\\b(" + "|".join(names) + ")\\b",
                _EN_MONTH_ABBR[i],
            )
        # the German ordinal day period ("17. März") — digit-period-space
        # only, so dotted numeric dates ("17.8.95") are untouched
        cleaned = F.regexp_replace(cleaned, "(?<=\\d)\\.(?=\\s)", "")
    cleaned = F.trim(F.regexp_replace(cleaned, "\\s+", " "))
    slashed4 = "d/M/yyyy" if day_first else "MM/dd/yyyy"
    fmts = [f for f in _DATE_FORMATS if f != "MM/dd/yyyy"] + [slashed4]
    candidates = [F.try_to_timestamp(cleaned, F.lit(fmt)) for fmt in fmts]
    # two-digit year, slashed: month-first in the reference's en locale,
    # day-first under DATE_ORDER=DMY. The past-preferring pivot applies to
    # two-digit candidates ONLY — an explicit four-digit year stands as-is.
    candidates.append(
        _past_pivot(
            F.try_to_timestamp(cleaned, F.lit("d/M/yy" if day_first else "M/d/yy"))
        )
    )
    # dotted two-digit year ("17.8.95") — dotted forms are day-first by
    # convention in every locale that writes them
    candidates.append(_past_pivot(F.try_to_timestamp(cleaned, F.lit("d.M.yy"))))
    if base_year is not None:
        with_year = F.concat_ws(" ", cleaned, base_year.cast("string"))
        candidates += [
            F.try_to_timestamp(with_year, F.lit("MMM d yyyy")),
            F.try_to_timestamp(with_year, F.lit("MMMM d yyyy")),
            F.try_to_timestamp(with_year, F.lit("d MMM yyyy")),
            F.try_to_timestamp(with_year, F.lit("d MMMM yyyy")),
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


#: languages the reference's filename codec recognizes
#: (``boxing/utils/filename_utils.py:18``)
_FILENAME_LANGS = ["en", "es", "fr", "de", "ru"]


def encode_page_filename(url: Column) -> Column:
    """F8 url→filename codec: ``{lang}_{box-pro|box-am}_{id}.html``.

    Reference ``boxing/utils/filename_utils.py:10-41``: language from the
    first path segment (whitelisted, default 'en'), competition level from
    the path kind, id from the trailing segment; wiki URLs encode as
    ``wiki_box-pro_{id}.html``. Non-page URLs yield NULL (the reference's
    path-mangling fallback is a scraper artifact, not page identity).
    """
    lang_raw = F.regexp_extract(url, r"://[^/]+/([a-z]{2})/", 1)
    lang = F.when(lang_raw.isin(_FILENAME_LANGS), lang_raw).otherwise(F.lit("en"))
    page_id = F.regexp_extract(url, r"/box-(?:pro|am)/(\d+)", 1)
    wiki_id = F.regexp_extract(url, r"Human:(\d+)", 1)
    level = F.when(url.contains("box-am"), F.lit("box-am")).otherwise(F.lit("box-pro"))
    return (
        F.when(
            page_id != "",
            F.concat(lang, F.lit("_"), level, F.lit("_"), page_id, F.lit(".html")),
        )
        .when(wiki_id != "", F.concat(F.lit("wiki_box-pro_"), wiki_id, F.lit(".html")))
        .otherwise(F.lit(None).cast("string"))
    )


def parse_page_filename(col: Column) -> Column:
    """F8 inverse codec: filename → struct(boxrec_id, competition_level,
    lang, url). Reference ``boxing/load/to_data_lake.py:33-69`` /
    ``to_data_lake_batch.py:36-62``: id from the trailing digits, level from
    the path kind, reconstructed canonical URL. NULL fields when the name
    doesn't parse."""
    page_id = F.nullif(F.regexp_extract(col, r"_(\d+)\.html$", 1), F.lit(""))
    level = F.when(page_id.isNull(), F.lit(None).cast("string")).when(
        col.contains("_box-am_"), F.lit("amateur")
    ).otherwise(F.lit("professional"))
    lang = F.nullif(F.regexp_extract(col, r"^([a-z]{2})_", 1), F.lit(""))
    kind = F.when(col.contains("_box-am_"), F.lit("box-am")).otherwise(
        F.lit("box-pro")
    )
    url = F.when(
        page_id.isNotNull(),
        F.concat(
            F.lit("https://boxrec.com/"),
            F.coalesce(lang, F.lit("en")),
            F.lit("/"),
            kind,
            F.lit("/"),
            page_id,
        ),
    )
    return F.struct(
        page_id.alias("boxrec_id"),
        level.alias("competition_level"),
        lang.alias("lang"),
        url.alias("url"),
    )


def normalize_url(col: Column, domain: str = "boxrec.com") -> Column:
    """Append ``allSports=y`` to profile URLs that lack a query string.

    Reference: ``boxing/validators/boxrec_url.py:36-75``.
    """
    needs_param = col.contains("/box-pro/") & ~col.contains("?")
    return F.when(needs_param, F.concat(col, F.lit("?allSports=y"))).otherwise(col)


def unicode_normalize(col: Column, form: str = "NFC") -> Column:
    """Unicode normalization (NFC/NFD/NFKC/NFKD) — the mojibake-defusing
    first step of web-corpus text cleanup: decomposed accent sequences
    (``a + U+0301``) collapse to their composed code points, and the K forms
    additionally fold compatibility characters (ligatures, fullwidth).

    Spark has no built-in Unicode normalizer, so this is the sanctioned
    slow path: an Arrow-vectorized pandas UDF (one ``unicodedata.normalize``
    call per value over Arrow batches — never row-at-a-time Python). Keep it
    off per-event hot paths; it belongs in the document-preparation sweep.
    """
    if form not in ("NFC", "NFD", "NFKC", "NFKD"):
        raise ValueError(f"unknown normalization form: {form!r}")

    from pyspark.sql.functions import pandas_udf

    def _norm(s):
        import unicodedata

        return s.map(
            lambda v: unicodedata.normalize(form, v) if v is not None else None
        )

    # explicit (func, returnType) form: the module uses PEP 563 postponed
    # annotations, which pandas_udf's type-hint introspection can't resolve
    return pandas_udf(_norm, "string")(col)


def strip_control_chars(col: Column) -> Column:
    """Remove C0/C1 control characters except tab/newline/carriage-return —
    pure JVM regexp, composes with :func:`unicode_normalize` for the
    standard web-text cleanup pair."""
    return F.regexp_replace(col, "[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f]", "")
