"""HTML extraction as vectorized pandas/Arrow UDFs.

The reference's extraction layer is 36 per-field BeautifulSoup extractors
dispatched by one orchestrator that parses each page exactly once
(``boxing/extract/orchestrator.py:29-99``). The Spark-native version keeps
the parse-once-extract-many amortization but vectorizes it: ONE pandas UDF
per purpose, processing an Arrow batch of pages per call and returning a wide
struct — never 36 separate Python UDFs (Catalyst can't fuse opaque UDFs).

Determinism contract: ``html_to_text`` is pure Python (stdlib ``HTMLParser``,
no locale/env/library-version dependence), so extracted text is byte-identical
on every replay — the per-row invariant from BASELINE.json ``input_hint``.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

_SKIP_TAGS = {"script", "style", "noscript", "template"}
_WS_RE = re.compile(r"\s+")


class _TextExtractor(HTMLParser):
    """Collect visible text, skipping script/style subtrees."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.chunks: list[str] = []
        self._skip_depth = 0

    def handle_starttag(self, tag, attrs):
        if tag in _SKIP_TAGS:
            self._skip_depth += 1

    def handle_endtag(self, tag):
        if tag in _SKIP_TAGS and self._skip_depth > 0:
            self._skip_depth -= 1

    def handle_data(self, data):
        if self._skip_depth == 0 and data.strip():
            self.chunks.append(data)


def _to_text_one_strict(html: bytes | str | None) -> str | None:
    if html is None:
        return None
    if isinstance(html, (bytes, bytearray, memoryview)):
        html = bytes(html).decode("utf-8", errors="replace")
    p = _TextExtractor()
    try:
        p.feed(html)
        p.close()
    except Exception:
        pass  # keep whatever was collected — determinism over completeness
    return _WS_RE.sub(" ", " ".join(p.chunks)).strip()


_SKIP_BLOCK_RE = re.compile(
    r"<(script|style|noscript|template)\b[^>]*>.*?</\1\s*>", re.S | re.I
)
_COMMENT_RE = re.compile(r"<!--.*?-->", re.S)
_TAG_RE = re.compile(r"<[^>]*>")


def _to_text_one(html_s: bytes | str | None) -> str | None:
    if html_s is None:
        return None
    if isinstance(html_s, (bytes, bytearray, memoryview)):
        html_s = bytes(html_s).decode("utf-8", errors="replace")
    import html as _html

    s = _SKIP_BLOCK_RE.sub(" ", html_s)
    s = _COMMENT_RE.sub(" ", s)
    s = _TAG_RE.sub(" ", s)
    s = _html.unescape(s)
    return _WS_RE.sub(" ", s).strip()


@F.pandas_udf(T.StringType())
def html_to_text(html: pd.Series) -> pd.Series:
    """binary/string HTML → visible text, whitespace-collapsed.

    Reference analog: the blank-page validator's text extraction
    (``boxing/validators/blank_page.py:12-80``) and every field extractor's
    ``get_text()``. Byte-identical across replays by construction: pure
    regex + stdlib entity table, no library/locale/env dependence.
    (The hot path strips tags with compiled regexes — ~10× the throughput of
    the event-driven parser kept below as ``html_to_text_strict``.)
    """
    return html.map(_to_text_one)


@F.pandas_udf(T.StringType())
def html_to_text_strict(html: pd.Series) -> pd.Series:
    """Event-parser variant (stdlib HTMLParser): handles pathological markup
    (unclosed scripts, tags inside attributes) more faithfully; slower."""
    return html.map(_to_text_one_strict)


# ---------------------------------------------------------------------------
# Wide-struct field extraction (parse once, emit many fields)
# ---------------------------------------------------------------------------

PAGE_FIELDS_SCHEMA = T.StructType(
    [
        T.StructField("title", T.StringType()),
        T.StructField("name", T.StringType()),
        T.StructField("status", T.StringType()),
        T.StructField("division", T.StringType()),
        T.StructField("opponent_name", T.StringType()),
        T.StructField("opponent_id", T.StringType()),
        T.StructField("bout_date", T.StringType()),
        T.StructField("result", T.StringType()),
        T.StructField("lang_attr", T.StringType()),
        T.StructField("n_tables", T.IntegerType()),
        T.StructField("text_len", T.IntegerType()),
        # profile families mirrored from the reference's per-field extractors
        T.StructField("birth_date", T.StringType()),
        T.StructField("gender", T.StringType()),
        T.StructField("nationality", T.StringType()),
        T.StructField("stance", T.StringType()),
        T.StructField("height_cm", T.IntegerType()),
        T.StructField("nicknames", T.ArrayType(T.StringType())),
        T.StructField("pro_wins", T.IntegerType()),
        T.StructField("pro_losses", T.IntegerType()),
        T.StructField("pro_draws", T.IntegerType()),
    ]
)

_TITLE_RE = re.compile(r"<title>\s*(?:BoxRec:\s*)?(.*?)\s*</title>", re.S)
_H1_RE = re.compile(r"<h1[^>]*>(.*?)</h1>", re.S)
_ROW_RE = re.compile(r"<tr>\s*<td>\s*([^<]*?)\s*</td>\s*<td>\s*([^<]*?)\s*</td>", re.S)
_PERSON_RE = re.compile(r'<a class="personLink" href="/box-pro/(\d+)"[^>]*>(.*?)</a>', re.S)
_RESULT_RE = re.compile(r'class="boutResult"[^>]*>\s*([A-Z]{1,2})\s*<', re.S)
_DATE_RE = re.compile(r"<td>(\d{4}-\d{2}-\d{2})</td>")
_LANGATTR_RE = re.compile(r'lang="([a-z]{2})"')
_TABLE_RE = re.compile(r"<table\b")


def _fields_one(html: bytes | str | None) -> dict:
    out = dict.fromkeys([f.name for f in PAGE_FIELDS_SCHEMA.fields])
    if html is None:
        return out
    if isinstance(html, (bytes, bytearray, memoryview)):
        html = bytes(html).decode("utf-8", errors="replace")
    # parse/scan once, extract many — same amortization as the reference's
    # single BeautifulSoup parse shared by 36 extractors.
    m = _TITLE_RE.search(html)
    out["title"] = m.group(1) if m else None
    # name: title (BoxRec:-stripped) FIRST, h1 text as fallback — the
    # reference's chain order (name.py: title → h1 → og:title); h1 content
    # is tag-stripped so nested markup never leaks into the value.
    h1 = _H1_RE.search(html)
    h1_text = _TAG_RE.sub(" ", h1.group(1)).strip() if h1 else None
    out["name"] = out["title"] or h1_text or None
    labels: dict[str, str] = {}
    for label, value in _ROW_RE.findall(html):  # ONE row scan for all fields
        labels.setdefault(label.strip().lower(), value.strip())
    if "status" in labels:
        out["status"] = "active" if "active" in labels["status"].lower() else "inactive"
    if "division" in labels:
        out["division"] = labels["division"]
    m = _PERSON_RE.search(html)
    if m:
        out["opponent_id"], out["opponent_name"] = m.group(1), m.group(2).strip()
    m = _RESULT_RE.search(html)
    out["result"] = m.group(1) if m else None
    m = _DATE_RE.search(html)
    out["bout_date"] = m.group(1) if m else None
    m = _LANGATTR_RE.search(html)
    out["lang_attr"] = m.group(1) if m else None
    out["n_tables"] = len(_TABLE_RE.findall(html))
    out["text_len"] = len(_to_text_one(html) or "")
    _profile_fields(html, out, labels)
    return out


_AGE_SUFFIX_RE = re.compile(r"\s*\(.*?\)\s*$")
_WLD_CELLS_RE = re.compile(
    r'class="bgW"[^>]*>\s*(\d+)\s*<.*?class="bgL"[^>]*>\s*(\d+)\s*<.*?'
    r'class="bgD"[^>]*>\s*(\d+)\s*<',
    re.S,
)


def _profile_fields(html: str, out: dict, labels: dict[str, str]) -> None:
    """Label-row profile families, mirroring the reference's per-field
    extractors (``boxing/extract/page/boxer/fields/*.py``):

    - ``birth_date``: label row, '(age)' suffix stripped (``birth_date.py``);
    - ``gender``: sex/gender row, **defaults to 'M' when absent**
      (``gender.py:23-24`` — the reference's documented quirk);
    - ``nationality``/``stance``: label rows;
    - ``height_cm``: explicit NNNcm match preferred, else ft'in" converted
      ``int((ft*12+in)*2.54)`` (``height.py:7-31``);
    - ``nicknames``: comma-split list (``nicknames.py:17-22``);
    - ``pro_wins/losses/draws``: profileWLD class-tagged cells, **0 not NULL
      when the table is present but a cell is missing** (``wins_pro.py:33``).
    """
    bd = labels.get("born") or labels.get("birth date") or labels.get("date of birth")
    if bd:
        bd = _AGE_SUFFIX_RE.sub("", bd)
        m = _ANYDATE_RE.search(bd)
        out["birth_date"] = m.group(1) if m else bd or None
    sex = labels.get("sex") or labels.get("gender")
    out["gender"] = (
        "M" if sex is None else ("F" if sex.lower().startswith("f") else "M")
    )
    out["nationality"] = labels.get("nationality")
    st = labels.get("stance")
    out["stance"] = st.lower() if st else None
    height = labels.get("height")
    if height:
        m = re.search(r"(\d+)\s*cm", height)
        if m:
            out["height_cm"] = int(m.group(1))
        else:
            m = re.search(r"(\d+)\s*(?:ft|′|')\s*(\d+)?", height)
            if m:
                ft, inch = int(m.group(1)), int(m.group(2) or 0)
                out["height_cm"] = int((ft * 12 + inch) * 2.54)
    nick = labels.get("alias") or labels.get("nickname") or labels.get("nicknames")
    if nick:
        out["nicknames"] = [n.strip() for n in nick.split(",") if n.strip()]
    if 'class="profileWLD"' in html:
        m = _WLD_CELLS_RE.search(html)
        w, l, d = m.groups() if m else ("0", "0", "0")
        out["pro_wins"], out["pro_losses"], out["pro_draws"] = int(w), int(l), int(d)


@F.pandas_udf(PAGE_FIELDS_SCHEMA)
def extract_page_fields(html: pd.Series) -> pd.DataFrame:
    """One Arrow batch of pages in → wide struct of extracted fields out.

    Spark-native form of ``ExtractionOrchestrator.extract_all``
    (``boxing/extract/orchestrator.py:67-99``): per-field failures yield NULL
    for that field only, never fail the row.
    """
    rows = html.map(_fields_one)
    return pd.DataFrame(list(rows))


# ---------------------------------------------------------------------------
# Bout-history UDTF analog: one page in → N bout structs out (+ explode)
# ---------------------------------------------------------------------------

BOUT_SCHEMA = T.ArrayType(
    T.StructType(
        [
            T.StructField("bout_date", T.StringType()),
            T.StructField("opponent_name", T.StringType()),
            T.StructField("opponent_id", T.StringType()),
            T.StructField("opponent_record", T.StringType()),
            T.StructField("venue", T.StringType()),
            T.StructField("result", T.StringType()),
            T.StructField("result_method", T.StringType()),
            T.StructField("result_round", T.IntegerType()),
            T.StructField("event_id", T.StringType()),
        ]
    )
)

_DATATABLE_RE = re.compile(r'<table class="dataTable"[^>]*>(.*?)</table>', re.S)
_TR_RE = re.compile(r"<tr[^>]*>(.*?)</tr>", re.S)
_TD_RE = re.compile(r"<td[^>]*>(.*?)</td>", re.S)
_COLSPAN_RE = re.compile(r"<td[^>]*colspan", re.I)
_ANYDATE_RE = re.compile(r"(\d{4}-\d{2}-\d{2})")
_WLD_RE = re.compile(
    r'class="textWon"[^>]*>(\d+)<.*?class="textLost"[^>]*>(\d+)<.*?class="textDraw"[^>]*>(\d+)<',
    re.S,
)
_BOUTRESULT_RE = re.compile(r'class="boutResult"[^>]*>\s*([^<]*?)\s*<', re.S)
_EVENT_RE = re.compile(r'href="/event/(\d+)')

#: boutResult text → (result code, method) — reference
#: boxing/extract/page/boxer/fields/bouts.py:81-116
_RESULT_CODES = {"W": "W", "L": "L", "D": "D", "NC": "NC"}
_METHODS = ["TKO", "KO", "RTD", "DQ", "UD", "MD", "SD", "PTS", "decision"]


def _bouts_one(html: bytes | str | None) -> list[dict]:
    """Reference bouts extractor (``bouts.py:7-146``) semantics:
    skip header/colspan-note/short rows; date from cell 0; opponent from the
    ``personLink`` anchor; W-L-D record from text spans; venue cell 5; result
    code + method + trailing round from the ``boutResult`` cell; event id from
    the event link. Keep only rows with a date AND an opponent."""
    if html is None:
        return []
    if isinstance(html, (bytes, bytearray, memoryview)):
        html = bytes(html).decode("utf-8", errors="replace")
    out: list[dict] = []
    for tbl in _DATATABLE_RE.findall(html):
        for row in _TR_RE.findall(tbl):
            if "<th" in row or _COLSPAN_RE.search(row):
                continue  # header / note rows
            cells = _TD_RE.findall(row)
            if not cells:
                continue
            b: dict = {f.name: None for f in BOUT_SCHEMA.elementType.fields}
            m = _ANYDATE_RE.search(cells[0])
            b["bout_date"] = m.group(1) if m else None
            m = _PERSON_RE.search(row)
            if m:
                b["opponent_id"], b["opponent_name"] = m.group(1), m.group(2).strip()
            m = _WLD_RE.search(row)
            if m:
                b["opponent_record"] = "-".join(m.groups())
            if len(cells) >= 6:
                venue = _TAG_RE.sub(" ", cells[5]).strip()
                b["venue"] = venue or None
            m = _BOUTRESULT_RE.search(row)
            if m:
                raw = m.group(1).strip()
                head = raw.split()[0].upper() if raw.split() else ""
                b["result"] = _RESULT_CODES.get(head)
                for meth in _METHODS:
                    if meth.lower() in raw.lower():
                        b["result_method"] = meth
                        break
                tail = re.search(r"(\d+)\s*$", raw)
                if tail:
                    b["result_round"] = int(tail.group(1))
            m = _EVENT_RE.search(row)
            b["event_id"] = m.group(1) if m else None
            if b["bout_date"] and b["opponent_name"]:
                out.append(b)
    return out


#: extractor-name → staging-column rename map, pinned by the reference's
#: contract test (``boxing/tests/load/test_to_staging_mirror_db.py:9-79``:
#: ``opponent_name→opponent``, ``venue→location``).
BOUT_STAGING_RENAMES = {"opponent_name": "opponent", "venue": "location"}


def bouts_to_staging(bouts: Column) -> Column:
    """Rename bout-struct fields to their staging names (the reference's
    loader field map) without leaving the array — one `transform`."""
    fields = [f.name for f in BOUT_SCHEMA.elementType.fields]
    return F.transform(
        bouts,
        lambda b: F.struct(
            *[b[f].alias(BOUT_STAGING_RENAMES.get(f, f)) for f in fields]
        ),
    )


@F.pandas_udf(BOUT_SCHEMA)
def extract_bouts(html: pd.Series) -> pd.Series:
    """Vectorized UDTF analog: page → array of bout structs; pair with
    ``posexplode`` for (bout index, struct) rows — the reference's 1→N
    ``bouts`` extractor plus ``generate_unique_bout_id`` positional index
    (``boxing/load/to_staging_mirror_db.py:81-83``)."""
    return html.map(_bouts_one)


# ---------------------------------------------------------------------------
# Validation predicates (P2-P6) — JVM-side where possible
# ---------------------------------------------------------------------------

ERROR_INDICATORS = ["404 Not Found", "Page Not Found", "Error 404", "Not Found"]
LOGIN_INDICATORS = ["BoxRec: Login", "Please login", "Sign in to continue"]
RATELIMIT_INDICATORS = ["too many requests", "rate limit", "slow down"]


def validation_reason(html_text: Column, min_bytes: int = 1000) -> Column:
    """First-failure-wins quarantine reason; NULL = page is valid.

    Spark-native form of the short-circuit validator chain
    (``boxing/run_validators.py:39-76``): a single chained CASE expression —
    cheap predicates first — evaluated JVM-side, no Python.
    """
    def _contains_any(col: Column, needles: list[str], lower: bool = False) -> Column:
        src = F.lower(col) if lower else col
        cond = F.lit(False)
        for n in needles:
            cond = cond | src.contains(n.lower() if lower else n)
        return cond

    return (
        F.when(F.length(html_text) < min_bytes, F.lit("too_small"))
        .when(_contains_any(html_text, ERROR_INDICATORS), F.lit("error_page"))
        .when(_contains_any(html_text, LOGIN_INDICATORS), F.lit("login_page"))
        .when(_contains_any(html_text, RATELIMIT_INDICATORS, lower=True), F.lit("rate_limited"))
        .otherwise(F.lit(None).cast("string"))
    )
