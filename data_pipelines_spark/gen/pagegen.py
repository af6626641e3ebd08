"""Deterministic synthetic BoxRec-shaped pages from the ``documents`` table.

Every value on the page is a pure function of ``doc_id`` (JVM Column
arithmetic — no Python, no randomness), so a DuckDB oracle can predict the
extractor's exact output per row from the same arithmetic. This gives the
§2.9 extraction surface real CORRECTNESS rows: the pandas-UDF extractors run
on the Spark side, the oracle recomputes the ground truth the page encodes.

Page structure mirrors the reference's fixtures
(``boxing/tests/extract/page/boxer/fields/test_bouts.py:16-51`` inline
dataTable snippets): profileTable label rows, profileWLD record table,
dataTable bout rows, personLink/event/title anchors.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _s(x) -> Column:
    return x.cast("string")


def _tr(label: str, value: Column) -> Column:
    return F.concat(
        F.lit(f"<tr><td>{label}</td><td>"), value, F.lit("</td></tr>")
    )


def _tr_if(cond: Column, label: str, value: Column) -> Column:
    return F.when(cond, _tr(label, value)).otherwise(F.lit(""))


def profile_page(i: Column) -> Column:
    """Full 36-field profile page; see x1's oracle for the predicted values."""
    s = _s(i)
    born = F.concat(
        _s(1970 + i % 30), F.lit("-0"), _s(1 + i % 9), F.lit("-"), _s(10 + i % 10)
    )
    height = F.when(i % 2 == 0, F.concat(_s(150 + i % 50), F.lit("cm"))).otherwise(
        F.concat(F.lit("5' "), _s(i % 12), F.lit('"'))
    )
    am = (i % 3) == 0
    avatar_src = F.when(i % 7 == 0, F.lit("/images/blank.png")).otherwise(
        F.concat(F.lit("/images/b/"), s, F.lit(".jpg"))
    )
    am_record = F.concat(
        _s(i % 90), F.lit("-"), _s(i % 9), F.lit("-"), _s(i % 4),
        F.lit(" ("), _s(i % 30), F.lit(" KOs)"),
    )
    return F.concat(
        F.lit("<html><head><title>BoxRec: Boxer "), s, F.lit("</title></head><body>"),
        F.lit('<img class="profileBoxerPicture" src="'), avatar_src, F.lit('">'),
        F.lit('<table class="profileTable">'),
        _tr("birth name", F.concat(F.lit("Alias "), s)),
        _tr("born", F.concat(born, F.lit(" (age 40)"))),
        _tr("birth place", F.concat(F.lit("City "), _s(i % 100))),
        _tr("residence", F.concat(F.lit("Town "), _s(i % 50))),
        _tr("sex", F.when(i % 5 == 0, F.lit("female")).otherwise(F.lit("male"))),
        _tr("nationality", F.lit("USA")),
        _tr("height", height),
        _tr("reach", F.concat(_s(160 + i % 40), F.lit("cm"))),
        _tr("stance", F.when(i % 2 == 0, F.lit("orthodox")).otherwise(F.lit("southpaw"))),
        _tr("debut", F.concat(F.lit("200"), _s(i % 10), F.lit("-06-15"))),
        _tr_if(am, "amateur debut", F.concat(F.lit("1999-03-0"), _s(1 + i % 9))),
        _tr("division", F.lit("heavyweight")),
        _tr_if(am, "amateur division", F.lit("middleweight")),
        _tr("status", F.when(i % 2 == 0, F.lit("active")).otherwise(F.lit("retired"))),
        _tr_if(am, "amateur status", F.lit("not active")),
        _tr("rounds", _s(i % 300)),
        _tr("promoter", F.lit("Top Rank, Golden Boy")),
        _tr_if((i % 2) == 0, "manager", F.lit("Al Haymon")),
        _tr("gym", F.concat(F.lit("Gym "), _s(i % 5))),
        _tr_if(am, "amateur record", am_record),
        F.lit("</table>"),
        F.lit('<table class="profileWLD"><tr><td class="bgW">'), _s(i % 60),
        F.lit('</td><td class="bgL">'), _s(i % 8),
        F.lit('</td><td class="bgD">'), _s(i % 5), F.lit("</td></tr><tr><td>"),
        _s(i % 40), F.lit(" KOs</td><td>"), _s(i % 6), F.lit(" KOs</td><td></td></tr></table>"),
        F.lit("<p>filler body content for the validators</p></body></html>"),
    )


def _bout_row(i: Column, j: int) -> Column:
    """One dataTable bout row for bout ordinal ``j`` (1-based)."""
    opp_id = 1000 + i * 3 + j
    form = (
        F.lit('<img src="/i/l6w.png"><img src="/i/l6l.png">')
        if j == 1
        else F.lit('<img src="/i/l6d.png">')
    )
    result = (
        F.lit(f"W TKO {j}") if j % 2 == 1 else F.lit("L UD 12")
    )
    title = (
        F.when(i % 5 == 0, F.lit('<a href="/en/title/wba">WBA Title</a>'))
        .otherwise(F.lit(""))
        if j == 1
        else F.lit("")
    )
    return F.concat(
        F.lit("<tr><td>202"), F.lit(str(j)), F.lit("-0"), _s(1 + i % 9), F.lit("-15</td>"),
        F.lit('<td><span class="textWeight">'), F.lit(str(140 + j)), F.lit(" lbs</span></td>"),
        F.lit('<td><a class="personLink" href="/en/box-pro/'), _s(opp_id), F.lit('">Opp '),
        _s(i), F.lit("-"), F.lit(str(j)), F.lit("</a>"),
        F.lit('<span class="textWon">'), _s(i % 30),
        F.lit('</span><span class="textLost">'), F.lit(str(j)),
        F.lit('</span><span class="textDraw">0</span></td>'),
        F.lit("<td></td><td>"), form, F.lit("</td>"),
        F.lit("<td>Arena "), _s(i % 20), F.lit("</td>"),
        F.lit('<td class="boutResult">'), result, F.lit("</td>"),
        F.lit("<td>"), F.lit('<i class="fas fa-star"></i>' * j), F.lit("</td>"),
        F.lit('<td><a href="/en/event/'), _s(5000 + i), F.lit('">e</a>'),
        F.lit('<a href="/en/event/'), _s(5000 + i), F.lit("/"), F.lit(str(j)), F.lit('">b</a>'),
        title, F.lit("</td></tr>"),
    )


def bouts_page(i: Column, max_bouts: int = 2) -> Column:
    """dataTable page with ``doc_id % (max_bouts+1)`` bout rows (0..max)."""
    n = i % (max_bouts + 1)
    rows = [
        F.when(n >= j, _bout_row(i, j)).otherwise(F.lit(""))
        for j in range(1, max_bouts + 1)
    ]
    return F.concat(
        F.lit('<html><body><table class="dataTable"><tr><th>date</th></tr>'),
        *rows,
        F.lit("</table></body></html>"),
    )


# --- quarantine corpus: one constant defect page per doc_id % 10 branch ----

_VALID_BOXER = (
    '<html><body><main><table class="profileTable"><tr><td>status</td>'
    "<td>active</td></tr></table>"
    + "long enough body content about this particular boxer " * 30
    + "</main></body></html>"
)

QUARANTINE_PAGES = [
    "tiny",  # 0: too_small
    "<html><body><main>404 Not Found</main>" + "x" * 1200 + "</body></html>",  # 1
    "<html><body><main>BoxRec: Login</main>" + "x" * 1200 + "</body></html>",  # 2
    "<html><body><main>Too many requests</main>" + "x" * 1200 + "</body></html>",  # 3
    _VALID_BOXER,  # 4: page fine, URL bad
    "<html><head><title>T</title></head><body>"  # 5: blank_minimal
    + "<div></div>" * 150 + "</body></html>",
    "<html><body><main>under maintenance now "  # 6: maintenance
    + "pad " * 300 + "</main></body></html>",
    "<html><body>" + "<span>short bit here</span>" * 40  # 7: blank_no_content
    + "</body></html>",
    "<html><body><main>"  # 8: not_boxer_page
    + "all about other sports entirely " * 40 + "</main></body></html>",
    _VALID_BOXER,  # 9: valid
]

#: predicted first-failure reason per branch (NULL = valid); branch 4's
#: failure comes from the URL, not the page
QUARANTINE_REASONS = [
    "too_small", "error_page", "login_page", "rate_limited", "bad_url",
    "blank_minimal", "maintenance", "blank_no_content", "not_boxer_page", None,
]


def quarantine_page(i: Column) -> Column:
    return F.element_at(
        F.array(*[F.lit(p) for p in QUARANTINE_PAGES]), (i % 10).cast("int") + 1
    )


def quarantine_url(i: Column) -> Column:
    return F.when(
        i % 10 == 4, F.concat(F.lit("https://other.example.com/p/"), _s(i))
    ).otherwise(F.concat(F.lit("https://boxrec.com/en/box-pro/"), _s(i)))
