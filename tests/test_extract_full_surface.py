"""Goldens for the full §2.9 extraction surface — the reference's 36-field
orchestrator output (``boxing/extract/page/boxer/fields/*.py``), the extended
bout sub-fields (``bouts.py:60-140``), the URL harvesters
(``urls/bout_urls.py``, ``urls/opponent_urls.py``), and the P5/P6/P7
validator tail (``validators/blank_page.py``, ``page/boxer.py``,
``boxrec_url.py``)."""

import pytest
from pyspark.sql import functions as F

from data_pipelines_spark.extract.html import (
    bouts_to_staging_json,
    extract_bouts,
    extract_page_fields,
    harvest_new_urls,
    harvest_urls,
    page_validation_reason,
)

FULL_PROFILE = """
<html><head><title>BoxRec: Iron Fist</title></head><body>
<img class="photoBorder" src="/images/blank_avatar.png">
<img class="profileBoxerPicture" src="/images/boxer/7712.jpg">
<table class="profileTable">
<tr><td>birth name</td><td>Ferrous Fist III</td></tr>
<tr><td>born</td><td>1988-02-29 (age 37)</td></tr>
<tr><td>birth place</td><td>Columbus,   Ohio, USA</td></tr>
<tr><td>residence</td><td>Las Vegas, Nevada, USA</td></tr>
<tr><td>sex</td><td>male</td></tr>
<tr><td>nationality</td><td>USA</td></tr>
<tr><td>height</td><td>6' 2"</td></tr>
<tr><td>reach</td><td>72&quot;</td></tr>
<tr><td>stance</td><td>Orthodox</td></tr>
<tr><td>debut</td><td>15/03/2006</td></tr>
<tr><td>amateur debut</td><td>March 15, 2001</td></tr>
<tr><td>division</td><td>heavyweight</td></tr>
<tr><td>amateur division</td><td>light heavyweight</td></tr>
<tr><td>status</td><td>active</td></tr>
<tr><td>amateur status</td><td>retired</td></tr>
<tr><td>rounds</td><td>214</td></tr>
<tr><td>promoter</td><td>Top Rank, Golden Boy</td></tr>
<tr><td>trainer</td><td>Freddie Roach</td></tr>
<tr><td>manager</td><td>Al Haymon, James Prince</td></tr>
<tr><td>gym</td><td>Wild Card Gym</td></tr>
<tr><td>amateur record</td><td>84-6-2 (40 KOs)</td></tr>
<tr><td>alias</td><td>Iron, The Fist</td></tr>
</table>
<table class="profileWLD">
<tr><td class="bgW">30</td><td class="bgL">2</td><td class="bgD">1</td></tr>
<tr><td>25 KOs</td><td>1 KOs</td><td></td></tr>
</table>
<p>padding body text for the validators to find enough content here</p>
</body></html>
"""

REACH_CM_PAGE = """
<html><body><table class="profileTable">
<tr><td>reach</td><td>183cm</td></tr>
<tr><td>height</td><td>180 cm</td></tr>
</table></body></html>
"""

WLD_POSITIONAL = """
<html><body><table class="profileWLD">
<tr><td>12</td><td>3</td><td>0</td></tr>
</table></body></html>
"""

BOUTS_RICH = """
<html><body><table class="dataTable">
<tr><th>date</th></tr>
<tr>
  <td>2024-03-15</td>
  <td><span class="textWeight">147 lbs</span></td>
  <td><a class="personLink" href="/en/box-pro/628407?allSports=y">Conor McGregor</a>
      <span class="textWon">22</span><span class="textLost">4</span>
      <span class="textDraw">1</span></td>
  <td></td>
  <td><img src="/i/l6w.png"><img src="/i/l6w.png"><img src="/i/l6l.png"></td>
  <td>Madison Square Garden</td>
  <td class="boutResult">W TKO 3</td>
  <td><i class="fas fa-star"></i><i class="fas fa-star"></i></td>
  <td><a href="/en/event/77777">event</a>
      <a href="/en/event/77777/888">bout</a>
      <a href="/en/scorecards/888">cards</a>
      <a href="/en/title/wba-world">WBA World Title</a></td>
</tr>
<tr><td colspan="9">referee: Kenny Bayless | judge: Dave Moretti 115-113 | judge: Burt Clements 116-112</td></tr>
</table></body></html>
"""

BLANK_PAGE = (
    "<html><head><title>BoxRec</title></head><body>"
    '<div class="header">BoxRec</div><div class="content"></div>'
    "</body></html>" + " " * 1000
)

MAINTENANCE_PAGE = (
    "<html><body><main>This site is under maintenance, check back soon. "
    + ("filler text to get past the length gates " * 30)
    + "</main></body></html>"
)

NON_BOXER_PAGE = (
    "<html><body><main>"
    + ("a perfectly fine page about something else entirely " * 30)
    + "</main></body></html>"
)

VALID_BOXER_PAGE = (
    '<html><body><main><table class="profileTable"><tr><td>status</td>'
    "<td>active</td></tr></table>"
    + ("long enough body content about this particular boxer " * 30)
    + "</main></body></html>"
)


@pytest.fixture(scope="module")
def profile_row(spark):
    df = spark.createDataFrame([(1, FULL_PROFILE.encode())], "id int, html binary")
    return (
        df.select(extract_page_fields(F.col("html")).alias("f"))
        .select("f.*")
        .collect()[0]
    )


def test_identity_fields(profile_row):
    r = profile_row
    assert r.name == "Iron Fist"
    assert r.birth_name == "Ferrous Fist III"
    assert r.birth_date == "1988-02-29"
    assert r.birth_place == "Columbus, Ohio, USA"  # whitespace collapsed
    assert r.residence == "Las Vegas, Nevada, USA"
    assert r.gender == "M"
    assert r.nationality == "USA"
    assert r.nicknames == ["Iron", "The Fist"]
    assert r.avatar_image == "https://boxrec.com/images/boxer/7712.jpg"  # blank skipped


def test_physique_fields(profile_row):
    r = profile_row
    assert r.height_cm == int((6 * 12 + 2) * 2.54)  # 187
    assert r.reach_cm == int(72 * 2.54)  # 182 — bare inches converted
    assert r.stance == "orthodox"


def test_career_fields(profile_row):
    r = profile_row
    assert r.debut_date_pro == "2006-03-15"  # %d/%m/%Y parsed
    assert r.debut_date_amateur == "2001-03-15"  # %B %d, %Y parsed
    assert r.division == "heavyweight"
    assert r.division_amateur == "light heavyweight"
    assert r.status == "active"
    assert r.status_amateur == "inactive"  # 'retired' maps to inactive
    assert r.rounds_pro == 214 and r.rounds_amateur == 214
    assert r.promoters == ["Top Rank", "Golden Boy"]
    assert r.trainers == ["Freddie Roach"]
    assert r.managers == ["Al Haymon", "James Prince"]
    assert r.gym == "Wild Card Gym"


def test_record_fields(profile_row):
    r = profile_row
    assert (r.pro_wins, r.pro_losses, r.pro_draws) == (30, 2, 1)
    assert (r.pro_ko_wins, r.pro_ko_losses) == (25, 1)
    assert (r.am_wins, r.am_losses, r.am_draws) == (84, 6, 2)
    assert r.am_ko_wins == 40 and r.am_ko_losses is None


def test_reach_cm_preferred_and_wld_positional(spark):
    df = spark.createDataFrame(
        [(1, REACH_CM_PAGE.encode()), (2, WLD_POSITIONAL.encode())],
        "id int, html binary",
    )
    rows = {
        r.id: r
        for r in df.select("id", extract_page_fields(F.col("html")).alias("f"))
        .select("id", "f.*")
        .collect()
    }
    assert rows[1].reach_cm == 183 and rows[1].height_cm == 180
    # positional fallback when cells carry no bgW/bgL/bgD classes
    assert (rows[2].pro_wins, rows[2].pro_losses, rows[2].pro_draws) == (12, 3, 0)
    # pro W/L/D are 0 (not NULL) without a profileWLD table — wins_pro.py:33
    assert (rows[1].pro_wins, rows[1].pro_losses, rows[1].pro_draws) == (0, 0, 0)
    assert (rows[1].pro_ko_wins, rows[1].pro_ko_losses) == (0, 0)
    # status_amateur inferred inactive when the boxer has pro fights
    assert rows[2].status_amateur == "inactive" and rows[1].status_amateur is None


def test_bout_subfields(spark):
    b = (
        spark.createDataFrame([(1, BOUTS_RICH.encode())], "id int, html binary")
        .select(F.explode(extract_bouts(F.col("html"))).alias("b"))
        .select("b.*")
        .collect()[0]
    )
    assert b.opponent_url == "https://boxrec.com/en/box-pro/628407?allSports=y"
    assert b.opponent_weight == "147 lbs"
    assert b.recent_form == "WWL"
    assert b.rating == 2
    assert b.event_id == "77777"
    assert b.event_link == "https://boxrec.com/en/event/77777"
    assert b.bout_ref_id == "888"
    assert b.bout_link == "https://boxrec.com/en/event/77777/888"
    assert b.scorecards_link == "https://boxrec.com/en/scorecards/888"
    assert b.titles == ["WBA World Title"]
    assert b.referee_name == "Kenny Bayless"
    assert [(j.name, j.score) for j in b.judges] == [
        ("Dave Moretti", "115-113"),
        ("Burt Clements", "116-112"),
    ]


def test_bouts_staging_json_flatten(spark):
    """The loader's 22-field camelCase bout objects with judge flattening,
    positional boutId, and titleFight (``to_staging_mirror_db.py:86-121``)."""
    row = (
        spark.createDataFrame([("007", BOUTS_RICH.encode())], "bid string, html binary")
        .select(
            F.explode(
                bouts_to_staging_json(F.col("bid"), extract_bouts(F.col("html")))
            ).alias("b")
        )
        .select("b.*")
        .collect()[0]
    )
    assert row.boxerId == "007" and row.boutId == "7_bout_0"  # id normalized
    assert row.boxrecId == "888" and row.boutDate == "2024-03-15"
    assert row.opponentName == "Conor McGregor"
    assert row.opponentWeight == "147 lbs"
    assert row.eventName == "Madison Square Garden"
    assert row.refereeName == "Kenny Bayless"
    assert (row.judge1Name, row.judge1Score) == ("Dave Moretti", "115-113")
    assert (row.judge2Name, row.judge2Score) == ("Burt Clements", "116-112")
    assert row.judge3Name is None and row.judge3Score is None
    assert (row.result, row.resultMethod, row.resultRound) == ("W", "TKO", 3)
    assert row.eventPageLink == "https://boxrec.com/en/event/77777"
    assert row.boutPageLink == "https://boxrec.com/en/event/77777/888"
    assert row.scorecardsPageLink == "https://boxrec.com/en/scorecards/888"
    assert row.titleFight is True


def test_url_harvest_and_seen_set(spark):
    df = spark.createDataFrame([(1, BOUTS_RICH.encode())], "id int, html binary")
    h = df.select(harvest_urls(F.col("html")).alias("h")).select("h.*").collect()[0]
    assert h.event_urls == [
        "https://boxrec.com/en/event/77777",
        "https://boxrec.com/en/event/77777/888",
    ]
    assert h.opponent_urls == ["https://boxrec.com/en/box-pro/628407?allSports=y"]
    # J7: anti-join against the seen set leaves only new work
    seen = spark.createDataFrame(
        [("https://boxrec.com/en/box-pro/628407?allSports=y",)], "url string"
    )
    fresh = harvest_new_urls(df, seen, url_kind="opponent_urls").collect()
    assert fresh == []
    fresh_events = harvest_new_urls(df, seen, url_kind="event_urls").count()
    assert fresh_events == 2


def test_page_validation_chain(spark):
    cases = [
        (1, "x" * 10, "https://boxrec.com/en/box-pro/1"),  # too_small
        (2, "404 Not Found " + "x" * 2000, "https://boxrec.com/en/box-pro/1"),
        (3, "BoxRec: Login " + "x" * 2000, "https://boxrec.com/en/box-pro/1"),
        (4, "Too many requests " + "x" * 2000, "https://boxrec.com/en/box-pro/1"),
        (5, VALID_BOXER_PAGE, "https://evil.example.com/en/box-pro/1"),  # bad_url
        (6, BLANK_PAGE, "https://boxrec.com/en/box-pro/1"),
        (7, MAINTENANCE_PAGE, "https://boxrec.com/en/box-pro/1"),
        (8, NON_BOXER_PAGE, "https://boxrec.com/en/box-pro/1"),
        (9, VALID_BOXER_PAGE, "https://boxrec.com/en/box-pro/1"),  # valid
        (10, VALID_BOXER_PAGE, "https://boxrec.com/"),  # root path → bad_url
    ]
    df = spark.createDataFrame(cases, "id int, html string, url string")
    got = {
        r.id: r.reason
        for r in df.select(
            "id",
            page_validation_reason(F.col("html"), F.col("url")).alias("reason"),
        ).collect()
    }
    assert got[1] == "too_small"
    assert got[2] == "error_page"
    assert got[3] == "login_page"
    assert got[4] == "rate_limited"
    assert got[5] == "bad_url"
    # reference order: total-text length (<50) trips before the body check
    assert got[6] == "blank_minimal"
    assert got[7] == "maintenance"
    assert got[8] == "not_boxer_page"
    assert got[9] is None
    assert got[10] == "bad_url"


def test_note_row_not_attached_across_rejected_bout(spark):
    """A note row following a REJECTED bout row must not attach its
    referee/judges to an earlier unrelated bout."""
    page = """
    <html><body><table class="dataTable">
    <tr><td>2024-01-10</td><td></td>
        <td><a class="personLink" href="/en/box-pro/1">Opp A</a></td>
        <td></td><td></td><td>Arena</td><td class="boutResult">W</td></tr>
    <tr><td>no parseable date</td><td></td><td>no opponent link</td>
        <td></td><td></td><td>X</td><td class="boutResult">L</td></tr>
    <tr><td colspan="7">referee: Wrong Guy | judge: Nope 1-0</td></tr>
    </table></body></html>
    """
    b = (
        spark.createDataFrame([(1, page.encode())], "id int, html binary")
        .select(F.explode(extract_bouts(F.col("html"))).alias("b"))
        .select("b.*")
        .collect()
    )
    assert len(b) == 1
    assert b[0].referee_name is None and b[0].judges == []


def test_merge_competition_levels(spark):
    """§3.1 merge semantics: amateur-owned fields come from the amateur
    page when present; everything else from the pro page; flag set."""
    from data_pipelines_spark.extract.html import (
        extract_page_fields,
        merge_competition_levels,
    )

    am_page = """
    <html><head><title>BoxRec: Iron Fist</title></head><body>
    <table class="profileTable">
    <tr><td>amateur division</td><td>featherweight</td></tr>
    <tr><td>amateur record</td><td>10-2-1 (5 KOs)</td></tr>
    <tr><td>amateur status</td><td>inactive</td></tr>
    </table></body></html>
    """
    rows = spark.createDataFrame(
        [
            (1, "professional", FULL_PROFILE.encode()),
            (1, "amateur", am_page.encode()),
            (2, "professional", FULL_PROFILE.encode()),
        ],
        "boxer_id int, level string, html binary",
    ).select(
        "boxer_id", "level", extract_page_fields(F.col("html")).alias("fields")
    )
    got = {
        r.boxer_id: r
        for r in merge_competition_levels(rows).collect()
    }
    r1, r2 = got[1], got[2]
    assert r1.has_amateur_record and not r2.has_amateur_record
    # amateur page wins the amateur family
    assert r1.record.division_amateur == "featherweight"
    assert (r1.record.am_wins, r1.record.am_losses, r1.record.am_draws) == (10, 2, 1)
    assert r1.record.am_ko_wins == 5
    # pro page still owns everything else
    assert r1.record.name == "Iron Fist" and r1.record.pro_wins == 30
    # no amateur page: pro page's own amateur extractions stand
    assert r2.record.division_amateur == "light heavyweight"
    assert r2.record.am_wins == 84


def test_merge_competition_levels_reference_mode(spark):
    """mode='reference' reproduces the literal ``pro_data.update(
    amateur_data)``: every field the amateur page extracted non-NULL
    overwrites the pro value — including pro-owned ones like ``name`` —
    while NULL amateur extractions leave the pro value standing (the
    orchestrator drops None before the update)."""
    import pytest

    from data_pipelines_spark.extract.html import (
        extract_page_fields,
        merge_competition_levels,
    )

    am_page = """
    <html><head><title>BoxRec: Amateur Alias</title></head><body>
    <table class="profileTable">
    <tr><td>amateur division</td><td>featherweight</td></tr>
    </table></body></html>
    """
    rows = spark.createDataFrame(
        [(1, "professional", FULL_PROFILE.encode()), (1, "amateur", am_page.encode())],
        "boxer_id int, level string, html binary",
    ).select(
        "boxer_id", "level", extract_page_fields(F.col("html")).alias("fields")
    )
    default = merge_competition_levels(rows).collect()[0]
    ref = merge_competition_levels(rows, mode="reference").collect()[0]
    # default: pro page owns name; reference: amateur extraction wins it
    assert default.record.name == "Iron Fist"
    assert ref.record.name == "Amateur Alias"
    # the reference's wins_pro extractor returns 0 (not None) on a page
    # with no WLD table (wins_pro.py:33), so the literal update CLOBBERS
    # the pro record's 30 with the amateur page's 0 — bug-for-bug fidelity
    # is exactly what mode='reference' is for; the default mode keeps 30
    assert default.record.pro_wins == 30 and ref.record.pro_wins == 0
    # genuinely-None amateur extractions never clobber (orchestrator drops
    # None keys before the update): residence stands from the pro page
    assert ref.record.residence == default.record.residence is not None
    assert ref.record.division_amateur == "featherweight"

    with pytest.raises(ValueError, match="mode"):
        merge_competition_levels(rows, mode="bogus").collect()


def test_build_staging_records_end_to_end(spark):
    """§3.1 composed: URL-keyed pro+amateur pages → the 40-column camelCase
    staging shape with merged record, derived totals, slug, nested bouts."""
    from data_pipelines_spark.extract.html import build_staging_records

    pro_with_bouts = FULL_PROFILE.replace(
        "</body></html>",
        BOUTS_RICH.split("<html><body>")[1].split("</body></html>")[0]
        + "</body></html>",
    )
    pages = spark.createDataFrame(
        [
            ("https://boxrec.com/en/box-pro/000777", pro_with_bouts.encode()),
            ("https://boxrec.com/en/box-am/000777", FULL_PROFILE.encode()),
            ("https://boxrec.com/en/box-pro/42", FULL_PROFILE.encode()),
        ],
        "url string, html binary",
    )
    got = {r.boxrecId: r for r in build_staging_records(pages).collect()}
    r = got["777"]  # leading zeros normalized (F3)
    assert r.slug == "iron-fist" and r.name == "Iron Fist"
    assert r.proWins == 30 and r.proTotalBouts == 33  # 30+2+1, NULL-guarded
    assert r.amateurTotalBouts == 84 + 6 + 2
    assert r.hasAmateurRecord is True
    assert len(r.bouts) == 1
    b = r.bouts[0]
    assert b.boxerId == "777" and b.boutId == "777_bout_0"
    assert b.opponentName == "Conor McGregor" and b.titleFight is True
    r2 = got["42"]
    assert r2.hasAmateurRecord is False and r2.proTotalBouts == 33
