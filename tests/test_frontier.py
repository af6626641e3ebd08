"""Frontier scheduling: politeness invariants of schedule_fetches."""

import pytest
from pyspark.sql import functions as F

from data_pipelines_spark.operators.frontier import schedule_fetches


@pytest.fixture()
def frontier(spark):
    rows = [
        (f"https://{d}/p/{i}", d, pr)
        for d, n in [("a.com", 5), ("b.org", 3), ("c.net", 1)]
        for i, pr in zip(range(n), [3, 1, 2, 1, 3])
    ]
    return spark.createDataFrame(rows, "url string, domain string, priority int")


def test_one_worker_per_domain_and_dense_slots(spark, frontier):
    out = schedule_fetches(
        frontier, priority_col="priority", crawl_delay_s=2.0, n_workers=4
    ).collect()
    by_dom = {}
    for r in out:
        by_dom.setdefault(r.domain, []).append(r)
    for d, rs in by_dom.items():
        assert len({r.worker for r in rs}) == 1  # politeness: single owner
        slots = sorted(r.slot for r in rs)
        assert slots == list(range(len(rs)))  # dense queue positions
        # higher priority fetches earlier; ties broken by url
        ordered = sorted(rs, key=lambda r: r.slot)
        keys = [(-(r.priority or -1), r.url) for r in ordered]
        assert keys == sorted(keys)
        for r in rs:
            assert r.fetch_offset_s == pytest.approx(2.0 * r.slot)


def test_dispatch_pos_orders_each_worker_queue(spark, frontier):
    out = schedule_fetches(frontier, crawl_delay_s=1.0, n_workers=2).collect()
    by_worker = {}
    for r in out:
        by_worker.setdefault(r.worker, []).append(r)
    for w, rs in by_worker.items():
        rs.sort(key=lambda r: r.dispatch_pos)
        assert [r.dispatch_pos for r in rs] == list(range(1, len(rs) + 1))
        offs = [(r.fetch_offset_s, r.domain, r.url) for r in rs]
        assert offs == sorted(offs)  # earliest-due dispatched first


def test_per_domain_crawl_delay_column(spark):
    df = spark.createDataFrame(
        [("u1", "a.com", 0.5), ("u2", "a.com", 0.5), ("u3", "b.org", 3.0)],
        "url string, domain string, delay double",
    )
    out = {
        r.url: r.fetch_offset_s
        for r in schedule_fetches(df, crawl_delay_s="delay", n_workers=4).collect()
    }
    assert out == {"u1": 0.0, "u2": 0.5, "u3": 0.0}


def test_prefix_sum_dispatch_matches_window(spark, frontier):
    """prefix_sum_dispatch=True yields IDENTICAL positions to the default
    per-worker window, with no Window partitioned by worker alone in the
    plan (the per-worker single-task sort is the edge it removes)."""
    kw = dict(priority_col="priority", crawl_delay_s=2.0, n_workers=2)
    base = schedule_fetches(frontier, **kw)
    ps = schedule_fetches(
        frontier, prefix_sum_dispatch=True, dispatch_bins=4, **kw
    )
    key = lambda r: (r.worker, r.dispatch_pos, r.url, r.slot)  # noqa: E731
    assert sorted(map(key, ps.collect())) == sorted(map(key, base.collect()))
    plan = ps._jdf.queryExecution().executedPlan().toString()
    import re

    for m in re.finditer(r"Window .*?windowspecdefinition\(([^)]*)\)", plan):
        spec = m.group(1)
        if "worker" in spec:
            assert "_dbin" in spec  # never worker-alone
    # degenerate all-equal offsets (delay 0): one hot bin, still exact
    ps0 = schedule_fetches(
        frontier, crawl_delay_s=0.0, n_workers=2,
        prefix_sum_dispatch=True, dispatch_bins=4,
    )
    b0 = schedule_fetches(frontier, crawl_delay_s=0.0, n_workers=2)
    assert sorted(map(key, ps0.collect())) == sorted(map(key, b0.collect()))


def test_deterministic_across_runs(spark, frontier):
    a = schedule_fetches(frontier, priority_col="priority").collect()
    b = schedule_fetches(frontier, priority_col="priority").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


# --------------------------------------------------------------------- robots


def test_robots_parse_groups_and_comments(spark):
    from data_pipelines_spark.operators.frontier import robots_disallow_prefixes

    txt = (
        "# global rules\n"
        "User-agent: googlebot\n"
        "Disallow: /g/\n"
        "\n"
        "User-agent: other\n"
        "User-agent: *\n"
        "Disallow: /private/  # secret\n"
        "Crawl-delay: 2\n"
        "Disallow: /tmp/\n"
        "Disallow:\n"
        "\n"
        "User-agent: bing\n"
        "Disallow: /b/\n"
    )
    df = spark.createDataFrame([(txt,)], "robots string")
    [row] = df.select(robots_disallow_prefixes().alias("r")).collect()
    # googlebot/bing groups excluded; '*' group collected (shared with
    # 'other' via consecutive UA lines); empty Disallow contributes nothing
    assert row.r == ["/private/", "/tmp/"]


def test_robots_star_only_and_no_star(spark):
    from data_pipelines_spark.operators.frontier import robots_disallow_prefixes

    df = spark.createDataFrame(
        [
            ("User-agent: *\nDisallow: /a\n",),
            ("User-agent: bot\nDisallow: /a\n",),
            ("",),
        ],
        "robots string",
    )
    got = [r.r for r in df.select(robots_disallow_prefixes().alias("r")).collect()]
    assert got == [["/a"], [], []]


def test_filter_frontier_robots(spark):
    from data_pipelines_spark.operators.frontier import (
        filter_frontier_robots,
        robots_disallow_prefixes,
    )

    frontier = spark.createDataFrame(
        [
            ("https://a.com/private/x", "a.com"),
            ("https://a.com/public/x", "a.com"),
            ("https://a.com", "a.com"),          # empty path -> '/'
            ("https://b.org/private/x", "b.org"),  # no robots row: allowed
            ("https://c.net/any", "c.net"),      # disallow-all '/'
        ],
        "url string, domain string",
    )
    robots = spark.createDataFrame(
        [
            ("a.com", "User-agent: *\nDisallow: /private/\n"),
            ("c.net", "User-agent: *\nDisallow: /\n"),
        ],
        "domain string, robots string",
    ).select("domain", robots_disallow_prefixes().alias("disallow"))
    kept = {r.url for r in filter_frontier_robots(frontier, robots).collect()}
    assert kept == {
        "https://a.com/public/x",
        "https://a.com",
        "https://b.org/private/x",
    }


def test_robots_sitemaps_global_scope(spark):
    from data_pipelines_spark.operators.frontier import robots_sitemaps

    txt = (
        "Sitemap: https://a.com/s1.xml\n"
        "User-agent: bot\nDisallow: /x\n"
        "sitemap: https://a.com/s2.xml # alt\n"
        "Disallow: /y\n"
    )
    df = spark.createDataFrame([(txt,), ("User-agent: *\n",)], "robots string")
    got = [r.s for r in df.select(robots_sitemaps().alias("s")).collect()]
    assert got == [["https://a.com/s1.xml", "https://a.com/s2.xml"], []]


def test_retry_backoff_caps(spark):
    import datetime as dt

    from data_pipelines_spark.operators.frontier import retry_backoff

    t0 = dt.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [(a, t0) for a in range(12)], "attempts int, last_attempt timestamp"
    )
    due = {
        r.attempts: (r.due - t0).total_seconds()
        for r in df.select("attempts", retry_backoff().alias("due")).collect()
    }
    assert due[0] == 60 and due[1] == 120 and due[4] == 960
    assert due[11] == 86400  # capped at one day
