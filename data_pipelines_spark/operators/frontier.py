"""Crawl-frontier scheduling: politeness-aware fetch-slot assignment.

The reference's scrape loop fetches due pages one at a time with a fixed
sleep (``boxing/scrape/update_data.py``'s serial requests loop) — politeness
by global serialization. At Common-Crawl scale the frontier is billions of
URLs across millions of hosts, and the scheduling problem becomes: fan the
fetches across N workers WITHOUT ever hitting one host from two workers or
faster than its crawl delay. This module is that operator, fully
declarative:

- **domain → worker ownership** (``worker = H(domain) mod n_workers``): a
  host is owned by exactly one worker, so per-host serialization needs no
  coordination at all — politeness falls out of the partitioning. The hash
  is the md5-prefix integer (SQL-reproducible, same idiom as the SimHash
  oracle variant), not a JVM-private hash.
- **per-domain slots** (``slot = row_number() over (partition by domain
  order by priority, url) - 1``): position in the host's fetch queue;
  ``fetch_offset_s = slot × crawl_delay_s`` is the earliest politeness-legal
  fetch time relative to the batch epoch.
- **per-worker dispatch order** (``dispatch_pos`` over the worker's whole
  queue, ordered by fetch offset): what the worker actually iterates.

Scale shape: two window shuffles (domain, then worker), both on keys with
map-side-combinable cardinality; no joins, no collects, no UDFs on the
default path (``prefix_sum_dispatch=True`` opts into one bounded
O(workers × bins) count collect + broadcast join to shrink the per-worker
sort — see :func:`schedule_fetches`). A mega-host
(10^7 frontier URLs on one domain) serializes its OWN window partition — the
politeness semantics require a per-host total order, so that is inherent,
and row_number over a sorted run streams without materializing the
partition. Worker skew is bounded by the hash fan-out; raise ``n_workers``
to spread hot hash buckets (a worker is a logical queue, not a machine).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _domain_hash(col) -> "F.Column":
    """60-bit integer from the md5 hex prefix — engine-portable (DuckDB:
    ``('0x' || substr(md5(d),1,15))::UBIGINT::BIGINT``)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def schedule_fetches(
    frontier: DataFrame,
    *,
    url_col: str = "url",
    domain_col: str = "domain",
    priority_col: str | None = None,
    crawl_delay_s: float = 1.0,
    n_workers: int = 32,
    prefix_sum_dispatch: bool = False,
    dispatch_bins: int = 1024,
) -> DataFrame:
    """Assign every frontier URL a (worker, slot, fetch_offset_s,
    dispatch_pos) — the politeness-legal parallel fetch plan.

    ``priority_col`` orders a host's queue (higher first; ties and the
    no-priority case fall back to ``url_col`` so the plan is total-order
    deterministic). ``crawl_delay_s`` may be a per-row column name (robots
    crawl-delay per host) or a constant seconds value.

    Scale bound (explicit): by default the ``dispatch_pos`` window sorts
    each worker's WHOLE queue in one task — frontier/n_workers rows per
    task, the largest single-task unit in this module. That is usually
    acceptable because n_workers scales with the real fetch fleet (the plan
    exists to feed exactly those workers, so a queue a worker can fetch, a
    task can sort), and the per-domain ``slot`` window above it is bounded
    by the largest single host.

    ``prefix_sum_dispatch=True`` removes that edge with the segment +
    prefix-sum shape of ``operators/ranking.py``: each worker's queue is
    value-binned by ``fetch_offset_s`` into ``dispatch_bins`` contiguous
    ranges, a per-(worker, bin) count job prefix-sums driver-side
    (O(occupied bins) rows collected, ≤ n_workers × dispatch_bins), and
    ``dispatch_pos`` becomes a within-bin row_number plus the broadcast
    bin offset — identical positions, largest single-task sort shrunk
    ~dispatch_bins-fold, at the cost of one extra count job + a scalar max.
    Honest limit (same as ranking.py): a worker whose offsets are all equal
    degenerates to one hot bin — raise ``dispatch_bins`` or accept the
    default window."""
    order = (
        [F.col(priority_col).desc_nulls_last(), F.col(url_col)]
        if priority_col
        else [F.col(url_col)]
    )
    per_domain = Window.partitionBy(domain_col).orderBy(*order)
    delay = (
        F.col(crawl_delay_s)
        if isinstance(crawl_delay_s, str)
        else F.lit(float(crawl_delay_s))
    )
    out = (
        frontier.withColumn(
            "worker",
            F.pmod(_domain_hash(F.col(domain_col)), F.lit(n_workers)).cast("int"),
        )
        .withColumn("slot", (F.row_number().over(per_domain) - 1).cast("long"))
        .withColumn(
            "fetch_offset_s",
            F.round(F.col("slot") * delay, 3).cast("double"),
        )
    )
    if not prefix_sum_dispatch:
        per_worker = Window.partitionBy("worker").orderBy(
            F.col("fetch_offset_s"), F.col(domain_col), F.col(url_col)
        )
        return out.withColumn(
            "dispatch_pos", F.row_number().over(per_worker).cast("long")
        )
    if dispatch_bins < 2:
        raise ValueError("dispatch_bins must be ≥ 2")
    # bins are contiguous offset ranges, so within-bin order + per-worker
    # bin offsets reproduce the exact (offset, domain, url) total order
    hi = out.agg(F.max("fetch_offset_s")).collect()[0][0] or 0.0
    width = (hi / dispatch_bins) or 1.0
    dbin = F.least(
        F.floor(F.col("fetch_offset_s") / F.lit(width)).cast("int"),
        F.lit(dispatch_bins - 1),
    )
    tagged = out.withColumn("_dbin", dbin)
    counts = sorted(
        (r["worker"], r["_dbin"], r["c"])
        for r in tagged.groupBy("worker", "_dbin")
        .agg(F.count("*").alias("c"))
        .collect()
    )
    offsets, running, cur = [], 0, None
    for w, b, c in counts:
        if w != cur:
            cur, running = w, 0
        offsets.append((w, b, running))
        running += int(c)
    off = F.broadcast(
        frontier.sparkSession.createDataFrame(
            offsets, "worker int, _dbin int, _doff long"
        )
    )
    per_bin = Window.partitionBy("worker", "_dbin").orderBy(
        F.col("fetch_offset_s"), F.col(domain_col), F.col(url_col)
    )
    return (
        tagged.join(off, ["worker", "_dbin"])
        .withColumn(
            "dispatch_pos",
            (F.row_number().over(per_bin) + F.col("_doff")).cast("long"),
        )
        .drop("_dbin", "_doff")
    )


# ---------------------------------------------------------------------------
# robots.txt — the politeness *rules* side (the scheduler above is the
# politeness *rate* side)
# ---------------------------------------------------------------------------

# value of a "Key: value" robots line, comment-stripped: drop '#...' first,
# then everything through the first ':' (values may themselves contain ':')
_VAL = "trim(regexp_replace(regexp_replace({raw}, '#.*', ''), '^[^:]*:', ''))"


def robots_disallow_prefixes(robots_col: str = "robots") -> Column:
    """``array<string>`` of path prefixes disallowed for ``User-agent: *``,
    parsed from raw robots.txt text entirely JVM-side — one ``aggregate``
    fold over the split lines, no UDF, whole-stage-codegen friendly.

    Grammar handled (the de-facto subset every major crawler honors):
    consecutive ``User-agent`` lines form a group; a ``User-agent`` line
    after rules starts a NEW group; ``Disallow``/``Allow``/``Crawl-delay``
    lines belong to the current group; rules collect only while the current
    group names ``*``; empty ``Disallow:`` means allow-all (contributes no
    prefix); ``#`` comments and blank lines are ignored. ``Allow``
    precedence is NOT modeled (documented deviation — we only honor
    disallow prefixes, the conservative direction for a polite crawler).
    """
    v = _VAL.format(raw="raw")
    return F.expr(
        f"""
        aggregate(
          split({robots_col}, '\n'),
          struct(false as star, false as seen_rule,
                 cast(array() as array<string>) as rules),
          (acc, raw) -> (
            CASE
              WHEN lower(trim(raw)) rlike '^user-agent\\\\s*:' THEN
                named_struct(
                  'star',
                  CASE WHEN acc.seen_rule THEN {v} = '*'
                       ELSE acc.star OR {v} = '*' END,
                  'seen_rule', false,
                  'rules', acc.rules)
              WHEN lower(trim(raw)) rlike '^disallow\\\\s*:' THEN
                named_struct(
                  'star', acc.star,
                  'seen_rule', true,
                  'rules',
                  CASE WHEN acc.star AND length({v}) > 0
                       THEN array_append(acc.rules, {v})
                       ELSE acc.rules END)
              WHEN lower(trim(raw)) rlike '^(allow|crawl-delay|sitemap)\\\\s*:' THEN
                named_struct('star', acc.star, 'seen_rule', true,
                             'rules', acc.rules)
              ELSE acc
            END),
          acc -> acc.rules)
        """
    )


def filter_frontier_robots(
    frontier: DataFrame,
    robots: DataFrame,
    *,
    url_col: str = "url",
    domain_col: str = "domain",
    rules_col: str = "disallow",
) -> DataFrame:
    """Drop frontier URLs a host's robots rules disallow.

    ``robots`` is one row per domain with an ``array<string>`` of disallow
    prefixes (from :func:`robots_disallow_prefixes`); it is broadcast —
    robots state is O(hosts), tiny next to the frontier, so the frontier
    NEVER shuffles. A host with no robots row allows everything (the
    crawler convention for a missing/unfetchable robots.txt). Matching is
    path-prefix on the URL's path (query string included, '' → '/'), the
    standard robots rule."""
    rules = F.broadcast(
        robots.select(F.col(domain_col), F.col(rules_col).alias("_rules"))
    )
    path = F.regexp_replace(F.col(url_col), r"^[a-z][a-z0-9+.-]*://[^/]*", "")
    path = F.when(path == "", "/").otherwise(path)
    blocked = F.exists(
        F.coalesce(F.col("_rules"), F.expr("cast(array() as array<string>)")),
        lambda r: path.startswith(r),
    )
    return (
        frontier.join(rules, on=domain_col, how="left")
        .where(~blocked)
        .drop("_rules")
    )


def robots_sitemaps(robots_col: str = "robots") -> Column:
    """``array<string>`` of Sitemap URLs declared anywhere in robots.txt —
    per the sitemaps protocol these are global, NOT scoped to a User-agent
    group, so this is a flat line scan (JVM-side, no fold needed)."""
    lines = F.split(F.col(robots_col), "\n")
    sm = F.filter(
        lines, lambda ln: F.lower(F.trim(ln)).rlike(r"^sitemap\s*:")
    )
    return F.transform(
        sm,
        lambda ln: F.trim(
            F.regexp_replace(F.regexp_replace(ln, "#.*", ""), "^[^:]*:", "")
        ),
    )


def retry_backoff(
    attempts_col: str = "attempts",
    last_attempt_col: str = "last_attempt",
    *,
    base_s: float = 60.0,
    cap_s: float = 86400.0,
) -> Column:
    """Next-due timestamp under capped exponential backoff:
    ``last_attempt + min(base · 2^attempts, cap)`` seconds — the standard
    refetch policy for failed crawls (composes with the S7 due-work scan:
    ``WHERE retry_backoff(...) <= now``). Deterministic, jitter-free by
    design: replays schedule identically; add hash-based jitter downstream
    if thundering herds matter."""
    delay = F.least(
        F.lit(float(base_s)) * F.pow(F.lit(2.0), F.col(attempts_col)),
        F.lit(float(cap_s)),
    )
    return F.timestamp_seconds(
        F.unix_timestamp(F.col(last_attempt_col)) + delay.cast("long")
    )
