"""Property-based tests (hypothesis): engine invariants hold on arbitrary
inputs, not just the fixture cases — an upgrade over the reference's
example-only test style (SURVEY §5).

One SparkSession-backed check per property with hypothesis driving the data
generation; each example is asserted against an independent pure-Python
model (pandas/python), never against the implementation itself.
"""

import datetime as dt
import os

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from data_pipelines_spark.functions.normalize import normalize_id, normalize_result, slugify
from data_pipelines_spark.operators.lww import lww_latest

# HYP_MAX_EXAMPLES deepens the sweep without editing the suite (CI keeps the
# fast default; a soak-style run sets e.g. 200). The expensive aggview
# property scales at half rate.
_N_EXAMPLES = int(os.environ.get("HYP_MAX_EXAMPLES", "20"))
_SETTINGS = dict(
    max_examples=_N_EXAMPLES,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)


def _model_normalize_id(s: str) -> str:
    """Reference semantics, boxing/transform/boxer_id.py:7-24."""
    if s.isdigit() and s != "":
        return str(int(s))
    return s


@given(st.lists(st.text(alphabet="0123456789abcZ -", min_size=0, max_size=12), min_size=1, max_size=30))
@settings(**_SETTINGS)
def test_normalize_id_matches_python_model(spark, values):
    df = spark.createDataFrame([(v,) for v in values], "v string")
    got = [r.out for r in df.select(normalize_id(F.col("v")).alias("out")).collect()]
    assert got == [_model_normalize_id(v) for v in values]


@given(st.lists(st.text(alphabet="abcXYZ 0189-_.!", min_size=0, max_size=20), min_size=1, max_size=30))
@settings(**_SETTINGS)
def test_slugify_properties(spark, values):
    import re

    df = spark.createDataFrame([(v,) for v in values], "v string")
    got = [r.out for r in df.select(slugify(F.col("v")).alias("out")).collect()]
    for out in got:
        assert out is not None
        assert re.fullmatch(r"([a-z0-9]+(-[a-z0-9]+)*)?", out), out
    # idempotence: slugify(slug) == slug
    df2 = spark.createDataFrame([(g,) for g in got], "v string")
    again = [r.out for r in df2.select(slugify(F.col("v")).alias("out")).collect()]
    assert again == got


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=5),  # key
            st.integers(min_value=0, max_value=3),  # ts day offset
            st.integers(min_value=0, max_value=1000),  # offset
        ),
        min_size=1,
        max_size=60,
    )
)
@settings(**_SETTINGS)
def test_lww_latest_matches_pandas_model(spark, rows):
    data = [
        (f"k{k}", dt.datetime(2025, 1, 1 + d), o, f"p{k}-{d}-{o}")
        for k, d, o in rows
    ]
    df = spark.createDataFrame(data, "url string, warc_ts timestamp, offset long, payload string")
    got = {
        r.url: (r.warc_ts, r.offset)
        for r in lww_latest(df, "url", ("warc_ts", "offset")).collect()
    }
    model: dict = {}
    for url, ts, off, _ in data:
        if url not in model or (ts, off) > model[url]:
            model[url] = (ts, off)
    assert got == model
    # exactly one survivor per key
    assert len(got) == len({u for u, *_ in data})


def _model_resolve_bumps(rows):
    """Pure-Python model of lww_resolve_bumps: rows are
    (key, seq, payload, content_hash, deleted, bump)."""
    out = {}
    by_key = {}
    for r in rows:
        by_key.setdefault(r[0], []).append(r)
    for key, rs in by_key.items():
        w = max(rs, key=lambda r: r[1])
        if not w[5]:  # not a bump: plain LWW
            out[key] = (w[1], w[2], w[3], w[4])
            continue
        content = [r for r in rs if not r[5] and not r[4]]
        # newest content row matching the bump's observed hash, else newest
        match = [r for r in content if r[3] == w[3]]
        pick = max(match, key=lambda r: r[1]) if match else (
            max(content, key=lambda r: r[1]) if content else None
        )
        if pick is None:
            out[key] = (w[1], None, None, True)  # unmaterializable → tombstone
        else:
            out[key] = (w[1], pick[2], pick[3], False)
    return out


@given(
    st.lists(
        st.tuples(
            st.integers(0, 3),                      # key
            st.integers(0, 20),                     # payload id (content)
            st.sampled_from(["U", "U", "U", "D", "B"]),  # op mix
        ),
        min_size=1,
        max_size=25,
    )
)
@settings(**_SETTINGS)
def test_lww_resolve_bumps_matches_model(spark, events):
    """Bump-aware resolution equals an independent Python model on random
    (key, op, payload) sequences — incl. bump-vs-delete ordering, multiple
    bumps, hash-matched materialization and fallbacks."""
    from data_pipelines_spark.operators.lww import lww_resolve_bumps

    rows = []
    for seq, (key, pay, op) in enumerate(events):
        h = f"h{pay % 5}"  # small hash space → plenty of matches AND misses
        rows.append(
            (
                f"k{key}",
                seq,
                None if op in ("D", "B") else f"p{pay}",
                h if op != "D" else None,
                op == "D",
                op == "B",
            )
        )
    df = spark.createDataFrame(
        rows,
        "url string, offset long, payload string, content_hash string, "
        "_deleted boolean, _bump boolean",
    )
    got = {
        r.url: (r.offset, r.payload, r.content_hash, r._deleted)
        for r in lww_resolve_bumps(
            df, "url", ("offset",), bump_col="_bump",
            deleted_col="_deleted", hash_col="content_hash",
        ).collect()
    }
    want = _model_resolve_bumps(rows)
    # model payload/hash for tombstone winners mirror the stored row values
    norm = {
        k: (v[0], v[1], v[2], v[3]) for k, v in want.items()
    }
    assert got == norm


@given(
    st.lists(
        st.tuples(
            st.sampled_from(["I", "U", "D"]),
            st.integers(min_value=0, max_value=6),   # key
            st.integers(min_value=1, max_value=50),  # seq (warc_ts day surrogate)
            st.sampled_from(["en", "de", "fr"]),
            st.integers(min_value=0, max_value=100),  # measure
        ),
        min_size=1,
        max_size=24,
    ),
    st.integers(min_value=1, max_value=3),  # batches
)
@settings(max_examples=max(1, _N_EXAMPLES // 2), deadline=None,
          suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture])
def test_aggview_equals_model_on_arbitrary_streams(spark, tmp_root_factory, ops, n_batches):
    """Incremental view == pure-python model of (LWW final state → GROUP BY)
    for arbitrary op sequences split across arbitrary batch boundaries."""
    import os

    from data_pipelines_spark.lake import LakeTable
    from data_pipelines_spark.lake.aggview import AggView

    root = tmp_root_factory()
    table = LakeTable.create(spark, os.path.join(root, "t"), key="url", n_buckets=4, overwrite=True)
    view = AggView.create(
        spark, os.path.join(root, "v"),
        {"lang": "lang"}, {"m": "n"}, ["lang", "n"],
    )
    rows = [
        (op, f"k{k}", dt.datetime(2025, 1, 1) + dt.timedelta(days=seq), i,
         None if op == "D" else lang, None if op == "D" else n)
        for i, (op, k, seq, lang, n) in enumerate(ops)
    ]
    schema = "op string, url string, warc_ts timestamp, offset long, lang string, n long"
    per = max(1, len(rows) // n_batches)
    for b in range(n_batches):
        chunk = rows[b * per : (b + 1) * per] if b < n_batches - 1 else rows[(n_batches - 1) * per :]
        if not chunk:
            continue
        table.merge(spark.createDataFrame(chunk, schema), batch_id=b)
        view.update(table, b)

    # python model: LWW winner per key, drop deletes, group by lang
    best = {}
    for op, url, ts_, off, lang, n in rows:
        cur = best.get(url)
        if cur is None or (ts_, off) >= (cur[1], cur[2]):
            best[url] = (op, ts_, off, lang, n)
    want = {}
    for op, _, _, lang, n in best.values():
        if op != "D":
            c, s = want.get(lang, (0, 0))
            want[lang] = (c + 1, s + n)
    got = {r.lang: (r.cnt, r.m) for r in view.read().collect()}
    assert got == want
