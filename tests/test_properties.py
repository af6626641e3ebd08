"""Property-based tests (hypothesis): engine invariants hold on arbitrary
inputs, not just the fixture cases — an upgrade over the reference's
example-only test style (SURVEY §5).

One SparkSession-backed check per property with hypothesis driving the data
generation; each example is asserted against an independent pure-Python
model (pandas/python), never against the implementation itself.
"""

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from data_pipelines_spark.functions.normalize import normalize_id, normalize_result, slugify
from data_pipelines_spark.operators.lww import lww_latest

_SETTINGS = dict(
    max_examples=20,
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
