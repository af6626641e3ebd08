"""TF-IDF top terms and corpus n-gram heavy hitters vs python models."""

import math

import pytest
from pyspark.sql import functions as F

from data_pipelines_spark.operators.tfidf import tfidf_top_terms, top_ngrams

DOCS = [
    (0, "the cat sat on the mat"),
    (1, "the dog sat"),
    (2, "quantum flapjack"),
    (3, ""),  # tokenless doc still counts toward N
]


@pytest.fixture()
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def _model_tfidf(k=3):
    toks = {i: t.lower().split() for i, t in DOCS if t}
    n = len(DOCS)
    dfreq = {}
    for ts in toks.values():
        for t in set(ts):
            dfreq[t] = dfreq.get(t, 0) + 1
    out = {}
    for i, ts in toks.items():
        tf = {}
        for t in ts:
            tf[t] = tf.get(t, 0) + 1
        scored = sorted(
            ((c * math.log(n / dfreq[t]), t, c) for t, c in tf.items()),
            key=lambda x: (-x[0], x[1]),
        )
        out[i] = [(t, c, s) for s, t, c in scored[:k]]
    return out


def test_tfidf_matches_model(spark, docs):
    got = {}
    for r in tfidf_top_terms(docs, k=3).collect():
        got.setdefault(r.doc_id, []).append((r.term_rank, r.term, r.tf, r.tfidf))
    want = _model_tfidf()
    assert set(got) == set(want)  # doc 3 has no terms, absent on both sides
    for i in got:
        rows = [x[1:] for x in sorted(got[i])]
        for (t, c, s), (wt, wc, ws) in zip(rows, want[i]):
            assert (t, c) == (wt, wc)
            assert s == pytest.approx(ws, rel=1e-12)


def test_idf_zero_for_ubiquitous_terms(spark, docs):
    """'the'/'sat' appear in 2 of 4 docs → idf ln(2); a term in ALL token
    docs would still score > 0 because N counts the empty doc too."""
    rows = {
        (r.doc_id, r.term): r.tfidf for r in tfidf_top_terms(docs, k=5).collect()
    }
    assert rows[(0, "the")] == pytest.approx(2 * math.log(4 / 2), rel=1e-12)


def test_top_ngrams_counts_and_short_docs(spark, docs):
    got = [(r.gram, r.freq) for r in top_ngrams(docs, n=2, k=3).collect()]
    # 'sat' bigrams: 'the cat','cat sat','sat on','on the','the mat',
    # 'the dog','dog sat','quantum flapjack' — all freq 1 except none repeat;
    # tie-break is alphabetical
    assert got == [("cat sat", 1), ("dog sat", 1), ("on the", 1)]
    uni = dict(
        (r.gram, r.freq) for r in top_ngrams(docs, n=1, k=2).collect()
    )
    assert uni == {"the": 3, "sat": 2}
    with pytest.raises(ValueError):
        top_ngrams(docs, n=0)
