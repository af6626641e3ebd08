"""Corpus-statistics text operators: TF-IDF keyword extraction and n-gram
heavy hitters — the term-weighting layer a webtext pipeline uses for topic
tagging, near-dup triage, and corpus reporting.

Everything is exploded-token relational algebra — no UDFs, no vocabulary
collected to the driver:

- :func:`tfidf_top_terms` — per document, the k highest-TF-IDF terms.
  ``tf`` is the in-document count, ``idf = ln(N / df)`` with document
  frequency from one distinct-aggregation. Two shuffles over the token
  table (doc-term counts, term document-frequencies) + one broadcast-or-
  shuffle join back; the per-document top-k is a window over doc_id —
  bounded partitions (a document's distinct terms), never a global sort.
- :func:`top_ngrams` — corpus-wide k most frequent word n-grams (the
  boilerplate / contamination report). One count shuffle with map-side
  partial aggregation, then ``orderBy(...).limit(k)`` which Spark executes
  as TakeOrderedAndProject — per-partition heaps, no global sort.

Determinism: ties break on the term/gram string, so results are stable
across partitionings and replays (and SQL-reproducible — ``ln`` is the
same libm double in any engine; the oracle rounds like every float here).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from data_pipelines_spark.extract.textqa import words


def _tokens(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    return df.select(
        F.col(id_col),
        F.explode(words(F.col(text_col))).alias("term"),
    ).where(F.col("term") != "")


def tfidf_top_terms(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    score_round: int | None = None,
) -> DataFrame:
    """Per-document top-``k`` terms by TF-IDF: ``(id, term, tf, tfidf,
    term_rank)``. Corpus size N counts ALL input documents (including any
    with no tokens), so scores are reproducible from the raw table.

    ``score_round`` quantizes the score BEFORE ranking — set it when ranks
    must be engine-portable (two libm ``ln`` implementations can disagree by
    an ulp, which is invisible in the score but can flip a near-tie rank)."""
    n_docs = df.count()
    toks = _tokens(df, id_col, text_col)
    tf = toks.groupBy(id_col, "term").agg(F.count("*").alias("tf"))
    dfreq = (
        toks.select(id_col, "term")
        .distinct()
        .groupBy("term")
        .agg(F.count("*").alias("df"))
    )
    score = F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df"))
    if score_round is not None:
        score = F.round(score, score_round)
    scored = tf.join(dfreq, "term").withColumn("tfidf", score)
    w = Window.partitionBy(id_col).orderBy(
        F.col("tfidf").desc(), F.col("term")
    )
    return (
        scored.withColumn("term_rank", F.row_number().over(w))
        .where(F.col("term_rank") <= k)
        .select(id_col, "term", "tf", "tfidf", "term_rank")
    )


def top_ngrams(
    df: DataFrame,
    *,
    n: int = 2,
    k: int = 20,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Corpus-wide ``k`` most frequent word ``n``-grams: ``(gram, freq)``,
    ties broken on the gram string. The n-gram expansion is a JVM
    ``transform`` over token-index sequences (no UDF); counting is one
    map-side-combined shuffle; the top-k is TakeOrderedAndProject."""
    if n < 1:
        raise ValueError("n must be ≥ 1")
    w = words(F.col(text_col))
    # sequence(0, stop) DESCENDS when stop < 0 — short docs need an
    # explicit empty index array, not a clamped bound
    idx = F.when(
        F.size(w) >= n, F.sequence(F.lit(0), F.size(w) - F.lit(n))
    ).otherwise(F.expr("cast(array() as array<int>)"))
    grams = F.transform(idx, lambda i: F.array_join(F.slice(w, i + 1, n), " "))
    exploded = (
        df.select(F.explode(grams).alias("gram"))
        .where(F.trim(F.col("gram")) != "")
    )
    return (
        exploded.groupBy("gram")
        .agg(F.count("*").alias("freq"))
        .orderBy(F.col("freq").desc(), F.col("gram"))
        .limit(k)
    )
