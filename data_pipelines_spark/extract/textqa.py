"""Text analysis for training-data curation: language ID, quality scoring,
token counting, document fingerprinting.

Everything here is a JVM-side Column expression (higher-order array
functions + regex) — no Python in the hot path, so these run inside
whole-stage codegen over 100 TB of text.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# small high-frequency stopword sets per language (public knowledge;
# enough signal for an n-gram-free heuristic language ID)
STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "was", "for", "with", "over"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "eine", "mit", "für", "von", "zu"],
    "es": ["el", "la", "los", "las", "de", "que", "y", "es", "en", "un", "una", "por"],
    "fr": ["le", "la", "les", "des", "et", "est", "une", "dans", "que", "pour", "du", "au"],
    "it": ["il", "lo", "la", "gli", "che", "di", "è", "un", "una", "per", "con", "sono"],
    "pt": ["o", "os", "as", "de", "que", "e", "é", "um", "uma", "para", "com", "não"],
}


def words(col: Column) -> Column:
    """Lowercased word tokens (whitespace split of trimmed text)."""
    return F.split(F.lower(F.trim(col)), "\\s+")


def stopword_ratio(col: Column, lang: str = "en") -> Column:
    """Fraction of tokens that are stopwords of ``lang``."""
    w = words(col)
    sw = STOPWORDS[lang]
    hits = F.size(F.filter(w, lambda t: t.isin(sw)))
    return F.when(F.size(w) > 0, hits / F.size(w)).otherwise(F.lit(0.0))


def lang_id(col: Column) -> Column:
    """Heuristic language ID: argmax of per-language stopword hit ratio.

    One pass over the token array per language, argmax via ``array_max`` of
    (score, lang) structs (lexicographic struct ordering — ties resolve to
    the lexicographically larger language code, deterministic). Returns NULL
    when no language scores above zero.
    """
    w = words(col)
    n = F.size(w)

    def _member_of(sw: list[str]):
        # NB: the closure keeps the lambda single-arg — a default-valued second
        # parameter would make PySpark treat it as an (element, index) lambda.
        return lambda t: t.isin(sw)

    scored = F.array(
        *[
            F.struct(
                (F.size(F.filter(w, _member_of(sw))) / n).alias("score"),
                F.lit(lang).alias("lang"),
            )
            for lang, sw in STOPWORDS.items()
        ]
    )
    best = F.array_max(scored)
    return F.when((n > 0) & (best["score"] > 0), best["lang"]).otherwise(
        F.lit(None).cast("string")
    )


# BPE-ish pre-tokenizer: word pieces, numbers, or single non-space symbols —
# the GPT-2-style pattern family, simplified to Java-regex-safe classes.
TOKEN_PATTERN = r"[A-Za-zÀ-ɏ]+|[0-9]+|[^\sA-Za-z0-9À-ɏ]"


def token_count(col: Column, mode: str = "whitespace") -> Column:
    """Token count: 'whitespace' split or 'bpe' regex pre-tokenization."""
    if mode == "whitespace":
        t = F.trim(col)
        return F.when(F.length(t) == 0, F.lit(0)).otherwise(F.size(F.split(t, "\\s+")))
    if mode == "bpe":
        return F.size(F.regexp_extract_all(col, F.lit(TOKEN_PATTERN), 0))
    raise ValueError(mode)


def punct_ratio(col: Column) -> Column:
    """Punctuation characters / total characters."""
    n = F.length(col)
    p = F.length(F.regexp_replace(col, "[^.,;:!?'\"()\\[\\]-]", ""))
    return F.when(n > 0, p / n).otherwise(F.lit(0.0))


def uppercase_ratio(col: Column) -> Column:
    n = F.length(F.regexp_replace(col, "[^A-Za-z]", ""))
    u = F.length(F.regexp_replace(col, "[^A-Z]", ""))
    return F.when(n > 0, u / n).otherwise(F.lit(0.0))


def mean_word_length(col: Column) -> Column:
    w = words(col)
    total = F.aggregate(w, F.lit(0), lambda acc, t: acc + F.length(t))
    return F.when(F.size(w) > 0, total / F.size(w)).otherwise(F.lit(0.0))


def quality_score(col: Column, lang: str = "en") -> Column:
    """Composite [0,1] quality heuristic (length, punctuation sanity,
    stopword presence, case sanity, word-length sanity).

    The training-data analog of the reference's page-quality gates
    (``boxing/validators/*`` size/blank checks) expressed as a soft score.
    """
    length_ok = F.least(F.length(col) / F.lit(500.0), F.lit(1.0))
    punct = punct_ratio(col)
    punct_ok = F.when(punct <= 0.2, F.lit(1.0)).otherwise(1.0 - F.least((punct - 0.2) * 2, F.lit(1.0)))
    sw_ok = F.least(stopword_ratio(col, lang) * F.lit(4.0), F.lit(1.0))
    upper = uppercase_ratio(col)
    case_ok = F.when(upper <= 0.3, F.lit(1.0)).otherwise(1.0 - F.least(upper - 0.3, F.lit(1.0)))
    mwl = mean_word_length(col)
    mwl_ok = F.when((mwl >= 2.5) & (mwl <= 12.0), F.lit(1.0)).otherwise(F.lit(0.5))
    return (length_ok + punct_ok + sw_ok + case_ok + mwl_ok) / F.lit(5.0)


def top_word_share(col: Column) -> Column:
    """Fraction of tokens taken by the single most frequent word — the
    MassiveText/Gopher repetition signal family (public rule set): pages
    dominated by one token are boilerplate. Pure integer-ratio Column
    expression (count of max word / total words), so it is exactly
    reproducible in any SQL engine."""
    w = words(col)
    n = F.size(w)
    # max multiplicity via sort + run-length fold: O(n log n), not the
    # O(distinct × n) a per-distinct-token count would cost — a 100k-word
    # mostly-unique document must not melt an executor inside one row
    acc0 = F.struct(
        F.lit("").alias("prev"), F.lit(0).alias("run"), F.lit(0).alias("best")
    )
    top = F.aggregate(
        F.array_sort(w),
        acc0,
        lambda acc, t: F.struct(
            t.alias("prev"),
            F.when(t == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)).alias("run"),
            F.greatest(
                acc["best"],
                F.when(t == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)),
            ).alias("best"),
        ),
        lambda acc: acc["best"],
    )
    return F.when(n > 0, top / n).otherwise(F.lit(0.0))


def dup_ngram_fraction(col: Column, n: int = 2) -> Column:
    """Fraction of word n-grams that are repeats: 1 − distinct/total —
    the Gopher duplicate-n-gram rule. Integer-ratio exact."""
    w = words(col)
    k = F.size(w) - F.lit(n - 1)
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(k, F.lit(1))),
        lambda i: F.concat_ws(" ", F.slice(w, i, n)),
    )
    total = F.size(grams)
    distinct = F.size(F.array_distinct(grams))
    return F.when(total > 0, (total - distinct) / total).otherwise(F.lit(0.0))


def gopher_quality_reason(
    col: Column,
    min_words: int = 40,
    max_words: int = 100_000,
    mwl_lo: float = 2.0,
    mwl_hi: float = 12.0,
    max_punct: float = 0.25,
    max_top_word: float = 0.20,
    max_dup_bigram: float = 0.60,
) -> Column:
    """First-failure-wins document rejection reason, NULL = keep.

    The Gopher/MassiveText-style quality rule chain (public rule family)
    as one JVM CASE expression: word-count bounds, mean-word-length
    bounds, punctuation share, single-word domination, duplicate-bigram
    share. Every predicate is a ratio of integers, so the chain is
    byte-exactly reproducible in the DuckDB oracle.
    """
    w = words(col)
    n = F.size(w)
    total_chars = F.aggregate(w, F.lit(0), lambda acc, t: acc + F.length(t))
    return (
        F.when((n < min_words) | (n > max_words), F.lit("word_count"))
        .when(
            (total_chars / n < mwl_lo) | (total_chars / n > mwl_hi),
            F.lit("word_length"),
        )
        .when(punct_ratio(col) > max_punct, F.lit("punctuation"))
        .when(top_word_share(col) > max_top_word, F.lit("top_word"))
        .when(dup_ngram_fraction(col, 2) > max_dup_bigram, F.lit("dup_bigrams"))
        .otherwise(F.lit(None).cast("string"))
    )


def char_shingles(col: Column, k: int = 8) -> Column:
    """Character k-gram shingles (for fingerprinting), JVM-side."""
    from data_pipelines_spark.functions.normalize import normalized_text

    t = normalized_text(col)
    n = F.length(t) - F.lit(k - 1)
    return F.transform(
        F.sequence(F.lit(1), F.greatest(n, F.lit(1))),
        lambda i: F.substring(t, i, F.lit(k)),
    )


def _gram_hash(s: Column, hash_fn: str) -> Column:
    if hash_fn == "xxhash64":
        return F.xxhash64(s)
    if hash_fn == "md5":
        # first 15 hex digits of md5 → positive 60-bit long; DuckDB computes
        # the identical value with ('0x'||substr(md5(g),1,15))::UBIGINT, so
        # the oracle can rebuild the whole sketch
        return F.conv(F.substring(F.md5(F.encode(s, "UTF-8")), 1, 15), 16, 10).cast("long")
    raise ValueError(hash_fn)


def fingerprint(
    col: Column, k: int = 8, sketch_size: int = 16, hash_fn: str = "xxhash64"
) -> Column:
    """Bottom-k document fingerprint: the ``sketch_size`` smallest k-gram
    hashes, sorted — a compact rolling-hash sketch whose overlap estimates
    containment (winnowing-family; deterministic, order-insensitive).

    ``hash_fn='xxhash64'`` is the production path (fastest, pure JVM);
    ``'md5'`` trades a few cycles for SQL-oracle reproducibility — still
    all-JVM, still inside whole-stage codegen.
    """
    hashes = F.array_distinct(
        F.transform(char_shingles(col, k), lambda s: _gram_hash(s, hash_fn))
    )
    return F.slice(F.array_sort(hashes), 1, sketch_size)


def fingerprint_hex(
    col: Column, k: int = 8, sketch_size: int = 16, hash_fn: str = "xxhash64"
) -> Column:
    """Single hex digest of the bottom-k sketch (joinable fingerprint id)."""
    return F.sha2(
        F.concat_ws(
            ",",
            F.transform(
                fingerprint(col, k, sketch_size, hash_fn), lambda h: h.cast("string")
            ),
        ).cast("binary"),
        256,
    )


def unigram_lm_score(
    df,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Corpus-trained unigram language-model quality score — the perplexity
    proxy of CCNet-style corpus filtering, self-trained (two passes over the
    corpus, no external model): per document, the mean information content
    of its tokens in bits, ``(1/n) * Σ -log2(count(tok)/total_tokens)``.
    Gibberish / mojibake / rare-token spam scores HIGH (every token is rare);
    boilerplate scores LOW — filter both tails.

    Exactness contract: the per-occurrence cost is quantized to integer
    millibits (``floor((log2(total) − log2(cnt)) · 1000)``) so the per-doc
    aggregation is an INTEGER sum — order-independent, hence bit-identical
    across partitionings and reproducible by any SQL engine; only the final
    single division is floating point (rounded to 4 decimals).

    Plan shape at scale: explode tokens once → groupBy(token) count (ONE
    shuffle, map-side partial agg absorbs hot stopwords) → one-row total
    broadcast → shuffle hash join tokens⋈vocab on token → groupBy(doc)
    integer sums. Nothing driver-side; vocab never collects.

    Returns (id_col, n_tokens, bits_per_token).
    """
    from pyspark.sql import DataFrame as _DF  # noqa: F401 (signature doc)

    toks = df.select(
        F.col(id_col).alias("id"),
        F.explode(F.split(F.trim(F.lower(F.col(text_col))), r"\s+")).alias("tok"),
    )
    vocab = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("cnt"))
    total = vocab.agg(F.sum("cnt").alias("total"))
    mb = F.floor(
        (F.log2(F.col("total")) - F.log2(F.col("cnt"))) * F.lit(1000)
    ).alias("mb")
    scored = (
        toks.join(vocab, "tok")
        .crossJoin(F.broadcast(total))
        .select("id", mb)
    )
    return (
        scored.groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("mb").alias("smb"),
        )
        .select(
            F.col("id").alias(id_col),
            "n_tokens",
            F.round(F.col("smb") / F.lit(1000.0) / F.col("n_tokens"), 4).alias(
                "bits_per_token"
            ),
        )
    )
