"""Similarity search over embedding columns (``array<float>``).

- ``brute_force_topk`` — exact cosine top-k against a query vector, one scan
  + one top-k (``orderBy…limit`` → Spark's TakeOrderedAndProject: each
  partition keeps k rows, the driver merges — no full sort, no full shuffle).
- ``random_hyperplane_bucket`` / ``lsh_topk`` — the scale path: sign-LSH
  buckets computed JVM-side from seed-deterministic hyperplanes; the query
  probes its own bucket plus all buckets within ``multiprobe`` bit flips,
  turning a full-corpus scan into a bucket-pruned one. Recall is tunable
  (more planes → smaller buckets; more probes → higher recall).
- ``ivf_topk`` — inverted-file variant: coarse centroids from a deterministic
  sample, each vector assigned to its nearest centroid (one broadcast join),
  queries probe the ``nprobe`` nearest centroids. The same structure as
  FAISS-IVF, expressed as two DataFrame joins.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from data_pipelines_spark.operators.dedup import cosine_similarity


def _query_lit(vec) -> Column:
    return F.array(*[F.lit(float(x)) for x in vec])


def brute_force_topk(
    df: DataFrame,
    query_vec,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact cosine top-k: returns (id, cosine) ordered desc, ties by id."""
    v = F.col(vec_col).cast("array<double>")
    cos = cosine_similarity(v, _query_lit(query_vec))
    return (
        df.select(F.col(id_col), cos.alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col(id_col))
        .limit(k)
    )


def _hyperplanes(dim: int, n_planes: int, seed: int) -> np.ndarray:
    """Seed-deterministic random hyperplanes (unit-free: sign test only)."""
    rng = np.random.RandomState(seed)
    return rng.randn(n_planes, dim)


def _fold_dot(a, b) -> float:
    """Left-fold dot product from 0.0 — the SAME summation order as the
    JVM-side ``F.aggregate(zip_with(...))`` and DuckDB's ``list_reduce``,
    so driver-computed buckets/probes agree bit-for-bit with both engines
    (numpy's pairwise-summation ``np.dot`` would not)."""
    acc = 0.0
    for x, y in zip(a, b):
        acc += float(x) * float(y)
    return acc


def _fold_cos(a, b) -> float:
    import math

    dot = _fold_dot(a, b)
    na = math.sqrt(_fold_dot(a, a))
    nb = math.sqrt(_fold_dot(b, b))
    return dot / (na * nb) if na > 0 and nb > 0 else 0.0


def random_hyperplane_bucket(
    vec: Column, planes: np.ndarray
) -> Column:
    """Sign-LSH bucket id: bit b = 1 iff vec · plane_b > 0. JVM-side."""
    bucket = F.lit(0).cast("long")
    for b, plane in enumerate(planes):
        dot = F.aggregate(
            F.zip_with(vec, F.array(*[F.lit(float(x)) for x in plane]), lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bucket = bucket + F.when(dot > 0, F.lit(1 << b)).otherwise(F.lit(0))
    return bucket


def _flip_masks(n_planes: int, multiprobe: int) -> list[int]:
    """Every XOR mask with popcount ≤ ``multiprobe`` — C(n_planes, ≤m) masks.

    XOR-ing a bucket with this set enumerates exactly its Hamming-≤m
    neighborhood, WITHOUT materializing the 2^n_planes bucket space (the
    round-2 batch path filtered ``sequence(0, 2^planes−1)`` per query row —
    fine at 8 planes, 16M array elements per row at 24).
    """
    from itertools import combinations

    masks = [0]
    for m in range(1, multiprobe + 1):
        for bits in combinations(range(n_planes), m):
            masks.append(sum(1 << b for b in bits))
    return masks


def _probe_buckets(query_bucket: int, n_planes: int, multiprobe: int) -> list[int]:
    """The query's bucket plus every bucket within ``multiprobe`` bit flips."""
    return sorted({query_bucket ^ m for m in _flip_masks(n_planes, multiprobe)})


def lsh_topk(
    df: DataFrame,
    query_vec,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_planes: int = 8,
    multiprobe: int = 1,
    seed: int = 42,
) -> DataFrame:
    """Approximate cosine top-k via sign-LSH bucket pruning.

    The bucket predicate is a plain ``isin`` filter on a derived column, so
    Catalyst keeps it JVM-side and the scan skips (1 - probed/2^planes) of
    the corpus on average.
    """
    q = np.asarray(query_vec, dtype=float)
    planes = _hyperplanes(len(q), n_planes, seed)
    qb = int(sum((1 << b) for b, p in enumerate(planes) if _fold_dot(q, p) > 0))
    probes = _probe_buckets(qb, n_planes, multiprobe)
    v = F.col(vec_col).cast("array<double>")
    bucketed = df.withColumn("_bkt", random_hyperplane_bucket(v, planes))
    cand = bucketed.where(F.col("_bkt").isin(probes))
    cos = cosine_similarity(v, _query_lit(q))
    return (
        cand.select(F.col(id_col), cos.alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col(id_col))
        .limit(k)
    )


def batch_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    q_id_col: str = "q_id",
    q_vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k for EVERY query row at once.

    Broadcast the query set (queries are the small side by construction),
    score corpus × queries in one pass, rank per query with a window —
    the batch-serving shape of ANN (one query at a time never saturates a
    cluster). Output: (q_id, vec_id, cosine, rank ≤ k).
    """
    q = F.broadcast(
        queries.select(
            F.col(q_id_col).alias("q_id"),
            F.col(q_vec_col).cast("array<double>").alias("_qv"),
        )
    )
    c = corpus.select(
        F.col(id_col).alias(id_col), F.col(vec_col).cast("array<double>").alias("_v")
    )
    scored = c.crossJoin(q).select(
        "q_id", id_col,
        cosine_similarity(F.col("_v"), F.col("_qv")).alias("cosine"),
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cosine").desc(), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)
    )


def batch_lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    q_id_col: str = "q_id",
    q_vec_col: str = "embedding",
    n_planes: int = 8,
    multiprobe: int = 1,
    seed: int = 42,
    dim: int | None = None,
) -> DataFrame:
    """Batch ANN with sign-LSH pruning: corpus and queries bucket with the
    same hyperplanes; each query expands to its Hamming-≤-multiprobe probe
    buckets by XOR against the C(n_planes, ≤multiprobe) flip masks (a
    driver-side constant array — scales in planes like the single-query
    path, never the 2^planes bucket space) and candidates come from a
    plain equi-join on the bucket — shuffle-or-broadcast joinable at any
    scale, then exact cosine rank inside candidates. Work drops by
    ~(probed/2^planes) versus the exact batch scan.
    """
    if dim is None:
        probe = corpus.where(F.col(vec_col).isNotNull()).select(vec_col).first()
        if probe is None:
            spark = corpus.sparkSession
            return spark.createDataFrame(
                [],
                f"q_id {queries.schema[q_id_col].dataType.simpleString()}, "
                f"{id_col} {corpus.schema[id_col].dataType.simpleString()}, "
                "cosine double, rank int",
            )
        dim = len(probe[0])
    planes = _hyperplanes(dim, n_planes, seed)
    c = corpus.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("_v")
    ).withColumn("_bkt", random_hyperplane_bucket(F.col("_v"), planes))
    qv = F.col(q_vec_col).cast("array<double>")
    q = queries.select(
        F.col(q_id_col).alias("q_id"),
        qv.alias("_qv"),
        random_hyperplane_bucket(qv, planes).alias("_qb"),
    )
    masks = _flip_masks(n_planes, multiprobe)
    probes = F.explode(
        F.transform(
            F.array(*[F.lit(m).cast("long") for m in masks]),
            lambda m: m.bitwiseXOR(F.col("_qb")),
        )
    ).alias("_bkt")
    q_probed = F.broadcast(q.select("q_id", "_qv", probes))
    cand = c.join(q_probed, "_bkt")
    scored = cand.select(
        "q_id", id_col,
        cosine_similarity(F.col("_v"), F.col("_qv")).alias("cosine"),
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cosine").desc(), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)
    )


def lloyd_refine(
    sample_rows: list[tuple[int, list[float]]],
    centroids: list[tuple[int, list[float]]],
    iters: int,
) -> list[tuple[int, list[float]]]:
    """Deterministic Lloyd iterations over a bounded sample, driver-side.

    Assignment uses the SAME score and tie-break as the distributed argmax
    (``fold_dot(v, c) / max(||c||, 1e-12)``, ties to the smaller centroid
    id), and each centroid update is an element-wise mean folded over the
    members in ascending vec_id order from 0.0 — every float op has a fixed
    order, so a SQL oracle replays the refinement bit-for-bit
    (``list_reduce`` folds left-to-right like this loop). Empty centroids
    keep their previous position.
    """
    import math

    cents = {ci: [float(x) for x in cv] for ci, cv in centroids}
    for _ in range(iters):
        norms = {
            ci: max(math.sqrt(_fold_dot(cv, cv)), 1e-12) for ci, cv in cents.items()
        }
        members: dict[int, list[tuple[int, list[float]]]] = {ci: [] for ci in cents}
        for vid, v in sample_rows:
            best, best_score = None, None
            for ci in sorted(cents):
                s = _fold_dot(v, cents[ci]) / norms[ci]
                if best is None or s > best_score:  # tie keeps the smaller cid
                    best, best_score = ci, s
            members[best].append((vid, v))
        for ci, ms in members.items():
            if not ms:
                continue
            ms.sort(key=lambda t: t[0])
            n = float(len(ms))
            new = []
            for d in range(len(cents[ci])):
                s = 0.0
                for _vid, v in ms:
                    s += float(v[d])
                new.append(s / n)
            cents[ci] = new
    return [(ci, cents[ci]) for ci in sorted(cents)]


def ivf_assign(
    df: DataFrame,
    n_centroids: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    sample_mod: int = 37,
    lloyd_iters: int = 0,
    sample_size: int | None = None,
) -> tuple[DataFrame, list[tuple[int, list[float]]]]:
    """Pick deterministic coarse centroids and assign every vector to its
    nearest one (broadcast argmin — no shuffle of the corpus).

    Centroids seed from the first ``n_centroids`` vectors by a hash-ordered
    sample (deterministic, no RNG on data). The ordering hash is a Knuth
    multiplicative scramble ``(id * 2654435761) mod 2^32 mod sample_mod`` —
    plain integer arithmetic any engine reproduces (the correctness oracle
    rebuilds the same centroid set in SQL). With ``lloyd_iters > 0`` the
    seeds are refined by that many k-means iterations over a bounded
    deterministic sample (the first ``sample_size`` vectors by the same
    scramble order, default ``16 * n_centroids``) — driver-side with fixed
    fold order, so the oracle replays it exactly and recall approaches a
    trained coarse quantizer without losing reproducibility. Returns
    (assigned_df, centroids).
    """
    scramble = F.pmod(
        F.pmod(F.col("cid_src") * F.lit(2654435761), F.lit(4294967296)),
        F.lit(sample_mod),
    )
    n_sample = (
        max(n_centroids, sample_size or 16 * n_centroids) if lloyd_iters else n_centroids
    )
    sample = (
        df.select(F.col(id_col).alias("cid_src"), F.col(vec_col).cast("array<double>").alias("cv"))
        .orderBy(scramble, F.col("cid_src"))
        .limit(n_sample)
        .collect()
    )
    centroids = [
        (i, [float(x) for x in r.cv]) for i, r in enumerate(sample[:n_centroids])
    ]
    if lloyd_iters:
        rows = [(int(r.cid_src), [float(x) for x in r.cv]) for r in sample]
        centroids = lloyd_refine(rows, centroids, lloyd_iters)
    v = F.col(vec_col).cast("array<double>")
    # cosine argmax with the row norm computed ONCE (not once per centroid)
    # and centroid norms folded in driver-side as literals — per row this is
    # n_centroids dot products + 1 norm fold instead of 2*n_centroids folds.
    # Since ||v|| > 0 is a common positive factor, argmax over dot/||c||
    # equals argmax over full cosine; ||v||=0 rows score 0 everywhere and
    # deterministically take centroid 0, same as before.
    import math

    scored = F.array(
        *[
            F.struct(
                (
                    F.aggregate(
                        F.zip_with(v, _query_lit(cv), lambda x, y: x * y),
                        F.lit(0.0),
                        lambda acc, x: acc + x,
                    )
                    / F.lit(max(math.sqrt(sum(x * x for x in cv)), 1e-12))
                ).alias("score"),
                F.lit(-ci).alias("neg_id"),
            )
            for ci, cv in centroids
        ]
    )
    best = F.array_max(scored)
    assigned = df.withColumn("_centroid", (-best["neg_id"]).cast("int"))
    return assigned, centroids


def ivf_topk(
    assigned: DataFrame,
    centroids: list[tuple[int, list[float]]],
    query_vec,
    k: int = 10,
    nprobe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Probe the ``nprobe`` centroids nearest the query, exact-rank inside."""
    q = np.asarray(query_vec, dtype=float)

    # fold-order cosine so the probe choice matches the SQL oracle exactly
    order = sorted(centroids, key=lambda c: (-_fold_cos(q, c[1]), c[0]))
    probe_ids = [c[0] for c in order[:nprobe]]
    v = F.col(vec_col).cast("array<double>")
    cos = cosine_similarity(v, _query_lit(q))
    return (
        assigned.where(F.col("_centroid").isin(probe_ids))
        .select(F.col(id_col), cos.alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col(id_col))
        .limit(k)
    )
