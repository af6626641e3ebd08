"""Link-graph analytics: PageRank power iteration, DataFrame-native.

The URL-harvest operator (extract/html.py §2.9c) turns a crawled corpus into
a link graph; ranking that graph is how a crawl frontier decides what to
fetch next (priority for :func:`operators.frontier.schedule_fetches`) and
how a training-data pipeline weighs domain authority. This is the classic
power iteration expressed as joins/aggregations — no GraphX, no RDDs:

    contrib[dst]  = Σ_src→dst  d · rank[src] / outdeg[src]
    rank'[node]   = (1 - d)/N + contrib[node] + d · dangling_mass/N

Dangling nodes (no out-links — every crawl graph has them: leaf pages,
un-fetched frontier URLs) donate their rank mass uniformly, the standard
correction that keeps Σrank = 1 every iteration.

Scale shape: per iteration ONE shuffle join (ranks ⋈ edges on src — edges
pre-partitioned by src would make it co-located) + one groupBy(dst), plus a
2-value driver aggregate for the dangling mass. Ranks are eagerly
``localCheckpoint``ed each round: each iteration references the previous
ranks THREE times (contrib join, dangling mass, carry-through), and Spark
does not CSE repeated plan subtrees — without truncation the logical plan
doubles per round (the near_dup_clusters lesson, CLAUDE.md). The previous
checkpoint is unpersisted only after the new one materializes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    *,
    iters: int = 3,
    damping: float = 0.85,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Rank every node of ``edges`` (directed, deduplicated internally)
    after ``iters`` power iterations from the uniform start. Returns
    ``(node, rank)`` with Σrank = 1 (up to float addition).

    Deterministic: no sampling, no convergence-dependent early exit — a
    fixed iteration count replays identically, which is what makes the
    result SQL-oracle-checkable and usable as a stable frontier priority.
    """
    if iters < 1:
        raise ValueError("iters must be ≥ 1")
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).distinct()
    nodes = e.select(F.col("src").alias("node")).union(
        e.select(F.col("dst").alias("node"))
    ).distinct()
    outdeg = e.groupBy("src").agg(F.count("*").alias("deg"))
    # n is O(1) driver-side; nodes/outdeg are reused every iteration
    nodes = nodes.localCheckpoint(eager=True)
    n = nodes.count()
    base = (1.0 - damping) / n

    ranks = nodes.withColumn("rank", F.lit(1.0 / n)).localCheckpoint(eager=True)
    for _ in range(iters):
        with_deg = ranks.join(outdeg, ranks["node"] == outdeg["src"], "left")
        dangling = (
            with_deg.where(F.col("deg").isNull())
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)))
            .collect()[0][0]
        )
        contribs = (
            e.join(ranks, e["src"] == ranks["node"])
            .join(outdeg, "src")
            .select("dst", (F.col("rank") / F.col("deg")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("contrib"))
        )
        new_ranks = (
            nodes.join(contribs, nodes["node"] == contribs["dst"], "left")
            .select(
                "node",
                (
                    F.lit(base)
                    + F.lit(damping) * F.coalesce(F.col("contrib"), F.lit(0.0))
                    + F.lit(damping * dangling / n)
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
        ranks.unpersist()
        ranks = new_ranks
    return ranks
