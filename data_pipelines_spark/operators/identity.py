"""J6: rescrape identity preservation.

Reference ``boxing/extract/page/boxer/urls/existing_boxers.py:146-186``: the
pipeline keeps a url → {slug, boxer_name, boxrec_id, db_id} mapping so a
re-scraped page never loses (or silently changes) the identity minted on
first sight — freshly extracted values fill gaps only.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def preserve_identity(
    incoming: DataFrame,
    existing: DataFrame,
    key: str = "url",
    preserve: Sequence[str] = ("slug", "name", "boxrec_id"),
) -> DataFrame:
    """Re-attach previously assigned identity columns across rescrapes.

    One broadcast left join on ``key``; for every column in ``preserve`` the
    EXISTING value wins when present and the freshly extracted value only
    fills gaps — the reference's mapping semantics as a single projection.
    ``existing`` needs only (key + preserve) columns, so the join side stays
    a thin identity table (broadcastable at any corpus size where the
    identity map fits an executor; drop the hint past that and let AQE pick).
    """
    missing = [c for c in preserve if c not in existing.columns]
    if missing:
        raise ValueError(f"existing side lacks identity columns: {missing}")
    # the identity table is a unique url → identity mapping by contract;
    # enforce one row per key deterministically (lexicographic max of the
    # preserved tuple) so an un-deduped historical read can never fan out
    # incoming rows through the join
    ex = (
        existing.groupBy(key)
        .agg(F.max(F.struct(*[F.col(c) for c in preserve])).alias("_id"))
        .select(
            F.col(key),
            *[F.col(f"_id.{c}").alias(f"_ex_{c}") for c in preserve],
        )
    )
    joined = incoming.join(F.broadcast(ex), on=key, how="left")
    out_cols = []
    for c in incoming.columns:
        if c in preserve:
            out_cols.append(F.coalesce(F.col(f"_ex_{c}"), F.col(c)).alias(c))
        else:
            out_cols.append(F.col(c))
    return joined.select(*out_cols)
