"""Sustained-ingest soak: millions of change events through the full path
(generate → change filter → dedup shuffle → decode UDFs → delta MERGE →
staggered compaction), then prove the final state.

Proof obligations recorded in BENCH/SOAK.md:
- final table state checksum == single-pass LWW oracle checksum (replay
  equivalence at soak scale, not just in unit tests);
- the data-quality suite (unique keys, non-null key) passes on the result;
- sustained events/sec, compaction count, commit-chain length.

Usage: python scripts/soak.py [n_events] [n_batches] [cpus]
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    n_events = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    cpus = int(sys.argv[3]) if len(sys.argv) > 3 else 8

    from pyspark.sql import functions as F

    from data_pipelines_spark.gen.changegen import change_stream, expected_final_state
    from data_pipelines_spark.operators.validation import (
        duplicate_keys,
        not_null,
        run_suite,
        suite_passed,
    )
    from data_pipelines_spark.session import get_spark
    from data_pipelines_spark.streaming.pipeline import CdcPipeline, PipelineConfig

    spark = get_spark(
        "soak",
        master=f"local[{cpus}]",
        shuffle_partitions=2 * cpus,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    # generation is a pure function of offset — no persist (a multi-GB cache
    # would spill and serialize every batch, see CLAUDE.md); each batch
    # regenerates its slice in parallel, playing the role of the source read.
    changes = change_stream(spark, n_events=n_events, n_keys=n_events // 8, seed=42)
    work = tempfile.mkdtemp(prefix="soak_")
    # change_filter ON, deletes ON: hash-unchanged re-scrapes become seq-bump
    # deltas that advance the stored sequence, so the filtered replay is
    # checksum-EQUAL to the single-pass LWW oracle even with out-of-order
    # deletes in the stream — the soak proves the bump design at scale.
    pipe = CdcPipeline(
        spark,
        PipelineConfig(
            table_root=os.path.join(work, "t"),
            n_buckets=64,
            decode=True,
            change_filter=True,
        ),
    )
    t0 = time.time()
    stats = pipe.run_batches(changes, n_batches=n_batches)
    elapsed = time.time() - t0

    final = pipe.table.read()
    n_final = final.count()
    ck = F.expr("bit_xor(xxhash64(url, offset))")  # order-insensitive, no overflow
    checksum = final.agg(ck).collect()[0][0]
    oracle = expected_final_state(changes)
    oracle_checksum = oracle.agg(ck).collect()[0][0]
    n_oracle = oracle.count()

    results = run_suite(final, [duplicate_keys(["url"]), not_null("url")])
    ok = suite_passed(results)
    compactions = sum(1 for s in stats if s.compacted_buckets)

    md = f"""# SOAK — sustained ingest at {n_events:,} events

`python scripts/soak.py {n_events} {n_batches} {cpus}` — full path with the
change filter ON (hash-unchanged re-scrapes → seq-bump deltas →
single-shuffle dedup → Arrow decode UDFs → delta MERGE → tombstoned
deletes → staggered compaction) on local[{cpus}], {n_batches} microbatches,
n_buckets=64, ~{n_events // 8:,} distinct keys, skewed/out-of-order/
duplicated stream (seed 42).

| metric | value |
|---|---|
| events ingested | {n_events:,} |
| wall time | {elapsed:,.1f} s |
| sustained throughput | {n_events / elapsed:,.0f} events/sec |
| microbatches | {n_batches} (compaction follow-ups: {compactions}) |
| final live rows | {n_final:,} |
| LWW oracle rows | {n_oracle:,} |
| state checksum == oracle checksum | {checksum == oracle_checksum} ({checksum}) |
| quality suite (unique key, non-null key) | {"PASS" if ok else "FAIL"} |
| snapshot chain length | {pipe.table.current_version()} |

The checksum equality is the replay-equivalence criterion at soak scale:
batch slicing, duplicate deliveries, seq-bump change filtering with
out-of-order deletes, compaction and tombstone handling did not change the
final state vs a single-pass LWW over the whole log.
"""
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "SOAK.md"), "w") as f:
        f.write(md)
    print(md)
    spark.stop()
    sys.exit(0 if (checksum == oracle_checksum and n_final == n_oracle and ok) else 1)


if __name__ == "__main__":
    main()
