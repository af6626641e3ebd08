"""Key-zone-map pruning evidence for the point-lookup serving path.

Measures what `compact(sort_by_key=True, target_file_rows=N)` buys a
`read_keys` lookup at the headline table size: the same 1M-event / ~120k-key
ingest bench.py uses, one 20-key lookup, two layouts —

- plain compaction (one file per bucket, no key bounds worth pruning on);
- key-clustered, 512-row files (non-overlapping key ranges per file,
  `key_min`/`key_max` stamped in the manifest).

Reported per layout: files touched / files in the looked-up buckets, and
bytes touched / bytes in those buckets (manifest `bytes`), plus lookup
wall. The skip fraction is layout-determined — independent of table size —
so at 100 TB, where a bucket's base is GBs, the same ratio is the
difference between GBs and MBs per lookup. Prints one JSON line; paste the
table into BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    n_events = int(os.environ.get("BENCH_EVENTS", "1000000"))
    from data_pipelines_spark.gen.changegen import change_stream
    from data_pipelines_spark.session import get_spark
    from data_pipelines_spark.streaming.pipeline import CdcPipeline, PipelineConfig

    spark = get_spark("keylookup", master="local[32]", shuffle_partitions=32)
    work = tempfile.mkdtemp(prefix="bench_kl_")
    changes = change_stream(
        spark, n_events=n_events, n_keys=max(64, n_events // 8), seed=42
    )
    pipe = CdcPipeline(
        spark,
        PipelineConfig(
            table_root=os.path.join(work, "t"), n_buckets=32, decode=True
        ),
    )
    pipe.process_batch(changes, batch_id=0)
    t = pipe.table
    keys = [r[0] for r in t.read(columns=[]).select("url").limit(20).collect()]

    out: dict = {"events": n_events, "n_keys_lookup": len(keys), "layouts": {}}
    for name, kwargs in [
        ("plain", {}),
        ("key_sorted_512", {"sort_by_key": True, "target_file_rows": 512}),
    ]:
        t.compact(batch_id=f"kl-{name}", **kwargs)
        df = t.read_keys(keys)
        t0 = time.time()
        rows = df.count()
        wall = time.time() - t0
        touched = {os.path.normpath(p.removeprefix("file:")) for p in df.inputFiles()}
        snap = t._snapshot()
        from data_pipelines_spark.functions.hashing import bucket_id
        from pyspark.sql import functions as F

        want = {
            r[0]
            for r in spark.createDataFrame([(k,) for k in keys], "url string")
            .select(bucket_id(F.col("url"), t.n_buckets).alias("b"))
            .collect()
        }
        tot_files = tot_bytes = hit_bytes = 0
        for b, fes in t._resolve_files(snap).items():
            if int(b) not in want:
                continue
            for fe in fes:
                tot_files += 1
                tot_bytes += fe["bytes"]
                if os.path.normpath(os.path.join(t.root, fe["path"])) in touched:
                    hit_bytes += fe["bytes"]
        out["layouts"][name] = {
            "rows": rows,
            "lookup_sec": round(wall, 3),
            "files_touched": len(touched),
            "files_in_buckets": tot_files,
            "bytes_touched": hit_bytes,
            "bytes_in_buckets": tot_bytes,
        }

    # continuous ingest on the serving layout: merge a fresh small batch
    # (un-sorted deltas whose key range spans everything) with the bloom
    # profile on — the same lookup must stay ~k files because the per-file
    # key blooms skip deltas that lack the looked-up keys
    t.key_bloom_rows = 8192
    extra = change_stream(
        spark, n_events=20000, n_keys=max(64, n_events // 8), seed=43
    )
    pipe.process_batch(extra, batch_id=1)
    df = t.read_keys(keys)
    t0 = time.time()
    rows = df.count()
    wall = time.time() - t0
    touched = {os.path.normpath(p.removeprefix("file:")) for p in df.inputFiles()}
    snap = t._snapshot()
    deltas_in_buckets = bloomed = 0
    for b, fes in t._resolve_files(snap).items():
        if int(b) not in want:
            continue
        for fe in fes:
            if fe.get("kind") == "delta":
                deltas_in_buckets += 1
                bloomed += 1 if "kbf" in fe else 0
    deltas_touched = sum(
        1
        for b, fes in t._resolve_files(snap).items()
        if int(b) in want
        for fe in fes
        if fe.get("kind") == "delta"
        and os.path.normpath(os.path.join(t.root, fe["path"])) in touched
    )
    out["with_fresh_deltas_bloom"] = {
        "rows": rows,
        "lookup_sec": round(wall, 3),
        "files_touched": len(touched),
        "delta_files_in_buckets": deltas_in_buckets,
        "delta_files_bloomed": bloomed,
        "delta_files_touched": deltas_touched,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
