"""Cost-model evidence for the CDC-synced search index: build the index
over a LARGE committed table, drain a SMALL tail of the WAL, and compare
sync() wall vs a from-scratch full_build() at the same version (plus
shard-for-shard equality). Sync cost = feed cost (delta-proportional by
construction) + rewrite of TOUCHED shards; the probe reports how many
shards the delta touched.

KNOWN DEGENERACY on the synthetic corpus (measured, see BASELINE.md): the
transcript vocabulary is 25 words, so ANY non-trivial delta contains
every token and touches ALL shards — sync then rewrites the whole index
and cannot beat a rebuild. The shard-pruning win requires
|distinct changed tokens| << n_shards, i.e. a realistic Zipf vocabulary
(the doc-side index proves the pruning mechanism itself with the
delete-other-shards test in tests/test_text_index.py). The feed dimension
IS delta-proportional here (feed_rows << table_rows in the output).

Use tail_segments >= 2: the synth places redelivery/out-of-order events
in the last two segments (they span the whole lsn range), so excluding
only the final segment leaves the head's applied_through at the global
max lsn and the engine CORRECTLY skips the excluded segment as a pure
redelivery tail (committed-iff-max_lsn dedup; measured: tail=1 ->
feed_rows=0, sync a no-op) — correct behavior, but nothing to measure.

Usage: python tools/index_sync_probe.py [n_events] [tail_segments]
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")


def main():
    n_events = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    tail = int(sys.argv[2]) if len(sys.argv) > 2 else 2

    import ray
    ray.init(address="local", num_cpus=32, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    from cwds_jobs_ray.pipelines.cdc import CDCJob
    from cwds_jobs_ray.pipelines.text_index import TranscriptTextIndex
    from cwds_jobs_ray.synth import WalSpec, synthesize

    spec = WalSpec(seed=9, n_convs=max(100, n_events // 100),
                   turns_per_conv=8, n_events=n_events, n_segments=32,
                   dup_redelivery_frac=0.05, out_of_order_frac=0.10,
                   hot_key_frac=0.05, schema_v1_segments=0)
    work = f"/tmp/index_sync_probe_{n_events}"
    shutil.rmtree(work, ignore_errors=True)
    os.makedirs(work)
    d = synthesize(spec, work)
    wal = f"{work}/wal"
    segs = sorted(os.listdir(wal))
    head = f"{work}/wal_head"
    os.makedirs(head)
    for s in segs[:len(segs) - tail]:
        os.link(os.path.join(wal, s), os.path.join(head, s))

    table_dir = f"{work}/table"
    job_a = CDCJob(table_dir, head, num_partitions=32,
                   events_per_batch=n_events * 2)
    job_a.run(base_path=d["base_path"])
    idx = TranscriptTextIndex(job_a)
    t0 = time.perf_counter()
    idx.full_build()
    build_a = time.perf_counter() - t0

    job_b = CDCJob(table_dir, wal, num_partitions=32,
                   events_per_batch=n_events * 2)
    job_b.run()
    feed_rows = job_b.read_changes(
        idx._state()["applied_version"]).count()
    t0 = time.perf_counter()
    synced = TranscriptTextIndex(job_b)
    synced.sync()
    sync_s = time.perf_counter() - t0

    rebuilt = TranscriptTextIndex(job_b, name="text_index_rebuild")
    t0 = time.perf_counter()
    rebuilt.full_build()
    rebuild_s = time.perf_counter() - t0

    import pyarrow.parquet as pq
    sa, sb = synced._state(), rebuilt._state()
    touched = sum(1 for k, v in sa["files"].items()
                  if f".v{sa['applied_version']}." in v)
    same = all(
        pq.read_table(f"{synced.dir}/{sa['files'][k]}").equals(
            pq.read_table(f"{rebuilt.dir}/{sb['files'][k]}"))
        for k in sa["files"])
    n_rows = job_b.read_table_arrow().num_rows
    import json
    print(json.dumps({
        "n_events": n_events, "table_rows": int(n_rows),
        "feed_rows": int(feed_rows), "tail_segments": tail,
        "full_build_sec": round(build_a, 3),
        "sync_sec": round(sync_s, 3),
        "rebuild_sec": round(rebuild_s, 3),
        "sync_speedup_vs_rebuild": round(rebuild_s / max(sync_s, 1e-9), 2),
        "shards_touched": int(touched), "n_shards": synced.n_shards,
        "shards_equal": bool(same)}))
    ray.shutdown()


if __name__ == "__main__":
    main()
