"""Delta-file merge-on-read: per-batch write amplification bounded to
O(delta), byte-equal final state, size-tiered fold-in, compaction, and the
verify-on-open sentinel.

Reference analogue for the commit discipline: savepoint advance only after
the sink flush (/root/reference/jobs-common/src/main/java/gov/ca/cwds/jobs/common/batch/BatchProcessor.java:56-67);
the delta/compaction model itself is Ray-native (the reference's sink is
Elasticsearch, which absorbs per-doc upserts natively).
"""

import glob
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from cwds_jobs_ray.pipelines.cdc import CDCJob
from cwds_jobs_ray.pipelines.oracle import replay
from cwds_jobs_ray.state.manifest import Manifest
from cwds_jobs_ray.synth import WalSpec, synthesize

P = 4


def _mk_job(workdir, spec, events_per_batch, **kw):
    d = synthesize(spec, workdir)
    job = CDCJob(os.path.join(workdir, "table"), os.path.join(workdir, "wal"),
                 num_partitions=P, events_per_batch=events_per_batch, **kw)
    return d, job


BIG_BASE = WalSpec(seed=21, n_convs=300, turns_per_conv=5, n_events=120,
                   n_segments=12, dup_redelivery_frac=0.1,
                   out_of_order_frac=0.2, frac_delete=0.2)


def test_delta_files_bound_write_amplification(workdir):
    """Small batches over a large base must write per-partition DELTA files
    (bytes ∝ delta), leave the base files untouched, and still replay to the
    oracle's exact final state with exact counters."""
    d, job = _mk_job(workdir, BIG_BASE, events_per_batch=10,
                     max_delta_files=100)
    m0 = job.initial_load(d["base_path"], None)
    base_files = {i: m0.part(i).file for i in range(P)}
    base_mtimes = {i: os.path.getmtime(os.path.join(job.table_dir, f))
                   for i, f in base_files.items() if f}

    m = job.run()
    # deltas exist, bases untouched
    assert any(m.part(i).delta_files for i in range(P))
    for i, f in base_files.items():
        assert m.part(i).file == f, "base rewritten despite tiny deltas"
        assert os.path.getmtime(os.path.join(job.table_dir, f)) \
            == base_mtimes[i]
    # every delta file is small relative to its base
    for i in range(P):
        for rel in m.part(i).delta_files:
            assert pq.ParquetFile(
                os.path.join(job.table_dir, rel)).metadata.num_rows \
                <= m.part(i).base_file_rows * job.delta_threshold

    o = replay(d["base"], d["wal"], P)
    got = job.read_table_arrow()
    assert got.select(o.final.column_names).equals(o.final)
    assert m.total("rows_applied") == o.rows_applied
    assert m.total("conflict_count") == o.conflict_count
    assert m.total("dedup_count") + m.total("replay_skipped") == o.dedup_count


def test_size_tier_folds_deltas_into_base(workdir):
    """Once accumulated deltas cross max_delta_files, the next batch folds
    everything into a fresh base; state stays byte-equal."""
    spec = WalSpec(seed=22, n_convs=100, turns_per_conv=4, n_events=300,
                   n_segments=30, out_of_order_frac=0.2, frac_delete=0.15)
    d, job = _mk_job(workdir, spec, events_per_batch=10, max_delta_files=3)
    m = job.run(base_path=d["base_path"])
    # 30 batches with max 3 deltas per partition: fold-ins must have happened
    assert all(len(m.part(i).delta_files) <= 3 for i in range(P))
    assert m.table_version > 10
    o = replay(d["base"], d["wal"], P)
    assert job.read_table_arrow().select(o.final.column_names).equals(o.final)
    assert m.total("conflict_count") == o.conflict_count
    assert m.total("dedup_count") + m.total("replay_skipped") == o.dedup_count


def test_read_table_dataset_merges_deltas(workdir):
    d, job = _mk_job(workdir, BIG_BASE, events_per_batch=10)
    m = job.run(base_path=d["base_path"])
    assert any(m.part(i).delta_files for i in range(P))
    o = replay(d["base"], d["wal"], P)
    got = (job.read_table().to_pandas()
           .sort_values(["conv_id", "turn_idx"], kind="stable")
           .reset_index(drop=True))
    exp = o.final.select(
        ["conv_id", "turn_idx", "role", "text", "tool", "ts"]).to_pandas()
    assert got[exp.columns.tolist()].equals(exp)


def test_compact_folds_deltas_and_drops_tombstones(workdir):
    d, job = _mk_job(workdir, BIG_BASE, events_per_batch=10)
    m = job.run(base_path=d["base_path"])
    assert any(m.part(i).delta_files for i in range(P))
    before = job.read_table_arrow()
    m2 = job.compact(tombstone_horizon_lsn=10**9)
    assert all(not m2.part(i).delta_files for i in range(P))
    assert job.read_table_arrow().equals(before)
    # all tombstones gone from disk
    for i in range(P):
        t = pq.read_table(os.path.join(job.table_dir, m2.part(i).file))
        assert t.filter(pa.compute.equal(t["op"], "D")).num_rows == 0
    # old version files GCed
    live = {os.path.join(job.table_dir, f) for f in m2.committed_files()}
    on_disk = set(glob.glob(os.path.join(job.table_dir, "p=*", "*.parquet")))
    assert on_disk == live


def test_verify_on_open_catches_corruption(workdir):
    d, job = _mk_job(workdir, WalSpec(seed=23, n_convs=10, turns_per_conv=2,
                                      n_events=40, n_segments=2),
                     events_per_batch=10**9)
    m = job.run(base_path=d["base_path"])
    victim = next(os.path.join(job.table_dir, m.part(i).file)
                  for i in range(P) if m.part(i).file)
    with open(victim, "wb") as f:
        f.write(b"not a parquet file")
    with pytest.raises(RuntimeError, match="unreadable or corrupt"):
        job.read_table()


def test_verify_on_open_catches_foreign_file(workdir):
    d, job = _mk_job(workdir, WalSpec(seed=24, n_convs=10, turns_per_conv=2,
                                      n_events=40, n_segments=2),
                     events_per_batch=10**9)
    m = job.run(base_path=d["base_path"])
    victim = next(os.path.join(job.table_dir, m.part(i).file)
                  for i in range(P) if m.part(i).file)
    pq.write_table(pa.table({"who": ["am i"]}), victim)
    with pytest.raises(RuntimeError, match="lacks key column"):
        job.read_table()


def test_crash_between_delta_write_and_commit_resumes_exactly(workdir):
    """Crash after delta files are written but before the manifest swap: the
    resume re-applies the batch; uncommitted deltas are GCed; final state and
    counters match the oracle."""
    d, job = _mk_job(workdir, BIG_BASE, events_per_batch=40)
    calls = {"n": 0}

    def boom(_m):
        calls["n"] += 1
        if calls["n"] == 2:
            raise RuntimeError("crash before commit")

    with pytest.raises(RuntimeError, match="crash before commit"):
        job.run(base_path=d["base_path"], on_before_commit=boom)
    m1 = Manifest.load(job.table_dir)
    m = job.run()  # resume
    assert m.applied_through_lsn > m1.applied_through_lsn
    o = replay(d["base"], d["wal"], P)
    assert job.read_table_arrow().select(o.final.column_names).equals(o.final)
    assert m.total("conflict_count") == o.conflict_count
    assert m.total("dedup_count") + m.total("replay_skipped") == o.dedup_count
