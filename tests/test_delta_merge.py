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
    # pre-compaction files stay pinned by retained version snapshots (time
    # travel); vacuum drops the snapshots and THEN reclaims the space
    live = {os.path.join(job.table_dir, f) for f in m2.committed_files()}
    on_disk = set(glob.glob(os.path.join(job.table_dir, "p=*", "*.parquet")))
    assert live < on_disk
    job.vacuum(keep_last=1)
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


def test_reshard_preserves_state_and_counters(workdir):
    """4 -> 8 -> 3 partitions: live table byte-equal across reshards,
    cumulative counters preserved via retired_counters, old files GCed."""
    d, job = _mk_job(workdir, BIG_BASE, events_per_batch=10)
    m = job.run(base_path=d["base_path"])
    before = job.read_table_arrow()
    totals = {f: m.total(f) for f in
              ("rows_applied", "dedup_count", "conflict_count",
               "replay_skipped")}

    for new_p in (8, 3):
        job2 = CDCJob(job.table_dir, job.wal_dir, num_partitions=new_p)
        m = job2.reshard(new_p)
        assert m.num_partitions == new_p
        assert job2.read_table_arrow().equals(before)
        for f, v in totals.items():
            assert m.total(f) == v, f
        # pre-reshard files stay pinned by retained snapshots (time travel
        # works across reshards); vacuum reclaims them
        live = {os.path.join(job.table_dir, f) for f in m.committed_files()}
        job2.vacuum(keep_last=1)
        on_disk = set(glob.glob(
            os.path.join(job.table_dir, "p=*", "*.parquet")))
        assert on_disk == live


def test_apply_after_reshard_matches_oracle(workdir):
    """Apply half the WAL at P=4, reshard to 7, apply the rest: final state
    and cumulative counters must equal the single-pass oracle's."""
    spec = WalSpec(seed=41, n_convs=60, turns_per_conv=3, n_events=600,
                   n_segments=6, dup_redelivery_frac=0.1,
                   out_of_order_frac=0.2, frac_delete=0.2)
    d = synthesize(spec, workdir)
    wal_dir = os.path.join(workdir, "wal")
    # hold back the last 3 segments
    held = sorted(os.listdir(wal_dir))[3:]
    for fn in held:
        os.rename(os.path.join(wal_dir, fn), os.path.join(workdir, fn))
    job = CDCJob(os.path.join(workdir, "table"), wal_dir, num_partitions=4,
                 events_per_batch=10**9)
    job.run(base_path=d["base_path"])

    m = job.reshard(7)
    assert m.num_partitions == 7

    for fn in held:  # second wave arrives after the reshard
        os.rename(os.path.join(workdir, fn), os.path.join(wal_dir, fn))
    job2 = CDCJob(job.table_dir, wal_dir, num_partitions=7,
                  events_per_batch=10**9)
    m = job2.run()
    o = replay(d["base"], d["wal"], 7)
    got = job2.read_table_arrow()
    assert got.select(o.final.column_names).equals(o.final)
    assert m.total("rows_applied") == o.rows_applied
    assert m.total("conflict_count") == o.conflict_count
    assert m.total("dedup_count") + m.total("replay_skipped") == o.dedup_count


def test_reshard_keeps_tombstone_protection(workdir):
    """A delete committed before a reshard must still beat an out-of-order
    older update arriving after the reshard (tombstones travel with their
    (ts, lsn))."""
    import pyarrow.parquet as pq_

    from cwds_jobs_ray.synth import make_base

    base = make_base(WalSpec(seed=51, n_convs=4, turns_per_conv=2,
                             n_events=0))
    base_path = os.path.join(workdir, "base.parquet")
    pq_.write_table(base, base_path)
    wal_dir = os.path.join(workdir, "wal")
    os.makedirs(wal_dir)
    t0 = 1_700_000_900_000_000
    seg1 = pa.table({
        "lsn": pa.array([1], pa.int64()), "op": pa.array(["D"]),
        "conv_id": pa.array(["c000001"]), "turn_idx": pa.array([0], pa.int32()),
        "role": pa.array([None], pa.string()),
        "text": pa.array([None], pa.string()),
        "tool": pa.array([None], pa.string()),
        "ts": pa.array([t0 + 10**6], pa.timestamp("us")),
    })
    pq_.write_table(seg1, os.path.join(wal_dir, "segment-00000.parquet"))
    job = CDCJob(os.path.join(workdir, "table"), wal_dir, num_partitions=2,
                 events_per_batch=10**9)
    job.run(base_path=base_path)
    job.reshard(5)

    seg2 = seg1.set_column(0, "lsn", pa.array([2], pa.int64()))
    seg2 = seg2.set_column(1, "op", pa.array(["U"]))
    seg2 = seg2.set_column(4, "role", pa.array(["user"]))
    seg2 = seg2.set_column(5, "text", pa.array(["zombie update"]))
    seg2 = seg2.set_column(7, "ts", pa.array([t0], pa.timestamp("us")))  # OLDER
    pq_.write_table(seg2, os.path.join(wal_dir, "segment-00001.parquet"))
    job2 = CDCJob(job.table_dir, wal_dir, num_partitions=5,
                  events_per_batch=10**9)
    job2.run()
    got = job2.read_table_arrow().to_pandas()
    key = got[(got["conv_id"] == "c000001") & (got["turn_idx"] == 0)]
    assert key.empty, "older out-of-order update resurrected a deleted key"


def test_merge_policy_recorded_and_enforced(workdir):
    """The conflict policy is part of the committed table: readers use the
    manifest's policy regardless of their own default, and a job configured
    with a different policy fails fast instead of mis-merging deltas."""
    d, job = _mk_job(workdir, BIG_BASE, events_per_batch=10,
                     merge_policy="fww")
    m = job.run(base_path=d["base_path"])
    assert any(m.part(i).delta_files for i in range(P))
    o = replay(d["base"], d["wal"], P, policy="fww")
    # a reader constructed with the DEFAULT (lww) policy still merges fww
    reader = CDCJob(job.table_dir, wal_dir="/nonexistent")
    assert reader.read_table_arrow().select(
        o.final.column_names).equals(o.final)
    # but applying with the wrong policy is refused
    import pyarrow.parquet as pq_
    seg = pq_.read_table(os.path.join(workdir, "wal",
                                      sorted(os.listdir(
                                          os.path.join(workdir, "wal")))[0]))
    wrong = CDCJob(job.table_dir, os.path.join(workdir, "wal"),
                   merge_policy="lww")
    with pytest.raises(RuntimeError, match="merge_policy"):
        wrong.apply_wal()


def test_merge_task_is_idempotent_under_retry(workdir):
    """Ray retries a failed merge task from scratch: running the same merge
    twice must produce byte-identical files and identical stats (pure
    function of committed state + delta group; atomic deterministic path)."""
    import pyarrow.compute as pc

    from cwds_jobs_ray.schema import CHANGE_SCHEMA_V2
    from cwds_jobs_ray.stages.merge import (make_combiner,
                                            make_partition_merger)
    from cwds_jobs_ray.synth import WalSpec, make_base, make_wal

    base = make_base(WalSpec(seed=61, n_convs=6, turns_per_conv=2))
    wal = make_wal(WalSpec(seed=61, n_convs=6, turns_per_conv=2,
                           n_events=50, dup_redelivery_frac=0.2,
                           out_of_order_frac=0.2))
    table_dir = os.path.join(workdir, "table")
    os.makedirs(table_dir)
    combine = make_combiner(CHANGE_SCHEMA_V2, 2)
    combined = combine(wal)
    group = combined.filter(pc.equal(combined["part"], 0))
    from cwds_jobs_ray.schema import TRANSCRIPT_SCHEMA
    merger = make_partition_merger(table_dir, 1, TRANSCRIPT_SCHEMA,
                                   {0: 0, 1: 0}, {})
    s1 = merger(group)
    with open(os.path.join(table_dir, s1.iloc[0]["file"]), "rb") as f:
        bytes1 = f.read()
    s2 = merger(group)  # the "retry"
    with open(os.path.join(table_dir, s2.iloc[0]["file"]), "rb") as f:
        bytes2 = f.read()
    assert s1.equals(s2)
    assert bytes1 == bytes2
