"""Crash/resume — analogue of the reference's broken-service tests
(/root/reference/jobs-common/src/test/java/gov/ca/cwds/jobs/common/JobMainTest.java:168-207:
savepoint sticks at the last good batch; a re-run applies only the remainder)."""

import os

import pytest

from cwds_jobs_ray.pipelines.cdc import CDCJob
from cwds_jobs_ray.pipelines.oracle import replay
from cwds_jobs_ray.state.manifest import INITIAL_RESUME, INCREMENTAL_LOAD, Manifest
from cwds_jobs_ray.synth import WalSpec, synthesize


class Boom(Exception):
    pass


SPEC = WalSpec(seed=21, n_convs=20, turns_per_conv=4, n_events=300, n_segments=6,
               dup_redelivery_frac=0.05, out_of_order_frac=0.15,
               schema_v1_segments=2, hot_key_frac=0.3)


def test_crash_mid_wal_then_resume(workdir):
    d = synthesize(SPEC, workdir)
    job = CDCJob(os.path.join(workdir, "table"), os.path.join(workdir, "wal"),
                 num_partitions=4, events_per_batch=100)

    calls = {"n": 0}

    def crash(_manifest):
        calls["n"] += 1
        if calls["n"] == 2:
            raise Boom()

    with pytest.raises(Boom):
        job.run(base_path=d["base_path"], on_before_commit=crash)

    stuck = Manifest.load(os.path.join(workdir, "table"))
    assert stuck.table_version == 1  # savepoint stuck at last good batch
    assert stuck.job_mode == INITIAL_RESUME

    # plain re-run (no args!) applies only the remainder and finalizes
    m = job.run()
    assert m.job_mode == INCREMENTAL_LOAD
    o = replay(d["base"], d["wal"], 4)
    got = job.read_table_arrow()
    assert got.select(o.final.column_names).equals(o.final)
    assert m.total("conflict_count") == o.conflict_count


def test_crash_mid_snapshot_then_resume(workdir):
    d = synthesize(SPEC, workdir)
    table_dir = os.path.join(workdir, "table")
    job = CDCJob(table_dir, os.path.join(workdir, "wal"),
                 num_partitions=4, events_per_batch=100)

    # simulate dying right after the initial manifest write, before any
    # partition file is recorded
    m = Manifest.new(4)
    m.job_mode = INITIAL_RESUME
    m.base_path = d["base_path"]
    m.commit(table_dir)

    m2 = job.run()  # no base_path: must be recovered from the manifest
    assert m2.job_mode == INCREMENTAL_LOAD
    o = replay(d["base"], d["wal"], 4)
    assert job.read_table_arrow().select(o.final.column_names).equals(o.final)


def test_uncommitted_files_are_gced_on_resume(workdir):
    d = synthesize(SPEC, workdir)
    table_dir = os.path.join(workdir, "table")
    job = CDCJob(table_dir, os.path.join(workdir, "wal"),
                 num_partitions=4, events_per_batch=10**9)
    job.run(base_path=d["base_path"])

    # orphan file from a hypothetical crashed future batch (use a partition
    # dir that actually exists — hashing may leave some partitions empty)
    pdir = next(d for d in sorted(os.listdir(table_dir)) if d.startswith("p="))
    orphan = os.path.join(table_dir, pdir, "v99.parquet")
    open(orphan, "w").close()
    job.run()
    assert not os.path.exists(orphan)


def test_double_crash_same_batch(workdir):
    d = synthesize(SPEC, workdir)
    job = CDCJob(os.path.join(workdir, "table"), os.path.join(workdir, "wal"),
                 num_partitions=4, events_per_batch=100)

    def always_crash(_):
        raise Boom()

    with pytest.raises(Boom):
        job.run(base_path=d["base_path"], on_before_commit=always_crash)
    with pytest.raises(Boom):
        job.run(on_before_commit=always_crash)

    m = job.run()
    o = replay(d["base"], d["wal"], 4)
    assert job.read_table_arrow().select(o.final.column_names).equals(o.final)
    assert m.total("conflict_count") == o.conflict_count


def test_rewound_savepoint_replays_idempotently(workdir):
    # reference scenario: forced resume from a rewound savepoint applies only
    # what is missing (CwsFacilityJobTest.java:60-134 "resume from rewound
    # savepoint"); here a rewound global watermark makes the engine re-read
    # committed segments whose events are then replay-filtered per partition
    d = synthesize(SPEC, workdir)
    job = CDCJob(os.path.join(workdir, "table"), os.path.join(workdir, "wal"),
                 num_partitions=4, events_per_batch=100)
    m = job.run(base_path=d["base_path"])
    before = job.read_table_arrow()
    skipped_before = m.total("replay_skipped")

    # rewind the global savepoint halfway (partition watermarks untouched)
    m.applied_through_lsn //= 2
    m.commit(os.path.join(workdir, "table"))

    m2 = job.run()
    assert m2.applied_through_lsn == 300  # watermark restored to the true max
    assert m2.total("replay_skipped") > skipped_before  # replays were filtered
    assert job.read_table_arrow().equals(before)  # state unchanged


def test_two_tables_are_independent(workdir):
    # one table per CDCJob instance (the reference runs one job per module);
    # manifests, files and watermarks must not interfere
    d1 = synthesize(WalSpec(seed=51, n_convs=5, turns_per_conv=2,
                            n_events=20, n_segments=1),
                    os.path.join(workdir, "a"))
    d2 = synthesize(WalSpec(seed=52, n_convs=7, turns_per_conv=3,
                            n_events=30, n_segments=1),
                    os.path.join(workdir, "b"))
    ja = CDCJob(os.path.join(workdir, "a/table"), os.path.join(workdir, "a/wal"),
                num_partitions=2, events_per_batch=10**9)
    jb = CDCJob(os.path.join(workdir, "b/table"), os.path.join(workdir, "b/wal"),
                num_partitions=4, events_per_batch=10**9)
    ma = ja.run(base_path=d1["base_path"])
    mb = jb.run(base_path=d2["base_path"])
    assert ma.applied_through_lsn == 20 and mb.applied_through_lsn == 30
    oa = replay(d1["base"], d1["wal"], 2)
    ob = replay(d2["base"], d2["wal"], 4)
    assert ja.read_table_arrow().select(oa.final.column_names).equals(oa.final)
    assert jb.read_table_arrow().select(ob.final.column_names).equals(ob.final)


def test_crash_at_every_commit_point(workdir):
    """Systematic sweep: crash at the k-th commit for EVERY k, resume,
    require byte-equality with the oracle and exact counters each time.
    (Superset of the single mid-WAL crash; catches any commit whose
    partial state a resume mis-handles.)"""
    d = synthesize(SPEC, workdir)
    orc = replay(d["base"], d["wal"], 4)
    # count the commits of a clean run first
    calls = {"n": 0}
    clean = os.path.join(workdir, "t_clean")
    CDCJob(clean, os.path.join(workdir, "wal"), num_partitions=4,
           events_per_batch=100).run(
        base_path=d["base_path"],
        on_before_commit=lambda m: calls.__setitem__("n", calls["n"] + 1))
    total = calls["n"]
    assert total >= 3
    for k in range(1, total + 1):
        tdir = os.path.join(workdir, f"t{k}")
        cnt = {"n": 0}

        def boom(m, _k=k, _c=cnt):
            _c["n"] += 1
            if _c["n"] == _k:
                raise Boom(f"crash at commit {_k}")

        try:
            CDCJob(tdir, os.path.join(workdir, "wal"), num_partitions=4,
                   events_per_batch=100).run(base_path=d["base_path"],
                                             on_before_commit=boom)
            raise AssertionError(f"commit {k} did not crash")
        except Boom:
            pass
        j = CDCJob(tdir, os.path.join(workdir, "wal"), num_partitions=4,
                   events_per_batch=100)
        j.run()
        assert j.read_table_arrow().equals(orc.final), k
        m = Manifest.load(tdir)
        assert m.total("conflict_count") == orc.conflict_count, k
        assert m.total("dedup_count") + m.total("replay_skipped") \
            == orc.dedup_count, k
