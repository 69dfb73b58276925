"""Savepoint/manifest unit tests — analogue of the reference's savepoint
container round-trip and mode-derivation tests
(/root/reference/jobs-common/src/test/java/gov/ca/cwds/jobs/common/savepoint/TimestampSavePointContainerServiceTest.java,
.../mode/DefaultJobModeServiceTest.java)."""

import os

from cwds_jobs_ray.state.manifest import (
    INCREMENTAL_LOAD,
    INITIAL_LOAD,
    INITIAL_RESUME,
    Manifest,
    resolve_job_mode,
)


def test_roundtrip(workdir):
    m = Manifest.new(4)
    m.job_mode = INCREMENTAL_LOAD
    m.table_version = 3
    m.applied_through_lsn = 99
    m.base_path = "/tmp/base.parquet"
    m.part(2).lsn_watermark = 42
    m.part(2).file = "p=2/v3.parquet"
    m.commit(workdir)

    m2 = Manifest.load(workdir)
    assert m2.job_mode == INCREMENTAL_LOAD
    assert m2.table_version == 3
    assert m2.applied_through_lsn == 99
    assert m2.base_path == "/tmp/base.parquet"
    assert m2.part(2).lsn_watermark == 42
    assert m2.committed_files() == {"p=2/v3.parquet"}


def test_commit_is_atomic_tmp_then_replace(workdir):
    m = Manifest.new(2)
    m.commit(workdir)
    assert os.path.exists(os.path.join(workdir, "manifest.json"))
    assert not os.path.exists(os.path.join(workdir, "manifest.json.tmp"))


def test_mode_resolution():
    # reference state machine: AbstractJobModeService.java:29-50
    assert resolve_job_mode(None) == INITIAL_LOAD
    m = Manifest.new(2)
    m.job_mode = INITIAL_LOAD
    assert resolve_job_mode(m) == INITIAL_RESUME
    m.job_mode = INITIAL_RESUME
    assert resolve_job_mode(m) == INITIAL_RESUME
    m.job_mode = INCREMENTAL_LOAD
    assert resolve_job_mode(m) == INCREMENTAL_LOAD


def test_gc_removes_only_uncommitted(workdir):
    m = Manifest.new(2)
    m.part(0).file = "p=0/v1.parquet"
    os.makedirs(os.path.join(workdir, "p=0"))
    for fn in ["v1.parquet", "v2.parquet"]:
        open(os.path.join(workdir, "p=0", fn), "w").close()
    removed = m.gc_uncommitted(workdir)
    assert removed == ["p=0/v2.parquet"]
    assert os.path.exists(os.path.join(workdir, "p=0", "v1.parquet"))


def test_partition_hash_pinned_and_stable():
    """The routing hash is version-pinned: these golden values must NEVER
    change without bumping HASH_ALGO (committed base files encode them)."""
    import numpy as np
    import pyarrow as pa

    from cwds_jobs_ray.stages.partition import hash_strings

    got = hash_strings(pa.array(["c000000", "c000001", "hello", "", "a"]))
    assert [hex(int(v)) for v in got] == [
        "0x21d66f790d54ed8c", "0xc8491d7df4a3eb8e", "0xe9c562c0fdb23244",
        "0xefd01f60ba992926", "0x82a2a958a9bece5b"]
    # chunked and sliced arrays hash identically (buffer-offset handling)
    ch = pa.chunked_array([["c000000"], ["c000001"]])
    assert (hash_strings(ch) == got[:2]).all()
    sl = pa.array(["x", "c000000", "c000001"]).slice(1, 2)
    assert (hash_strings(sl) == got[:2]).all()
    # near-uniform over 64 partitions for sequential conv-id keys
    from cwds_jobs_ray.stages.partition import partition_ids
    ids = pa.array([f"c{i:06d}" for i in range(100_000)])
    c = np.bincount(partition_ids(ids, 64), minlength=64)
    assert c.min() > 0.8 * c.mean() and c.max() < 1.2 * c.mean()


def test_manifest_rejects_foreign_hash_algo(workdir):
    m = Manifest.new(2)
    m.hash_algo = "polars-xxhash-seed42"  # e.g. a pre-pin table
    m.commit(workdir)
    import pytest as _pytest
    with _pytest.raises(RuntimeError, match="partition hash"):
        Manifest.load(workdir)


def test_read_table_without_manifest_raises(workdir):
    import pytest as _pytest

    from cwds_jobs_ray.pipelines.cdc import CDCJob

    job = CDCJob(workdir + "/nope", wal_dir="/nonexistent")
    with _pytest.raises(RuntimeError, match="no manifest"):
        job.read_table()


def test_batch_history_recorded_and_capped(workdir):
    from cwds_jobs_ray.pipelines.cdc import CDCJob
    from cwds_jobs_ray.synth import WalSpec, synthesize

    spec = WalSpec(seed=81, n_convs=10, turns_per_conv=2, n_events=120,
                   n_segments=60, dup_redelivery_frac=0.1)
    d = synthesize(spec, workdir)
    job = CDCJob(os.path.join(workdir, "table"),
                 os.path.join(workdir, "wal"),
                 num_partitions=2, events_per_batch=2)  # 60 batches
    m = job.run(base_path=d["base_path"])
    # capped at 50 entries, most recent last, fields populated
    assert len(m.batch_history) == Manifest.BATCH_HISTORY_CAP
    last = m.batch_history[-1]
    assert last["version"] == m.table_version
    assert last["events"] > 0 and last["wall_s"] > 0
    assert sum(h["events"] for h in m.batch_history) <= 126  # incl. dups
    # round-trips through the JSON manifest
    m2 = Manifest.load(job.table_dir)
    assert m2.batch_history == m.batch_history


def test_writer_lock_blocks_overlapping_instance(workdir):
    """A second job instance must refuse to mutate a locked table (the
    GC-vs-uncommitted-writes race guard)."""
    import pytest as _pytest

    from cwds_jobs_ray.pipelines.cdc import CDCJob
    from cwds_jobs_ray.state.manifest import TableLock
    from cwds_jobs_ray.synth import WalSpec, synthesize

    d = synthesize(WalSpec(seed=91, n_convs=4, turns_per_conv=2,
                           n_events=20, n_segments=1), workdir)
    job = CDCJob(os.path.join(workdir, "table"), os.path.join(workdir, "wal"),
                 num_partitions=2)
    job.run(base_path=d["base_path"])  # acquires and releases

    with TableLock(job.table_dir):  # simulate a concurrent holder
        other = CDCJob(job.table_dir, job.wal_dir, num_partitions=2)
        with _pytest.raises(RuntimeError, match="writer lock"):
            other.run()
        with _pytest.raises(RuntimeError, match="writer lock"):
            other.compact(10**9)
    # released -> works again
    job.run()


def test_manifest_missing_hash_algo_refused(tmp_path):
    """A manifest written before partition-hash versioning has unknown
    routing: load must fail fast, not default to the current algo (which
    would silently mis-route keys against the existing base files)."""
    import json
    import pytest
    from cwds_jobs_ray.state.manifest import Manifest
    m = Manifest.new(2)
    m.commit(str(tmp_path))
    raw = json.load(open(tmp_path / "manifest.json"))
    del raw["hash_algo"]
    json.dump(raw, open(tmp_path / "manifest.json", "w"))
    with pytest.raises(RuntimeError, match="predates partition-hash"):
        Manifest.load(str(tmp_path))


def test_manifest_foreign_hash_algo_refused(tmp_path):
    import json
    import pytest
    from cwds_jobs_ray.state.manifest import Manifest
    m = Manifest.new(2)
    m.commit(str(tmp_path))
    raw = json.load(open(tmp_path / "manifest.json"))
    raw["hash_algo"] = "polars-xxhash-seed42"
    json.dump(raw, open(tmp_path / "manifest.json", "w"))
    with pytest.raises(RuntimeError, match="refusing to mis-route"):
        Manifest.load(str(tmp_path))
