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
