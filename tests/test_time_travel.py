"""Time travel over retained manifest snapshots.

Data files are immutable and versioned; every commit retains its manifest
as ``manifest.v{N}.json``; GC keeps any file a retained snapshot
references. So every committed version stays a complete readable table
state until ``vacuum`` drops its snapshot — the lakehouse extension of the
reference's publish model (the old Elasticsearch index stays readable
behind its name until explicitly deleted, ElasticsearchService.java:168-179).
"""

import os

import pyarrow.compute as pc
import pytest

from cwds_jobs_ray.pipelines.cdc import CDCJob
from cwds_jobs_ray.pipelines.oracle import replay
from cwds_jobs_ray.state.manifest import Manifest
from cwds_jobs_ray.synth import WalSpec, synthesize

SPEC = WalSpec(seed=33, n_convs=20, turns_per_conv=4, n_events=300,
               n_segments=6, dup_redelivery_frac=0.05, out_of_order_frac=0.15,
               schema_v1_segments=2, hot_key_frac=0.3)
P = 4


def _run_with_version_map(workdir, events_per_batch=100):
    d = synthesize(SPEC, workdir)
    table_dir = os.path.join(workdir, "table")
    job = CDCJob(table_dir, os.path.join(workdir, "wal"),
                 num_partitions=P, events_per_batch=events_per_batch)
    wms = {}

    def record(m):
        wms[m.table_version] = m.applied_through_lsn

    job.run(base_path=d["base_path"], on_before_commit=record)
    return d, job, table_dir, wms


def _expected_at(d, wm):
    """Oracle state after all events with lsn <= wm: whole segments are
    applied in filename order and applied_through_lsn is the max applied
    lsn, so the applied-event set at a commit is exactly the lsn-prefix
    (later deliveries of lsns below the watermark are redeliveries by the
    writer invariant, and replay dedups those anyway)."""
    wal = d["wal"].filter(pc.less_equal(pc.field("lsn"), wm))
    return replay(d["base"], wal, P).final


def test_every_retained_version_reads_as_its_prefix_replay(workdir):
    d, job, table_dir, wms = _run_with_version_map(workdir)
    versions = Manifest.retained_versions(table_dir)
    applied = [v for v in versions if v in wms and v >= 1]
    assert len(applied) >= 2, "need multiple batch commits to time travel"
    for v in applied:
        exp = _expected_at(d, wms[v])
        got = job.read_table_arrow(version=v)
        assert got.select(exp.column_names).equals(exp), f"version {v}"
    # the newest retained snapshot IS the current state
    cur = Manifest.load(table_dir)
    assert job.read_table_arrow(version=cur.table_version).equals(
        job.read_table_arrow())


def test_time_travel_survives_compaction_then_vacuum_reclaims(workdir):
    d, job, table_dir, wms = _run_with_version_map(workdir)
    pre = max(v for v in wms if v >= 1)
    exp_pre = _expected_at(d, wms[pre])
    old_files = set(Manifest.load_version(table_dir, pre).committed_files())

    job.compact(tombstone_horizon_lsn=10**12)
    # compaction rewrote the bases and GC'd — but snapshot-pinned files live
    for rel in old_files:
        assert os.path.exists(os.path.join(table_dir, rel)), rel
    got = job.read_table_arrow(version=pre)
    assert got.select(exp_pre.column_names).equals(exp_pre)

    dropped, removed = job.vacuum(keep_last=1)
    assert pre in dropped
    # the pre-compaction base files are garbage now and actually reclaimed
    live = Manifest.load(table_dir).committed_files()
    for rel in old_files - live:
        assert not os.path.exists(os.path.join(table_dir, rel)), rel
    with pytest.raises(RuntimeError, match="vacuumed|never committed"):
        job.read_table_arrow(version=pre)
    # current state untouched
    o = replay(d["base"], d["wal"], P)
    assert job.read_table_arrow().select(
        o.final.column_names).equals(o.final)


def test_time_travel_across_reshard(workdir):
    d, job, table_dir, wms = _run_with_version_map(workdir)
    pre = max(v for v in wms if v >= 1)
    exp_pre = _expected_at(d, wms[pre])
    job.reshard(new_num_partitions=8)
    got = job.read_table_arrow(version=pre)
    assert got.select(exp_pre.column_names).equals(exp_pre)
    # and the resharded current state is intact
    o = replay(d["base"], d["wal"], P)
    assert job.read_table_arrow().select(
        o.final.column_names).equals(o.final)


def test_read_table_dataset_version_param(workdir):
    d, job, table_dir, wms = _run_with_version_map(workdir)
    pre = max(v for v in wms if v >= 1)
    exp = _expected_at(d, wms[pre])
    got = (job.read_table(columns=list(exp.column_names), version=pre)
           .to_pandas())
    import pandas as pd
    exp_df = exp.to_pandas()
    got = got.sort_values(list(got.columns)).reset_index(drop=True)
    exp_df = exp_df.sort_values(list(exp_df.columns)).reset_index(drop=True)
    pd.testing.assert_frame_equal(got[sorted(got.columns)],
                                  exp_df[sorted(exp_df.columns)])


def test_crash_leftovers_still_gced_with_snapshots_present(workdir):
    _d, job, table_dir, _wms = _run_with_version_map(workdir)
    pdir = next(x for x in sorted(os.listdir(table_dir))
                if x.startswith("p="))
    orphan = os.path.join(table_dir, pdir, "v999.parquet")
    open(orphan, "w").close()
    Manifest.load(table_dir).gc_uncommitted(table_dir)
    assert not os.path.exists(orphan)
