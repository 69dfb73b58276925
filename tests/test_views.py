"""Incremental view maintenance: refresh(view@vA, change feed vA->vB) must
equal a full rebuild at vB — including U rows flipping roles (the
before-image path) and fully-deleted conversations dropping out. The view
is the change feed's consumer contract, so this doubles as an end-to-end
feed test."""

import os

import pyarrow.compute as pc

from cwds_jobs_ray.pipelines.cdc import CDCJob
from cwds_jobs_ray.pipelines.views import ConvStatsView
from cwds_jobs_ray.state.manifest import Manifest
from cwds_jobs_ray.synth import WalSpec, synthesize

SPEC = WalSpec(seed=55, n_convs=30, turns_per_conv=4, n_events=500,
               n_segments=8, dup_redelivery_frac=0.05, out_of_order_frac=0.15,
               schema_v1_segments=0, hot_key_frac=0.3)
P = 4


def _half_runs(workdir):
    """Run A: first half of the WAL segments; run B: the rest."""
    d = synthesize(SPEC, workdir)
    wal = os.path.join(workdir, "wal")
    segs = sorted(os.listdir(wal))
    wal_a = os.path.join(workdir, "wal_a")
    os.makedirs(wal_a)
    for s in segs[:len(segs) // 2]:
        os.link(os.path.join(wal, s), os.path.join(wal_a, s))
    table_dir = os.path.join(workdir, "table")
    job_a = CDCJob(table_dir, wal_a, num_partitions=P, events_per_batch=120)
    job_a.run(base_path=d["base_path"])
    job_b = CDCJob(table_dir, wal, num_partitions=P, events_per_batch=120)
    return d, job_a, job_b, table_dir


def _expected(job) -> dict:
    t = job.read_table_arrow()
    out = {}
    for conv, role, text in zip(t["conv_id"].to_pylist(),
                                t["role"].to_pylist(),
                                t["text"].to_pylist()):
        n, a, ch = out.get(conv, (0, 0, 0))
        out[conv] = (n + 1, a + (role == "assistant"),
                     ch + len(text or ""))
    return out


def _as_dict(t) -> dict:
    return {c: (n, a, ch)
            for c, n, a, ch in zip(t["conv_id"].to_pylist(),
                                   t["n_turns"].to_pylist(),
                                   t["n_assistant"].to_pylist(),
                                   t["n_chars"].to_pylist())}


def test_refresh_equals_rebuild(workdir):
    d, job_a, job_b, table_dir = _half_runs(workdir)
    view = ConvStatsView(job_a, num_partitions=5)
    st = view.full_build()
    assert _as_dict(view.read()) == _expected(job_a)
    va = st["applied_version"]

    mb = job_b.run()
    st2 = view.refresh()
    assert st2["applied_version"] == mb.table_version > va
    assert _as_dict(view.read()) == _expected(job_b)
    # only partitions with changes were rewritten as v{cur} files
    assert any(f.endswith(f".v{mb.table_version}.parquet")
               for f in st2["files"].values())

    # idempotent: second refresh is a no-op with identical state
    st3 = view.refresh()
    assert st3 == st2


def test_refresh_across_reshard_and_compact(workdir):
    d, job_a, job_b, table_dir = _half_runs(workdir)
    view = ConvStatsView(job_a, num_partitions=3)
    view.full_build()
    job_b.run()
    job_b.reshard(new_num_partitions=7)
    job_b.compact(tombstone_horizon_lsn=0)
    view.refresh()
    assert _as_dict(view.read()) == _expected(job_b)


def test_view_drops_fully_deleted_conversations(workdir):
    d, job_a, job_b, table_dir = _half_runs(workdir)
    view = ConvStatsView(job_a, num_partitions=4)
    view.full_build()
    job_b.run()
    view.refresh()
    live = set(job_b.read_table_arrow()["conv_id"].to_pylist())
    assert set(_as_dict(view.read())) == live
    # sanity: the workload actually tombstoned at least one whole turn
    full = _expected(job_b)
    assert all(n > 0 for n, _a, _c in full.values())


def test_view_commit_cleans_uncommitted_files(workdir):
    d, job_a, job_b, table_dir = _half_runs(workdir)
    view = ConvStatsView(job_a, num_partitions=4)
    view.full_build()
    # crash leftover: a file written but never named by view.json
    orphan = os.path.join(view.dir, "p0.v999.parquet")
    open(orphan, "wb").close()
    job_b.run()
    view.refresh()  # next commit's cleanup removes it
    assert not os.path.exists(orphan)
    assert _as_dict(view.read()) == _expected(job_b)
