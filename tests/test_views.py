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


def test_refresh_after_vacuum_falls_back_to_full_build(workdir):
    # vacuum away the view's applied snapshot; refresh must recover with a
    # full rebuild instead of raising forever
    d, job_a, job_b, table_dir = _half_runs(workdir)
    view = ConvStatsView(job_a, num_partitions=3)
    view.full_build()
    job_b.run()  # advances several table versions
    job_b.vacuum(keep_last=1)  # drops the view's applied snapshot
    applied = view._state()["applied_version"]
    assert applied not in Manifest.retained_versions(table_dir)
    st = view.refresh()
    assert st["applied_version"] == \
        job_b._load_manifest_or_raise().table_version
    assert _as_dict(view.read()) == _expected(job_b)


# -------------------------------------------- declarative MaterializedView

from cwds_jobs_ray.pipelines.views import (Count, CountIf, MaterializedView,
                                           Sum, SumLen)


def _expected_by_role(job) -> dict:
    """Reference: GROUP BY role (a MUTABLE attribute) with count and
    SUM(turn_idx) — computed by a plain dict walk over the live table."""
    t = job.read_table_arrow()
    out = {}
    for role, ti, text in zip(t["role"].to_pylist(),
                              t["turn_idx"].to_pylist(),
                              t["text"].to_pylist()):
        n, s, ch = out.get(role, (0, 0, 0))
        out[role] = (n + 1, s + ti, ch + len(text or ""))
    return out


def _role_view(job, nb=3):
    return MaterializedView(job, name="role_stats", key="role",
                            aggs={"n": Count(), "sum_ti": Sum("turn_idx"),
                                  "chars": SumLen("text")},
                            num_partitions=nb)


def _role_dict(t) -> dict:
    return {r: (n, s, ch)
            for r, n, s, ch in zip(t["role"].to_pylist(),
                                   t["n"].to_pylist(),
                                   t["sum_ti"].to_pylist(),
                                   t["chars"].to_pylist())}


def test_generic_view_mutable_group_key(workdir):
    # GROUP BY role: a U row that flips the role moves the row between
    # groups as a +1/-1 contribution pair — refresh must equal rebuild
    d, job_a, job_b, table_dir = _half_runs(workdir)
    view = _role_view(job_a)
    view.full_build()
    at_a = _expected_by_role(job_a)  # capture BEFORE job_b advances
    assert _role_dict(view.read()) == at_a
    job_b.run()
    view.refresh()
    at_b = _expected_by_role(job_b)
    assert _role_dict(view.read()) == at_b
    # the workload actually flips roles between the two halves
    assert at_a != at_b


def test_generic_view_second_spec_countif_sum(workdir):
    # a second distinct spec over the conv key: CountIf + Sum
    d, job_a, job_b, table_dir = _half_runs(workdir)
    view = MaterializedView(job_a, name="conv_misc", key="conv_id",
                            aggs={"n_user": CountIf("role", "user"),
                                  "sum_ti": Sum("turn_idx")},
                            num_partitions=4)
    view.full_build()
    job_b.run()
    view.refresh()
    t = job_b.read_table_arrow()
    exp = {}
    for c, r, ti in zip(t["conv_id"].to_pylist(), t["role"].to_pylist(),
                        t["turn_idx"].to_pylist()):
        nu, s = exp.get(c, (0, 0))
        exp[c] = (nu + (r == "user"), s + ti)
    got = view.read()
    assert {c: (nu, s) for c, nu, s in zip(got["conv_id"].to_pylist(),
                                           got["n_user"].to_pylist(),
                                           got["sum_ti"].to_pylist())} == exp


def test_generic_view_spec_validation(workdir):
    d, job_a, job_b, table_dir = _half_runs(workdir)
    import pytest as _pt
    with _pt.raises(ValueError):
        MaterializedView(job_a, "v", key="conv_id", aggs={})
    with _pt.raises(ValueError):
        MaterializedView(job_a, "v", key="conv_id",
                         aggs={"conv_id": Count()})


def test_generic_view_refresh_rejects_spec_mismatch(workdir):
    # refreshing an on-disk view with a DIFFERENT spec must fail fast,
    # not silently union mismatched schemas
    import pytest as _pt
    d, job_a, job_b, table_dir = _half_runs(workdir)
    _role_view(job_a).full_build()
    other = MaterializedView(job_a, name="role_stats", key="role",
                             aggs={"n_user": CountIf("role", "user")},
                             num_partitions=3)
    job_b.run()
    with _pt.raises(ValueError, match="built with"):
        other.refresh()
    with _pt.raises(ValueError, match="built with"):
        other.read()
    # the matching spec still refreshes fine
    v = _role_view(job_b)
    v.refresh()
    assert _role_dict(v.read()) == _expected_by_role(job_b)


def test_generic_view_bucket_agg_name_rejected(workdir):
    import pytest as _pt
    d, job_a, job_b, table_dir = _half_runs(workdir)
    with _pt.raises(ValueError, match="collide"):
        MaterializedView(job_a, "v", key="conv_id",
                         aggs={"_bucket": Count()})


def test_generic_view_null_group_key(workdir):
    # SQL GROUP BY keeps the NULL group; rows with a null key must appear
    # as one group in the view, through full_build AND refresh
    d, job_a, job_b, table_dir = _half_runs(workdir)
    view = _role_view(job_a)
    view.full_build()
    t = view.read()
    import pandas as pd
    base = job_a.read_table_arrow()
    n_null = base["role"].null_count
    got_nulls = [i for i, r in enumerate(t["role"].to_pylist()) if r is None]
    if n_null == 0:
        # synth data has no null roles: exercise the kernel directly
        import pyarrow as pa
        part = view._block_partial(pa.table({
            "role": pa.array(["a", None, "a", None, "b"]),
            "turn_idx": pa.array([1, 2, 3, 4, 5], pa.int64()),
            "text": pa.array(["x", "y", "", None, "zz"])}))
        df = part.to_pandas()
        nul = df[df["role"].isna()]
        assert len(nul) == 1
        assert int(nul["n"].iloc[0]) == 2
        assert int(nul["sum_ti"].iloc[0]) == 6
        assert int(nul["chars"].iloc[0]) == 1  # None text counts 0 chars
        # reduce keeps the null group too
        red = view._reduce(part).to_pandas()
        assert red["role"].isna().sum() == 1
    else:
        assert len(got_nulls) == 1


def test_generic_view_agg_fingerprint_mismatch(workdir):
    # same aggregate NAME, different definition: must fail fast, not mix
    import pytest as _pt
    d, job_a, job_b, table_dir = _half_runs(workdir)
    MaterializedView(job_a, name="fp", key="conv_id",
                     aggs={"n": CountIf("role", "assistant")},
                     num_partitions=3).full_build()
    other = MaterializedView(job_a, name="fp", key="conv_id",
                             aggs={"n": CountIf("role", "user")},
                             num_partitions=3)
    job_b.run()
    with _pt.raises(ValueError, match="built with"):
        other.refresh()
    with _pt.raises(ValueError):
        MaterializedView(job_a, "v", key="_bucket", aggs={"n": Count()})
    with _pt.raises(ValueError):
        MaterializedView(job_a, "v", key="_live", aggs={"n": Count()})


def test_feed_partial_null_group_moves(workdir):
    """U rows moving between a real group and the NULL group must transfer
    contributions exactly — through _feed_partial, _reduce, and
    _apply_view_delta (the full refresh kernel chain)."""
    import pyarrow as pa
    d, job_a, job_b, table_dir = _half_runs(workdir)
    view = _role_view(job_a, nb=1)  # one partition: deterministic file
    # initial state: 2 rows in role 'a', 1 row with NULL role
    part = view._block_partial(pa.table({
        "role": pa.array(["a", "a", None]),
        "turn_idx": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array(["xx", "y", "zzz"])}))
    init = view._reduce(part)
    os.makedirs(view.dir, exist_ok=True)
    import pyarrow.parquet as pq
    pq.write_table(init, os.path.join(view.dir, "p0.v1.parquet"))
    # feed: one U row moves from 'a' -> NULL; one U row moves NULL -> 'b'
    feed = pa.table({
        "change_type": pa.array(["U", "U"]),
        "role": pa.array([None, "b"]),          # post-images
        "prev_role": pa.array(["a", None]),     # before-images
        "turn_idx": pa.array([2, 3], pa.int64()),
        "prev_turn_idx": pa.array([2, 3], pa.int64()),
        "text": pa.array(["y2", "zzz"]),
        "prev_text": pa.array(["y", "zzz"]),
    })
    delta = view._reduce(view._feed_partial(feed))
    from cwds_jobs_ray.pipelines.views import _apply_view_delta
    rel = _apply_view_delta(view.dir, view._view_schema(), "role",
                            "p0.v1.parquet", "p0.v2.parquet", delta)
    got = pq.read_table(os.path.join(view.dir, rel)).to_pandas()
    by_role = {(r if isinstance(r, str) else None):
               (int(n), int(s), int(ch))
               for r, n, s, ch in zip(got["role"], got["n"],
                                      got["sum_ti"], got["chars"])}
    # 'a' lost row (ti=2, 'y'): n=1, sum_ti=1, chars=2
    # NULL gained (ti=2,'y2') and lost (ti=3,'zzz'): n=1, sum_ti=2, chars=2
    # 'b' gained (ti=3,'zzz'): n=1, sum_ti=3, chars=3
    assert by_role == {"a": (1, 1, 2), None: (1, 2, 2), "b": (1, 3, 3)}


def test_view_many_incremental_refreshes(workdir):
    """Refresh after EVERY segment drain (deltas-of-deltas, through schema
    evolution, hot keys, redeliveries, and forced delta folds) must equal
    an independent full rebuild at each step."""
    from cwds_jobs_ray.synth import WalSpec, synthesize
    d = synthesize(WalSpec(seed=31, n_convs=60, n_events=1500, n_segments=6,
                           dup_redelivery_frac=0.08, out_of_order_frac=0.15,
                           hot_key_frac=0.2, schema_v1_segments=2), workdir)
    wal = os.path.join(workdir, "wal")
    segs = sorted(os.listdir(wal))
    table = os.path.join(workdir, "table")
    inc = os.path.join(workdir, "wal_inc")
    os.makedirs(inc)
    for k, seg in enumerate(segs):
        os.link(os.path.join(wal, seg), os.path.join(inc, seg))
        job = CDCJob(table, inc, num_partitions=4, events_per_batch=200,
                     max_delta_files=2)
        job.run(base_path=d["base_path"] if k == 0 else None)
        aggs = lambda: {"n": Count(), "nu": CountIf("role", "user"),
                        "ti": Sum("turn_idx"), "ch": SumLen("text")}
        v = MaterializedView(job, "mv", key="role", aggs=aggs(),
                             num_partitions=3)
        v.refresh() if k else v.full_build()
        ref = MaterializedView(job, f"ref{k}", key="role", aggs=aggs(),
                               num_partitions=3)
        ref.full_build()
        assert v.read().to_pandas().equals(ref.read().to_pandas()), k
