"""Zone maps: per-file (min/max ts, lsn) stats recorded at write time in
the manifest, driver-side pruning of non-overlapping files/partitions in
``plan_read``, and ``read_table(ts_range=)`` correctness vs the oracle
(the predicate applies to the WINNING row's ts — pruning must never change
which rows win)."""

import os

import pandas as pd
import pyarrow.compute as pc

from cwds_jobs_ray.pipelines.cdc import CDCJob
from cwds_jobs_ray.pipelines.oracle import replay
from cwds_jobs_ray.state.manifest import Manifest
from cwds_jobs_ray.synth import WalSpec, synthesize

SPEC = WalSpec(seed=91, n_convs=25, turns_per_conv=4, n_events=400,
               n_segments=8, dup_redelivery_frac=0.05, out_of_order_frac=0.15,
               schema_v1_segments=0, hot_key_frac=0.3)
P = 4


def _build(workdir, events_per_batch=120, delta_threshold=0.9,
           max_delta_files=16):
    d = synthesize(SPEC, workdir)
    table_dir = os.path.join(workdir, "table")
    job = CDCJob(table_dir, os.path.join(workdir, "wal"), num_partitions=P,
                 events_per_batch=events_per_batch,
                 delta_threshold=delta_threshold,
                 max_delta_files=max_delta_files)
    job.run(base_path=d["base_path"])
    return d, job, table_dir


def _oracle_in_range(d, lo_us, hi_us):
    fin = replay(d["base"], d["wal"], P).final.to_pandas()
    ts = fin["ts"].astype("datetime64[us]").astype("int64")
    m = pd.Series(True, index=fin.index)
    if lo_us is not None:
        m &= ts >= lo_us
    if hi_us is not None:
        m &= ts <= hi_us
    return fin[m].reset_index(drop=True)


def _sorted(df):
    return df.sort_values(["conv_id", "turn_idx"], kind="stable") \
        .reset_index(drop=True)


def test_every_committed_file_has_a_zone(workdir):
    _d, job, table_dir = _build(workdir)
    for stage in ("after-run", "after-compact", "after-reshard"):
        m = Manifest.load(table_dir)
        for i in range(m.num_partitions):
            p = m.part(i)
            rels = ([p.file] if p.file else []) + list(p.delta_files)
            assert set(p.zones) == set(rels), (stage, i)
            for z in p.zones.values():
                assert "rows" in z
                if z["rows"]:
                    assert z["min_ts"] <= z["max_ts"]
                    assert z["min_lsn"] <= z["max_lsn"]
        if stage == "after-run":
            job.compact(tombstone_horizon_lsn=10**12)
        elif stage == "after-compact":
            job.reshard(new_num_partitions=6)


def test_ts_range_read_matches_oracle(workdir):
    d, job, _ = _build(workdir)
    wal_ts = d["wal"]["ts"].cast("int64").to_pandas()
    lo = int(wal_ts.quantile(0.35))
    hi = int(wal_ts.quantile(0.8))
    for rng in ((lo, hi), (None, hi), (lo, None)):
        got = _sorted(job.read_table(ts_range=rng).to_pandas())
        exp = _sorted(_oracle_in_range(d, rng[0], rng[1]))
        cols = [c for c in exp.columns if c in got.columns]
        pd.testing.assert_frame_equal(got[cols], exp[cols])
        assert len(exp) > 0


def test_zone_pruning_fires_and_stays_exact(workdir):
    d, job, _ = _build(workdir)
    # synth event ts grows ~monotonically with lsn, so a late lower bound
    # must prune earlier delta files under lww
    wal_ts = d["wal"]["ts"].cast("int64").to_pandas()
    lo = int(wal_ts.quantile(0.9))
    plan = job.plan_read(ts_range=(lo, None))
    assert plan["pruned_files"], "no file-level zone prune fired"
    got = _sorted(job.read_table(ts_range=(lo, None)).to_pandas())
    exp = _sorted(_oracle_in_range(d, lo, None))
    cols = [c for c in exp.columns if c in got.columns]
    pd.testing.assert_frame_equal(got[cols], exp[cols])


def test_range_before_all_data_prunes_every_partition(workdir):
    d, job, _ = _build(workdir)
    base_min = int(pc.min(d["base"]["ts"]).cast("int64").as_py())
    plan = job.plan_read(ts_range=(None, base_min - 10**6))
    assert not plan["plain"] and not plan["merged"]
    assert len(plan["pruned_partitions"]) > 0
    ds = job.read_table(ts_range=(None, base_min - 10**6))
    df = ds.to_pandas()
    assert len(df) == 0


def test_ts_range_accepts_timestamps_and_is_version_aware(workdir):
    d, job, table_dir = _build(workdir)
    lo = pd.Timestamp(int(d["wal"]["ts"].cast("int64").to_pandas()
                          .quantile(0.5)), unit="us")
    a = _sorted(job.read_table(ts_range=(lo, None)).to_pandas())
    b = _sorted(job.read_table(
        ts_range=(int(lo.value // 1000), None)).to_pandas())
    pd.testing.assert_frame_equal(a, b)
    # time-travel + range compose
    versions = Manifest.retained_versions(table_dir)
    v = max(versions)
    c = _sorted(job.read_table(ts_range=(lo, None), version=v).to_pandas())
    pd.testing.assert_frame_equal(a, c)


def test_fww_mirror_prune_rule(workdir):
    """Under fww (first-writer-wins) the winner has MIN (ts, lsn), so the
    file-prune mirror holds: files entirely ABOVE the upper bound can't
    own a surviving winner. Results must match a post-hoc filter of the
    fww table."""
    d = synthesize(SPEC, workdir)
    table_dir = os.path.join(workdir, "table_fww")
    job = CDCJob(table_dir, os.path.join(workdir, "wal"), num_partitions=P,
                 events_per_batch=120, merge_policy="fww",
                 delta_threshold=0.9, max_delta_files=16)
    job.run(base_path=d["base_path"])
    full = job.read_table_arrow().to_pandas()
    ts = full["ts"].astype("datetime64[us]").astype("int64")
    hi = int(ts.quantile(0.1))
    exp = _sorted(full[ts <= hi])
    plan = job.plan_read(ts_range=(None, hi))
    assert plan["pruned_files"], "fww mirror prune did not fire"
    got = _sorted(job.read_table(ts_range=(None, hi)).to_pandas())
    cols = [c for c in exp.columns if c in got.columns]
    pd.testing.assert_frame_equal(got[cols].reset_index(drop=True),
                                  exp[cols].reset_index(drop=True))


def test_ts_range_randomized_bounds_sweep(workdir):
    """Randomized (lo, hi) quantile sweep: pruned reads must equal the
    oracle at EVERY bound, including degenerate (empty, full, point)
    ranges — soundness of the zone rules can't depend on bound placement."""
    import numpy as np
    d, job, _ = _build(workdir)
    wal_ts = d["wal"]["ts"].cast("int64").to_pandas()
    rng = np.random.default_rng(5)
    qs = np.concatenate([rng.uniform(0, 1, 12), [0.0, 1.0]])
    bounds = sorted(int(wal_ts.quantile(float(q))) for q in qs)
    cases = [(bounds[i], bounds[j]) for i, j in
             [(0, 13), (3, 4), (6, 6), (11, 12), (0, 1), (12, 13)]]
    cases += [(None, bounds[2]), (bounds[10], None)]
    n_nonempty = 0
    for lo, hi in cases:
        got_df = job.read_table(ts_range=(lo, hi)).to_pandas()
        exp = _sorted(_oracle_in_range(d, lo, hi))
        if len(exp) == 0:
            # Ray to_pandas drops columns on all-empty datasets; emptiness
            # itself is the assertion here
            assert len(got_df) == 0, (lo, hi)
            continue
        got = _sorted(got_df)
        cols = [c for c in exp.columns if c in got.columns]
        pd.testing.assert_frame_equal(
            got[cols].reset_index(drop=True),
            exp[cols].reset_index(drop=True))
        n_nonempty += 1
    assert n_nonempty >= 4  # the sweep actually exercised data
