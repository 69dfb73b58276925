"""Engine-vs-oracle scenario matrix — the transplant of the reference's
batch-size × mode sweep with golden assertions
(/root/reference/jobs-common/src/test/java/gov/ca/cwds/jobs/common/JobMainTest.java:66-218
and /root/reference/jobs-facilities-cws/src/test/java/.../CwsFacilityJobTest.java:60-134).

Each scenario: synthesize base + WAL deterministically, run the distributed
engine, compare the committed table BYTE-FOR-BYTE (per-turn `text` equality
under stable (conv_id, turn_idx) order — BASELINE.json invariant) against the
single-process oracle replay, plus golden counter/watermark assertions.
"""

import os

import pyarrow as pa
import pytest

from cwds_jobs_ray.pipelines.cdc import CDCJob
from cwds_jobs_ray.pipelines.oracle import replay
from cwds_jobs_ray.schema import CHANGE_SCHEMA_V2, PUBLIC_COLS
from cwds_jobs_ray.state.manifest import INCREMENTAL_LOAD, Manifest
from cwds_jobs_ray.synth import WalSpec, make_base, make_wal, synthesize, write_wal_segments

P = 8


def run_and_compare(workdir, spec, events_per_batch=10**9, num_partitions=P):
    d = synthesize(spec, workdir)
    job = CDCJob(os.path.join(workdir, "table"), os.path.join(workdir, "wal"),
                 num_partitions=num_partitions, events_per_batch=events_per_batch)
    m = job.run(base_path=d["base_path"])
    o = replay(d["base"], d["wal"], num_partitions)
    got = job.read_table_arrow()
    assert got.select(o.final.column_names).equals(o.final), "final table differs"
    assert m.total("rows_applied") == o.rows_applied
    assert m.total("conflict_count") == o.conflict_count
    assert m.total("dedup_count") + m.total("replay_skipped") == o.dedup_count
    assert m.job_mode == INCREMENTAL_LOAD
    return d, job, m, o


def test_empty_source(workdir):
    # reference testcase1/2: empty source, epoch watermark, mode flips
    spec = WalSpec(seed=1, n_convs=0, turns_per_conv=0, n_events=0, n_segments=1)
    _, _, m, o = run_and_compare(workdir, spec)
    assert m.total("rows_applied") == 0
    assert m.applied_through_lsn == 0
    assert m.table_version == 0


def test_inserts_only_tiny(workdir):
    # reference testcase3-7: tiny loads with duplicate timestamps
    spec = WalSpec(seed=3, n_convs=3, turns_per_conv=2, n_events=10, n_segments=2,
                   frac_update=0, frac_delete=0, dup_redelivery_frac=0,
                   out_of_order_frac=0)
    _, _, m, o = run_and_compare(workdir, spec)
    assert m.applied_through_lsn == 10


@pytest.mark.parametrize("events_per_batch", [1, 2, 10, 10**9])
def test_batch_size_sweep(workdir, events_per_batch):
    # reference sweeps batch sizes 1/2/10 across modes (JobMainTest)
    spec = WalSpec(seed=5, n_convs=10, turns_per_conv=3, n_events=40, n_segments=8,
                   dup_redelivery_frac=0.1, out_of_order_frac=0.2)
    run_and_compare(workdir, spec, events_per_batch=events_per_batch)


def test_incremental_second_run_no_changes(workdir):
    # reference: incremental run with no new data -> 0 items, watermark kept
    spec = WalSpec(seed=6, n_convs=10, turns_per_conv=3, n_events=50, n_segments=4)
    _, job, m, _ = run_and_compare(workdir, spec)
    m2 = job.run()
    assert m2.table_version == m.table_version
    assert m2.applied_through_lsn == m.applied_through_lsn


def test_incremental_new_segments_arrive(workdir):
    # drain, then new WAL segments land, run again (scheduled re-run)
    spec = WalSpec(seed=7, n_convs=20, turns_per_conv=4, n_events=100, n_segments=2)
    d, job, m, _ = run_and_compare(workdir, spec)
    # second wave of changes with higher lsns
    wal2 = make_wal(WalSpec(seed=8, n_convs=20, turns_per_conv=4, n_events=60,
                            n_segments=1))
    import pyarrow.compute as pc
    wal2 = wal2.set_column(wal2.schema.get_field_index("lsn"), "lsn",
                           pc.add(wal2["lsn"], 100))
    write_wal_segments(wal2, os.path.join(workdir, "wal2"), 1)
    os.replace(os.path.join(workdir, "wal2", "segment-00000.parquet"),
               os.path.join(workdir, "wal", "segment-00099.parquet"))
    m2 = job.run()
    assert m2.table_version == m.table_version + 1
    assert m2.applied_through_lsn == 160
    o = replay(d["base"], pa.concat_tables([d["wal"], wal2]), P)
    got = job.read_table_arrow()
    assert got.select(o.final.column_names).equals(o.final)


def test_out_of_order_lww(workdir):
    spec = WalSpec(seed=11, n_convs=15, turns_per_conv=3, n_events=300,
                   n_segments=6, out_of_order_frac=0.5, dup_redelivery_frac=0)
    run_and_compare(workdir, spec, events_per_batch=50)


def test_dup_redelivery(workdir):
    spec = WalSpec(seed=12, n_convs=15, turns_per_conv=3, n_events=200,
                   n_segments=4, dup_redelivery_frac=0.3)
    d, job, m, o = run_and_compare(workdir, spec)
    assert o.dedup_count > 0


def test_hot_key_skew(workdir):
    # one viral conv_id carries half the stream (FIXTURES.md hot_key)
    spec = WalSpec(seed=13, n_convs=30, turns_per_conv=4, n_events=500,
                   n_segments=5, hot_key_frac=0.5)
    run_and_compare(workdir, spec, events_per_batch=100)


def test_schema_change_midstream(workdir):
    # v1 segments (no tool col) then v2 — unify + null backfill
    spec = WalSpec(seed=14, n_convs=20, turns_per_conv=3, n_events=200,
                   n_segments=4, schema_v1_segments=2)
    d, job, m, o = run_and_compare(workdir, spec, events_per_batch=60)
    # rows written by v1 events must have null tool
    got = job.read_table_arrow()
    assert got.num_rows == o.rows_applied


# ---------------------------------------------------------------- explicit
# hand-built micro fixtures (reference style: explicit Liquibase XML rows)

def _mk_wal(rows):
    cols = {name: [] for name in ["lsn", "op", "conv_id", "turn_idx", "role",
                                  "text", "tool", "ts"]}
    for r in rows:
        for k in cols:
            cols[k].append(r.get(k))
    return pa.Table.from_pydict(cols, schema=CHANGE_SCHEMA_V2)


TS = 1_700_000_000_000_000


def _run_explicit(workdir, base, wal, events_per_batch=10**9):
    import pyarrow.parquet as pq
    os.makedirs(os.path.join(workdir, "base"), exist_ok=True)
    base_path = os.path.join(workdir, "base", "base.parquet")
    pq.write_table(base, base_path)
    write_wal_segments(wal, os.path.join(workdir, "wal"), 1)
    job = CDCJob(os.path.join(workdir, "table"), os.path.join(workdir, "wal"),
                 num_partitions=4, events_per_batch=events_per_batch)
    m = job.run(base_path=base_path)
    return job, m


def test_delete_then_reinsert(workdir):
    # D then later I on the same key must leave the reinserted row
    # (reference D4 semantics, ElasticWriter.java:71-80)
    base = make_base(WalSpec(seed=1, n_convs=1, turns_per_conv=2))
    wal = _mk_wal([
        dict(lsn=1, op="D", conv_id="c000000", turn_idx=1, ts=TS + 10**9),
        dict(lsn=2, op="I", conv_id="c000000", turn_idx=1, role="user",
             text="reinserted", tool=None, ts=TS + 2 * 10**9),
    ])
    job, m = _run_explicit(workdir, base, wal)
    got = job.read_table_arrow().to_pydict()
    assert got["text"] == [base["text"][0].as_py(), "reinserted"]


def test_delete_wins_over_older_out_of_order_update(workdir):
    # tombstone persisted: an out-of-order U older than the D must NOT
    # resurrect the row — even when it arrives in a LATER batch
    base = make_base(WalSpec(seed=1, n_convs=1, turns_per_conv=2))
    wal = _mk_wal([
        dict(lsn=1, op="D", conv_id="c000000", turn_idx=0, ts=TS + 10**9),
        dict(lsn=2, op="U", conv_id="c000000", turn_idx=0, role="user",
             text="zombie", tool=None, ts=TS + 10**8),  # older ts than the D
    ])
    for epb in (10**9, 1):  # same batch, then one-event batches
        import shutil
        sub = os.path.join(workdir, f"epb{epb}")
        os.makedirs(sub)
        job, m = _run_explicit(sub, base, wal, events_per_batch=epb)
        got = job.read_table_arrow()
        assert got.num_rows == 1
        assert got["turn_idx"][0].as_py() == 1
        assert m.total("conflict_count") == 1


def test_update_payload_replaces_row_wholesale(workdir):
    base = make_base(WalSpec(seed=1, n_convs=1, turns_per_conv=1))
    wal = _mk_wal([
        dict(lsn=1, op="U", conv_id="c000000", turn_idx=0, role="assistant",
             text="edited", tool="python", ts=TS + 10**9),
    ])
    job, m = _run_explicit(workdir, base, wal)
    got = job.read_table_arrow().to_pydict()
    assert got["text"] == ["edited"]
    assert got["role"] == ["assistant"]
    assert got["tool"] == ["python"]


def test_fww_merge_policy(workdir):
    # pluggable conflict resolution (extension surface §2.10): first writer
    # wins — verified against the policy-parameterized oracle at multiple
    # batch sizes (composability across batches)
    spec = WalSpec(seed=17, n_convs=12, turns_per_conv=3, n_events=150,
                   n_segments=3, out_of_order_frac=0.3, dup_redelivery_frac=0.1)
    for epb in (10**9, 50):
        sub = os.path.join(workdir, f"epb{epb}")
        d = synthesize(spec, sub)
        job = CDCJob(os.path.join(sub, "table"), os.path.join(sub, "wal"),
                     num_partitions=4, events_per_batch=epb,
                     merge_policy="fww")
        job.run(base_path=d["base_path"])
        o = replay(d["base"], d["wal"], 4, policy="fww")
        got = job.read_table_arrow()
        assert got.select(o.final.column_names).equals(o.final)


def test_per_partition_golden_counters(workdir):
    # golden per-partition assertions (reference style: exact savepoints,
    # JobMainTest.java:69-93) — rows per partition match the oracle's
    # partition function
    spec = WalSpec(seed=18, n_convs=20, turns_per_conv=4, n_events=300,
                   n_segments=4)
    d = synthesize(spec, workdir)
    job = CDCJob(os.path.join(workdir, "table"), os.path.join(workdir, "wal"),
                 num_partitions=8, events_per_batch=10**9)
    m = job.run(base_path=d["base_path"])
    o = replay(d["base"], d["wal"], num_partitions=8)
    for i in range(8):
        assert m.part(i).rows_applied == int(o.per_partition["rows_applied"][i])
        assert m.part(i).lsn_watermark <= m.applied_through_lsn


def test_null_required_column_rejected(workdir):
    # M10 null-payload guard: a malformed event (null ts) must fail the
    # batch — and therefore never advance the savepoint
    base = make_base(WalSpec(seed=1, n_convs=1, turns_per_conv=1))
    wal = _mk_wal([
        dict(lsn=1, op="U", conv_id="c000000", turn_idx=0, role="user",
             text="bad", tool=None, ts=None),
    ])
    import pyarrow.parquet as pq
    os.makedirs(os.path.join(workdir, "base"), exist_ok=True)
    base_path = os.path.join(workdir, "base", "base.parquet")
    pq.write_table(base, base_path)
    from cwds_jobs_ray.synth import write_wal_segments
    write_wal_segments(wal, os.path.join(workdir, "wal"), 1)
    job = CDCJob(os.path.join(workdir, "table"), os.path.join(workdir, "wal"),
                 num_partitions=2, events_per_batch=10**9)
    with pytest.raises(Exception, match="null value"):
        job.run(base_path=base_path)
    m = Manifest.load(os.path.join(workdir, "table"))
    assert m.applied_through_lsn == 0  # savepoint did not advance


def test_lww_tiebreak_on_lsn_at_equal_ts(workdir):
    # two updates with identical ts: higher lsn wins (reference total order
    # is (timestamp, id): QueryConstants.java:72-73)
    base = make_base(WalSpec(seed=1, n_convs=1, turns_per_conv=1))
    wal = _mk_wal([
        dict(lsn=2, op="U", conv_id="c000000", turn_idx=0, role="user",
             text="second", tool=None, ts=TS + 10**9),
        dict(lsn=1, op="U", conv_id="c000000", turn_idx=0, role="user",
             text="first", tool=None, ts=TS + 10**9),
    ])
    job, m = _run_explicit(workdir, base, wal)
    assert job.read_table_arrow().to_pydict()["text"] == ["second"]
    assert m.total("conflict_count") == 1


@pytest.mark.parametrize("P", [1, 3, 64])
def test_partition_count_edges(workdir, P):
    # P=1 exercises the bare-ref normalization (num_returns=1); P=3 a
    # non-multiple of slice_group_size; P=64 more partitions than keys
    spec = WalSpec(seed=19, n_convs=6, turns_per_conv=3, n_events=80,
                   n_segments=2, dup_redelivery_frac=0.1)
    sub = os.path.join(workdir, f"P{P}")
    d = synthesize(spec, sub)
    job = CDCJob(os.path.join(sub, "table"), os.path.join(sub, "wal"),
                 num_partitions=P, events_per_batch=30)
    m = job.run(base_path=d["base_path"])
    o = replay(d["base"], d["wal"], P)
    got = job.read_table_arrow()
    assert got.select(o.final.column_names).equals(o.final)
    assert m.total("conflict_count") == o.conflict_count


def test_pure_redelivery_tail_segment_skipped_safely(workdir):
    # a trailing segment of only verbatim redeliveries has max_lsn below the
    # watermark after the first run — the planner must skip it (that IS the
    # dedup) and the table must stay byte-equal
    from cwds_jobs_ray.sources.wal import list_segments, plan_batches
    import pyarrow.parquet as pq
    spec = WalSpec(seed=29, n_convs=5, turns_per_conv=2, n_events=30,
                   n_segments=2, dup_redelivery_frac=0)
    d = synthesize(spec, workdir)
    job = CDCJob(os.path.join(workdir, "table"), os.path.join(workdir, "wal"),
                 num_partitions=4, events_per_batch=10**9)
    m = job.run(base_path=d["base_path"])
    before = job.read_table_arrow()
    # redelivery tail: verbatim copies of events 5..9 land as a NEW segment
    dup = d["wal"].slice(5, 5)
    pq.write_table(dup, os.path.join(workdir, "wal", "segment-00099.parquet"))
    segs = list_segments(os.path.join(workdir, "wal"))
    assert plan_batches(segs, m.applied_through_lsn, 10**9) == []  # skipped
    m2 = job.run()
    assert m2.applied_through_lsn == m.applied_through_lsn
    assert job.read_table_arrow().equals(before)


def test_initial_load_from_directory(workdir):
    # base snapshot as a DIRECTORY of parquet files (multi-file lake table)
    spec = WalSpec(seed=23, n_convs=10, turns_per_conv=3, n_events=50,
                   n_segments=2)
    d = synthesize(spec, workdir)
    import pyarrow.parquet as pq
    multi = os.path.join(workdir, "base_multi")
    os.makedirs(multi)
    b = d["base"]
    half = b.num_rows // 2
    pq.write_table(b.slice(0, half), os.path.join(multi, "part-0.parquet"))
    pq.write_table(b.slice(half), os.path.join(multi, "part-1.parquet"))
    job = CDCJob(os.path.join(workdir, "table"), os.path.join(workdir, "wal"),
                 num_partitions=4, events_per_batch=10**9)
    m = job.run(base_path=multi)
    o = replay(d["base"], d["wal"], 4)
    got = job.read_table_arrow()
    assert got.select(o.final.column_names).equals(o.final)


def test_manifest_partition_count_governs_later_runs(workdir):
    # a job instance configured with a DIFFERENT partition count must follow
    # the committed manifest's P, not its own (key-routing safety)
    spec = WalSpec(seed=33, n_convs=10, turns_per_conv=3, n_events=60,
                   n_segments=2)
    d = synthesize(spec, workdir)
    job8 = CDCJob(os.path.join(workdir, "table"), os.path.join(workdir, "wal"),
                  num_partitions=8, events_per_batch=30)
    m = job8.run(base_path=d["base_path"])
    assert m.num_partitions == 8

    # second wave applied through a job configured with P=16
    wal2 = make_wal(WalSpec(seed=34, n_convs=10, turns_per_conv=3,
                            n_events=30, n_segments=1))
    import pyarrow.compute as pc
    wal2 = wal2.set_column(wal2.schema.get_field_index("lsn"), "lsn",
                           pc.add(wal2["lsn"], 60))
    write_wal_segments(wal2, os.path.join(workdir, "wal2"), 1)
    os.replace(os.path.join(workdir, "wal2", "segment-00000.parquet"),
               os.path.join(workdir, "wal", "segment-00077.parquet"))
    job16 = CDCJob(os.path.join(workdir, "table"), os.path.join(workdir, "wal"),
                   num_partitions=16, events_per_batch=10**9)
    m2 = job16.run()
    assert m2.num_partitions == 8  # committed P wins
    o = replay(d["base"], pa.concat_tables([d["wal"], wal2]), 8)
    got = job16.read_table_arrow()
    assert got.select(o.final.column_names).equals(o.final)
    # compact through the mismatched instance also honors committed P
    m3 = job16.compact(10**9)
    assert m3.num_partitions == 8
    assert job16.read_table_arrow().select(o.final.column_names).equals(o.final)


def test_redelivery_split_across_combine_chunks(workdir):
    """A verbatim redelivery landing in a DIFFERENT combine chunk than its
    original — with the original folded away as an LWW loser in its own
    chunk — must still count as dedup (not conflict). Hand-built minimal
    case: segment A = [X(lsn1), Y(lsn2, newer, same key)], segment B =
    [copy of X]; combine_batch_size=1 forces one chunk per segment."""
    base = make_base(WalSpec(seed=7, n_convs=2, turns_per_conv=1, n_events=0))
    t0 = 1_700_000_100_000_000
    seg_a = pa.table({
        "lsn": pa.array([1, 2], pa.int64()),
        "op": pa.array(["U", "U"]),
        "conv_id": pa.array(["c000000", "c000000"]),
        "turn_idx": pa.array([0, 0], pa.int32()),
        "role": pa.array(["user", "user"]),
        "text": pa.array(["old text", "new text"]),
        "tool": pa.array([None, None], pa.string()),
        "ts": pa.array([t0, t0 + 10**6], pa.timestamp("us")),
    })
    seg_b = seg_a.slice(0, 1)  # verbatim redelivery of X
    wal_dir = os.path.join(workdir, "wal")
    os.makedirs(wal_dir)
    import pyarrow.parquet as pq
    pq.write_table(seg_a, os.path.join(wal_dir, "segment-00000.parquet"))
    pq.write_table(seg_b, os.path.join(wal_dir, "segment-00001.parquet"))
    base_path = os.path.join(workdir, "base.parquet")
    pq.write_table(base, base_path)

    job = CDCJob(os.path.join(workdir, "table"), wal_dir, num_partitions=4,
                 events_per_batch=10**9, combine_batch_size=1)
    m = job.run(base_path=base_path)
    wal = pa.concat_tables([seg_a, seg_b])
    o = replay(base, wal, 4)
    assert job.read_table_arrow().select(o.final.column_names).equals(o.final)
    # oracle: X' is a dedup, X is a conflict (superseded by Y)
    assert o.dedup_count == 1 and o.conflict_count == 1
    assert m.total("dedup_count") == 1, "redelivery misclassified as conflict"
    assert m.total("conflict_count") == 1


def test_multichunk_redelivery_counters_match_oracle(workdir):
    """Synth workload with redeliveries + multi-chunk batches (one chunk per
    segment): cumulative counters must equal the oracle's exactly."""
    spec = WalSpec(seed=11, n_convs=20, turns_per_conv=3, n_events=400,
                   n_segments=8, dup_redelivery_frac=0.2, out_of_order_frac=0.2)
    d = synthesize(spec, workdir)
    job = CDCJob(os.path.join(workdir, "table"), os.path.join(workdir, "wal"),
                 num_partitions=4, events_per_batch=10**9,
                 combine_batch_size=1)
    m = job.run(base_path=d["base_path"])
    o = replay(d["base"], d["wal"], 4)
    assert job.read_table_arrow().select(o.final.column_names).equals(o.final)
    assert m.total("dedup_count") == o.dedup_count
    assert m.total("conflict_count") == o.conflict_count


def test_v1_original_redelivered_in_v2_segment_keeps_first_copy(workdir):
    """An event first delivered in a schema-v1 segment (tool=null after
    projection) and redelivered verbatim inside a v2 segment (tool intact):
    the FIRST delivered copy is authoritative, matching the oracle's
    keep='first' and the cross-batch replay rule."""
    spec = WalSpec(seed=13, n_convs=10, turns_per_conv=2, n_events=200,
                   n_segments=4, dup_redelivery_frac=0.3,
                   out_of_order_frac=0.1, schema_v1_segments=2)
    d, job, m, o = run_and_compare(workdir, spec,
                                   events_per_batch=10**9)
    # at least one dup must actually straddle the v1/v2 boundary for this
    # test to mean anything
    wal = d["wal"]
    import pandas as pd
    df = wal.to_pandas()
    g = df.groupby("lsn")["tool"].nunique(dropna=False)
    assert (g > 1).any(), "fixture never exercises the v1/v2 copy divergence"


def test_viral_key_shuffle_rows_bounded_by_blocks(workdir):
    """The block-combine IS the salt (SURVEY §4.2): a conv_id carrying 90%
    of the stream still contributes at most distinct-(conv,turn)-keys rows
    per combine chunk to the shuffle, so the hot partition's merge input is
    bounded by n_chunks x keys-per-conv, independent of event count."""
    import numpy as np

    from cwds_jobs_ray.schema import CHANGE_SCHEMA_V2
    from cwds_jobs_ray.stages.merge import make_combiner
    from cwds_jobs_ray.stages.partition import partition_ids

    spec = WalSpec(seed=31, n_convs=50, turns_per_conv=4, n_events=20_000,
                   n_segments=1, hot_key_frac=0.9, out_of_order_frac=0.1,
                   dup_redelivery_frac=0.05)
    wal = make_wal(spec)
    P = 8
    combine = make_combiner(CHANGE_SCHEMA_V2, P)
    chunk_rows = 2_000
    per_part = np.zeros(P, dtype=np.int64)
    n_chunks = 0
    for off in range(0, wal.num_rows, chunk_rows):
        chunk = wal.slice(off, chunk_rows)
        out = combine(chunk)
        n_chunks += 1
        # block-local LWW: one winner row per distinct (conv, turn) key
        keys = chunk.to_pandas().groupby(["conv_id", "turn_idx"]).ngroups
        assert out.num_rows <= keys
        p = out["part"].to_numpy(zero_copy_only=False)
        per_part += np.bincount(p.astype(np.int64), minlength=P)
    # the hot conversation targets turn_idx 0..9 -> <= 10 winner rows per
    # chunk for 90% of the stream; its partition cannot dominate
    max_keys_per_conv = spec.turns_per_conv + 6
    hot_part = partition_ids(pa.array(["c000000"]), P)[0]
    assert per_part[hot_part] <= n_chunks * (
        max_keys_per_conv + 2 * spec.n_convs)  # hot conv + cold stragglers
    assert per_part.max() <= 4 * max(1, int(per_part.mean())), \
        f"merge-input skew too high: {per_part.tolist()}"

    # and the full pipeline on the same workload stays oracle-exact
    d = synthesize(spec, workdir)
    job = CDCJob(os.path.join(workdir, "table"), os.path.join(workdir, "wal"),
                 num_partitions=P, events_per_batch=10**9,
                 combine_batch_size=chunk_rows)
    m = job.run(base_path=d["base_path"])
    o = replay(d["base"], d["wal"], P)
    assert job.read_table_arrow().select(o.final.column_names).equals(o.final)
    assert m.total("conflict_count") == o.conflict_count


def test_initial_load_from_directory_snapshot(workdir):
    """Base snapshot as a DIRECTORY of parquet files (the multi-file export
    case) must load identically to a single-file snapshot."""
    import pyarrow.parquet as pq

    spec = WalSpec(seed=71, n_convs=20, turns_per_conv=3, n_events=100,
                   n_segments=2, dup_redelivery_frac=0.1)
    d = synthesize(spec, workdir)
    base = d["base"]
    base_dir = os.path.join(workdir, "base_multi")
    os.makedirs(base_dir)
    half = base.num_rows // 2
    pq.write_table(base.slice(0, half),
                   os.path.join(base_dir, "part-000.parquet"))
    pq.write_table(base.slice(half),
                   os.path.join(base_dir, "part-001.parquet"))

    job = CDCJob(os.path.join(workdir, "table"), os.path.join(workdir, "wal"),
                 num_partitions=4, events_per_batch=10**9)
    m = job.run(base_path=base_dir)
    o = replay(base, d["wal"], 4)
    assert job.read_table_arrow().select(o.final.column_names).equals(o.final)
    assert m.total("rows_applied") == o.rows_applied


def test_fat_segment_splits_across_combine_tasks(workdir):
    """One oversized WAL segment (many row groups) must split into multiple
    combine chunks instead of loading whole into a single task — with
    identical results and counters."""
    import pyarrow.parquet as pq

    spec = WalSpec(seed=73, n_convs=30, turns_per_conv=3, n_events=2000,
                   n_segments=1, dup_redelivery_frac=0.1,
                   out_of_order_frac=0.2)
    base = make_base(spec)
    base_path = os.path.join(workdir, "base.parquet")
    pq.write_table(base, base_path)
    wal = make_wal(spec)
    wal_dir = os.path.join(workdir, "wal")
    os.makedirs(wal_dir)
    # one segment, 20 row groups of 105 rows
    pq.write_table(wal, os.path.join(wal_dir, "segment-00000.parquet"),
                   row_group_size=105)

    job = CDCJob(os.path.join(workdir, "table"), wal_dir, num_partitions=4,
                 events_per_batch=10**9, combine_batch_size=200)
    m = job.run(base_path=base_path)
    o = replay(base, wal, 4)
    assert job.read_table_arrow().select(o.final.column_names).equals(o.final)
    assert m.total("conflict_count") == o.conflict_count
    assert m.total("dedup_count") + m.total("replay_skipped") == o.dedup_count


def test_partition_count_not_divisible_by_group_size(workdir):
    """P=20 with slice_group_size=8 (3 uneven groups) and P=3 with G=8
    (single group) must both stay oracle-exact."""
    spec = WalSpec(seed=77, n_convs=40, turns_per_conv=3, n_events=500,
                   n_segments=4, dup_redelivery_frac=0.1,
                   out_of_order_frac=0.2, frac_delete=0.2)
    for P_ in (20, 3):
        wd = os.path.join(workdir, f"p{P_}")
        os.makedirs(wd)
        d = synthesize(spec, wd)
        job = CDCJob(os.path.join(wd, "table"), os.path.join(wd, "wal"),
                     num_partitions=P_, events_per_batch=200,
                     slice_group_size=8)
        m = job.run(base_path=d["base_path"])
        o = replay(d["base"], d["wal"], P_)
        assert job.read_table_arrow().select(
            o.final.column_names).equals(o.final)
        assert m.total("conflict_count") == o.conflict_count


def test_time_left_estimator():
    """Reference A5 parity: eta = items-left x rolling avg time per item,
    windowed so the estimate tracks CURRENT throughput."""
    from cwds_jobs_ray.stages.progress import TimeLeftEstimator
    est = TimeLeftEstimator(1000, window=2)
    assert est.eta_s == 0.0 and est.rate == 0.0  # unknown before data
    est.record(100, 1.0)  # 100 items/s
    assert est.rate == 100.0
    assert est.eta_s == 9.0  # 900 left / 100 per s
    est.record(100, 1.0)
    est.record(400, 1.0)  # window=2 -> avg over last two: 250 items/s
    assert est.rate == 250.0
    assert est.eta_s == (1000 - 600) / 250.0
    est.record(400, 1.0)
    assert est.items_left == 0 and est.eta_s == 0.0
    # overshoot never goes negative
    est.record(50, 1.0)
    assert est.items_left == 0 and est.eta_s == 0.0
