"""Property-based engine-vs-oracle equivalence (hypothesis).

Random adversarial WALs — arbitrary I/U/D sequences, colliding timestamps,
verbatim redeliveries, interleaved keys — applied through the distributed
engine at two batch granularities must always byte-equal the single-process
oracle replay with exactly matching conflict counters. Goes beyond the fixed
seeded scenarios (the reference has no property tests; SURVEY §5.1 item 4)."""

import os

import pyarrow as pa
import pyarrow.parquet as pq
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from cwds_jobs_ray.pipelines.cdc import CDCJob
from cwds_jobs_ray.pipelines.oracle import replay
from cwds_jobs_ray.schema import CHANGE_SCHEMA_V2
from cwds_jobs_ray.synth import WalSpec, make_base, write_wal_segments

TS = 1_700_000_000_000_000

event_st = st.fixed_dictionaries({
    "op": st.sampled_from(["I", "U", "D"]),
    "conv": st.integers(0, 3),
    "turn": st.integers(0, 3),
    "ts_off": st.integers(-5, 5),   # small range -> many ts collisions
    "dup": st.booleans(),           # emit a verbatim redelivery copy
})


def _wal_from_events(events):
    rows = []
    for i, e in enumerate(events):
        is_d = e["op"] == "D"
        row = dict(
            lsn=i + 1,
            op=e["op"],
            conv_id=f"c{e['conv']:06d}",
            turn_idx=e["turn"],
            role=None if is_d else "user",
            text=None if is_d else f"text-{i}",
            tool=None,
            ts=TS + 10**9 + e["ts_off"] * 10**6,
        )
        rows.append(row)
        if e["dup"]:
            rows.append(dict(row))
    cols = {name: [r[name] for r in rows] for name in
            ["lsn", "op", "conv_id", "turn_idx", "role", "text", "tool", "ts"]}
    return pa.Table.from_pydict(cols, schema=CHANGE_SCHEMA_V2)


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(events=st.lists(event_st, min_size=1, max_size=25),
       epb=st.sampled_from([1, 7, 10**9]))
def test_random_wal_matches_oracle(tmp_path_factory, events, epb):
    workdir = str(tmp_path_factory.mktemp("prop"))
    base = make_base(WalSpec(seed=1, n_convs=2, turns_per_conv=2))
    base_path = os.path.join(workdir, "base.parquet")
    pq.write_table(base, base_path)
    wal = _wal_from_events(events)
    write_wal_segments(wal, os.path.join(workdir, "wal"),
                       min(3, wal.num_rows))
    job = CDCJob(os.path.join(workdir, "table"), os.path.join(workdir, "wal"),
                 num_partitions=4, events_per_batch=epb)
    m = job.run(base_path=base_path)
    o = replay(base, wal, 4)
    got = job.read_table_arrow()
    assert got.select(o.final.column_names).equals(o.final)
    assert m.total("conflict_count") == o.conflict_count
    assert m.total("rows_applied") == o.rows_applied
    assert (m.total("dedup_count") + m.total("replay_skipped")
            == o.dedup_count)


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(events=st.lists(event_st, min_size=1, max_size=25),
       epb=st.sampled_from([1, 5, 10**9]),
       combine_size=st.sampled_from([1, 3, 10**9]),
       delta_threshold=st.sampled_from([0.0, 0.5, 10.0]),
       max_deltas=st.sampled_from([1, 3, 100]),
       reshard_to=st.sampled_from([None, 2, 7]))
def test_random_wal_with_delta_and_reshard_knobs(tmp_path_factory, events,
                                                 epb, combine_size,
                                                 delta_threshold, max_deltas,
                                                 reshard_to):
    """The full knob space — batch granularity, combine chunking, delta-file
    thresholds, tiering, and a mid-stream reshard — must never change the
    final state or the counters vs the single-pass oracle."""
    workdir = str(tmp_path_factory.mktemp("propk"))
    base = make_base(WalSpec(seed=1, n_convs=2, turns_per_conv=2))
    base_path = os.path.join(workdir, "base.parquet")
    pq.write_table(base, base_path)
    wal = _wal_from_events(events)
    half = wal.num_rows // 2
    wal_dir = os.path.join(workdir, "wal")
    write_wal_segments(wal.slice(0, half), wal_dir, max(1, min(2, half)))
    job = CDCJob(os.path.join(workdir, "table"), wal_dir,
                 num_partitions=4, events_per_batch=epb,
                 combine_batch_size=combine_size,
                 delta_threshold=delta_threshold, max_delta_files=max_deltas)
    job.run(base_path=base_path)
    P = 4
    if reshard_to is not None:
        job.reshard(reshard_to)
        P = reshard_to
        job = CDCJob(job.table_dir, wal_dir, num_partitions=P,
                     events_per_batch=epb, combine_batch_size=combine_size,
                     delta_threshold=delta_threshold,
                     max_delta_files=max_deltas)
    # second wave of segments lands after the (optional) reshard
    rest = wal.slice(half)
    if rest.num_rows:
        import pyarrow.parquet as pq_
        pq_.write_table(rest, os.path.join(wal_dir, "segment-99999.parquet"))
    m = job.run()
    o = replay(base, wal, P)
    got = job.read_table_arrow()
    assert got.select(o.final.column_names).equals(o.final)
    assert m.total("conflict_count") == o.conflict_count
    assert m.total("rows_applied") == o.rows_applied
    assert (m.total("dedup_count") + m.total("replay_skipped")
            == o.dedup_count)
