"""Multi-source CDC: composite per-source savepoints, namespaced lsns,
per-source replay filtering — the reference's CapUsers multi-source job
shape (/root/reference/jobs-cap-users/src/main/java/gov/ca/cwds/jobs/cap/users/service/CapUsersSavePointService.java:40-47
snapshots one watermark per source).
"""

import os

import pyarrow as pa
import pyarrow.parquet as pq

from cwds_jobs_ray.pipelines.cdc import CDCJob
from cwds_jobs_ray.pipelines.oracle import replay
from cwds_jobs_ray.schema import CHANGE_SCHEMA_V2
from cwds_jobs_ray.synth import WalSpec, make_base, make_wal, write_wal_segments

P = 4
NS = 1 << 48


def _effective(wal: pa.Table, ns: int) -> pa.Table:
    import pyarrow.compute as pc
    return wal.set_column(wal.schema.get_field_index("lsn"), "lsn",
                          pc.add(wal["lsn"], ns))


def _setup_two_sources(workdir, spec_a, spec_b):
    base = make_base(WalSpec(seed=5, n_convs=max(spec_a.n_convs,
                                                 spec_b.n_convs),
                             turns_per_conv=3))
    base_path = os.path.join(workdir, "base.parquet")
    pq.write_table(base, base_path)
    wal_a, wal_b = make_wal(spec_a), make_wal(spec_b)
    write_wal_segments(wal_a, os.path.join(workdir, "wal_a"),
                       spec_a.n_segments)
    write_wal_segments(wal_b, os.path.join(workdir, "wal_b"),
                       spec_b.n_segments)
    return base, base_path, wal_a, wal_b


def _oracle_union(wal_a, wal_b):
    # sources sort as ("a", "b") -> namespaces 1<<48 and 2<<48
    return pa.concat_tables([_effective(wal_a, NS), _effective(wal_b, 2 * NS)])


def test_two_sources_match_union_oracle(workdir):
    """Two sources with OVERLAPPING raw lsn ranges and conflicting keys:
    final state must equal the oracle replay of the namespaced union, with
    exact counters; savepoints advance per source."""
    spec_a = WalSpec(seed=6, n_convs=10, turns_per_conv=3, n_events=120,
                     n_segments=3, dup_redelivery_frac=0.1,
                     out_of_order_frac=0.2, frac_delete=0.2)
    spec_b = WalSpec(seed=7, n_convs=10, turns_per_conv=3, n_events=90,
                     n_segments=2, dup_redelivery_frac=0.1,
                     out_of_order_frac=0.2)
    base, base_path, wal_a, wal_b = _setup_two_sources(workdir, spec_a, spec_b)

    job = CDCJob(os.path.join(workdir, "table"),
                 {"a": os.path.join(workdir, "wal_a"),
                  "b": os.path.join(workdir, "wal_b")},
                 num_partitions=P, events_per_batch=50)
    m = job.run(base_path=base_path)

    o = replay(base, _oracle_union(wal_a, wal_b), P)
    got = job.read_table_arrow()
    assert got.select(o.final.column_names).equals(o.final)
    assert m.total("rows_applied") == o.rows_applied
    assert m.total("conflict_count") == o.conflict_count
    assert m.total("dedup_count") + m.total("replay_skipped") == o.dedup_count
    # composite savepoint: one watermark per source, in its own namespace
    assert m.sources["a"]["applied_through_lsn"] == NS + 120
    assert m.sources["b"]["applied_through_lsn"] == 2 * NS + 90


def test_sources_resume_independently(workdir):
    """New segments landing in ONE source only: the other source's savepoint
    must not move, and the new events apply exactly once."""
    spec_a = WalSpec(seed=8, n_convs=8, turns_per_conv=2, n_events=60,
                     n_segments=2)
    spec_b = WalSpec(seed=9, n_convs=8, turns_per_conv=2, n_events=40,
                     n_segments=2)
    base, base_path, wal_a, wal_b = _setup_two_sources(workdir, spec_a, spec_b)
    srcs = {"a": os.path.join(workdir, "wal_a"),
            "b": os.path.join(workdir, "wal_b")}
    job = CDCJob(os.path.join(workdir, "table"), srcs,
                 num_partitions=P, events_per_batch=10**9)
    m1 = job.run(base_path=base_path)
    b_before = m1.sources["b"]["applied_through_lsn"]

    # a second wave arrives on source a only (lsns 61..90)
    wal_a2 = make_wal(WalSpec(seed=10, n_convs=8, turns_per_conv=2,
                              n_events=30, n_segments=1))
    import pyarrow.compute as pc
    wal_a2 = wal_a2.set_column(wal_a2.schema.get_field_index("lsn"), "lsn",
                               pc.add(wal_a2["lsn"], 60))
    pq.write_table(wal_a2, os.path.join(workdir, "wal_a",
                                        "segment-00090.parquet"))
    m2 = CDCJob(job.table_dir, srcs, num_partitions=P,
                events_per_batch=10**9).run()
    assert m2.sources["a"]["applied_through_lsn"] == NS + 90
    assert m2.sources["b"]["applied_through_lsn"] == b_before

    union = pa.concat_tables([
        _effective(wal_a, NS), _effective(wal_a2, NS),
        _effective(wal_b, 2 * NS)])
    o = replay(base, union, P)
    assert job.read_table_arrow().select(o.final.column_names).equals(o.final)
    assert m2.total("conflict_count") == o.conflict_count


def test_cross_source_replay_filtering_is_per_source(workdir):
    """A fresh source-b event whose raw lsn is numerically tiny must NOT be
    filtered by source-a's (much larger effective) watermark — replay
    filtering is per source."""
    base = make_base(WalSpec(seed=11, n_convs=3, turns_per_conv=1))
    base_path = os.path.join(workdir, "base.parquet")
    pq.write_table(base, base_path)
    t0 = 1_700_000_800_000_000
    row = dict(op="U", conv_id="c000001", turn_idx=0, role="user",
               tool=None)
    seg_a = pa.Table.from_pylist(
        [dict(row, lsn=500, text="from a", ts=t0)], schema=CHANGE_SCHEMA_V2)
    wal_a = os.path.join(workdir, "wal_a")
    wal_b = os.path.join(workdir, "wal_b")
    os.makedirs(wal_a)
    os.makedirs(wal_b)
    pq.write_table(seg_a, os.path.join(wal_a, "segment-00000.parquet"))
    srcs = {"a": wal_a, "b": wal_b}
    job = CDCJob(os.path.join(workdir, "table"), srcs, num_partitions=2,
                 events_per_batch=10**9)
    job.run(base_path=base_path)

    # b's first event: raw lsn 1 (<< a's watermark 500), NEWER ts -> must win
    seg_b = pa.Table.from_pylist(
        [dict(row, lsn=1, text="from b", ts=t0 + 10**6)],
        schema=CHANGE_SCHEMA_V2)
    pq.write_table(seg_b, os.path.join(wal_b, "segment-00000.parquet"))
    m = CDCJob(job.table_dir, srcs, num_partitions=2,
               events_per_batch=10**9).run()
    got = job.read_table_arrow().to_pandas()
    cell = got[(got["conv_id"] == "c000001") & (got["turn_idx"] == 0)]
    assert cell["text"].tolist() == ["from b"]
    assert m.total("replay_skipped") == 0


def test_multi_source_from_config(workdir, capsys, monkeypatch):
    """A job fully driven by a wal_sources config file."""
    import json

    from cwds_jobs_ray.cli import main as cli_main

    spec_a = WalSpec(seed=12, n_convs=6, turns_per_conv=2, n_events=30,
                     n_segments=1)
    spec_b = WalSpec(seed=13, n_convs=6, turns_per_conv=2, n_events=20,
                     n_segments=1)
    base, base_path, wal_a, wal_b = _setup_two_sources(workdir, spec_a, spec_b)
    cfg = os.path.join(workdir, "job.yaml")
    with open(cfg, "w") as f:
        f.write(
            f"table_dir: {os.path.join(workdir, 'table')}\n"
            f"base_path: {base_path}\n"
            "num_partitions: 4\n"
            "wal_sources:\n"
            f"  cws: {os.path.join(workdir, 'wal_a')}\n"
            f"  cap: {os.path.join(workdir, 'wal_b')}\n")
    assert cli_main(["run", "-c", cfg]) == 0
    out = json.loads(capsys.readouterr().out)
    # sources sort ("cap", "cws") -> cap=wal_b gets namespace 1, cws=wal_a 2
    union = pa.concat_tables([_effective(wal_b, NS), _effective(wal_a, 2 * NS)])
    o = replay(base, union, 4)
    assert out["rows"] == o.rows_applied


def test_reshard_multi_source_table(workdir):
    """Resharding a two-source table must preserve state and keep applying
    from both sources correctly afterwards (per-source watermarks carried
    into the new partitions)."""
    spec_a = WalSpec(seed=14, n_convs=10, turns_per_conv=2, n_events=80,
                     n_segments=2, out_of_order_frac=0.2)
    spec_b = WalSpec(seed=15, n_convs=10, turns_per_conv=2, n_events=60,
                     n_segments=2, frac_delete=0.2)
    base, base_path, wal_a, wal_b = _setup_two_sources(workdir, spec_a, spec_b)
    srcs = {"a": os.path.join(workdir, "wal_a"),
            "b": os.path.join(workdir, "wal_b")}
    job = CDCJob(os.path.join(workdir, "table"), srcs, num_partitions=P,
                 events_per_batch=10**9)
    job.run(base_path=base_path)
    before = job.read_table_arrow()

    job2 = CDCJob(job.table_dir, srcs, num_partitions=6,
                  events_per_batch=10**9)
    m = job2.reshard(6)
    assert job2.read_table_arrow().equals(before)
    # per-source watermarks carried into every new partition
    for i in range(6):
        sw = m.part(i).source_watermarks
        assert sw["a"] == m.sources["a"]["applied_through_lsn"]
        assert sw["b"] == m.sources["b"]["applied_through_lsn"]

    # second wave on source b only, applied after the reshard
    wal_b2 = make_wal(WalSpec(seed=16, n_convs=10, turns_per_conv=2,
                              n_events=25, n_segments=1))
    import pyarrow.compute as pc
    wal_b2 = wal_b2.set_column(wal_b2.schema.get_field_index("lsn"), "lsn",
                               pc.add(wal_b2["lsn"], 60))
    pq.write_table(wal_b2, os.path.join(workdir, "wal_b",
                                        "segment-00090.parquet"))
    m2 = job2.run()
    union = pa.concat_tables([
        _effective(wal_a, NS), _effective(wal_b, 2 * NS),
        _effective(wal_b2, 2 * NS)])
    o = replay(base, union, 6)
    assert job2.read_table_arrow().select(o.final.column_names).equals(o.final)
    assert m2.total("conflict_count") == o.conflict_count


def test_schema_evolution_across_sources(workdir):
    """Source b introduces a new column source a never carries: rows from
    both merge into the unified schema with null backfill, whichever order
    the sources drain in."""
    base = make_base(WalSpec(seed=17, n_convs=4, turns_per_conv=2))
    base_path = os.path.join(workdir, "base.parquet")
    pq.write_table(base, base_path)
    t0 = 1_700_000_700_000_000
    seg_a = pa.Table.from_pylist(
        [dict(lsn=1, op="U", conv_id="c000000", turn_idx=0, role="user",
              text="plain", tool=None, ts=t0)], schema=CHANGE_SCHEMA_V2)
    v3 = CHANGE_SCHEMA_V2.append(pa.field("meta", pa.string()))
    seg_b = pa.Table.from_pylist(
        [dict(lsn=1, op="U", conv_id="c000001", turn_idx=0, role="user",
              text="rich", tool=None, ts=t0, meta="m1")], schema=v3)
    wal_a, wal_b = os.path.join(workdir, "wa"), os.path.join(workdir, "wb")
    os.makedirs(wal_a)
    os.makedirs(wal_b)
    pq.write_table(seg_a, os.path.join(wal_a, "segment-00000.parquet"))
    pq.write_table(seg_b, os.path.join(wal_b, "segment-00000.parquet"))

    job = CDCJob(os.path.join(workdir, "table"),
                 {"a": wal_a, "b": wal_b}, num_partitions=2,
                 events_per_batch=10**9)
    m = job.run(base_path=base_path)
    assert "meta" in m.table_columns
    df = job.read_table_arrow().to_pandas().set_index(["conv_id", "turn_idx"])
    assert df.loc[("c000001", 0), "meta"] == "m1"
    assert df.loc[("c000000", 0), "text"] == "plain"
    assert df.loc[("c000000", 0), "meta"] is None or \
        df.loc[("c000000", 0)].isna()["meta"]


def test_namespace_pinning_survives_added_and_reordered_sources(workdir):
    """Adding a source whose name sorts FIRST must not shift the existing
    sources' namespaces (config-order derivation would renumber them; the
    manifest's pinned map is authoritative)."""
    spec_a = WalSpec(seed=31, n_convs=6, turns_per_conv=2, n_events=40,
                     n_segments=2)
    spec_b = WalSpec(seed=32, n_convs=6, turns_per_conv=2, n_events=30,
                     n_segments=2)
    base, base_path, wal_a, wal_b = _setup_two_sources(workdir, spec_a, spec_b)
    srcs = {"m_src": os.path.join(workdir, "wal_a"),
            "z_src": os.path.join(workdir, "wal_b")}
    job = CDCJob(os.path.join(workdir, "table"), srcs,
                 num_partitions=P, events_per_batch=10**9)
    m1 = job.run(base_path=base_path)
    assert m1.source_namespaces == {"m_src": NS, "z_src": 2 * NS}

    # new source "a_src" sorts before both existing names: without pinning
    # it would steal namespace 1<<48 from m_src and shift everything
    wal_c = make_wal(WalSpec(seed=33, n_convs=6, turns_per_conv=2,
                             n_events=20, n_segments=1))
    write_wal_segments(wal_c, os.path.join(workdir, "wal_c"), 1)
    job2 = CDCJob(os.path.join(workdir, "table"),
                  {"a_src": os.path.join(workdir, "wal_c"), **srcs},
                  num_partitions=P, events_per_batch=10**9)
    m2 = job2.apply_wal()
    assert m2.source_namespaces["m_src"] == NS          # unchanged
    assert m2.source_namespaces["z_src"] == 2 * NS      # unchanged
    assert m2.source_namespaces["a_src"] == 3 * NS      # appended, not 1<<48
    # savepoints stayed in their pinned namespaces
    assert m2.sources["m_src"]["applied_through_lsn"] == NS + 40
    assert m2.sources["z_src"]["applied_through_lsn"] == 2 * NS + 30
    assert m2.sources["a_src"]["applied_through_lsn"] == 3 * NS + 20
    # final table equals the oracle over the PINNED namespaced union
    o = replay(base, pa.concat_tables([
        _effective(wal_a, NS), _effective(wal_b, 2 * NS),
        _effective(wal_c, 3 * NS)]), P)
    got = job2.read_table_arrow()
    assert got.select(o.final.column_names).equals(o.final)


def test_single_multi_conversion_refused(workdir):
    """Converting a committed single-source table to multi-source (or vice
    versa) must fail fast instead of silently re-namespacing lsns."""
    import pytest
    spec = WalSpec(seed=41, n_convs=6, turns_per_conv=2, n_events=30,
                   n_segments=2)
    base, base_path, wal_a, wal_b = _setup_two_sources(workdir, spec, spec)
    table = os.path.join(workdir, "table")
    job = CDCJob(table, os.path.join(workdir, "wal_a"),
                 num_partitions=P, events_per_batch=10**9)
    job.run(base_path=base_path)

    multi = CDCJob(table, {"a": os.path.join(workdir, "wal_a"),
                           "b": os.path.join(workdir, "wal_b")},
                   num_partitions=P)
    with pytest.raises(RuntimeError, match="single-source table to multi"):
        multi.apply_wal()

    # and the reverse: a multi-source table driven single-source
    table2 = os.path.join(workdir, "table2")
    mjob = CDCJob(table2, {"a": os.path.join(workdir, "wal_a"),
                           "b": os.path.join(workdir, "wal_b")},
                  num_partitions=P, events_per_batch=10**9)
    mjob.run(base_path=base_path)
    sjob = CDCJob(table2, os.path.join(workdir, "wal_a"), num_partitions=P)
    with pytest.raises(RuntimeError, match="pinned to multi-source"):
        sjob.apply_wal()


def test_raw_lsn_must_fit_below_namespace_shift(workdir):
    """Raw lsns >= 2^48 would overlap the next source's namespace: the
    segment scan must refuse them when namespacing is in effect."""
    import numpy as np
    import pytest
    from cwds_jobs_ray.sources.wal import list_segments
    big = pa.table({
        "op": pa.array(["I"]), "lsn": pa.array([1 << 48], pa.int64()),
        "ts": pa.array([np.datetime64("2024-01-01T00:00:00", "us")]),
        "conv_id": pa.array(["c0"]), "turn_idx": pa.array([0], pa.int32()),
        "role": pa.array(["user"]), "text": pa.array(["x"]),
        "tool": pa.array([None], pa.string()),
    })
    d = os.path.join(workdir, "walbig")
    os.makedirs(d)
    pq.write_table(big, os.path.join(d, "seg-000.parquet"))
    with pytest.raises(ValueError, match="does not fit below"):
        list_segments(d, "a", NS)
    # source #0 of a MULTI-source table has namespace 0 but its raw lsns
    # still must not reach into source #1's range
    with pytest.raises(ValueError, match="does not fit below"):
        list_segments(d, "a", 0, multi=True)
    assert list_segments(d, "default", 0)  # single-source: allowed


def test_pinned_namespaces_survive_compact_and_reshard(workdir):
    """compact() and reshard() rebuild the manifest — the pinned
    source->namespace map must carry through both."""
    spec_a = WalSpec(seed=51, n_convs=6, turns_per_conv=2, n_events=30,
                     n_segments=2)
    spec_b = WalSpec(seed=52, n_convs=6, turns_per_conv=2, n_events=20,
                     n_segments=1)
    base, base_path, wal_a, wal_b = _setup_two_sources(workdir, spec_a, spec_b)
    srcs = {"a": os.path.join(workdir, "wal_a"),
            "b": os.path.join(workdir, "wal_b")}
    job = CDCJob(os.path.join(workdir, "table"), srcs,
                 num_partitions=P, events_per_batch=10**9)
    m = job.run(base_path=base_path)
    pinned = dict(m.source_namespaces)
    assert pinned == {"a": NS, "b": 2 * NS}
    m2 = job.compact(tombstone_horizon_lsn=0)
    assert m2.source_namespaces == pinned
    m3 = job.reshard(P * 2)
    assert m3.source_namespaces == pinned
    # and a fresh job instance still validates/applies cleanly
    job2 = CDCJob(os.path.join(workdir, "table"), srcs,
                  num_partitions=P * 2, events_per_batch=10**9)
    m4 = job2.apply_wal()
    assert m4.source_namespaces == pinned


def test_multi_source_with_schema_evolution(workdir):
    """One source still emits v1 segments (no `tool` column) while the other
    emits v2: the unified committed schema must carry `tool` with null
    backfill for v1 rows, and the final table must equal the oracle replay
    of the namespaced union of the WALs AS WRITTEN (v1 rows tool-null)."""
    from cwds_jobs_ray.synth import load_wal

    spec_a = WalSpec(seed=61, n_convs=8, turns_per_conv=3, n_events=60,
                     n_segments=3, schema_v1_segments=2,
                     out_of_order_frac=0.2, dup_redelivery_frac=0.1)
    spec_b = WalSpec(seed=62, n_convs=8, turns_per_conv=3, n_events=40,
                     n_segments=2)
    base = make_base(WalSpec(seed=60, n_convs=8, turns_per_conv=3))
    base_path = os.path.join(workdir, "base.parquet")
    pq.write_table(base, base_path)
    write_wal_segments(make_wal(spec_a), os.path.join(workdir, "wal_a"),
                       spec_a.n_segments, spec_a.schema_v1_segments)
    write_wal_segments(make_wal(spec_b), os.path.join(workdir, "wal_b"),
                       spec_b.n_segments)
    wal_a = load_wal(os.path.join(workdir, "wal_a"))  # as written: v1 nulls
    wal_b = load_wal(os.path.join(workdir, "wal_b"))
    wal_a = wal_a.select(wal_b.column_names)  # align order for the union

    job = CDCJob(os.path.join(workdir, "table"),
                 {"a": os.path.join(workdir, "wal_a"),
                  "b": os.path.join(workdir, "wal_b")},
                 num_partitions=P, events_per_batch=30)
    m = job.run(base_path=base_path)

    o = replay(base, _oracle_union(wal_a, wal_b), P)
    got = job.read_table_arrow()
    assert "tool" in got.column_names
    assert got.select(o.final.column_names).equals(o.final)
    assert m.total("rows_applied") == o.rows_applied
    assert m.total("conflict_count") == o.conflict_count


def test_change_feed_over_multi_source_table(workdir):
    """read_changes works off committed snapshots, so it must be exact on a
    multi-source table too (namespaced lsns ride through the diff). Apply
    source a, snapshot; add source b, diff — the feed must equal the
    dict-walk of the two union-replay states."""
    spec_a = WalSpec(seed=16, n_convs=10, turns_per_conv=3, n_events=120,
                     n_segments=3, dup_redelivery_frac=0.1,
                     out_of_order_frac=0.2, frac_delete=0.2)
    spec_b = WalSpec(seed=17, n_convs=10, turns_per_conv=3, n_events=90,
                     n_segments=2, out_of_order_frac=0.2)
    base, base_path, wal_a, wal_b = _setup_two_sources(workdir, spec_a,
                                                       spec_b)
    table = os.path.join(workdir, "table")
    # source b exists from the start (namespaces pin at creation) but has
    # no segments yet at snapshot time
    b_dir = os.path.join(workdir, "wal_b_live")
    os.makedirs(b_dir)
    srcs = {"a": os.path.join(workdir, "wal_a"), "b": b_dir}
    job_a = CDCJob(table, srcs, num_partitions=P, events_per_batch=500)
    ma = job_a.run(base_path=base_path)
    for f in sorted(os.listdir(os.path.join(workdir, "wal_b"))):
        os.link(os.path.join(workdir, "wal_b", f), os.path.join(b_dir, f))
    job_ab = CDCJob(table, srcs, num_partitions=P, events_per_batch=500)
    mb = job_ab.run()

    sa = replay(base, _effective(wal_a, NS), P).final
    sb = replay(base, _oracle_union(wal_a, wal_b), P).final
    a = {(r["conv_id"], r["turn_idx"]): r for r in sa.to_pylist()}
    b = {(r["conv_id"], r["turn_idx"]): r for r in sb.to_pylist()}
    exp = {}
    for k in set(a) | set(b):
        if k not in b:
            exp[k] = "D"
        elif k not in a:
            exp[k] = "I"
        elif a[k]["lsn"] != b[k]["lsn"]:
            exp[k] = "U"
    import ray
    feed = pa.concat_tables(
        [t for t in ray.get(job_ab.read_changes(
            ma.table_version, mb.table_version)
            .materialize().to_arrow_refs()) if t.num_rows],
        promote_options="permissive")
    got = {(r["conv_id"], r["turn_idx"]): r["change_type"]
           for r in feed.to_pylist()}
    assert got == exp and exp
