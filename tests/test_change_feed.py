"""Change data feed (``CDCJob.read_changes``) and point lookup
(``CDCJob.lookup``).

The feed is the row-level diff of the committed LIVE state between two
retained versions — the subscription surface the reference's downstream
consumers poll the published index for (ChangedEntityService semantics:
inserts/updates carry the post-image, deletes the last-known pre-image).
Expected values come from an INDEPENDENT per-key dict walk over the oracle
replay states — not from the engine's vectorized diff kernel.
"""

import os

import pyarrow as pa
import pyarrow.compute as pc
import pytest
import ray


def _arrow(ds) -> pa.Table:
    refs = ds.materialize().to_arrow_refs()
    ts = [t for t in ray.get(refs) if t.num_rows] or [ray.get(refs[0])] if refs else []
    return pa.concat_tables(ts, promote_options="permissive") if ts else pa.table({})

from cwds_jobs_ray.pipelines.cdc import CDCJob
from cwds_jobs_ray.pipelines.oracle import replay
from cwds_jobs_ray.state.manifest import Manifest
from cwds_jobs_ray.synth import WalSpec, synthesize

SPEC = WalSpec(seed=77, n_convs=30, turns_per_conv=4, n_events=500,
               n_segments=8, dup_redelivery_frac=0.06, out_of_order_frac=0.15,
               schema_v1_segments=2, hot_key_frac=0.3)
P = 4


def _run_with_version_map(workdir, events_per_batch=120):
    d = synthesize(SPEC, workdir)
    table_dir = os.path.join(workdir, "table")
    job = CDCJob(table_dir, os.path.join(workdir, "wal"),
                 num_partitions=P, events_per_batch=events_per_batch)
    wms = {}
    job.run(base_path=d["base_path"],
            on_before_commit=lambda m: wms.__setitem__(
                m.table_version, m.applied_through_lsn))
    return d, job, table_dir, wms


def _state_at(d, wm):
    """Oracle live state (incl. winning lsn) after events with lsn <= wm."""
    wal = d["wal"].filter(pc.less_equal(pc.field("lsn"), wm))
    return replay(d["base"], wal, P).final


def _expected_diff(ta, tb):
    """Independent per-key dict walk: the reference diff of two live states.

    Returns {(conv_id, turn_idx): (change_type, payload_row)} where the
    payload is the B post-image for I/U and the A pre-image for D.
    """
    a = {(r["conv_id"], r["turn_idx"]): r for r in ta.to_pylist()}
    b = {(r["conv_id"], r["turn_idx"]): r for r in tb.to_pylist()}
    out = {}
    for k in set(a) | set(b):
        if k not in b:
            out[k] = ("D", a[k])
        elif k not in a:
            out[k] = ("I", b[k])
        elif a[k]["lsn"] != b[k]["lsn"]:
            out[k] = ("U", b[k])
    return out


def _check_feed(got, exp, prev=None):
    """``exp``: post/pre-image map from _expected_diff; ``prev``: the A
    state as {(conv, turn): row} to verify U rows' before-images."""
    rows = got.to_pandas().to_dict("records")
    assert len(rows) == len(exp)

    def eq(rv, pv):
        return (rv == pv) or (rv is None and pv is None) or (
            rv != rv and pv is None)

    for r in rows:
        k = (r["conv_id"], r["turn_idx"])
        ct, payload = exp[k]
        assert r["change_type"] == ct, k
        for c in ("role", "text", "tool", "lsn"):
            assert eq(r[c], payload[c]), (k, c, r[c], payload[c])
            if prev is not None:
                pv = prev[k][c] if ct == "U" else None
                assert eq(r["prev_" + c], pv), (k, "prev_" + c)


def test_read_changes_matches_oracle_state_diff(workdir):
    d, job, table_dir, wms = _run_with_version_map(workdir)
    applied = sorted(v for v in Manifest.retained_versions(table_dir)
                     if v in wms and v >= 1)
    assert len(applied) >= 3, "need several commits for a meaningful feed"
    # every adjacent pair, plus the widest span
    pairs = list(zip(applied, applied[1:])) + [(applied[0], applied[-1])]
    for va, vb in pairs:
        sa = _state_at(d, wms[va])
        exp = _expected_diff(sa, _state_at(d, wms[vb]))
        got = _arrow(job.read_changes(va, vb))
        assert exp, (va, vb)  # the synth workload always changes something
        _check_feed(got, exp,
                    prev={(r["conv_id"], r["turn_idx"]): r
                          for r in sa.to_pylist()})


def test_read_changes_same_version_is_empty_with_schema(workdir):
    _d, job, table_dir, wms = _run_with_version_map(workdir)
    v = max(v for v in wms if v >= 1)
    got = _arrow(job.read_changes(v, v))
    assert got.num_rows == 0
    assert {"conv_id", "turn_idx", "change_type", "lsn"} <= set(
        got.column_names)


def test_read_changes_default_to_current_and_order_check(workdir):
    d, job, table_dir, wms = _run_with_version_map(workdir)
    va = min(v for v in wms if v >= 1)
    cur = Manifest.load(table_dir).table_version
    assert _arrow(job.read_changes(va)).equals(
        _arrow(job.read_changes(va, cur)))
    with pytest.raises(ValueError, match="predates"):
        _arrow(job.read_changes(cur, va))


def test_read_changes_across_reshard(workdir):
    """A reshard between the versions breaks partition alignment; the feed
    must fall back to the keyed re-bucket path and still be exact."""
    d, job, table_dir, wms = _run_with_version_map(workdir)
    va = max(v for v in wms if v >= 1)
    job.reshard(new_num_partitions=7)
    vb = Manifest.load(table_dir).table_version
    ma = Manifest.load_version(table_dir, va)
    mb = Manifest.load_version(table_dir, vb)
    assert ma.num_partitions != mb.num_partitions
    # reshard moves no rows logically: the feed across it is empty
    assert _arrow(job.read_changes(va, vb)).num_rows == 0
    # and a span that crosses the reshard sees exactly the data changes
    v0 = min(v for v in wms if v >= 1)
    exp = _expected_diff(_state_at(d, wms[v0]), _state_at(d, wms[va]))
    _check_feed(_arrow(job.read_changes(v0, vb)), exp)


def test_lookup_point_query(workdir):
    d, job, table_dir, wms = _run_with_version_map(workdir)
    full = job.read_table_arrow()
    conv = full["conv_id"][0].as_py()
    got = job.lookup(conv)
    exp = full.filter(pc.equal(full["conv_id"], conv))
    assert got.select(exp.column_names).equals(exp)
    # turn order within the conversation
    ti = got["turn_idx"].to_pylist()
    assert ti == sorted(ti)
    # column projection
    slim = job.lookup(conv, columns=["conv_id", "turn_idx", "role"])
    assert slim.column_names == ["conv_id", "turn_idx", "role"]
    assert slim.num_rows == exp.num_rows
    # missing key -> typed empty
    miss = job.lookup("no-such-conversation")
    assert miss.num_rows == 0 and "conv_id" in miss.column_names


def test_lookup_time_travel(workdir):
    d, job, table_dir, wms = _run_with_version_map(workdir)
    va = min(v for v in wms if v >= 1)
    old = _state_at(d, wms[va])
    conv = old["conv_id"][0].as_py()
    got = job.lookup(conv, version=va)
    exp = old.filter(pc.equal(old["conv_id"], conv))
    assert got.select(exp.column_names).equals(exp)


# ---------------------------------------------------------------- kernel
# property test: live_state_diff is a pure function; drive it directly
# with randomized state pairs and compare to the dict-walk reference.

from hypothesis import given, settings
from hypothesis import strategies as st


def _mk_state(rows):
    import pyarrow as pa
    return pa.table({
        "conv_id": pa.array([r[0] for r in rows], pa.string()),
        "turn_idx": pa.array([r[1] for r in rows], pa.int64()),
        "role": pa.array([r[2] for r in rows], pa.string()),
        "tool": pa.array([r[3] for r in rows], pa.string()),
        "ts": pa.array([r[4] for r in rows], pa.timestamp("us")),
        "lsn": pa.array([r[5] for r in rows], pa.int64()),
    })


@st.composite
def _state_pair(draw):
    keys = draw(st.lists(st.tuples(st.sampled_from(["c1", "c2", "c3"]),
                                   st.integers(0, 5)),
                         unique=True, max_size=12))
    rows_a, rows_b = [], []
    lsn = 0
    for k in keys:
        in_a = draw(st.booleans())
        in_b = draw(st.booleans())
        same = draw(st.booleans())
        lsn += 1
        ra = (k[0], k[1], draw(st.sampled_from(["user", "assistant"])),
              draw(st.sampled_from(["t1", None])), 1_000_000 * lsn, lsn)
        if in_a:
            rows_a.append(ra)
        if in_b:
            if same and in_a:
                rows_b.append(ra)
            else:
                lsn += 1
                rows_b.append((k[0], k[1],
                               draw(st.sampled_from(["user", "assistant"])),
                               draw(st.sampled_from(["t2", None])),
                               1_000_000 * lsn, lsn))
    return rows_a, rows_b


@settings(max_examples=60, deadline=None)
@given(_state_pair())
def test_live_state_diff_property(pair):
    from cwds_jobs_ray.stages.merge import live_state_diff
    rows_a, rows_b = pair
    ta, tb = _mk_state(rows_a), _mk_state(rows_b)
    got = {(r["conv_id"], r["turn_idx"]): r
           for r in live_state_diff(ta, tb).to_pylist()}
    a = {(r[0], r[1]): r for r in rows_a}
    b = {(r[0], r[1]): r for r in rows_b}
    exp = {}
    for k in set(a) | set(b):
        if k not in b:
            exp[k] = ("D", a[k])
        elif k not in a:
            exp[k] = ("I", b[k])
        elif a[k][5] != b[k][5]:
            exp[k] = ("U", b[k])
    assert set(got) == set(exp)
    for k, (ct, row) in exp.items():
        g = got[k]
        assert g["change_type"] == ct
        assert g["role"] == row[2] and g["tool"] == row[3] \
            and g["lsn"] == row[5]
        if ct == "U":
            pa_row = a[k]
            assert g["prev_role"] == pa_row[2] and g["prev_lsn"] == pa_row[5]
        else:
            assert g["prev_role"] is None and g["prev_lsn"] is None


def test_lookup_projection_without_conv_id(workdir):
    # a projection that omits the key column must still filter correctly
    # and return exactly the requested columns
    d, job, table_dir, wms = _run_with_version_map(workdir)
    full = job.read_table_arrow()
    conv = full["conv_id"][0].as_py()
    exp = full.filter(pc.equal(full["conv_id"], conv))
    slim = job.lookup(conv, columns=["turn_idx", "role"])
    assert slim.column_names == ["turn_idx", "role"]
    assert slim.num_rows == exp.num_rows
    assert slim["turn_idx"].to_pylist() == exp["turn_idx"].to_pylist()


def test_live_state_diff_lsn_above_2_53(workdir):
    # lsns beyond float53 must not compare equal after the outer merge
    from cwds_jobs_ray.stages.merge import live_state_diff
    base = 1 << 60
    ta = pa.table({"conv_id": pa.array(["c", "d"]),
                   "turn_idx": pa.array([0, 0], pa.int64()),
                   "role": pa.array(["user", "user"]),
                   "text": pa.array(["a", "b"]),
                   "lsn": pa.array([base + 1, base + 4], pa.int64())})
    tb = pa.table({"conv_id": pa.array(["c", "d", "e"]),
                   "turn_idx": pa.array([0, 0, 0], pa.int64()),
                   "role": pa.array(["user", "user", "user"]),
                   "text": pa.array(["a2", "b", "new"]),
                   "lsn": pa.array([base + 2, base + 4, base + 8],
                                   pa.int64())})
    out = live_state_diff(ta, tb)
    got = {(r["conv_id"], r["change_type"]): r for r in out.to_pylist()}
    # c: lsn base+1 -> base+2 differs only below float53 resolution
    assert ("c", "U") in got and got[("c", "U")]["lsn"] == base + 2
    assert got[("c", "U")]["prev_lsn"] == base + 1
    assert ("e", "I") in got and got[("e", "I")]["lsn"] == base + 8
    assert ("d", "U") not in got  # identical winning lsn: no row
    assert len(got) == 2


def test_feed_application_reconstructs_target_state(workdir):
    """THE downstream contract: a consumer holding table state at version A
    who applies feed(A, B) row-by-row (I/U upsert post-image, D delete)
    must hold exactly the table state at version B."""
    _d, job, table_dir, wms = _run_with_version_map(workdir)
    applied = sorted(v for v in Manifest.retained_versions(table_dir)
                     if v >= 1)
    va, vb = applied[0], applied[-1]
    pay_cols = None
    state = {}
    ta = job.read_table_arrow(version=va)
    pay_cols = [c for c in ta.column_names]
    for r in ta.to_pylist():
        state[(r["conv_id"], r["turn_idx"])] = {c: r[c] for c in pay_cols}
    feed = _arrow(job.read_changes(va, vb))
    for r in feed.to_pylist():
        k = (r["conv_id"], r["turn_idx"])
        if r["change_type"] == "D":
            assert k in state, k
            del state[k]
        else:
            state[k] = {c: r[c] for c in pay_cols}
    tb = job.read_table_arrow(version=vb)
    exp = {(r["conv_id"], r["turn_idx"]): {c: r[c] for c in pay_cols}
           for r in tb.to_pylist()}
    assert state == exp
