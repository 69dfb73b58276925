"""CDC-synced inverted text index: sync(index@vA, change feed vA->vB) must
equal a full rebuild at vB — shard-for-shard — including U rows whose
before-image tokens must drop out, whole-conversation deletes, and tokens
shared by both images of a U (which must cancel, not double-remove). Also:
idempotent second sync, vacuumed-feed fallback, search vs naive scan,
multi-step sync chains."""

import os

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

from cwds_jobs_ray.pipelines.cdc import CDCJob
from cwds_jobs_ray.pipelines.text_index import TranscriptTextIndex
from cwds_jobs_ray.synth import WalSpec, synthesize

SPEC = WalSpec(seed=77, n_convs=30, turns_per_conv=4, n_events=600,
               n_segments=8, dup_redelivery_frac=0.05, out_of_order_frac=0.15,
               schema_v1_segments=0, hot_key_frac=0.3)
P = 4


def _half_runs(workdir):
    d = synthesize(SPEC, workdir)
    wal = os.path.join(workdir, "wal")
    segs = sorted(os.listdir(wal))
    wal_a = os.path.join(workdir, "wal_a")
    os.makedirs(wal_a)
    for s in segs[:len(segs) // 2]:
        os.link(os.path.join(wal, s), os.path.join(wal_a, s))
    table_dir = os.path.join(workdir, "table")
    job_a = CDCJob(table_dir, wal_a, num_partitions=P, events_per_batch=150)
    job_a.run(base_path=d["base_path"])
    job_b = CDCJob(table_dir, wal, num_partitions=P, events_per_batch=150)
    return d, job_a, job_b, table_dir


def _shards(idx: TranscriptTextIndex) -> dict:
    st = idx._state()
    return {int(k): pq.read_table(f"{idx.dir}/{v}")
            for k, v in st["files"].items()}


def _naive_postings(job) -> set:
    t = job.read_table_arrow()
    out = set()
    for conv, turn, text in zip(t["conv_id"].to_pylist(),
                                t["turn_idx"].to_pylist(),
                                t["text"].to_pylist()):
        for tok in set((text or "").split(" ")):
            if tok:
                out.add((tok, conv, turn))
    return out


@pytest.fixture()
def workdir(tmp_path):
    return str(tmp_path)


def test_sync_equals_rebuild(workdir):
    d, job_a, job_b, table_dir = _half_runs(workdir)
    idx = TranscriptTextIndex(job_a, n_shards=5)
    idx.full_build()
    job_b.run()
    synced = TranscriptTextIndex(job_b, n_shards=5)
    synced.sync()
    rebuilt = TranscriptTextIndex(job_b, name="text_index_rebuild",
                                  n_shards=5)
    rebuilt.full_build()
    a, b = _shards(synced), _shards(rebuilt)
    assert set(a) == set(b)
    for k in a:
        assert a[k].equals(b[k]), f"shard {k} differs after sync"
    # and both equal the naive posting set of the final live state
    got = {(tok, c, t) for k in a
           for tok, c, t in zip(a[k]["token"].to_pylist(),
                                a[k]["conv_id"].to_pylist(),
                                a[k]["turn_idx"].to_pylist())}
    assert got == _naive_postings(job_b)


def test_second_sync_is_noop(workdir):
    d, job_a, job_b, table_dir = _half_runs(workdir)
    TranscriptTextIndex(job_a, n_shards=5).full_build()
    job_b.run()
    idx = TranscriptTextIndex(job_b, n_shards=5)
    st1 = idx.sync()
    st2 = idx.sync()
    assert st1 == st2


def test_sync_after_vacuum_falls_back_to_rebuild(workdir):
    d, job_a, job_b, table_dir = _half_runs(workdir)
    idx_a = TranscriptTextIndex(job_a, n_shards=5)
    idx_a.full_build()
    applied = idx_a._state()["applied_version"]
    job_b.run()
    job_b.vacuum(keep_last=1)
    from cwds_jobs_ray.state.manifest import Manifest
    assert applied not in Manifest.retained_versions(table_dir)
    idx = TranscriptTextIndex(job_b, n_shards=5)
    st = idx.sync()  # must not raise; rebuilds
    assert st["applied_version"] == \
        job_b._load_manifest_or_raise().table_version
    got = {(tok, c, t) for k, tb in _shards(idx).items()
           for tok, c, t in zip(tb["token"].to_pylist(),
                                tb["conv_id"].to_pylist(),
                                tb["turn_idx"].to_pylist())}
    assert got == _naive_postings(job_b)


def test_search_matches_naive_scan(workdir):
    d, job_a, job_b, table_dir = _half_runs(workdir)
    TranscriptTextIndex(job_a, n_shards=5).full_build()
    job_b.run()
    idx = TranscriptTextIndex(job_b, n_shards=5)
    idx.sync()
    t = job_b.read_table_arrow()
    rows = list(zip(t["conv_id"].to_pylist(), t["turn_idx"].to_pylist(),
                    t["text"].to_pylist()))
    for tokens, mode in ([["lsn"], "and"], [["lsn", "merge"], "and"],
                         [["lsn", "merge"], "or"], [["zzz_absent"], "and"],
                         [["plan", "zzz_absent"], "or"]):
        got = idx.search(tokens, mode)
        got_set = set(zip(got["conv_id"].to_pylist(),
                          got["turn_idx"].to_pylist()))
        if mode == "and":
            exp = {(c, ti) for c, ti, tx in rows
                   if all(tok in (tx or "").split(" ") for tok in tokens)}
        else:
            exp = {(c, ti) for c, ti, tx in rows
                   if any(tok in (tx or "").split(" ") for tok in tokens)}
        assert got_set == exp, (tokens, mode)


def test_multi_step_sync_chain(workdir):
    """Sync after EVERY segment-sized drain (4 steps) must equal a rebuild
    at the end — deltas compose across commits."""
    d = synthesize(SPEC, workdir)
    wal = os.path.join(workdir, "wal")
    segs = sorted(os.listdir(wal))
    table_dir = os.path.join(workdir, "table")
    steps = [2, 4, 6, len(segs)]
    prev = None
    for i, upto in enumerate(steps):
        wd = os.path.join(workdir, f"wal_{i}")
        os.makedirs(wd)
        for s in segs[:upto]:
            os.link(os.path.join(wal, s), os.path.join(wd, s))
        job = CDCJob(table_dir, wd, num_partitions=P, events_per_batch=150)
        job.run(base_path=d["base_path"] if i == 0 else None)
        idx = TranscriptTextIndex(job, n_shards=5)
        idx.sync()  # first call = full_build
        prev = job
    rebuilt = TranscriptTextIndex(prev, name="text_index_rebuild",
                                  n_shards=5)
    rebuilt.full_build()
    a, b = _shards(TranscriptTextIndex(prev, n_shards=5)), _shards(rebuilt)
    assert set(a) == set(b)
    for k in a:
        assert a[k].equals(b[k]), f"shard {k} differs after chained syncs"


def test_ranked_search_matches_naive_tf_recount(workdir):
    """Top-k by summed stored tf (maintained through sync deltas) must
    equal a naive recount over the live table — including tf CHANGES via
    U rows (same token kept, different repeat count)."""
    d, job_a, job_b, table_dir = _half_runs(workdir)
    TranscriptTextIndex(job_a, n_shards=5).full_build()
    job_b.run()
    idx = TranscriptTextIndex(job_b, n_shards=5)
    idx.sync()
    t = job_b.read_table_arrow()
    tokens, k = ["lsn", "merge"], 10
    scores = {}
    for c, ti, tx in zip(t["conv_id"].to_pylist(),
                         t["turn_idx"].to_pylist(),
                         t["text"].to_pylist()):
        s = sum((tx or "").split(" ").count(tok) for tok in tokens)
        if s > 0:
            scores[(c, ti)] = s
    exp = sorted(scores.items(),
                 key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))[:k]
    got = idx.search_ranked(tokens, k)
    got_rows = list(zip(got["conv_id"].to_pylist(),
                        got["turn_idx"].to_pylist(),
                        got["score"].to_pylist()))
    assert got_rows == [(c, ti, s) for (c, ti), s in exp]


def test_sync_across_schema_evolution(workdir):
    """WAL with v1 segments (pre-evolution schema, tool column absent)
    crossing the build/sync cut: the index consumes text through the
    unified read path, so sync must still equal a rebuild."""
    spec = WalSpec(seed=78, n_convs=30, turns_per_conv=4, n_events=600,
                   n_segments=8, dup_redelivery_frac=0.05,
                   out_of_order_frac=0.15, schema_v1_segments=3,
                   hot_key_frac=0.3)
    d = synthesize(spec, workdir)
    wal = os.path.join(workdir, "wal")
    segs = sorted(os.listdir(wal))
    wal_a = os.path.join(workdir, "wal_a")
    os.makedirs(wal_a)
    for s in segs[:len(segs) // 2]:
        os.link(os.path.join(wal, s), os.path.join(wal_a, s))
    table_dir = os.path.join(workdir, "table")
    job_a = CDCJob(table_dir, wal_a, num_partitions=P, events_per_batch=150)
    job_a.run(base_path=d["base_path"])
    TranscriptTextIndex(job_a, n_shards=5).full_build()
    job_b = CDCJob(table_dir, wal, num_partitions=P, events_per_batch=150)
    job_b.run()
    synced = TranscriptTextIndex(job_b, n_shards=5)
    synced.sync()
    rebuilt = TranscriptTextIndex(job_b, name="text_index_rebuild",
                                  n_shards=5)
    rebuilt.full_build()
    a, b = _shards(synced), _shards(rebuilt)
    assert set(a) == set(b)
    for k in a:
        assert a[k].equals(b[k]), f"shard {k} differs across evolution"


def test_sync_crash_at_commit_recovers(workdir, monkeypatch):
    """Crash AFTER the new shard files are written but BEFORE index.json
    replaces: state must still point at the old version (search untouched),
    and a plain re-sync must complete and equal a rebuild — the same
    publish-after-data recovery the table manifest relies on."""
    d, job_a, job_b, table_dir = _half_runs(workdir)
    idx_a = TranscriptTextIndex(job_a, n_shards=5)
    idx_a.full_build()
    st_before = idx_a._state()
    job_b.run()
    idx = TranscriptTextIndex(job_b, n_shards=5)
    calls = {"n": 0}
    real_commit = TranscriptTextIndex._commit

    def exploding_commit(self, *a, **kw):
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("injected crash before publish")
        return real_commit(self, *a, **kw)

    monkeypatch.setattr(TranscriptTextIndex, "_commit", exploding_commit)
    with pytest.raises(RuntimeError, match="injected crash"):
        idx.sync()
    # state unchanged: readers still see the pre-sync index
    assert TranscriptTextIndex(job_b, n_shards=5)._state() == st_before
    # plain retry completes and equals a rebuild
    idx2 = TranscriptTextIndex(job_b, n_shards=5)
    idx2.sync()
    rebuilt = TranscriptTextIndex(job_b, name="text_index_rebuild",
                                  n_shards=5)
    rebuilt.full_build()
    a, b = _shards(idx2), _shards(rebuilt)
    assert set(a) == set(b)
    for k in a:
        assert a[k].equals(b[k]), f"shard {k} differs after crash-resume"


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(seed=st.integers(min_value=0, max_value=10_000),
       cut=st.integers(min_value=1, max_value=7),
       shards=st.sampled_from([1, 3, 5]))
def test_property_sync_equals_rebuild(tmp_path_factory, seed, cut, shards):
    """Random workload seed x random WAL cut point x shard count: sync
    from the cut version must equal a rebuild at the final version,
    shard-for-shard (tf included)."""
    workdir = str(tmp_path_factory.mktemp("tixprop"))
    spec = WalSpec(seed=seed, n_convs=12, turns_per_conv=3, n_events=200,
                   n_segments=8, dup_redelivery_frac=0.1,
                   out_of_order_frac=0.2, schema_v1_segments=0,
                   hot_key_frac=0.4)
    d = synthesize(spec, workdir)
    wal = os.path.join(workdir, "wal")
    segs = sorted(os.listdir(wal))
    wal_a = os.path.join(workdir, "wal_a")
    os.makedirs(wal_a)
    for s in segs[:cut]:
        os.link(os.path.join(wal, s), os.path.join(wal_a, s))
    table_dir = os.path.join(workdir, "table")
    job_a = CDCJob(table_dir, wal_a, num_partitions=3, events_per_batch=60)
    job_a.run(base_path=d["base_path"])
    TranscriptTextIndex(job_a, n_shards=shards).full_build()
    job_b = CDCJob(table_dir, wal, num_partitions=3, events_per_batch=60)
    job_b.run()
    synced = TranscriptTextIndex(job_b, n_shards=shards)
    synced.sync()
    rebuilt = TranscriptTextIndex(job_b, name="text_index_rebuild",
                                  n_shards=shards)
    rebuilt.full_build()
    a, b = _shards(synced), _shards(rebuilt)
    assert set(a) == set(b)
    for k in a:
        assert a[k].equals(b[k]), (seed, cut, shards, k)
