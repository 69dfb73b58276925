"""Inverted text index: build + indexed keyword search — AND/OR semantics
vs a naive scan, shard pruning (only the query tokens' shard files are
read), rebuild determinism, absent tokens, empty queries."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data

from cwds_jobs_ray.pipelines.text_index import (
    _token_shard,
    build_text_index,
    search_text_index,
)

DOCS = pd.DataFrame({
    "doc_id": np.arange(6, dtype=np.int64),
    "text": ["alpha beta gamma",
             "alpha alpha beta",       # repeated token -> one posting
             "gamma delta",
             "beta",
             "epsilon",
             "alpha beta epsilon"]})


def _naive(tokens, mode):
    sets = [set(t.split(" ")) for t in DOCS["text"]]
    if mode == "and":
        keep = [i for i, s in enumerate(sets) if all(t in s for t in tokens)]
    else:
        keep = [i for i, s in enumerate(sets) if any(t in s for t in tokens)]
    return sorted(keep)


@pytest.fixture(scope="module")
def index_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("tix"))
    meta = build_text_index(ray.data.from_pandas(DOCS), d, n_shards=4)
    assert meta["n_shards"] == 4
    # postings: one row per DISTINCT (token, doc) pair
    total = sum(pq.read_table(f"{d}/{f}").num_rows
                for f in os.listdir(d) if f.endswith(".parquet"))
    assert meta["n_postings"] == total == 12
    return d


@pytest.mark.parametrize("tokens,mode", [
    (["alpha"], "and"),
    (["alpha", "beta"], "and"),
    (["gamma", "delta"], "and"),
    (["nope"], "and"),
    (["alpha", "nope"], "and"),
    (["gamma", "epsilon"], "or"),
    (["nope", "zilch"], "or"),
])
def test_search_matches_naive_scan(index_dir, tokens, mode):
    got = search_text_index(index_dir, tokens, mode)["doc_id"].to_pylist()
    assert got == _naive(tokens, mode)


def test_empty_query(index_dir):
    assert search_text_index(index_dir, [])["doc_id"].to_pylist() == []


def test_search_reads_only_query_shards(index_dir, tmp_path):
    """Delete every shard file EXCEPT the ones 'alpha'/'beta' hash to; the
    search must still answer — proof it never opens the other shards."""
    import shutil
    d = str(tmp_path / "pruned")
    shutil.copytree(index_dir, d)
    keep = {int(s) for s in
            _token_shard(pa.array(["alpha", "beta"]), 4)}
    for f in os.listdir(d):
        if f.endswith(".parquet") and int(f[6:11]) not in keep:
            os.remove(f"{d}/{f}")
    got = search_text_index(d, ["alpha", "beta"], "and")
    assert got["doc_id"].to_pylist() == _naive(["alpha", "beta"], "and")


def test_rebuild_is_deterministic(index_dir, tmp_path):
    d2 = str(tmp_path / "again")
    build_text_index(ray.data.from_pandas(DOCS), d2, n_shards=4)
    for f in sorted(os.listdir(index_dir)):
        if not f.endswith(".parquet"):
            continue
        a = pq.read_table(f"{index_dir}/{f}")
        b = pq.read_table(f"{d2}/{f}")
        assert a.equals(b), f


def test_postings_sorted_token_major(index_dir):
    for f in os.listdir(index_dir):
        if not f.endswith(".parquet"):
            continue
        df = pq.read_table(f"{index_dir}/{f}").to_pandas()
        assert df.equals(df.sort_values(["token", "doc_id"], kind="stable")
                         .reset_index(drop=True)), f
