"""Persistent inverted text index + indexed keyword search.

The reference's entire purpose is maintaining a SEARCH index over the
entity stream (Elasticsearch bulk loads,
/root/reference/jobs-common/src/main/java/gov/ca/cwds/jobs/common/elastic/ElasticSearchBulkCollector.java:24-107);
this is the lake-native equivalent: a token-sharded postings table built
with ONE keyed exchange, then searched by reading only the shards the
query tokens hash to — lookup cost tracks the QUERY (tokens × one shard
file each), never the corpus shard count, the same key-routed discipline
as ``CDCJob.lookup``.

Scale shape:
- build: per-block distinct (token, doc_id) pre-reduce (a token repeated
  in a document crosses the wire once), token-keyed exchange into
  ``n_shards`` buckets, each reduce task writes one sorted parquet shard
  (token-major order -> tight row groups per token; the parquet
  dictionary encodes the token column to ~one entry per distinct token).
- search: shard = hash(token) % n_shards is computable driver-side, so an
  AND/OR query reads at most len(tokens) shard files with a token IN-list
  row filter pushed into the scan; postings come back as int64 doc_id
  arrays and set-combine vectorized (np.intersect1d / union1d).
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray
import ray.data

N_INDEX_SHARDS = 16


def _token_shard(tokens: pa.Array, n_shards: int) -> np.ndarray:
    from ..stages.partition import hash_strings
    return (hash_strings(tokens) % np.uint64(n_shards)).astype(np.int64)


def build_text_index(ds: ray.data.Dataset, out_dir: str,
                     n_shards: int = N_INDEX_SHARDS) -> dict:
    """Build the sharded inverted index under ``out_dir``; returns the
    manifest dict (also written as meta.json). Idempotent overwrite: a
    partial previous build is ignored because meta.json is written last
    (the same publish-after-data ordering the CDC manifest uses)."""
    from ..stages.waves import wave_group_reduce

    os.makedirs(out_dir, exist_ok=True)

    def postings_partial(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        words = pc.split_pattern(t["text"], " ")
        par = pc.list_parent_indices(words).to_numpy(zero_copy_only=False)
        flat = pc.list_flatten(words)
        pair = pd.DataFrame({"token": flat.to_pandas(),
                             "doc_id": ids[par]}).drop_duplicates()
        tok = pa.array(pair["token"].tolist(), pa.string())
        out = pa.table({"token": tok,
                        "doc_id": pa.array(pair["doc_id"].to_numpy(),
                                           pa.int64())})
        return out.append_column(
            "_bucket", pa.array(_token_shard(tok, n_shards)))

    def write_shard(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"shard": pa.array([], pa.int64()),
                             "n_tokens": pa.array([], pa.int64()),
                             "n_postings": pa.array([], pa.int64())})
        df = t.to_pandas().drop_duplicates() \
            .sort_values(["token", "doc_id"], kind="stable")
        shard = int(_token_shard(pa.array([df["token"].iloc[0]]),
                                 n_shards)[0])
        out = pa.table({"token": pa.array(df["token"].tolist(), pa.string()),
                        "doc_id": pa.array(df["doc_id"].to_numpy(np.int64))})
        pq.write_table(out, f"{out_dir}/shard_{shard:05d}.parquet")
        return pa.table({
            "shard": pa.array([shard], pa.int64()),
            "n_tokens": pa.array([df["token"].nunique()], pa.int64()),
            "n_postings": pa.array([len(df)], pa.int64())})

    stats = wave_group_reduce(
        ds.select_columns(["doc_id", "text"])
          .map_batches(postings_partial, batch_format="pyarrow",
                       batch_size=4096),
        "_bucket", n_shards, write_shard).to_pandas()
    meta = {"n_shards": n_shards,
            "shards": sorted(stats["shard"].tolist()),
            "n_postings": int(stats["n_postings"].sum())}
    tmp = f"{out_dir}/meta.json.tmp"
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, f"{out_dir}/meta.json")
    return meta


def search_text_index(index_dir: str, tokens: list[str],
                      mode: str = "and") -> pa.Table:
    """Indexed keyword search: returns (doc_id) of documents containing
    ALL (``mode="and"``) or ANY (``mode="or"``) of ``tokens``. Reads only
    the shard files the tokens hash to, with a token IN-list filter
    pushed into each scan."""
    if mode not in ("and", "or"):
        raise ValueError(f"mode must be 'and' or 'or', got {mode!r}")
    with open(f"{index_dir}/meta.json") as f:
        meta = json.load(f)
    toks = sorted(set(tokens))
    if not toks:
        return pa.table({"doc_id": pa.array([], pa.int64())})
    shards = _token_shard(pa.array(toks, pa.string()), meta["n_shards"])
    built = set(meta["shards"])
    per_token: list[np.ndarray] = []
    # one pruned read per DISTINCT shard, then slice per token
    for shard in sorted(set(shards.tolist())):
        mine = [t for t, s in zip(toks, shards) if s == shard]
        if shard not in built:  # shard empty at build time: no postings
            per_token.extend(np.empty(0, np.int64) for _ in mine)
            continue
        t = pq.read_table(f"{index_dir}/shard_{shard:05d}.parquet",
                          filters=[("token", "in", mine)])
        tok_np = np.asarray(t["token"].to_pylist(), dtype=object)
        ids_np = t["doc_id"].to_numpy(zero_copy_only=False)
        per_token.extend(ids_np[tok_np == tk] for tk in mine)
    acc = per_token[0]
    for ids in per_token[1:]:
        acc = (np.intersect1d(acc, ids) if mode == "and"
               else np.union1d(acc, ids))
    return pa.table({"doc_id": pa.array(np.sort(acc), pa.int64())})
