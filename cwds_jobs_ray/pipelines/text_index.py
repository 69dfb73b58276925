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


# ------------------------------------------------------- CDC-synced index

class TranscriptTextIndex:
    """Inverted text index over the committed transcript table, kept in
    sync INCREMENTALLY from the change data feed — the reference's core
    loop (changed entities -> search-index update,
    /root/reference/jobs-common/src/main/java/gov/ca/cwds/jobs/common/elastic/ElasticSearchBulkCollector.java:24-107
    plus its delete notifications), lake-native.

    Postings are distinct ``(token, conv_id, turn_idx)`` rows, token-
    sharded like ``build_text_index``. ``sync()`` reads
    ``read_changes(applied, current)`` and turns each feed row into signed
    posting deltas — I adds the post-image's tokens, D removes the
    pre-image's, U removes ``prev_text``'s and adds ``text``'s (tokens in
    both cancel) — then rewrites ONLY the shards that received deltas.
    Cost tracks the delta twice over: feed cost is delta-proportional by
    construction, and the shard rewrite touches only changed tokens'
    shards. Commit mirrors the views' publish protocol (versioned shard
    files, state json replaced last, stale files GC'd); a vacuumed
    ``applied_version`` falls back to ``full_build`` the same way
    ``MaterializedView.refresh`` does."""

    def __init__(self, job, name: str = "text_index",
                 n_shards: int = N_INDEX_SHARDS):
        self.job = job
        self.dir = os.path.join(job.table_dir, name)
        self.n_shards = n_shards

    # ---------------------------------------------------------- state
    def _state(self) -> dict | None:
        path = os.path.join(self.dir, "index.json")
        if not os.path.isfile(path):
            return None
        with open(path) as f:
            return json.load(f)

    def _commit(self, applied_version: int, files: dict[int, str]):
        from ..stages.merge import fsync_dir
        os.makedirs(self.dir, exist_ok=True)
        state = {"applied_version": applied_version,
                 "n_shards": self.n_shards,
                 "files": {str(k): v for k, v in files.items()}}
        tmp = os.path.join(self.dir, "index.json.tmp")
        with open(tmp, "w") as f:
            json.dump(state, f)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, os.path.join(self.dir, "index.json"))
        fsync_dir(self.dir)
        live = set(state["files"].values()) | {"index.json"}
        for fn in os.listdir(self.dir):
            if fn.endswith(".parquet") and fn not in live:
                os.remove(os.path.join(self.dir, fn))

    @staticmethod
    def _postings_from(t: pa.Table, text_col: str,
                       sign: int, mask: np.ndarray) -> pd.DataFrame:
        """(token, conv_id, turn_idx, w) rows for the masked subset's
        ``text_col`` — ``w`` is the SIGNED term frequency (sign * tf), so
        the same groupby-sum merge maintains presence (net w > 0) AND the
        stored tf (nulls tokenize to nothing)."""
        if not mask.any():
            return pd.DataFrame({"token": pd.Series([], dtype=object),
                                 "conv_id": pd.Series([], dtype=object),
                                 "turn_idx": pd.Series([], dtype=np.int64),
                                 "w": pd.Series([], dtype=np.int64)})
        sub = t.filter(pa.array(mask))
        txt = pc.fill_null(sub[text_col], "")
        words = pc.split_pattern(txt, " ")
        par = pc.list_parent_indices(words).to_numpy(zero_copy_only=False)
        flat = pc.list_flatten(words)
        conv = np.asarray(sub["conv_id"].to_pylist(), dtype=object)[par]
        turn = sub["turn_idx"].to_numpy(zero_copy_only=False)[par]
        df = pd.DataFrame({"token": flat.to_pandas(), "conv_id": conv,
                           "turn_idx": turn.astype(np.int64)})
        df = df[df["token"] != ""] \
            .groupby(["token", "conv_id", "turn_idx"], sort=False) \
            .size().rename("w").reset_index()
        df["w"] = (np.int64(sign) * df["w"].to_numpy()).astype(np.int64)
        return df

    def _shard_tables(self, ds) -> "ray.data.Dataset":
        """Distinct postings of a table Dataset, bucketed by token shard."""
        n_shards = self.n_shards

        def partial(t: pa.Table) -> pa.Table:
            df = self._postings_from(t, "text", 1,
                                     np.ones(t.num_rows, bool))
            tok = pa.array(df["token"].tolist(), pa.string())
            out = pa.table({
                "token": tok,
                "conv_id": pa.array(df["conv_id"].tolist(), pa.string()),
                "turn_idx": pa.array(df["turn_idx"].to_numpy(np.int64)),
                "w": pa.array(df["w"].to_numpy(np.int64))})
            return out.append_column(
                "_bucket", pa.array(_token_shard(tok, n_shards)))

        return ds.map_batches(partial, batch_format="pyarrow",
                              batch_size=4096)

    def _write_shards(self, bucketed, version: int,
                      old_files: dict[int, str] | None) -> dict[int, str]:
        """Per-shard reduce: merge signed rows with the existing shard (if
        any), keep keys with positive net count, write the new versioned
        shard file. Returns the updated files map."""
        from ..stages.waves import wave_group_reduce
        out_dir, n_shards = self.dir, self.n_shards
        olds = {int(k): v for k, v in (old_files or {}).items()}

        def reduce_shard(t: pa.Table) -> pa.Table:
            empty = pa.table({"shard": pa.array([], pa.int64()),
                              "rel": pa.array([], pa.string())})
            if t.num_rows == 0:
                return empty
            df = t.to_pandas()
            shard = int(_token_shard(pa.array([df["token"].iloc[0]]),
                                     n_shards)[0])
            if shard in olds:
                old = pq.read_table(f"{out_dir}/{olds[shard]}").to_pandas()
                old = old.rename(columns={"tf": "w"})
                df = pd.concat([old, df], ignore_index=True)
            net = df.groupby(["token", "conv_id", "turn_idx"],
                             sort=False)["w"].sum().reset_index()
            net = net[net["w"] > 0] \
                .sort_values(["token", "conv_id", "turn_idx"],
                             kind="stable")
            rel = f"shard_{shard:05d}.v{version}.parquet"
            pq.write_table(
                pa.table({
                    "token": pa.array(net["token"].tolist(), pa.string()),
                    "conv_id": pa.array(net["conv_id"].tolist(),
                                        pa.string()),
                    "turn_idx": pa.array(
                        net["turn_idx"].to_numpy(np.int64)),
                    "tf": pa.array(net["w"].to_numpy(np.int64))}),
                f"{out_dir}/{rel}")
            return pa.table({"shard": pa.array([shard], pa.int64()),
                             "rel": pa.array([rel], pa.string())})

        os.makedirs(out_dir, exist_ok=True)
        stats = wave_group_reduce(bucketed, "_bucket", n_shards,
                                  reduce_shard).to_pandas()
        files = dict(olds)
        files.update({int(s): r for s, r in zip(stats["shard"],
                                                stats["rel"])})
        return files

    # ------------------------------------------------------- lifecycle
    def full_build(self) -> dict:
        cur = self.job._load_manifest_or_raise().table_version
        ds = self.job.read_table(columns=["conv_id", "turn_idx", "text"])
        files = self._write_shards(self._shard_tables(ds), cur, None)
        self._commit(cur, files)
        return self._state()

    def sync(self) -> dict:
        """Apply the change feed from the index's applied version to the
        table's current version; a no-op when already current."""
        st = self._state()
        if st is None:
            return self.full_build()
        cur = self.job._load_manifest_or_raise().table_version
        applied = st["applied_version"]
        if cur == applied:
            return st
        self.n_shards = int(st["n_shards"])  # pinned at build time
        from ..state.manifest import Manifest
        if applied not in Manifest.retained_versions(self.job.table_dir):
            return self.full_build()  # feed base vacuumed: rebuild
        feed = self.job.read_changes(applied, cur)
        n_shards = self.n_shards
        postings_from = self._postings_from

        def delta_partial(t: pa.Table) -> pa.Table:
            ct = np.asarray(t["change_type"].to_pylist(), dtype=object)
            add = postings_from(t, "text", 1, (ct == "I") | (ct == "U"))
            rm_d = postings_from(t, "text", -1, ct == "D")
            rm_u = postings_from(t, "prev_text", -1, ct == "U")
            df = pd.concat([add, rm_d, rm_u], ignore_index=True)
            # equal tf in both images of a U cancels here, not in the shard
            df = df.groupby(["token", "conv_id", "turn_idx"],
                            sort=False)["w"].sum().reset_index()
            df = df[df["w"] != 0]
            tok = pa.array(df["token"].tolist(), pa.string())
            out = pa.table({
                "token": tok,
                "conv_id": pa.array(df["conv_id"].tolist(), pa.string()),
                "turn_idx": pa.array(df["turn_idx"].to_numpy(np.int64)),
                "w": pa.array(df["w"].to_numpy(np.int64))})
            return out.append_column(
                "_bucket", pa.array(_token_shard(tok, n_shards)))

        files = self._write_shards(
            feed.map_batches(delta_partial, batch_format="pyarrow",
                             batch_size=8192),
            cur, st["files"])
        self._commit(cur, files)
        return self._state()

    # ----------------------------------------------------------- query
    def search(self, tokens: list[str], mode: str = "and") -> pa.Table:
        """(conv_id, turn_idx) of live turns containing ALL/ANY tokens;
        reads only the query tokens' shard files."""
        if mode not in ("and", "or"):
            raise ValueError(f"mode must be 'and' or 'or', got {mode!r}")
        st = self._state()
        if st is None:
            raise RuntimeError("index has never been built")
        empty = pd.DataFrame({"conv_id": pd.Series([], dtype=object),
                              "turn_idx": pd.Series([], dtype=np.int64)})
        toks = sorted(set(tokens))
        per_token: list[pd.DataFrame] = []
        if toks:
            shards = _token_shard(pa.array(toks, pa.string()),
                                  int(st["n_shards"]))
            files = {int(k): v for k, v in st["files"].items()}
            for shard in sorted(set(shards.tolist())):
                mine = [t for t, s in zip(toks, shards) if s == shard]
                if shard not in files:
                    per_token.extend(empty for _ in mine)
                    continue
                t = pq.read_table(f"{self.dir}/{files[shard]}",
                                  filters=[("token", "in", mine)])
                df = t.to_pandas()
                per_token.extend(
                    df[df["token"] == tk][["conv_id", "turn_idx"]]
                    for tk in mine)
        if not per_token:
            acc = empty
        else:
            acc = per_token[0]
            for d in per_token[1:]:
                acc = (acc.merge(d, on=["conv_id", "turn_idx"])
                       if mode == "and"
                       else pd.concat([acc, d]).drop_duplicates())
        acc = acc.sort_values(["conv_id", "turn_idx"], kind="stable")
        return pa.table({
            "conv_id": pa.array(acc["conv_id"].tolist(), pa.string()),
            "turn_idx": pa.array(acc["turn_idx"].to_numpy(np.int64))})

    def search_ranked(self, tokens: list[str], k: int) -> pa.Table:
        """Top-k turns by summed stored term frequency over the query
        tokens (OR semantics) — ranked retrieval straight from the synced
        postings, no table scan; ties break on (conv_id, turn_idx). All-
        integer scoring, so the result hash-matches a SQL recount of the
        live state."""
        st = self._state()
        if st is None:
            raise RuntimeError("index has never been built")
        toks = sorted(set(tokens))
        parts: list[pd.DataFrame] = []
        if toks:
            shards = _token_shard(pa.array(toks, pa.string()),
                                  int(st["n_shards"]))
            files = {int(kk): v for kk, v in st["files"].items()}
            for shard in sorted(set(shards.tolist())):
                mine = [t for t, s in zip(toks, shards) if s == shard]
                if shard not in files:
                    continue
                t = pq.read_table(f"{self.dir}/{files[shard]}",
                                  filters=[("token", "in", mine)])
                parts.append(t.to_pandas()[["conv_id", "turn_idx", "tf"]])
        if parts:
            acc = pd.concat(parts, ignore_index=True) \
                .groupby(["conv_id", "turn_idx"], sort=False)["tf"].sum() \
                .rename("score").reset_index() \
                .sort_values(["score", "conv_id", "turn_idx"],
                             ascending=[False, True, True], kind="stable") \
                .head(k)
        else:
            acc = pd.DataFrame({"conv_id": pd.Series([], dtype=object),
                                "turn_idx": pd.Series([], dtype=np.int64),
                                "score": pd.Series([], dtype=np.int64)})
        return pa.table({
            "conv_id": pa.array(acc["conv_id"].tolist(), pa.string()),
            "turn_idx": pa.array(acc["turn_idx"].to_numpy(np.int64)),
            "score": pa.array(acc["score"].to_numpy(np.int64))})
