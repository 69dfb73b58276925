"""Incrementally-maintained materialized view over a CDC lake table,
driven by the change data feed (``CDCJob.read_changes``).

The view here is per-conversation statistics: ``(conv_id, n_turns,
n_assistant, n_chars)`` — live turn count, live assistant-role turn
count, and total live text length (a true SUM aggregate). All are
maintainable purely from the feed:

- I: ``n_turns += 1``; ``n_assistant += (role == 'assistant')``;
  ``n_chars += len(text)``
- D: the mirror decrements (the feed's D payload is the pre-image)
- U: ``n_turns += 0``; ``n_assistant += (role == 'assistant') -
  (prev_role == 'assistant')``; ``n_chars += len(text) -
  len(prev_text)`` — this is exactly why the feed carries Debezium-style
  before-images on U rows; without ``prev_role``/``prev_text`` neither
  the attribute-dependent count nor any payload SUM could be
  maintained.

Non-incrementalizable aggregates (max/min over mutable attributes — a
delete can lower a max) are out of scope by design; use ``full_build``.

Scale shape: the view is hash-partitioned by conv_id into its OWN pinned
partition count (independent of table reshards). ``refresh`` groups the
feed by view partition with the same direct wave exchange every keyed
final uses and rewrites ONLY partitions that received changes — cost
tracks the delta, not the view. ``full_build`` partials per block then
reduces per view partition. Commit mirrors the table protocol: immutable
``p{i}.v{N}.parquet`` files + an atomically replaced ``view.json`` naming
(applied_version, files); refresh is idempotent (same applied version is
a no-op) and a crash before the json swap leaves only uncommitted files,
removed on the next commit's cleanup.

Reference anchor: the downstream consumer keeping a derived store in sync
by polling changed ids
(/root/reference/jobs-common/src/main/java/gov/ca/cwds/jobs/common/entity/ChangedEntityService.java)
— here the derived store is updated exactly and transactionally against
table versions.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data

from ..stages.merge import fsync_dir, write_atomic
from ..stages.partition import partition_ids
from ..stages.waves import wave_group_reduce
from .cdc import CDCJob

VIEW_SCHEMA = pa.schema([("conv_id", pa.string()),
                         ("n_turns", pa.int64()),
                         ("n_assistant", pa.int64()),
                         ("n_chars", pa.int64())])

_PARTIAL_SCHEMA = pa.schema([("conv_id", pa.string()),
                             ("one", pa.int64()), ("asst", pa.int64()),
                             ("chars", pa.int64()),
                             ("_bucket", pa.int64())])

_AGG = ["one", "asst", "chars"]


def _chars(col) -> "np.ndarray":
    import pyarrow.compute as pc
    return pc.fill_null(pc.utf8_length(col), 0) \
        .to_numpy(zero_copy_only=False).astype(np.int64)


def _block_stats(t: pa.Table) -> pd.DataFrame:
    df = pd.DataFrame({
        "conv_id": t["conv_id"].to_numpy(zero_copy_only=False),
        "one": np.ones(t.num_rows, np.int64),
        "asst": (t["role"].to_numpy(zero_copy_only=False)
                 == "assistant").astype(np.int64),
        "chars": _chars(t["text"])})
    return df.groupby("conv_id", sort=False).sum().reset_index()


def _delta_counts(t: pa.Table) -> pd.DataFrame:
    """Feed rows -> per-conv (d_turns, d_assistant, d_chars)."""
    ct = t["change_type"].to_numpy(zero_copy_only=False)
    sign = np.where(ct == "I", 1, np.where(ct == "D", -1, 0))
    role = t["role"].to_numpy(zero_copy_only=False)
    prev = t["prev_role"].to_numpy(zero_copy_only=False)
    is_u = ct == "U"
    d_asst = np.where(is_u, (role == "assistant").astype(np.int64)
                      - (prev == "assistant").astype(np.int64),
                      sign * (role == "assistant").astype(np.int64))
    ch, pch = _chars(t["text"]), _chars(t["prev_text"])
    d_chars = np.where(is_u, ch - pch, sign * ch)
    df = pd.DataFrame({"conv_id": t["conv_id"].to_numpy(zero_copy_only=False),
                       "one": sign.astype(np.int64), "asst": d_asst,
                       "chars": d_chars})
    return df.groupby("conv_id", sort=False).sum().reset_index()


def _stats_to_table(df: pd.DataFrame) -> pa.Table:
    df = df.sort_values("conv_id", kind="stable")
    return pa.table({"conv_id": pa.array(df["conv_id"].to_numpy(),
                                         pa.string()),
                     "n_turns": pa.array(df["one"].to_numpy(), pa.int64()),
                     "n_assistant": pa.array(df["asst"].to_numpy(),
                                             pa.int64()),
                     "n_chars": pa.array(df["chars"].to_numpy(),
                                         pa.int64())})


def _write_view_partition(view_dir: str, rel: str, t: pa.Table) -> str:
    write_atomic(t, os.path.join(view_dir, rel))
    return rel


def _apply_view_delta(view_dir: str, old_rel: str | None, rel: str,
                      d: pa.Table) -> str | None:
    """One view partition's incremental update: old stats + delta counts,
    drop fully-deleted conversations, write the new immutable file.
    Returns None when the partition received no changes (its file stays)."""
    if d.num_rows == 0:
        return None
    old = (pq.read_table(os.path.join(view_dir, old_rel))
           if old_rel else VIEW_SCHEMA.empty_table())
    ren = {"n_turns": "one", "n_assistant": "asst", "n_chars": "chars"}
    merged = pd.concat(
        [old.to_pandas().rename(columns=ren),
         d.to_pandas().rename(columns=ren)],
        ignore_index=True).groupby("conv_id", sort=False)[
            _AGG].sum().reset_index()
    merged = merged[merged["one"] > 0]  # fully-deleted convs drop out
    write_atomic(_stats_to_table(merged), os.path.join(view_dir, rel))
    return rel


class ConvStatsView:
    def __init__(self, job: CDCJob, name: str = "conv_stats",
                 num_partitions: int = 8):
        self.job = job
        self.name = name
        self.dir = os.path.join(job.table_dir, "views", name)
        self.num_partitions = num_partitions

    # -- state -------------------------------------------------------------
    def _state(self) -> dict | None:
        path = os.path.join(self.dir, "view.json")
        if not os.path.exists(path):
            return None
        with open(path) as f:
            return json.load(f)

    def _commit(self, applied_version: int, files: dict[int, str],
                num_partitions: int):
        os.makedirs(self.dir, exist_ok=True)
        state = {"applied_version": applied_version,
                 "num_partitions": num_partitions,
                 "files": {str(k): v for k, v in files.items()}}
        tmp = os.path.join(self.dir, "view.json.tmp")
        with open(tmp, "w") as f:
            json.dump(state, f)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, os.path.join(self.dir, "view.json"))
        fsync_dir(self.dir)
        live = set(state["files"].values()) | {"view.json"}
        for fn in os.listdir(self.dir):  # uncommitted / replaced files
            if fn.endswith(".parquet") and fn not in live:
                os.remove(os.path.join(self.dir, fn))

    def read(self) -> pa.Table:
        st = self._state()
        if st is None:
            raise RuntimeError(f"view {self.name} has never been built")
        parts = [pq.read_table(os.path.join(self.dir, f))
                 for f in st["files"].values()]
        t = (pa.concat_tables(parts) if parts
             else VIEW_SCHEMA.empty_table())
        return t.take(pa.compute.sort_indices(t["conv_id"]))

    # -- full rebuild --------------------------------------------------------
    def full_build(self) -> dict:
        """Distributed recompute at the table's current version: per-block
        partials -> one reduce task per view partition -> immutable files +
        atomic json swap."""
        manifest = self.job._load_manifest_or_raise()
        version = manifest.table_version
        nb = self.num_partitions
        ds = self.job.read_table(columns=["conv_id", "role", "text"])

        def partial(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return _PARTIAL_SCHEMA.empty_table()
            g = _block_stats(t)
            g["_bucket"] = partition_ids(g["conv_id"].to_numpy(), nb)
            return pa.Table.from_pandas(g, preserve_index=False)

        def reduce(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return VIEW_SCHEMA.empty_table()
            df = t.to_pandas().groupby("conv_id", sort=False)[
                _AGG].sum().reset_index()
            return _stats_to_table(df)

        out = wave_group_reduce(
            ds.map_batches(partial, batch_format="pyarrow"),
            "_bucket", nb, reduce)
        os.makedirs(self.dir, exist_ok=True)
        wtask = ray.remote(_write_view_partition)
        refs = [wtask.remote(self.dir, f"p{i}.v{version}.parquet", ref)
                for i, ref in enumerate(out.materialize().to_arrow_refs())]
        files = dict(enumerate(ray.get(refs)))
        self._commit(version, files, nb)
        return self._state()

    # -- incremental refresh -------------------------------------------------
    def refresh(self) -> dict:
        """Apply the change feed from the view's applied version to the
        table's current version. Rewrites only view partitions that
        received changes; a no-op when already current."""
        st = self._state()
        if st is None:
            return self.full_build()
        cur = self.job._load_manifest_or_raise().table_version
        applied = st["applied_version"]
        if cur == applied:
            return st
        nb = int(st["num_partitions"])
        feed = self.job.read_changes(applied, cur)

        def partial(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return _PARTIAL_SCHEMA.empty_table()
            g = _delta_counts(t)
            g["_bucket"] = partition_ids(g["conv_id"].to_numpy(), nb)
            return pa.Table.from_pandas(g, preserve_index=False)

        def reduce(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return VIEW_SCHEMA.empty_table()
            df = t.to_pandas().groupby("conv_id", sort=False)[
                _AGG].sum().reset_index()
            return _stats_to_table(df)

        deltas = wave_group_reduce(
            feed.map_batches(partial, batch_format="pyarrow"),
            "_bucket", nb, reduce)
        files = {int(k): v for k, v in st["files"].items()}
        os.makedirs(self.dir, exist_ok=True)
        atask = ray.remote(_apply_view_delta)
        pend = {i: atask.remote(self.dir, files.get(i),
                                f"p{i}.v{cur}.parquet", ref)
                for i, ref in
                enumerate(deltas.materialize().to_arrow_refs())}
        for i, rel in zip(pend, ray.get(list(pend.values()))):
            if rel is not None:  # None: untouched partition keeps its file
                files[i] = rel
        self._commit(cur, files, nb)
        return self._state()
