"""Incrementally-maintained materialized views over a CDC lake table,
driven by the change data feed (``CDCJob.read_changes``).

``MaterializedView`` is the general operator: a declarative spec — a
string GROUP-BY key plus named SUM-like aggregates (``Count``,
``CountIf``, ``SumLen``, ``Sum``) — compiled onto one incremental
kernel. Every feed row becomes at most two *contributions* in the
insert/retract style of Z-sets (Budiu et al., "DBSP", VLDB 2023 —
public literature):

- ``I``: +measures(post-image) to the post group
- ``D``: -measures(payload)    to the payload group (the feed's D
  payload IS the last-known pre-image)
- ``U``: +measures(post-image) to the post group AND
  -measures(before-image) to the before group — the Debezium-style
  ``prev_*`` columns the feed carries on U rows are exactly what makes
  this single subtraction possible; they also let the view GROUP BY a
  *mutable* attribute (a role flip moves the row between groups as one
  +1/-1 pair).

Group-summing contributions is then an ordinary keyed reduce; an
internal ``_live`` weight (sum of +1/-1) drops groups whose live row
count reaches zero. Non-incrementalizable aggregates (max/min over
mutable attributes — a delete can lower a max) are out of scope by
design; use ``full_build``.

``ConvStatsView`` — per-conversation ``(n_turns, n_assistant,
n_chars)`` — is now just one spec:
``MaterializedView(job, key="conv_id", aggs={"n_turns": Count(),
"n_assistant": CountIf("role", "assistant"), "n_chars":
SumLen("text")})``.

Scale shape: the view is hash-partitioned by its group key into its OWN
pinned partition count (independent of table reshards). ``refresh``
groups the feed's contributions by view partition with the same direct
wave exchange every keyed final uses and rewrites ONLY partitions that
received changes — cost tracks the delta, not the view. ``full_build``
partials per block then reduces per view partition. Commit mirrors the
table protocol: immutable ``p{i}.v{N}.parquet`` files + an atomically
replaced ``view.json`` naming (applied_version, files); refresh is
idempotent (same applied version is a no-op), a crash before the json
swap leaves only uncommitted files (removed on the next commit's
cleanup), and a refresh whose applied snapshot has been vacuumed falls
back to a full rebuild.

Reference anchor: the downstream consumer keeping a derived store in
sync by polling changed ids
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

# ----------------------------------------------------------- aggregate spec


class Agg:
    """A SUM-like aggregate: a per-row int64/float64 measure whose group
    sum is the aggregate value. Linearity in the row multiset is what
    makes it exactly maintainable from insert/retract contributions."""

    cols: tuple[str, ...] = ()
    dtype = np.int64

    def measure(self, get) -> np.ndarray:
        """Per-row measure. ``get(col)`` returns the pyarrow column to
        read — the caller points it at post-image, pre-image payload, or
        ``prev_*`` columns as the change type requires."""
        raise NotImplementedError

    def fingerprint(self) -> str:
        """Stable identity of the aggregate DEFINITION (class + params +
        dtype) — persisted in view.json so a same-named but semantically
        different aggregate cannot silently refresh stale totals."""
        params = {k: v for k, v in sorted(vars(self).items())
                  if not k.startswith("_")}
        return f"{type(self).__name__}({params}):{np.dtype(self.dtype).name}"


class Count(Agg):
    """COUNT(*) of live rows in the group."""

    def __init__(self):
        self._n = None

    def measure(self, get) -> np.ndarray:
        return np.ones(self._n, np.int64)


class CountIf(Agg):
    """COUNT(*) FILTER (WHERE col = value)."""

    def __init__(self, col: str, value: str):
        self.cols = (col,)
        self.value = value

    def measure(self, get) -> np.ndarray:
        v = get(self.cols[0]).to_numpy(zero_copy_only=False)
        return (v == self.value).astype(np.int64)


class SumLen(Agg):
    """SUM(length(col)) over a string column, nulls counting 0."""

    def __init__(self, col: str):
        self.cols = (col,)

    def measure(self, get) -> np.ndarray:
        import pyarrow.compute as pc
        return pc.fill_null(pc.utf8_length(get(self.cols[0])), 0) \
            .to_numpy(zero_copy_only=False).astype(np.int64)


class Sum(Agg):
    """SUM(col) over a numeric column, nulls counting 0. ``dtype``
    selects int64 (exact, order-independent) or float64 (refresh and
    rebuild may then differ by float addition order)."""

    def __init__(self, col: str, dtype=np.int64):
        self.cols = (col,)
        self.dtype = dtype

    def measure(self, get) -> np.ndarray:
        import pyarrow.compute as pc
        return pc.fill_null(get(self.cols[0]), 0) \
            .to_numpy(zero_copy_only=False).astype(self.dtype)


# -------------------------------------------------------------- view kernel

_LIVE = "_live"  # internal +1/-1 weight sum; a group dies when it hits 0


def _write_view_partition(view_dir: str, rel: str, t: pa.Table) -> str:
    write_atomic(t, os.path.join(view_dir, rel))
    return rel


def _apply_view_delta(view_dir: str, schema: pa.Schema, key: str,
                      old_rel: str | None, rel: str,
                      d: pa.Table) -> str | None:
    """One view partition's incremental update: old stats + delta
    contributions, drop groups whose live count hit zero, write the new
    immutable file. None: partition untouched, its file stays."""
    if d.num_rows == 0:
        return None
    old = (pq.read_table(os.path.join(view_dir, old_rel))
           if old_rel else schema.empty_table())
    cols = [f.name for f in schema if f.name != key]
    both = pd.concat([old.to_pandas(), d.to_pandas()], ignore_index=True)
    merged = both.groupby(key, sort=False, dropna=False)[cols] \
        .sum().reset_index()
    merged = merged[merged[_LIVE] > 0].sort_values(key, kind="stable")
    out = pa.Table.from_pandas(merged, schema=schema, preserve_index=False)
    write_atomic(out, os.path.join(view_dir, rel))
    return rel


class MaterializedView:
    """Exactly-maintained GROUP-BY view: ``SELECT key, <aggs> FROM table
    GROUP BY key`` kept in sync with the lake table via the change feed.
    ``key`` must be a string column; it may be mutable (see module doc).
    """

    def __init__(self, job: CDCJob, name: str, key: str,
                 aggs: dict[str, Agg], num_partitions: int = 8):
        if not aggs:
            raise ValueError("need at least one aggregate")
        if key in (_LIVE, "_bucket"):
            raise ValueError(f"key collides with internal column: {key!r}")
        bad = [n for n in aggs if n in (key, _LIVE, "_bucket")]
        if bad:
            raise ValueError(f"aggregate names collide: {bad}")
        self.job = job
        self.name = name
        self.key = key
        self.aggs = dict(aggs)
        self.dir = os.path.join(job.table_dir, "views", name)
        self.num_partitions = num_partitions
        self._read_cols = sorted({key, *(c for a in aggs.values()
                                         for c in a.cols)})
        self._names = list(self.aggs)

    # -- per-block kernels ---------------------------------------------------
    def _measures(self, t: pa.Table, get) -> dict[str, np.ndarray]:
        out = {}
        for name, agg in self.aggs.items():
            if isinstance(agg, Count):
                agg._n = t.num_rows
            out[name] = agg.measure(get)
        return out

    def _partial_schema(self) -> pa.Schema:
        return pa.schema([(self.key, pa.string()),
                          (_LIVE, pa.int64()),
                          *[(n, pa.from_numpy_dtype(self.aggs[n].dtype))
                            for n in self._names],
                          ("_bucket", pa.int64())])

    def _group_sum(self, df: pd.DataFrame, bucket: bool) -> pa.Table:
        cols = [_LIVE, *self._names]
        # dropna=False: SQL GROUP BY keeps the NULL group
        g = df.groupby(self.key, sort=False, dropna=False)[cols] \
            .sum().reset_index()
        if bucket:
            # partition routing only — null keys ride a fixed sentinel so
            # the NULL group always lands in (and updates) one partition
            keys = g[self.key].to_numpy()
            mask = pd.isna(keys)
            if mask.any():
                keys = keys.copy()
                keys[mask] = "\0__null__"
            g["_bucket"] = partition_ids(keys, self.num_partitions)
        out_schema = self._partial_schema() if bucket else self._view_schema()
        return pa.Table.from_pandas(g, schema=out_schema,
                                    preserve_index=False)

    def _block_partial(self, t: pa.Table) -> pa.Table:
        """Full-build side: every live row is one +1 contribution."""
        if t.num_rows == 0:
            return self._partial_schema().empty_table()
        df = pd.DataFrame({
            self.key: t[self.key].to_numpy(zero_copy_only=False),
            _LIVE: np.ones(t.num_rows, np.int64),
            **self._measures(t, lambda c: t[c])})
        return self._group_sum(df, bucket=True)

    def _feed_partial(self, t: pa.Table) -> pa.Table:
        """Feed side: I/U rows contribute +post to the post group, D/U
        rows contribute -pre to the before group (payload for D, prev_*
        for U)."""
        if t.num_rows == 0:
            return self._partial_schema().empty_table()
        ct = t["change_type"].to_numpy(zero_copy_only=False)
        ins = (ct == "I") | (ct == "U")
        is_d, is_u = ct == "D", ct == "U"
        ret = is_d | is_u

        def prev_get(c):
            # U rows read prev_<c>; for the key column the feed only
            # carries prev_* when the attribute is payload (a table key
            # like conv_id cannot change, so post == prev there)
            pc_ = "prev_" + c
            return t[pc_] if pc_ in t.column_names else t[c]

        post = self._measures(t, lambda c: t[c])
        prev = self._measures(t, prev_get)
        post_key = t[self.key].to_numpy(zero_copy_only=False)
        prev_key = prev_get(self.key).to_numpy(zero_copy_only=False)
        key = np.concatenate([post_key[ins],
                              np.where(is_d, post_key, prev_key)[ret]])
        df = pd.DataFrame({
            self.key: key,
            _LIVE: np.concatenate([np.ones(int(ins.sum()), np.int64),
                                   -np.ones(int(ret.sum()), np.int64)]),
            **{n: np.concatenate(
                [post[n][ins],
                 -np.where(is_d, post[n], prev[n])[ret]])
               for n in self._names}})
        return self._group_sum(df, bucket=True)

    def _view_schema(self) -> pa.Schema:
        return pa.schema([(self.key, pa.string()),
                          (_LIVE, pa.int64()),
                          *[(n, pa.from_numpy_dtype(self.aggs[n].dtype))
                            for n in self._names]])

    def _reduce(self, t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return self._view_schema().empty_table()
        df = t.to_pandas().sort_values(self.key, kind="stable")
        return self._group_sum(df, bucket=False)

    # -- state ---------------------------------------------------------------
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
                 "key": self.key, "columns": self._names,
                 "agg_fingerprints": [self.aggs[n].fingerprint()
                                      for n in self._names],
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

    def _check_spec(self, st: dict) -> None:
        """The on-disk state was written for ONE spec; refreshing or
        reading it with a different key/aggregate set would silently
        union mismatched schemas — fail fast instead."""
        fps = [self.aggs[n].fingerprint() for n in self._names]
        if (st.get("key") != self.key or st.get("columns") != self._names
                or st.get("agg_fingerprints", fps) != fps):
            raise ValueError(
                f"view {self.name} on disk was built with key="
                f"{st.get('key')!r} columns={st.get('columns')} "
                f"aggs={st.get('agg_fingerprints')} but this spec has "
                f"key={self.key!r} columns={self._names} aggs={fps}; use "
                "the original spec or full_build() under a new view name")

    def read(self) -> pa.Table:
        st = self._state()
        if st is None:
            raise RuntimeError(f"view {self.name} has never been built")
        self._check_spec(st)
        parts = [pq.read_table(os.path.join(self.dir, f))
                 for f in st["files"].values()]
        t = (pa.concat_tables(parts) if parts
             else self._view_schema().empty_table())
        t = t.drop_columns([_LIVE])
        return t.take(pa.compute.sort_indices(t[self.key]))

    # -- full rebuild ----------------------------------------------------
    def full_build(self) -> dict:
        """Distributed recompute at the table's current version:
        per-block partials -> one reduce task per view partition ->
        immutable files + atomic json swap."""
        manifest = self.job._load_manifest_or_raise()
        version = manifest.table_version
        ds = self.job.read_table(columns=self._read_cols)
        out = wave_group_reduce(
            ds.map_batches(self._block_partial, batch_format="pyarrow"),
            "_bucket", self.num_partitions, self._reduce)
        os.makedirs(self.dir, exist_ok=True)
        wtask = ray.remote(_write_view_partition)
        refs = [wtask.remote(self.dir, f"p{i}.v{version}.parquet", ref)
                for i, ref in enumerate(out.materialize().to_arrow_refs())]
        files = dict(enumerate(ray.get(refs)))
        self._commit(version, files, self.num_partitions)
        return self._state()

    # -- incremental refresh -----------------------------------------------
    def refresh(self) -> dict:
        """Apply the change feed from the view's applied version to the
        table's current version. Rewrites only view partitions that
        received changes; a no-op when already current."""
        st = self._state()
        if st is None:
            return self.full_build()
        self._check_spec(st)
        cur = self.job._load_manifest_or_raise().table_version
        applied = st["applied_version"]
        if cur == applied:
            return st
        nb = int(st["num_partitions"])
        self.num_partitions = nb  # pinned at build time
        from ..state.manifest import Manifest
        if applied not in Manifest.retained_versions(self.job.table_dir):
            # the view's applied snapshot has been vacuumed: the feed from
            # `applied` can no longer be computed — recover with a full
            # rebuild instead of leaving the view permanently
            # un-refreshable
            return self.full_build()
        feed = self.job.read_changes(applied, cur)
        deltas = wave_group_reduce(
            feed.map_batches(self._feed_partial, batch_format="pyarrow"),
            "_bucket", nb, self._reduce)
        files = {int(k): v for k, v in st["files"].items()}
        os.makedirs(self.dir, exist_ok=True)
        atask = ray.remote(_apply_view_delta)
        pend = {i: atask.remote(self.dir, self._view_schema(), self.key,
                                files.get(i), f"p{i}.v{cur}.parquet", ref)
                for i, ref in
                enumerate(deltas.materialize().to_arrow_refs())}
        for i, rel in zip(pend, ray.get(list(pend.values()))):
            if rel is not None:  # None: untouched partition keeps its file
                files[i] = rel
        self._commit(cur, files, nb)
        return self._state()


class ConvStatsView(MaterializedView):
    """Per-conversation statistics ``(conv_id, n_turns, n_assistant,
    n_chars)`` — the original hardcoded view, now one declarative spec."""

    def __init__(self, job: CDCJob, name: str = "conv_stats",
                 num_partitions: int = 8):
        super().__init__(job, name, key="conv_id",
                         aggs={"n_turns": Count(),
                               "n_assistant": CountIf("role", "assistant"),
                               "n_chars": SumLen("text")},
                         num_partitions=num_partitions)


VIEW_SCHEMA = pa.schema([("conv_id", pa.string()),
                         ("n_turns", pa.int64()),
                         ("n_assistant", pa.int64()),
                         ("n_chars", pa.int64())])
