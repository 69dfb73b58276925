"""Combine + merge: the heart of the CDC apply.

Reference semantics being reproduced: Elasticsearch applies each change to a
doc keyed by entity id — I/U overwrite the doc, D deletes it, feed order
decides the winner (/root/reference/jobs-common/src/main/java/gov/ca/cwds/jobs/common/elastic/ElasticWriter.java:66-105
and .../ElasticsearchBulkOperationsService.java:36-58). This engine makes the
winner rule explicit — last-writer-wins on ``(ts, lsn)`` per key — and splits
the work into two Ray Data stages:

1. **Combiner** (stateless ``map_batches``, zero-copy Arrow in): per block,
   collapse all events of one key to its block-local LWW winner. This is the
   pre-aggregation push-down that bounds shuffle volume by *distinct keys per
   block* rather than raw events — and it is also the skew guard: a viral
   conv_id carrying 50% of a block's events still emits ~one winner row per
   block (blocks act as salt buckets; the per-partition merge is the final
   re-merge). Folded-away events are accounted via carried counter columns
   (``dup_folded``, ``conf_folded``, ``max_lsn_folded``) so partition counters
   stay exact.

2. **Partition merge** (``groupby("part").map_groups``): all winner rows for
   one partition + that partition's base Parquet file (a partition-local read
   — base rows never enter the shuffle) -> dedup verbatim redeliveries by
   ``lsn``, LWW-merge with base, drop tombstone winners, write the new
   immutable ``p={i}/v{version}.parquet``, return a one-row stats frame.

Counter algebra (matches pipelines/oracle.py exactly when a duplicate
redelivery and its original are applied within the same batch):
``conflict_total = E_deduped - keys_won_by_an_event`` and
``dedup_total = E_raw - E_deduped`` — both decompose over blocks, which is
why folded counters on winner rows sum to the exact totals.
"""

from __future__ import annotations

import os
import uuid

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from ..schema import KEY_COLS, PAYLOAD_COLS, conform_to_schema
from .partition import partition_ids

STATS_COLUMNS = [
    "part", "rows_applied", "dedup_count", "conflict_count",
    "replay_skipped", "lsn_watermark", "file",
]


def make_combiner(unified_schema: pa.Schema, num_partitions: int,
                  watermarks: dict[int, int] | None = None):
    """Returns a vectorized per-block combiner for ``map_batches``.

    Arrow in / pandas LWW / Arrow out. ``unified_schema`` is the batch-wide
    change schema (old v1 blocks get ``tool`` null back-filled here).

    Replay filtering happens HERE, before any LWW folding: an event whose lsn
    is already under its partition's committed watermark (crash-resume replay
    or a cross-batch duplicate redelivery) must not influence winner selection
    or be misclassified as a conflict. Skip counts ride to the merge as
    ``op == "_SKIP"`` carrier rows (one per partition per block) so the
    manifest counters stay exact without a side channel.
    """
    wm_arr = None
    if watermarks:
        wm_arr = np.zeros(num_partitions, dtype=np.int64)
        for i, w in watermarks.items():
            wm_arr[int(i)] = w

    def combine(batch: pa.Table) -> pa.Table:
        batch = conform_to_schema(batch, unified_schema)
        df = batch.to_pandas()
        if df.empty:
            df = df.assign(part=np.array([], np.int64),
                           dup_folded=np.array([], np.int64),
                           conf_folded=np.array([], np.int64),
                           max_lsn_folded=np.array([], np.int64))
            return pa.Table.from_pandas(df, preserve_index=False)
        df["part"] = partition_ids(df["conv_id"].to_numpy(), num_partitions)

        carriers = None
        if wm_arr is not None and wm_arr.any():
            replayed = df["lsn"].to_numpy() <= wm_arr[df["part"].to_numpy()]
            if replayed.any():
                skips = df.loc[replayed].groupby("part", sort=False).size()
                df = df.loc[~replayed]
                carriers = pd.DataFrame({
                    "part": skips.index.to_numpy(np.int64),
                    "op": "_SKIP",
                    "lsn": np.int64(-1),
                    "conv_id": "",
                    "turn_idx": np.int32(-1),
                    "dup_folded": skips.to_numpy(np.int64),
                    "conf_folded": np.int64(0),
                    "max_lsn_folded": np.int64(0),
                })
        if df.empty:
            return pa.Table.from_pandas(carriers, preserve_index=False) \
                if carriers is not None else pa.Table.from_pandas(
                    df.assign(dup_folded=np.array([], np.int64),
                              conf_folded=np.array([], np.int64),
                              max_lsn_folded=np.array([], np.int64)),
                    preserve_index=False)

        df = df.sort_values(["ts", "lsn"], kind="stable")
        # verbatim redelivery dedup within the block (identical lsn)
        dup_mask = df.duplicated("lsn", keep="first")
        key = ["part", "conv_id", "turn_idx"]
        dup_per_key = df.loc[dup_mask].groupby(key, sort=False).size()
        dd = df[~dup_mask]
        grp = dd.groupby(key, sort=False)
        winners = grp.tail(1).copy()
        sizes = grp.size()
        max_lsn = grp["lsn"].max()
        widx = pd.MultiIndex.from_frame(winners[key])
        winners["dup_folded"] = dup_per_key.reindex(widx, fill_value=0).to_numpy(np.int64)
        winners["conf_folded"] = (sizes.reindex(widx) - 1).to_numpy(np.int64)
        winners["max_lsn_folded"] = max_lsn.reindex(widx).to_numpy(np.int64)
        if carriers is not None:
            winners = pd.concat([winners, carriers], ignore_index=True)
        return pa.Table.from_pandas(winners, preserve_index=False)

    return combine


def make_partition_merger(
    table_dir: str,
    version: int,
    target_schema: pa.Schema,
    watermarks: dict[int, int],
    base_files: dict[int, str | None],
):
    """Returns the per-partition merge fn for ``groupby("part").map_groups``.

    Idempotent & retry-safe: pure function of (immutable base file @ version
    v-1, delta group); output lands at a deterministic immutable path via
    temp-file + ``os.replace``.

    Stored partition files persist tombstones (op == "D") with their
    (ts, lsn): an out-of-order event arriving in a LATER batch that is older
    than a committed delete must still lose LWW. ``rows_applied`` counts live
    (non-tombstone) rows only.

    Conflict counting composes exactly across batches: an event is counted
    the moment it is superseded — either losing within its own batch, or
    later, when the committed row it produced (lsn > 0) is overwritten. The
    cumulative total therefore equals the single-pass oracle's
    ``E_deduped - final_keys_won_by_an_event`` regardless of batching.
    """
    from ..schema import stored_schema

    pub_cols = [f.name for f in target_schema if f.name != "lsn"]
    disk_schema = stored_schema(target_schema)

    def merge(group: pd.DataFrame) -> pd.DataFrame:
        part = int(group["part"].iloc[0])
        wm = int(watermarks.get(part, 0))

        # replay-skip carriers from the combiner (resume / cross-batch
        # redelivery counts) — the reference's processed-marker dedup
        # (.../NsAuditEventDao.java:97-118 semantics)
        carrier_mask = group["op"].to_numpy() == "_SKIP"
        replay_skipped = int(group.loc[carrier_mask, "dup_folded"].sum())
        group = group.loc[~carrier_mask]
        # safety net (combiner already filters replays)
        replay_mask = group["lsn"].to_numpy() <= wm
        replay_skipped += int(replay_mask.sum())
        group = group.loc[~replay_mask]

        dedup = int(group["dup_folded"].sum())
        conflict = int(group["conf_folded"].sum())
        new_wm = int(max(wm, group["max_lsn_folded"].max())) if len(group) else wm

        # merge-level verbatim-redelivery dedup (copies that landed in
        # different blocks): identical lsn -> keep first
        group = group.sort_values(["ts", "lsn"], kind="stable")
        mdup = group.duplicated("lsn", keep="first")
        dedup += int(mdup.sum())
        group = group.loc[~mdup]
        n_events = len(group)

        base_rel = base_files.get(part)
        if base_rel:
            base = pq.read_table(os.path.join(table_dir, base_rel))
            base = conform_to_schema(base, disk_schema).to_pandas()
            if base["op"].isna().all():  # v0 snapshot files predate the op column
                base["op"] = "B"
        else:
            base = conform_to_schema(disk_schema.empty_table(), disk_schema).to_pandas()
        base["_stored"] = True

        # null back-fill: payload columns absent from this batch's change
        # schema (e.g. `tool` before the v2 segments arrive)
        for c in pub_cols:
            if c not in group.columns:
                group = group.assign(**{c: None})
        ev = group[["op", *pub_cols, "lsn"]].assign(_stored=False) if n_events else None
        allrows = pd.concat([base, ev], ignore_index=True) if ev is not None else base
        allrows = allrows.sort_values(["ts", "lsn"], kind="stable")
        winners = allrows.groupby(KEY_COLS, sort=False).tail(1)
        event_winners = int((~winners["_stored"]).sum())
        conflict += n_events - event_winners
        # committed rows that originated from an event (lsn > 0) and were
        # superseded in THIS batch — counted now so totals compose (see above)
        stored_ev = base["lsn"].to_numpy() > 0
        stored_ev_winners = int((winners["_stored"] & (winners["lsn"] > 0)).sum())
        conflict += int(stored_ev.sum()) - stored_ev_winners

        winners = winners.drop(columns=["_stored"]).sort_values(KEY_COLS, kind="stable")
        out = conform_to_schema(
            pa.Table.from_pandas(winners, preserve_index=False), disk_schema)
        live_rows = int((winners["op"] != "D").sum())

        rel = f"p={part}/v{version}.parquet"
        final_path = os.path.join(table_dir, rel)
        os.makedirs(os.path.dirname(final_path), exist_ok=True)
        tmp = final_path + f".tmp-{uuid.uuid4().hex}"
        pq.write_table(out, tmp)
        os.replace(tmp, final_path)

        return pd.DataFrame(
            [[part, live_rows, dedup, conflict, replay_skipped, new_wm, rel]],
            columns=STATS_COLUMNS,
        )

    return merge


def make_snapshot_writer(table_dir: str, version: int, target_schema: pa.Schema):
    """Initial-load partition writer: hash-partitioned base snapshot -> v0
    files. Reference analogue: initial load into a fresh timestamped index
    (.../elastic/ElasticsearchService.java:74-91)."""

    from ..schema import stored_schema

    disk_schema = stored_schema(target_schema)

    def write_partition(group: pd.DataFrame) -> pd.DataFrame:
        part = int(group["part"].iloc[0])
        live = group.drop(columns=["part"]).sort_values(KEY_COLS, kind="stable")
        live = live.assign(op="B")  # snapshot provenance marker
        out = conform_to_schema(
            pa.Table.from_pandas(live, preserve_index=False), disk_schema)
        rel = f"p={part}/v{version}.parquet"
        final_path = os.path.join(table_dir, rel)
        os.makedirs(os.path.dirname(final_path), exist_ok=True)
        tmp = final_path + f".tmp-{uuid.uuid4().hex}"
        pq.write_table(out, tmp)
        os.replace(tmp, final_path)
        wm = int(pd.to_numeric(group["lsn"]).max()) if len(group) else 0
        return pd.DataFrame(
            [[part, out.num_rows, 0, 0, 0, max(wm, 0), rel]], columns=STATS_COLUMNS)

    return write_partition
