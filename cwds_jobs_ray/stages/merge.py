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

2. **Partition merge** (one direct-shuffle reduce task per partition — see
   the "direct two-stage shuffle" section below): all winner rows for one
   partition + that partition's base Parquet file (a partition-local read —
   base rows never enter the shuffle) -> dedup verbatim redeliveries by
   ``lsn``, LWW-merge with base, persist tombstone winners, write the new
   immutable ``p={i}/v{version}.parquet``, return a one-row stats frame.

Counter algebra (matches pipelines/oracle.py exactly, including duplicate
redeliveries split across combine chunks): winner rows carry the lsns of the
rows folded into them (``folded_lsns``, a list column), so the merge sees the
complete lsn MULTISET of its partition's raw events and computes
``dedup = instances - distinct_lsns`` and
``conflict = distinct_lsns - event_winners (+ committed event rows superseded
this batch)`` exactly — no reliance on surviving-copy adjacency.

Tie-break: identical ``(ts, lsn)`` rows are verbatim redeliveries; the FIRST
delivered copy is authoritative (consistent with the cross-batch rule, where
the replay filter makes later batches' copies no-ops). This matters when
copies differ after schema projection — e.g. a v1-segment original
(tool=null) redelivered inside a v2 segment.
"""

from __future__ import annotations

import os
import uuid

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from ..schema import conform_to_schema

STATS_COLUMNS = [
    "part", "rows_applied", "dedup_count", "conflict_count",
    "replay_skipped", "lsn_watermark", "file",
]


def write_atomic(table: pa.Table, final_path: str) -> None:
    """Durable atomic data-file publish: temp write + fsync(file) +
    ``os.replace`` + fsync(dir). The manifest commit is only a valid commit
    point if the data files it references are durable FIRST — without the
    fsyncs a power loss could commit a manifest referencing undurable bytes
    (the machine-crash-level exactly-once hole)."""
    os.makedirs(os.path.dirname(final_path), exist_ok=True)
    tmp = final_path + f".tmp-{uuid.uuid4().hex}"
    with open(tmp, "wb") as f:
        pq.write_table(table, f)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, final_path)
    dfd = os.open(os.path.dirname(final_path), os.O_RDONLY)
    try:
        os.fsync(dfd)
    finally:
        os.close(dfd)

# Pluggable conflict-resolution policy (the reference's extension surface:
# its sink SPI decides how a redelivered doc overwrites, SURVEY.md §2.10).
# "lww": max (ts, lsn) wins (default — the reference's semantics).
# "fww": min (ts, lsn) wins (first writer; e.g. immutable-once ingest).
MERGE_POLICIES = ("lww", "fww")


def _winner_positions(starts: np.ndarray, runlen: np.ndarray,
                      dup: np.ndarray, policy: str) -> np.ndarray:
    """Winner index per key run over rows lexsorted by (key, ts, lsn).

    lww: the FIRST delivered copy of the maximal (ts, lsn) group — i.e. the
    last position in the run that is not a verbatim-redelivery copy of its
    predecessor (``dup``). fww: the first delivered copy of the minimal
    group, which is simply the run start (stable sort keeps delivery order
    within equal (ts, lsn)).
    """
    if policy == "lww":
        idx = np.arange(len(dup))
        return np.maximum.reduceat(np.where(~dup, idx, -1), starts)
    if policy == "fww":
        return starts
    raise ValueError(f"unknown merge policy {policy!r}")


def make_combiner(unified_schema: pa.Schema, num_partitions: int,
                  watermarks: dict[int, int] | None = None,
                  policy: str = "lww"):
    """Returns a vectorized per-block combiner for ``map_batches``.

    Arrow in / pandas LWW / Arrow out. ``unified_schema`` is the batch-wide
    change schema (old v1 blocks get ``tool`` null back-filled here).

    Replay filtering happens HERE, before any LWW folding: an event whose lsn
    is already under its partition's committed watermark (crash-resume replay
    or a cross-batch duplicate redelivery) must not influence winner selection
    or be misclassified as a conflict. Skip counts ride to the merge as
    ``op == "_SKIP"`` carrier rows (one per partition per block) so the
    manifest counters stay exact without a side channel.

    Each winner row carries ``folded_lsns`` — the lsns of every other row of
    its key in this chunk — so the merge can count dedup/conflict exactly
    from the partition-wide lsn multiset (see module docstring). The lists
    add O(raw int64 lsns) to the shuffle, dwarfed by the text payload the
    winner rows already carry.
    """
    wm_arr = None
    if watermarks:
        wm_arr = np.zeros(num_partitions, dtype=np.int64)
        for i, w in watermarks.items():
            wm_arr[int(i)] = w

    def combine(batch: pa.Table) -> pa.Table:
        from .partition import dict_encode, hash_strings

        batch = conform_to_schema(batch, unified_schema)
        n = batch.num_rows
        if n == 0:
            return _empty_combined(unified_schema)

        # validation guard (reference M10: fail the record if required fields
        # are null, AbstractChangedFacilityService.java:24-27): key and
        # ordering columns must be non-null or LWW ordering is undefined
        for req in ("conv_id", "turn_idx", "lsn", "ts", "op"):
            nc = batch[req].null_count
            if nc:
                raise ValueError(
                    f"{nc} null value(s) in required change-event column "
                    f"{req!r} — malformed WAL segment")

        # integer views only — the string payload is touched exactly twice:
        # one dictionary-encode pass and one final take of the winner rows.
        # (The memory-bandwidth-frugal shape: sorting/grouping full string
        # blocks measured ~4x slower under full-node concurrency.)
        codes, uniq = dict_encode(batch["conv_id"])
        part_u = (hash_strings(uniq) % np.uint64(num_partitions)).astype(np.int64)
        part = part_u[codes]
        lsn = batch["lsn"].to_numpy(zero_copy_only=False)
        ts = batch["ts"].to_numpy(zero_copy_only=False).view(np.int64)
        turn = batch["turn_idx"].to_numpy(zero_copy_only=False).astype(np.int64)

        carriers = None
        orig_idx = np.arange(n)
        if wm_arr is not None and wm_arr.any():
            replayed = lsn <= wm_arr[part]
            if replayed.any():
                skips = np.bincount(part[replayed], minlength=num_partitions)
                nz = np.nonzero(skips)[0]
                carriers = pa.table({
                    "part": pa.array(nz.astype(np.int64)),
                    "op": pa.array(np.repeat("_SKIP", len(nz)), pa.string()),
                    "lsn": pa.array(np.full(len(nz), -1, np.int64)),
                    "conv_id": pa.array(np.repeat("", len(nz)), pa.string()),
                    "turn_idx": pa.array(np.full(len(nz), -1, np.int32)),
                    "skip_count": pa.array(skips[nz].astype(np.int64)),
                })
                keep = ~replayed
                orig_idx = orig_idx[keep]
                codes, part, lsn, ts, turn = (a[keep] for a in
                                              (codes, part, lsn, ts, turn))
        if len(orig_idx) == 0:
            return carriers if carriers is not None \
                else _empty_combined(unified_schema)

        # one lexsort on ints: rows grouped by key (code, turn), ordered by
        # (ts, lsn) within each key-run
        o = np.lexsort((lsn, ts, turn, codes))
        sc, st, sl = codes[o], turn[o], lsn[o]
        newkey = np.empty(len(o), dtype=bool)
        newkey[0] = True
        newkey[1:] = (sc[1:] != sc[:-1]) | (st[1:] != st[:-1])
        # verbatim redelivery copies are adjacent (identical ts AND lsn)
        dup = np.zeros(len(o), dtype=bool)
        dup[1:] = (~newkey[1:]) & (sl[1:] == sl[:-1])
        starts = np.flatnonzero(newkey)
        runlen = np.diff(np.append(starts, len(o)))
        max_lsn_run = np.maximum.reduceat(sl, starts)
        winner_pos = _winner_positions(starts, runlen, dup, policy)
        winner_idx = orig_idx[o[winner_pos]]

        # folded lsns: every row of the run except the winner, in run order
        keep = np.ones(len(o), dtype=bool)
        keep[winner_pos] = False
        offsets = np.concatenate(
            [[0], np.cumsum(runlen - 1)]).astype(np.int32)
        folded = pa.ListArray.from_arrays(pa.array(offsets),
                                          pa.array(sl[keep], pa.int64()))

        winners = batch.take(pa.array(winner_idx))
        winners = winners.append_column("part", pa.array(part[o[winner_pos]]))
        winners = winners.append_column("folded_lsns", folded)
        winners = winners.append_column("max_lsn_folded", pa.array(max_lsn_run))
        if carriers is not None:
            winners = pa.concat_tables([winners, carriers],
                                       promote_options="permissive")
        return winners

    return combine


def _empty_combined(unified_schema: pa.Schema) -> pa.Table:
    schema = pa.schema(
        list(unified_schema)
        + [pa.field("part", pa.int64()),
           pa.field("folded_lsns", pa.list_(pa.int64())),
           pa.field("max_lsn_folded", pa.int64()),
           pa.field("skip_count", pa.int64())])
    return schema.empty_table()


def make_partition_merger(
    table_dir: str,
    version: int,
    target_schema: pa.Schema,
    watermarks: dict[int, int],
    base_files: dict[int, str | None],
    policy: str = "lww",
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
    import pyarrow.compute as pc

    from ..schema import stored_schema

    disk_schema = stored_schema(target_schema)
    delta_schema = disk_schema  # op + payload + lsn, same column set

    def merge(group: pa.Table) -> pd.DataFrame:
        from .partition import dict_encode

        part = int(group["part"][0].as_py())
        wm = int(watermarks.get(part, 0))

        # replay-skip carriers from the combiner (resume / cross-batch
        # redelivery counts) — the reference's processed-marker dedup
        # (.../NsAuditEventDao.java:97-118 semantics)
        replay_skipped = 0
        if "skip_count" in group.column_names:  # absent when no chunk replayed
            carrier_mask = pc.equal(group["op"], "_SKIP")
            replay_skipped = int(pc.sum(
                pc.filter(group["skip_count"], carrier_mask)).as_py() or 0)
            group = group.filter(pc.invert(carrier_mask))
        # safety net (combiner already filters replays)
        replay = pc.less_equal(group["lsn"], wm)
        if pc.any(replay).as_py():
            replay_skipped += int(pc.sum(pc.cast(replay, pa.int64())).as_py())
            group = group.filter(pc.invert(replay))

        # exact lsn multiset of every raw event routed here this batch:
        # winner lsns + the lsns folded into them by the combiner chunks.
        # dedup/conflict derive from it precisely, no matter how verbatim
        # redeliveries were split across chunks (module docstring algebra).
        folded_flat = (group["folded_lsns"].combine_chunks().flatten()
                       .to_numpy(zero_copy_only=False).astype(np.int64)
                       if group.num_rows
                       and "folded_lsns" in group.column_names
                       else np.empty(0, np.int64))
        own_lsns = group["lsn"].to_numpy(zero_copy_only=False)
        all_inst = np.concatenate([own_lsns, folded_flat])
        n_events = len(np.unique(all_inst))
        dedup = len(all_inst) - n_events
        conflict = 0
        new_wm = int(max(wm, pc.max(group["max_lsn_folded"]).as_py() or 0)) \
            if group.num_rows else wm

        base_rel = base_files.get(part)
        if base_rel:
            base = pq.read_table(os.path.join(table_dir, base_rel))
            base = conform_to_schema(base, disk_schema)
            if base["op"].null_count == base.num_rows:
                # v0 snapshot files predate the op column
                base = base.set_column(
                    base.schema.get_field_index("op"), "op",
                    pa.array(np.repeat("B", base.num_rows), pa.string()))
        else:
            base = disk_schema.empty_table()

        delta = conform_to_schema(group, delta_schema)
        allrows = pa.concat_tables([base, delta])
        nb = base.num_rows

        if allrows.num_rows == 0:
            out, live_rows, event_winners = disk_schema.empty_table(), 0, 0
        else:
            # integer-run reduction (same shape as the combiner): sort ints,
            # find key runs, take winner rows once
            codes, uniq = dict_encode(allrows["conv_id"])
            turn = allrows["turn_idx"].to_numpy(zero_copy_only=False).astype(np.int64)
            ts = allrows["ts"].to_numpy(zero_copy_only=False).view(np.int64)
            lsn = allrows["lsn"].to_numpy(zero_copy_only=False)
            stored = np.arange(allrows.num_rows) < nb

            o = np.lexsort((lsn, ts, turn, codes))
            sc, st, sl = codes[o], turn[o], lsn[o]
            newkey = np.empty(len(o), dtype=bool)
            newkey[0] = True
            newkey[1:] = (sc[1:] != sc[:-1]) | (st[1:] != st[:-1])
            # identical (ts, lsn) copies that landed in different combine
            # chunks are adjacent; the FIRST delivered copy wins the tie
            # (stable lexsort preserves chunk/delivery order)
            dup = np.zeros(len(o), dtype=bool)
            dup[1:] = (~newkey[1:]) & (sl[1:] == sl[:-1])
            starts = np.flatnonzero(newkey)
            runlen = np.diff(np.append(starts, len(o)))

            winner_pos = _winner_positions(starts, runlen, dup, policy)
            winner_o = o[winner_pos]
            w_stored = stored[winner_o]
            event_winners = int((~w_stored).sum())
            # distinct events that did not win their key this batch
            conflict += n_events - event_winners
            # committed rows that originated from an event (lsn > 0) and
            # were superseded in THIS batch — counted now so cumulative
            # totals compose across batching (see module docstring)
            stored_ev_total = int((lsn[:nb] > 0).sum())
            stored_ev_winners = int((w_stored & (lsn[winner_o] > 0)).sum())
            conflict += stored_ev_total - stored_ev_winners

            # final order: (conv_id, turn_idx) — rank the small dictionary,
            # not the full string column
            rank_u = np.empty(len(uniq), dtype=np.int64)
            rank_u[np.argsort(np.asarray(uniq))] = np.arange(len(uniq))
            final = winner_o[np.lexsort((turn[winner_o], rank_u[codes[winner_o]]))]
            out = allrows.take(pa.array(final))
            live_rows = int(pc.sum(pc.cast(pc.not_equal(out["op"], "D"),
                                           pa.int64())).as_py() or 0)

        rel = f"p={part}/v{version}.parquet"
        write_atomic(out, os.path.join(table_dir, rel))

        return pd.DataFrame(
            [[part, live_rows, dedup, conflict, replay_skipped, new_wm, rel]],
            columns=STATS_COLUMNS,
        )

    return merge


# --------------------------------------------------------------------------
# direct two-stage shuffle (raw Ray tasks)
#
# Why not groupby("part").map_groups: Ray Data's sort-based shuffle costs
# ~10x the merge compute at this shape (measured: 0.16s of real merge work
# per partition vs 2.9s mean task wall through the sort path) because the
# generic sort must sample, range-partition and reassemble chunked blocks.
# Our shuffle is degenerate-simple: a FIXED partition count P and an exact
# int key. So we express it directly: combine tasks return P per-partition
# slices (``num_returns=P`` — a merge task fetches ONLY its slice, never the
# whole map output), merge tasks reduce one partition each. This is the one
# place the engine drops below the Dataset API, as SURVEY §2/§7 anticipates.
#
# Partitioning assumption: part = hash(conv_id) % P with P fixed in the
# manifest; all rows of a conversation land in one partition.


def combine_and_split(paths: list[str], unified_schema: pa.Schema,
                      num_partitions: int, watermarks: dict[int, int],
                      group_size: int = 8, policy: str = "lww"):
    """Stage-1 task body: read WAL files -> block LWW combine -> split the
    winner rows into ceil(P / group_size) partition-GROUP slices.

    Grouping matters: emitting one object per partition (P objects per task)
    makes object-store puts the bottleneck at high concurrency (measured:
    64 returns/task tripled stage wall at 32 CPUs). A merge task fetches its
    group's slice — shared zero-copy with the other G-1 merge tasks on the
    same node — and filters out its partition.
    """
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    combine = make_combiner(unified_schema, num_partitions, watermarks, policy)
    tables = [conform_to_schema(pq.read_table(p), unified_schema)
              for p in paths]
    winners = combine(pa.concat_tables(tables))
    n_groups = -(-num_partitions // group_size)
    if winners.num_rows == 0:
        return None if n_groups == 1 else tuple([None] * n_groups)
    groups = pc.divide(winners["part"], group_size)
    out: list = [None] * n_groups
    for g in pc.unique(groups).to_pylist():
        out[int(g)] = winners.filter(pc.equal(groups, g))
    return out[0] if n_groups == 1 else tuple(out)


def merge_partition_slices(part: int, merger, *slices) -> pd.DataFrame:
    """Stage-2 task body: reduce one partition's rows (filtered out of its
    group slices) with the standard partition merger. Slices arrive as
    varargs so Ray resolves each ObjectRef before the task runs."""
    import pyarrow.compute as pc

    tables = []
    for t in slices:
        if t is None or t.num_rows == 0:
            continue
        mine = t.filter(pc.equal(t["part"], part))
        if mine.num_rows:
            tables.append(mine)
    if not tables:
        return pd.DataFrame(columns=STATS_COLUMNS)
    return merger(pa.concat_tables(tables, promote_options="permissive"))


def snapshot_split(path: str, rg_start: int, rg_end: int,
                   target_schema: pa.Schema, num_partitions: int,
                   group_size: int = 8):
    """Initial-load stage-1 task: read a row-group range of the base
    snapshot, add partition ids, split into partition-group slices (same
    direct-shuffle shape as combine_and_split)."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq_

    f = pq_.ParquetFile(path)
    t = f.read_row_groups(list(range(rg_start, rg_end)))
    t = conform_to_schema(t, target_schema)
    from .partition import partition_ids

    part = partition_ids(t["conv_id"], num_partitions)
    t = t.append_column("part", pa.array(part))
    n_groups = -(-num_partitions // group_size)
    if t.num_rows == 0:
        return None if n_groups == 1 else tuple([None] * n_groups)
    groups = pc.divide(t["part"], group_size)
    out: list = [None] * n_groups
    for g in pc.unique(groups).to_pylist():
        out[int(g)] = t.filter(pc.equal(groups, g))
    return out[0] if n_groups == 1 else tuple(out)


def snapshot_write_partition(part: int, table_dir: str, version: int,
                             target_schema: pa.Schema, *slices) -> pd.DataFrame:
    """Initial-load stage-2 task: write one partition's v0 file.

    Reference analogue: initial load into a fresh timestamped index
    (.../elastic/ElasticsearchService.java:74-91)."""
    import pyarrow.compute as pc

    from ..schema import stored_schema

    disk_schema = stored_schema(target_schema)
    tables = []
    for t in slices:
        if t is None or t.num_rows == 0:
            continue
        mine = t.filter(pc.equal(t["part"], part))
        if mine.num_rows:
            tables.append(mine.drop_columns(["part"]))
    if not tables:
        return pd.DataFrame(columns=STATS_COLUMNS)
    t = pa.concat_tables(tables, promote_options="permissive")

    from .partition import dict_encode

    codes, uniq = dict_encode(t["conv_id"])
    turn = t["turn_idx"].to_numpy(zero_copy_only=False).astype(np.int64)
    rank_u = np.empty(len(uniq), dtype=np.int64)
    rank_u[np.argsort(np.asarray(uniq))] = np.arange(len(uniq))
    order = np.lexsort((turn, rank_u[codes]))
    t = t.take(pa.array(order))
    out = conform_to_schema(t, disk_schema)
    out = out.set_column(out.schema.get_field_index("op"), "op",
                         pa.array(np.repeat("B", out.num_rows), pa.string()))
    # a base table without lineage gets lsn=0 (pre-WAL snapshot)
    out = out.set_column(out.schema.get_field_index("lsn"), "lsn",
                         pc.fill_null(out["lsn"], 0))

    rel = f"p={part}/v{version}.parquet"
    write_atomic(out, os.path.join(table_dir, rel))
    lsns = out["lsn"].to_numpy(zero_copy_only=False)
    wm = int(lsns.max()) if len(lsns) else 0
    return pd.DataFrame(
        [[part, out.num_rows, 0, 0, 0, max(wm, 0), rel]],
        columns=STATS_COLUMNS)


