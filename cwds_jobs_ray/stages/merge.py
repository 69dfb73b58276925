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
    "replay_skipped", "lsn_watermark", "file", "delta_file",
    "delta_rows_new", "base_file_rows", "rows_in", "zone",
]


def file_zone(t: pa.Table) -> dict:
    """Zone-map entry for a just-written data file: min/max (ts, lsn) and
    row count, computed from the in-memory table by the task that wrote it
    (zero extra I/O). Recorded in the manifest per file; ``CDCJob.plan_read``
    prunes files/partitions whose zone cannot overlap a read's ts range."""
    import pyarrow.compute as pc

    if t.num_rows == 0:
        return {"rows": 0}
    ts = pc.cast(t["ts"], pa.int64())
    return {"min_ts": pc.min(ts).as_py(), "max_ts": pc.max(ts).as_py(),
            "min_lsn": pc.min(t["lsn"]).as_py() or 0,
            "max_lsn": pc.max(t["lsn"]).as_py() or 0,
            "rows": t.num_rows}

# merge-on-read key/order columns: enough to decide every LWW winner and
# count live rows without touching the payload
MERGE_KEY_COLS = ["conv_id", "turn_idx", "ts", "lsn", "op"]


def fsync_dir(path: str) -> None:
    dfd = os.open(path, os.O_RDONLY)
    try:
        os.fsync(dfd)
    finally:
        os.close(dfd)


def write_atomic(table: pa.Table, final_path: str) -> None:
    """Durable atomic data-file publish: temp write + fsync(file) +
    ``os.replace`` + fsync(dir) + fsync(parent dir). The manifest commit is
    only a valid commit point if the data files it references are durable
    FIRST — without the fsyncs a power loss could commit a manifest
    referencing undurable bytes (the machine-crash-level exactly-once hole).

    The PARENT of the p=N directory (the table dir) is fsynced too: on a
    partition's first-ever file the p=N directory entry itself is new, and
    without making it durable a crash could leave a committed manifest
    pointing at a vanished directory (verify-on-open would then hard-fail
    the table)."""
    part_dir = os.path.dirname(final_path)
    new_dir = not os.path.isdir(part_dir)
    os.makedirs(part_dir, exist_ok=True)
    tmp = final_path + f".tmp-{uuid.uuid4().hex}"
    with open(tmp, "wb") as f:
        pq.write_table(table, f)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, final_path)
    fsync_dir(part_dir)
    if new_dir:
        fsync_dir(os.path.dirname(part_dir))

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


def _key_arrays(table: pa.Table):
    """(codes, uniq, turn, ts, lsn) integer views of a table's key/order
    columns — the string payload is dictionary-encoded once."""
    from .partition import dict_encode

    codes, uniq = dict_encode(table["conv_id"])
    turn = table["turn_idx"].to_numpy(zero_copy_only=False).astype(np.int64)
    ts = table["ts"].to_numpy(zero_copy_only=False).view(np.int64)
    lsn = table["lsn"].to_numpy(zero_copy_only=False)
    return codes, uniq, turn, ts, lsn


def _lww_winner_indices(codes, turn, ts, lsn, policy: str) -> np.ndarray:
    """Index (into input row order) of each key's winner under ``policy``.
    Stable lexsort keeps delivery order within identical (ts, lsn), so the
    first delivered copy wins ties (see module docstring)."""
    o = np.lexsort((lsn, ts, turn, codes))
    sc, st, sl = codes[o], turn[o], lsn[o]
    newkey = np.empty(len(o), dtype=bool)
    newkey[0] = True
    newkey[1:] = (sc[1:] != sc[:-1]) | (st[1:] != st[:-1])
    dup = np.zeros(len(o), dtype=bool)
    dup[1:] = (~newkey[1:]) & (sl[1:] == sl[:-1])
    starts = np.flatnonzero(newkey)
    runlen = np.diff(np.append(starts, len(o)))
    return o[_winner_positions(starts, runlen, dup, policy)]


def _key_sort_indices(table: pa.Table) -> pa.Array:
    """Final output order (conv_id, turn_idx): rank the small conv_id
    dictionary, never sort the full string column."""
    from .partition import dict_encode

    codes, uniq = dict_encode(table["conv_id"])
    turn = table["turn_idx"].to_numpy(zero_copy_only=False).astype(np.int64)
    rank_u = np.empty(len(uniq), dtype=np.int64)
    rank_u[np.argsort(np.asarray(uniq))] = np.arange(len(uniq))
    return pa.array(np.lexsort((turn, rank_u[codes])))


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
    part_meta: dict[int, dict],
    policy: str = "lww",
    delta_threshold: float = 0.25,
    max_delta_files: int = 8,
):
    """Returns the per-partition merge fn (one call per partition per batch).

    Idempotent & retry-safe: pure function of (immutable committed files @
    version v-1, delta group); output lands at a deterministic immutable path
    via temp-file + ``os.replace``.

    **Write amplification is bounded to O(delta)**: when the incoming winner
    set (plus already-accumulated deltas) is below ``delta_threshold`` of the
    base file, the batch writes only a per-partition DELTA file
    (``p={i}/d{version}.parquet``) holding this batch's winning rows; the
    base is left untouched and readers LWW-merge base+deltas on read. Only
    the base's *key/order columns* are read for winner accounting — never the
    payload. Once deltas grow past the threshold (or ``max_delta_files``),
    the batch folds everything into a new base (size-tiered compaction).
    ``part_meta[part]`` carries ``{file, delta_files, delta_rows,
    base_file_rows}`` from the committed manifest.

    Stored partition files persist tombstones (op == "D") with their
    (ts, lsn): an out-of-order event arriving in a LATER batch that is older
    than a committed delete must still lose LWW. ``rows_applied`` counts live
    (non-tombstone) rows only.

    Conflict counting composes exactly across batches: an event is counted
    the moment it is superseded — either losing within its own batch, or
    later, when the committed PRE-BATCH WINNER row it produced (lsn > 0) is
    overwritten. The cumulative total therefore equals the single-pass
    oracle's ``E_deduped - final_keys_won_by_an_event`` regardless of
    batching.
    """
    import pyarrow.compute as pc

    from ..schema import stored_schema

    disk_schema = stored_schema(target_schema)
    delta_schema = disk_schema  # op + payload + lsn, same column set
    kschema = pa.schema([disk_schema.field(c) for c in MERGE_KEY_COLS])

    def merge(group: pa.Table) -> pd.DataFrame:
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

        meta = part_meta.get(part) or {}
        base_rel = meta.get("file")
        delta_rels: list[str] = list(meta.get("delta_files") or [])
        stored_rels = ([base_rel] if base_rel else []) + delta_rels

        delta = conform_to_schema(group, delta_schema)
        nd = delta.num_rows

        write_delta = (
            base_rel is not None
            and len(delta_rels) < max_delta_files
            and nd + int(meta.get("delta_rows", 0))
            < delta_threshold * int(meta.get("base_file_rows", 0))
        )

        # stored state: full rows for a base rewrite; key/order columns only
        # for a delta write (payload bytes never leave disk)
        read_schema = kschema if write_delta else disk_schema
        stored_parts = []
        for rel in stored_rels:
            f = pq.ParquetFile(os.path.join(table_dir, rel))
            cols = ([c for c in MERGE_KEY_COLS if c in f.schema_arrow.names]
                    if write_delta else None)
            t = f.read(columns=cols)
            t = conform_to_schema(t, read_schema)
            if t["op"].null_count == t.num_rows and t.num_rows:
                # v0 snapshot files predate the op column
                t = t.set_column(
                    t.schema.get_field_index("op"), "op",
                    pa.array(np.repeat("B", t.num_rows), pa.string()))
            stored_parts.append(t)
        stored_tbl = (pa.concat_tables(stored_parts) if stored_parts
                      else read_schema.empty_table())
        nb = stored_tbl.num_rows
        allrows = pa.concat_tables(
            [stored_tbl, delta.select(MERGE_KEY_COLS) if write_delta
             else delta])

        new_base_rel, new_delta_rel, delta_rows_new = base_rel, None, 0
        base_file_rows = int(meta.get("base_file_rows", 0))
        zone = None

        if allrows.num_rows == 0:
            live_rows = 0
            if not write_delta:
                new_base_rel = f"p={part}/v{version}.parquet"
                write_atomic(disk_schema.empty_table(),
                             os.path.join(table_dir, new_base_rel))
                base_file_rows = 0
                zone = {"rows": 0}
        else:
            codes, uniq, turn, ts, lsn = _key_arrays(allrows)
            stored = np.arange(allrows.num_rows) < nb
            winner_o = _lww_winner_indices(codes, turn, ts, lsn, policy)
            w_stored = stored[winner_o]
            event_winners = int((~w_stored).sum())
            # distinct events that did not win their key this batch
            conflict += n_events - event_winners
            # committed PRE-BATCH WINNER rows that originated from an event
            # (lsn > 0) and were superseded in THIS batch — counted now so
            # cumulative totals compose across batching. With delta files the
            # stored state holds superseded rows too (already counted in
            # their own batch), so restrict to the stored state's winners.
            if nb and len(stored_rels) > 1:
                pre_w = np.zeros(nb, dtype=bool)
                pre_w[_lww_winner_indices(codes[:nb], turn[:nb], ts[:nb],
                                          lsn[:nb], policy)] = True
            else:
                pre_w = np.ones(nb, dtype=bool)  # a lone base is all winners
            stored_ev_total = int((lsn[:nb] > 0)[pre_w].sum())
            stored_ev_winners = int((w_stored & (lsn[winner_o] > 0)).sum())
            conflict += stored_ev_total - stored_ev_winners

            win_ops = allrows["op"].take(pa.array(winner_o))
            live_rows = int(pc.sum(pc.cast(pc.not_equal(win_ops, "D"),
                                           pa.int64())).as_py() or 0)

            if write_delta:
                # persist ONLY this batch's winning rows; base untouched
                d_idx = winner_o[~w_stored] - nb
                if len(d_idx):
                    out = delta.take(pa.array(d_idx))
                    out = out.take(_key_sort_indices(out))
                    new_delta_rel = f"p={part}/d{version}.parquet"
                    write_atomic(out, os.path.join(table_dir, new_delta_rel))
                    delta_rows_new = out.num_rows
                    zone = file_zone(out)
            else:
                # fold stored state + delta into a fresh base (size-tiered)
                out = allrows.take(pa.array(winner_o))
                out = out.take(_key_sort_indices(out))
                new_base_rel = f"p={part}/v{version}.parquet"
                write_atomic(out, os.path.join(table_dir, new_base_rel))
                base_file_rows = out.num_rows
                zone = file_zone(out)

        return pd.DataFrame(
            [[part, live_rows, dedup, conflict, replay_skipped, new_wm,
              new_base_rel, new_delta_rel, delta_rows_new, base_file_rows,
              nd, zone]],
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
                      group_size: int = 8, policy: str = "lww",
                      lsn_namespace: int = 0):
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
    tables = []
    for p in paths:
        if isinstance(p, str):  # whole segment
            t = pq.read_table(p)
        else:  # (path, rg_start, rg_end): a fat segment split across tasks
            path, a, b = p
            t = pq.ParquetFile(path).read_row_groups(list(range(a, b)))
        tables.append(conform_to_schema(t, unified_schema))
    batch = pa.concat_tables(tables)
    if lsn_namespace:  # multi-source: map raw lsns into the source's range
        import pyarrow.compute as _pc
        batch = batch.set_column(
            batch.schema.get_field_index("lsn"), "lsn",
            _pc.add(batch["lsn"], lsn_namespace))
    winners = combine(batch)
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


def merge_on_read(table_dir: str, base_rel: str | None, delta_rels: list[str],
                  full_schema: pa.Schema, columns: list[str] | None = None,
                  policy: str = "lww",
                  ts_range: tuple[int | None, int | None] | None = None,
                  key_eq: str | None = None) -> pa.Table:
    """LWW-merged LIVE view of one partition's committed base+delta files.

    Reads only ``columns`` ∪ the key/order columns, merges per key (first
    delivered copy wins ties, same rule as the write path), drops tombstone
    winners, returns ``columns`` in (conv_id, turn_idx) order. This is the
    read half of the delta-file write path: partition-local, payload read
    once, nothing shuffled.
    """
    import pyarrow.compute as pc

    out_cols = columns or [f.name for f in full_schema if f.name != "op"]
    need = list(dict.fromkeys(out_cols + MERGE_KEY_COLS))
    sub = pa.schema([full_schema.field(c) for c in need])
    parts = []
    for rel in ([base_rel] if base_rel else []) + list(delta_rels):
        path = os.path.join(table_dir, rel)
        f = pq.ParquetFile(path)
        cols = [c for c in need if c in f.schema_arrow.names]
        if key_eq is not None:
            # point read: files are (conv_id, turn_idx)-sorted, so the
            # equality filter prunes to ~one row group via footer stats —
            # LWW stays exact because filtering by the KEY keeps every row
            # of the requested key
            raw = pq.read_table(path, columns=cols,
                                filters=[("conv_id", "==", key_eq)])
        else:
            raw = f.read(columns=cols)
        t = conform_to_schema(raw, sub)
        if t.num_rows and t["op"].null_count == t.num_rows:
            t = t.set_column(t.schema.get_field_index("op"), "op",
                             pa.array(np.repeat("B", t.num_rows), pa.string()))
        parts.append(t)
    allrows = pa.concat_tables(parts) if parts else sub.empty_table()
    if allrows.num_rows:
        codes, uniq, turn, ts, lsn = _key_arrays(allrows)
        winner_o = _lww_winner_indices(codes, turn, ts, lsn, policy)
        allrows = allrows.take(pa.array(winner_o))
    live = allrows.filter(pc.not_equal(allrows["op"], "D"))
    live = live.take(_key_sort_indices(live))
    if ts_range is not None:
        # the predicate applies to the WINNER's ts, so it must run after
        # the merge (plan_read prunes whole files only where provably safe)
        lo, hi = ts_range
        m = pa.array(np.ones(live.num_rows, bool))
        ts_i = pc.cast(live["ts"], pa.int64())
        if lo is not None:
            m = pc.and_kleene(m, pc.greater_equal(ts_i, lo))
        if hi is not None:
            m = pc.and_kleene(m, pc.less_equal(ts_i, hi))
        live = live.filter(pc.fill_null(m, False))
    return live.select(out_cols)


def reshard_split(table_dir: str, base_rel: str | None, delta_rels: list[str],
                  disk_schema: pa.Schema, new_num_partitions: int,
                  group_size: int = 8, policy: str = "lww"):
    """Reshard stage-1 task: one OLD partition's committed state (base +
    deltas LWW-merged, tombstones KEPT with their (ts, lsn) so disorder
    guarantees survive the reshard) re-routed into NEW-partition group
    slices — the same direct-shuffle shape as combine_and_split."""
    import pyarrow.compute as pc

    from .partition import partition_ids

    parts = []
    for rel in ([base_rel] if base_rel else []) + list(delta_rels):
        t = conform_to_schema(pq.read_table(os.path.join(table_dir, rel)),
                              disk_schema)
        if t.num_rows and t["op"].null_count == t.num_rows:
            t = t.set_column(t.schema.get_field_index("op"), "op",
                             pa.array(np.repeat("B", t.num_rows), pa.string()))
        parts.append(t)
    t = pa.concat_tables(parts) if parts else disk_schema.empty_table()
    if t.num_rows:
        codes, _u, turn, ts, lsn = _key_arrays(t)
        t = t.take(pa.array(_lww_winner_indices(codes, turn, ts, lsn, policy)))
    part = partition_ids(t["conv_id"], new_num_partitions)
    t = t.append_column("part", pa.array(part))
    n_groups = -(-new_num_partitions // group_size)
    if t.num_rows == 0:
        return None if n_groups == 1 else tuple([None] * n_groups)
    groups = pc.divide(t["part"], group_size)
    out: list = [None] * n_groups
    for g in pc.unique(groups).to_pylist():
        out[int(g)] = t.filter(pc.equal(groups, g))
    return out[0] if n_groups == 1 else tuple(out)


def reshard_write_partition(part: int, table_dir: str, version: int,
                            disk_schema: pa.Schema, *slices) -> pd.DataFrame:
    """Reshard stage-2 task: write one NEW partition's base file, preserving
    op (tombstones) and lsn lineage exactly as committed."""
    import pyarrow.compute as pc

    tables = []
    for t in slices:
        if t is None or t.num_rows == 0:
            continue
        mine = t.filter(pc.equal(t["part"], part))
        if mine.num_rows:
            tables.append(mine.drop_columns(["part"]))
    t = (pa.concat_tables(tables, promote_options="permissive") if tables
         else disk_schema.empty_table())
    t = t.take(_key_sort_indices(t))
    out = conform_to_schema(t, disk_schema)
    rel = f"p={part}/v{version}.parquet"
    write_atomic(out, os.path.join(table_dir, rel))
    live = out.filter(pc.not_equal(pc.fill_null(out["op"], "B"), "D")).num_rows
    return pd.DataFrame(
        [[part, live, 0, 0, 0, 0, rel, None, 0, out.num_rows, out.num_rows,
          file_zone(out)]],
        columns=STATS_COLUMNS)


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
    t = t.take(_key_sort_indices(t))
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
        [[part, out.num_rows, 0, 0, 0, max(wm, 0), rel, None, 0,
          out.num_rows, out.num_rows, file_zone(out)]],
        columns=STATS_COLUMNS)




# ---------------------------------------------------------------- change feed
def live_state_diff(ta: pa.Table, tb: pa.Table) -> pa.Table:
    """Row-level diff of two LIVE states of the same key space (the change
    data feed kernel; see ``CDCJob.read_changes``). Both inputs carry the
    key columns plus payload incl. ``lsn``. Emits one row per key whose
    winning version differs between the states:

    - ``change_type='I'``: key live only in B (insert, or un-tombstone) —
      payload is the B post-image;
    - ``change_type='U'``: live in both with a different winning ``lsn`` —
      payload is the B post-image, and the A pre-image rides in the
      ``prev_<col>`` columns (Debezium-style before-images: what makes
      attribute-dependent aggregates incrementally maintainable, see
      pipelines/views.py);
    - ``change_type='D'``: live only in A (tombstoned or compacted away) —
      payload is the A PRE-image (the reference's delete notifications also
      carry the last-known document, ChangedEntityService semantics);
      ``prev_*`` stays null (the payload already IS the before-image).

    ``lsn`` is unique per event, so "winning lsn differs" is exactly
    "a different version won" — identical payloads rewritten by a newer
    event still surface as 'U' (CDC consumers must see the version bump).
    One vectorized pandas outer merge; no per-row Python.
    """
    payload = [c for c in tb.column_names if c not in ("conv_id", "turn_idx")]
    da = ta.to_pandas()
    db = tb.to_pandas()
    # nullable Int64 BEFORE the outer merge: a plain int64 lsn would be
    # float64-coerced by the merge (NaN for one-sided keys) and lsns above
    # 2^53 could then compare equal, silently dropping U rows
    da["lsn"] = da["lsn"].astype("Int64")
    db["lsn"] = db["lsn"].astype("Int64")
    m = da.merge(db, on=["conv_id", "turn_idx"], how="outer",
                 suffixes=("_a", ""), indicator=True, sort=False)
    only_a = (m["_merge"] == "left_only").to_numpy()
    only_b = (m["_merge"] == "right_only").to_numpy()
    both = ~only_a & ~only_b
    la = m["lsn_a"].to_numpy(dtype=np.int64, na_value=-1)
    lb = m["lsn"].to_numpy(dtype=np.int64, na_value=-2)
    changed = only_a | only_b | (both & (la != lb))
    m = m[changed].reset_index(drop=True)
    only_a = only_a[changed]
    only_b = only_b[changed]
    is_u = ~only_a & ~only_b
    out = pd.DataFrame({
        "conv_id": m["conv_id"].to_numpy(),
        "turn_idx": m["turn_idx"].to_numpy().astype(np.int64),
        "change_type": np.where(only_a, "D", np.where(only_b, "I", "U")),
    })
    for c in payload:
        ca = m.get(c + "_a")
        out[c] = m[c].where(~only_a, ca) if ca is not None else m[c]
    for c in payload:  # before-images, U rows only
        ca = m.get(c + "_a")
        v = (ca.where(is_u) if ca is not None
             else m[c].where(np.zeros(len(m), bool)))
        if c == "lsn":  # already nullable Int64; keep it integral
            v = v.astype("Int64")
        out["prev_" + c] = v
    if "lsn" in out.columns:
        out["lsn"] = out["lsn"].to_numpy(dtype=np.int64, na_value=0)
    for c in ("ts", "prev_ts"):
        if c in out.columns:
            out[c] = out[c].astype("datetime64[us]")
    out = out.sort_values(["conv_id", "turn_idx"], kind="stable")
    return pa.Table.from_pandas(out, preserve_index=False)


def partition_diff(table_dir: str, base_a: str | None, deltas_a: list[str],
                   base_b: str | None, deltas_b: list[str],
                   full_schema: pa.Schema, columns: list[str],
                   policy: str = "lww",
                   out_schema: pa.Schema | None = None) -> pa.Table:
    """One partition's change feed: LWW-merge each version's committed
    files (partition-local, nothing shuffled) and diff the live states.
    Runs as one Ray task per CHANGED partition — untouched partitions are
    skipped by the manifest compare in ``read_changes`` before any task is
    submitted, so feed cost tracks the delta, not the table."""
    ta = merge_on_read(table_dir, base_a, deltas_a, full_schema, columns,
                       policy)
    tb = merge_on_read(table_dir, base_b, deltas_b, full_schema, columns,
                       policy)
    d = live_state_diff(ta, tb)
    # empty diffs infer null-typed columns from pandas; conform so every
    # per-partition task returns the one committed feed schema
    return conform_to_schema(d, out_schema) if out_schema is not None else d
