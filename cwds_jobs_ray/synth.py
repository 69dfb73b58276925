"""Deterministic synthesis of transcript base tables and WAL change segments.

Everything is generated in-process from a fixed seed (no external data), in
the spirit of the reference's Liquibase-seeded H2 test fixtures
(/root/reference/jobs-common/src/test/resources/testcases/; scenario matrix at
/root/reference/jobs-common/src/test/java/gov/ca/cwds/jobs/common/JobMainTest.java:66-189).

The generator produces:
- a base snapshot (the "initial load" state), and
- a sequence of WAL segments of change events (I/U/D) with seeded injection of
  out-of-order timestamps, duplicate redeliveries, delete-then-reinsert, a
  hot (viral) conv_id, and a mid-stream schema change (v1 segments lack the
  ``tool`` column).

LSNs are globally monotonic across segments; one LSN never spans segments
(the reference's never-split-one-timestamp batching,
/root/reference/jobs-common/src/main/java/gov/ca/cwds/jobs/common/iterator/TimestampJobBatchIterator.java:27-36).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from .schema import CHANGE_SCHEMA_V1, CHANGE_SCHEMA_V2, TRANSCRIPT_SCHEMA

ROLES = np.array(["user", "assistant", "system", "tool"])
TOOLS = np.array(["search", "python", "browser", "calc", "none"])
_WORDS = np.array(
    "plan step tool call result check answer query read write merge sort key "
    "batch stream shard lsn commit resume delta state turn reply agent think".split()
)

EPOCH_US = 1_700_000_000_000_000  # fixed origin for event timestamps (us)


@dataclass
class WalSpec:
    """Knobs for one synthesized workload."""

    seed: int = 42
    n_convs: int = 100
    turns_per_conv: int = 8          # base snapshot turns per conversation
    n_events: int = 2_000            # WAL change events
    n_segments: int = 8              # WAL parquet segment files
    frac_insert: float = 0.45        # new turns (I)
    frac_update: float = 0.40        # edits of existing turns (U)
    frac_delete: float = 0.15        # tombstones (D)
    out_of_order_frac: float = 0.10  # events whose ts is shuffled backwards
    dup_redelivery_frac: float = 0.05  # events duplicated verbatim later
    hot_key_frac: float = 0.0        # fraction of events aimed at one viral conv
    schema_v1_segments: int = 0      # first k segments written without `tool`
    text_words: int = 12             # words per text payload


def _texts(rng: np.random.Generator, n: int, words: int):
    """n random texts of `words` words — fully vectorized via Arrow
    (dictionary decode + list binary_join), no Python string loop.
    Generated in chunks so the flat word array stays under the int32
    string-offset limit (a single pa.string() array overflows past ~2 GiB
    of bytes — hit at ~25M 12-word texts); returns a ChunkedArray."""
    import pyarrow.compute as pc

    # keep each chunk's flat bytes well under 2^31 (~16 B/word upper bound)
    per_chunk = max(1, (1 << 30) // (words * 16))
    chunks = []
    for s in range(0, n, per_chunk):
        cn = min(per_chunk, n - s)
        idx = rng.integers(0, len(_WORDS), size=cn * words).astype(np.int32)
        flat = pa.DictionaryArray.from_arrays(
            pa.array(idx),
            pa.array(_WORDS.tolist(), pa.string())).cast(pa.string())
        offsets = pa.array(
            np.arange(0, (cn + 1) * words, words, dtype=np.int32))
        chunks.append(
            pc.binary_join(pa.ListArray.from_arrays(offsets, flat), " "))
    return pa.chunked_array(chunks, pa.string())


def make_base(spec: WalSpec) -> pa.Table:
    """Base snapshot: conversations c0000..; turns 0..turns_per_conv-1."""
    rng = np.random.default_rng(spec.seed)
    n = spec.n_convs * spec.turns_per_conv
    if n == 0:
        return TRANSCRIPT_SCHEMA.empty_table()
    conv = _conv_names(np.repeat(np.arange(spec.n_convs, dtype=np.int32),
                                 spec.turns_per_conv), spec.n_convs)
    turn = np.tile(np.arange(spec.turns_per_conv, dtype=np.int32), spec.n_convs)
    role = ROLES[(turn % len(ROLES))]
    tool = np.where(role == "tool", TOOLS[rng.integers(0, len(TOOLS), n)], None)
    ts = EPOCH_US + (np.arange(n, dtype=np.int64) * 1_000_000)
    return pa.Table.from_arrays(
        [
            conv,
            pa.array(turn, pa.int32()),
            pa.array(role, pa.string()),
            _texts(rng, n, spec.text_words).cast(pa.string()),
            pa.array(tool, pa.string()),
            pa.array(ts, pa.timestamp("us")),
            pa.array(np.zeros(n, dtype=np.int64), pa.int64()),  # base lsn = 0
        ],
        schema=TRANSCRIPT_SCHEMA,
    )


def _conv_names(conv_ids: np.ndarray, n_convs: int) -> pa.Array:
    """conv_id ints -> 'c%06d' strings via Arrow dictionary decode (no
    per-row Python formatting)."""
    names = pa.array([f"c{i:06d}" for i in range(n_convs)], pa.string())
    return pa.DictionaryArray.from_arrays(
        pa.array(conv_ids.astype(np.int32)), names).cast(pa.string())


def make_wal(spec: WalSpec) -> pa.Table:
    """One table of change events in LSN order (split into segments later)."""
    rng = np.random.default_rng(spec.seed + 1)
    n = spec.n_events
    if n == 0:
        return CHANGE_SCHEMA_V2.empty_table()

    p = np.array([spec.frac_insert, spec.frac_update, spec.frac_delete])
    p = p / p.sum()
    ops = rng.choice(np.array(["I", "U", "D"]), size=n, p=p)

    conv_ids = rng.integers(0, spec.n_convs, size=n)
    if spec.hot_key_frac > 0:
        hot = rng.random(n) < spec.hot_key_frac
        conv_ids[hot] = 0  # c000000 is the viral conversation
    conv = _conv_names(conv_ids, spec.n_convs)

    # I targets new turn indices beyond the base; U/D target existing ones.
    new_turn = rng.integers(spec.turns_per_conv, spec.turns_per_conv + 6, size=n)
    old_turn = rng.integers(0, spec.turns_per_conv, size=n)
    turn = np.where(ops == "I", new_turn, old_turn).astype(np.int32)

    base_ts = EPOCH_US + 10**9 + np.arange(n, dtype=np.int64) * 500_000
    # out-of-order injection: push some events' ts far backwards
    ooo = rng.random(n) < spec.out_of_order_frac
    ts = base_ts - ooo * rng.integers(1, 10**9, size=n)

    import pyarrow.compute as pc

    role = ROLES[rng.integers(0, len(ROLES), n)]
    text = _texts(rng, n, spec.text_words)
    tool = np.where(rng.random(n) < 0.3, TOOLS[rng.integers(0, len(TOOLS), n)], None)

    # deletes carry key + lsn + ts only (reference: D records carry id only,
    # /root/reference/jobs-common/.../elastic/ElasticWriter.java:77-79)
    is_d = ops == "D"
    role = np.where(is_d, None, role)
    text = pc.if_else(pa.array(is_d), pa.scalar(None, pa.string()), text)
    tool = np.where(is_d, None, tool)

    lsn = np.arange(1, n + 1, dtype=np.int64)
    tbl = pa.Table.from_arrays(
        [
            pa.array(lsn, pa.int64()),
            pa.array(ops, pa.string()),
            conv,
            pa.array(turn, pa.int32()),
            pa.array(role, pa.string()),
            text.cast(pa.string()),
            pa.array(tool, pa.string()),
            pa.array(ts, pa.timestamp("us")),
        ],
        schema=CHANGE_SCHEMA_V2,
    )

    # duplicate redelivery: re-append verbatim copies of random events (same
    # lsn/op/key/payload) — the sink must be idempotent (reference doc-id
    # overwrite, ElasticWriter.java:71-80).
    n_dup = int(n * spec.dup_redelivery_frac)
    if n_dup:
        dup_idx = rng.integers(0, n, size=n_dup)
        # take on a multi-chunk string column concatenates the chunks; past
        # ~2 GiB of text that overflows int32 offsets. Detour the text
        # column through large_string (64-bit offsets) for the gather —
        # value-identical, order-preserving — and gather in bounded slices
        # so each slice's text also stays under the int32 limit when cast
        # back (a single >2 GiB duplicate sample would otherwise just move
        # the overflow from the take to the cast).
        ti = tbl.schema.get_field_index("text")
        big = tbl.set_column(ti, pa.field("text", pa.large_string()),
                             tbl["text"].cast(pa.large_string()))
        step = 2_000_000  # ~hundreds of MB of text per slice at any words
        dups = []
        for s0 in range(0, n_dup, step):
            d = big.take(dup_idx[s0:s0 + step])
            dups.append(d.set_column(
                ti, pa.field("text", pa.string()),
                d["text"].cast(pa.string())))
        tbl = pa.concat_tables([tbl, *dups])
    return tbl


def write_wal_segments(wal: pa.Table, wal_dir: str, n_segments: int,
                       schema_v1_segments: int = 0) -> list[str]:
    """Split a WAL table into ``n_segments`` parquet files in LSN-range order.

    The first ``schema_v1_segments`` files are written WITHOUT the ``tool``
    column (schema v1) to exercise mid-stream schema evolution.
    """
    os.makedirs(wal_dir, exist_ok=True)
    n = wal.num_rows
    paths = []
    bounds = np.linspace(0, n, n_segments + 1).astype(int)
    for i in range(n_segments):
        seg = wal.slice(bounds[i], bounds[i + 1] - bounds[i])
        if i < schema_v1_segments:
            seg = seg.drop_columns(["tool"])
        path = os.path.join(wal_dir, f"segment-{i:05d}.parquet")
        pq.write_table(seg, path)
        paths.append(path)
    return paths


def load_wal(wal_dir: str) -> pa.Table:
    """Read the WAL back exactly as written (v1 segments yield null ``tool``)
    — the oracle must replay what the engine actually consumes."""
    import glob

    paths = sorted(glob.glob(os.path.join(wal_dir, "*.parquet")))
    tables = [pq.read_table(p) for p in paths]
    if not tables:
        return CHANGE_SCHEMA_V2.empty_table()
    return pa.concat_tables(tables, promote_options="permissive")


def synthesize(spec: WalSpec, out_dir: str) -> dict:
    """Write base/ and wal/ under out_dir; return paths + tables."""
    base = make_base(spec)
    wal = make_wal(spec)
    base_dir = os.path.join(out_dir, "base")
    os.makedirs(base_dir, exist_ok=True)
    base_path = os.path.join(base_dir, "base.parquet")
    # modest row groups so the initial load's row-group-ranged split tasks
    # can parallelize even over a single snapshot file
    pq.write_table(base, base_path, row_group_size=65_536)
    wal_dir = os.path.join(out_dir, "wal")
    seg_paths = write_wal_segments(
        wal, wal_dir, spec.n_segments, spec.schema_v1_segments
    )
    return {
        "base": base,
        "wal": load_wal(wal_dir) if spec.schema_v1_segments else wal,
        "base_path": base_path,
        "wal_dir": wal_dir,
        "segments": seg_paths,
    }
