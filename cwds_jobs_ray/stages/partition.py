"""Deterministic key -> partition routing shared by engine, oracle and tests.

The partition count P is fixed and recorded in the manifest so base files
align run-to-run (SURVEY.md §4.2). ``turn_idx`` never participates: all turns
of a conversation live in one partition.

The hash itself is an IN-REPO, version-pinned FNV-1a64 + murmur fmix64
finalizer over the utf8 bytes: key->partition routing is persisted in
committed base files and must match forever, so it cannot depend on any
library whose hash output may change across releases. The algorithm id
(``HASH_ALGO``) is recorded in the manifest and checked on load.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

# Bump ONLY with a table-migration story: committed partition files encode
# this routing. Manifest.load fails fast on mismatch.
HASH_ALGO = "fnv1a64-fmix-v1"

_FNV_OFFSET = np.uint64(0xCBF29CE484222325)
_FNV_PRIME = np.uint64(0x100000001B3)
_FMIX_C1 = np.uint64(0xFF51AFD7ED558CCD)
_FMIX_C2 = np.uint64(0xC4CEB9FE1A85EC53)
_S33 = np.uint64(33)


def hash_strings(arr: pa.Array) -> np.ndarray:
    """Self-contained, version-pinned 64-bit hash of a string array.

    Vectorized FNV-1a over the raw utf8 buffer (one numpy pass per byte
    position — O(total_bytes) work, no per-row Python), finished with the
    murmur3 fmix64 avalanche so low bits (used by ``% num_partitions``) are
    well mixed even for keys sharing long prefixes like ``c0012...``.
    """
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    n = len(arr)
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    if pa.types.is_large_string(arr.type) or pa.types.is_large_binary(arr.type):
        off_dtype = np.int64
    else:
        off_dtype = np.int32
    bufs = arr.buffers()
    offsets = np.frombuffer(bufs[1], dtype=off_dtype,
                            count=arr.offset + n + 1)[arr.offset:]
    starts = offsets[:-1].astype(np.int64)
    lens = (offsets[1:].astype(np.int64) - starts)
    data = (np.frombuffer(bufs[2], dtype=np.uint8)
            if bufs[2] is not None else np.empty(0, np.uint8))

    h = np.full(n, _FNV_OFFSET, dtype=np.uint64)
    maxlen = int(lens.max())
    with np.errstate(over="ignore"):
        for j in range(maxlen):
            alive = lens > j
            if alive.all():
                b = data[starts + j].astype(np.uint64)
                h = (h ^ b) * _FNV_PRIME
            else:
                idx = np.nonzero(alive)[0]
                b = data[starts[idx] + j].astype(np.uint64)
                h[idx] = (h[idx] ^ b) * _FNV_PRIME
        # fmix64 finalizer (murmur3) — avalanche into the low bits
        h ^= h >> _S33
        h *= _FMIX_C1
        h ^= h >> _S33
        h *= _FMIX_C2
        h ^= h >> _S33
    return h


def dict_encode(conv_ids) -> tuple[np.ndarray, pa.Array]:
    """(codes, unique_values) via Arrow dictionary encoding — one C++ pass
    over the strings; everything downstream works on ints."""
    import pyarrow.compute as pc

    if isinstance(conv_ids, pa.ChunkedArray):
        conv_ids = conv_ids.combine_chunks()
    enc = pc.dictionary_encode(conv_ids)
    if isinstance(enc, pa.ChunkedArray):
        enc = enc.combine_chunks()
    return enc.indices.to_numpy(zero_copy_only=False).astype(np.int64), enc.dictionary


def partition_ids(conv_ids, num_partitions: int) -> np.ndarray:
    """Vectorized, process-stable hash partition of string conv_ids.

    Hashes only the DISTINCT values (via dictionary encoding), then maps
    codes -> partition — the string buffer is traversed once regardless of
    duplication factor.
    """
    codes, uniq = dict_encode(conv_ids)
    part_u = (hash_strings(uniq) % np.uint64(num_partitions)).astype(np.int64)
    return part_u[codes]


def add_partition_column(batch: pa.Table, num_partitions: int,
                         col: str = "part") -> pa.Table:
    return batch.append_column(
        col, pa.array(partition_ids(batch["conv_id"], num_partitions), pa.int64())
    )
