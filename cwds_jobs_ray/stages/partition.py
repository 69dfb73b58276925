"""Deterministic key -> partition routing shared by engine, oracle and tests.

The partition count P is fixed and recorded in the manifest so base files
align run-to-run (SURVEY.md §4.2). ``turn_idx`` never participates: all turns
of a conversation live in one partition.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def hash_strings(arr: pa.Array) -> np.ndarray:
    """Seeded, process-stable 64-bit hash of a string array (polars xxhash
    on the native buffer — no Python objects)."""
    import polars as pl

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    return pl.Series("k", arr).hash(seed=42).to_numpy()


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
