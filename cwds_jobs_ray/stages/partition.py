"""Deterministic key -> partition routing shared by engine, oracle and tests.

The partition count P is fixed and recorded in the manifest so base files
align run-to-run (SURVEY.md §4.2). ``turn_idx`` never participates: all turns
of a conversation live in one partition.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def partition_ids(conv_ids, num_partitions: int) -> np.ndarray:
    """Vectorized, process-stable hash partition of string conv_ids.

    Uses pandas' SipHash-based ``hash_array`` (C implementation, fixed default
    hash key) — deterministic across processes/nodes, unlike Python's
    randomized ``hash``.
    """
    if isinstance(conv_ids, (pa.Array, pa.ChunkedArray)):
        conv_ids = conv_ids.to_numpy(zero_copy_only=False)
    arr = np.asarray(conv_ids, dtype=object)
    h = pd.util.hash_array(arr, categorize=True)
    return (h % np.uint64(num_partitions)).astype(np.int64)


def add_partition_column(batch: pa.Table, num_partitions: int,
                         col: str = "part") -> pa.Table:
    return batch.append_column(
        col, pa.array(partition_ids(batch["conv_id"], num_partitions), pa.int64())
    )
