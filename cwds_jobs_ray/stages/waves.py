"""Direct bucket-exchange group reduce — the wave-form replacement for
``Dataset.groupby(bucket).map_groups(fn)``.

Measured rationale (BASELINE.md round 3): a Ray Data groupby sort-shuffle
costs ~1-1.5 s of FIXED setup per stage at 32 CPUs regardless of payload —
pure overhead for the catalog's keyed finals, whose inputs are pre-reduced
partial rows. This helper exchanges per-bucket slices with the same direct
``num_returns``-sliced task waves the CDC shuffle uses (stages/merge.py,
measured ~10x cheaper at this shape): one split task per input block, one
reduce task per bucket. Datasets remain the API boundary.

Semantics match ``groupby(bucket_col).map_groups``: every row with the same
``bucket_col`` value reaches exactly one reduce call, which sees ALL of that
bucket's rows concatenated (callers put whole keys in one bucket, so
per-bucket reduces are per-key-complete). Empty buckets reduce over a typed
empty table (schema preserved through the split), so reducers written for
pandas/pyarrow just produce zero rows.
"""

from __future__ import annotations

from collections.abc import Callable

import numpy as np
import pyarrow as pa
import ray
import ray.data


def _split_block(block: pa.Table, col: str, nb: int):
    if block.num_rows == 0 and col not in block.column_names:
        # schema-less empty block from an upstream map_groups: no typed
        # schema to preserve; reduce tasks skip zero-column tables
        out = [pa.table({})] * nb
    else:
        b = block[col].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(b, kind="stable")
        bounds = np.searchsorted(b[order], np.arange(nb + 1))
        body = block.drop_columns([col])
        out = [body.take(pa.array(order[bounds[j]:bounds[j + 1]]))
               for j in range(nb)]
    # with num_returns=1 Ray treats the whole return value as the single
    # output, so a 1-bucket split must return the table itself, not [table]
    return out if nb > 1 else out[0]


def _reduce_bucket(reduce_fn: Callable[[pa.Table], pa.Table],
                   *slices: pa.Table) -> pa.Table:
    typed = [s for s in slices if s.num_columns]
    if not typed:
        return pa.table({})
    parts = [s for s in typed if s.num_rows]
    t = pa.concat_tables(parts, promote_options="permissive") if parts \
        else typed[0]
    return reduce_fn(t)


def wave_group_reduce(ds: ray.data.Dataset, bucket_col: str, nb: int,
                      reduce_fn: Callable[[pa.Table], pa.Table],
                      ) -> ray.data.Dataset:
    """groupby(bucket_col).map_groups(reduce_fn) over direct task waves.

    ``reduce_fn``: pa.Table (bucket's rows, WITHOUT the bucket column) ->
    pa.Table. Must handle a typed empty input (empty buckets exist). The
    input Dataset is materialized once (its blocks get the same spillable
    object-store lifetime a sort-shuffle's map outputs would have).
    """
    blocks = ds.materialize().to_arrow_refs()
    if not blocks:
        return ray.data.from_arrow(pa.table({}))
    split_t = ray.remote(num_returns=nb)(_split_block)
    red_t = ray.remote(_reduce_bucket)
    slices = [split_t.remote(b, bucket_col, nb) for b in blocks]
    if nb == 1:
        slices = [[r] for r in slices]
    return ray.data.from_arrow_refs(
        [red_t.remote(reduce_fn, *[s[j] for s in slices])
         for j in range(nb)])
