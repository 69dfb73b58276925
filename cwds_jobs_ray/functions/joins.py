"""Large-large joins the Dataset API lacks, built from keyed bucket shuffles.

``bucketed_asof_join`` is the two-large-sides as-of join: both sides hash
their BY-key into the same bucket space, rows co-locate via one keyed
groupby shuffle, and each bucket runs one vectorized ``pd.merge_asof``.
Partitioning assumption (document per SURVEY §4.2): every row of one BY-key
lands in exactly one bucket, so an as-of match can never span buckets.

For a genuinely small right side, prefer the broadcast variant (one
``ray.put``, per-batch merge_asof) — same semantics, no shuffle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from ..schema import from_pandas as _pa_from_pandas

_GOLDEN = np.uint64(0x9E3779B97F4A7C15)


def _int_bucket(arr: np.ndarray, n_buckets: int) -> np.ndarray:
    with np.errstate(over="ignore"):
        h = arr.astype(np.int64).view(np.uint64) * _GOLDEN
        h ^= h >> np.uint64(29)
        return (h % np.uint64(n_buckets)).astype(np.int64)


def bucketed_asof_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    left_by: str,
    right_by: str,
    left_on: str,
    right_on: str,
    n_buckets: int = 32,
    right_tiebreak: list[str] | None = None,
) -> ray.data.Dataset:
    """As-of join (backward: latest right row with on <= left on, per key)
    for two LARGE sides — neither is broadcast or driver-materialized.

    Ties on ``right_on`` resolve to the greatest ``right_tiebreak`` value
    (merge_asof keeps the last equal-on row of the sorted right frame) —
    pass it explicitly so results don't depend on shuffle arrival order.

    Output: matched left rows with the right side's columns appended.
    """
    lschema = left.schema()
    rschema = right.schema()
    lcols = list(lschema.names)
    rcols = list(rschema.names)
    overlap = set(lcols) & set(rcols)
    if overlap:
        raise ValueError(f"column collision across sides: {sorted(overlap)}")
    ltypes = dict(zip(lschema.names, lschema.types))
    rtypes = dict(zip(rschema.names, rschema.types))
    combined = pa.schema(
        [("bucket", pa.int64()), ("side", pa.int8())]
        + [(c, ltypes[c]) for c in lcols]
        + [(c, rtypes[c]) for c in rcols])

    def tag(side: int, by: str):
        def fn(t: pa.Table) -> pa.Table:
            n = t.num_rows
            bucket = _int_bucket(t[by].to_numpy(zero_copy_only=False),
                                 n_buckets)
            cols = [pa.array(bucket), pa.array(np.full(n, side, np.int8))]
            for f in combined:
                if f.name in ("bucket", "side"):
                    continue
                cols.append(t[f.name] if f.name in t.column_names
                            else pa.nulls(n, f.type))
            return pa.Table.from_arrays(cols, schema=combined)
        return fn

    both = (left.map_batches(tag(0, left_by), batch_format="pyarrow")
            .union(right.map_batches(tag(1, right_by), batch_format="pyarrow")))

    rsort = [right_on] + list(right_tiebreak or [])
    out_schema = pa.schema([(c, ltypes[c]) for c in lcols]
                           + [(c, rtypes[c]) for c in rcols])

    def asof_bucket(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        l = df[df["side"] == 0][lcols].sort_values(left_on, kind="stable")
        r = df[df["side"] == 1][rcols].sort_values(rsort, kind="stable")
        if l.empty or r.empty:
            return out_schema.empty_table()
        out = pd.merge_asof(l, r, left_on=left_on, right_on=right_on,
                            left_by=left_by, right_by=right_by,
                            direction="backward")
        return _pa_from_pandas(out.dropna(subset=[right_by]),
                                    preserve_index=False)

    from ..stages.waves import wave_group_reduce

    return wave_group_reduce(both, "bucket", n_buckets, asof_bucket)
