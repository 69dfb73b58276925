"""Large-large joins the Dataset API lacks, built from keyed bucket shuffles.

``bucketed_asof_join`` is the two-large-sides as-of join: both sides hash
their BY-key into the same bucket space, rows co-locate via one keyed
groupby shuffle, and each bucket runs one vectorized ``pd.merge_asof``.
Partitioning assumption (document per SURVEY §4.2): every row of one BY-key
lands in exactly one bucket, so an as-of match can never span buckets.

``bucketed_range_join`` is the keyed BAND (interval) join — every (l, r)
pair with equal keys and ``r.on`` inside ``[l.on + lo, l.on + hi]`` — via
the same single bucket shuffle and a fully vectorized lexsort-rank kernel
per bucket (no per-row or per-key Python loop, no per-key cross product).

For a genuinely small right side, prefer the broadcast variant (one
``ray.put``, per-batch merge_asof) — same semantics, no shuffle.
"""

from __future__ import annotations

import os

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

# Per-bucket output-pair ceiling for the range join (env override
# CWDS_RANGE_JOIN_CAP): a band join's output is data-determined — a hot key
# with k rows inside one window intrinsically yields O(k^2) pairs — so the
# guard turns a silent memory blowup into an actionable error, same policy
# as the LSH run cap (dedup._RUN_PAIR_CAP).
_RANGE_PAIR_CAP = int(os.environ.get("CWDS_RANGE_JOIN_CAP", 50_000_000))


def _on_int64(arr: np.ndarray) -> np.ndarray:
    """ON-column values as comparable int64 (timestamps -> epoch units)."""
    if np.issubdtype(arr.dtype, np.datetime64):
        return arr.view("i8")
    return arr.astype(np.int64)


def _lex_rank(r_code: np.ndarray, r_on: np.ndarray, q_code: np.ndarray,
              q_on: np.ndarray, count_equal: bool) -> np.ndarray:
    """For each query (q_code, q_on): how many right rows sort
    lexicographically before it (plus ties when ``count_equal``) — i.e. the
    query's insertion index in the (code, on)-sorted right array. One
    lexsort over the concatenation; no per-key segmentation needed because
    rows of other codes count wholesale and cancel in hi-lo."""
    nr = len(r_code)
    code = np.concatenate([r_code, q_code])
    on = np.concatenate([r_on, q_on])
    # tie-break: queries AFTER equal right rows to count them, BEFORE to not
    qflag = 1 if count_equal else 0
    flag = np.concatenate([np.full(nr, 1 - qflag, np.int8),
                           np.full(len(q_code), qflag, np.int8)])
    order = np.lexsort((flag, on, code))
    is_r = order < nr
    cum_excl = np.cumsum(is_r) - is_r  # right rows strictly before each pos
    ranks = np.empty(len(q_code), dtype=np.int64)
    qpos = np.flatnonzero(~is_r)
    ranks[order[qpos] - nr] = cum_excl[qpos]
    return ranks


def bucketed_range_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    left_by: str,
    right_by: str,
    left_on: str,
    right_on: str,
    lo: int,
    hi: int,
    n_buckets: int = 32,
    lo_inclusive: bool = True,
    hi_inclusive: bool = True,
) -> ray.data.Dataset:
    """Keyed band join for two LARGE sides: every pair with
    ``l[left_by] == r[right_by]`` and ``r[right_on]`` within
    ``[l[left_on]+lo, l[left_on]+hi]`` (bounds open where ``*_inclusive``
    is False). ``lo``/``hi`` are int64 offsets in the ON column's physical
    units (microseconds for ``timestamp[us]``).

    Shape: both sides hash the BY-key into one shared bucket space (one
    keyed shuffle, neither side broadcast or driver-materialized); each
    bucket sorts its right rows by (key, on) once, computes every left
    row's [lo_idx, hi_idx) match window with two lexsort-rank passes, and
    emits the pairs with one repeat/arange expansion — O((nl+nr) log) per
    bucket, never a per-key cross product. The reference engine has no band
    join; this is the range-join member of the custom-operator family
    (SURVEY §2 custom joins) built on the asof join's partitioning
    assumption: one BY-key never spans buckets.
    """
    lschema, rschema = left.schema(), right.schema()
    lcols, rcols = list(lschema.names), list(rschema.names)
    overlap = set(lcols) & set(rcols)
    if overlap:
        raise ValueError(f"column collision across sides: {sorted(overlap)}")
    ltypes = dict(zip(lschema.names, lschema.types))
    rtypes = dict(zip(rschema.names, rschema.types))
    combined = pa.schema(
        [("bucket", pa.int64()), ("side", pa.int8())]
        + [(c, ltypes[c]) for c in lcols]
        + [(c, rtypes[c]) for c in rcols])
    out_schema = pa.schema([(c, ltypes[c]) for c in lcols]
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
            .union(right.map_batches(tag(1, right_by),
                                     batch_format="pyarrow")))

    def band_bucket(t: pa.Table) -> pa.Table:
        side = t["side"].to_numpy(zero_copy_only=False)
        lmask, rmask = side == 0, side == 1
        if not lmask.any() or not rmask.any():
            return out_schema.empty_table()
        lt = t.filter(pa.array(lmask)).select(lcols)
        rt = t.filter(pa.array(rmask)).select(rcols)
        # shared key codes across both sides (keys can be any dtype)
        lby = lt[left_by].to_numpy(zero_copy_only=False)
        rby = rt[right_by].to_numpy(zero_copy_only=False)
        codes, _ = pd.factorize(np.concatenate([lby, rby]), sort=False)
        l_code, r_code = codes[:len(lby)], codes[len(lby):]
        l_on = _on_int64(lt[left_on].to_numpy(zero_copy_only=False))
        r_on = _on_int64(rt[right_on].to_numpy(zero_copy_only=False))
        rorder = np.lexsort((r_on, r_code))
        r_code_s, r_on_s = r_code[rorder], r_on[rorder]
        lo_idx = _lex_rank(r_code_s, r_on_s, l_code, l_on + lo,
                           count_equal=not lo_inclusive)
        hi_idx = _lex_rank(r_code_s, r_on_s, l_code, l_on + hi,
                           count_equal=hi_inclusive)
        cnt = np.maximum(hi_idx - lo_idx, 0)
        total = int(cnt.sum())
        if total > _RANGE_PAIR_CAP:
            raise RuntimeError(
                f"range join bucket would emit {total} pairs (cap "
                f"{_RANGE_PAIR_CAP}, env CWDS_RANGE_JOIN_CAP): a hot key "
                "holds too many rows inside one band window — narrow the "
                "band or pre-aggregate the hot keys")
        if total == 0:
            return out_schema.empty_table()
        li = np.repeat(np.arange(len(cnt)), cnt)
        ri = (np.arange(total) - np.repeat(np.cumsum(cnt) - cnt, cnt)
              + np.repeat(lo_idx, cnt))
        lout = lt.take(pa.array(li))
        rout = rt.take(pa.array(rorder[ri]))
        return pa.Table.from_arrays(list(lout.columns) + list(rout.columns),
                                    schema=out_schema)

    from ..stages.waves import wave_group_reduce

    return wave_group_reduce(both, "bucket", n_buckets, band_bucket)
