"""Edit-distance-1 fuzzy self-join (symmetric-delete neighborhood).

Public algorithm (SymSpell, Garbe 2012): ``ed(a, b) <= 1`` iff the
1-deletion neighborhoods of ``a`` and ``b`` (each string plus every string
formed by deleting one character) intersect. So: every row emits
``len(s) + 1`` (key, id, s) rows keyed by a 64-bit hash of each
neighborhood member; ONE keyed exchange co-locates shared keys; candidate
pairs inside a key run are verified EXACTLY with a vectorized fixed-width
CHARACTER-matrix compare (UTF-32 codepoints, so distances match
character-level Levenshtein on any unicode input; hash collisions and the
"xy"/"yx" false-candidate class are rejected there, never emitted).

Exactly-once emission without a global pair-dedup exchange:
- ed=1, same length (substitution at position i): the only shared key
  value is delete(·, i) — one run, one emission.
- ed=1, length差 1: every shared key value IS the shorter string — one
  run (the shorter's identity entry joins the longer's deletion entries).
- ed=0 (identical strings): they share every key; pairs are emitted only
  from the run where BOTH entries are identity entries (``self`` flag) —
  exactly the one run keyed by the string itself.
Within a run, `_all_run_pairs` emits each unordered pair once, and a
(key, id) per-batch dedup removes repeated-character duplicate variants
(each id lives in exactly one batch, so that dedup is global).

Scale shape: the exchange payload is (int64 key, int64 id, string) — the
string crosses the wire len(s)+1 times (the standard SymSpell sharding
cost; the alternative, shipping ids only and joining strings back, is a
second full exchange). Deletion variants and their hashes are built with
numpy column deletes + length-masked polynomial row hashing — no per-row
Python in the emit path. The reference joins entities by exact keys only
(/root/reference/jobs-common/src/main/java/gov/ca/cwds/jobs/common/identifier/ChangedEntityIdentifier.java);
this is the fuzzy-key extension a cleaning pipeline needs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from ..stages.waves import wave_group_reduce
from .dedup import _all_run_pairs
from .joins import _int_bucket

_GOLDEN = np.uint64(0x9E3779B97F4A7C15)

_PAIR_SCHEMA = pa.schema([("id_a", pa.int64()), ("id_b", pa.int64())])


def _byte_matrix(strs_obj: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Object array of python strings -> (uint32 CHARACTER matrix padded
    with 0, char lengths). Character-level (UTF-32 codepoints), not bytes:
    Levenshtein distance is defined over characters, and a byte matrix
    would count one multi-byte substitution as distance 2 (diverging from
    the SQL oracle's levenshtein on non-ASCII data)."""
    enc = np.asarray(strs_obj, dtype=str)
    if len(enc) == 0 or enc.dtype.itemsize == 0:  # all-empty corpus
        return (np.zeros((len(enc), 1), np.uint32),
                np.zeros(len(enc), np.int64))
    L = enc.dtype.itemsize // 4
    mat = enc.view(np.uint32).reshape(len(enc), L)
    lens = np.char.str_len(enc).astype(np.int64)
    return mat, lens


_FNV_OFFSET = np.uint64(14695981039346656037)
_FNV_PRIME = np.uint64(1099511628211)
_MIX = np.uint64(0xFF51AFD7ED558CCD)


def _row_hash(mat: np.ndarray, lens: np.ndarray) -> np.ndarray:
    """64-bit hash of each row's first ``lens[i]`` characters. Canonical in the
    STRING, not the matrix: a column-wise length-masked polynomial (FNV-1a
    shape + fmix finalizer), so the same logical string hashes identically
    whatever padded width its batch or deletion pass used. Cost is one
    vectorized pass per character column — this operator targets key/name
    fields, not document bodies."""
    n = mat.shape[0]
    if n == 0:
        return np.empty(0, np.int64)
    h = np.full(n, _FNV_OFFSET)
    with np.errstate(over="ignore"):
        for j in range(mat.shape[1]):
            active = j < lens
            if not active.any():
                break
            hj = (h ^ mat[:, j].astype(np.uint64)) * _FNV_PRIME
            h = np.where(active, hj, h)
        h ^= lens.astype(np.uint64) * _GOLDEN
        h ^= h >> np.uint64(33)
        h *= _MIX
        h ^= h >> np.uint64(33)
    return h.view(np.int64)


def _drop_null_strings(t: pa.Table, str_col: str) -> pa.Table:
    """SQL null semantics: levenshtein(NULL, x) is NULL -> excluded, so
    null strings emit no neighborhood rows (np.asarray(dtype=str) would
    otherwise turn None into the literal 'None' and pair it)."""
    if t.num_rows:
        t = t.filter(t[str_col].combine_chunks().is_valid())
    return t


def _del_variant_key(mat: np.ndarray, lens: np.ndarray, alive: np.ndarray,
                     drop, n_del: int) -> np.ndarray:
    """Length-salted hash keys for one deletion-variant shape: rows
    ``alive`` with column(s) ``drop`` removed (zeros fallback keeps the
    empty variant hashable)."""
    var = np.delete(mat[alive], drop, axis=1)
    if var.shape[1] == 0:
        var = np.zeros((len(alive), 1), np.uint32)
    return _row_hash(var, lens[alive] - n_del)


def _emit_neighborhood(t: pa.Table, id_col: str, str_col: str,
                       nb: int) -> pa.Table:
    """One block -> (key, id, s, self, _bucket) rows: the identity entry
    plus one entry per 1-deletion variant, (key, id)-deduped."""
    t = _drop_null_strings(t, str_col)
    if t.num_rows == 0:
        return pa.schema([("key", pa.int64()), ("id", pa.int64()),
                          ("s", pa.string()), ("self", pa.bool_()),
                          ("_bucket", pa.int64())]).empty_table()
    ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    strs = t[str_col].to_numpy(zero_copy_only=False)
    mat, lens = _byte_matrix(strs)
    keys = [_row_hash(mat, lens)]
    row_ix = [np.arange(len(ids), dtype=np.int64)]
    selfs = [np.ones(len(ids), bool)]
    for p in range(mat.shape[1]):
        alive = np.flatnonzero(lens > p)
        if not len(alive):
            break
        keys.append(_del_variant_key(mat, lens, alive, p, 1))
        row_ix.append(alive)
        selfs.append(np.zeros(len(alive), bool))
    key = np.concatenate(keys)
    ix = np.concatenate(row_ix)
    is_self = np.concatenate(selfs)
    # repeated characters produce identical variants: dedup (key, id)
    order = np.lexsort((key, ids[ix]))
    key, ix, is_self = key[order], ix[order], is_self[order]
    keep = np.r_[True, (key[1:] != key[:-1]) | (ids[ix][1:] != ids[ix][:-1])]
    # identity entries sort before/after arbitrarily; keep the self flag if
    # ANY duplicate carried it (a 1-char string's deletion "" never equals
    # its identity key because of the length salt)
    grp = np.cumsum(keep) - 1
    self_any = np.zeros(int(grp[-1]) + 1 if len(grp) else 0, bool)
    np.logical_or.at(self_any, grp, is_self)
    key, ix = key[keep], ix[keep]
    return pa.table({
        "key": pa.array(key),
        "id": pa.array(ids[ix]),
        "s": pa.array(np.asarray(strs)[ix].tolist(), pa.string()),
        "self": pa.array(self_any),
        "_bucket": pa.array(_int_bucket(key, nb)),
    })


def _ed1_mask(sa: np.ndarray, sb: np.ndarray) -> np.ndarray:
    """Vectorized exact check ed(sa[i], sb[i]) <= 1 for string pairs that
    share a deletion key (so only the substitution / single-delete shapes
    need deciding; everything else is a hash-collision reject)."""
    n = len(sa)
    if n == 0:
        return np.zeros(0, bool)
    ma, la = _byte_matrix(sa)
    mb, lb = _byte_matrix(sb)
    L = max(ma.shape[1], mb.shape[1])
    if ma.shape[1] < L:
        ma = np.pad(ma, ((0, 0), (0, L - ma.shape[1])))
    if mb.shape[1] < L:
        mb = np.pad(mb, ((0, 0), (0, L - mb.shape[1])))
    out = np.zeros(n, bool)
    neq = ma != mb
    nmis = neq.sum(axis=1)
    same_len = la == lb
    out[same_len & (nmis <= 1)] = True
    # |len diff| == 1: longer with the char at its FIRST mismatch deleted
    # must equal the shorter (padding keeps trailing bytes comparable)
    diff1 = np.abs(la - lb) == 1
    if diff1.any():
        d = np.flatnonzero(diff1)
        swap = la[d] < lb[d]
        lng = np.where(swap[:, None], mb[d], ma[d])
        sht = np.where(swap[:, None], ma[d], mb[d])
        lens_s = np.minimum(la[d], lb[d])
        fm = np.argmax(lng != sht, axis=1)  # 0 if all-equal: still correct
        all_eq = ~(lng != sht).any(axis=1)
        fm = np.where(all_eq, lens_s, fm)
        idx = np.arange(L - 1)[None, :] + (np.arange(L - 1)[None, :]
                                           >= fm[:, None])
        deleted = np.take_along_axis(lng, idx, axis=1)
        ok = (deleted == sht[:, :L - 1]).all(axis=1)
        out[d] = ok
    return out


def _reduce_bucket(t: pa.Table) -> pa.Table:
    if t.num_rows == 0:
        return _PAIR_SCHEMA.empty_table()
    df = t.to_pandas().sort_values("key", kind="stable")
    key = df["key"].to_numpy()
    new = np.r_[True, key[1:] != key[:-1]]
    starts = np.flatnonzero(new)
    lens = np.diff(np.r_[starts, len(key)])
    ia, ib = _all_run_pairs(starts.astype(np.int64), lens.astype(np.int64),
                            len(key))
    if len(ia) == 0:
        return _PAIR_SCHEMA.empty_table()
    ids = df["id"].to_numpy()
    strs = df["s"].to_numpy()
    slf = df["self"].to_numpy()
    sa, sb = strs[ia], strs[ib]
    same = sa == sb
    # identical strings emit ONLY from their identity run (exactly-once)
    keep = ~same | (slf[ia] & slf[ib])
    keep &= ids[ia] != ids[ib]
    ia, ib, sa, sb = ia[keep], ib[keep], sa[keep], sb[keep]
    ok = np.ones(len(ia), bool)
    chk = np.flatnonzero(sa != sb)
    if len(chk):
        ok[chk] = _ed1_mask(sa[chk], sb[chk])
    a, b = ids[ia[ok]], ids[ib[ok]]
    lo, hi = np.minimum(a, b), np.maximum(a, b)
    # within-run uniqueness is structural; the drop_duplicates guards runs
    # merged by a 64-bit hash collision
    df2 = pd.DataFrame({"id_a": lo, "id_b": hi}).drop_duplicates()
    return pa.table({"id_a": pa.array(df2["id_a"].to_numpy(), pa.int64()),
                     "id_b": pa.array(df2["id_b"].to_numpy(), pa.int64())})


def _lev_le_mask(sa: np.ndarray, sb: np.ndarray, dmax: int) -> np.ndarray:
    """Vectorized exact check ed(sa[i], sb[i]) <= dmax across all pairs at
    once: Ukkonen-banded Levenshtein DP (band half-width dmax, so each DP
    row is a (n_pairs, 2*dmax+1) slab), all transitions numpy. Values are
    clipped at dmax+1 — anything past the band is 'too far' and the clip
    keeps the int16 arithmetic exact. O(Lmax * (2*dmax+1)) vectorized ops
    regardless of pair count."""
    n = len(sa)
    if n == 0:
        return np.zeros(0, bool)
    ma, la = _byte_matrix(sa)
    mb, lb = _byte_matrix(sb)
    INF = np.int16(dmax + 1)
    W = 2 * dmax + 1
    res = np.full(n, INF, np.int16)
    dp = np.full((n, W), INF, np.int16)
    for o in range(dmax, W):
        j = o - dmax                     # row i=0: dp[0, j] = j
        dp[:, o] = np.where(j <= lb, np.int16(min(j, int(INF))), INF)
    sel = la == 0
    if sel.any():
        res[sel] = np.minimum(lb[sel], int(INF)).astype(np.int16)
    Lmax = int(la.max()) if n else 0
    La, Lb = ma.shape[1], mb.shape[1]
    zeros_a = np.zeros(n, ma.dtype)
    for i in range(1, Lmax + 1):
        ai = ma[:, i - 1] if i - 1 < La else zeros_a
        new = np.full((n, W), INF, np.int16)
        for o in range(W):
            j = i + o - dmax
            if j < 0:
                continue
            if j == 0:                   # dp[i, 0] = i (deletions only)
                new[:, o] = np.int16(min(i, int(INF)))
                continue
            bj = mb[:, j - 1] if j - 1 < Lb else zeros_a
            v = dp[:, o] + (ai != bj)               # diag dp[i-1, j-1]
            if o + 1 < W:
                v = np.minimum(v, dp[:, o + 1] + 1)  # up dp[i-1, j]
            if o - 1 >= 0:
                v = np.minimum(v, new[:, o - 1] + 1)  # left dp[i, j-1]
            np.minimum(v, INF, out=v)
            new[:, o] = np.where(j <= lb, v, INF)
        dp = new
        sel = la == i
        if sel.any():
            idx = np.flatnonzero(sel)
            o = lb[idx] - i + dmax
            val = np.full(len(idx), INF, np.int16)
            inb = (o >= 0) & (o < W)
            val[inb] = dp[idx[inb], o[inb]]
            res[idx] = val
    return res <= dmax


def _emit_neighborhood2(t: pa.Table, id_col: str, str_col: str,
                        nb: int) -> pa.Table:
    """One block -> (key, id, s, _bucket) rows for ed<=2: identity entry
    plus every 1-deletion and 2-deletion variant, (key, id)-deduped. No
    ownership flags — exactly-once is enforced by the downstream pair-bucket
    dedup wave (the per-shape ownership argument that makes ed1 single-pass
    does not generalize to two edits)."""
    t = _drop_null_strings(t, str_col)
    if t.num_rows == 0:
        return pa.schema([("key", pa.int64()), ("id", pa.int64()),
                          ("s", pa.string()),
                          ("_bucket", pa.int64())]).empty_table()
    ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    strs = t[str_col].to_numpy(zero_copy_only=False)
    mat, lens = _byte_matrix(strs)
    keys = [_row_hash(mat, lens)]
    row_ix = [np.arange(len(ids), dtype=np.int64)]
    Lmax = mat.shape[1]
    for p in range(Lmax):                       # 1-deletion variants
        alive = np.flatnonzero(lens > p)
        if not len(alive):
            break
        keys.append(_del_variant_key(mat, lens, alive, p, 1))
        row_ix.append(alive)
    for p in range(Lmax):                       # 2-deletion variants
        for q in range(p + 1, Lmax):
            alive = np.flatnonzero(lens > q)
            if not len(alive):
                break
            keys.append(_del_variant_key(mat, lens, alive, [p, q], 2))
            row_ix.append(alive)
    key = np.concatenate(keys)
    ix = np.concatenate(row_ix)
    order = np.lexsort((key, ids[ix]))
    key, ix = key[order], ix[order]
    keep = np.r_[True, (key[1:] != key[:-1]) | (ids[ix][1:] != ids[ix][:-1])]
    key, ix = key[keep], ix[keep]
    return pa.table({
        "key": pa.array(key),
        "id": pa.array(ids[ix]),
        "s": pa.array(np.asarray(strs)[ix].tolist(), pa.string()),
        "_bucket": pa.array(_int_bucket(key, nb)),
    })


def _verify_bucket_ed2(nb2: int, t: pa.Table) -> pa.Table:
    """Per key bucket: candidate pairs from key runs, locally deduped, then
    EXACT banded-Levenshtein verify; emits verified int pairs partitioned
    by pair-bucket hash for the global dedup wave."""
    empty = pa.schema([("id_a", pa.int64()), ("id_b", pa.int64()),
                       ("_pbucket", pa.int64())]).empty_table()
    if t.num_rows == 0:
        return empty
    df = t.to_pandas().sort_values("key", kind="stable")
    key = df["key"].to_numpy()
    new = np.r_[True, key[1:] != key[:-1]]
    starts = np.flatnonzero(new)
    lens = np.diff(np.r_[starts, len(key)])
    ia, ib = _all_run_pairs(starts.astype(np.int64), lens.astype(np.int64),
                            len(key))
    if len(ia) == 0:
        return empty
    ids = df["id"].to_numpy()
    keep = ids[ia] != ids[ib]
    ia, ib = ia[keep], ib[keep]
    if not len(ia):
        return empty
    # local pre-dedup: the same pair reachable through several shared keys
    # in THIS bucket verifies once (global dedup is the pair wave's job)
    lo = np.minimum(ids[ia], ids[ib])
    hi = np.maximum(ids[ia], ids[ib])
    first = pd.DataFrame({"lo": lo, "hi": hi}).groupby(
        ["lo", "hi"], sort=False).head(1).index.to_numpy()
    ia, ib, lo, hi = ia[first], ib[first], lo[first], hi[first]
    strs = df["s"].to_numpy()
    ok = _lev_le_mask(strs[ia], strs[ib], 2)
    lo, hi = lo[ok], hi[ok]
    from .dedup import _pair_bucket
    return pa.table({"id_a": pa.array(lo, pa.int64()),
                     "id_b": pa.array(hi, pa.int64()),
                     "_pbucket": pa.array(_pair_bucket(lo, hi, nb2))})


def _dedup_pairs_bucket(t: pa.Table) -> pa.Table:
    if t.num_rows == 0:
        return _PAIR_SCHEMA.empty_table()
    from .dedup import _unique_pairs
    a, b = _unique_pairs(t["id_a"].to_numpy(zero_copy_only=False),
                         t["id_b"].to_numpy(zero_copy_only=False))
    return pa.table({"id_a": pa.array(a, pa.int64()),
                     "id_b": pa.array(b, pa.int64())})


def edit2_pairs(ds: ray.data.Dataset, id_col: str, str_col: str,
                n_buckets: int | None = None) -> ray.data.Dataset:
    """All unordered id pairs whose strings are within Levenshtein
    distance 2 (including exact duplicates), each pair exactly once.

    SymSpell with 2-deletion neighborhoods: ed(a,b) <= 2 implies the
    <=2-deletion neighborhoods intersect, so shared-key runs contain every
    true pair; the banded-DP verify rejects the false candidates exactly.
    Exchange payload is the string x (1 + L + L(L-1)/2) neighborhood rows —
    the standard SymSpell sharding cost, quadratic in the KEY length, so
    this operator targets name/key fields, not document bodies. Verified
    pairs then cross ONE int-only pair-bucket wave for global dedup
    (a pair can be found under many shared keys)."""
    from .dedup import default_n_buckets
    nb = n_buckets or default_n_buckets()

    def emit(t: pa.Table) -> pa.Table:
        return _emit_neighborhood2(t, id_col, str_col, nb)

    rows = ds.map_batches(emit, batch_format="pyarrow", batch_size=65536)
    cand = wave_group_reduce(rows, "_bucket", nb,
                             lambda t: _verify_bucket_ed2(nb, t))
    return wave_group_reduce(cand, "_pbucket", nb, _dedup_pairs_bucket)


def edit1_pairs(ds: ray.data.Dataset, id_col: str, str_col: str,
                n_buckets: int | None = None) -> ray.data.Dataset:
    """All unordered id pairs whose strings are within Levenshtein
    distance 1 (including exact duplicates), each pair exactly once.

    Pass ``n_buckets`` data-sized (e.g. from the source's parquet footer
    row count) — the exchange carries each string len+1 times, so buckets
    should track data volume, not CPU count."""
    from .dedup import default_n_buckets
    nb = n_buckets or default_n_buckets()

    def emit(t: pa.Table) -> pa.Table:
        return _emit_neighborhood(t, id_col, str_col, nb)

    rows = ds.map_batches(emit, batch_format="pyarrow", batch_size=65536)
    return wave_group_reduce(rows, "_bucket", nb, _reduce_bucket)
