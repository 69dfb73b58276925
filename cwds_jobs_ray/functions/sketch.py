"""Mergeable sketches: HyperLogLog distinct count, Misra-Gries heavy
hitters, Bloom membership filters.

The classic distributed-sketch shape (public algorithm: Flajolet et al.,
"HyperLogLog: the analysis of a near-optimal cardinality estimation
algorithm", AMS 2007): each block folds its values into an M-register
sketch, registers merge by elementwise MAX (commutative + idempotent, so
the estimate is independent of partitioning, block order and retries), and
one tiny final turns registers into the estimate. This is the pattern for
any mergeable-state aggregate at 100 TB: the shuffle carries M bytes per
block regardless of input size.

Determinism contract: the value hash is the pinned fmix64 finalizer over
the raw int64 (same constants as stages/partition.py), so an independent
naive implementation produces bit-identical registers — the golden-oracle
hook (__ray_entry__._golden_oracle_sqls uses exactly that).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

HLL_P = 10               # 2^10 = 1024 registers; ~3.2% standard error
HLL_M = 1 << HLL_P

_C1 = np.uint64(0xFF51AFD7ED558CCD)
_C2 = np.uint64(0xC4CEB9FE1A85EC53)
_S33 = np.uint64(33)


def mix64(x: np.ndarray) -> np.ndarray:
    """Pinned fmix64 avalanche over uint64 values (vectorized)."""
    x = x.astype(np.uint64)
    with np.errstate(over="ignore"):
        x ^= x >> _S33
        x *= _C1
        x ^= x >> _S33
        x *= _C2
        x ^= x >> _S33
    return x


def _registers(values: np.ndarray) -> np.ndarray:
    """M-register sketch of one batch of int64 values (vectorized)."""
    h = mix64(values.view(np.uint64))
    idx = (h >> np.uint64(64 - HLL_P)).astype(np.int64)
    # remaining bits, low HLL_P bits forced to 1 so rest > 0 always
    rest = (h << np.uint64(HLL_P)) | np.uint64((1 << HLL_P) - 1)
    # exact branchless vectorized CLZ (float log2 loses precision near 2^63)
    x = rest.copy()
    lz = np.zeros(len(h), dtype=np.int64)
    with np.errstate(over="ignore"):
        for s in (32, 16, 8, 4, 2, 1):
            zero_top = (x >> np.uint64(64 - s)) == 0
            lz += np.where(zero_top, s, 0)
            x = np.where(zero_top, x << np.uint64(s), x)
    rank = (lz + 1).astype(np.uint8)
    regs = np.zeros(HLL_M, dtype=np.uint8)
    np.maximum.at(regs, idx, rank)
    return regs


def hll_partial(batch: pa.Table, column: str) -> pa.Table:
    """Per-block sketch row: one fixed-size binary cell of M registers."""
    v = batch[column].to_numpy(zero_copy_only=False).astype(np.int64)
    regs = _registers(v)
    return pa.table({"hll": pa.array([regs.tobytes()], pa.binary())})


def hll_merge_estimate(t: pa.Table) -> pa.Table:
    """Merge partial sketches (elementwise max) and estimate cardinality
    with the standard HLL bias corrections."""
    regs = np.zeros(HLL_M, dtype=np.uint8)
    for cell in t["hll"].to_pylist():
        regs = np.maximum(regs, np.frombuffer(cell, dtype=np.uint8))
    return pa.table({"approx_distinct": pa.array(
        [estimate_from_registers(regs)], pa.int64())})


def estimate_from_registers(regs: np.ndarray) -> int:
    m = float(HLL_M)
    alpha = 0.7213 / (1.0 + 1.079 / m)
    s = np.sum(2.0 ** -regs.astype(np.float64))
    e = alpha * m * m / s
    if e <= 2.5 * m:  # small-range: linear counting
        zeros = int((regs == 0).sum())
        if zeros:
            e = m * np.log(m / zeros)
    return int(e)


def approx_distinct(ds: ray.data.Dataset, column: str) -> ray.data.Dataset:
    """Approximate distinct count of an int64 column: per-block sketches ->
    one M-byte row per block -> tiny merge. The estimate is exactly
    reproducible for a given value set (max-merge is order-independent)."""
    partials = ds.map_batches(
        lambda t: hll_partial(t, column), batch_format="pyarrow",
        batch_size=65536)
    return partials.repartition(1).map_batches(
        hll_merge_estimate, batch_format="pyarrow", batch_size=None)


# --------------------------------------------------------------------------
# Misra-Gries heavy hitters (public algorithm: Misra & Gries 1982; the
# merge rule and its eps <= n/(k+1) bound after arbitrary merging are the
# mergeable-summaries result of Agarwal et al., PODS 2012). The summary is
# a semilattice value: <= k (key, lower-bound-count) rows, so the shuffle
# carries O(k) rows per block no matter how many distinct keys the input
# holds — the sketch pass never shuffles the key universe.


def _mg_compress(keys: np.ndarray, cnts: np.ndarray, k: int):
    """Decrement-and-drop down to <= k counters: subtract the (k+1)-th
    largest count from every counter and keep the positive ones. Each
    surviving count is a lower bound within n_folded/(k+1) of truth."""
    if len(keys) <= k:
        return keys, cnts
    kth = np.partition(cnts, len(cnts) - k - 1)[len(cnts) - k - 1]
    cnts = cnts - kth
    m = cnts > 0
    return keys[m], cnts[m]


def mg_partial(batch: pa.Table, column: str, k: int) -> pa.Table:
    """One block's Misra-Gries summary: exact in-block counts compressed
    to <= k (key, cnt) rows."""
    v = batch[column].to_numpy(zero_copy_only=False).astype(np.int64)
    keys, cnts = np.unique(v, return_counts=True)
    keys, cnts = _mg_compress(keys, cnts.astype(np.int64), k)
    return pa.table({"key": pa.array(keys, pa.int64()),
                     "cnt": pa.array(cnts, pa.int64())})


def mg_merge(t: pa.Table, k: int) -> pa.Table:
    """Merge summaries: sum counts by key, compress back to <= k rows.
    Associative up to the error bound, so any merge tree is valid."""
    g = t.to_pandas().groupby("key", sort=False)["cnt"].sum().reset_index()
    keys, cnts = _mg_compress(g["key"].to_numpy(np.int64),
                              g["cnt"].to_numpy(np.int64), k)
    return pa.table({"key": pa.array(keys, pa.int64()),
                     "cnt": pa.array(cnts, pa.int64())})


def mg_candidates(ds: ray.data.Dataset, column: str, k: int,
                  total_rows: int, min_count: float) -> np.ndarray:
    """Sketch pass of the exact heavy-hitters pattern: per-block summaries
    -> an intermediate merge layer (Ray batches many partial blocks per
    task, so block count never lands in one task) -> one tiny final merge.
    Returns every key whose true count COULD exceed ``min_count``: the
    merged lower bound is within total_rows/(k+1) of truth, so
    cnt > min_count - total_rows/(k+1) is a guaranteed superset. The
    candidate array is <= k entries — broadcastable by construction."""
    eps = total_rows / (k + 1)
    partials = ds.map_batches(lambda t: mg_partial(t, column, k),
                              batch_format="pyarrow", batch_size=65536)
    merged = partials.map_batches(lambda t: mg_merge(t, k),
                                  batch_format="pyarrow", batch_size=65536)
    final = pa.concat_tables(ray.get(
        merged.repartition(1).map_batches(
            lambda t: mg_merge(t, k), batch_format="pyarrow",
            batch_size=None).to_arrow_refs()))
    keys = final["key"].to_numpy(zero_copy_only=False)
    cnts = final["cnt"].to_numpy(zero_copy_only=False)
    return np.sort(keys[cnts > min_count - eps])


# --------------------------------------------------------------------------
# Bloom filter (public: Bloom 1970), double hashing h1 + i*h2 (Kirsch &
# Mitzenmacher 2006) over the pinned fmix64. Partial filters are fixed-size
# byte rows that merge by bitwise OR — commutative + idempotent, the same
# mergeable-state shape as the HLL registers.


def bloom_params(n_keys_est: int, bits_per_key: int = 10):
    """(m_bits, n_hashes) sized for ~1% false positives at 10 bits/key.
    m is a power of two so the index mask is a shift-free AND."""
    m = 1 << max(13, int(np.ceil(np.log2(max(1, n_keys_est) * bits_per_key))))
    return m, 3


_GOLDEN = np.uint64(0x9E3779B97F4A7C15)


def _bloom_indices(values: np.ndarray, m_bits: int, n_hashes: int):
    """(n_hashes, n) array of bit indices for int64 values."""
    v = values.astype(np.int64).view(np.uint64)
    h1 = mix64(v)
    h2 = mix64(v ^ _GOLDEN) | np.uint64(1)
    mask = np.uint64(m_bits - 1)
    with np.errstate(over="ignore"):
        return np.stack([(h1 + np.uint64(i) * h2) & mask
                         for i in range(n_hashes)]).astype(np.int64)


def bloom_partial(values: np.ndarray, m_bits: int,
                  n_hashes: int) -> bytes:
    """One block's filter: m_bits/8 bytes with the keys' bits set."""
    bits = np.zeros(m_bits // 8, dtype=np.uint8)
    idx = _bloom_indices(values, m_bits, n_hashes).reshape(-1)
    np.bitwise_or.at(bits, idx >> 3, np.uint8(1) << (idx & 7).astype(np.uint8))
    return bits.tobytes()


def bloom_or(cells) -> bytes:
    """OR-merge partial filters (any tree shape)."""
    out = None
    for c in cells:
        a = np.frombuffer(c, dtype=np.uint8)
        out = a.copy() if out is None else out | a
    return out.tobytes()


def bloom_contains(bloom: bytes, values: np.ndarray,
                   n_hashes: int) -> np.ndarray:
    """Vectorized membership mask (false positives possible, negatives
    never — pruning only, an exact verify must follow)."""
    bits = np.frombuffer(bloom, dtype=np.uint8)
    m_bits = len(bits) * 8
    idx = _bloom_indices(values, m_bits, n_hashes)
    hit = (bits[idx >> 3] >> (idx & 7).astype(np.uint8)) & 1
    return hit.all(axis=0).astype(bool)


def bloom_build(ds: ray.data.Dataset, column: str, m_bits: int,
                n_hashes: int) -> bytes:
    """Distributed build: per-block partial filters (one fixed-size byte
    row each) -> intermediate OR layer (bounds any task's input to its
    batch of partials, independent of total block count) -> final OR."""
    def part(t: pa.Table) -> pa.Table:
        v = t[column].to_numpy(zero_copy_only=False)
        return pa.table({"bloom": pa.array([bloom_partial(v, m_bits,
                                                          n_hashes)],
                                           pa.binary())})

    def orb(t: pa.Table) -> pa.Table:
        return pa.table({"bloom": pa.array([bloom_or(t["bloom"].to_pylist())],
                                           pa.binary())})

    merged = pa.concat_tables(ray.get(
        ds.map_batches(part, batch_format="pyarrow", batch_size=65536)
          .map_batches(orb, batch_format="pyarrow", batch_size=64)
          .repartition(1)
          .map_batches(orb, batch_format="pyarrow", batch_size=None)
          .to_arrow_refs()))
    return merged["bloom"][0].as_py()
