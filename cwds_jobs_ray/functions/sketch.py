"""Mergeable sketches: HyperLogLog approximate distinct count.

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
