"""Similarity search over an embedding column (list<float>).

- ``cosine_topk``: brute-force exact top-k — the verification baseline.
  Query matrix broadcast once via ``ray.put``; each block computes one
  matmul and emits its PARTIAL top-k (k rows per query per block); the
  final reduce is keyed by query_id into coarse buckets (``_keyed_topk_final``)
  so no single task's input grows with corpus block count.
- ``lsh_topk``: random-hyperplane LSH bucketing — the scale path; probes
  only same-bucket (+1-bit neighbor) candidates.
- ``cosine_neardup_pairs``: embedding near-duplicate pairs over a threshold.

All cosines are computed in float64 (inputs upcast from float32) to align
with the DuckDB oracle's DOUBLE[] cast.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data


def _mat(col) -> np.ndarray:
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    if isinstance(arr, pa.ListArray) or isinstance(arr, pa.FixedSizeListArray):
        flat = arr.flatten().to_numpy(zero_copy_only=False)
        return flat.reshape(len(arr), -1).astype(np.float64)
    return np.asarray(arr.to_pylist(), dtype=np.float64)


def _unit(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


_M1 = np.uint64(0x5555555555555555)
_M2 = np.uint64(0x3333333333333333)
_M4 = np.uint64(0x0F0F0F0F0F0F0F0F)
_H01 = np.uint64(0x0101010101010101)


def _popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized SWAR popcount (numpy<2 lacks bitwise_count) — replaces a
    per-element Python loop in the Hamming mask."""
    x = x.astype(np.uint64)
    with np.errstate(over="ignore"):
        x = x - ((x >> np.uint64(1)) & _M1)
        x = (x & _M2) + ((x >> np.uint64(2)) & _M2)
        x = (x + (x >> np.uint64(4))) & _M4
        return ((x * _H01) >> np.uint64(56)).astype(np.int64)


def _sample_hash(ids: np.ndarray) -> np.ndarray:
    """Deterministic per-row sampling key (fmix64 avalanche of vec_id,
    masked to 63 bits so int64 ordering matches unsigned ordering). A pure
    function of the RECORD, never of block layout — so the k-smallest-hash
    sample is identical on the engine, the naive golden oracle, and any
    repartitioning of the input (the same content-hash discipline the
    train/val split uses)."""
    with np.errstate(over="ignore"):
        h = ids.astype(np.int64).view(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
        h ^= h >> np.uint64(33)
        h *= np.uint64(0xFF51AFD7ED558CCD)
        h ^= h >> np.uint64(33)
        return (h & np.uint64((1 << 63) - 1)).astype(np.int64)


def _bottomk_sample(ds: ray.data.Dataset, k: int) -> pd.DataFrame:
    """UNBIASED deterministic sample: the k rows with the smallest
    ``_sample_hash(vec_id)`` (ties broken by vec_id). Per-block partial
    bottom-k -> bounded driver final of <= n_blocks x k rows — never a
    first-blocks bias, never a full-corpus pull."""
    def part(batch: pa.Table) -> pa.Table:
        ids = batch["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        h = _sample_hash(ids)
        if len(ids) > k:
            idx = np.argpartition(h, k - 1)[:k]
            batch = batch.take(pa.array(idx))
            h = h[idx]
        return batch.append_column("_h", pa.array(h))

    df = (ds.select_columns(["vec_id", "embedding"])
            .map_batches(part, batch_format="pyarrow", batch_size=8192)
            .to_pandas())
    return (df.sort_values(["_h", "vec_id"], kind="stable").head(k)
            .drop(columns="_h").reset_index(drop=True))


def _keyed_topk_final(partials: ray.data.Dataset, k: int,
                      n_buckets: int | None = None) -> ray.data.Dataset:
    """Final reduce of per-block partial top-k rows, keyed by query_id into
    coarse hash buckets (a query never spans buckets, so per-bucket top-k is
    global top-k). The partials are n_queries x k x n_blocks rows — linear in
    corpus block count — so the final must NOT be a single task; bucketing
    keeps every reduce task's input at ~(n_queries/n_buckets) x k x n_blocks
    no matter how large the corpus grows."""
    from .dedup import default_n_buckets
    from .joins import _int_bucket

    nb = n_buckets or default_n_buckets()

    def add_bucket(t: pa.Table) -> pa.Table:
        b = _int_bucket(t["query_id"].to_numpy(zero_copy_only=False), nb)
        return t.append_column("_bucket", pa.array(b))

    def final(t: pa.Table) -> pa.Table:
        df = t.to_pandas().sort_values(["sim", "vec_id"],
                                       ascending=[False, True], kind="stable")
        out = df.groupby("query_id", sort=False).head(k).copy()
        out["rank"] = out.groupby("query_id", sort=False).cumcount() + 1
        return pa.table({
            "query_id": pa.array(out["query_id"].to_numpy().astype(np.int64)),
            "vec_id": pa.array(out["vec_id"].to_numpy().astype(np.int64)),
            "rank": pa.array(out["rank"].to_numpy().astype(np.int64)),
        })

    from ..stages.waves import wave_group_reduce

    return wave_group_reduce(
        partials.map_batches(add_bucket, batch_format="pyarrow"),
        "_bucket", nb, final)


def cosine_topk(ds: ray.data.Dataset, queries: np.ndarray,
                query_ids: np.ndarray, k: int) -> ray.data.Dataset:
    """Exact top-k neighbors per query by cosine; returns
    (query_id, vec_id, rank) with rank 1..k, ties broken on vec_id."""
    qref = ray.put((_unit(queries), query_ids))

    def partial_topk(batch: pa.Table) -> pa.Table:
        q, qids = ray.get(qref)  # zero-copy from local object store
        m = _unit(_mat(batch["embedding"]))
        ids = batch["vec_id"].to_numpy(zero_copy_only=False)
        sims = q @ m.T  # (n_queries, n_block)
        kk = min(k, sims.shape[1])
        # partial top-k per query within this block
        part = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
        qi = np.repeat(qids, kk)
        vi = ids[part.reshape(-1)]
        sv = np.take_along_axis(sims, part, axis=1).reshape(-1)
        return pa.table({"query_id": pa.array(qi, pa.int64()),
                         "vec_id": pa.array(vi, pa.int64()),
                         "sim": pa.array(sv)})

    # partial top-k bounds the shuffle to n_queries x k x n_blocks rows;
    # the final reduces per query-id bucket (never a single task)
    partials = ds.map_batches(partial_topk, batch_format="pyarrow",
                              batch_size=4096)
    return _keyed_topk_final(partials, k)


N_PLANES = 8  # 2^8 buckets


def _planes(dim: int, seed: int = 11) -> np.ndarray:
    return np.random.default_rng(seed).standard_normal((N_PLANES, dim))


def lsh_topk(ds: ray.data.Dataset, queries: np.ndarray,
             query_ids: np.ndarray, k: int, dim: int) -> ray.data.Dataset:
    """Approximate top-k: random-hyperplane signatures bucket the corpus;
    each query probes only its own bucket (plus Hamming-1 neighbors)."""
    planes = _planes(dim)
    qsig = (( _unit(queries) @ planes.T) > 0).astype(np.int64)
    qbuck = (qsig * (1 << np.arange(N_PLANES))).sum(axis=1)
    probe = {int(b) for b in qbuck}
    for b in list(probe):
        probe |= {b ^ (1 << i) for i in range(N_PLANES)}
    qref = ray.put((_unit(queries), query_ids, qbuck, np.array(sorted(probe))))

    def bucketed_topk(batch: pa.Table) -> pa.Table:
        q, qids, qb, probe_arr = ray.get(qref)
        m = _unit(_mat(batch["embedding"]))
        ids = batch["vec_id"].to_numpy(zero_copy_only=False)
        sig = ((m @ planes.T) > 0).astype(np.int64)
        buck = (sig * (1 << np.arange(N_PLANES))).sum(axis=1)
        keep = np.isin(buck, probe_arr)
        m, ids, buck = m[keep], ids[keep], buck[keep]
        if len(ids) == 0:
            return pa.table({"query_id": pa.array([], pa.int64()),
                             "vec_id": pa.array([], pa.int64()),
                             "sim": pa.array([], pa.float64())})
        sims = q @ m.T
        # candidate mask: vector bucket within Hamming-1 of query bucket
        xor = qb[:, None] ^ buck[None, :]
        sims = np.where(_popcount64(xor) <= 1, sims, -np.inf)
        kk = min(k, sims.shape[1])
        part = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
        qi = np.repeat(qids, kk)
        vi = ids[part.reshape(-1)]
        sv = np.take_along_axis(sims, part, axis=1).reshape(-1)
        ok = np.isfinite(sv)
        return pa.table({"query_id": pa.array(qi[ok], pa.int64()),
                         "vec_id": pa.array(vi[ok], pa.int64()),
                         "sim": pa.array(sv[ok])})

    partials = ds.map_batches(bucketed_topk, batch_format="pyarrow",
                              batch_size=4096)
    return _keyed_topk_final(partials, k)


N_CENTROIDS = 16
N_PROBE = 3
IVF_TRAIN_SAMPLE = 4096


def _kmeans(sample: np.ndarray, k: int, iters: int = 10,
            seed: int = 13) -> np.ndarray:
    """Tiny deterministic Lloyd's k-means on unit vectors (cosine ≈ dot)."""
    rng = np.random.default_rng(seed)
    cents = sample[rng.choice(len(sample), size=min(k, len(sample)),
                              replace=False)]
    for _ in range(iters):
        assign = (sample @ cents.T).argmax(axis=1)
        for c in range(len(cents)):
            members = sample[assign == c]
            if len(members):
                v = members.mean(axis=0)
                n = np.linalg.norm(v)
                if n > 0:
                    cents[c] = v / n
    return cents


def ivf_topk(ds: ray.data.Dataset, queries: np.ndarray,
             query_ids: np.ndarray, k: int) -> ray.data.Dataset:
    """IVF approximate top-k: a coarse k-means quantizer partitions the
    corpus into inverted lists; each query probes only its N_PROBE nearest
    centroids' lists.

    The quantizer is trained once on a driver-side sample and broadcast.
    The sample is the deterministic content-hash bottom-k (``_bottomk_sample``)
    — unbiased (hash-uniform over the whole corpus, not the first blocks)
    and reproducible across block layouts; at scale raise N_CENTROIDS ~
    sqrt(n).
    """
    sample = _unit(np.asarray(
        _bottomk_sample(ds, IVF_TRAIN_SAMPLE)["embedding"].tolist(),
        dtype=np.float64))
    cents = _kmeans(sample, N_CENTROIDS)
    q = _unit(queries)
    qprobe = np.argsort(-(q @ cents.T), axis=1)[:, :N_PROBE]
    qref = ray.put((q, query_ids, cents, qprobe))

    def probe_topk(batch: pa.Table) -> pa.Table:
        qq, qids, cc, qp = ray.get(qref)
        m = _unit(_mat(batch["embedding"]))
        ids = batch["vec_id"].to_numpy(zero_copy_only=False)
        assign = (m @ cc.T).argmax(axis=1)  # inverted-list id per vector
        sims = qq @ m.T
        # mask: vector's list must be among the query's probed lists
        cand = (assign[None, :, None] == qp[:, None, :]).any(axis=2)
        sims = np.where(cand, sims, -np.inf)
        kk = min(k, sims.shape[1])
        part = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
        qi = np.repeat(qids, kk)
        vi = ids[part.reshape(-1)]
        sv = np.take_along_axis(sims, part, axis=1).reshape(-1)
        ok = np.isfinite(sv)
        return pa.table({"query_id": pa.array(qi[ok], pa.int64()),
                         "vec_id": pa.array(vi[ok], pa.int64()),
                         "sim": pa.array(sv[ok])})

    partials = ds.map_batches(probe_topk, batch_format="pyarrow",
                              batch_size=4096)
    return _keyed_topk_final(partials, k)


_EMPTY_VPAIRS = pa.schema([("vec_a", pa.int64()), ("vec_b", pa.int64())])

LSH_NDP_BANDS = 32
LSH_NDP_ROWS = 8       # 8 sign bits per band -> 256 hyperplanes total
_NDP_VERIFY_CHUNK = 65536


def _ndp_planes(dim: int, seed: int = 17) -> np.ndarray:
    return np.random.default_rng(seed).standard_normal(
        (LSH_NDP_BANDS * LSH_NDP_ROWS, dim))


def cosine_neardup_lsh(ds: ray.data.Dataset, threshold: float, dim: int,
                       n_rows: int | None = None,
                       n_buckets: int | None = None) -> ray.data.Dataset:
    """Near-duplicate pairs by banded random-hyperplane LSH + EXACT verify —
    the scale path the exact block-pair sweep's docstring points to for
    thresholds >= ~0.8 (where band recall is driven to ~1: at cos 0.95 a
    pair misses all 32 8-bit bands with probability ~2e-8; at cos 0.9,
    ~2e-5 — tune bands/rows per threshold). Precision is always exact: every
    candidate is re-verified with the true float64 cosine.

    Shape: one linear scan emits per-band rows (band-hash key, vec_id, full
    signature, raw float32 embedding bytes); ONE keyed exchange co-locates
    each (band, hash) group; each bucket expands within-run candidate pairs
    vectorized, keeps a pair only in its FIRST matching band (signatures
    ride with the rows, so ownership is a vectorized band-prefix compare and
    every pair is emitted exactly once globally — no second dedup
    exchange), and verifies in bounded chunks. Wire cost is bands x corpus
    (embedding bytes ride with every band row) — the right trade for
    small/mid dims; for large payloads switch to the id-only banding +
    bucketed join-back shape of functions/dedup.lsh_verified_pairs."""
    from .dedup import sized_n_buckets
    from .joins import _int_bucket
    from ..stages.waves import wave_group_reduce

    planes = _ndp_planes(dim)
    pref = ray.put(planes)
    # bucket sizing must NOT execute the input pipeline: callers pass a
    # row-count hint (parquet footers are free); otherwise cluster-sized
    from .dedup import default_n_buckets
    nb = n_buckets or (sized_n_buckets(n_rows * LSH_NDP_BANDS)
                       if n_rows else default_n_buckets())
    bpow = (1 << np.arange(LSH_NDP_ROWS)).astype(np.uint16)

    def band_rows(t: pa.Table) -> pa.Table:
        pl = ray.get(pref)
        raw = _mat(t["embedding"])          # float64 copy for signatures
        m = _unit(raw)
        n = len(m)
        ids = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        bits = (m @ pl.T) > 0               # (n, bands*rows)
        bh = (bits.reshape(n, LSH_NDP_BANDS, LSH_NDP_ROWS)
              * bpow).sum(axis=2).astype(np.uint8)   # (n, bands)
        sig = np.ascontiguousarray(bh)
        # raw float32 bytes: verify upcasts exactly like the parquet read
        emb32 = np.ascontiguousarray(raw.astype(np.float32))
        band = np.tile(np.arange(LSH_NDP_BANDS, dtype=np.int64), n)
        key = band * 256 + bh.reshape(-1).astype(np.int64)
        out = pa.table({
            "vec_id": pa.array(np.repeat(ids, LSH_NDP_BANDS)),
            "band": pa.array(band),
            "key": pa.array(key),
            # NOTE: plain list repetition — np.repeat over a bytes list
            # coerces to numpy 'S' dtype, which silently STRIPS trailing
            # null bytes from signatures/embeddings
            "sig": pa.array(
                [s for s in (sig[i].tobytes() for i in range(n))
                 for _ in range(LSH_NDP_BANDS)], pa.binary()),
            "emb": pa.array(
                [e for e in (emb32[i].tobytes() for i in range(n))
                 for _ in range(LSH_NDP_BANDS)], pa.binary()),
        })
        return out.append_column(
            "_bucket", pa.array(_int_bucket(key, nb)))

    empty = _EMPTY_VPAIRS.empty_table()

    def verify_bucket(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return empty
        key = t["key"].to_numpy(zero_copy_only=False)
        vid = t["vec_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((vid, key))
        key, vid = key[order], vid[order]
        band = t["band"].to_numpy(zero_copy_only=False)[order]
        sig = np.frombuffer(
            b"".join(t["sig"].to_pylist()),
            dtype=np.uint8).reshape(t.num_rows, LSH_NDP_BANDS)[order]
        emb = np.frombuffer(
            b"".join(t["emb"].to_pylist()),
            dtype=np.float32).reshape(t.num_rows, -1)[order]
        from .dedup import _all_run_pairs
        starts = np.flatnonzero(np.r_[True, key[1:] != key[:-1]])
        lens = np.diff(np.r_[starts, len(key)])
        ia, ib = _all_run_pairs(starts, lens.astype(np.int64), len(key))
        if not len(ia):
            return empty
        # first-matching-band ownership: keep a pair only where NO earlier
        # band's hashes agree (each pair is then emitted exactly once
        # globally, no dedup exchange needed)
        bcur = band[ia]
        eq = sig[ia] == sig[ib]                        # (npairs, bands)
        earlier = np.arange(LSH_NDP_BANDS)[None, :] < bcur[:, None]
        own = ~(eq & earlier).any(axis=1)
        ia, ib = ia[own], ib[own]
        out_a, out_b = [], []
        for s in range(0, len(ia), _NDP_VERIFY_CHUNK):
            ca, cb = ia[s:s + _NDP_VERIFY_CHUNK], ib[s:s + _NDP_VERIFY_CHUNK]
            ua = _unit(emb[ca].astype(np.float64))
            ub = _unit(emb[cb].astype(np.float64))
            sim = np.einsum("ij,ij->i", ua, ub)
            hit = sim >= threshold
            a, b = vid[ca[hit]], vid[cb[hit]]
            lo = np.minimum(a, b)
            hi = np.maximum(a, b)
            out_a.append(lo)
            out_b.append(hi)
        a = np.concatenate(out_a) if out_a else np.empty(0, np.int64)
        b = np.concatenate(out_b) if out_b else np.empty(0, np.int64)
        return pa.table({"vec_a": pa.array(a, pa.int64()),
                         "vec_b": pa.array(b, pa.int64())})

    banded = ds.select_columns(["vec_id", "embedding"]).map_batches(
        band_rows, batch_format="pyarrow", batch_size=2048)
    return wave_group_reduce(banded, "_bucket", nb, verify_bucket)


def _windowed_submit(thunks, window: int):
    """Submit task thunks with at most ``window`` tasks IN FLIGHT (pending
    execution) at once: the driver never builds the full task backlog
    eagerly — at 10^6 corpus blocks an eager O(B^2) submission loop would
    create 5*10^11 task handles before the first result lands. Completed
    refs accumulate (they are the result set); returns (refs, peak_in_flight)
    so tests can assert the bound."""
    refs, pending, peak = [], [], 0
    for thunk in thunks:
        while len(pending) >= window:
            _, pending = ray.wait(pending, num_returns=1)
        r = thunk()
        pending.append(r)
        peak = max(peak, len(pending))
        refs.append(r)
    return refs, peak


def _sweep_window() -> int:
    """In-flight window for the block-pair sweep: 4x cluster task slots."""
    try:
        cpus = int(ray.cluster_resources().get("CPU", 16)) \
            if ray.is_initialized() else 16
    except Exception:  # noqa: BLE001 — sizing heuristic only
        cpus = 16
    return max(8, 4 * cpus)


def cosine_neardup_pairs(ds: ray.data.Dataset, threshold: float,
                         block_size: int = 4096) -> ray.data.Dataset:
    """All pairs (a < b) with cosine >= threshold, EXACTLY, via a
    distributed block-pair sweep.

    The corpus is split into blocks of ``block_size`` vectors; one Ray task
    per unordered block pair computes that pair's cross matmul and emits its
    qualifying pairs. Total flops are the inherent O(n^2 d) of an exact
    low-threshold sweep, but each task holds only TWO blocks (memory
    O(block_size * d)), nothing broadcasts the corpus, and nothing funnels
    through the driver. Why not LSH/IVF pruning: at a threshold this low
    (0.5 ~ 60° — inside the bulk of a random-vector cosine distribution) any
    bucketing scheme has material miss probability at the boundary, so a
    pruned sweep cannot promise the oracle-exact pair set; at thresholds
    >=0.8 swap in the banded-LSH candidate pipeline (functions/dedup.py
    shape) and verify candidates exactly.
    """

    def pack(batch: pa.Table) -> pa.Table:
        return batch  # block boundaries only; content unchanged

    blocks = (ds.select_columns(["vec_id", "embedding"])
                .map_batches(pack, batch_format="pyarrow",
                             batch_size=block_size)
                .to_arrow_refs())

    @ray.remote
    def block_pair(ta: pa.Table, tb: pa.Table, same: bool) -> pa.Table:
        ma = _unit(_mat(ta["embedding"]))
        ids_a = ta["vec_id"].to_numpy(zero_copy_only=False)
        mb = _unit(_mat(tb["embedding"]))
        ids_b = tb["vec_id"].to_numpy(zero_copy_only=False)
        sims = ma @ mb.T
        mask = sims >= threshold
        if same:
            mask &= ids_a[:, None] < ids_b[None, :]
        else:
            lo = ids_a[:, None] < ids_b[None, :]
            a_ids = np.where(lo, ids_a[:, None], ids_b[None, :])
            b_ids = np.where(lo, ids_b[None, :], ids_a[:, None])
            ai, bj = np.nonzero(mask)
            return pa.table({"vec_a": pa.array(a_ids[ai, bj], pa.int64()),
                             "vec_b": pa.array(b_ids[ai, bj], pa.int64())})
        ai, bj = np.nonzero(mask)
        return pa.table({"vec_a": pa.array(ids_a[ai], pa.int64()),
                         "vec_b": pa.array(ids_b[bj], pa.int64())})

    nblk = len(blocks)
    thunks = (lambda i=i, j=j: block_pair.remote(blocks[i], blocks[j], i == j)
              for i in range(nblk) for j in range(i, nblk))
    refs, _peak = _windowed_submit(thunks, _sweep_window())
    if not refs:
        return ray.data.from_arrow(_EMPTY_VPAIRS.empty_table())
    return ray.data.from_arrow_refs(refs)
