"""Similarity search over an embedding column (list<float>).

- ``cosine_topk``: brute-force exact top-k — the verification baseline.
  Query matrix broadcast once via ``ray.put``; each block computes one
  matmul and emits its PARTIAL top-k (k rows per query per block), so the
  final reduce sees n_blocks*k tiny rows instead of the full corpus.
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

    def final(t: pa.Table) -> pa.Table:
        df = t.to_pandas().sort_values(["sim", "vec_id"],
                                       ascending=[False, True], kind="stable")
        out = df.groupby("query_id", sort=False).head(k).copy()
        out["rank"] = out.groupby("query_id", sort=False).cumcount() + 1
        return pa.Table.from_pandas(out[["query_id", "vec_id", "rank"]],
                                    preserve_index=False)

    # partial top-k bounds the final to n_queries x k x n_blocks rows
    partials = ds.map_batches(partial_topk, batch_format="pyarrow",
                              batch_size=4096)
    return partials.repartition(1).map_batches(final, batch_format="pyarrow",
                                               batch_size=None)


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
        pop = np.vectorize(lambda v: bin(int(v)).count("1"))(xor)
        sims = np.where(pop <= 1, sims, -np.inf)
        kk = min(k, sims.shape[1])
        part = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
        qi = np.repeat(qids, kk)
        vi = ids[part.reshape(-1)]
        sv = np.take_along_axis(sims, part, axis=1).reshape(-1)
        ok = np.isfinite(sv)
        return pa.table({"query_id": pa.array(qi[ok], pa.int64()),
                         "vec_id": pa.array(vi[ok], pa.int64()),
                         "sim": pa.array(sv[ok])})

    def final(t: pa.Table) -> pa.Table:
        df = t.to_pandas().sort_values(["sim", "vec_id"],
                                       ascending=[False, True], kind="stable")
        out = df.groupby("query_id", sort=False).head(k).copy()
        out["rank"] = out.groupby("query_id", sort=False).cumcount() + 1
        return pa.Table.from_pandas(out[["query_id", "vec_id", "rank"]],
                                    preserve_index=False)

    partials = ds.map_batches(bucketed_topk, batch_format="pyarrow",
                              batch_size=4096)
    return partials.repartition(1).map_batches(final, batch_format="pyarrow",
                                               batch_size=None)


N_CENTROIDS = 16
N_PROBE = 3


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

    The quantizer is trained once on a driver-side sample and broadcast; at
    scale, train on `ds.random_sample(...)` and raise N_CENTROIDS ~ sqrt(n).
    """
    sample = _unit(np.asarray(ds.limit(4096).to_pandas()["embedding"].tolist(),
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

    def final(t: pa.Table) -> pa.Table:
        df = t.to_pandas().sort_values(["sim", "vec_id"],
                                       ascending=[False, True], kind="stable")
        out = df.groupby("query_id", sort=False).head(k).copy()
        out["rank"] = out.groupby("query_id", sort=False).cumcount() + 1
        return pa.Table.from_pandas(out[["query_id", "vec_id", "rank"]],
                                    preserve_index=False)

    partials = ds.map_batches(probe_topk, batch_format="pyarrow",
                              batch_size=4096)
    return partials.repartition(1).map_batches(final, batch_format="pyarrow",
                                               batch_size=None)


def cosine_neardup_pairs(ds: ray.data.Dataset, threshold: float) -> pa.Table:
    """All pairs (a < b) with cosine >= threshold: corpus matrix broadcast
    once, one matmul per block (embedding-cosine near-dup detection)."""
    tbl = ds.select_columns(["vec_id", "embedding"]).to_pandas()
    tbl = tbl.sort_values("vec_id").reset_index(drop=True)
    full = _unit(np.asarray(tbl["embedding"].tolist(), dtype=np.float64))
    ids_all = tbl["vec_id"].to_numpy()
    ref = ray.put((full, ids_all))

    def pairs(batch: pa.Table) -> pa.Table:
        m, ids_s = ray.get(ref)
        bids = batch["vec_id"].to_numpy(zero_copy_only=False)
        idx = np.searchsorted(ids_s, bids)
        sims = m[idx] @ m.T
        mask = (sims >= threshold) & (bids[:, None] < ids_s[None, :])
        ai, bj = np.nonzero(mask)
        return pa.table({"vec_a": pa.array(bids[ai], pa.int64()),
                         "vec_b": pa.array(ids_s[bj], pa.int64())})

    out = ds.select_columns(["vec_id"]).map_batches(
        pairs, batch_format="pyarrow", batch_size=2048)
    # materialize with explicit schema: an all-empty Dataset loses its
    # column schema through to_pandas, which breaks empty-result compares
    batches = list(out.iter_batches(batch_format="pyarrow"))
    batches = [b for b in batches if b.num_rows]
    if not batches:
        return pa.table({"vec_a": pa.array([], pa.int64()),
                         "vec_b": pa.array([], pa.int64())})
    return pa.concat_tables(batches)
