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


def _train_centroids(ds: ray.data.Dataset, k: int) -> np.ndarray:
    """Quantizer training shared by ``kmeans_assign`` and ``ivf_topk``:
    unit-normalized deterministic content-hash bottom-k sample ->
    Lloyd's k-means. (The golden oracle in __ray_entry__ reproduces this
    recipe INDEPENDENTLY on purpose — it is the check, not a caller.)"""
    sample = _unit(np.asarray(
        _bottomk_sample(ds, IVF_TRAIN_SAMPLE)["embedding"].tolist(),
        dtype=np.float64))
    return _kmeans(sample, k)


def kmeans_assign(ds: ray.data.Dataset,
                  k: int = N_CENTROIDS) -> ray.data.Dataset:
    """Embedding clustering for data curation: train the coarse quantizer
    once on the deterministic content-hash bottom-k sample (unbiased,
    reproducible across block layouts), broadcast the centroids, and
    assign every vector to its nearest centroid in one vectorized pass per
    block — no shuffle, O(centroids) broadcast bytes, cost linear in the
    corpus. Same machinery as the IVF inverted-list build (``ivf_topk``);
    at scale raise k ~ sqrt(n)."""
    cents = _train_centroids(ds, k)
    cref = ray.put(cents)

    def assign(batch: pa.Table) -> pa.Table:
        cc = ray.get(cref)
        m = _unit(_mat(batch["embedding"]))
        return pa.table({
            "vec_id": batch["vec_id"],
            "cluster": pa.array((m @ cc.T).argmax(axis=1).astype(np.int64)),
        })

    return ds.map_batches(assign, batch_format="pyarrow", batch_size=4096)


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
    cents = _train_centroids(ds, N_CENTROIDS)
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


PQ_M = 8    # subvectors per embedding (dim must divide evenly)
PQ_KS = 16  # codewords per subvector codebook (4-bit codes)


def _kmeans_l2(sample: np.ndarray, k: int, iters: int = 10,
               seed: int = 13) -> np.ndarray:
    """Deterministic Lloyd's k-means under squared-L2 (PQ codebooks are
    L2 quantizers of raw subvectors — unlike the cosine ``_kmeans`` above,
    centroids are plain means, no re-normalization)."""
    rng = np.random.default_rng(seed)
    cents = sample[rng.choice(len(sample), size=min(k, len(sample)),
                              replace=False)].copy()
    for _ in range(iters):
        d2 = ((sample[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1)
        for c in range(len(cents)):
            members = sample[assign == c]
            if len(members):
                cents[c] = members.mean(axis=0)
    return cents


def _train_pq_codebooks(ds: ray.data.Dataset, m: int = PQ_M,
                        ks: int = PQ_KS) -> np.ndarray:
    """Per-subvector L2 codebooks trained on the deterministic
    content-hash bottom-k sample of UNIT vectors (the same unbiased,
    layout-independent sample the IVF quantizer uses). Returns
    (m, ks, dim/m). The golden oracle in __ray_entry__ reproduces this
    recipe independently — it is the check, not a caller."""
    sample = _unit(np.asarray(
        _bottomk_sample(ds, IVF_TRAIN_SAMPLE)["embedding"].tolist(),
        dtype=np.float64))
    d = sample.shape[1] // m
    return np.stack([_kmeans_l2(sample[:, j * d:(j + 1) * d], ks,
                                seed=13 + j) for j in range(m)])


def _pq_encode(unit_vecs: np.ndarray, books: np.ndarray) -> np.ndarray:
    """Vectorized PQ encoding: per subvector, the index of the nearest
    codeword under squared-L2 (ties -> first index, = np.argmin, matching
    the naive golden). Returns (n, m) int codes."""
    m, _ks, d = books.shape
    codes = np.empty((len(unit_vecs), m), dtype=np.int64)
    for j in range(m):
        sub = unit_vecs[:, j * d:(j + 1) * d]
        # ||sub - c||^2 = ||sub||^2 - 2 sub.c + ||c||^2; the ||sub||^2 term
        # is constant per row and cannot change the argmin
        d2 = (books[j] ** 2).sum(axis=1)[None, :] - 2.0 * (sub @ books[j].T)
        codes[:, j] = d2.argmin(axis=1)
    return codes


def pq_topk(ds: ray.data.Dataset, queries: np.ndarray,
            query_ids: np.ndarray, k: int) -> ray.data.Dataset:
    """Product-quantization approximate top-k (asymmetric distance
    computation): the corpus is compressed to m small codes per vector
    (dim x 4 bytes -> m bytes — at 100 TB of f32 embeddings THE memory
    lever: a 64-dim corpus compresses 32x and the scan becomes table
    lookups instead of dot products); each query precomputes an
    (m x ks) inner-product table against the codebooks, and a vector's
    approximate similarity is the sum of its m looked-up entries.

    Codebooks train once on the driver (deterministic bottom-k-hash
    sample) and broadcast via ``ray.put``; encode + lookup are one
    vectorized pass per block with NO shuffle; per-block partial top-k
    rows enter the same query-keyed bucketed final as the exact/LSH/IVF
    variants. Ranking ties break on vec_id; identical codes produce
    identical sums (same table entries, same j-order summation), so the
    order matches the naive golden evaluator bit-for-bit."""
    books = _train_pq_codebooks(ds)
    q = _unit(queries)
    m, ks, d = books.shape
    # ADC tables: T[qi, j, c] = q_sub(j) . book[j][c]
    tabs = np.stack([q[:, j * d:(j + 1) * d] @ books[j].T
                     for j in range(m)], axis=1)
    bref = ray.put((books, tabs, query_ids))

    def adc_topk(batch: pa.Table) -> pa.Table:
        bb, tt, qids = ray.get(bref)
        vecs = _unit(_mat(batch["embedding"]))
        ids = batch["vec_id"].to_numpy(zero_copy_only=False)
        codes = _pq_encode(vecs, bb)
        sims = np.zeros((len(qids), len(ids)), dtype=np.float64)
        for j in range(bb.shape[0]):  # fixed j-order summation (see doc)
            sims += tt[:, j, codes[:, j]]
        kk = min(k, sims.shape[1])
        part = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
        return pa.table({
            "query_id": pa.array(np.repeat(qids, kk), pa.int64()),
            "vec_id": pa.array(ids[part.reshape(-1)], pa.int64()),
            "sim": pa.array(np.take_along_axis(sims, part, axis=1)
                            .reshape(-1))})

    partials = ds.map_batches(adc_topk, batch_format="pyarrow",
                              batch_size=4096)
    return _keyed_topk_final(partials, k)


_EMPTY_VPAIRS = pa.schema([("vec_a", pa.int64()), ("vec_b", pa.int64())])

LSH_NDP_BANDS = 32
LSH_NDP_ROWS = 8       # 8 sign bits per band -> 256 hyperplanes total
_NDP_VERIFY_CHUNK = 65536


def _ndp_planes(dim: int, seed: int = 17) -> np.ndarray:
    return np.random.default_rng(seed).standard_normal(
        (LSH_NDP_BANDS * LSH_NDP_ROWS, dim))


def _fixed_bin_f32(col, dim: int) -> np.ndarray:
    """(n, dim) float32 view over a fixed_size_binary(dim*4) column —
    straight from the Arrow data buffer, no per-row bytes objects."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    if len(arr) == 0:
        return np.empty((0, dim), np.float32)
    width = 4 * dim
    return np.frombuffer(arr.buffers()[1], dtype=np.float32,
                         count=len(arr) * dim,
                         offset=arr.offset * width).reshape(len(arr), dim)


def _e1_split_bands(block: pa.Table, nb: int, planes: np.ndarray):
    """Band wave 1 (per corpus block): int-only band rows
    (doc_id=vec_id, band, band_hash) partitioned by hash(band*256+hash) —
    NO payload rides with the banding exchange."""
    from .dedup import _bucket_slices, _scalar_if_one
    from .joins import _int_bucket

    empty = pa.table({"doc_id": pa.array([], pa.int64()),
                      "band": pa.array([], pa.int64()),
                      "band_hash": pa.array([], pa.int64())})
    if block.num_rows == 0:
        return _scalar_if_one([empty] * nb, nb)
    m = _unit(_mat(block["embedding"]))
    n = len(m)
    ids = block["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    bits = (m @ planes.T) > 0                     # (n, bands*rows)
    bpow = (1 << np.arange(LSH_NDP_ROWS)).astype(np.int64)
    bh = (bits.reshape(n, LSH_NDP_BANDS, LSH_NDP_ROWS)
          * bpow).sum(axis=2).reshape(-1).astype(np.int64)
    band = np.tile(np.arange(LSH_NDP_BANDS, dtype=np.int64), n)
    doc = np.repeat(ids, LSH_NDP_BANDS)
    b = _int_bucket(band * 256 + bh, nb)
    return _scalar_if_one(
        [pa.table({"doc_id": pa.array(doc[i]), "band": pa.array(band[i]),
                   "band_hash": pa.array(bh[i])})
         for i in _bucket_slices(b, nb)], nb)


def _e1_split_vecs(block: pa.Table, nb: int, dim: int):
    """Vec wave 1 (per corpus block): (doc_id, emb fixed_size_binary) rows
    partitioned by hash(doc_id). The float32 payload is packed ONCE from the
    contiguous matrix buffer (FixedSizeBinary over the raw buffer — no
    per-row tobytes loop, and immune to the numpy 'S'-dtype
    trailing-null-stripping pitfall)."""
    from .dedup import _bucket_slices, _doc_bucket, _scalar_if_one

    width = 4 * dim
    empty = pa.table({"doc_id": pa.array([], pa.int64()),
                      "emb": pa.array([], pa.binary(width))})
    if block.num_rows == 0:
        return _scalar_if_one([empty] * nb, nb)
    ids = block["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    # float32 bytes: verify upcasts to float64 exactly like the parquet read
    emb32 = np.ascontiguousarray(
        _mat(block["embedding"]).astype(np.float32))
    arr = pa.Array.from_buffers(pa.binary(width), len(ids),
                                [None, pa.py_buffer(emb32)])
    t = pa.table({"doc_id": pa.array(ids), "emb": arr})
    b = _doc_bucket(ids, nb)
    return _scalar_if_one(
        [t.take(pa.array(i)) for i in _bucket_slices(b, nb)], nb)


def _e4_attach(nb: int, n_vec_slices: int, dim: int, *slices: pa.Table):
    """Wave 4 (per doc bucket): join this bucket's pair-requests to its
    embeddings and route (doc_id, emb) to each requesting pair bucket —
    payload volume is O(candidate docs x requesting buckets), never
    bands x corpus."""
    from .dedup import _bucket_slices, _scalar_if_one

    width = 4 * dim
    vecs = [s for s in slices[:n_vec_slices] if s.num_rows]
    reqs = [s for s in slices[n_vec_slices:] if s.num_rows]
    empty = pa.table({"doc_id": pa.array([], pa.int64()),
                      "emb": pa.array([], pa.binary(width))})
    if not vecs or not reqs:
        return _scalar_if_one([empty] * nb, nb)
    vt = pa.concat_tables(vecs)
    vid = vt["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    uniq, first = np.unique(vid, return_index=True)
    rt = pa.concat_tables(reqs)
    rid = rt["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    rpb = rt["pbucket"].to_numpy(zero_copy_only=False).astype(np.int64)
    pos = np.searchsorted(uniq, rid)
    ok = (pos < len(uniq)) & (uniq[np.minimum(pos, len(uniq) - 1)] == rid)
    pos, rpb, rid = pos[ok], rpb[ok], rid[ok]
    take_rows = first[pos]                     # row in vt per request
    out = []
    for i in _bucket_slices(rpb, nb):
        sel = vt.take(pa.array(take_rows[i]))
        out.append(pa.table({"doc_id": pa.array(rid[i]),
                             "emb": sel["emb"]}))
    return _scalar_if_one(out, nb)


def _e5_verify(threshold: float, dim: int, pairs_tbl: pa.Table,
               *vec_slices: pa.Table) -> pa.Table:
    """Wave 5 (per pair bucket): exact float64 cosine over ONLY the
    candidate pairs, unit-normalizing each local vector once."""
    if pairs_tbl.num_rows == 0:
        return _EMPTY_VPAIRS.empty_table()
    vecs = [s for s in vec_slices if s.num_rows]
    vt = pa.concat_tables(vecs)
    vid = vt["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    uniq, first = np.unique(vid, return_index=True)
    m = _unit(_fixed_bin_f32(vt["emb"], dim)[first].astype(np.float64))
    a = pairs_tbl["doc_a"].to_numpy(zero_copy_only=False)
    b = pairs_tbl["doc_b"].to_numpy(zero_copy_only=False)
    ia = np.searchsorted(uniq, a)
    ib = np.searchsorted(uniq, b)
    out_a, out_b = [], []
    for s in range(0, len(ia), _NDP_VERIFY_CHUNK):
        ca, cb = ia[s:s + _NDP_VERIFY_CHUNK], ib[s:s + _NDP_VERIFY_CHUNK]
        sim = np.einsum("ij,ij->i", m[ca], m[cb])
        hit = sim >= threshold
        out_a.append(a[s:s + _NDP_VERIFY_CHUNK][hit])
        out_b.append(b[s:s + _NDP_VERIFY_CHUNK][hit])
    oa = np.concatenate(out_a) if out_a else np.empty(0, np.int64)
    ob = np.concatenate(out_b) if out_b else np.empty(0, np.int64)
    order = np.lexsort((ob, oa))
    return pa.table({"vec_a": pa.array(oa[order], pa.int64()),
                     "vec_b": pa.array(ob[order], pa.int64())})


def cosine_neardup_lsh(ds: ray.data.Dataset, threshold: float, dim: int,
                       n_rows: int | None = None,
                       n_buckets: int | None = None) -> ray.data.Dataset:
    """Near-duplicate pairs by banded random-hyperplane LSH + EXACT verify —
    the scale path the exact block-pair sweep's docstring points to for
    thresholds >= ~0.8 (where band recall is driven to ~1: at cos 0.95 a
    pair misses all 32 8-bit bands with probability ~2e-8; at cos 0.9,
    ~2e-5 — tune bands/rows per threshold). Precision is always exact: every
    candidate is re-verified with the true float64 cosine.

    PAYLOAD-LIGHT shape (the dedup.lsh_verified_pairs wave structure —
    round-4 verdict finding #2 replaced a variant whose band exchange
    carried raw embedding bytes on every band row, wire = bands x corpus x
    dim x 4):

    1. band wave: int-only rows (vec_id, band, band_hash) co-located by
       (band, hash) — the exchange moves 24 bytes/row regardless of dim;
    2. per band bucket: within-run candidate pairs (vectorized
       ``_all_run_pairs``), partitioned by pair-bucket hash;
    3. per pair bucket: global pair dedup (pairs found by several bands
       collapse here — replaces the old first-matching-band ownership, so
       signatures never ride the wire either) + int-only (doc_id, pbucket)
       embedding requests keyed by hash(doc_id);
    4. per doc bucket: join requests to embeddings (packed once as
       fixed_size_binary straight from the contiguous float32 buffer — no
       per-row tobytes loop) and route each pair's two vectors to its
       verify bucket: payload wire cost is O(candidate docs x requesting
       buckets), tracking true near-dup density, never bands x corpus;
    5. per pair bucket: exact float64 cosine verify in bounded chunks.
    """
    from .dedup import _norm, sized_n_buckets

    # coalesce to wave-sized blocks first: upstream unions/filters can leave
    # tiny blocks, and wave cost scales with (#blocks x nb) object count
    mat = (ds.select_columns(["vec_id", "embedding"])
             .map_batches(lambda t: t, batch_format="pyarrow",
                          batch_size=50_000)
             .materialize())
    nb = n_buckets or sized_n_buckets(
        n_rows if n_rows else mat.count(), rows_per_bucket=100_000)
    planes = _ndp_planes(dim)
    blocks = mat.to_arrow_refs()
    if not blocks:
        return ray.data.from_arrow(_EMPTY_VPAIRS.empty_table())
    from .dedup import _w2_band_pairs, _w3_dedup_requests
    e1_t = ray.remote(num_returns=nb)(_e1_split_bands)
    w2_t = ray.remote(num_returns=nb)(_w2_band_pairs)
    w3_t = ray.remote(num_returns=1 + nb)(_w3_dedup_requests)
    d1_t = ray.remote(num_returns=nb)(_e1_split_vecs)
    w4_t = ray.remote(num_returns=nb)(_e4_attach)
    w5_t = ray.remote(_e5_verify)
    pref = ray.put(planes)
    e1 = _norm([e1_t.remote(b, nb, pref) for b in blocks], nb)
    w2 = _norm([w2_t.remote(nb, *[s[j] for s in e1]) for j in range(nb)], nb)
    w3 = [w3_t.remote(nb, j, *[w[j] for w in w2]) for j in range(nb)]
    pair_refs = [r[0] for r in w3]
    req_slices = [r[1:] for r in w3]
    d1 = _norm([d1_t.remote(b, nb, dim) for b in blocks], nb)
    w4 = _norm([w4_t.remote(nb, len(d1), dim,
                            *[s[k] for s in d1],
                            *[req_slices[j][k] for j in range(nb)])
                for k in range(nb)], nb)
    return ray.data.from_arrow_refs(
        [w5_t.remote(threshold, dim, pair_refs[j],
                     *[w4[k][j] for k in range(nb)])
         for j in range(nb)])


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
