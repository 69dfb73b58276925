"""Deduplication operators: exact, MinHash+LSH near-dup (candidates +
exact-verified pairs), duplicate clusters.

Every shipped operator is shuffle-true: no single-task reduces, no
driver-side edge materialization, no full-corpus broadcasts.

- exact dedup: per-block pre-reduce -> content-hash bucket groupby.
- near-dup pairs: shingle -> minhash -> (band, band_hash) bucket groupby ->
  candidate pairs -> pair-bucket dedup -> distributed hash-join back to the
  texts -> exact Jaccard verify. LSH at 16 bands x 4 rows has miss
  probability (1 - j^4)^16 ~ 2e-12 at j=0.95, so the verified output equals
  the brute-force pair set (tests assert equality; ``jaccard_pairs`` below
  is that brute-force verification baseline).
- clusters: verified pairs -> iterative min-label propagation where the edge
  set STAYS a Dataset; only the (node, label) frontier — bounded by the
  number of duplicated docs, not edges — is driver-resident per round.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

N_BUCKETS = 64  # coarse shuffle buckets for keyed finals (tune ~ cluster size)


# ------------------------------------------------------------------ exact

def exact_dedup(ds: ray.data.Dataset,
                keep_cols: list[str] | None = None) -> ray.data.Dataset:
    """Keep the lowest doc_id per exact text; emit copy count (plus the
    winner row's ``keep_cols``, e.g. the text itself for downstream near-dup
    stages — identical text implies identical derived columns).

    Scale shape: per-block pre-reduce (distinct texts per block) -> shuffle
    keyed by content hash into coarse buckets -> vectorized per-bucket
    reduce. The text crosses the wire once per distinct value per block, and
    no stage sees more than one bucket of distinct texts.
    """
    from ..stages.partition import hash_strings

    keep = [c for c in (keep_cols or []) if c != "text"]
    out_cols = ["doc_id", "n_copies"] + list(keep_cols or [])

    def pre(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        g = df.groupby("text", sort=False).agg(
            doc_id=("doc_id", "min"), n_copies=("doc_id", "size"),
            **{c: (c, "first") for c in keep}).reset_index()
        out = pa.Table.from_pandas(g, preserve_index=False)
        bucket = (hash_strings(out["text"]) % np.uint64(N_BUCKETS)).astype(np.int64)
        return out.append_column("bucket", pa.array(bucket))

    def final(bucket_tbl: pa.Table) -> pa.Table:
        g = bucket_tbl.to_pandas().groupby("text", sort=False).agg(
            doc_id=("doc_id", "min"), n_copies=("n_copies", "sum"),
            **{c: (c, "first") for c in keep}).reset_index()
        return pa.Table.from_pandas(g[out_cols], preserve_index=False)

    pre_ds = ds.map_batches(pre, batch_format="pyarrow")
    return pre_ds.groupby("bucket").map_groups(final, batch_format="pyarrow")


# ------------------------------------------- word-set Jaccard (brute force)

def _doc_term_matrix(texts: list[str]):
    """Boolean doc x vocab matrix over distinct words (verification use)."""
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
    """All pairs (a < b) with word-set Jaccard >= threshold, by brute force
    (corpus matrix broadcast + per-block matmul).

    VERIFICATION BASELINE ONLY: tests compare ``lsh_verified_pairs`` against
    this; the shipped operators never broadcast the corpus.
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


def _shingles(text: str, shingle: int) -> list[str]:
    ws = text.split(" ")
    if len(ws) >= shingle:
        return [" ".join(ws[k:k + shingle]) for k in range(len(ws) - shingle + 1)]
    return [text]


def minhash_signatures(batch: pa.Table, shingle: int = 3) -> pa.Table:
    """Per-doc MinHash signature over word `shingle`-grams (vectorized over
    each doc's shingle set)."""
    a, b = _PERMS
    texts = batch["text"].to_pylist()
    sigs = np.empty((len(texts), N_PERM), dtype=np.int64)
    for i, t in enumerate(texts):
        hv = (pd.util.hash_array(np.asarray(_shingles(t, shingle), dtype=object))
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
    -> BUCKETED groupby (same-bucket rows co-located by hash of the band
    key, N_BUCKETS reduce groups, vectorized within) -> within-bucket pairs
    -> pair-bucket groupby dedup (pairs found by several bands collapse to
    one row). Every shuffle carries small int rows only.

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
        with np.errstate(over="ignore"):
            for r in range(rows_per_band):
                bh = bh * np.int64(1000003) + bands[:, :, r]
        band_col = np.repeat(np.arange(N_BANDS, dtype=np.int64), n)
        bh_flat = bh.T.reshape(-1)
        bucket = ((bh_flat.view(np.uint64) * np.uint64(31)
                   + band_col.view(np.uint64)) % np.uint64(N_BUCKETS)
                  ).astype(np.int64)
        return pa.table({
            "band": pa.array(band_col, pa.int32()),
            "band_hash": pa.array(bh_flat),
            "doc_id": pa.array(np.tile(doc, N_BANDS)),
            "bucket": pa.array(bucket),
        })

    def bucket_pairs(t: pa.Table) -> pa.Table:
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
                             "doc_b": pa.array([], pa.int64()),
                             "pbucket": pa.array([], pa.int64())})
        a = np.concatenate(out_a)
        b = np.concatenate(out_b)
        pb = ((a.view(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
               ^ b.view(np.uint64)) % np.uint64(N_BUCKETS)).astype(np.int64)
        return pa.table({"doc_a": pa.array(a), "doc_b": pa.array(b),
                         "pbucket": pa.array(pb)})

    def dedup_pairs(t: pa.Table) -> pa.Table:
        df = t.to_pandas().drop_duplicates(["doc_a", "doc_b"])
        return pa.Table.from_pandas(df[["doc_a", "doc_b"]],
                                    preserve_index=False)

    sigs = ds.map_batches(minhash_signatures, batch_format="pyarrow",
                          fn_kwargs={"shingle": shingle})
    bands = sigs.map_batches(explode_bands, batch_format="pyarrow")
    pairs = bands.groupby("bucket").map_groups(bucket_pairs,
                                               batch_format="pyarrow")
    return pairs.groupby("pbucket").map_groups(dedup_pairs,
                                               batch_format="pyarrow")


_EMPTY_PAIRS = pa.schema([("doc_a", pa.int64()), ("doc_b", pa.int64()),
                          ("jaccard", pa.float64())])


def lsh_verified_pairs(ds: ray.data.Dataset, threshold: float,
                       shingle: int = 1) -> ray.data.Dataset:
    """Exact near-dup pairs at scale: LSH candidates, then an exact
    shingle-set Jaccard verify over ONLY the candidate pairs.

    The verify side ships the texts of the candidate doc set — docs that
    collided in some LSH bucket, i.e. near-dups and their rare false
    positives — via one ``ray.put`` (the small-side broadcast pattern);
    volume is O(candidate docs), never O(corpus). If a pathological corpus
    made the candidate set itself huge, swap this stage for a bucketed
    hash-join of pairs↔texts (``Dataset.join``); the candidate pipeline is
    unchanged.
    """
    cands = lsh_candidate_pairs(ds, shingle=shingle).materialize()
    id_blocks = [
        np.concatenate([b["doc_a"].to_numpy(zero_copy_only=False),
                        b["doc_b"].to_numpy(zero_copy_only=False)])
        for b in cands.iter_batches(batch_format="pyarrow")]
    cand_ids = np.unique(np.concatenate(id_blocks or [np.empty(0, np.int64)]))
    if len(cand_ids) == 0:
        return ray.data.from_arrow(_EMPTY_PAIRS.empty_table())

    # fetch ONLY the candidate docs' texts (isin filter applied per block at
    # the scan side, nothing else reaches the driver)
    idref = ray.put(cand_ids)

    def pick(t: pa.Table) -> pa.Table:
        ids = ray.get(idref)
        keep = np.isin(t["doc_id"].to_numpy(zero_copy_only=False), ids)
        return t.filter(pa.array(keep))

    cand_doc_refs = (ds.select_columns(["doc_id", "text"])
                     .map_batches(pick, batch_format="pyarrow")
                     .to_arrow_refs())

    @ray.remote
    def build_matrix(*blocks: pa.Table):
        """Candidate-docs shingle matrix, built in a task (the driver only
        passes block refs — candidate texts never land on the driver):
        verify becomes one einsum per pair batch (intersections as integer
        dot products, exact rationals — same math as the brute-force
        baseline), never a per-pair Python loop. Dense is fine: rows =
        candidate docs only."""
        t = pa.concat_tables(blocks)
        order = np.argsort(t["doc_id"].to_numpy(zero_copy_only=False))
        t = t.take(pa.array(order))
        sorted_ids = t["doc_id"].to_numpy(zero_copy_only=False)
        texts = t["text"].to_pylist()
        vocab: dict[str, int] = {}
        srows, scols = [], []
        for r, tx in enumerate(texts):
            for sh in set(_shingles(tx, shingle)):
                scols.append(vocab.setdefault(sh, len(vocab)))
                srows.append(r)
        m = np.zeros((len(texts), len(vocab)), dtype=np.float32)
        m[srows, scols] = 1.0
        return (sorted_ids.astype(np.int64), m,
                m.sum(axis=1).astype(np.int64))

    mref = build_matrix.remote(*cand_doc_refs)

    def verify(batch: pa.Table) -> pa.Table:
        ids_s, mm, sz = ray.get(mref)
        a = batch["doc_a"].to_numpy(zero_copy_only=False)
        b = batch["doc_b"].to_numpy(zero_copy_only=False)
        ia = np.searchsorted(ids_s, a)
        ib = np.searchsorted(ids_s, b)
        inter = np.einsum("ij,ij->i", mm[ia], mm[ib]).astype(np.int64)
        jac = inter / (sz[ia] + sz[ib] - inter)
        keep = jac >= threshold
        order = np.lexsort((b[keep], a[keep]))
        return pa.table({"doc_a": pa.array(a[keep][order]),
                         "doc_b": pa.array(b[keep][order]),
                         "jaccard": pa.array(jac[keep][order])})

    return cands.map_batches(verify, batch_format="pyarrow",
                             batch_size=65536)


# ----------------------------------------------- connected components

def connected_components(pairs: ray.data.Dataset,
                         max_rounds: int = 30) -> ray.data.Dataset:
    """Duplicate clusters from pairs via iterative min-label propagation.

    The EDGE SET stays a Dataset throughout (materialized once so rounds
    don't re-execute the pair pipeline). Per round every edge proposes the
    smaller endpoint label to the larger; proposals are min-reduced per node
    block-locally, then folded into the label frontier. Only the frontier —
    O(#docs that appear in any pair), typically a tiny fraction of the
    corpus — is driver-resident; at extreme duplication swap it for a keyed
    label Dataset with a bucketed join per round (same round body).
    Converges in O(component diameter) rounds.

    Returns (doc_id, cluster_id) with cluster_id = min doc_id of the
    component; singletons are omitted (only docs appearing in pairs).
    """
    edges = pairs.select_columns(["doc_a", "doc_b"]).materialize()

    # frontier init: every node its own label (distinct nodes per block ->
    # small driver fold)
    def nodes_partial(t: pa.Table) -> pa.Table:
        u = np.unique(np.concatenate([
            t["doc_a"].to_numpy(zero_copy_only=False),
            t["doc_b"].to_numpy(zero_copy_only=False)]))
        return pa.table({"node": pa.array(u, pa.int64())})

    node_blocks = edges.map_batches(nodes_partial, batch_format="pyarrow")
    nodes = np.unique(np.concatenate(
        [b["node"].to_numpy(zero_copy_only=False)
         for b in node_blocks.iter_batches(batch_format="pyarrow")]
        or [np.empty(0, np.int64)]))
    if len(nodes) == 0:
        return ray.data.from_arrow(pa.table({
            "doc_id": pa.array([], pa.int64()),
            "cluster_id": pa.array([], pa.int64())}))
    labels = nodes.copy()  # labels[i] = label of nodes[i]

    for _ in range(max_rounds):
        ref = ray.put((nodes, labels))

        def propose(t: pa.Table) -> pa.Table:
            nd, lb = ray.get(ref)  # node->label frontier, local object store
            a = t["doc_a"].to_numpy(zero_copy_only=False)
            b = t["doc_b"].to_numpy(zero_copy_only=False)
            la = lb[np.searchsorted(nd, a)]
            lo = lb[np.searchsorted(nd, b)]
            m = np.minimum(la, lo)
            # per-block min per node bounds the driver fold to distinct
            # nodes per block
            tgt = np.concatenate([a, b])
            val = np.concatenate([m, m])
            order = np.argsort(tgt, kind="stable")
            tgt, val = tgt[order], val[order]
            first = np.ones(len(tgt), dtype=bool)
            first[1:] = tgt[1:] != tgt[:-1]
            starts = np.flatnonzero(first)
            return pa.table({
                "node": pa.array(tgt[starts], pa.int64()),
                "label": pa.array(np.minimum.reduceat(val, starts), pa.int64()),
            })

        new_labels = labels.copy()
        changed = False
        for blk in edges.map_batches(
                propose, batch_format="pyarrow").iter_batches(
                batch_format="pyarrow"):
            idx = np.searchsorted(nodes, blk["node"].to_numpy(zero_copy_only=False))
            lab = blk["label"].to_numpy(zero_copy_only=False)
            upd = lab < new_labels[idx]
            if upd.any():
                changed = True
                np.minimum.at(new_labels, idx[upd], lab[upd])
        labels = new_labels
        if not changed:
            break

    return ray.data.from_arrow(pa.table({
        "doc_id": pa.array(nodes, pa.int64()),
        "cluster_id": pa.array(labels, pa.int64())}))
