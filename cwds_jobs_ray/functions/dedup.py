"""Deduplication operators: exact, MinHash+LSH near-dup (candidates +
exact-verified pairs), duplicate clusters.

Every shipped operator is shuffle-true: no single-task reduces, no
driver-side candidate/edge/label materialization, no full-corpus broadcasts.

- exact dedup: per-block pre-reduce -> content-hash direct bucket exchange.
- near-dup pairs: shingle -> minhash (block-vectorized: ONE hash call per
  block + ``np.minimum.reduceat`` per doc) -> (band, band_hash) bucket
  groupby -> candidate pairs -> pair-bucket dedup -> DISTRIBUTED bucketed
  hash-join of pairs<->texts (each pair's two texts routed to the pair's
  bucket; no task ever sees more than one bucket of candidate texts) ->
  per-bucket exact shingle-set Jaccard. LSH at 16 bands x 4 rows has miss
  probability (1 - j^4)^16 ~ 2e-12 at j=0.95, so the verified output equals
  the brute-force pair set (tests assert equality; ``jaccard_pairs`` below
  is that brute-force verification baseline).
- clusters: verified pairs -> min-label propagation + pointer jumping over
  per-bucket object-store tables exchanged by direct task waves; the driver
  holds only the per-round changed COUNT (frontier-size independence at
  100 TB).

Bucket counts come from ``sized_n_buckets`` — data volume divided into
bounded per-bucket chunks, capped by the cluster-derived
``default_n_buckets()`` (env override ``CWDS_N_BUCKETS``) — so small inputs
get few wide waves while web-scale inputs keep per-bucket state bounded;
results are bucket-count-independent (tested).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from ..schema import from_pandas as _pa_from_pandas

_GOLDEN = np.uint64(0x9E3779B97F4A7C15)

WAVE_MAX_RETURNS = 256  # per-task num_returns ceiling for wave exchanges


def default_n_buckets() -> int:
    """Coarse shuffle-bucket count for keyed finals: 4x cluster CPUs with a
    floor of 64 (so small-machine tests still exercise multi-bucket paths),
    overridable via CWDS_N_BUCKETS, and capped at ``WAVE_MAX_RETURNS`` so a
    wide cluster (256 CPUs -> 4x = 1024) never drives per-task num_returns
    past the object-store-metadata ceiling every wave path is documented to
    honor. Bucket count never affects results — only reduce parallelism and
    per-bucket memory."""
    env = os.environ.get("CWDS_N_BUCKETS")
    if env:
        return max(1, int(env))
    try:
        cpus = int(ray.cluster_resources().get("CPU", 16)) \
            if ray.is_initialized() else 16
    except Exception:  # noqa: BLE001 — sizing heuristic only
        cpus = 16
    return min(WAVE_MAX_RETURNS, max(64, 4 * cpus))


def sized_n_buckets(n_rows: int, rows_per_bucket: int = 200_000,
                    lo: int = 8) -> int:
    """Bucket count derived from BOTH terms the scaling story needs: data
    size (one reduce bucket per ~rows_per_bucket input rows, so per-bucket
    state stays bounded as data grows) capped by cluster size
    (``default_n_buckets`` — more buckets than task slots just multiplies
    scheduling/exchange overhead, which dominates on small inputs).

    Also capped at ``WAVE_MAX_RETURNS``: per-task return counts in the
    thousands stress object-store metadata (the CDC shuffle measured this;
    stages/merge.py bounds it the same way with partition-GROUP slices —
    adopt that grouping here if a deployment ever needs more buckets than
    the cap)."""
    return int(min(default_n_buckets(), WAVE_MAX_RETURNS,
                   max(lo, -(-n_rows // rows_per_bucket))))


def _doc_bucket(ids: np.ndarray, n_buckets: int) -> np.ndarray:
    with np.errstate(over="ignore"):
        h = ids.astype(np.int64).view(np.uint64) * _GOLDEN
        h ^= h >> np.uint64(29)
        return (h % np.uint64(n_buckets)).astype(np.int64)


def _pair_bucket(a: np.ndarray, b: np.ndarray, n_buckets: int) -> np.ndarray:
    # full avalanche before the mod: sequential ids (common for doc_ids)
    # must not correlate with bucket — a plain (a*C ^ b) % n leaves low bits
    # structured and concentrates whole id ranges in a few buckets
    with np.errstate(over="ignore"):
        h = (a.astype(np.int64).view(np.uint64) * _GOLDEN
             ^ b.astype(np.int64).view(np.uint64) * np.uint64(0xC2B2AE3D27D4EB4F))
        h ^= h >> np.uint64(29)
        h *= _GOLDEN
        h ^= h >> np.uint64(32)
        return (h % np.uint64(n_buckets)).astype(np.int64)


# ------------------------------------------------------------------ exact

def exact_dedup(ds: ray.data.Dataset,
                keep_cols: list[str] | None = None,
                n_buckets: int | None = None) -> ray.data.Dataset:
    """Keep the lowest doc_id per exact text; emit copy count (plus the
    winner row's ``keep_cols``, e.g. the text itself for downstream near-dup
    stages — identical text implies identical derived columns).

    Scale shape: per-block pre-reduce (distinct texts per block) -> direct
    bucket exchange keyed by content hash (stages/waves.py) -> vectorized
    per-bucket reduce. The text crosses the wire once per distinct value per
    block, and no stage sees more than one bucket of distinct texts.
    """
    from ..stages.partition import hash_strings
    from ..stages.waves import wave_group_reduce

    nb = n_buckets or default_n_buckets()
    keep = [c for c in (keep_cols or []) if c != "text"]
    out_cols = ["doc_id", "n_copies"] + list(keep_cols or [])

    def pre(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        g = df.groupby("text", sort=False).agg(
            doc_id=("doc_id", "min"), n_copies=("doc_id", "size"),
            **{c: (c, "first") for c in keep}).reset_index()
        out = _pa_from_pandas(g, preserve_index=False)
        bucket = (hash_strings(out["text"]) % np.uint64(nb)).astype(np.int64)
        return out.append_column("bucket", pa.array(bucket))

    def final(bucket_tbl: pa.Table) -> pa.Table:
        g = bucket_tbl.to_pandas().groupby("text", sort=False).agg(
            doc_id=("doc_id", "min"), n_copies=("n_copies", "sum"),
            **{c: (c, "first") for c in keep}).reset_index()
        return _pa_from_pandas(g[out_cols], preserve_index=False)

    pre_ds = ds.map_batches(pre, batch_format="pyarrow")
    return wave_group_reduce(pre_ds, "bucket", nb, final)


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
    """Per-doc MinHash signature over word `shingle`-grams, vectorized across
    the WHOLE block: every doc's shingles are hashed in ONE
    ``pd.util.hash_array`` call, then each permutation's per-doc minimum
    comes from one ``np.minimum.reduceat`` over the concatenated shingle
    array — no per-document Python work beyond building the shingle lists.
    (Duplicate shingles within a doc don't affect the min, so the shingle
    MULTISET is hashed as-is — no per-doc set() pass.)"""
    a, b = _PERMS
    texts = batch["text"].to_pylist()
    n = len(texts)
    if n == 0:
        return pa.table({
            "doc_id": batch["doc_id"],
            "sig": pa.FixedSizeListArray.from_arrays(
                pa.array([], pa.int64()), N_PERM),
        })
    all_sh: list[str] = []
    counts = np.empty(n, dtype=np.int64)
    for i, t in enumerate(texts):
        sh = _shingles(t, shingle)  # always >= 1 entry
        all_sh.extend(sh)
        counts[i] = len(sh)
    hv = (pd.util.hash_array(np.asarray(all_sh, dtype=object))
          .astype(np.int64) & _MERSENNE)
    starts = np.zeros(n, dtype=np.int64)
    np.cumsum(counts[:-1], out=starts[1:])
    sigs = np.empty((n, N_PERM), dtype=np.int64)
    for p in range(N_PERM):
        # (a*x + b) mod prime over ALL shingles at once; 31-bit operands
        # keep the int64 products overflow-free
        vals = (hv * a[p] + b[p]) % _MERSENNE
        sigs[:, p] = np.minimum.reduceat(vals, starts)
    return pa.table({
        "doc_id": batch["doc_id"],
        "sig": pa.FixedSizeListArray.from_arrays(
            pa.array(sigs.reshape(-1)), N_PERM),
    })


_PERMS = _perm_params()


_EMPTY_PAIRS = pa.schema([("doc_a", pa.int64()), ("doc_b", pa.int64()),
                          ("jaccard", pa.float64())])

def _unique_pairs(a: np.ndarray, b: np.ndarray):
    """Deduplicate (a, b) int pairs. Fast path: pack both ids into one int64
    and np.unique it (C-speed sort) — several times faster than a pandas
    hash drop_duplicates on multi-million-pair inputs; falls back to pandas
    when ids don't fit 31 bits."""
    if len(a) == 0:
        return a, b
    if (0 <= a.min() and 0 <= b.min()
            and max(int(a.max()), int(b.max())) < (1 << 31)):
        key = (a.astype(np.int64) << np.int64(31)) | b.astype(np.int64)
        uniq = np.unique(key)
        return (uniq >> np.int64(31)), (uniq & np.int64((1 << 31) - 1))
    df = pd.DataFrame({"a": a, "b": b}).drop_duplicates()
    return df["a"].to_numpy(), df["b"].to_numpy()


DOCS_PER_BUCKET = 20_000  # verify-join bucket sizing: texts per reduce task

_ROWS_PER_BAND = N_PERM // N_BANDS


def _band_rows(batch: pa.Table, nb: int, shingle: int) -> pd.DataFrame:
    """Signatures -> (band, band_hash, doc_id, bucket) rows for one block."""
    sig_t = minhash_signatures(batch, shingle=shingle)
    sig = np.asarray(sig_t["sig"].to_pylist(), dtype=np.int64)
    n = sig.shape[0]
    doc = sig_t["doc_id"].to_numpy(zero_copy_only=False)
    bands = sig.reshape(n, N_BANDS, _ROWS_PER_BAND)
    bh = np.zeros((n, N_BANDS), dtype=np.int64)
    with np.errstate(over="ignore"):
        for r in range(_ROWS_PER_BAND):
            bh = bh * np.int64(1000003) + bands[:, :, r]
    band_col = np.repeat(np.arange(N_BANDS, dtype=np.int64), n)
    bh_flat = bh.T.reshape(-1)
    bucket = ((bh_flat.view(np.uint64) * np.uint64(31)
               + band_col.view(np.uint64)) % np.uint64(nb)).astype(np.int64)
    return pd.DataFrame({"band": band_col, "band_hash": bh_flat,
                         "doc_id": np.tile(doc, N_BANDS), "bucket": bucket})


# --- direct task-wave exchange for the LSH pipeline.
# Rationale (measured): a Ray Data groupby sort-shuffle costs ~1-1.5 s of
# fixed setup per stage at 32 CPUs regardless of payload; the candidate /
# verify exchanges carry tiny int rows, so four groupby stages were pure
# overhead (~7 s for 256 pairs at sf0.1). The same direct num_returns-sliced
# task waves the CDC shuffle uses (stages/merge.py, measured ~10x cheaper
# than Dataset sort-shuffle at this shape) replace them; Datasets remain the
# API boundary (Dataset in, Dataset out).

def _w1_split_bands(block: pa.Table, nb: int, shingle: int) -> list[pa.Table]:
    """Wave 1: per signature block, band rows partitioned by band bucket."""
    df = _band_rows(block, nb, shingle)
    b = df.pop("bucket").to_numpy()
    cols = {c: df[c].to_numpy() for c in df.columns}
    return _scalar_if_one(
        [pa.table({c: pa.array(v[idx]) for c, v in cols.items()})
         for idx in _bucket_slices(b, nb)], nb)


# Per-task candidate-pair ceiling for one band bucket (env override
# CWDS_LSH_RUN_CAP). With shingle-set collapse upstream, runs contain only
# DISTINCT shingle sets, so hitting this means the corpus is pathologically
# self-similar at the chosen granularity — the guard turns a silent
# memory blowup into an actionable error (raise shingle/threshold, or use
# neardup_components which never expands within-group pairs).
_RUN_PAIR_CAP = int(os.environ.get("CWDS_LSH_RUN_CAP", 50_000_000))

# intermediate-temporary bound for pair expansion: each chunk's index
# arrays stay around this many entries (beyond the output itself, whose
# total size is already bounded by _RUN_PAIR_CAP)
_PAIR_CHUNK = 1 << 23


def _all_run_pairs(starts: np.ndarray, lens: np.ndarray, n: int):
    """All (i, j) global index pairs with i < j inside each run, where runs
    are delimited by ``starts``/``lens`` over ``n`` sorted rows.

    One vectorized pass over EVERY run at once: each source row pairs with
    the rows after it in its run, so no per-run Python loop and no O(L^2)
    triu masks (np.triu_indices builds an LxL mask per run — measured 2.3 s
    of a 2.6 s straggler task at sf0.1). Source rows are chunked so
    intermediate temporaries stay around ``_PAIR_CHUNK`` entries."""
    z = np.empty(0, np.int64)
    if n == 0 or len(lens) == 0:
        return z, z
    run_id = np.repeat(np.arange(len(lens)), lens)
    pos = np.arange(n, dtype=np.int64) - starts[run_id]
    rem = lens[run_id].astype(np.int64) - 1 - pos  # targets after each row
    cum = np.cumsum(rem)
    out_a, out_b = [], []
    row = 0
    while row < n:
        base = int(cum[row - 1]) if row else 0
        end = int(np.searchsorted(cum, base + _PAIR_CHUNK, side="left")) + 1
        end = min(max(end, row + 1), n)
        r = rem[row:end]
        tot = int(r.sum())
        if tot:
            ia = np.repeat(np.arange(row, end, dtype=np.int64), r)
            off = (np.arange(tot, dtype=np.int64)
                   - np.repeat(np.cumsum(r) - r, r) + 1)
            out_a.append(ia)
            out_b.append(ia + off)
        row = end
    if not out_a:
        return z, z
    return np.concatenate(out_a), np.concatenate(out_b)


def _w2_band_pairs(nb: int, *slices: pa.Table) -> list[pa.Table]:
    """Wave 2: one band bucket -> its candidate pairs (all pairs within each
    identical (band, band_hash) group), deduped within the task, partitioned
    by pair bucket.

    Run detection is one lexsort; pair expansion is one vectorized pass
    over all runs at once (``_all_run_pairs``). Total pair volume for the
    task is capped at ``_RUN_PAIR_CAP`` (see above)."""
    parts = [s.to_pandas() for s in slices if s.num_rows]
    empty = pa.table({"doc_a": pa.array([], pa.int64()),
                      "doc_b": pa.array([], pa.int64())})
    if not parts:
        return _scalar_if_one([empty] * nb, nb)
    df = pd.concat(parts, ignore_index=True)
    band = df["band"].to_numpy().astype(np.int64)
    bh = df["band_hash"].to_numpy().astype(np.int64)
    doc = df["doc_id"].to_numpy().astype(np.int64)
    order = np.lexsort((doc, bh, band))
    band, bh, doc = band[order], bh[order], doc[order]
    new_run = np.ones(len(doc), dtype=bool)
    new_run[1:] = (band[1:] != band[:-1]) | (bh[1:] != bh[:-1])
    starts = np.flatnonzero(new_run)
    lens = np.diff(np.append(starts, len(doc)))
    total = int((lens.astype(np.int64) * (lens - 1) // 2).sum())
    if total > _RUN_PAIR_CAP:
        raise RuntimeError(
            f"LSH band bucket would generate {total} candidate pairs "
            f"(cap {_RUN_PAIR_CAP}, env CWDS_LSH_RUN_CAP): the corpus is "
            "pathologically self-similar at this shingle size. Raise "
            "shingle/threshold, or use neardup_components for clustering "
            "(it never expands within-group pairs).")
    ia, ib = _all_run_pairs(starts, lens, len(doc))
    if not len(ia):
        return _scalar_if_one([empty] * nb, nb)
    # ids sorted, unique within a run (one row per doc per band)
    da, db_ = _unique_pairs(doc[ia], doc[ib])
    pb = _pair_bucket(da, db_, nb)
    return _scalar_if_one(
        [pa.table({"doc_a": pa.array(da[idx]), "doc_b": pa.array(db_[idx])})
         for idx in _bucket_slices(pb, nb)], nb)


def _w3_dedup_requests(nb: int, pbucket: int, *slices: pa.Table):
    """Wave 3: one pair bucket -> (deduped pairs table, nb request slices
    (doc_id, pbucket) partitioned by hash(doc_id))."""
    parts = [s.to_pandas() for s in slices if s.num_rows]
    if not parts:
        empty_req = pa.table({"doc_id": pa.array([], pa.int64()),
                              "pbucket": pa.array([], pa.int64())})
        return tuple([pa.table({"doc_a": pa.array([], pa.int64()),
                                "doc_b": pa.array([], pa.int64())})]
                     + [empty_req] * nb)
    cat = pd.concat(parts, ignore_index=True)
    pa_, pb_ = _unique_pairs(cat["doc_a"].to_numpy(), cat["doc_b"].to_numpy())
    ptbl = pa.table({"doc_a": pa.array(pa_, pa.int64()),
                     "doc_b": pa.array(pb_, pa.int64())})
    docs = np.unique(np.concatenate([pa_, pb_]))
    db = _doc_bucket(docs, nb)
    reqs = [pa.table({
        "doc_id": pa.array(docs[idx], pa.int64()),
        "pbucket": pa.array(np.full(len(idx), pbucket), pa.int64())})
        for idx in _bucket_slices(db, nb)]
    return tuple([ptbl] + reqs)


def _w1_split_docs(block: pa.Table, nb: int) -> list[pa.Table]:
    """Partition a (doc_id, text) block by hash(doc_id)."""
    if block.num_rows == 0 or "doc_id" not in block.column_names:
        empty = pa.table({"doc_id": pa.array([], pa.int64()),
                          "text": pa.array([], pa.string())})
        return _scalar_if_one([empty] * nb, nb)
    ids = block["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    b = _doc_bucket(ids, nb)
    sel = block.select(["doc_id", "text"])
    return _scalar_if_one(
        [sel.take(pa.array(idx)) for idx in _bucket_slices(b, nb)], nb)


def _w4_attach(nb: int, n_doc_slices: int, *slices: pa.Table) -> list[pa.Table]:
    """Wave 4: one doc bucket joins its requests to its texts and routes
    (doc_id, text) to each requesting pair bucket."""
    docs = [s for s in slices[:n_doc_slices] if s.num_rows]
    reqs = [s.to_pandas() for s in slices[n_doc_slices:] if s.num_rows]
    empty = pa.table({"doc_id": pa.array([], pa.int64()),
                      "text": pa.array([], pa.string())})
    if not docs or not reqs:
        return _scalar_if_one([empty] * nb, nb)
    dtbl = pa.concat_tables(docs).to_pandas().drop_duplicates("doc_id")
    req = pd.concat(reqs, ignore_index=True).drop_duplicates()
    out = req.merge(dtbl, on="doc_id", how="inner")
    pb = out["pbucket"].to_numpy()
    oid = out["doc_id"].to_numpy().astype(np.int64)
    otxt = out["text"].to_numpy()
    return _scalar_if_one(
        [pa.table({"doc_id": pa.array(oid[idx]),
                   "text": pa.array(otxt[idx].tolist(), pa.string())})
         for idx in _bucket_slices(pb, nb)], nb)


def _w5_verify(threshold: float, shingle: int, pairs_tbl: pa.Table,
               *text_slices: pa.Table) -> pa.Table:
    """Wave 5: one pair bucket: exact shingle-SET Jaccard for its pairs over
    a local packed-BITSET matrix (docs x ceil(vocab/64) uint64 words) —
    intersections are bitwise-and + SWAR popcount, 16x less memory traffic
    and several times faster than the float32 einsum it replaces, with
    identical integer-exact results."""
    from .ann import _popcount64

    if pairs_tbl.num_rows == 0:
        return _EMPTY_PAIRS.empty_table()
    texts = [s for s in text_slices if s.num_rows]
    docs = (pa.concat_tables(texts).to_pandas().drop_duplicates("doc_id")
            .sort_values("doc_id"))
    ids_s = docs["doc_id"].to_numpy().astype(np.int64)
    vocab: dict[str, int] = {}
    srows, scols = [], []
    sz = np.zeros(len(ids_s), dtype=np.int64)
    for r, tx in enumerate(docs["text"].tolist()):
        sh_set = set(_shingles(tx, shingle))
        sz[r] = len(sh_set)
        for sh in sh_set:
            scols.append(vocab.setdefault(sh, len(vocab)))
            srows.append(r)
    nwords = max(1, -(-len(vocab) // 64))
    m = np.zeros((len(ids_s), nwords), dtype=np.uint64)
    sr = np.asarray(srows, dtype=np.int64)
    sc = np.asarray(scols, dtype=np.int64)
    np.bitwise_or.at(m, (sr, sc >> 6),
                     np.uint64(1) << (sc & 63).astype(np.uint64))
    a = pairs_tbl["doc_a"].to_numpy(zero_copy_only=False)
    b = pairs_tbl["doc_b"].to_numpy(zero_copy_only=False)
    ia = np.searchsorted(ids_s, a)
    ib = np.searchsorted(ids_s, b)
    # chunk the sweep: m[ia] materializes a (chunk x nwords) temporary, so
    # the chunk bound — not the bucket's pair count — caps peak memory (a
    # degenerate corpus can put millions of pairs in one bucket)
    CH = 65_536
    jac = np.empty(len(a), dtype=np.float64)
    for s in range(0, len(a), CH):
        e = s + CH
        inter = _popcount64(m[ia[s:e]] & m[ib[s:e]]).sum(axis=1)
        jac[s:e] = inter / (sz[ia[s:e]] + sz[ib[s:e]] - inter)
    keep = jac >= threshold
    order = np.lexsort((b[keep], a[keep]))
    return pa.table({"doc_a": pa.array(a[keep][order]),
                     "doc_b": pa.array(b[keep][order]),
                     "jaccard": pa.array(jac[keep][order])})


def _norm(refs, nb):
    return [[r] for r in refs] if nb == 1 else refs


# ------------- shingle-set collapse (the mega-duplicate guard) ----------
# Docs with EQUAL shingle sets are indistinguishable to MinHash and to
# set-Jaccard: identical signatures, identical similarity to every other
# doc. Grouping them FIRST (exact string match on the canonical sorted
# shingle set — subsumes exact-text dedup) means a mega-duplicate cluster
# enters the band waves as one representative row instead of k rows that
# would generate O(k^2) candidate pairs inside a single band task.
# Three waves, all bounded: heads are one row per distinct set per block;
# a local rep's members all come from one block (<= block size); a group's
# global membership lands in hash(rep)'s bucket as int rows.

def _canon_keys(texts: list[str], key_mode) -> list[str]:
    """Canonical equivalence key per doc. ``key_mode`` is an int shingle
    size (canonical shingle SET — the MinHash/Jaccard equivalence: equal
    sets => identical signatures and identical Jaccard to everything) or
    the string "multiset" (sorted word MULTISET — the SimHash equivalence:
    word counts matter, order doesn't)."""
    if key_mode == "multiset":
        return [" ".join(sorted(t.split(" "))) for t in texts]
    return ["\x1f".join(sorted(set(_shingles(t, key_mode)))) for t in texts]


def _g1_split_groups(block: pa.Table, nb: int, key_mode):
    """Collapse wave 1 (per corpus block): group the block's docs by
    canonical key (local rep = min doc_id per key). Returns nb
    HEAD slices (key, rep's text, local_rep) routed by hash(key), then nb
    MEMBER slices (doc_id, local_rep) routed by hash(local_rep)."""
    from ..stages.partition import hash_strings

    empty_h = pa.table({"key": pa.array([], pa.string()),
                        "text": pa.array([], pa.string()),
                        "local_rep": pa.array([], pa.int64())})
    empty_m = pa.table({"doc_id": pa.array([], pa.int64()),
                        "local_rep": pa.array([], pa.int64())})
    if block.num_rows == 0 or "doc_id" not in block.column_names:
        return [empty_h] * nb + [empty_m] * nb
    ids = block["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    texts = block["text"].to_pylist()
    keys = _canon_keys(texts, key_mode)
    df = pd.DataFrame({"doc_id": ids, "key": keys, "text": texts})
    loc = df.groupby("key", sort=False)["doc_id"].transform("min").to_numpy()
    is_head = ids == loc
    heads = pa.table({"key": pa.array(df["key"][is_head].tolist(),
                                      pa.string()),
                      "text": pa.array(df["text"][is_head].tolist(),
                                       pa.string()),
                      "local_rep": pa.array(ids[is_head])})
    hb = (hash_strings(heads["key"].combine_chunks())
          % np.uint64(nb)).astype(np.int64)
    members = pa.table({"doc_id": pa.array(ids[~is_head]),
                        "local_rep": pa.array(loc[~is_head])})
    mb = _doc_bucket(loc[~is_head], nb)
    return ([heads.take(pa.array(i)) for i in _bucket_slices(hb, nb)]
            + [members.take(pa.array(i)) for i in _bucket_slices(mb, nb)])


def _g2_resolve_groups(nb: int, *head_slices: pa.Table):
    """Collapse wave 2 (per key bucket): exact-key groupby across blocks ->
    global rep = min(local_rep). Returns (reps table (doc_id, text) for this
    bucket's keys, then nb mapping slices (local_rep, rep_id) routed by
    hash(local_rep))."""
    parts = [s.to_pandas() for s in head_slices if s.num_rows]
    empty_map = pa.table({"local_rep": pa.array([], pa.int64()),
                          "rep_id": pa.array([], pa.int64())})
    if not parts:
        return tuple([pa.table({"doc_id": pa.array([], pa.int64()),
                                "text": pa.array([], pa.string())})]
                     + [empty_map] * nb)
    df = pd.concat(parts, ignore_index=True)
    rep = df.groupby("key", sort=False)["local_rep"].transform("min")
    lr = df["local_rep"].to_numpy()
    rep_np = rep.to_numpy()
    winners = lr == rep_np
    reps = pa.table({"doc_id": pa.array(lr[winners]),
                     "text": pa.array(df["text"][winners].tolist(),
                                      pa.string())})
    mapping = pa.table({"local_rep": pa.array(lr),
                        "rep_id": pa.array(rep_np)})
    mb = _doc_bucket(lr, nb)
    return tuple([reps] + [mapping.take(pa.array(i))
                           for i in _bucket_slices(mb, nb)])


def _g3_route_members(nb: int, n_blocks: int, *slices: pa.Table):
    """Collapse wave 3 (per local_rep bucket): members learn their GLOBAL
    rep by joining on local_rep; local reps that lost to another block's
    rep become members themselves. Returns nb membership slices
    (rep_id, doc_id) routed by hash(rep_id)."""
    empty = pa.table({"rep_id": pa.array([], pa.int64()),
                      "doc_id": pa.array([], pa.int64())})
    mem = [s.to_pandas() for s in slices[:n_blocks] if s.num_rows]
    mp = [s.to_pandas() for s in slices[n_blocks:] if s.num_rows]
    if not mp:
        return _scalar_if_one([empty] * nb, nb)
    mapping = pd.concat(mp, ignore_index=True)
    out_parts = []
    if mem:
        # every member's local_rep was emitted as a head by its own block,
        # so the mapping join always hits
        m = pd.concat(mem, ignore_index=True).merge(mapping, on="local_rep",
                                                    how="inner")
        out_parts.append(pd.DataFrame({"rep_id": m["rep_id"].to_numpy(),
                                       "doc_id": m["doc_id"].to_numpy()}))
    lost = mapping.loc[mapping["local_rep"] != mapping["rep_id"]]
    if len(lost):
        out_parts.append(pd.DataFrame(
            {"rep_id": lost["rep_id"].to_numpy(),
             "doc_id": lost["local_rep"].to_numpy()}))
    if not out_parts:
        return _scalar_if_one([empty] * nb, nb)
    out = pd.concat(out_parts, ignore_index=True)
    rb = _doc_bucket(out["rep_id"].to_numpy().astype(np.int64), nb)
    t = pa.table({"rep_id": pa.array(out["rep_id"].to_numpy(), pa.int64()),
                  "doc_id": pa.array(out["doc_id"].to_numpy(), pa.int64())})
    return _scalar_if_one([t.take(pa.array(i))
                           for i in _bucket_slices(rb, nb)], nb)


def _g4_membership(*slices: pa.Table) -> pa.Table:
    parts = [s for s in slices if s.num_rows]
    return pa.concat_tables(parts) if parts else pa.table(
        {"rep_id": pa.array([], pa.int64()),
         "doc_id": pa.array([], pa.int64())})


def _collapse_waves(blocks: list, nb: int, key_mode):
    """Returns (reps_refs, membership_refs): reps = one (doc_id, text) row
    per distinct canonical key (min doc_id wins; any member's text is
    equivalent downstream since only the key-equivalence class matters —
    see ``_canon_keys``); membership_refs[k] = (rep_id, doc_id) rows —
    NON-rep members only — for hash(rep_id) bucket k."""
    g1_t = ray.remote(num_returns=2 * nb)(_g1_split_groups)
    g2_t = ray.remote(num_returns=1 + nb)(_g2_resolve_groups)
    g3_t = ray.remote(num_returns=nb)(_g3_route_members)
    g4_t = ray.remote(_g4_membership)
    g1 = [g1_t.remote(b, nb, key_mode) for b in blocks]
    heads = [r[:nb] for r in g1]
    members = [r[nb:] for r in g1]
    g2 = [g2_t.remote(nb, *[h[j] for h in heads]) for j in range(nb)]
    reps_refs = [r[0] for r in g2]
    maps = [r[1:] for r in g2]  # maps[j][k]: key bucket j -> rep bucket k
    g3 = _norm([g3_t.remote(nb, len(members),
                            *[m[k] for m in members],
                            *[maps[j][k] for j in range(nb)])
                for k in range(nb)], nb)
    membership_refs = [g4_t.remote(*[g3[k][r] for k in range(nb)])
                       for r in range(nb)]
    return reps_refs, membership_refs


# ---------------- rep-pair expansion back to member pairs ----------------

def _x1_pair_requests(nb: int, pbucket: int, pairs_tbl: pa.Table):
    """Expansion wave 1 (per pair bucket): distinct rep ids referenced by
    this bucket's verified pairs -> (rep_id, pbucket) slices routed by
    hash(rep_id)."""
    empty = pa.table({"rep_id": pa.array([], pa.int64()),
                      "pbucket": pa.array([], pa.int64())})
    if pairs_tbl.num_rows == 0:
        return _scalar_if_one([empty] * nb, nb)
    reps = np.unique(np.concatenate([
        pairs_tbl["doc_a"].to_numpy(zero_copy_only=False),
        pairs_tbl["doc_b"].to_numpy(zero_copy_only=False)])).astype(np.int64)
    rb = _doc_bucket(reps, nb)
    return _scalar_if_one(
        [pa.table({"rep_id": pa.array(reps[i]),
                   "pbucket": pa.array(np.full(len(i), pbucket), pa.int64())})
         for i in _bucket_slices(rb, nb)], nb)


def _x2_route_members(n_pbuckets: int, membership: pa.Table,
                      *req_slices: pa.Table):
    """Expansion wave 2 (per rep bucket): requested reps' member lists
    routed back to the ``n_pbuckets`` requesting pair buckets."""
    empty = pa.table({"rep_id": pa.array([], pa.int64()),
                      "doc_id": pa.array([], pa.int64())})
    reqs = [s.to_pandas() for s in req_slices if s.num_rows]
    if not reqs or membership.num_rows == 0:
        return _scalar_if_one([empty] * n_pbuckets, n_pbuckets)
    req = pd.concat(reqs, ignore_index=True)
    out = req.merge(membership.to_pandas(), on="rep_id", how="inner")
    pb = out["pbucket"].to_numpy()
    t = pa.table({"rep_id": pa.array(out["rep_id"].to_numpy(), pa.int64()),
                  "doc_id": pa.array(out["doc_id"].to_numpy(), pa.int64())})
    return _scalar_if_one([t.take(pa.array(i))
                           for i in _bucket_slices(pb, n_pbuckets)],
                          n_pbuckets)


def _x3_expand(value_col: str, pairs_tbl: pa.Table,
               *member_slices: pa.Table) -> pa.Table:
    """Expansion wave 3 (per pair bucket): verified REP pairs -> all member
    pairs (ma, mb) for ma in group(rep_a), mb in group(rep_b), the value
    column (jaccard / hamming) unchanged — members are canonically
    EQUIVALENT to their rep, so the pair metric is identical. Fast path:
    both groups singleton (the overwhelmingly common case) passes rows
    through vectorized."""
    if pairs_tbl.num_rows == 0:
        return pairs_tbl
    mem = [s.to_pandas() for s in member_slices if s.num_rows]
    if not mem:
        return pairs_tbl
    a = pairs_tbl["doc_a"].to_numpy(zero_copy_only=False)
    b = pairs_tbl["doc_b"].to_numpy(zero_copy_only=False)
    j = pairs_tbl[value_col].to_numpy(zero_copy_only=False)
    groups = {int(r): g["doc_id"].to_numpy()
              for r, g in pd.concat(mem, ignore_index=True)
              .groupby("rep_id", sort=False)}
    sizes = pd.Series({r: len(v) for r, v in groups.items()}, dtype="int64")
    ga_n = pd.Series(a).map(sizes).fillna(0).to_numpy(dtype=np.int64)
    gb_n = pd.Series(b).map(sizes).fillna(0).to_numpy(dtype=np.int64)
    singleton = (ga_n == 0) & (gb_n == 0)
    out_a = [a[singleton]]
    out_b = [b[singleton]]
    out_j = [j[singleton]]
    for i in np.flatnonzero(~singleton):
        ma = np.append(groups.get(int(a[i]), np.empty(0, np.int64)), a[i])
        mb = np.append(groups.get(int(b[i]), np.empty(0, np.int64)), b[i])
        xa = np.repeat(ma, len(mb))
        xb = np.tile(mb, len(ma))
        out_a.append(np.minimum(xa, xb))
        out_b.append(np.maximum(xa, xb))
        out_j.append(np.full(len(xa), j[i], dtype=j.dtype))
    oa = np.concatenate(out_a).astype(np.int64)
    ob = np.concatenate(out_b).astype(np.int64)
    oj = np.concatenate(out_j)
    order = np.lexsort((ob, oa))
    return pa.table({"doc_a": pa.array(oa[order]),
                     "doc_b": pa.array(ob[order]),
                     value_col: pa.array(oj[order])})


def _x4_intra_pairs(membership: pa.Table, value_col: str,
                    intra_value, value_type: pa.DataType) -> pa.Table:
    """Expansion wave 4 (per rep bucket): within-group pairs at the
    equivalence-class metric value (jaccard 1.0 / hamming 0). A group of k
    docs intrinsically contributes k(k-1)/2 OUTPUT rows — callers that only
    need connectivity should use ``neardup_components`` (star edges, linear
    in k)."""
    empty = pa.schema([("doc_a", pa.int64()), ("doc_b", pa.int64()),
                       (value_col, value_type)])
    if membership.num_rows == 0:
        return empty.empty_table()
    df = membership.to_pandas()
    out_a, out_b = [], []
    for r, g in df.groupby("rep_id", sort=False):
        ids = np.sort(np.append(g["doc_id"].to_numpy(), r))
        ai, bj = np.triu_indices(len(ids), k=1)
        out_a.append(ids[ai])
        out_b.append(ids[bj])
    oa = np.concatenate(out_a)
    ob = np.concatenate(out_b)
    order = np.lexsort((ob, oa))
    return pa.table({"doc_a": pa.array(oa[order], pa.int64()),
                     "doc_b": pa.array(ob[order], pa.int64()),
                     value_col: pa.array(
                         np.full(len(oa), intra_value)).cast(value_type)})


def expand_rep_pairs(pair_refs: list, membership_refs: list, nb: int,
                     value_col: str = "jaccard", intra_value=1.0,
                     value_type: pa.DataType = pa.float64()) -> list:
    """Expand per-bucket verified REP-pair tables back to member pairs via
    a bucketed membership join (waves x1-x4): returns refs of the expanded
    cross-group pairs followed by the per-rep-bucket within-group pairs."""
    npb = len(pair_refs)
    x1_t = ray.remote(num_returns=nb)(_x1_pair_requests)
    x2_t = ray.remote(num_returns=npb)(_x2_route_members)
    x3_t = ray.remote(_x3_expand)
    x4_t = ray.remote(_x4_intra_pairs)
    x1 = _norm([x1_t.remote(nb, j, pair_refs[j]) for j in range(npb)], nb) \
        if npb else []
    x2 = _norm([x2_t.remote(npb, membership_refs[k],
                            *[x1[j][k] for j in range(npb)])
                for k in range(nb)], npb)
    expanded = [x3_t.remote(value_col, pair_refs[j],
                            *[x2[k][j] for k in range(nb)])
                for j in range(npb)]
    intra = [x4_t.remote(m, value_col, intra_value, value_type)
             for m in membership_refs]
    return expanded + intra


def _lsh_waves_mat(mat: ray.data.Dataset, nb: int, shingle: int):
    """Waves 1-3 over a MATERIALIZED (doc_id, text) Dataset: returns
    (per-pbucket pair refs, per-(pbucket -> dbucket) request slice refs)."""
    blocks = mat.to_arrow_refs()
    w1_t = ray.remote(num_returns=nb)(_w1_split_bands)
    w2_t = ray.remote(num_returns=nb)(_w2_band_pairs)
    w3_t = ray.remote(num_returns=1 + nb)(_w3_dedup_requests)
    w1 = _norm([w1_t.remote(b, nb, shingle) for b in blocks], nb)
    w2 = _norm([w2_t.remote(nb, *[s[j] for s in w1]) for j in range(nb)], nb)
    w3 = [w3_t.remote(nb, j, *[w[j] for w in w2]) for j in range(nb)]
    pair_refs = [r[0] for r in w3]
    req_slices = [r[1:] for r in w3]  # req_slices[j][k]: pbucket j -> dbucket k
    return pair_refs, req_slices


def _lsh_waves(ds: ray.data.Dataset, shingle: int, nb: int | None):
    """Waves 1-3 shared by the candidate and verified pipelines: returns
    (nb, materialized docs Dataset, per-pbucket pair refs, per-(pbucket ->
    dbucket) request slice refs).

    ``mat`` is a one-pass materialization whose blocks live in the
    (spillable) object store — the same lifetime a sort-shuffle's map
    outputs would have — and is consumed twice without recompute (signature
    wave + text-routing wave). Everything exchanged between waves is either
    int rows or the candidate docs' texts; the corpus itself never moves."""
    mat = ds.select_columns(["doc_id", "text"]).materialize()
    nb = nb or sized_n_buckets(mat.count(), rows_per_bucket=DOCS_PER_BUCKET)
    pair_refs, req_slices = _lsh_waves_mat(mat, nb, shingle)
    return nb, mat, pair_refs, req_slices


def lsh_candidate_pairs(ds: ray.data.Dataset, shingle: int = 1,
                        n_buckets: int | None = None) -> ray.data.Dataset:
    """MinHash-LSH near-dup candidates: block-vectorized signatures ->
    (band, band_hash) rows co-located by band-bucket hash -> within-bucket
    all-pairs -> per-pair-bucket dedup (pairs found by several bands collapse
    to one row). Exchanged by direct task waves (see module rationale);
    every slice carries small int rows only.

    ``shingle`` sets the feature granularity the estimated Jaccard is over:
    1 = word sets (matches ``jaccard_pairs``); 3+ = word n-gram shingles
    (the usual web-dedup choice when word order matters)."""
    _nb, _mat, pair_refs, _reqs = _lsh_waves(ds, shingle, n_buckets)
    return ray.data.from_arrow_refs(pair_refs)


def _route_candidate_texts(ds: ray.data.Dataset, shingle: int,
                           n_buckets: int | None = None) -> ray.data.Dataset:
    """TEST/INSPECTION surface for the pairs<->texts hash-join: returns
    (pbucket, doc_id, text) — each pair's two texts as routed to that pair's
    verify bucket. The shipped path (lsh_verified_pairs) consumes the same
    wave outputs directly."""
    nb, mat, _pair_refs, req_slices = _lsh_waves(ds, shingle, n_buckets)
    d1_t = ray.remote(num_returns=nb)(_w1_split_docs)
    w4_t = ray.remote(num_returns=nb)(_w4_attach)
    d1 = _norm([d1_t.remote(b, nb) for b in mat.to_arrow_refs()], nb)
    w4 = _norm([w4_t.remote(nb, len(d1),
                            *[s[k] for s in d1],
                            *[req_slices[j][k] for j in range(nb)])
                for k in range(nb)], nb)

    @ray.remote
    def tag(j: int, *slices: pa.Table) -> pa.Table:
        parts = [s for s in slices if s.num_rows]
        t = pa.concat_tables(parts) if parts else pa.table(
            {"doc_id": pa.array([], pa.int64()),
             "text": pa.array([], pa.string())})
        return t.append_column("pbucket",
                               pa.array(np.full(t.num_rows, j), pa.int64()))

    return ray.data.from_arrow_refs(
        [tag.remote(j, *[w4[k][j] for k in range(nb)]) for j in range(nb)])


def _verify_waves(mat: ray.data.Dataset, nb: int, shingle: int,
                  threshold: float) -> list:
    """Waves 1-5 over a materialized (doc_id, text) Dataset: LSH candidates
    plus the distributed pairs<->texts hash-join and exact bitset verify.
    Returns per-pair-bucket refs of verified (doc_a, doc_b, jaccard)."""
    pair_refs, req_slices = _lsh_waves_mat(mat, nb, shingle)
    d1_t = ray.remote(num_returns=nb)(_w1_split_docs)
    w4_t = ray.remote(num_returns=nb)(_w4_attach)
    w5_t = ray.remote(_w5_verify)
    d1 = _norm([d1_t.remote(b, nb) for b in mat.to_arrow_refs()], nb)
    w4 = _norm([w4_t.remote(nb, len(d1),
                            *[s[k] for s in d1],
                            *[req_slices[j][k] for j in range(nb)])
                for k in range(nb)], nb)
    return [w5_t.remote(threshold, shingle, pair_refs[j],
                        *[w4[k][j] for k in range(nb)])
            for j in range(nb)]


def lsh_verified_pairs(ds: ray.data.Dataset, threshold: float,
                       shingle: int = 1,
                       n_buckets: int | None = None,
                       collapse: bool = True) -> ray.data.Dataset:
    """Exact near-dup pairs at scale: LSH candidates, then an exact
    shingle-set Jaccard verify over ONLY the candidate pairs — a fully
    DISTRIBUTED bucketed hash-join over direct task waves:

    0. (``collapse``, default on) docs are first grouped by CANONICAL
       SHINGLE SET — docs with equal sets have identical minhash signatures
       and identical Jaccard to every other doc, so only one representative
       per group enters the band waves. This is the mega-duplicate guard: a
       corpus with 100k exact copies of one page would otherwise put a
       100k-doc run in one band group and generate O(10^10) candidate pairs
       inside a single task; collapsed, it contributes ONE banding row. The
       verified rep pairs are re-expanded to member pairs afterward
       (cross-group jaccard is unchanged; within-group pairs are exactly
       1.0), so the output equals the uncollapsed pair set row for row.
    1. band waves produce per-pair-bucket candidate pairs plus int-only
       (doc_id, pbucket) text requests keyed by hash(doc_id);
    2. each doc bucket inner-joins its requests to its texts and routes each
       pair's two texts to the pair's verify bucket;
    3. each verify bucket builds a local shingle BITSET matrix over ITS docs
       only and verifies its pairs with and+popcount (integer intersections
       — exact rationals, same math as the brute-force baseline).

    Per-task memory is one bucket's candidate texts; the driver holds only
    object refs. Candidate-doc text volume crossing the wire is
    O(candidate docs x requesting buckets), never O(corpus^2) or a
    broadcast. LSH at 16 bands x 4 rows misses a >=0.95-Jaccard pair with
    probability ~2e-12, so the verified output equals the brute-force pair
    set (tests assert equality). NOTE: a group of k set-identical docs
    intrinsically contributes k(k-1)/2 OUTPUT rows; when only connectivity
    is needed use ``neardup_components`` (star edges, linear in k)."""
    mat = ds.select_columns(["doc_id", "text"]).materialize()
    nb = n_buckets or sized_n_buckets(mat.count(),
                                      rows_per_bucket=DOCS_PER_BUCKET)
    if not collapse:
        return ray.data.from_arrow_refs(
            _verify_waves(mat, nb, shingle, threshold))
    reps_refs, membership_refs = _collapse_waves(mat.to_arrow_refs(), nb,
                                                 shingle)
    reps = ray.data.from_arrow_refs(reps_refs).materialize()
    out = _verify_waves(reps, nb, shingle, threshold)
    return ray.data.from_arrow_refs(
        expand_rep_pairs(out, membership_refs, nb,
                         value_col="jaccard", intra_value=1.0,
                         value_type=pa.float64()))


def neardup_components(ds: ray.data.Dataset, threshold: float,
                       shingle: int = 1,
                       n_buckets: int | None = None,
                       max_rounds: int = 64) -> ray.data.Dataset:
    """Connected components of the near-dup graph WITHOUT materializing
    quadratic within-group pairs: collapse docs by canonical shingle set ->
    LSH + exact verify over ONE representative per group -> components over
    rep pairs UNION star edges (rep -> member).

    A group of 100k set-identical docs contributes 100k-1 star edges
    instead of ~5e9 expanded pairs, so per-task memory stays bounded on
    mega-duplicate corpora. The labeling is IDENTICAL to
    ``connected_components(lsh_verified_pairs(...))``: member pairs connect
    exactly the node sets the star edges do (same-set docs always pair at
    jaccard 1.0 >= threshold), and min-label = min doc_id either way."""
    mat = ds.select_columns(["doc_id", "text"]).materialize()
    nb = n_buckets or sized_n_buckets(mat.count(),
                                      rows_per_bucket=DOCS_PER_BUCKET)
    reps_refs, membership_refs = _collapse_waves(mat.to_arrow_refs(), nb,
                                                 shingle)
    reps = ray.data.from_arrow_refs(reps_refs).materialize()
    out = _verify_waves(reps, nb, shingle, threshold)

    @ray.remote
    def star(membership: pa.Table) -> pa.Table:
        return pa.table({"doc_a": membership["rep_id"],
                         "doc_b": membership["doc_id"]})

    edges = ray.data.from_arrow_refs(
        list(out) + [star.remote(m) for m in membership_refs])
    return connected_components(edges, max_rounds=max_rounds,
                                n_buckets=n_buckets)


# ----------------------------------------------- connected components

_EMPTY_CLUSTERS = pa.schema([("doc_id", pa.int64()),
                             ("cluster_id", pa.int64())])


def _scalar_if_one(out: list, nb: int):
    """num_returns=1 treats the whole return as ONE object: a 1-bucket
    split must return the single slice itself, not a 1-element list."""
    return out if nb > 1 else out[0]


def _bucket_slices(b: np.ndarray, nb: int):
    """One stable sort -> per-bucket index slices (O(n log n), not O(nb*n)
    boolean masks — nb can be in the hundreds at cluster scale)."""
    order = np.argsort(b, kind="stable")
    bounds = np.searchsorted(b[order], np.arange(nb + 1))
    return [order[bounds[j]:bounds[j + 1]] for j in range(nb)]


def _split_int_tbl(df: pd.DataFrame, key: str, nb: int) -> list[pa.Table]:
    """Partition an all-int64 frame into nb Arrow tables by hash(key)."""
    cols = {c: df[c].to_numpy().astype(np.int64) for c in df.columns}
    b = _doc_bucket(cols[key], nb)
    return _scalar_if_one([pa.table({c: pa.array(v[idx], pa.int64())
                                     for c, v in cols.items()})
                           for idx in _bucket_slices(b, nb)], nb)


def _cc_split_edges(block: pa.Table, nb: int) -> list[pa.Table]:
    """Symmetrize one pairs block and partition by hash(src)."""
    if block.num_rows == 0 or "doc_a" not in block.column_names:
        # empty upstream map_groups blocks can arrive schema-less
        empty = pa.table({"src": pa.array([], pa.int64()),
                          "dst": pa.array([], pa.int64())})
        return _scalar_if_one([empty] * nb, nb)
    a = block["doc_a"].to_numpy(zero_copy_only=False).astype(np.int64)
    b = block["doc_b"].to_numpy(zero_copy_only=False).astype(np.int64)
    df = pd.DataFrame({"src": np.concatenate([a, b]),
                       "dst": np.concatenate([b, a])})
    return _split_int_tbl(df, "src", nb)


def _cc_build_bucket(*slices: pa.Table):
    """One edge bucket: concat its slices; initial labels = its distinct
    src nodes labeled with themselves. Returns (edges_j, labels_j)."""
    parts = [s for s in slices if s.num_rows]
    e = pa.concat_tables(parts) if parts else pa.table(
        {"src": pa.array([], pa.int64()), "dst": pa.array([], pa.int64())})
    nodes = np.unique(e["src"].to_numpy(zero_copy_only=False)) \
        if e.num_rows else np.empty(0, np.int64)
    lab = pa.table({"node": pa.array(nodes, pa.int64()),
                    "label": pa.array(nodes, pa.int64())})
    return e, lab


def _cc_propose(edges_j: pa.Table, labels_j: pa.Table,
                nb: int) -> list[pa.Table]:
    """Edges propose their source's label to their destination; labels pass
    through for their own node. Local min per node before the exchange."""
    lab = labels_j.to_pandas()
    e = edges_j.to_pandas()
    m = e.merge(lab, left_on="src", right_on="node", how="inner")
    prop = (m.groupby("dst", sort=False)["label"].min().reset_index()
            .rename(columns={"dst": "node"}))
    allp = (pd.concat([prop, lab], ignore_index=True)
            .groupby("node", sort=False)["label"].min().reset_index())
    return _split_int_tbl(allp, "node", nb)


def _cc_reduce(labels_j: pa.Table, *slices: pa.Table):
    """Min-reduce this bucket's proposals against its old labels.
    Returns (new_labels_j, changed_count)."""
    old = labels_j.to_pandas().rename(columns={"label": "old"})
    parts = [s.to_pandas() for s in slices if s.num_rows]
    if not parts or not len(old):
        return labels_j, 0
    cand = (pd.concat(parts, ignore_index=True)
            .groupby("node", sort=False)["label"].min().reset_index())
    out = old.merge(cand, on="node", how="left")
    # fillna with the node's OWN old label, not INT64_MAX: 2^63-1 is not
    # float64-representable, so an int64 cast of that fill would be
    # out-of-range (wraps negative) and silently corrupt cluster labels
    out["label"] = np.minimum(
        out["old"].to_numpy(),
        out["label"].fillna(out["old"]).astype("int64").to_numpy())
    changed = int((out["label"] < out["old"]).sum())
    return pa.table({"node": pa.array(out["node"].to_numpy(), pa.int64()),
                     "label": pa.array(out["label"].to_numpy(), pa.int64())
                     }), changed


def _cc_jump_request(labels_j: pa.Table, nb: int) -> list[pa.Table]:
    """Route each (node, label) row to the bucket owning label's own entry."""
    return _split_int_tbl(labels_j.to_pandas(), "label", nb)


def _cc_jump_resolve(labels_k: pa.Table, nb: int,
                     *reqs: pa.Table) -> list[pa.Table]:
    """label <- label(label): resolve requests against this bucket's label
    map, then route results back to the bucket owning each node."""
    parts = [r.to_pandas() for r in reqs if r.num_rows]
    if not parts:
        return _scalar_if_one(
            [pa.table({"node": pa.array([], pa.int64()),
                       "label": pa.array([], pa.int64())})] * nb, nb)
    req = pd.concat(parts, ignore_index=True)
    lut = labels_k.to_pandas().rename(columns={"node": "lnode",
                                               "label": "llabel"})
    out = req.merge(lut, left_on="label", right_on="lnode", how="left")
    out["label"] = out["llabel"].fillna(out["label"]).astype("int64")
    return _split_int_tbl(out[["node", "label"]], "node", nb)


def _cc_collect(*slices: pa.Table) -> pa.Table:
    parts = [s for s in slices if s.num_rows]
    return pa.concat_tables(parts) if parts else pa.table(
        {"node": pa.array([], pa.int64()), "label": pa.array([], pa.int64())})


def connected_components(pairs: ray.data.Dataset,
                         max_rounds: int = 64,
                         n_buckets: int | None = None) -> ray.data.Dataset:
    """Duplicate clusters from pairs via distributed min-label propagation
    with pointer jumping — NOTHING frontier-sized ever lands on the driver.

    Both the edge set and the node->label map live as per-bucket Arrow
    tables in the object store (hash(node) -> bucket), exchanged by the same
    direct ``num_returns``-sliced task waves the CDC engine's shuffle uses
    (measured ~10x cheaper than Dataset sort-shuffles at this shape,
    stages/merge.py). Each round:

      1. PROPOSE (task per bucket): its edges propose their source's current
         label to their destination; local min per destination, slices
         exchanged to the destinations' buckets;
      2. MIN-REDUCE (task per bucket): new label = min(old, proposals);
         emits the bucket's changed-count (the ONLY value the driver reads);
      3. POINTER JUMP (two waves): label <- label(label) by routing each
         label row to its label's owning bucket and back. Labels only
         decrease and a label is always itself a node id, so the jump just
         shortcuts chains — turning O(diameter) plain propagation into
         O(log n) rounds (a path graph would otherwise need one round/hop).

    Convergence: when step 2 changes nothing, every edge has equal endpoint
    labels, so labels are constant per component (= the component min).

    Returns (doc_id, cluster_id) with cluster_id = min doc_id of the
    component; singletons are omitted (only docs appearing in pairs).
    """
    src = pairs.select_columns(["doc_a", "doc_b"]).materialize()
    n_pairs = src.count()
    if n_pairs == 0:
        return ray.data.from_arrow(_EMPTY_CLUSTERS.empty_table())
    # bucket count sized to the EDGE volume (capped by cluster size): small
    # graphs get few wide waves, web-scale graphs get per-bucket state that
    # stays bounded
    nb = n_buckets or sized_n_buckets(2 * n_pairs)
    blocks = src.to_arrow_refs()

    def norm(refs):
        return [[r] for r in refs] if nb == 1 else refs

    split_t = ray.remote(num_returns=nb)(_cc_split_edges)
    build_t = ray.remote(num_returns=2)(_cc_build_bucket)
    prop_t = ray.remote(num_returns=nb)(_cc_propose)
    red_t = ray.remote(num_returns=2)(_cc_reduce)
    jreq_t = ray.remote(num_returns=nb)(_cc_jump_request)
    jres_t = ray.remote(num_returns=nb)(_cc_jump_resolve)
    coll_t = ray.remote(_cc_collect)

    eslices = norm([split_t.remote(b, nb) for b in blocks])
    built = [build_t.remote(*[s[j] for s in eslices]) for j in range(nb)]
    edge_refs = [b[0] for b in built]
    label_refs = [b[1] for b in built]

    for _ in range(max_rounds):
        pslices = norm([prop_t.remote(edge_refs[j], label_refs[j], nb)
                        for j in range(nb)])
        red = [red_t.remote(label_refs[j], *[ps[j] for ps in pslices])
               for j in range(nb)]
        label_refs = [r[0] for r in red]
        changed = sum(ray.get([r[1] for r in red]))  # nb ints, nothing more
        if changed == 0:
            break
        rq = norm([jreq_t.remote(label_refs[j], nb) for j in range(nb)])
        rs = norm([jres_t.remote(label_refs[k], nb,
                                 *[rq[j][k] for j in range(nb)])
                   for k in range(nb)])
        label_refs = [coll_t.remote(*[rs[k][m] for k in range(nb)])
                      for m in range(nb)]

    out = ray.data.from_arrow_refs(label_refs)
    return out.map_batches(
        lambda t: pa.table({"doc_id": t["node"], "cluster_id": t["label"]}),
        batch_format="pyarrow")


# --------------- prefix-filtered set-containment (subset) join ----------
# Directional near-duplication: doc A is (near-)CONTAINED in doc B when
# |words(A) ∩ words(B)| >= t * |words(A)| — the quote/extraction-dedup
# relation Jaccard misses (a paragraph quoted inside a long page has tiny
# Jaccard but containment 1.0), so MinHash-LSH candidates are WRONG here.
# The exact scale path is the classic prefix filter (AllPairs/PPJoin
# family, Bayardo et al. 2007): order each doc's tokens by ascending
# global document frequency; if |A∩B| >= ceil(t|A|) then at least one of
# A's first (|A| - ceil(t|A|) + 1) tokens — its PREFIX, just ONE token at
# t=1.0 — must appear in B, so candidates are exactly the postings of A's
# prefix tokens. Rarest-first ordering makes those postings the shortest
# available. Completeness does not depend on tie-breaks (any fixed
# per-doc order works); df-ordering is purely the candidate-count
# optimization.

_CONTAIN_PAIR_CAP = int(os.environ.get("CWDS_CONTAIN_PAIR_CAP", 50_000_000))

_EMPTY_CONTAIN = pa.schema([("doc_a", pa.int64()), ("doc_b", pa.int64()),
                            ("n_words_a", pa.int64()),
                            ("containment", pa.float64())])


def _distinct_doc_tokens(block: pa.Table):
    """(doc_ids, token_hashes, parent_row, per-row set size) for one block:
    fully vectorized distinct-(doc, word) extraction — one split kernel,
    one hash_array call, one lexsort."""
    import pyarrow.compute as pc
    n = block.num_rows
    if n == 0:
        z = np.empty(0, np.int64)
        return z, z, np.zeros(0, np.int64)
    words = pc.split_pattern(block["text"], " ")
    par = pc.list_parent_indices(words).to_numpy(zero_copy_only=False)
    flat = words.combine_chunks().flatten() if isinstance(
        words, pa.ChunkedArray) else words.flatten()
    hv = pd.util.hash_array(
        flat.to_numpy(zero_copy_only=False).astype(object)).view(np.int64)
    order = np.lexsort((hv, par))
    par, hv = par[order], hv[order]
    keep = np.ones(len(par), bool)
    keep[1:] = (par[1:] != par[:-1]) | (hv[1:] != hv[:-1])
    par, hv = par[keep], hv[keep]
    sizes = np.bincount(par, minlength=n).astype(np.int64)
    return par, hv, sizes


def _c1_postings(block: pa.Table, nb: int, min_words: int) -> list[pa.Table]:
    """Wave C1 (per doc block): distinct (token, doc) postings partitioned
    by hash(token). ``a_size`` carries |words(doc)| when the doc qualifies
    as an A side (>= min_words), else 0 — the token bucket uses it to know
    which docs need their df routed back."""
    par, hv, sizes = _distinct_doc_tokens(block)
    empty = pa.table({"thash": pa.array([], pa.int64()),
                      "doc_id": pa.array([], pa.int64()),
                      "a_size": pa.array([], pa.int64())})
    if not len(par):
        return _scalar_if_one([empty] * nb, nb)
    ids = block["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    a_size = np.where(sizes >= min_words, sizes, 0)
    tb = _doc_bucket(hv, nb)
    t = pa.table({"thash": pa.array(hv, pa.int64()),
                  "doc_id": pa.array(ids[par], pa.int64()),
                  "a_size": pa.array(a_size[par], pa.int64())})
    return _scalar_if_one([t.take(pa.array(i))
                           for i in _bucket_slices(tb, nb)], nb)


def _c2_df(nb: int, *slices: pa.Table):
    """Wave C2 (per token bucket): document frequency per token; (doc_id,
    thash, df, a_size) routed back by hash(doc_id) for A-side docs only.
    Returns (postings table kept for C4, nb df slices)."""
    empty_df = pa.table({"doc_id": pa.array([], pa.int64()),
                         "thash": pa.array([], pa.int64()),
                         "df": pa.array([], pa.int64()),
                         "a_size": pa.array([], pa.int64())})
    parts = [s for s in slices if s.num_rows]
    if not parts:
        empty_post = pa.table({"thash": pa.array([], pa.int64()),
                               "doc_id": pa.array([], pa.int64())})
        return tuple([empty_post] + [empty_df] * nb)
    cat = pa.concat_tables(parts)
    th = cat["thash"].to_numpy(zero_copy_only=False)
    doc = cat["doc_id"].to_numpy(zero_copy_only=False)
    asz = cat["a_size"].to_numpy(zero_copy_only=False)
    order = np.argsort(th, kind="stable")
    th, doc, asz = th[order], doc[order], asz[order]
    new = np.ones(len(th), bool)
    new[1:] = th[1:] != th[:-1]
    starts = np.flatnonzero(new)
    lens = np.diff(np.append(starts, len(th)))
    df_per_token = np.repeat(lens, lens)  # aligned with sorted rows
    post = pa.table({"thash": pa.array(th, pa.int64()),
                     "doc_id": pa.array(doc, pa.int64())})
    a = asz > 0
    if not a.any():
        return tuple([post] + [empty_df] * nb)
    dbuck = _doc_bucket(doc[a], nb)
    t = pa.table({"doc_id": pa.array(doc[a], pa.int64()),
                  "thash": pa.array(th[a], pa.int64()),
                  "df": pa.array(df_per_token[a], pa.int64()),
                  "a_size": pa.array(asz[a], pa.int64())})
    return tuple([post] + [t.take(pa.array(i))
                           for i in _bucket_slices(dbuck, nb)])


def _c3_prefix(nb: int, threshold: float, *slices: pa.Table):
    """Wave C3 (per doc bucket): each A-side doc's PREFIX — its
    (|A| - ceil(t|A|) + 1) lowest-(df, thash) tokens — routed by
    hash(token) back to the token buckets."""
    empty = pa.table({"thash": pa.array([], pa.int64()),
                      "doc_id": pa.array([], pa.int64())})
    parts = [s for s in slices if s.num_rows]
    if not parts:
        return _scalar_if_one([empty] * nb, nb)
    cat = pa.concat_tables(parts)
    doc = cat["doc_id"].to_numpy(zero_copy_only=False)
    th = cat["thash"].to_numpy(zero_copy_only=False)
    df_ = cat["df"].to_numpy(zero_copy_only=False)
    asz = cat["a_size"].to_numpy(zero_copy_only=False)
    order = np.lexsort((th, df_, doc))
    doc, th, df_, asz = doc[order], th[order], df_[order], asz[order]
    new = np.ones(len(doc), bool)
    new[1:] = doc[1:] != doc[:-1]
    starts = np.flatnonzero(new)
    lens = np.diff(np.append(starts, len(doc)))
    # rows arrive once per (doc, token); a doc's row count == its set size
    alpha = np.ceil(threshold * asz[starts] - 1e-9).astype(np.int64)
    p = np.maximum(asz[starts] - alpha + 1, 1)
    pos = np.arange(len(doc), dtype=np.int64) - np.repeat(starts, lens)
    keep = pos < np.repeat(p, lens)
    th, doc = th[keep], doc[keep]
    tb = _doc_bucket(th, nb)
    t = pa.table({"thash": pa.array(th, pa.int64()),
                  "doc_id": pa.array(doc, pa.int64())})
    return _scalar_if_one([t.take(pa.array(i))
                           for i in _bucket_slices(tb, nb)], nb)


def _c4_candidates(nb: int, postings: pa.Table, *prefix_slices: pa.Table):
    """Wave C4 (per token bucket): prefix rows x this bucket's postings ->
    ordered candidate pairs (doc_a contained-side, doc_b container side),
    partitioned by pair bucket. Volume is sum over prefix tokens of
    df(token) — the quantity rarest-first ordering minimizes."""
    empty = pa.table({"doc_a": pa.array([], pa.int64()),
                      "doc_b": pa.array([], pa.int64())})
    parts = [s for s in prefix_slices if s.num_rows]
    if not parts or postings.num_rows == 0:
        return _scalar_if_one([empty] * nb, nb)
    pref = pa.concat_tables(parts).to_pandas()
    post = postings.to_pandas()
    est = pref.merge(post.groupby("thash", sort=False).size()
                     .rename("df").reset_index(), on="thash", how="inner")
    total = int(est["df"].sum())
    if total > _CONTAIN_PAIR_CAP:
        raise RuntimeError(
            f"containment token bucket would generate {total} candidate "
            f"pairs (cap {_CONTAIN_PAIR_CAP}, env CWDS_CONTAIN_PAIR_CAP): "
            "the corpus vocabulary is too small/self-similar at this "
            "threshold. Raise min_words/threshold or pre-collapse "
            "exact-duplicate docs.")
    cand = pref.merge(post, on="thash", how="inner",
                      suffixes=("_a", "_b"))
    a = cand["doc_id_a"].to_numpy().astype(np.int64)
    b = cand["doc_id_b"].to_numpy().astype(np.int64)
    keep = a != b
    a, b = a[keep], b[keep]
    a, b = _unique_pairs(a, b)  # ordered pairs: no canonicalization
    pb = _pair_bucket(a, b, nb)
    return _scalar_if_one(
        [pa.table({"doc_a": pa.array(a[i], pa.int64()),
                   "doc_b": pa.array(b[i], pa.int64())})
         for i in _bucket_slices(pb, nb)], nb)


def _c6_verify(threshold: float, min_words: int, pairs_tbl: pa.Table,
               *text_slices: pa.Table) -> pa.Table:
    """Wave C6 (per pair bucket): exact word-set containment over the local
    bitset matrix — same SWAR popcount kernel as the Jaccard verify, with
    the asymmetric denominator |A|."""
    from .ann import _popcount64

    if pairs_tbl.num_rows == 0:
        return _EMPTY_CONTAIN.empty_table()
    texts = [s for s in text_slices if s.num_rows]
    docs = (pa.concat_tables(texts).to_pandas().drop_duplicates("doc_id")
            .sort_values("doc_id"))
    ids_s = docs["doc_id"].to_numpy().astype(np.int64)
    vocab: dict[str, int] = {}
    srows, scols = [], []
    sz = np.zeros(len(ids_s), dtype=np.int64)
    for r, tx in enumerate(docs["text"].tolist()):
        wset = set(tx.split(" "))
        sz[r] = len(wset)
        for w in wset:
            scols.append(vocab.setdefault(w, len(vocab)))
            srows.append(r)
    nwords = max(1, -(-len(vocab) // 64))
    m = np.zeros((len(ids_s), nwords), dtype=np.uint64)
    sr = np.asarray(srows, dtype=np.int64)
    sc = np.asarray(scols, dtype=np.int64)
    np.bitwise_or.at(m, (sr, sc >> 6),
                     np.uint64(1) << (sc & 63).astype(np.uint64))
    a = pairs_tbl["doc_a"].to_numpy(zero_copy_only=False)
    b = pairs_tbl["doc_b"].to_numpy(zero_copy_only=False)
    ia = np.searchsorted(ids_s, a)
    ib = np.searchsorted(ids_s, b)
    CH = 65_536
    cont = np.empty(len(a), dtype=np.float64)
    for s in range(0, len(a), CH):
        e = s + CH
        inter = _popcount64(m[ia[s:e]] & m[ib[s:e]]).sum(axis=1)
        cont[s:e] = inter / sz[ia[s:e]]
    keep = (cont >= threshold) & (sz[ia] >= min_words)
    order = np.lexsort((b[keep], a[keep]))
    return pa.table({"doc_a": pa.array(a[keep][order]),
                     "doc_b": pa.array(b[keep][order]),
                     "n_words_a": pa.array(sz[ia[keep]][order], pa.int64()),
                     "containment": pa.array(cont[keep][order])})


def containment_pairs(ds: ray.data.Dataset, threshold: float = 1.0,
                      min_words: int = 20,
                      n_buckets: int | None = None) -> ray.data.Dataset:
    """Exact directional word-set containment join: all ORDERED pairs
    (doc_a, doc_b) with |words(a) ∩ words(b)| >= threshold * |words(a)|,
    a != b, |words(a)| >= min_words. See the module note above for the
    prefix-filter construction; at threshold=1.0 every A-side doc emits
    exactly ONE prefix token (its globally rarest), so the candidate set is
    one posting-list scan per doc.

    Scale shape: the corpus crosses the wire once as distinct (token, doc)
    int postings (the inverted-index build), df rows come back only for
    A-side docs, candidates are int pairs bounded by prefix-postings
    volume (capped per task), and texts move only for candidate docs —
    the same pairs<->texts bucketed hash-join the Jaccard verify uses
    (_w3/_w1_split_docs/_w4_attach are reused verbatim)."""
    mat = ds.select_columns(["doc_id", "text"]).materialize()
    nb = n_buckets or sized_n_buckets(mat.count(),
                                      rows_per_bucket=DOCS_PER_BUCKET)
    blocks = mat.to_arrow_refs()
    c1_t = ray.remote(num_returns=nb)(_c1_postings)
    c2_t = ray.remote(num_returns=1 + nb)(_c2_df)
    c3_t = ray.remote(num_returns=nb)(_c3_prefix)
    c4_t = ray.remote(num_returns=nb)(_c4_candidates)
    w3_t = ray.remote(num_returns=1 + nb)(_w3_dedup_requests)
    d1_t = ray.remote(num_returns=nb)(_w1_split_docs)
    w4_t = ray.remote(num_returns=nb)(_w4_attach)
    c6_t = ray.remote(_c6_verify)

    c1 = _norm([c1_t.remote(b, nb, min_words) for b in blocks], nb)
    c2 = [c2_t.remote(nb, *[s[j] for s in c1]) for j in range(nb)]
    post_refs = [r[0] for r in c2]
    df_slices = [r[1:] for r in c2]  # df_slices[j][k]: token j -> doc k
    c3 = _norm([c3_t.remote(nb, threshold,
                            *[df_slices[j][k] for j in range(nb)])
                for k in range(nb)], nb)
    c4 = _norm([c4_t.remote(nb, post_refs[j], *[c3[k][j] for k in range(nb)])
                for j in range(nb)], nb)
    w3 = [w3_t.remote(nb, j, *[c4[k][j] for k in range(nb)])
          for j in range(nb)]
    pair_refs = [r[0] for r in w3]
    req_slices = [r[1:] for r in w3]
    d1 = _norm([d1_t.remote(b, nb) for b in blocks], nb)
    w4 = _norm([w4_t.remote(nb, len(d1),
                            *[s[k] for s in d1],
                            *[req_slices[j][k] for j in range(nb)])
                for k in range(nb)], nb)
    return ray.data.from_arrow_refs(
        [c6_t.remote(threshold, min_words, pair_refs[j],
                     *[w4[k][j] for k in range(nb)])
         for j in range(nb)])
