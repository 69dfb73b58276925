"""Text-analysis stages for large-scale training-data pipelines: quality
scoring, language ID, token counting, fingerprinting, SimHash.

All stages are vectorized ``map_batches`` transforms (regexes/tables compiled
once per actor in ``__init__`` where state exists). The documents table's
``text`` is single-space-separated tokens, so token counts are exact via
space counting — the same formula the SQL oracles use.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

# English function-word markers for the language-ID heuristic. Deliberately
# expressible in SQL so the oracle can replicate the decision exactly.
EN_MARKERS = ("the", "a", "of", "and", "to", "in", "is")
EN_THRESHOLD = 3  # >= this many marker tokens -> "en"


def n_words(text_col: pa.ChunkedArray) -> pa.Array:
    """Whitespace token count = spaces + 1 (single-space separated corpus)."""
    total = pc.utf8_length(text_col)
    no_spaces = pc.utf8_length(pc.replace_substring(text_col, " ", ""))
    return pc.add(pc.subtract(total, no_spaces), 1)


def quality_features(batch: pa.Table) -> pa.Table:
    """Per-doc quality features (length / word stats / stopword ratio)."""
    from ..queries import round_half_away

    text = batch["text"]
    nw = n_words(text)
    nchars = pc.utf8_length(text)
    stop = _marker_counts(text)
    ratio = round_half_away(
        stop.astype(np.float64) / nw.to_numpy(zero_copy_only=False), 4)
    return pa.table({
        "doc_id": batch["doc_id"],
        "n_chars_calc": pc.cast(nchars, pa.int64()),
        "n_words": pc.cast(nw, pa.int64()),
        "n_stopwords": pa.array(stop, pa.int64()),
        "stopword_ratio": pa.array(ratio),
    })


def _marker_counts(text_col) -> np.ndarray:
    """Count EN marker tokens per document, vectorized via pandas str ops."""
    s = pd.Series(text_col.to_pandas())
    counts = np.zeros(len(s), dtype=np.int64)
    # double every space so adjacent tokens don't share the boundary space
    # (str.count matches are non-overlapping), then count " w " exactly
    padded = " " + s.str.replace(" ", "  ", regex=False) + " "
    for w in EN_MARKERS:
        counts += padded.str.count(f" {w} ").to_numpy()
    return counts


def lang_id(batch: pa.Table) -> pa.Table:
    """n-gram-free marker-density language ID: 'en' iff >= EN_THRESHOLD
    marker tokens. (A deliberately simple, oracle-replicable heuristic;
    swap in a real classifier via the same actor-pool slot.)"""
    stop = _marker_counts(batch["text"])
    pred = np.where(stop >= EN_THRESHOLD, "en", "other")
    return pa.table({
        "doc_id": batch["doc_id"],
        "lang": batch["lang"],
        "lang_pred": pa.array(pred, pa.string()),
    })


def _utf8_buffer_slices(col):
    """Per-chunk (n, offsets, data-memoryview, valid) over a string
    column's UTF-8 buffers — rows are hashed as memoryview slices of the
    Arrow data buffer, so no Python string is ever materialized (Arrow
    already stores UTF-8; the old ``to_pylist`` + ``str.encode`` path
    decoded and re-encoded every row before hashing). ``valid`` is None
    when the chunk has no nulls, else a bool array — null rows must NOT
    be hashed as the empty string (SQL md5(NULL) is NULL)."""
    chunks = col.chunks if isinstance(col, pa.ChunkedArray) else [col]
    for ch in chunks:
        if len(ch) == 0:
            continue
        width, dt = (8, np.int64) if pa.types.is_large_string(ch.type) \
            else (4, np.int32)
        offs = np.frombuffer(ch.buffers()[1], dtype=dt, count=len(ch) + 1,
                             offset=ch.offset * width)
        data = memoryview(ch.buffers()[2] or b"")
        valid = ch.is_valid().to_numpy(zero_copy_only=False) \
            if ch.null_count else None
        yield len(ch), offs, data, valid


def md5_prefix_mod(col, mod: int) -> np.ndarray:
    """int(md5(text).hexdigest()[:8], 16) % mod per row — the content-hash
    bucketing primitive of the split/sample operators. The first 8 hex
    digits ARE the first 4 digest bytes big-endian, so this hashes the raw
    UTF-8 buffer slice and never builds hex strings. md5 itself is the
    oracle contract (DuckDB md5()); hashing stays C-level per row."""
    n = len(col)
    out = np.empty(n, np.int64)
    i = 0
    for cn, offs, data, valid in _utf8_buffer_slices(col):
        for j in range(cn):
            if valid is not None and not valid[j]:
                # SQL md5(NULL) is NULL: NULL == 0 and NULL < rate are
                # both false, so the sentinel `mod` (never produced by
                # % mod) makes every caller predicate behave like SQL
                out[i] = mod
            else:
                out[i] = int.from_bytes(
                    hashlib.md5(data[offs[j]:offs[j + 1]]).digest()[:4],
                    "big") % mod
            i += 1
    return out


def md5_hex_rows(col, id_prefix: np.ndarray | None = None) -> list[str]:
    """md5 hex per row over the raw UTF-8 buffer slices; with
    ``id_prefix``, row i hashes ``f"{id_prefix[i]}|" + text`` (the
    deterministic-shuffle key) without building the concatenated string."""
    out: list[str | None] = []
    i = 0
    for cn, offs, data, valid in _utf8_buffer_slices(col):
        for j in range(cn):
            if valid is not None and not valid[j]:
                out.append(None)  # SQL md5(NULL) is NULL
            elif id_prefix is None:
                out.append(hashlib.md5(data[offs[j]:offs[j + 1]]).hexdigest())
            else:
                h = hashlib.md5(b"%d|" % id_prefix[i])
                h.update(data[offs[j]:offs[j + 1]])
                out.append(h.hexdigest())
            i += 1
    return out


def md5_fingerprint(batch: pa.Table) -> pa.Table:
    """Content fingerprint (md5 hex). Hashing is C-speed hashlib over raw
    Arrow buffer slices; for pure-vectorized scale use the SimHash below."""
    fp = md5_hex_rows(batch["text"])
    return pa.table({"doc_id": batch["doc_id"], "fp": pa.array(fp, pa.string())})


# ----------------------------------------------------- BPE-ish tokenizer

# GPT-2-style pretokenization pattern (public; simplified to stdlib `re`:
# no \p classes). Contractions, letter runs, digit runs, punctuation runs,
# whitespace runs.
BPE_PATTERN = (r"'s|'t|'re|'ve|'m|'ll|'d"
               r"| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+|\s+(?!\S)|\s+")


class BpeTokenCounter:
    """Actor-pool stage: count BPE-ish pretokens per document.

    The compiled regex is per-actor state (built ONCE in ``__init__`` — the
    reference's load-once worker state, ST1/ST5); ``__call__`` does the
    per-batch work. Use with ``map_batches(BpeTokenCounter, concurrency=N)``.
    """

    def __init__(self):
        import re

        self.pat = re.compile(BPE_PATTERN)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        counts = np.fromiter((len(self.pat.findall(t)) for t in texts),
                             dtype=np.int64, count=len(texts))
        return pa.table({"doc_id": batch["doc_id"],
                         "n_bpe_tokens": pa.array(counts)})


# ------------------------------------------------- rolling-hash winnowing

WINNOW_K = 5   # character k-gram length
WINNOW_W = 4   # window size (fingerprints = per-window minima)
_ROLL_BASE = np.uint64(257)
_ROLL_MOD_MASK = np.uint64((1 << 61) - 1)


def _kgram_hashes(text: str) -> np.ndarray:
    """Polynomial rolling hashes of all k-grams — one vectorized pass.
    (Single-doc helper kept for tests/reference; the shipped batch path
    below hashes every doc's bytes in one concatenated pass.)"""
    b = np.frombuffer(text.encode("utf-8", "ignore"), dtype=np.uint8)
    n = len(b) - WINNOW_K + 1
    if n <= 0:
        return np.zeros(0, dtype=np.uint64)
    h = np.zeros(n, dtype=np.uint64)
    for j in range(WINNOW_K):  # K tiny vectorized passes, not a per-char loop
        h = (h * _ROLL_BASE + b[j:j + n]) & _ROLL_MOD_MASK
    return h


def _segmented_arange(starts: np.ndarray, lengths: np.ndarray) -> np.ndarray:
    """Concatenation of arange(starts[i], starts[i]+lengths[i]) — the
    standard vectorized segmented-range construction."""
    total = int(lengths.sum())
    if total == 0:
        return np.zeros(0, dtype=np.int64)
    excl = np.zeros(len(lengths), dtype=np.int64)
    np.cumsum(lengths[:-1], out=excl[1:])
    return (np.arange(total, dtype=np.int64)
            - np.repeat(excl, lengths) + np.repeat(starts, lengths))


def winnow_fingerprints(batch: pa.Table) -> pa.Table:
    """Winnowing document fingerprints (Schleimer et al., SIGMOD 2003
    public algorithm): k-gram rolling hashes -> per-window minima -> the
    document's fingerprint set. Emits set size + min fingerprint per doc
    (compact sketch columns; the full set is derivable deterministically).

    Vectorized across the WHOLE block: all docs' bytes concatenate into one
    buffer hashed in K passes; k-grams spanning doc boundaries are excluded
    by per-doc valid ranges; window minima come from one global sliding-min;
    per-doc distinct counts from one lexsort + run-boundary scan. The only
    per-doc Python is the encode."""
    texts = batch["text"].to_pylist()
    n = len(texts)
    n_fp = np.zeros(n, dtype=np.int64)
    min_fp = np.zeros(n, dtype=np.int64)
    if n == 0 or not any(texts):
        return pa.table({"doc_id": batch["doc_id"],
                         "n_fingerprints": pa.array(n_fp),
                         "min_fingerprint": pa.array(min_fp)})
    bufs = [t.encode("utf-8", "ignore") for t in texts]
    lens = np.fromiter((len(b) for b in bufs), dtype=np.int64, count=n)
    big = np.frombuffer(b"".join(bufs), dtype=np.uint8)
    bstart = np.zeros(n, dtype=np.int64)
    np.cumsum(lens[:-1], out=bstart[1:])
    nh = np.maximum(lens - WINNOW_K + 1, 0)  # valid k-gram count per doc
    gN = len(big) - WINNOW_K + 1
    h = np.zeros(max(gN, 0), dtype=np.uint64)
    for j in range(WINNOW_K):
        h = (h * _ROLL_BASE + big[j:j + gN]) & _ROLL_MOD_MASK
    # hashes at positions bstart[i]..bstart[i]+nh[i]-1 use doc i's bytes
    # only; later positions span into the next doc and are excluded.
    # Window minima: docs with nh > W take the global sliding-min at their
    # valid window starts; docs with 0 < nh <= W have ONE fingerprint = the
    # min over all their k-gram hashes.
    if gN >= WINNOW_W:
        wmin = np.lib.stride_tricks.sliding_window_view(
            h, WINNOW_W).min(axis=1)
    else:
        wmin = np.zeros(0, dtype=np.uint64)
    long = nh > WINNOW_W
    nw = np.where(long, nh - WINNOW_W + 1, (nh > 0).astype(np.int64))
    # gather per-doc fingerprint-candidate values into one segmented array
    long_idx = _segmented_arange(bstart[long], nw[long])
    long_vals = wmin[long_idx]
    short = (~long) & (nh > 0)
    short_idx = _segmented_arange(bstart[short], nh[short])
    if len(short_idx):
        sh = h[short_idx]
        sstarts = np.zeros(int(short.sum()), dtype=np.int64)
        np.cumsum(nh[short][:-1], out=sstarts[1:])
        short_vals = np.minimum.reduceat(sh, sstarts)
    else:
        short_vals = np.zeros(0, dtype=np.uint64)
    vals = np.concatenate([long_vals, short_vals])
    doc_of = np.concatenate([np.repeat(np.flatnonzero(long), nw[long]),
                             np.flatnonzero(short)])
    if len(vals):
        order = np.lexsort((vals, doc_of))
        sv, sd = vals[order], doc_of[order]
        new_run = np.ones(len(sv), dtype=bool)
        new_run[1:] = (sd[1:] != sd[:-1]) | (sv[1:] != sv[:-1])
        np.add.at(n_fp, sd[new_run], 1)
        first = np.ones(len(sd), dtype=bool)
        first[1:] = sd[1:] != sd[:-1]
        min_fp[sd[first]] = sv[first].view(np.int64)  # < 2^61, fits int64
    return pa.table({"doc_id": batch["doc_id"],
                     "n_fingerprints": pa.array(n_fp),
                     "min_fingerprint": pa.array(min_fp)})


# --------------------------------------------------------------- SimHash

_SIMHASH_BITS = 64


def _word_hashes(words: list[str]) -> np.ndarray:
    return pd.util.hash_array(np.asarray(words, dtype=object))


def simhash_batch(batch: pa.Table) -> pa.Table:
    """64-bit SimHash over word features — near-duplicate fingerprint where
    Hamming distance tracks content similarity.

    Vectorized across the WHOLE block: every doc's words are hashed in one
    ``hash_array`` call, per-bit ones-counts come from one
    ``np.add.reduceat`` over the concatenated bit matrix, and the final
    bit-packing is a single matmul — no per-document Python work beyond the
    split."""
    texts = batch["text"].to_pylist()
    n = len(texts)
    if n == 0:
        return pa.table({"doc_id": batch["doc_id"],
                         "simhash": pa.array([], pa.int64())})
    words: list[str] = []
    counts = np.empty(n, dtype=np.int64)
    for i, t in enumerate(texts):
        ws = t.split(" ")  # always >= 1 token ("" splits to [""])
        words.extend(ws)
        counts[i] = len(ws)
    hs = _word_hashes(words)
    bits = ((hs[:, None] >> np.arange(_SIMHASH_BITS, dtype=np.uint64)) & 1)
    starts = np.zeros(n, dtype=np.int64)
    np.cumsum(counts[:-1], out=starts[1:])
    ones = np.add.reduceat(bits.astype(np.int64), starts, axis=0)
    # signed arithmetic: 2*ones - count would wrap in uint64 for minority
    # bits, spuriously setting them
    votes = 2 * ones - counts[:, None]
    out = ((votes > 0).astype(np.uint64)
           @ (np.uint64(1) << np.arange(_SIMHASH_BITS, dtype=np.uint64)))
    return pa.table({
        "doc_id": batch["doc_id"],
        "simhash": pa.array(out.view(np.int64)),
    })


# ------------------------------------------- SimHash near-dup candidates

SIMHASH_BANDS = 4          # 16 bits per band: Hamming<=3 => >=1 equal band
SIMHASH_MAX_HAMMING = 3


def simhash_band_rows(batch: pa.Table) -> pa.Table:
    """SimHash -> (band, key, doc_id, simhash) rows (4 per doc): two docs
    within Hamming distance 3 of each other must agree on at least one
    16-bit band (pigeonhole — the classic Manku/Jain/Sarma web-dedup
    banding), so equal (band, key) groups are a complete candidate cover."""
    sims = simhash_batch(batch)
    h = sims["simhash"].to_numpy(zero_copy_only=False).view(np.uint64)
    n = len(h)
    bands = np.arange(SIMHASH_BANDS, dtype=np.int64)
    key = np.empty((SIMHASH_BANDS, n), dtype=np.int64)
    for b_ in range(SIMHASH_BANDS):
        key[b_] = ((h >> np.uint64(16 * b_)) & np.uint64(0xFFFF)) \
            .astype(np.int64)
    return pa.table({
        "band": pa.array(np.repeat(bands, n)),
        "key": pa.array(key.reshape(-1)),
        "doc_id": pa.array(np.tile(
            sims["doc_id"].to_numpy(zero_copy_only=False), SIMHASH_BANDS)),
        "simhash": pa.array(np.tile(h.view(np.int64), SIMHASH_BANDS)),
    })
