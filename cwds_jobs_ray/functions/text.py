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


def md5_fingerprint(batch: pa.Table) -> pa.Table:
    """Content fingerprint (md5 hex). Per-row hashing is C-speed hashlib;
    for pure-vectorized scale use the SimHash below."""
    texts = batch["text"].to_pylist()
    fp = [hashlib.md5(t.encode()).hexdigest() for t in texts]
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
    """Polynomial rolling hashes of all k-grams — one vectorized pass."""
    b = np.frombuffer(text.encode("utf-8", "ignore"), dtype=np.uint8)
    n = len(b) - WINNOW_K + 1
    if n <= 0:
        return np.zeros(0, dtype=np.uint64)
    h = np.zeros(n, dtype=np.uint64)
    for j in range(WINNOW_K):  # K tiny vectorized passes, not a per-char loop
        h = (h * _ROLL_BASE + b[j:j + n]) & _ROLL_MOD_MASK
    return h


def winnow_fingerprints(batch: pa.Table) -> pa.Table:
    """Winnowing document fingerprints (Schleimer et al., SIGMOD 2003
    public algorithm): k-gram rolling hashes -> per-window minima -> the
    document's fingerprint set. Emits set size + min fingerprint per doc
    (compact sketch columns; the full set is derivable deterministically)."""
    texts = batch["text"].to_pylist()
    n_fp = np.zeros(len(texts), dtype=np.int64)
    min_fp = np.zeros(len(texts), dtype=np.int64)
    for i, t in enumerate(texts):
        h = _kgram_hashes(t)
        if len(h) == 0:
            continue
        if len(h) <= WINNOW_W:
            fps = {int(h.min())}
        else:
            windows = np.lib.stride_tricks.sliding_window_view(h, WINNOW_W)
            fps = set(windows.min(axis=1).tolist())
        n_fp[i] = len(fps)
        min_fp[i] = min(fps)  # < 2^61, fits int64
    return pa.table({"doc_id": batch["doc_id"],
                     "n_fingerprints": pa.array(n_fp),
                     "min_fingerprint": pa.array(min_fp)})


# --------------------------------------------------------------- SimHash

_SIMHASH_BITS = 64


def _word_hashes(words: list[str]) -> np.ndarray:
    return pd.util.hash_array(np.asarray(words, dtype=object))


def simhash_batch(batch: pa.Table) -> pa.Table:
    """64-bit SimHash over word features — near-duplicate fingerprint where
    Hamming distance tracks content similarity."""
    texts = batch["text"].to_pylist()
    out = np.zeros(len(texts), dtype=np.uint64)
    for i, t in enumerate(texts):
        ws = t.split(" ")
        if not ws:
            continue
        hs = _word_hashes(ws)
        bits = ((hs[:, None] >> np.arange(_SIMHASH_BITS, dtype=np.uint64)) & 1)
        # signed arithmetic: bits.sum is uint64 and 2*ones - n would wrap
        # for minority bits, spuriously setting them
        votes = 2 * bits.sum(axis=0).astype(np.int64) - len(hs)
        sim = np.uint64(0)
        for b in np.nonzero(votes > 0)[0]:
            sim |= np.uint64(1) << np.uint64(b)
        out[i] = sim
    return pa.table({
        "doc_id": batch["doc_id"],
        "simhash": pa.array(out.view(np.int64)),
    })
