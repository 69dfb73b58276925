"""Prefix-filtered set-containment join (functions/dedup.containment_pairs)
vs brute force: thresholds below 1.0 exercise multi-token prefixes, random
corpora exercise tie-breaks and empty buckets, and bucket-count invariance
guards the wave exchange."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from cwds_jobs_ray.functions.dedup import containment_pairs

SF = "/root/testdata/sf0.001"


def _brute(df: pd.DataFrame, threshold: float, min_words: int):
    sets = {int(r.doc_id): set(r.text.split(" "))
            for r in df.itertuples(index=False)}
    out = []
    for a, wa in sets.items():
        if len(wa) < min_words:
            continue
        for b, wb in sets.items():
            if a == b:
                continue
            inter = len(wa & wb)
            if inter >= threshold * len(wa):
                out.append((a, b, len(wa), inter / len(wa)))
    return pd.DataFrame(out, columns=["doc_a", "doc_b", "n_words_a",
                                      "containment"]) \
        .sort_values(["doc_a", "doc_b"]).reset_index(drop=True)


def _run(df: pd.DataFrame, threshold: float, min_words: int, **kw):
    ds = ray.data.from_pandas(df)
    got = containment_pairs(ds, threshold=threshold, min_words=min_words,
                            **kw).to_pandas()
    if got.empty:  # Ray to_pandas drops the schema of all-empty outputs
        got = pd.DataFrame(columns=["doc_a", "doc_b", "n_words_a",
                                    "containment"])
    return got.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)


def _rand_corpus(seed: int, n_docs: int, vocab: int, lo: int, hi: int):
    rng = np.random.default_rng(seed)
    words = [f"w{i}" for i in range(vocab)]
    rows = []
    for d in range(n_docs):
        k = int(rng.integers(lo, hi))
        ws = rng.choice(words, size=k, replace=True)
        rows.append((d, " ".join(ws)))
    # inject guaranteed containments: doc n_docs+i = subset of doc i's words
    for i in range(5):
        sub = sorted(set(rows[i][1].split(" ")))[:max(3, lo // 2)]
        rows.append((n_docs + i, " ".join(sub)))
    return pd.DataFrame(rows, columns=["doc_id", "text"])


@pytest.mark.parametrize("threshold", [1.0, 0.8, 0.6])
def test_containment_matches_brute_force(threshold):
    df = _rand_corpus(seed=42, n_docs=60, vocab=40, lo=6, hi=25)
    got = _run(df, threshold, min_words=3)
    exp = _brute(df, threshold, min_words=3)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_containment_bucket_count_invariant():
    df = _rand_corpus(seed=7, n_docs=40, vocab=30, lo=5, hi=20)
    a = _run(df, 0.7, min_words=3, n_buckets=1)
    b = _run(df, 0.7, min_words=3, n_buckets=13)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_containment_asymmetric_and_quote_detection():
    """The relation Jaccard misses: a short quote inside a long page."""
    page = " ".join(f"tok{i}" for i in range(200))
    quote = " ".join(f"tok{i}" for i in range(10, 30))
    df = pd.DataFrame({"doc_id": [1, 2], "text": [page, quote]})
    got = _run(df, 1.0, min_words=5)
    assert got[["doc_a", "doc_b"]].values.tolist() == [[2, 1]]
    assert got["containment"].iloc[0] == 1.0
    # jaccard of the same pair is tiny (20/200); sanity the asymmetry
    assert len(_run(df, 1.0, min_words=250)) == 0


def test_containment_min_words_gate_is_a_side_only():
    """A short doc can still be a CONTAINER (B side)."""
    small = "a b c"
    big = " ".join(f"x{i}" for i in range(30)) + " a b c"
    df = pd.DataFrame({"doc_id": [1, 2], "text": [small, big]})
    # min_words=4 excludes doc 1 as an A side; doc 2 isn't contained in 1
    assert len(_run(df, 1.0, min_words=4)) == 0
    # min_words=3 admits doc 1 as A side, contained in doc 2
    got = _run(df, 1.0, min_words=3)
    assert got[["doc_a", "doc_b"]].values.tolist() == [[1, 2]]


def test_containment_empty_and_degenerate():
    df = pd.DataFrame({"doc_id": pd.array([], dtype="int64"),
                       "text": pd.array([], dtype="string")})
    assert len(_run(df, 1.0, min_words=1)) == 0
    one = pd.DataFrame({"doc_id": [5], "text": ["hello world"]})
    assert len(_run(one, 1.0, min_words=1)) == 0  # no self pairs
