"""Scale-shape evidence for the prefix-filtered containment join on a
REALISTIC vocabulary (the sf* synthetic corpus has a 31-word vocabulary, so
the subset relation itself is quasi-quadratic there and says nothing about
the algorithm's pruning).

Generates a Zipf-vocabulary corpus with injected true subset pairs, runs
``containment_pairs`` at t=1.0, and reports:
  - candidate volume (sum of prefix-token document frequencies, computed
    offline the same way wave C4 does) vs true output pairs,
  - wall time,
  - completeness: every injected (subset, base) pair is found,
  - soundness: every sampled output pair verifies as a true subset.

Usage: python tools/containment_scale_probe.py [n_docs] [vocab]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import pandas as pd


def make_corpus(n_docs: int, vocab: int, seed: int = 3):
    rng = np.random.default_rng(seed)
    # Zipf-ish token frequencies over a realistic vocabulary
    ranks = np.arange(1, vocab + 1, dtype=np.float64)
    p = (1.0 / ranks) / (1.0 / ranks).sum()
    words = np.array([f"w{i}" for i in range(vocab)], dtype=object)
    rows = []
    for d in range(n_docs):
        k = int(rng.integers(40, 300))
        ws = rng.choice(words, size=k, p=p, replace=True)
        rows.append((d, " ".join(ws)))
    # inject known subset pairs: doc n_docs+i quotes a slice of doc i
    n_inject = max(10, n_docs // 100)
    injected = []
    for i in range(n_inject):
        toks = sorted(set(rows[i][1].split(" ")))
        sub = toks[: max(20, len(toks) // 3)]
        rows.append((n_docs + i, " ".join(sub)))
        injected.append((n_docs + i, i))
    return pd.DataFrame(rows, columns=["doc_id", "text"]), injected


def main():
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    vocab = int(sys.argv[2]) if len(sys.argv) > 2 else 30_000
    df, injected = make_corpus(n_docs, vocab)

    # offline candidate volume: per doc, df of its rarest token (t=1.0
    # prefix = 1 token), summed over A-side docs — exactly wave C4's volume
    sets = [set(t.split(" ")) for t in df["text"]]
    from collections import Counter
    dfreq = Counter()
    for s in sets:
        dfreq.update(s)
    cand = 0
    a_docs = 0
    for s in sets:
        if len(s) >= 20:
            a_docs += 1
            cand += min(dfreq[w] for w in s)
    import ray
    ray.init(address="local", num_cpus=32, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False
    import ray.data

    from cwds_jobs_ray.functions.dedup import containment_pairs

    t0 = time.perf_counter()
    out = containment_pairs(ray.data.from_pandas(df), threshold=1.0,
                            min_words=20).to_pandas()
    wall = time.perf_counter() - t0
    got = set(zip(out["doc_a"], out["doc_b"])) if len(out) else set()
    missing = [p for p in injected if p not in got]
    # soundness sample
    rng = np.random.default_rng(0)
    idx = rng.choice(len(out), size=min(2000, len(out)), replace=False) \
        if len(out) else []
    bad = 0
    for i in idx:
        a, b = int(out["doc_a"].iloc[i]), int(out["doc_b"].iloc[i])
        if not sets[a] <= sets[b]:
            bad += 1
    import json
    print(json.dumps({
        "n_docs": len(df), "vocab": vocab, "a_docs": a_docs,
        "candidates": int(cand), "output_pairs": int(len(out)),
        "cand_per_output": round(cand / max(len(out), 1), 2),
        "wall_sec": round(wall, 3),
        "injected": len(injected), "injected_missing": len(missing),
        "soundness_sampled": int(len(idx)), "soundness_bad": bad}))
    ray.shutdown()


if __name__ == "__main__":
    main()
