"""edit1_pairs vs a brute-force Levenshtein oracle over adversarial corpora
(tiny alphabet -> repeated chars, transposition false-candidates, exact
duplicates, empty and 1-char strings, length differences)."""

import numpy as np
import pyarrow as pa
import pytest
import ray

from cwds_jobs_ray.functions.fuzzy import _ed1_mask, edit1_pairs


def _lev(a: str, b: str) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _brute(strs):
    return {(i, j) for i in range(len(strs)) for j in range(i + 1, len(strs))
            if _lev(strs[i], strs[j]) <= 1}


def _run(strs, nb=5):
    ds = ray.data.from_arrow(pa.table({
        "id": pa.array(range(len(strs)), pa.int64()),
        "s": pa.array(strs, pa.string())}))
    out = edit1_pairs(ds, "id", "s", n_buckets=nb).to_pandas()
    if out.empty:  # Ray to_pandas drops columns on all-empty datasets
        return set()
    pairs = list(zip(out["id_a"], out["id_b"]))
    assert len(pairs) == len(set(pairs)), "duplicate pair emitted"
    return set(pairs)


def test_edit1_small_alphabet_random():
    rng = np.random.default_rng(7)
    strs = ["".join(rng.choice(list("ab"), size=rng.integers(0, 5)))
            for _ in range(120)]
    assert _run(strs) == _brute(strs)


def test_edit1_mixed_lengths_and_duplicates():
    rng = np.random.default_rng(11)
    strs = ["".join(rng.choice(list("abc"), size=rng.integers(0, 7)))
            for _ in range(150)]
    strs += strs[:10]  # exact duplicates must emit exactly once
    assert _run(strs, nb=3) == _brute(strs)


def test_edit1_transposition_rejected():
    # "xy"/"yx" share deletion keys but are distance 2
    assert _run(["xy", "yx"]) == set()
    assert _run(["abcd", "abdc"]) == set()


def test_edit1_structured_ids():
    strs = [f"Customer#{i:04d}" for i in range(150)]
    assert _run(strs, nb=7) == _brute(strs)


def test_ed1_mask_unit():
    sa = np.array(["abc", "abc", "abc", "ab", "abc", "", "a", "xy"],
                  dtype=object)
    sb = np.array(["abc", "abd", "adc", "abc", "ab", "a", "", "yx"],
                  dtype=object)
    exp = np.array([True, True, True, True, True, True, True, False])
    assert (_ed1_mask(sa, sb) == exp).all()


def test_emit_neighborhood_empty_block():
    from cwds_jobs_ray.functions.fuzzy import _emit_neighborhood
    t = pa.table({"id": pa.array([], pa.int64()),
                  "s": pa.array([], pa.string())})
    out = _emit_neighborhood(t, "id", "s", 4)
    assert out.num_rows == 0
    assert out.column_names == ["key", "id", "s", "self", "_bucket"]


def test_edit1_unicode_char_level():
    # one multi-byte substitution is distance 1 (char-level), and the
    # oracle-equivalent brute force agrees
    strs = ["café", "cafe", "cafés", "caf", "日本語", "日本誤", "日本語だ"]
    assert _run(strs, nb=3) == _brute(strs)
