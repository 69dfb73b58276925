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

# ---------------------------------------------------------------- ed <= 2

from cwds_jobs_ray.functions.fuzzy import _lev_le_mask, edit2_pairs


def _brute2(strs):
    return {(i, j) for i in range(len(strs)) for j in range(i + 1, len(strs))
            if _lev(strs[i], strs[j]) <= 2}


def _run2(strs, nb=5):
    ds = ray.data.from_arrow(pa.table({
        "id": pa.array(range(len(strs)), pa.int64()),
        "s": pa.array(strs, pa.string())}))
    out = edit2_pairs(ds, "id", "s", n_buckets=nb).to_pandas()
    if out.empty:
        return set()
    pairs = list(zip(out["id_a"], out["id_b"]))
    assert len(pairs) == len(set(pairs)), "duplicate pair emitted"
    return set(pairs)


def test_edit2_small_alphabet_random():
    rng = np.random.default_rng(3)
    strs = ["".join(rng.choice(list("ab"), size=rng.integers(0, 5)))
            for _ in range(100)]
    assert _run2(strs) == _brute2(strs)


def test_edit2_mixed_lengths_duplicates_and_transpositions():
    rng = np.random.default_rng(13)
    strs = ["".join(rng.choice(list("abc"), size=rng.integers(0, 7)))
            for _ in range(120)]
    strs += strs[:8]          # exact duplicates emit exactly once
    strs += ["xy", "yx"]      # transposition = distance 2 -> included
    assert _run2(strs, nb=3) == _brute2(strs)


def test_edit2_structured_ids():
    strs = [f"Customer#{i:03d}" for i in range(120)]
    assert _run2(strs, nb=7) == _brute2(strs)


def test_edit2_nulls_excluded():
    # SQL: levenshtein(NULL, x) is NULL -> the pair is excluded
    ds = ray.data.from_arrow(pa.table({
        "id": pa.array([1, 2, 3, 4], pa.int64()),
        "s": pa.array(["None", None, "None", None], pa.string())}))
    out = edit2_pairs(ds, "id", "s", n_buckets=3).to_pandas()
    got = set(zip(out["id_a"], out["id_b"])) if not out.empty else set()
    assert got == {(1, 3)}


def test_edit2_unicode_char_level():
    strs = ["café", "cafe", "cafés", "ca", "日本語", "日語", "日本語だよ"]
    assert _run2(strs, nb=3) == _brute2(strs)


def test_lev_le_mask_unit():
    cases = [("abc", "abc", 0), ("abc", "abd", 1), ("abc", "adc", 1),
             ("abc", "ab", 1), ("xy", "yx", 2), ("abcd", "dcba", 4),
             ("", "", 0), ("", "ab", 2), ("", "abc", 3), ("a", "abc", 2),
             ("kitten", "sitting", 3), ("flaw", "lawn", 2)]
    sa = np.array([a for a, _, _ in cases], dtype=object)
    sb = np.array([b for _, b, _ in cases], dtype=object)
    for dmax in (1, 2, 3):
        exp = np.array([d <= dmax for _, _, d in cases])
        assert (_lev_le_mask(sa, sb, dmax) == exp).all(), dmax
        assert (_lev_le_mask(sb, sa, dmax) == exp).all(), dmax


def test_lev_le_mask_random_vs_brute():
    rng = np.random.default_rng(29)
    sa, sb, exp2 = [], [], []
    for _ in range(400):
        a = "".join(rng.choice(list("abcd"), size=rng.integers(0, 9)))
        b = "".join(rng.choice(list("abcd"), size=rng.integers(0, 9)))
        sa.append(a); sb.append(b); exp2.append(_lev(a, b) <= 2)
    got = _lev_le_mask(np.array(sa, dtype=object),
                       np.array(sb, dtype=object), 2)
    assert (got == np.array(exp2)).all()


def test_edit1_nulls_excluded():
    ds = ray.data.from_arrow(pa.table({
        "id": pa.array([1, 2, 3], pa.int64()),
        "s": pa.array(["None", None, "Nones"], pa.string())}))
    out = edit1_pairs(ds, "id", "s", n_buckets=3).to_pandas()
    got = set(zip(out["id_a"], out["id_b"])) if not out.empty else set()
    assert got == {(1, 3)}


# ------------------------------------------------------- property (hypothesis)

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_word = st.text(alphabet="abc", min_size=0, max_size=6)


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(strs=st.lists(_word, min_size=0, max_size=40),
       nb=st.integers(min_value=1, max_value=6))
def test_edit1_property(strs, nb):
    assert _run(strs, nb=nb) == _brute(strs)


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(strs=st.lists(_word, min_size=0, max_size=30),
       nb=st.integers(min_value=1, max_value=6))
def test_edit2_property(strs, nb):
    assert _run2(strs, nb=nb) == _brute2(strs)


def test_null_strings_excluded_ed2():
    ds = ray.data.from_arrow(pa.table({
        "id": pa.array([1, 2, 3, 4], pa.int64()),
        "s": pa.array(["abc", None, "abd", None]),
    }))
    out = edit2_pairs(ds, "id", "s", n_buckets=3).to_pandas()
    got = set(zip(out["id_a"], out["id_b"])) if not out.empty else set()
    assert got == {(1, 3)}
