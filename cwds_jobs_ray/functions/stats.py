"""Exact distributed order statistics WITHOUT a global sort.

``exact_quantiles`` computes PERCENTILE_DISC-semantics quantiles (the
element at 1-based rank ``ceil(p * n)``) by histogram-refinement
selection: each round streams ONE vectorized counting scan over the
column (shuffle payload: at most ``nbins`` small (rank, bin, n) int rows
per block, wave-reduced — never the values), locates each target rank's
bin from the merged counts, and narrows that rank's candidate interval to
the bin. When every rank's surviving row count fits a driver budget, one
bounded filter-collect + in-memory sort finishes the selection.

``log_nbins(n)`` rounds total — 3 counting scans at 1e12 rows with
nbins=4096 — versus an all-to-all exchange of the entire column for the
sort-based alternative. Interval bounds come free from parquet footer
statistics when available.

The reference has no quantile operator; this belongs to the
engine-completeness family (distribution profiling / SLA percentiles over
CDC tables).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

_NBINS = 4096
_DRIVER_BUDGET = 100_000  # max rows collected per rank in the final step


def _bin_of(v: np.ndarray, lo: float, hi: float, nbins: int) -> np.ndarray:
    """Deterministic bin id for values in [lo, hi] (same float ops on every
    block, so membership predicates are reproducible across rounds)."""
    w = (hi - lo) / nbins
    return np.clip(np.floor((v - lo) / w).astype(np.int64), 0, nbins - 1)


def _member_mask(v: np.ndarray, levels: list[tuple[float, float, int]],
                 nbins: int) -> np.ndarray:
    """Membership in a rank's candidate interval = the conjunction of
    bin-id equalities along its refinement chain (NOT numeric range
    checks, which would drift on float boundaries)."""
    mask = np.ones(len(v), dtype=bool)
    for lo, hi, j in levels:
        mask &= _bin_of(v, lo, hi, nbins) == j
    return mask


def _level_bounds(lo: float, hi: float, j: int, nbins: int):
    w = (hi - lo) / nbins
    return lo + j * w, hi if j == nbins - 1 else lo + (j + 1) * w


def exact_quantiles(ds: ray.data.Dataset, column: str,
                    probs: tuple[float, ...], *,
                    lo: float, hi: float, n: int,
                    nbins: int = _NBINS,
                    driver_budget: int = _DRIVER_BUDGET,
                    n_buckets: int | None = None) -> dict[float, float]:
    """Exact quantiles of ``column`` over ``ds``.

    ``lo``/``hi``/``n`` are the column's min/max/row-count (parquet footer
    stats, or one min/max/count scan). Returns {p: value} where value is an
    actual element of the column at rank ceil(p*n), matching SQL
    PERCENTILE_DISC / DuckDB quantile_disc."""
    from ..stages.waves import wave_group_reduce
    from .joins import _int_bucket

    if n == 0:
        return {p: float("nan") for p in probs}

    # Per-rank state: refinement chain, rank within the chain's interval,
    # rows remaining in the interval. Ranks are deduped so e.g. p50/p51 of
    # a small table don't scan twice.
    ranks = {p: min(max(1, math.ceil(p * n)), n) for p in probs}
    state: dict[int, dict] = {
        k: {"levels": [], "k": k, "count": n, "root": (lo, hi)}
        for k in set(ranks.values())}
    nb = n_buckets or 8

    def count_round(active: dict[int, dict]) -> dict[int, np.ndarray]:
        """One streaming scan: per active rank, histogram of its interval's
        next subdivision. Partials are (rid, bin, n) rows — never values."""
        items = sorted(active.items())
        rids = {k: i for i, (k, _) in enumerate(items)}

        def partial(t: pa.Table) -> pa.Table:
            v = t[column].to_numpy(zero_copy_only=False)
            out_r, out_b, out_n = [], [], []
            for k, st in items:
                clo, chi = _sub_bounds(st)
                m = _member_mask(v, st["levels"], nbins)
                if not m.any():
                    continue
                b = _bin_of(v[m], clo, chi, nbins)
                u, c = np.unique(b, return_counts=True)
                out_r.append(np.full(len(u), rids[k], dtype=np.int64))
                out_b.append(u)
                out_n.append(c.astype(np.int64))
            if not out_r:
                return pa.table({"rid": pa.array([], pa.int64()),
                                 "bin": pa.array([], pa.int64()),
                                 "n": pa.array([], pa.int64())})
            return pa.table({"rid": pa.array(np.concatenate(out_r)),
                             "bin": pa.array(np.concatenate(out_b)),
                             "n": pa.array(np.concatenate(out_n))})

        def add_bucket(t: pa.Table) -> pa.Table:
            key = (t["rid"].to_numpy(zero_copy_only=False) * nbins
                   + t["bin"].to_numpy(zero_copy_only=False))
            return t.append_column("_bucket", pa.array(_int_bucket(key, nb)))

        def reduce_bucket(t: pa.Table) -> pa.Table:
            g = t.to_pandas().groupby(["rid", "bin"], sort=False)["n"] \
                .sum().reset_index()
            return pa.Table.from_pandas(g, preserve_index=False)

        merged = wave_group_reduce(
            ds.map_batches(partial, batch_format="pyarrow")
              .map_batches(add_bucket, batch_format="pyarrow"),
            "_bucket", nb, reduce_bucket).to_pandas()
        hists = {}
        for k, _ in items:
            sub = merged[merged["rid"] == rids[k]]
            h = np.zeros(nbins, dtype=np.int64)
            h[sub["bin"].to_numpy()] = sub["n"].to_numpy()
            hists[k] = h
        return hists

    def _sub_bounds(st: dict) -> tuple[float, float]:
        clo, chi = st["root"]
        for plo, phi, j in st["levels"]:
            clo, chi = _level_bounds(plo, phi, j, nbins)
        return clo, chi

    for _ in range(64):  # log_nbins(n) rounds in practice; hard stop
        active = {k: st for k, st in state.items()
                  if st["count"] > driver_budget}
        if not active:
            break
        # width-underflow guard: a subdivision that cannot narrow further
        # (interval a few ulps wide) means the interval is all duplicates
        # of at most two float values; the collect below stays bounded by
        # distinct-value count, handled in the final step.
        active = {k: st for k, st in active.items()
                  if (lambda b: (b[1] - b[0]) / nbins > 0
                      and b[0] + (b[1] - b[0]) / nbins > b[0])(
                          _sub_bounds(st))}
        if not active:
            break
        hists = count_round(active)
        for k, st in active.items():
            h = hists[k]
            cum = np.cumsum(h)
            j = int(np.searchsorted(cum, st["k"]))
            below = int(cum[j - 1]) if j else 0
            clo, chi = _sub_bounds(st)
            st["levels"].append((clo, chi, j))
            st["k"] -= below
            st["count"] = int(h[j])

    # Final: one scan collecting each remaining interval's values (bounded
    # by driver_budget per rank, or by distinct duplicates at underflow —
    # collected as (value, n) pairs so mega-duplicate runs stay tiny).
    items = sorted(state.items())
    rids = {k: i for i, (k, _) in enumerate(items)}

    def collect(t: pa.Table) -> pa.Table:
        v = t[column].to_numpy(zero_copy_only=False)
        out_r, out_v, out_n = [], [], []
        for k, st in items:
            m = _member_mask(v, st["levels"], nbins)
            if not m.any():
                continue
            u, c = np.unique(v[m], return_counts=True)
            out_r.append(np.full(len(u), rids[k], dtype=np.int64))
            out_v.append(u)
            out_n.append(c.astype(np.int64))
        if not out_r:
            return pa.table({"rid": pa.array([], pa.int64()),
                             "v": pa.array([], pa.float64()),
                             "n": pa.array([], pa.int64())})
        return pa.table({"rid": pa.array(np.concatenate(out_r)),
                         "v": pa.array(np.concatenate(out_v)),
                         "n": pa.array(np.concatenate(out_n))})

    got = ds.map_batches(collect, batch_format="pyarrow").to_pandas()
    sel: dict[int, float] = {}
    for k, st in items:
        sub = got[got["rid"] == rids[k]].groupby("v", sort=True)["n"].sum()
        cum = sub.cumsum().to_numpy()
        idx = int(np.searchsorted(cum, st["k"]))
        sel[k] = float(sub.index[idx])
    return {p: sel[ranks[p]] for p in probs}


def exact_grouped_quantiles(ds: ray.data.Dataset, group_col: str,
                            column: str, probs: tuple[float, ...], *,
                            nbins: int = _NBINS,
                            driver_budget: int = _DRIVER_BUDGET,
                            n_buckets: int | None = None) -> pa.Table:
    """PER-GROUP exact quantiles (PERCENTILE_DISC semantics) by the same
    histogram-refinement selection as ``exact_quantiles``, with the state
    keyed by (group, rank): each round is still ONE streaming counting
    scan — every active (group, rank) histograms its group's rows inside
    its candidate interval, partials are (state, bin, n) int rows, and the
    final bounded collect selects actual column elements.

    Group cardinality assumption: the per-block partial loops over ACTIVE
    states (|groups| x |distinct ranks|, shrinking as states converge), so
    this shape fits bounded-cardinality groups (flags, priorities, status
    codes — the profiling use case). For millions of groups, hash-partition
    by group and run an in-partition selection instead.

    Returns an Arrow table (group_col, q_<p> ...) sorted by group."""
    from ..stages.waves import wave_group_reduce
    from .joins import _int_bucket

    # Phase 0: one scan -> per-group (n, lo, hi) (bounded final).
    def gstats(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "g": t[group_col].to_pandas(),
            "v": t[column].to_numpy(zero_copy_only=False)})
        a = df.groupby("g", sort=False)["v"].agg(["size", "min", "max"]) \
            .reset_index()
        return pa.table({"g": pa.array(a["g"].astype(str), pa.string()),
                         "n": pa.array(a["size"].to_numpy(), pa.int64()),
                         "lo": pa.array(a["min"].to_numpy(), pa.float64()),
                         "hi": pa.array(a["max"].to_numpy(), pa.float64())})

    st0 = ds.map_batches(gstats, batch_format="pyarrow") \
        .repartition(1).materialize().to_pandas() \
        .groupby("g", sort=True).agg(n=("n", "sum"), lo=("lo", "min"),
                                     hi=("hi", "max")).reset_index()
    groups = st0["g"].tolist()
    if not groups:
        cols = {group_col: pa.array([], pa.string())}
        for p in probs:
            cols[f"q_{p}"] = pa.array([], pa.float64())
        return pa.table(cols)

    # Per-(group, rank) refinement state; ranks deduped within a group.
    state: dict[tuple[int, int], dict] = {}
    ranks_by_g: list[dict[float, int]] = []
    for gi, row in enumerate(st0.itertuples(index=False)):
        n = int(row.n)
        ranks = {p: min(max(1, math.ceil(p * n)), n) for p in probs}
        ranks_by_g.append(ranks)
        for k in set(ranks.values()):
            state[(gi, k)] = {"levels": [], "k": k, "count": n,
                              "root": (float(row.lo), float(row.hi))}
    nb = n_buckets or 8

    def _sub_bounds(st: dict) -> tuple[float, float]:
        clo, chi = st["root"]
        for plo, phi, j in st["levels"]:
            clo, chi = _level_bounds(plo, phi, j, nbins)
        return clo, chi

    def count_round(active: dict) -> dict:
        items = sorted(active.items())
        rids = {key: i for i, (key, _) in enumerate(items)}

        def partial(t: pa.Table) -> pa.Table:
            v = t[column].to_numpy(zero_copy_only=False)
            gv = pd.Categorical(t[group_col].to_pandas().astype(str),
                                categories=groups).codes
            out_r, out_b, out_n = [], [], []
            for (gi, k), st in items:
                clo, chi = _sub_bounds(st)
                m = (gv == gi) & _member_mask(v, st["levels"], nbins)
                if not m.any():
                    continue
                b = _bin_of(v[m], clo, chi, nbins)
                u, c = np.unique(b, return_counts=True)
                out_r.append(np.full(len(u), rids[(gi, k)], dtype=np.int64))
                out_b.append(u)
                out_n.append(c.astype(np.int64))
            if not out_r:
                return pa.table({"rid": pa.array([], pa.int64()),
                                 "bin": pa.array([], pa.int64()),
                                 "n": pa.array([], pa.int64())})
            return pa.table({"rid": pa.array(np.concatenate(out_r)),
                             "bin": pa.array(np.concatenate(out_b)),
                             "n": pa.array(np.concatenate(out_n))})

        def add_bucket(t: pa.Table) -> pa.Table:
            key = (t["rid"].to_numpy(zero_copy_only=False) * nbins
                   + t["bin"].to_numpy(zero_copy_only=False))
            return t.append_column("_bucket", pa.array(_int_bucket(key, nb)))

        def reduce_bucket(t: pa.Table) -> pa.Table:
            g = t.to_pandas().groupby(["rid", "bin"], sort=False)["n"] \
                .sum().reset_index()
            return pa.Table.from_pandas(g, preserve_index=False)

        merged = wave_group_reduce(
            ds.map_batches(partial, batch_format="pyarrow")
              .map_batches(add_bucket, batch_format="pyarrow"),
            "_bucket", nb, reduce_bucket).to_pandas()
        hists = {}
        for key, _ in items:
            sub = merged[merged["rid"] == rids[key]]
            h = np.zeros(nbins, dtype=np.int64)
            h[sub["bin"].to_numpy()] = sub["n"].to_numpy()
            hists[key] = h
        return hists

    for _ in range(64):
        active = {key: st for key, st in state.items()
                  if st["count"] > driver_budget}
        active = {key: st for key, st in active.items()
                  if (lambda b: (b[1] - b[0]) / nbins > 0
                      and b[0] + (b[1] - b[0]) / nbins > b[0])(
                          _sub_bounds(st))}
        if not active:
            break
        hists = count_round(active)
        for key, st in active.items():
            h = hists[key]
            cum = np.cumsum(h)
            j = int(np.searchsorted(cum, st["k"]))
            below = int(cum[j - 1]) if j else 0
            clo, chi = _sub_bounds(st)
            st["levels"].append((clo, chi, j))
            st["k"] -= below
            st["count"] = int(h[j])

    items = sorted(state.items())
    rids = {key: i for i, (key, _) in enumerate(items)}

    def collect(t: pa.Table) -> pa.Table:
        v = t[column].to_numpy(zero_copy_only=False)
        gv = pd.Categorical(t[group_col].to_pandas().astype(str),
                            categories=groups).codes
        out_r, out_v, out_n = [], [], []
        for (gi, k), st in items:
            m = (gv == gi) & _member_mask(v, st["levels"], nbins)
            if not m.any():
                continue
            u, c = np.unique(v[m], return_counts=True)
            out_r.append(np.full(len(u), rids[(gi, k)], dtype=np.int64))
            out_v.append(u)
            out_n.append(c.astype(np.int64))
        if not out_r:
            return pa.table({"rid": pa.array([], pa.int64()),
                             "v": pa.array([], pa.float64()),
                             "n": pa.array([], pa.int64())})
        return pa.table({"rid": pa.array(np.concatenate(out_r)),
                         "v": pa.array(np.concatenate(out_v)),
                         "n": pa.array(np.concatenate(out_n))})

    got = ds.map_batches(collect, batch_format="pyarrow").to_pandas()
    sel: dict[tuple[int, int], float] = {}
    for key, st in items:
        sub = got[got["rid"] == rids[key]].groupby("v", sort=True)["n"].sum()
        cum = sub.cumsum().to_numpy()
        idx = int(np.searchsorted(cum, st["k"]))
        sel[key] = float(sub.index[idx])
    cols: dict = {group_col: pa.array(groups, pa.string())}
    for p in probs:
        cols[f"q_{p}"] = pa.array(
            [sel[(gi, ranks_by_g[gi][p])] for gi in range(len(groups))],
            pa.float64())
    return pa.table(cols)
