"""stages/waves.py — the direct bucket-exchange group reduce that replaces
Dataset.groupby(bucket).map_groups for keyed finals.

Reducers are defined inline in each test: a reducer is shipped to Ray
workers, and one referencing this test module's globals would fail to
unpickle there (pytest test modules aren't importable on workers).
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from cwds_jobs_ray.stages.waves import wave_group_reduce


def test_wave_group_reduce_matches_pandas():
    def reduce_sum(t: pa.Table) -> pa.Table:
        import pandas as _pd  # noqa: F401 — self-contained for pickling
        g = t.to_pandas().groupby("k", sort=False)["v"].sum().reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    rng = np.random.default_rng(7)
    n = 40_000
    k = rng.integers(0, 900, n)
    v = rng.integers(0, 50, n)
    t = pa.table({"k": pa.array(k, pa.int64()), "v": pa.array(v, pa.int64()),
                  "bucket": pa.array(k % 13, pa.int64())})
    got = (wave_group_reduce(ray.data.from_arrow(t).repartition(6),
                             "bucket", 13, reduce_sum)
           .to_pandas().sort_values("k").reset_index(drop=True))
    exp = (pd.DataFrame({"k": k, "v": v}).groupby("k")["v"].sum()
           .reset_index().sort_values("k").reset_index(drop=True))
    assert got.equals(exp)


def test_wave_group_reduce_empty_buckets_and_column_drop():
    """nb far above the distinct bucket count: empty buckets reduce over a
    typed empty table and contribute zero rows; the bucket column is dropped
    before the reducer sees the rows."""
    def reduce_sum(t: pa.Table) -> pa.Table:
        assert "bucket" not in t.column_names
        g = t.to_pandas().groupby("k", sort=False)["v"].sum().reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    t = pa.table({"k": pa.array([1, 1, 2], pa.int64()),
                  "v": pa.array([10, 20, 30], pa.int64()),
                  "bucket": pa.array([5, 5, 9], pa.int64())})
    got = (wave_group_reduce(ray.data.from_arrow(t), "bucket", 64, reduce_sum)
           .to_pandas().sort_values("k").reset_index(drop=True))
    assert got["v"].tolist() == [30, 30]
    assert got["k"].tolist() == [1, 2]


def test_wave_group_reduce_single_bucket():
    def reduce_sum(t: pa.Table) -> pa.Table:
        g = t.to_pandas().groupby("k", sort=False)["v"].sum().reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    t = pa.table({"k": pa.array([3, 3], pa.int64()),
                  "v": pa.array([1, 2], pa.int64()),
                  "bucket": pa.array([0, 0], pa.int64())})
    got = wave_group_reduce(ray.data.from_arrow(t), "bucket", 1,
                            reduce_sum).to_pandas()
    assert got["v"].tolist() == [3]
