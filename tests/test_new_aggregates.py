"""Round-5 analytic aggregates: arg_min/arg_max attribution, interpolated
group percentiles, and exact hopping-window distinct counts — each checked
against its DuckDB oracle at sf0.001 (the same compare the driver gate
runs), plus shape invariants the oracle can't see."""

import duckdb
import pandas as pd
import pyarrow as pa

from cwds_jobs_ray.queries import (
    ORACLE_SQL,
    argminmax_user_events,
    hopping_distinct_users,
    percentile_cont_by_group,
)

SF = "/root/testdata/sf0.001"


def _oracle(name: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in ("events", "lineitem"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{SF}/{t}.parquet')")
    return con.execute(ORACLE_SQL[name]).df()


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
    return df.sort_values(list(df.columns), kind="stable") \
        .reset_index(drop=True)


def test_argminmax_matches_oracle():
    got = _norm(argminmax_user_events(SF).to_pandas())
    exp = _norm(_oracle("argminmax_user_events"))
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_percentile_cont_matches_oracle_bitexact():
    got = _norm(percentile_cont_by_group(SF).to_pandas())
    exp = _norm(_oracle("percentile_cont_by_group"))
    # exact dyadic interpolation: compare doubles with zero tolerance
    pd.testing.assert_frame_equal(got, exp, check_dtype=False,
                                  check_exact=True)


def test_hopping_distinct_matches_oracle():
    got = _norm(hopping_distinct_users(SF).to_pandas())
    exp = _norm(_oracle("hopping_distinct_users"))
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_argminmax_partial_is_mergeable():
    """The block partial keeps per-user first+last only; re-reducing the
    partial of a SPLIT input must equal the partial of the whole — the
    semilattice property the exchange relies on."""
    import numpy as np

    from cwds_jobs_ray.queries import _read  # noqa: PLC2701

    ds = _read(SF, "events",
               columns=["user_id", "ts", "event_id", "event_type", "value"])
    whole = argminmax_user_events(SF).to_pandas() \
        .sort_values("user_id").reset_index(drop=True)
    # run again with pathological 7-row blocks: result must be identical
    t = ds.materialize().to_pandas()
    import ray.data
    tiny = ray.data.from_pandas([t.iloc[i:i + 7]
                                 for i in range(0, len(t), 7)])
    from cwds_jobs_ray.queries import _tree_agg

    def extremes(tb: pa.Table) -> pa.Table:
        df = tb.to_pandas().sort_values(["user_id", "ts", "event_id"],
                                        kind="stable")
        grp = df.groupby("user_id", sort=False)
        keep = pd.concat([grp.head(1), grp.tail(1)]).drop_duplicates()
        from cwds_jobs_ray.schema import from_pandas
        return from_pandas(keep, preserve_index=False)

    def final(tb: pa.Table) -> pa.Table:
        df = tb.to_pandas().sort_values(["user_id", "ts", "event_id"],
                                        kind="stable")
        grp = df.groupby("user_id", sort=False)
        first, last = grp.head(1), grp.tail(1)
        return pa.table({
            "user_id": pa.array(first["user_id"].to_numpy(np.int64),
                                pa.int64()),
            "first_type": pa.array(list(first["event_type"]), pa.string()),
            "last_type": pa.array(list(last["event_type"]), pa.string()),
            "last_value": pa.array(last["value"].to_numpy(np.float64),
                                   pa.float64())})

    tiny_out = _tree_agg(tiny, extremes, final, bucket_on="user_id") \
        .to_pandas().sort_values("user_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(whole, tiny_out, check_dtype=False)


def test_grouped_quantiles_matches_numpy_selection():
    """Random doubles, uneven groups, duplicate-heavy tails: the selected
    value must be the element at rank ceil(p*n) per group (PERCENTILE_DISC
    semantics), bit-identical to a numpy per-group sort."""
    import math

    import numpy as np
    import ray.data

    from cwds_jobs_ray.functions.stats import exact_grouped_quantiles

    rng = np.random.default_rng(11)
    n = 5000
    g = rng.choice(["a", "b", "c", "dd"], size=n,
                   p=[0.5, 0.3, 0.15, 0.05])
    v = np.where(rng.random(n) < 0.2, 7.25,  # duplicate-heavy value
                 rng.normal(100.0, 42.0, n))
    df = pd.DataFrame({"grp": g, "val": v})
    probs = (0.1, 0.5, 0.99)
    got = exact_grouped_quantiles(
        ray.data.from_pandas(df), "grp", "val", probs,
        driver_budget=64).to_pandas().set_index("grp")
    for grp, sub in df.groupby("grp"):
        s = np.sort(sub["val"].to_numpy())
        for p in probs:
            k = min(max(1, math.ceil(p * len(s))), len(s))
            assert got.loc[grp, f"q_{p}"] == s[k - 1], (grp, p)


def test_grouped_quantiles_oracle():
    got = _norm(
        __import__("cwds_jobs_ray.queries", fromlist=["q"])
        .grouped_quantiles_price(SF).to_pandas())
    con = duckdb.connect()
    con.execute(f"CREATE VIEW orders AS SELECT * FROM "
                f"read_parquet('{SF}/orders.parquet')")
    from cwds_jobs_ray.queries import ORACLE_SQL
    exp = _norm(con.execute(ORACLE_SQL["grouped_quantiles_price"]).df())
    pd.testing.assert_frame_equal(got, exp, check_dtype=False,
                                  check_exact=True)
