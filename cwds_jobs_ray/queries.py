"""Operator catalog: every reference operator from SURVEY.md §2 re-expressed
as a Ray Data pipeline over the driver's testdata tables, paired (where
SQL-expressible) with a DuckDB oracle in ``ORACLE_SQL``.

The ``events`` table doubles as a CDC change feed: ``event_id`` is the LSN,
``user_id`` the entity key, ``ts`` the change timestamp, and the op code is
derived from ``event_type`` (signup->I, purchase->D, else U) — mirroring the
reference's replication shadow table (`IBMSNAP_OPERATION`/`IBMSNAP_LOGMARKER`,
/root/reference/jobs-facilities-common/src/main/java/gov/ca/cwds/jobs/cals/facility/ReplicationPlacementHome.java:24-32)
and the op-code recode of external operation types
(/root/reference/jobs-cap-users/src/main/java/gov/ca/cwds/jobs/cap/users/service/CapChangedUsersService.java:33-42).

Float-valued aggregates are rounded to 2 decimals on BOTH sides so the
driver's exact value-hash is insensitive to summation order.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from .schema import from_pandas as _pa_from_pandas

# --------------------------------------------------------------------------
# helpers


def _read(sf_dir: str, table: str, columns=None, filter=None) -> ray.data.Dataset:
    """Column/row-pruned parquet read with the file's ``b'pandas'`` schema
    metadata stripped (metadata-carrying schemas are unhashable in pyarrow
    16.1, which defeats Ray Data's block-schema dedup and floods the log —
    see schema.from_pandas). One footer read on the driver; blocks then
    carry the clean schema."""
    import pyarrow.parquet as pq
    path = f"{sf_dir}/{table}.parquet"
    sch = pq.ParquetFile(path).schema_arrow.remove_metadata()
    if columns:
        sch = pa.schema([sch.field(c) for c in columns])
    return ray.data.read_parquet(path, schema=sch, columns=columns,
                                 filter=filter)


OP_SQL = ("CASE event_type WHEN 'signup' THEN 'I' WHEN 'purchase' THEN 'D' "
          "ELSE 'U' END")


def _derive_op(batch: pa.Table) -> pa.Table:
    et = batch["event_type"]
    op = pc.if_else(pc.equal(et, "signup"), "I",
                    pc.if_else(pc.equal(et, "purchase"), "D", "U"))
    return batch.append_column("op", op)


def _agg_buckets() -> int:
    """Coarse bucket count for keyed finals, scaled to the cluster (see
    functions.dedup.default_n_buckets; env override CWDS_N_BUCKETS). Bucket
    count never affects results — only reduce parallelism and per-bucket
    pandas-groupby memory, both of which must scale with the cluster."""
    from .functions.dedup import default_n_buckets
    return default_n_buckets()


def _row_sized_buckets(sf_dir: str, *tables: str) -> int:
    """Bucket count for FULL-ROW keyed exchanges (joins, sessionizers):
    data-sized from the parquet footers' row counts (one metadata read, no
    scan), capped by cluster size. Pre-reduced partial-row finals should
    keep ``_agg_buckets`` — their exchange payload is tiny regardless of
    input rows; for full rows, more buckets than ~rows/200k just multiplies
    per-task fixed overhead (measured 2x wall on the sf0.1 asof join at
    128 buckets vs data-sized 8)."""
    import pyarrow.parquet as pq

    from .functions.dedup import sized_n_buckets
    n = sum(pq.ParquetFile(f"{sf_dir}/{t}.parquet").metadata.num_rows
            for t in tables)
    return sized_n_buckets(n)


def _tree_agg(ds: ray.data.Dataset, partial_fn, final_fn,
              batch_size: int = 65536,
              bucket_on: str | None = None,
              n_buckets: int | None = None) -> ray.data.Dataset:
    """Partial-per-block -> final reduce.

    The partial bounds the data entering the reduce (one row per group per
    block). Two final shapes:

    - ``bucket_on=None``: single final task — correct when the GROUP-KEY
      cardinality is bounded (op codes, return flags, top-k, min/max);
      measured 7-15x faster than the generic sort-based ``groupby`` there.
    - ``bucket_on=<int key column>``: the finals exchange into
      ``n_buckets`` (default cluster-scaled, see ``_agg_buckets``) coarse
      hash buckets (keys never span buckets) via the DIRECT task-wave
      reduce (stages/waves.py — a Dataset groupby's sort-shuffle costs
      ~1-1.5 s of fixed setup regardless of payload, pure overhead for
      pre-reduced partial rows) and reduce vectorized per bucket — the
      shape for UNBOUNDED key cardinality (per-user, per-event
      aggregates), the same fixed-partition structure the CDC engine's
      combine/merge uses.
    """
    partials = ds.map_batches(partial_fn, batch_format="pyarrow",
                              batch_size=batch_size)
    if bucket_on is None:
        return partials.repartition(1).map_batches(
            final_fn, batch_format="pyarrow", batch_size=None)

    from .functions.joins import _int_bucket
    from .stages.waves import wave_group_reduce

    nb = n_buckets or _agg_buckets()

    def add_bucket(t: pa.Table) -> pa.Table:
        b = _int_bucket(t[bucket_on].to_numpy(zero_copy_only=False), nb)
        return t.append_column("_bucket", pa.array(b))

    return wave_group_reduce(
        partials.map_batches(add_bucket, batch_format="pyarrow"),
        "_bucket", nb, final_fn)


def round_half_away(x: np.ndarray, digits: int) -> np.ndarray:
    """Rounding bit-identical to DuckDB's ROUND(double, d): half away from
    zero (numpy/pyarrow round half-to-even, which differs on exact halves
    like 1/32; verified equal to DuckDB on 100k signed samples)."""
    s = 10.0 ** digits
    return np.sign(x) * np.floor(np.abs(x) * s + 0.5) / s


def _round2(x):
    if isinstance(x, pa.ChunkedArray):
        x = x.combine_chunks()
    return pa.array(round_half_away(x.to_numpy(zero_copy_only=False), 2))


# --------------------------------------------------------------------------
# CDC core on the events feed (S1/S5/S9 + D1/D4 + M8 semantics)


def _lww_winners(sf_dir: str) -> ray.data.Dataset:
    """Block-combine then per-key reduce — the same combine/merge shape as
    the transcript engine (stages/merge.py), on the events feed.

    Shuffle volume is bounded by distinct user_ids per block (the block-level
    pre-reduce), not raw events — the scale-critical property.
    """
    ds = _read(sf_dir, "events",
               columns=["event_id", "ts", "user_id", "event_type", "value"])

    def lww_reduce(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas().sort_values(["ts", "event_id"], kind="stable")
        return _pa_from_pandas(
            df.groupby("user_id", sort=False).tail(1), preserve_index=False)

    def block_winners(batch: pa.Table) -> pa.Table:
        return lww_reduce(_derive_op(batch))

    return _tree_agg(ds, block_winners, lww_reduce, bucket_on="user_id")


def cdc_lww_latest(sf_dir: str):
    """Latest state per key by LWW on (ts, lsn) — the reference's keyed
    doc-id overwrite (ElasticWriter.java:71-80) made explicit."""
    ds = _lww_winners(sf_dir)
    return ds.map_batches(
        lambda t: t.select(["user_id", "op", "event_type", "value", "ts"])
                   .append_column("lsn", t["event_id"]),
        batch_format="pyarrow")


def cdc_apply_iud(sf_dir: str):
    """cdc_lww_latest with tombstone application: keys whose winning op is D
    are absent from the final state (S9/D4)."""
    ds = _lww_winners(sf_dir)

    def apply(t: pa.Table) -> pa.Table:
        t = t.filter(pc.not_equal(t["op"], "D"))
        return t.select(["user_id", "op", "event_type", "value", "ts"]) \
                .append_column("lsn", t["event_id"])

    return ds.map_batches(apply, batch_format="pyarrow")


def cdc_watermark(sf_dir: str):
    """Global watermark probe (A1): max LSN + max ts + count — the
    first-incremental-savepoint query `select max(IBMSNAP_LOGMARKER)`
    (QueryConstants.java:25-27). Partial minmax per block, tiny final."""
    ds = _read(sf_dir, "events", columns=["event_id", "ts"])

    def partial(t: pa.Table) -> pa.Table:
        return pa.table({
            "max_lsn": [pc.max(t["event_id"]).as_py()],
            "min_lsn": [pc.min(t["event_id"]).as_py()],
            "max_ts": [pc.max(t["ts"]).as_py()],
            "n_events": pa.array([t.num_rows], pa.int64()),
        })

    def final(t: pa.Table) -> pa.Table:
        return pa.table({
            "max_lsn": [pc.max(t["max_lsn"]).as_py()],
            "min_lsn": [pc.min(t["min_lsn"]).as_py()],
            "max_ts": [pc.max(t["max_ts"]).as_py()],
            "n_events": pa.array([pc.sum(t["n_events"]).as_py()], pa.int64()),
        })

    return _tree_agg(ds, partial, final)


def cdc_batch_counters(sf_dir: str):
    """Per-op counts (A3/A4 consumed-record counters, ConsumerCounter.java)."""
    ds = _read(sf_dir, "events", columns=["event_id", "event_type"])

    def partial(t: pa.Table) -> pa.Table:
        df = _derive_op(t).to_pandas()
        g = df.groupby("op", sort=False).size().rename("n").reset_index()
        return _pa_from_pandas(g, preserve_index=False)

    def final(t: pa.Table) -> pa.Table:
        g = t.to_pandas().groupby("op", sort=False)["n"].sum().reset_index()
        return _pa_from_pandas(g, preserve_index=False)

    return _tree_agg(ds, partial, final)


def cdc_dedup_redelivery(sf_dir: str):
    """Idempotent redelivery (D1): the feed unioned with itself must reduce
    to exactly one row per LSN — distinct-by-key with deterministic payload.
    Block-level pre-dedup bounds the final to distinct lsns per block."""
    ds = _read(sf_dir, "events", columns=["event_id", "user_id", "ts"])
    doubled = ds.union(_read(sf_dir, "events",
                             columns=["event_id", "user_id", "ts"]))

    def dedup(t: pa.Table) -> pa.Table:
        return _pa_from_pandas(
            t.to_pandas().drop_duplicates("event_id"), preserve_index=False)

    return _tree_agg(doubled, dedup, dedup, bucket_on="event_id")


def savepoint_next_batch(sf_dir: str):
    """Batch-boundary lookahead (S3/O2): the k-th (ts, lsn) strictly after a
    watermark — `setFirstResult(batchSize-1).setMaxResults(1)`
    (CwsChangedIdentifierDao.java:45-60). K=100, watermark 2024-01-05.
    Per-block top-k then a tiny final — no global sort."""
    wm = pa.scalar(np.datetime64("2024-01-05T00:00:00", "us"))
    ds = _read(sf_dir, "events", columns=["event_id", "ts"],
               filter=pc.field("ts") > wm)
    k = 100

    def topk(t: pa.Table) -> pa.Table:
        df = t.to_pandas().sort_values(["ts", "event_id"], kind="stable")
        return _pa_from_pandas(df.head(k), preserve_index=False)

    out = _tree_agg(ds, topk, topk).take_all()
    if len(out) < k:  # oracle's LIMIT 1 OFFSET k-1 -> empty result
        return pa.table({"event_id": pa.array([], pa.int64()),
                         "ts": pa.array([], pa.timestamp("us"))})
    return pa.Table.from_pylist([out[k - 1]]).select(["event_id", "ts"])


# --------------------------------------------------------------------------
# filters / projections / normalizers (M1-M8)


def filter_project_lineitem(sf_dir: str):
    """Fused static exclusion predicates + projection (M1/M5: the
    `licensrCd <> 'CL' AND facilityType <> 1420` scan filter,
    QueryConstants.java:20-23)."""
    ds = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_linenumber", "l_returnflag",
                        "l_quantity", "l_extendedprice"],
               filter=(pc.field("l_returnflag") != "R")
               & (pc.field("l_quantity") > 40))
    return ds.select_columns(["l_orderkey", "l_linenumber", "l_extendedprice"])


def tombstone_filter(sf_dir: str):
    """Initial-load tombstone exclusion (M2: `operation != 'D'`,
    QueryConstants.java:42,50)."""
    ds = _read(sf_dir, "events", columns=["event_id", "user_id", "event_type"])
    ds = ds.map_batches(_derive_op, batch_format="pyarrow")
    return ds.map_batches(lambda t: t.filter(pc.not_equal(t["op"], "D")),
                          batch_format="pyarrow")


def inlist_filter(sf_dir: str):
    """IN-list filter (M3: facilityTypeCode IN (400,403,...),
    LicenseNumberIdentifier.java:24-26)."""
    sizes = pa.array([1, 5, 9, 13, 21], pa.int64())
    ds = _read(sf_dir, "part", columns=["p_partkey", "p_size", "p_brand"],
               filter=pc.field("p_size").isin(sizes))
    return ds


def trim_normalize(sf_dir: str):
    """Whitespace trim normalizer (M7: racfIds.map(String::trim),
    CwsChangedUsersServiceImpl.java:40)."""
    ds = _read(sf_dir, "customer", columns=["c_custkey", "c_name"])
    return ds.map_batches(
        lambda t: pa.table({
            "c_custkey": t["c_custkey"],
            "c_name_trimmed": pc.utf8_trim_whitespace(t["c_name"]),
        }), batch_format="pyarrow")


def opcode_recode(sf_dir: str):
    """Dictionary op-code recode (M8) + per-code counts."""
    ds = _read(sf_dir, "events", columns=["event_id", "event_type"])

    def partial(t: pa.Table) -> pa.Table:
        df = _derive_op(t).to_pandas()
        g = df.groupby(["op", "event_type"], sort=False).size() \
              .rename("n").reset_index()
        return _pa_from_pandas(g, preserve_index=False)

    def final(t: pa.Table) -> pa.Table:
        g = t.to_pandas().groupby(["op", "event_type"], sort=False)["n"] \
             .sum().reset_index()
        return _pa_from_pandas(g, preserve_index=False)

    return _tree_agg(ds, partial, final)


# --------------------------------------------------------------------------
# joins / lookups (J1-J4)

_DIM_CACHE: dict = {}


def _broadcast_dims(sf_dir: str):
    """Load small dimension tables once and ship them to every task via the
    object store (ray.put once — NOT re-shipped per batch), the Ray-native
    version of the reference's legacy-dictionaries cache (ST3/J3,
    CwsFacilityJobModule.java:165-177)."""
    import pyarrow.parquet as pq
    key = (sf_dir, "dims")
    if key not in _DIM_CACHE:
        nation = pq.read_table(f"{sf_dir}/nation.parquet")
        region = pq.read_table(f"{sf_dir}/region.parquet")
        dim = nation.to_pandas().merge(
            region.to_pandas(), left_on="n_regionkey", right_on="r_regionkey")
        _DIM_CACHE[key] = ray.put(dim[["n_nationkey", "n_name", "r_name"]])
    return _DIM_CACHE[key]


def join_broadcast_dims(sf_dir: str):
    """3-way broadcast hash join (J1: UserId ⟕ StaffPerson ⟕ CwsOffice,
    UserId.java:35-39): customer ⋈ nation ⋈ region, aggregated per region."""
    ref = _broadcast_dims(sf_dir)
    ds = _read(sf_dir, "customer", columns=["c_custkey", "c_nationkey",
                                            "c_acctbal"])

    def join_dims(batch: pd.DataFrame) -> pd.DataFrame:
        # ray.get on a worker resolves from the local object store (the
        # broadcast table is fetched once per node, not per batch)
        return batch.merge(ray.get(ref), left_on="c_nationkey",
                           right_on="n_nationkey")

    joined = ds.map_batches(join_dims, batch_format="pandas", batch_size=65536)

    def partial(t: pa.Table) -> pa.Table:
        g = t.to_pandas().groupby("r_name", sort=False).agg(
            n_customers=("c_acctbal", "size"),
            sum_acctbal=("c_acctbal", "sum")).reset_index()
        return _pa_from_pandas(g, preserve_index=False)

    def final(t: pa.Table) -> pa.Table:
        g = t.to_pandas().groupby("r_name", sort=False).agg(
            n_customers=("n_customers", "sum"),
            sum_acctbal=("sum_acctbal", "sum")).reset_index()
        out = _pa_from_pandas(g, preserve_index=False)
        return out.set_column(out.schema.get_field_index("sum_acctbal"),
                              "sum_acctbal", _round2(out["sum_acctbal"]))

    return _tree_agg(joined, partial, final)


def hydration_lookup(sf_dir: str):
    """Per-id payload hydration (S8/J2: load full entity per changed id via a
    batched lookup — AbstractChangedFacilityService.java:17-34) as a
    broadcast-side lookup join: orders enriched with customer attributes."""
    import pyarrow.parquet as pq
    cust = pq.read_table(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_name", "c_mktsegment"])
    ref = ray.put(cust.to_pandas())
    ds = _read(sf_dir, "orders",
               columns=["o_orderkey", "o_custkey", "o_totalprice"],
               filter=pc.field("o_totalprice") > 400_000.0)

    def hydrate(batch: pd.DataFrame) -> pd.DataFrame:
        out = batch.join(ray.get(ref).set_index("c_custkey"),
                         on="o_custkey", how="left")
        return out[["o_orderkey", "o_totalprice", "c_name", "c_mktsegment"]]

    return ds.map_batches(hydrate, batch_format="pandas", batch_size=65536)


def merge_upsert_join(sf_dir: str):
    """The J4 base⋈delta upsert join shape on relational data: latest event
    per user (delta winners) LEFT-joined onto the customer 'base' by key —
    an upsert-join where every delta key overwrites the base attribute."""
    winners = _lww_winners(sf_dir)
    import pyarrow.parquet as pq
    cust = pq.read_table(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_mktsegment"])
    ref = ray.put(cust.to_pandas())

    def upsert_join(batch: pd.DataFrame) -> pd.DataFrame:
        out = batch.join(ray.get(ref).set_index("c_custkey"),
                         on="user_id", how="left")
        return out[["user_id", "op", "value", "c_mktsegment"]]

    return winners.map_batches(upsert_join, batch_format="pandas")


def join_large_rev_by_priority(sf_dir: str):
    """Large⋈large equi-join — neither side broadcast: per-order lineitem
    revenue (pre-reduced to one row per orderkey via the keyed bucket
    tree-agg, so the join input is already minimal) hash-joined to orders
    with Ray Data's native distributed join, then a tiny per-priority final.
    The one catalog join where both sides are fact tables."""
    li = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_extendedprice", "l_discount"])

    def partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        df["rev"] = df["l_extendedprice"] * (1 - df["l_discount"])
        g = df.groupby("l_orderkey", sort=False)["rev"].sum().reset_index()
        return _pa_from_pandas(g, preserve_index=False)

    def per_order(t: pa.Table) -> pa.Table:
        g = t.to_pandas().groupby("l_orderkey", sort=False)["rev"].sum() \
             .reset_index()
        return _pa_from_pandas(g, preserve_index=False)

    rev = _tree_agg(li, partial, per_order, bucket_on="l_orderkey")
    orders = _read(sf_dir, "orders",
                   columns=["o_orderkey", "o_orderpriority"])
    joined = rev.join(orders, "inner", 16, on=("l_orderkey",),
                      right_on=("o_orderkey",))

    def pri_partial(t: pa.Table) -> pa.Table:
        g = t.to_pandas().groupby("o_orderpriority", sort=False).agg(
            n_orders=("rev", "size"), sum_rev=("rev", "sum")).reset_index()
        return _pa_from_pandas(g, preserve_index=False)

    def pri_final(t: pa.Table) -> pa.Table:
        g = t.to_pandas().groupby("o_orderpriority", sort=False).agg(
            n_orders=("n_orders", "sum"), sum_rev=("sum_rev", "sum")) \
             .reset_index()
        out = _pa_from_pandas(g, preserve_index=False)
        return out.set_column(out.schema.get_field_index("sum_rev"),
                              "sum_rev", _round2(out["sum_rev"]))

    return _tree_agg(joined, pri_partial, pri_final)


# --------------------------------------------------------------------------
# aggregations / distinct / counts (A1-A5)


def agg_pricing_summary(sf_dir: str):
    """Grouped aggregate with block-level pre-aggregation (the combiner
    push-down): one partial row per (flag,status) per block enters the
    shuffle instead of every lineitem row."""
    ds = _read(sf_dir, "lineitem",
               columns=["l_returnflag", "l_linestatus", "l_quantity",
                        "l_extendedprice", "l_discount"])

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["disc_price"] = df["l_extendedprice"] * (1 - df["l_discount"])
        g = df.groupby(["l_returnflag", "l_linestatus"], sort=False).agg(
            sum_qty=("l_quantity", "sum"),
            sum_base=("l_extendedprice", "sum"),
            sum_disc=("disc_price", "sum"),
            n=("l_quantity", "size"),
        ).reset_index()
        return _pa_from_pandas(g, preserve_index=False)

    def final(t: pa.Table) -> pa.Table:
        g = t.to_pandas().groupby(["l_returnflag", "l_linestatus"],
                                  sort=False).sum().reset_index()
        out = _pa_from_pandas(g, preserve_index=False)
        return pa.table({
            "l_returnflag": out["l_returnflag"],
            "l_linestatus": out["l_linestatus"],
            "sum_qty": _round2(out["sum_qty"]),
            "sum_base": _round2(out["sum_base"]),
            "sum_disc": _round2(out["sum_disc"]),
            "n": out["n"],
        })

    return _tree_agg(ds, partial, final)


def distinct_keys(sf_dir: str):
    """DISTINCT (A2: `select distinct u.logonId`, UserId.java:40-41).
    Per-block unique bounds the final to distinct values per block."""
    ds = _read(sf_dir, "events", columns=["user_id"])

    def uniq(t: pa.Table) -> pa.Table:
        u = np.unique(t["user_id"].to_numpy(zero_copy_only=False))
        return pa.table({"user_id": pa.array(u, pa.int64())})

    return _tree_agg(ds, uniq, uniq, bucket_on="user_id")


def count_consumed(sf_dir: str):
    """Consumed-record count (A3, ConsumerCounter.java:16-18)."""
    n = _read(sf_dir, "lineitem", columns=["l_orderkey"]).count()
    return pa.table({"n_rows": pa.array([n], pa.int64())})


def approx_distinct_users(sf_dir: str):
    """Approximate distinct users via HyperLogLog (functions/sketch.py):
    per-block 1KB sketches, order-independent max-merge, one estimate row.
    The mergeable-sketch shape for cardinality at 100 TB — the shuffle
    carries M bytes per block no matter the input size. Deterministic, so
    the driver checks it against an independently implemented golden
    estimate (plus a relative-error assertion in tests)."""
    from .functions.sketch import approx_distinct
    ds = _read(sf_dir, "events", columns=["user_id"])
    return approx_distinct(ds, "user_id")


HH_PHI_DEN = 2000  # heavy hitter = key with count > total_rows / HH_PHI_DEN


def heavy_hitter_users(sf_dir: str):
    """EXACT frequent-items via the two-scan sketch pattern: (1) a
    Misra-Gries sketch pass (functions/sketch.py) whose merged summary is a
    guaranteed SUPERSET of every key with count > n/HH_PHI_DEN — the
    summary is <= k rows per block and <= k rows total, so the key universe
    never shuffles; (2) the <= k candidates broadcast once via ``ray.put``
    and counted exactly in a second linear scan (per-block partial counts
    of candidates only -> keyed wave final). No groupby over all keys ever
    runs: at 100 TB with a zipf key universe the sketch pass is the only
    full read and carries O(k) rows per block. Candidate verification makes
    the Bloom/MG false positives exact — same discipline as the LSH
    verify stages. Total row count comes from the parquet footers (exact,
    no scan)."""
    import pyarrow.parquet as pq

    from .functions.sketch import mg_candidates
    total = pq.ParquetFile(f"{sf_dir}/events.parquet").metadata.num_rows
    min_count = total / HH_PHI_DEN
    k = max(64, 4 * HH_PHI_DEN)
    ds = _read(sf_dir, "events", columns=["user_id"])
    cand = mg_candidates(ds, "user_id", k, total, min_count)
    cref = ray.put(cand)

    def count_cands(t: pa.Table) -> pa.Table:
        c = ray.get(cref)
        v = t["user_id"].to_numpy(zero_copy_only=False)
        v = v[np.isin(v, c)]
        keys, cnts = np.unique(v, return_counts=True)
        return pa.table({"user_id": pa.array(keys, pa.int64()),
                         "n_events": pa.array(cnts.astype(np.int64))})

    def final(t: pa.Table) -> pa.Table:
        g = t.to_pandas().groupby("user_id", sort=False)["n_events"] \
            .sum().reset_index()
        g = g[g["n_events"].to_numpy() * HH_PHI_DEN > total]
        return pa.table({"user_id": pa.array(g["user_id"].to_numpy(np.int64)),
                         "n_events": pa.array(
                             g["n_events"].to_numpy(np.int64))})

    return _tree_agg(ds, count_cands, final, bucket_on="user_id")


def distinct_users_by_type(sf_dir: str):
    """COUNT(DISTINCT key) per group — the two-level exact shape: blocks
    pre-distinct their (group, key) pairs (bounds the exchange to distinct
    pairs per block, not rows), pairs exchange into hash(key) buckets where
    global dedup is local (a key never spans buckets, so per-bucket
    per-group distinct counts add), and a single tiny final sums the
    per-bucket counts per group."""
    from .functions.joins import _int_bucket
    from .stages.waves import wave_group_reduce

    nb = _agg_buckets()
    ds = _read(sf_dir, "events", columns=["event_type", "user_id"])

    def pairs(t: pa.Table) -> pa.Table:
        df = t.to_pandas().drop_duplicates()
        u = df["user_id"].to_numpy(np.int64)
        return pa.table({"event_type": pa.array(df["event_type"].tolist(),
                                                pa.string()),
                         "user_id": pa.array(u),
                         "_bucket": pa.array(_int_bucket(u, nb))})

    def bucket_counts(t: pa.Table) -> pa.Table:
        g = t.to_pandas().drop_duplicates(["event_type", "user_id"]) \
            .groupby("event_type", sort=False).size().reset_index(name="n")
        return pa.table({"event_type": pa.array(g["event_type"].tolist(),
                                                pa.string()),
                         "n": pa.array(g["n"].to_numpy(np.int64))})

    per_bucket = wave_group_reduce(
        ds.map_batches(pairs, batch_format="pyarrow"), "_bucket", nb,
        bucket_counts)

    def final(t: pa.Table) -> pa.Table:
        g = t.to_pandas().groupby("event_type", sort=False)["n"] \
            .sum().reset_index(name="n_users")
        return pa.table({"event_type": pa.array(g["event_type"].tolist(),
                                                pa.string()),
                         "n_users": pa.array(g["n_users"].to_numpy(np.int64))})

    return per_bucket.repartition(1).map_batches(
        final, batch_format="pyarrow", batch_size=None)


def bloom_semi_join_orders(sf_dir: str):
    """Semi join with Bloom pre-pruning — the broadcast-filter join shape
    for a selective build side at 100 TB: the build side (returned
    orderkeys) folds into a fixed-size Bloom filter (per-block byte rows,
    OR-merge tree, functions/sketch.py), the filter broadcasts once via
    ``ray.put``, and probe blocks drop non-matching rows BEFORE the keyed
    exchange — only survivors (true matches + ~1% false positives) shuffle
    into the exact verify, so the wire cost tracks the match count, not the
    probe size. The verify exchange (same int-only wave shape as
    ``semi_anti_join_orders``) makes false positives exact."""
    from .functions.joins import _int_bucket
    from .functions.sketch import (bloom_build, bloom_contains,
                                   bloom_params)
    from .stages.waves import wave_group_reduce

    import pyarrow.parquet as pq
    n_build_est = pq.ParquetFile(f"{sf_dir}/lineitem.parquet") \
        .metadata.num_rows
    m_bits, n_hashes = bloom_params(n_build_est)

    build = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_returnflag"],
                  filter=pc.field("l_returnflag") == "R") \
        .select_columns(["l_orderkey"])
    bloom = bloom_build(build, "l_orderkey", m_bits, n_hashes)
    bref = ray.put(bloom)

    nb = _row_sized_buckets(sf_dir, "orders")
    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"])

    def probe_prune(t: pa.Table) -> pa.Table:
        b = ray.get(bref)  # zero-copy from the local object store
        k = t["o_orderkey"].to_numpy(zero_copy_only=False)
        t = t.filter(pa.array(bloom_contains(b, k, n_hashes)))
        k = t["o_orderkey"].to_numpy(zero_copy_only=False)
        return pa.table({"key": t["o_orderkey"],
                         "o_totalprice": t["o_totalprice"],
                         "side": pa.array(np.zeros(len(k), np.int8)),
                         "_bucket": pa.array(_int_bucket(k, nb))})

    def build_side(t: pa.Table) -> pa.Table:
        k = np.unique(t["l_orderkey"].to_numpy(zero_copy_only=False))
        return pa.table({"key": pa.array(k, pa.int64()),
                         "o_totalprice": pa.nulls(len(k), pa.float64()),
                         "side": pa.array(np.ones(len(k), np.int8)),
                         "_bucket": pa.array(_int_bucket(k, nb))})

    both = orders.map_batches(probe_prune, batch_format="pyarrow").union(
        build.map_batches(build_side, batch_format="pyarrow"))

    def verify_bucket(t: pa.Table) -> pa.Table:
        side = t["side"].to_numpy(zero_copy_only=False)
        key = t["key"].to_numpy(zero_copy_only=False)
        probe = side == 0
        hit = np.isin(key[probe], np.unique(key[~probe]))
        price = t["o_totalprice"].filter(pa.array(probe))
        return pa.table({
            "o_orderkey": pa.array(key[probe][hit], pa.int64()),
            "o_totalprice": price.filter(pa.array(hit))})

    return wave_group_reduce(both, "_bucket", nb, verify_bucket)


TFIDF_TOP_K = 3


def tfidf_top_terms(sf_dir: str):
    """Per-document top-k terms by TF-IDF-style weighting — the standard
    corpus term-salience pass, shaped for scale: document frequency is the
    ONLY cross-document state, computed with one term-bucketed exchange of
    per-block (term, doc-count) partials and broadcast once via ``ray.put``
    (a natural-language vocabulary is Zipf-bounded, millions of terms, so
    the df map is a classic small side; for open vocabularies swap the
    broadcast for a term-keyed join of the same bucketed rows). Everything
    else is block-local: a document is one row, so tf, scoring and the
    per-doc top-k never leave the block. The weight is the exact rational
    tf/df evaluated as ONE double division on exact ints — both engine and
    oracle make the identical IEEE op, so ordering and values hash-match
    bit-for-bit (same discipline as stats_moments_by_group); idf is a
    monotone transform of 1/df, so for fixed tf the ranking matches the
    classic formulation."""
    from .functions.dedup import default_n_buckets
    from .stages.partition import hash_strings
    from .stages.waves import wave_group_reduce

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    nb = default_n_buckets()

    def df_partial(t: pa.Table) -> pa.Table:
        terms: list[str] = []
        for tx in t["text"].to_pylist():
            terms.extend(set(tx.split(" ")))
        c = pd.Series(terms, dtype="object").value_counts()
        out = pa.table({"term": pa.array(c.index.to_numpy(), pa.string()),
                        "df": pa.array(c.to_numpy(), pa.int64())})
        bucket = (hash_strings(out["term"]) % np.uint64(nb)).astype(np.int64)
        return out.append_column("_bucket", pa.array(bucket))

    def df_bucket_sum(t: pa.Table) -> pa.Table:
        g = t.to_pandas().groupby("term", sort=False)["df"].sum() \
            .reset_index()
        # explicit types: an empty bucket must not infer a null-typed
        # term column (block schemas would then disagree)
        return pa.table({"term": pa.array(g["term"].tolist(), pa.string()),
                         "df": pa.array(g["df"].to_numpy(np.int64))})

    df_rows = wave_group_reduce(
        ds.map_batches(df_partial, batch_format="pyarrow", batch_size=4096),
        "_bucket", nb, df_bucket_sum)
    # empty buckets emit zero-row tables whose pandas-inferred dtypes
    # differ; they carry nothing, drop them before the concat
    parts = [t for t in ray.get(df_rows.to_arrow_refs()) if t.num_rows]
    df_map = (pa.concat_tables(parts).to_pandas() if parts
              else pd.DataFrame({"term": pd.Series([], dtype="object"),
                                 "df": pd.Series([], dtype="int64")}))
    dref = ray.put(df_map)

    def score_block(t: pa.Table) -> pa.Table:
        dfm = ray.get(dref)
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        docs, terms = [], []
        for i, tx in enumerate(t["text"].to_pylist()):
            ws = tx.split(" ")
            docs.extend([ids[i]] * len(ws))
            terms.extend(ws)
        tf = pd.DataFrame({"doc_id": np.asarray(docs, np.int64),
                           "term": pd.Series(terms, dtype="object")}) \
            .groupby(["doc_id", "term"], sort=False).size() \
            .reset_index(name="tf")
        m = tf.merge(dfm, on="term", how="left")
        m["score"] = m["tf"].to_numpy(np.float64) \
            / m["df"].to_numpy(np.float64)
        m = m.sort_values(["doc_id", "score", "term"],
                          ascending=[True, False, True], kind="stable")
        top = m.groupby("doc_id", sort=False).head(TFIDF_TOP_K).copy()
        top["rank"] = top.groupby("doc_id", sort=False).cumcount() + 1
        return pa.table({"doc_id": pa.array(top["doc_id"].to_numpy(np.int64)),
                         "term": pa.array(top["term"].tolist(), pa.string()),
                         "rank": pa.array(top["rank"].to_numpy(np.int64)),
                         "score": pa.array(
                             top["score"].to_numpy(np.float64))})

    return ds.map_batches(score_block, batch_format="pyarrow",
                          batch_size=4096)


def stats_moments_by_group(sf_dir: str):
    """Per-group statistics (mean / sample stddev / Pearson correlation)
    via EXACT integer moment sums — the mergeable-moments shape: each block
    emits per-group (n, Sx, Sxx, Sy, Syy, Sxy) int64 partials (six numbers
    per group per block, additive under any merge tree, no precision drift
    from summation order), and the bounded final does the one float
    computation per group from exact Python ints. The oracle SQL computes
    the SAME formulas from the same exact integer sums (HUGEINT there), so
    both sides make identical IEEE ops on identical integers — bit-equal
    doubles with no rounding fudge. Quantity is integral and discount is an
    exact multiple of 0.01 in this schema; the basis-point recode keeps the
    moments integer."""
    ds = _read(sf_dir, "lineitem",
               columns=["l_returnflag", "l_quantity", "l_discount"])

    def partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        q = df["l_quantity"].to_numpy(np.float64).astype(np.int64)
        d = np.rint(df["l_discount"].to_numpy(np.float64) * 100.0) \
            .astype(np.int64)
        agg = pd.DataFrame({"l_returnflag": df["l_returnflag"],
                            "n": 1, "sq": q, "sqq": q * q,
                            "sd": d, "sdd": d * d, "sqd": q * d}) \
            .groupby("l_returnflag", sort=False).sum().reset_index()
        return _pa_from_pandas(agg, preserve_index=False)

    def final(t: pa.Table) -> pa.Table:
        import math
        g = t.to_pandas().groupby("l_returnflag", sort=False).sum() \
            .reset_index()
        rows = {"l_returnflag": [], "n": [], "mean_qty": [],
                "stddev_qty": [], "corr_qty_disc": []}
        for r in g.itertuples(index=False):
            # Python ints: the cross products exceed int64 at scale
            n, sq, sqq = int(r.n), int(r.sq), int(r.sqq)
            sd, sdd, sqd = int(r.sd), int(r.sdd), int(r.sqd)
            vq = n * sqq - sq * sq
            vd = n * sdd - sd * sd
            rows["l_returnflag"].append(r.l_returnflag)
            rows["n"].append(n)
            rows["mean_qty"].append(float(sq) / float(n))
            rows["stddev_qty"].append(
                math.sqrt(float(vq) / float(n * (n - 1))))
            rows["corr_qty_disc"].append(
                float(n * sqd - sq * sd) / math.sqrt(float(vq * vd)))
        return pa.table({"l_returnflag": pa.array(rows["l_returnflag"],
                                                  pa.string()),
                         "n": pa.array(rows["n"], pa.int64()),
                         "mean_qty": pa.array(rows["mean_qty"], pa.float64()),
                         "stddev_qty": pa.array(rows["stddev_qty"],
                                                pa.float64()),
                         "corr_qty_disc": pa.array(rows["corr_qty_disc"],
                                                   pa.float64())})

    return _tree_agg(ds, partial, final)


def median_mode_by_group(sf_dir: str):
    """Exact per-group order statistics over a BOUNDED value domain by
    counting, never sorting: quantity is integral in [1, 50], so each block
    emits at most |domain| x |groups| count rows, the counts add under any
    merge tree, and the bounded final reads the median (first value whose
    cumulative count reaches ceil(n/2)) and mode (max count, smallest value
    on ties) straight off the merged histogram. The general-domain variant
    is functions/stats.exact_quantiles (histogram refinement); this is the
    degenerate one-round case worth its own shape — at 100 TB it is one
    linear scan plus a 150-row reduce."""
    ds = _read(sf_dir, "lineitem", columns=["l_returnflag", "l_quantity"])

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "l_returnflag": t["l_returnflag"].to_pandas(),
            "q": t["l_quantity"].to_numpy(zero_copy_only=False)
            .astype(np.int64)})
        g = df.groupby(["l_returnflag", "q"], sort=False) \
            .size().reset_index(name="cnt")
        return _pa_from_pandas(g, preserve_index=False)

    def final(t: pa.Table) -> pa.Table:
        c = t.to_pandas().groupby(["l_returnflag", "q"], sort=False)["cnt"] \
            .sum().reset_index().sort_values(["l_returnflag", "q"])
        rows = {"l_returnflag": [], "median_qty": [], "mode_qty": [],
                "n": []}
        for flag, grp in c.groupby("l_returnflag", sort=True):
            cnt = grp["cnt"].to_numpy(np.int64)
            q = grp["q"].to_numpy(np.int64)
            n = int(cnt.sum())
            cum = np.cumsum(cnt)
            med = int(q[np.searchsorted(cum, -(-n // 2))])
            mode = int(q[np.lexsort((q, -cnt))[0]])
            rows["l_returnflag"].append(flag)
            rows["median_qty"].append(med)
            rows["mode_qty"].append(mode)
            rows["n"].append(n)
        return pa.table({"l_returnflag": pa.array(rows["l_returnflag"],
                                                  pa.string()),
                         "median_qty": pa.array(rows["median_qty"],
                                                pa.int64()),
                         "mode_qty": pa.array(rows["mode_qty"], pa.int64()),
                         "n": pa.array(rows["n"], pa.int64())})

    return _tree_agg(ds, partial, final)


HIST_BIN_WIDTH = 5.0


def value_histogram(sf_dir: str):
    """Exact mergeable histogram of event values (distribution profiling):
    per-block vectorized binning partials, keyed final over bin ids. Counts
    merge by sum, so the result is partitioning-independent and the shuffle
    carries one row per bin per block."""
    ds = _read(sf_dir, "events", columns=["value"])

    def partial(t: pa.Table) -> pa.Table:
        v = t["value"].to_numpy(zero_copy_only=False)
        bins = np.floor(v / HIST_BIN_WIDTH).astype(np.int64)
        u, c = np.unique(bins, return_counts=True)
        return pa.table({"bin": pa.array(u, pa.int64()),
                         "n": pa.array(c.astype(np.int64))})

    def final(t: pa.Table) -> pa.Table:
        g = t.to_pandas().groupby("bin", sort=False)["n"].sum().reset_index()
        return _pa_from_pandas(g, preserve_index=False)

    return _tree_agg(ds, partial, final, bucket_on="bin")


QUANTILE_PROBS = (0.25, 0.5, 0.9, 0.99)


def exact_quantiles_price(sf_dir: str):
    """Exact order statistics of l_extendedprice WITHOUT a global sort:
    histogram-refinement selection (functions/stats.py) — log_nbins(n)
    streaming counting scans whose shuffle payload is (rank, bin, n) int
    rows, then one bounded filter-collect. min/max/row-count come free
    from the parquet footer. PERCENTILE_DISC semantics: the element at
    1-based rank ceil(p*n), bit-identical to DuckDB quantile_disc."""
    import pyarrow.parquet as pq

    from .functions.stats import exact_quantiles

    pf = pq.ParquetFile(f"{sf_dir}/lineitem.parquet")
    md = pf.metadata
    ci = pf.schema_arrow.get_field_index("l_extendedprice")
    lo = min(md.row_group(i).column(ci).statistics.min
             for i in range(md.num_row_groups))
    hi = max(md.row_group(i).column(ci).statistics.max
             for i in range(md.num_row_groups))
    ds = _read(sf_dir, "lineitem", columns=["l_extendedprice"])
    q = exact_quantiles(ds, "l_extendedprice", QUANTILE_PROBS,
                        lo=lo, hi=hi, n=md.num_rows)
    return pa.table({f"p{int(p * 100)}": pa.array([q[p]], pa.float64())
                     for p in QUANTILE_PROBS})


def window_running_agg(sf_dir: str):
    """Per-key window functions (row_number / running sum / lag delta) —
    the per-row analytic family, distinct from the tumbling/hopping
    AGGREGATE windows. Keys hash into coarse buckets (one keyed exchange,
    same shape as the sessionizer); each bucket computes every user's
    windows in one vectorized pass (sort + grouped cumsum/diff). Running
    sums accumulate in integer cents (floor(value*100)) so the result is
    bit-exact against the SQL window oracle regardless of float summation
    order."""
    from .functions.joins import _int_bucket
    from .stages.waves import wave_group_reduce

    ds = _read(sf_dir, "events", columns=["event_id", "user_id", "ts",
                                          "value"])
    nb = _row_sized_buckets(sf_dir, "events")

    def add_bucket(t: pa.Table) -> pa.Table:
        b = _int_bucket(t["user_id"].to_numpy(zero_copy_only=False), nb)
        return t.append_column("_bucket", pa.array(b))

    def windows_bucket(t: pa.Table) -> pa.Table:
        g = t.to_pandas().sort_values(["user_id", "ts", "event_id"],
                                      kind="stable")
        grp = g.groupby("user_id", sort=False)
        g["rn"] = grp.cumcount() + 1
        cents = np.floor(g["value"].to_numpy() * 100.0).astype(np.int64)
        g["run_cents"] = pd.Series(cents, index=g.index) \
            .groupby(g["user_id"], sort=False).cumsum()
        ts_us = g["ts"].astype("datetime64[us]").astype("int64")
        delta = ts_us.groupby(g["user_id"], sort=False).diff()
        g["delta_us"] = delta.fillna(0).astype("int64")
        return _pa_from_pandas(
            g[["event_id", "user_id", "rn", "run_cents", "delta_us"]],
            preserve_index=False)

    return wave_group_reduce(
        ds.map_batches(add_bucket, batch_format="pyarrow"),
        "_bucket", nb, windows_bucket)


def json_extract_props(sf_dir: str):
    """JSON field extraction from the event envelope (the CDC-payload
    shape: a serialized props document per change row). Flat-key fast
    path: one vectorized Arrow regex kernel per batch — no per-row Python
    json.loads in the hot path (nested payloads would parse inside the
    same batch fn). Null when the key is absent."""
    ds = _read(sf_dir, "events", columns=["event_id", "props"])

    def extract(t: pa.Table) -> pa.Table:
        m = pc.extract_regex(t["props"], r'"k":\s*(?P<v>-?\d+)')
        k = pc.cast(pc.struct_field(m, "v"), pa.int64())
        return pa.table({"event_id": t["event_id"], "k": k})

    return ds.map_batches(extract, batch_format="pyarrow",
                          batch_size=65536)


def pivot_revenue(sf_dir: str):
    """Pivot / crosstab: revenue (integer cents, exact) by line status x
    return flag, wide output. Per-block vectorized partial over the
    (status, flag) pairs, one bounded final (the pivoted key space is
    enumerable) that spreads flags into columns."""
    ds = _read(sf_dir, "lineitem",
               columns=["l_returnflag", "l_linestatus", "l_extendedprice"])

    def partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        df["cents"] = np.floor(
            df.pop("l_extendedprice").to_numpy() * 100.0).astype(np.int64)
        g = df.groupby(["l_linestatus", "l_returnflag"], sort=False).agg(
            cents=("cents", "sum"), n=("cents", "size")).reset_index()
        return _pa_from_pandas(g, preserve_index=False)

    def final(t: pa.Table) -> pa.Table:
        df = t.to_pandas().groupby(
            ["l_linestatus", "l_returnflag"], sort=False).sum().reset_index()
        wide = df.pivot_table(index="l_linestatus", columns="l_returnflag",
                              values="cents", aggfunc="sum", fill_value=0)
        out = pd.DataFrame({
            "l_linestatus": wide.index,
            **{f"{f.lower()}_cents": wide.get(f, pd.Series(0, wide.index))
               .astype("int64").to_numpy() for f in ("A", "N", "R")},
            "n_rows": df.groupby("l_linestatus", sort=False)["n"].sum()
            .reindex(wide.index).astype("int64").to_numpy(),
        })
        return _pa_from_pandas(out, preserve_index=False)

    return _tree_agg(ds, partial, final)


def rollup_revenue(sf_dir: str):
    """GROUP BY ROLLUP (grouping sets): revenue cents + row counts at
    (flag, status), (flag), and () levels. One scan computes the finest
    partials per block; the bounded final derives every coarser level by
    re-aggregating them — subtotals never rescan the table."""
    ds = _read(sf_dir, "lineitem",
               columns=["l_returnflag", "l_linestatus", "l_extendedprice"])

    def partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        df["cents"] = np.floor(
            df.pop("l_extendedprice").to_numpy() * 100.0).astype(np.int64)
        g = df.groupby(["l_returnflag", "l_linestatus"], sort=False).agg(
            cents=("cents", "sum"), n=("cents", "size")).reset_index()
        return _pa_from_pandas(g, preserve_index=False)

    def final(t: pa.Table) -> pa.Table:
        fine = t.to_pandas().groupby(
            ["l_returnflag", "l_linestatus"], sort=False).sum().reset_index()
        by_flag = fine.groupby("l_returnflag", sort=False)[["cents", "n"]] \
            .sum().reset_index()
        by_flag["l_linestatus"] = None
        total = pd.DataFrame({"l_returnflag": [None], "l_linestatus": [None],
                              "cents": [fine["cents"].sum()],
                              "n": [fine["n"].sum()]})
        out = pd.concat([fine, by_flag, total], ignore_index=True)
        out["n"] = out["n"].astype("int64")
        out["cents"] = out["cents"].astype("int64")
        return _pa_from_pandas(
            out[["l_returnflag", "l_linestatus", "cents", "n"]],
            preserve_index=False)

    return _tree_agg(ds, partial, final)


GROUPED_TOPK = 3


def grouped_topk_events(sf_dir: str):
    """Per-GROUP top-k (sort+truncate per key, not global): highest-value
    events per event_type. Top-k is a semilattice, so each block keeps at
    most k rows per group and the final merges partial winners — shuffle
    volume is k x groups x blocks, never the table."""
    ds = _read(sf_dir, "events", columns=["event_id", "event_type", "value"])

    def topk(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["value", "event_id"], ascending=[False, True],
                            kind="stable")
        return df.groupby("event_type", sort=False).head(GROUPED_TOPK)

    def partial(t: pa.Table) -> pa.Table:
        return _pa_from_pandas(topk(t.to_pandas()), preserve_index=False)

    def final(t: pa.Table) -> pa.Table:
        df = topk(t.to_pandas())
        df["rk"] = df.groupby("event_type", sort=False).cumcount() + 1
        return _pa_from_pandas(df, preserve_index=False)

    return _tree_agg(ds, partial, final)


def semi_anti_join_orders(sf_dir: str):
    """Semi/anti join as a first-class operator: flag each order by whether
    it has a returned ('R') lineitem. Only KEYS cross the wire: the probe
    side pre-distincts returned orderkeys per block, both sides hash into a
    shared bucket space (one int-only exchange), and each bucket flags its
    orders with one vectorized isin — the build side is never broadcast and
    the rows themselves never move."""
    from .functions.joins import _int_bucket
    from .stages.waves import wave_group_reduce

    nb = _row_sized_buckets(sf_dir, "orders")
    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_orderpriority"])
    returned = _read(sf_dir, "lineitem", columns=["l_orderkey",
                                                  "l_returnflag"])

    def order_side(t: pa.Table) -> pa.Table:
        k = t["o_orderkey"].to_numpy(zero_copy_only=False)
        return pa.table({"key": t["o_orderkey"],
                         "o_orderpriority": t["o_orderpriority"],
                         "side": pa.array(np.zeros(len(k), np.int8)),
                         "_bucket": pa.array(_int_bucket(k, nb))})

    def probe_side(t: pa.Table) -> pa.Table:
        k = t["l_orderkey"].to_numpy(zero_copy_only=False)
        k = np.unique(k[np.asarray(t["l_returnflag"]) == "R"])
        return pa.table({"key": pa.array(k, pa.int64()),
                         "o_orderpriority": pa.nulls(len(k), pa.string()),
                         "side": pa.array(np.ones(len(k), np.int8)),
                         "_bucket": pa.array(_int_bucket(k, nb))})

    both = orders.map_batches(order_side, batch_format="pyarrow").union(
        returned.map_batches(probe_side, batch_format="pyarrow"))

    def flag_bucket(t: pa.Table) -> pa.Table:
        side = t["side"].to_numpy(zero_copy_only=False)
        key = t["key"].to_numpy(zero_copy_only=False)
        hit = np.isin(key[side == 0], np.unique(key[side == 1]))
        return pa.table({
            "o_orderkey": pa.array(key[side == 0], pa.int64()),
            "o_orderpriority": t["o_orderpriority"].filter(
                pa.array(side == 0)),
            "has_return": pa.array(hit)})

    return wave_group_reduce(both, "_bucket", nb, flag_bucket)


def events_window_agg(sf_dir: str):
    """Tumbling event-time window (streaming concern §2.9): per (user, day)
    count + sum. Partial per block, then a small groupby — window results
    never require global ordering."""
    ds = _read(sf_dir, "events", columns=["user_id", "ts", "value"])

    def add_day(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "day", pc.floor_temporal(batch["ts"], unit="day"))

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        g = df.groupby(["user_id", "day"], sort=False).agg(
            n=("value", "size"), sum_value=("value", "sum")).reset_index()
        return _pa_from_pandas(g, preserve_index=False)

    def final(t: pa.Table) -> pa.Table:
        g = t.to_pandas().groupby(["user_id", "day"], sort=False).agg(
            n=("n", "sum"), sum_value=("sum_value", "sum")).reset_index()
        out = _pa_from_pandas(g, preserve_index=False)
        return out.set_column(out.schema.get_field_index("sum_value"),
                              "sum_value", _round2(out["sum_value"]))

    return _tree_agg(ds.map_batches(add_day, batch_format="pyarrow"),
                     partial, final, bucket_on="user_id")


# --------------------------------------------------------------------------
# sort / top-k / union (O1-O4, D3)


def topk_hot_keys(sf_dir: str):
    """Top-10 hottest keys (skew detection input for salting, SURVEY §4.2).
    Per-block counts -> final sum + top-k; deterministic tie-break."""
    ds = _read(sf_dir, "events", columns=["user_id"])

    def partial(t: pa.Table) -> pa.Table:
        u, c = np.unique(t["user_id"].to_numpy(zero_copy_only=False),
                         return_counts=True)
        return pa.table({"user_id": pa.array(u, pa.int64()),
                         "n": pa.array(c.astype(np.int64))})

    def final(t: pa.Table) -> pa.Table:
        g = t.to_pandas().groupby("user_id", sort=False)["n"].sum().reset_index()
        g = g.sort_values(["n", "user_id"], ascending=[False, True],
                          kind="stable").head(10)
        return _pa_from_pandas(g, preserve_index=False)

    return _tree_agg(ds, partial, final)


def stable_order_head(sf_dir: str):
    """Stable change ordering (O1: ORDER BY (watermark, id)) — first 200
    events in total (ts, lsn) order. Per-block top-200, tiny final sort —
    no global sort."""
    ds = _read(sf_dir, "events", columns=["event_id", "ts", "user_id"])

    def topk(t: pa.Table) -> pa.Table:
        df = t.to_pandas().sort_values(["ts", "event_id"], kind="stable")
        return _pa_from_pandas(df.head(200), preserve_index=False)

    return _tree_agg(ds, topk, topk)


def union_change_sources(sf_dir: str):
    """Union of two change feeds (D3: CWS-side + CAP-side change lists,
    CapUsersIncrementalUpdatesProcessor.java:26-42)."""
    clicks = _read(sf_dir, "events",
                   columns=["event_id", "user_id", "event_type"],
                   filter=pc.field("event_type") == "click")
    errors = _read(sf_dir, "events",
                   columns=["event_id", "user_id", "event_type"],
                   filter=pc.field("event_type") == "error")
    return clicks.union(errors)


def asof_join_latest_event(sf_dir: str):
    """As-of join for two LARGE sides (custom operator; Ray Data has none):
    each event joined to its customer's latest order at-or-before the event
    time. Both sides hash the customer key into a shared bucket space and
    co-locate through one keyed shuffle; each bucket runs one vectorized
    ``pd.merge_asof`` (functions/joins.py). Neither side is broadcast or
    driver-materialized; ties on o_orderdate resolve to max o_orderkey."""
    from .functions.joins import bucketed_asof_join

    events = _read(sf_dir, "events", columns=["event_id", "user_id", "ts"])
    orders = _read(sf_dir, "orders",
                   columns=["o_orderkey", "o_custkey", "o_orderdate"])
    joined = bucketed_asof_join(events, orders,
                                left_by="user_id", right_by="o_custkey",
                                left_on="ts", right_on="o_orderdate",
                                n_buckets=_row_sized_buckets(
                                    sf_dir, "events", "orders"),
                                right_tiebreak=["o_orderkey"])

    def project(out: pd.DataFrame) -> pd.DataFrame:
        # int columns pass through the two-sided union as nullable -> float
        return pd.DataFrame({
            "lsn": out["event_id"].astype("int64"),
            "user_id": out["user_id"].astype("int64"),
            "o_orderkey": out["o_orderkey"].astype("int64"),
            "o_orderdate": out["o_orderdate"],
        })

    return joined.map_batches(project, batch_format="pandas")


RANGE_JOIN_WINDOW_US = 3_600_000_000  # 1 hour in timestamp[us] units


def range_join_followups(sf_dir: str):
    """Keyed BAND join for two LARGE sides (custom operator; Ray Data has
    none): every pair of events by the same user where the second falls
    strictly after the first but within one hour — the range-join member of
    the custom-join family next to the as-of join. One keyed bucket shuffle
    co-locates both sides; each bucket computes every left row's match
    window with two vectorized lexsort-rank passes and expands pairs with
    one repeat/arange (functions/joins.py bucketed_range_join) — never a
    per-key cross product, nothing broadcast or driver-materialized."""
    from .functions.joins import bucketed_range_join

    left = _read(sf_dir, "events", columns=["event_id", "user_id", "ts"])

    def rn(t: pa.Table) -> pa.Table:
        return t.rename_columns(["b_event", "b_user", "b_ts"])

    right = (_read(sf_dir, "events", columns=["event_id", "user_id", "ts"])
             .map_batches(rn, batch_format="pyarrow"))
    joined = bucketed_range_join(
        left, right, left_by="user_id", right_by="b_user",
        left_on="ts", right_on="b_ts",
        lo=0, hi=RANGE_JOIN_WINDOW_US,
        lo_inclusive=False, hi_inclusive=True,
        n_buckets=_row_sized_buckets(sf_dir, "events"))

    def project(t: pa.Table) -> pa.Table:
        return pa.table({"a_event": t["event_id"],
                         "b_event": t["b_event"],
                         "user_id": t["user_id"]})

    return joined.map_batches(project, batch_format="pyarrow")


SESSION_GAP_MIN = 30


def sessionize_events(sf_dir: str):
    """Session windows (custom operator): per-user sessions split at
    >30-minute gaps, with per-session count and bounds.

    Sessions are key-local state that can span input blocks, so rows must
    co-locate by user — but NOT one Python call per user: users hash into
    coarse buckets (one keyed shuffle), and each bucket sessionizes ALL its
    users in one vectorized pass (sort + shift + grouped cumsum)."""
    from .functions.joins import _int_bucket

    ds = _read(sf_dir, "events", columns=["event_id", "user_id", "ts"])
    nb = _row_sized_buckets(sf_dir, "events")

    def add_bucket(t: pa.Table) -> pa.Table:
        b = _int_bucket(t["user_id"].to_numpy(zero_copy_only=False), nb)
        return t.append_column("_bucket", pa.array(b))

    def sessionize_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="stable")
        same_user = g["user_id"].eq(g["user_id"].shift())
        gap = g["ts"].diff() > pd.Timedelta(minutes=SESSION_GAP_MIN)
        g = g.assign(brk=(same_user & gap).astype("int64"))
        g["session_id"] = g.groupby("user_id", sort=False)["brk"].cumsum()
        out = g.groupby(["user_id", "session_id"], sort=False).agg(
            n=("event_id", "size"),
            session_start=("ts", "min"),
            session_end=("ts", "max"),
        ).reset_index()
        return out[["user_id", "session_id", "n", "session_start",
                    "session_end"]]

    from .stages.waves import wave_group_reduce

    def sessionize_tbl(t: pa.Table) -> pa.Table:
        return _pa_from_pandas(sessionize_bucket(t.to_pandas()),
                                    preserve_index=False)

    return wave_group_reduce(
        ds.map_batches(add_bucket, batch_format="pyarrow"),
        "_bucket", nb, sessionize_tbl)


# --------------------------------------------------------------------------
# training-data operators (dedup / similarity / text analysis / multimodal)


def dedup_exact_text(sf_dir: str):
    """Exact dedup: lowest doc_id per distinct text + copy count
    (hash-partitioned per-group-first; see functions/dedup.py)."""
    from .functions.dedup import exact_dedup
    return exact_dedup(_read(sf_dir, "documents", columns=["doc_id", "text"]))


def text_quality(sf_dir: str):
    """Quality features: char/word counts, EN-marker count & ratio."""
    from .functions.text import quality_features
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(quality_features, batch_format="pyarrow",
                          batch_size=4096)


def token_counts_by_lang(sf_dir: str):
    """Corpus token counting grouped by language (budgeting input for
    training-data pipelines)."""
    from .functions.text import n_words as _nw
    ds = _read(sf_dir, "documents", columns=["doc_id", "lang", "text"])

    def partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({"lang": batch["lang"].to_pandas(),
                           "nw": _nw(batch["text"]).to_pandas()})
        g = df.groupby("lang", sort=False).agg(
            n_tokens=("nw", "sum"), n_docs=("nw", "size")).reset_index()
        return _pa_from_pandas(g, preserve_index=False)

    def final(t: pa.Table) -> pa.Table:
        g = t.to_pandas().groupby("lang", sort=False).agg(
            n_tokens=("n_tokens", "sum"), n_docs=("n_docs", "sum")).reset_index()
        return _pa_from_pandas(g, preserve_index=False)

    return _tree_agg(ds, partial, final)


def lang_id_heuristic(sf_dir: str):
    """Marker-density language ID (functions/text.py)."""
    from .functions.text import lang_id
    ds = _read(sf_dir, "documents", columns=["doc_id", "lang", "text"])
    return ds.map_batches(lang_id, batch_format="pyarrow", batch_size=4096)


def doc_fingerprint(sf_dir: str):
    """Content fingerprint (md5) per document."""
    from .functions.text import md5_fingerprint
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(md5_fingerprint, batch_format="pyarrow",
                          batch_size=4096)


def token_counts_bpe(sf_dir: str):
    """BPE-ish regex token counts via an ACTOR POOL (regex compiled once per
    actor — the stateful-stage pattern). Golden-VALUES oracle; the tokenizer is
    unit-tested against a pure-python reference."""
    from .functions.text import BpeTokenCounter
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(BpeTokenCounter, batch_format="pyarrow",
                          batch_size=2048, concurrency=2, num_cpus=1)


def rolling_hash_fingerprints(sf_dir: str):
    """Winnowing rolling-hash document fingerprints (rows-only check;
    algorithm unit-tested on hand-computed examples)."""
    from .functions.text import winnow_fingerprints
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(winnow_fingerprints, batch_format="pyarrow",
                          batch_size=2048)


def simhash_fingerprint(sf_dir: str):
    """64-bit SimHash per document (no SQL equivalent — rows-only check)."""
    from .functions.text import simhash_batch
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(simhash_batch, batch_format="pyarrow",
                          batch_size=2048)


JACCARD_THRESHOLD = 0.95


def ngram_jaccard_pairs(sf_dir: str):
    """Word-set Jaccard near-dup pairs ≥ threshold via the SCALE path:
    LSH candidates -> distributed hash-join to texts -> exact verify.
    Oracle-exact (integer set sizes -> the Jaccard double is bit-identical
    to SQL; LSH miss probability ~2e-12 at j=0.95)."""
    from .functions.dedup import lsh_verified_pairs
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return lsh_verified_pairs(ds, JACCARD_THRESHOLD, shingle=1)


def minhash_lsh_dups(sf_dir: str):
    """MinHash+LSH near-dup pairs over word 3-gram shingles (order-sensitive
    near-duplication, the web-dedup standard), exact-verified within
    candidate buckets — oracle-checked against DuckDB's list-comprehension
    shingling."""
    from .functions.dedup import lsh_verified_pairs
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return lsh_verified_pairs(ds, JACCARD_THRESHOLD, shingle=3)


def neardup_clusters(sf_dir: str):
    """Duplicate CLUSTERS: shingle-set collapse -> LSH-verified word-set
    Jaccard pairs over group representatives -> connected components over
    rep pairs + star edges via distributed min-label propagation (edges AND
    the node-label map stay keyed Datasets; the driver sees only a
    per-round changed count). The collapse means set-identical docs never
    enter the band waves or the quadratic pair set — a mega-duplicate
    corpus costs linear edges, and labels are provably identical to
    components over the full pair set. Oracle-exact: DuckDB computes the
    same transitive closure with a recursive CTE."""
    from .functions.dedup import neardup_components
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return neardup_components(ds, JACCARD_THRESHOLD, shingle=1)


ANN_K = 10
ANN_N_QUERIES = 5


def _load_queries(sf_dir: str):
    import pyarrow.parquet as pq
    t = pq.read_table(f"{sf_dir}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    t = t.filter(pc.field("vec_id") < ANN_N_QUERIES)
    q = np.asarray(t["embedding"].to_pylist(), dtype=np.float64)
    return q, t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)


def ann_cosine_topk(sf_dir: str):
    """Exact cosine top-k per query vector (brute force baseline)."""
    from .functions.ann import cosine_topk
    q, qids = _load_queries(sf_dir)
    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return cosine_topk(ds, q, qids, ANN_K)


def ann_ivf_topk(sf_dir: str):
    """IVF-bucketed approximate top-k (coarse k-means quantizer + inverted
    lists; scale path alongside the LSH variant). Oracle: golden VALUES from
    a naive per-vector evaluator over the same pinned centroids
    (__ray_entry__._golden_oracle_sqls); recall vs the exact baseline also
    tested in tests/test_functions.py."""
    from .functions.ann import ivf_topk
    q, qids = _load_queries(sf_dir)
    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return ivf_topk(ds, q, qids, ANN_K)


def ann_pq_topk(sf_dir: str):
    """Product-quantization approximate top-k (asymmetric distance over
    m-byte codes — the compressed-domain scan that makes 100-TB embedding
    corpora searchable in memory; see functions/ann.py pq_topk). Oracle:
    golden VALUES from a naive per-vector evaluator over the same pinned
    codebooks (__ray_entry__._golden_oracle_sqls); recall vs the exact
    baseline tested in tests/test_functions.py."""
    from .functions.ann import pq_topk
    q, qids = _load_queries(sf_dir)
    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return pq_topk(ds, q, qids, ANN_K)


def kmeans_clusters(sf_dir: str):
    """Embedding k-means cluster assignment (data-curation clustering):
    quantizer trained once on the deterministic bottom-k-hash sample,
    broadcast, every vector assigned in one vectorized pass — no shuffle.
    Oracle: golden VALUES from a naive per-vector evaluator over the same
    pinned centroids (__ray_entry__._golden_oracle_sqls — the IVF golden's
    inverted-list assignment, exposed as a first-class operator)."""
    from .functions.ann import kmeans_assign
    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return kmeans_assign(ds)


def ann_lsh_topk(sf_dir: str):
    """LSH-bucketed approximate top-k (scale path). Oracle: golden VALUES
    from a naive per-vector evaluator over the same pinned hyperplanes;
    recall vs the exact baseline also measured in tests."""
    from .functions.ann import lsh_topk
    q, qids = _load_queries(sf_dir)
    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return lsh_topk(ds, q, qids, ANN_K, dim=q.shape[1])


COSINE_NEARDUP_THRESHOLD = 0.5


def embedding_neardup_pairs(sf_dir: str):
    """Embedding-cosine near-duplicate pairs over a threshold (exact
    distributed block-pair sweep with a bounded in-flight submission
    window; see functions/ann.py). Returns the Dataset — at 100 TB the
    qualifying pair set can be enormous and must stream to its sink, never
    through the driver."""
    from .functions.ann import _EMPTY_VPAIRS, cosine_neardup_pairs
    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    pairs = cosine_neardup_pairs(ds, COSINE_NEARDUP_THRESHOLD)
    # Dataset.to_pandas() on a ZERO-row dataset drops the column names,
    # which would fail the driver's schema check — only that degenerate
    # case returns a typed empty frame (count() is metadata-cheap here:
    # the sweep's output refs are already materialized)
    if pairs.count() == 0:
        return _EMPTY_VPAIRS.empty_table().to_pandas()
    return pairs


LSH_NDP_THRESHOLD = 0.9
MIRROR_OFFSET = 1_000_000


def embedding_neardup_lsh(sf_dir: str):
    """High-threshold embedding near-dup via banded LSH + exact verify —
    the scale path (functions/ann.cosine_neardup_lsh): candidate cost tracks
    true near-dup density instead of the exact sweep's O(n^2) block grid.
    Run over a MIRRORED corpus (each vector unioned once more under
    vec_id + 1e6 — the exact-duplicate-embedding scenario a dedup pass
    exists for, and one where identical signatures make LSH recall
    structurally 1, so the pair set is oracle-exact by construction; the
    probabilistic-recall regime is exercised against the exact sweep in
    tests/test_functions.py)."""
    from .functions.ann import _EMPTY_VPAIRS, cosine_neardup_lsh

    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    def mirror(t: pa.Table) -> pa.Table:
        # one pass emits original + shifted copy — a Dataset.union here
        # fragments the input into tiny blocks that multiply wave overhead
        v = t["vec_id"].to_numpy(zero_copy_only=False) + MIRROR_OFFSET
        shifted = t.set_column(t.schema.get_field_index("vec_id"), "vec_id",
                               pa.array(v, pa.int64()))
        return pa.concat_tables([t, shifted])

    mirrored = ds.map_batches(mirror, batch_format="pyarrow")
    import pyarrow.parquet as pq
    pf = pq.ParquetFile(f"{sf_dir}/embeddings.parquet")
    n = pf.metadata.num_rows * 2
    # dim from one row-group read of one row — never a Dataset execution
    d = len(next(pf.iter_batches(batch_size=1, columns=["embedding"]))
            .column("embedding")[0])
    pairs = cosine_neardup_lsh(mirrored, LSH_NDP_THRESHOLD, dim=d, n_rows=n)
    if pairs.count() == 0:
        return _EMPTY_VPAIRS.empty_table().to_pandas()
    return pairs


CLEAN_MIN_WORDS = 5
CLEAN_MIN_STOPWORDS = 3
TOKEN_BUDGET_PER_LANG = 20_000


def clean_corpus(sf_dir: str):
    """The composed training-data cleaning pipeline (CCNet/RefinedWeb
    shape): quality gate -> exact dedup -> near-dup canonicalization, each
    stage the shuffle-true operator shipped elsewhere in this catalog, all
    verified end-to-end against one SQL oracle.

    1. gate: >= 5 words and >= 3 EN stopword markers;
    2. exact dedup: lowest doc_id per identical text (content-hash buckets);
    3. near-dup: LSH-verified 3-gram-shingle Jaccard >= 0.95 clusters (the
       order-sensitive web-dedup granularity — word SETS over this synth
       corpus's tiny vocabulary degenerate to one all-pairs blob); only the
       canonical doc (cluster_id == doc_id, i.e. min id) survives.
    Output: (doc_id, n_words) of the clean corpus.
    """
    from .functions.dedup import exact_dedup, neardup_components
    from .functions.text import _marker_counts, n_words as _nw

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def gate(t: pa.Table) -> pa.Table:
        nw = _nw(t["text"]).to_numpy(zero_copy_only=False)
        stops = _marker_counts(t["text"])
        keep = (nw >= CLEAN_MIN_WORDS) & (stops >= CLEAN_MIN_STOPWORDS)
        out = t.append_column("n_words", pa.array(nw, pa.int64()))
        return out.filter(pa.array(keep))

    from .functions.dedup import _doc_bucket

    gated = ds.map_batches(gate, batch_format="pyarrow", batch_size=4096)
    winners = exact_dedup(gated, keep_cols=["text", "n_words"]).materialize()
    clusters = neardup_components(
        winners.select_columns(["doc_id", "text"]),
        JACCARD_THRESHOLD, shingle=3)
    # drop non-canonical near-dups via a bucketed hash ANTI-join (winners
    # |><| noncanon ids co-located by doc_id hash) — int-only shuffle on the
    # noncanon side, (doc_id, n_words) ints on the winners side, nothing
    # driver-resident even at extreme duplication rates
    nb = _row_sized_buckets(sf_dir, "documents")
    aschema = pa.schema([("abucket", pa.int64()), ("side", pa.int8()),
                         ("doc_id", pa.int64()), ("n_words", pa.int64())])

    def tag_winners(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        return pa.Table.from_arrays([
            pa.array(_doc_bucket(ids, nb)),
            pa.array(np.zeros(len(ids), np.int8)),
            t["doc_id"], t["n_words"].cast(pa.int64()),
        ], schema=aschema)

    def tag_noncanon(t: pa.Table) -> pa.Table:
        t = t.filter(pc.not_equal(t["doc_id"], t["cluster_id"]))
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        return pa.Table.from_arrays([
            pa.array(_doc_bucket(ids, nb)),
            pa.array(np.ones(len(ids), np.int8)),
            t["doc_id"], pa.nulls(len(ids), pa.int64()),
        ], schema=aschema)

    def anti(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        bad = df[df["side"] == 1]["doc_id"].to_numpy()
        keep = df[df["side"] == 0]
        keep = keep[~keep["doc_id"].isin(bad)]
        return pa.table({
            "doc_id": pa.array(keep["doc_id"].to_numpy().astype(np.int64)),
            "n_words": pa.array(keep["n_words"].to_numpy().astype(np.int64)),
        })

    from .stages.waves import wave_group_reduce

    both = (winners.select_columns(["doc_id", "n_words"])
            .map_batches(tag_winners, batch_format="pyarrow")
            .union(clusters.map_batches(tag_noncanon, batch_format="pyarrow")))
    return wave_group_reduce(both, "abucket", nb, anti)


def sample_by_token_budget(sf_dir: str):
    """Token-budget corpus sampling: per language, take the longest docs
    (deterministic tiebreak on doc_id) until the cumulative token count
    exceeds the budget. Languages are a bounded key set, so this is a
    per-lang grouped vectorized cumsum — one keyed shuffle, no driver
    funnel."""
    from .functions.text import n_words as _nw

    ds = _read(sf_dir, "documents", columns=["doc_id", "lang", "text"])

    def add_nw(t: pa.Table) -> pa.Table:
        return pa.table({"doc_id": t["doc_id"], "lang": t["lang"],
                         "n_words": _nw(t["text"]).cast(pa.int64())})

    def budgeted(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["n_words", "doc_id"], ascending=[False, True],
                          kind="stable")
        keep = g["n_words"].cumsum() <= TOKEN_BUDGET_PER_LANG
        return g[keep][["doc_id", "lang", "n_words"]]

    return (ds.map_batches(add_nw, batch_format="pyarrow", batch_size=4096)
            .groupby("lang").map_groups(budgeted, batch_format="pandas"))


def train_val_split(sf_dir: str):
    """Deterministic content-hash train/val split (the training-data split
    must be a pure function of the record, never of row order): bucket =
    first 8 hex digits of md5(text) mod 20; bucket 0 -> val."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def split(t: pa.Table) -> pa.Table:
        from .functions.text import md5_prefix_mod
        h = md5_prefix_mod(t["text"], 20)
        lab = np.where(h == 0, "val", "train")
        return pa.table({"doc_id": t["doc_id"],
                         "split": pa.array(lab, pa.string())})

    return ds.map_batches(split, batch_format="pyarrow", batch_size=4096)


def deterministic_shuffle(sf_dir: str):
    """Global deterministic shuffle for training-data ordering: every doc
    gets a pseudorandom but reproducible rank = position in md5-key order.
    Exercises the distributed sort (range-partitioned shuffle); the rank is
    assigned per sorted block from the block's global offset, so no stage
    sees more than its block."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def key(t: pa.Table) -> pa.Table:
        from .functions.text import md5_hex_rows
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        k = md5_hex_rows(t["text"], id_prefix=ids)
        return pa.table({"doc_id": t["doc_id"], "shuffle_key": pa.array(k)})

    keyed = ds.map_batches(key, batch_format="pyarrow", batch_size=4096)
    sorted_ds = keyed.sort("shuffle_key").materialize()

    # zipWithIndex over the sorted, range-partitioned blocks: collect each
    # block's (first_key, count) — O(#blocks) driver metadata, never rows —
    # cumsum into per-block offsets, broadcast, and stamp ranks per block.
    bounds = sorted_ds.map_batches(
        lambda b: pa.table({"first_key": [b["shuffle_key"][0].as_py()],
                            "n": pa.array([b.num_rows], pa.int64())}),
        batch_format="pyarrow", batch_size=None).to_pandas()
    bounds = bounds.sort_values("first_key").reset_index(drop=True)
    offsets = np.concatenate([[0], bounds["n"].to_numpy().cumsum()[:-1]])
    bref = ray.put((bounds["first_key"].to_numpy(), offsets))

    def stamp(b: pa.Table) -> pa.Table:
        firsts, offs = ray.get(bref)
        start = offs[np.searchsorted(firsts, b["shuffle_key"][0].as_py())]
        return pa.table({
            "doc_id": b["doc_id"],
            "rank": pa.array(np.arange(start, start + b.num_rows), pa.int64()),
        })

    return sorted_ds.map_batches(stamp, batch_format="pyarrow",
                                 batch_size=None)


def events_hopping_window(sf_dir: str):
    """Hopping (sliding) event-time window: 60-minute windows every 30
    minutes — each event contributes to exactly two windows, materialized by
    a per-block flat-map into (window_start, user) partials, then the keyed
    tree-agg final."""
    ds = _read(sf_dir, "events", columns=["user_id", "ts", "value"])
    HOP_US = 30 * 60 * 1_000_000  # window length = 2 hops

    def explode(t: pa.Table) -> pa.Table:
        ts = t["ts"].to_numpy(zero_copy_only=False).view(np.int64)
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        val = t["value"].to_numpy(zero_copy_only=False)
        # each event lands in the two windows starting at the last two
        # 30-min boundaries at-or-before ts (60-min span covers both)
        outs = [pa.table({
            "user_id": pa.array(uid),
            "window_start": pa.array(((ts // HOP_US) - k) * HOP_US,
                                     pa.int64()),
            "value": pa.array(val),
        }) for k in (0, 1)]
        x = pa.concat_tables(outs)
        df = x.to_pandas().groupby(["user_id", "window_start"],
                                   sort=False).agg(
            n=("value", "size"), sum_value=("value", "sum")).reset_index()
        return _pa_from_pandas(df, preserve_index=False)

    def final(t: pa.Table) -> pa.Table:
        g = t.to_pandas().groupby(["user_id", "window_start"],
                                  sort=False).agg(
            n=("n", "sum"), sum_value=("sum_value", "sum")).reset_index()
        out = _pa_from_pandas(g, preserve_index=False)
        ws = pa.array(out["window_start"].to_numpy(zero_copy_only=False)
                      .astype("datetime64[us]"))
        out = out.set_column(out.schema.get_field_index("window_start"),
                             "window_start", ws)
        return out.set_column(out.schema.get_field_index("sum_value"),
                              "sum_value", _round2(out["sum_value"]))

    return _tree_agg(ds, explode, final, bucket_on="user_id")


def simhash_neardup_pairs(sf_dir: str):
    """SimHash near-duplicate PAIRS (the Manku/Jain/Sarma web-dedup shape):
    word-MULTISET collapse (SimHash is order-independent: equal multisets =>
    identical signatures, so only one representative per multiset enters
    the bands — the same mega-duplicate guard the MinHash pipeline has) ->
    64-bit SimHash -> 4x16-bit bands (pigeonhole: Hamming <= 3 implies at
    least one equal band) -> equal-band groups generate candidates with the
    exact Hamming distance computed in-group (each band row carries the full
    64-bit signature — one int, so no join back to the docs is ever needed)
    -> cross-band dedup by packed-int unique -> rep pairs re-expanded to
    member pairs (hamming unchanged cross-group, 0 within). Oracle: golden
    VALUES from a naive all-pairs evaluator over the independently computed
    simhash values."""
    import pyarrow.parquet as pq
    from .functions.ann import _popcount64
    from .functions.dedup import (_all_run_pairs, _collapse_waves,
                                  _doc_bucket, _pair_bucket,
                                  expand_rep_pairs, sized_n_buckets)
    from .functions.text import (SIMHASH_MAX_HAMMING, simhash_band_rows)
    from .stages.waves import wave_group_reduce

    n_docs = pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata.num_rows
    nb = sized_n_buckets(n_docs, rows_per_bucket=20_000)
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def add_gbucket(t: pa.Table) -> pa.Table:
        gk = (t["band"].to_numpy(zero_copy_only=False) * 65536
              + t["key"].to_numpy(zero_copy_only=False))
        return t.append_column("_gb", pa.array(_doc_bucket(gk, nb)))

    def pairs_in_groups(t: pa.Table) -> pa.Table:
        band = t["band"].to_numpy(zero_copy_only=False)
        key = t["key"].to_numpy(zero_copy_only=False)
        doc = t["doc_id"].to_numpy(zero_copy_only=False)
        sim = t["simhash"].to_numpy(zero_copy_only=False)
        order = np.lexsort((doc, key, band))
        band, key, doc, sim = band[order], key[order], doc[order], sim[order]
        new_run = np.ones(len(doc), dtype=bool)
        new_run[1:] = (band[1:] != band[:-1]) | (key[1:] != key[:-1])
        starts = np.flatnonzero(new_run)
        lens = np.diff(np.append(starts, len(doc)))
        # one vectorized pass over all runs (bounded temporaries); runs
        # contain only DISTINCT word multisets thanks to the collapse
        # upstream
        ia, ib = _all_run_pairs(starts, lens, len(doc))
        if not len(ia):
            return pa.table({"doc_a": pa.array([], pa.int64()),
                             "doc_b": pa.array([], pa.int64()),
                             "hamming": pa.array([], pa.int64()),
                             "pbucket": pa.array([], pa.int64())})
        ham = _popcount64(sim[ia].view(np.uint64) ^ sim[ib].view(np.uint64))
        keep = ham <= SIMHASH_MAX_HAMMING
        a, b, ham = doc[ia[keep]], doc[ib[keep]], ham[keep]
        return pa.table({"doc_a": pa.array(a), "doc_b": pa.array(b),
                         "hamming": pa.array(ham, pa.int64()),
                         "pbucket": pa.array(_pair_bucket(a, b, nb))})

    def dedup(t: pa.Table) -> pa.Table:
        a = t["doc_a"].to_numpy(zero_copy_only=False)
        b = t["doc_b"].to_numpy(zero_copy_only=False)
        ham = t["hamming"].to_numpy(zero_copy_only=False)
        if len(a) == 0:
            return t
        # same range guard as dedup._unique_pairs: the (a<<31)|b pack is
        # only collision-free for non-negative ids below 2^31
        if (0 <= a.min() and 0 <= b.min()
                and max(int(a.max()), int(b.max())) < (1 << 31)):
            packed = (a.astype(np.int64) << np.int64(31)) | b.astype(np.int64)
            _u, idx = np.unique(packed, return_index=True)
        else:
            idx = (pd.DataFrame({"a": a, "b": b})
                   .drop_duplicates().index.to_numpy())
        return pa.table({"doc_a": pa.array(a[idx]),
                         "doc_b": pa.array(b[idx]),
                         "hamming": pa.array(ham[idx], pa.int64())})

    mat = ds.materialize()
    reps_refs, membership_refs = _collapse_waves(mat.to_arrow_refs(), nb,
                                                 "multiset")
    reps = ray.data.from_arrow_refs(reps_refs)
    rows = reps.map_batches(simhash_band_rows, batch_format="pyarrow",
                            batch_size=4096)
    cands = wave_group_reduce(rows.map_batches(add_gbucket,
                                               batch_format="pyarrow"),
                              "_gb", nb, pairs_in_groups)
    rep_pairs = wave_group_reduce(cands, "pbucket", nb, dedup)
    return ray.data.from_arrow_refs(
        expand_rep_pairs(rep_pairs.to_arrow_refs(), membership_refs, nb,
                         value_col="hamming", intra_value=0,
                         value_type=pa.int64()))


TOP_NGRAMS_K = 20
STRAT_RATE = {"en": 30}  # percent kept per lang; default below
STRAT_DEFAULT_RATE = 60


def top_ngrams(sf_dir: str):
    """Corpus-level top-K word bigrams by count (vocabulary/n-gram stats —
    a standard LLM-data profiling pass). Exact over UNBOUNDED key
    cardinality: per-block bigram counts (block-local string assembly, the
    shingling pattern) -> keyed bucket totals (a bigram never spans
    buckets, so per-bucket top-K is complete for its keys) -> one bounded
    final over nb x K candidate rows. Deterministic tiebreak on the ngram."""
    from .functions.dedup import default_n_buckets
    from .stages.partition import hash_strings

    ds = _read(sf_dir, "documents", columns=["text"])
    nb = default_n_buckets()

    def partial(t: pa.Table) -> pa.Table:
        grams: list[str] = []
        for tx in t["text"].to_pylist():
            ws = tx.split(" ")
            grams.extend(f"{a} {b}" for a, b in zip(ws, ws[1:]))
        c = pd.Series(grams, dtype="object").value_counts()
        out = pa.table({"ngram": pa.array(c.index.to_numpy(), pa.string()),
                        "n": pa.array(c.to_numpy(), pa.int64())})
        bucket = (hash_strings(out["ngram"]) % np.uint64(nb)).astype(np.int64)
        return out.append_column("_bucket", pa.array(bucket))

    def bucket_topk(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("ngram", sort=False)["n"].sum().reset_index()
        g = g.sort_values(["n", "ngram"], ascending=[False, True],
                          kind="stable").head(TOP_NGRAMS_K)
        return g[["ngram", "n"]]

    def final(t: pa.Table) -> pa.Table:
        df = t.to_pandas().sort_values(["n", "ngram"],
                                       ascending=[False, True],
                                       kind="stable").head(TOP_NGRAMS_K)
        return _pa_from_pandas(df, preserve_index=False)

    from .stages.waves import wave_group_reduce

    def bucket_topk_tbl(t: pa.Table) -> pa.Table:
        return _pa_from_pandas(bucket_topk(t.to_pandas()),
                                    preserve_index=False)

    partials = ds.map_batches(partial, batch_format="pyarrow",
                              batch_size=4096)
    per_bucket = wave_group_reduce(partials, "_bucket", nb, bucket_topk_tbl)
    # bounded final: nb x K rows
    return per_bucket.repartition(1).map_batches(final,
                                                 batch_format="pyarrow",
                                                 batch_size=None)


def stratified_sample(sf_dir: str):
    """Deterministic per-language stratified sampling: keep a doc iff
    md5(text) mod 100 falls under its language's rate — a pure function of
    the record (training-data sampling must never depend on row order or
    partitioning), with per-stratum rates."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "lang", "text"])

    def sample(t: pa.Table) -> pa.Table:
        from .functions.text import md5_prefix_mod
        h = md5_prefix_mod(t["text"], 100)
        langs = t["lang"].to_pylist()
        rate = np.fromiter(
            (STRAT_RATE.get(lg, STRAT_DEFAULT_RATE) for lg in langs),
            dtype=np.int64, count=t.num_rows)
        return t.select(["doc_id", "lang"]).filter(pa.array(h < rate))

    return ds.map_batches(sample, batch_format="pyarrow", batch_size=4096)


def multimodal_frame_pipeline(sf_dir: str):
    """The full multimodal actor-pool chain over opaque binary payloads:
    distributed media construction -> image resize (non-images pass
    through) -> per-frame sampling flat-map (1 audio row -> k frame rows).
    Kernels stubbed, plumbing real (functions/multimodal.py). Oracle:
    golden VALUES from a naive sha256 evaluator of the same deterministic
    stub kernels."""
    from .functions.multimodal import (media_batch_from_docs, resize_images,
                                       sample_frames)
    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    media = docs.map_batches(media_batch_from_docs, batch_format="pyarrow",
                             batch_size=1024)
    return sample_frames(resize_images(media))


def paged_source_demo(sf_dir: str):
    """S7: token-paginated source drained into a Dataset — pages the
    customer table 500 rows at a time through the pagination protocol
    (rows-only check; the page walk is driver-side by nature)."""
    import pyarrow.parquet as pq
    from .sources.paged import read_paged

    full = pq.read_table(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_name"])

    def page_fn(token):
        off = int(token) if token else 0
        page = full.slice(off, 500)
        nxt = str(off + 500) if off + 500 < full.num_rows else None
        return page, nxt

    return read_paged(page_fn)


def multimodal_features(sf_dir: str):
    """Multimodal plumbing demo: opaque binary payloads -> actor-pool
    decode/feature stage (decode kernel stubbed; see functions/multimodal.py).
    The media table is built DISTRIBUTED (map_batches over the documents
    Dataset), never on the driver. Oracle: golden VALUES from a naive
    evaluator of the same deterministic fake-media construction."""
    from .functions.multimodal import extract_features, media_batch_from_docs
    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    media = docs.map_batches(media_batch_from_docs, batch_format="pyarrow",
                             batch_size=1024)
    out = extract_features(media)
    return out.drop_columns(["feature"])  # list col dropped for the check


def multimodal_real_decode(sf_dir: str):
    """REAL-codec multimodal chain: documents -> real PNG/WAV payloads
    (built distributed) -> real nearest-neighbor image resize (PNG decode +
    re-encode, functions/codecs.py) -> feature extraction whose values are
    the actually-decoded pixels/PCM samples. feat_sum checks the decoded
    CONTENT, n_bytes the re-encoded payload — both value-hashed against a
    naive single-threaded evaluator of the same stdlib codecs. No stub on
    this path."""
    from .functions.multimodal import (extract_features,
                                       real_media_batch_from_docs,
                                       resize_images)
    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    media = docs.map_batches(real_media_batch_from_docs,
                             batch_format="pyarrow", batch_size=1024)
    feats = extract_features(resize_images(media, width=4, height=4))

    def fold(t: pa.Table) -> pa.Table:
        f = t["feature"].combine_chunks()
        flat = f.flatten().to_numpy(zero_copy_only=False)
        sums = flat.reshape(len(t), -1).sum(axis=1)
        return t.drop_columns(["feature"]).append_column(
            "feat_sum", pa.array(sums, pa.float64()))

    return feats.map_batches(fold, batch_format="pyarrow", batch_size=4096)


# --------------------------------------------------------------------------
# round-4 analytic widening: grouping sets, ordered string agg, rank-family
# windows, gap fill, extract-all explode, fuzzy (edit-distance) self-join


def cube_revenue(sf_dir: str):
    """GROUP BY CUBE (all 4 grouping sets of flag x status): revenue cents
    + row counts. Same single-scan shape as ``rollup_revenue`` — the finest
    (flag, status) partials are computed once per block; the bounded final
    derives (flag), (status) and () by re-aggregating the partials, so the
    extra grouping sets cost zero extra scans or shuffles."""
    ds = _read(sf_dir, "lineitem",
               columns=["l_returnflag", "l_linestatus", "l_extendedprice"])

    def partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        df["cents"] = np.floor(
            df.pop("l_extendedprice").to_numpy() * 100.0).astype(np.int64)
        g = df.groupby(["l_returnflag", "l_linestatus"], sort=False).agg(
            cents=("cents", "sum"), n=("cents", "size")).reset_index()
        return _pa_from_pandas(g, preserve_index=False)

    def final(t: pa.Table) -> pa.Table:
        fine = t.to_pandas().groupby(
            ["l_returnflag", "l_linestatus"], sort=False).sum().reset_index()
        levels = [fine]
        for keep, drop in (("l_returnflag", "l_linestatus"),
                           ("l_linestatus", "l_returnflag")):
            lv = fine.groupby(keep, sort=False)[["cents", "n"]] \
                .sum().reset_index()
            lv[drop] = None
            levels.append(lv)
        levels.append(pd.DataFrame(
            {"l_returnflag": [None], "l_linestatus": [None],
             "cents": [fine["cents"].sum()], "n": [fine["n"].sum()]}))
        out = pd.concat(levels, ignore_index=True)
        out["cents"] = out["cents"].astype("int64")
        out["n"] = out["n"].astype("int64")
        return _pa_from_pandas(
            out[["l_returnflag", "l_linestatus", "cents", "n"]],
            preserve_index=False)

    return _tree_agg(ds, partial, final)


def string_agg_order_lines(sf_dir: str):
    """Ordered string aggregation: per order, the comma-joined line numbers
    in line order (the reference's concatenated-id audit columns). Order
    matters, so this is NOT a semilattice — full rows hash once into
    data-sized buckets (keys never span buckets) and each bucket sorts once,
    then joins per group. The join is per-GROUP (bounded by lines-per-order,
    <= 7), never per-row Python over the table."""
    from .functions.joins import _int_bucket
    from .stages.waves import wave_group_reduce

    ds = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_linenumber"])
    nb = _row_sized_buckets(sf_dir, "lineitem")

    def add_bucket(t: pa.Table) -> pa.Table:
        b = _int_bucket(t["l_orderkey"].to_numpy(zero_copy_only=False), nb)
        return t.append_column("_bucket", pa.array(b))

    def agg_bucket(t: pa.Table) -> pa.Table:
        df = t.to_pandas().sort_values(["l_orderkey", "l_linenumber"],
                                       kind="stable")
        df["s"] = df["l_linenumber"].astype(str)
        g = df.groupby("l_orderkey", sort=False).agg(
            lines=("s", ",".join), n_lines=("s", "size")).reset_index()
        g["n_lines"] = g["n_lines"].astype("int64")
        return _pa_from_pandas(g, preserve_index=False)

    return wave_group_reduce(
        ds.map_batches(add_bucket, batch_format="pyarrow"),
        "_bucket", nb, agg_bucket)


NTILE_K = 4


def window_rank_functions(sf_dir: str):
    """Rank-family window functions per key: RANK / DENSE_RANK on value
    descending, NTILE(4) and LEAD(value) over the fully deterministic
    (value DESC, event_id) order — the per-row analytic family beyond
    ``window_running_agg``'s running aggregates. One keyed exchange into
    data-sized buckets, then one vectorized sort + grouped rank/shift pass
    per bucket (no per-row Python)."""
    from .functions.joins import _int_bucket
    from .stages.waves import wave_group_reduce

    ds = _read(sf_dir, "events", columns=["event_id", "user_id", "value"])
    nb = _row_sized_buckets(sf_dir, "events")

    def add_bucket(t: pa.Table) -> pa.Table:
        b = _int_bucket(t["user_id"].to_numpy(zero_copy_only=False), nb)
        return t.append_column("_bucket", pa.array(b))

    def ranks_bucket(t: pa.Table) -> pa.Table:
        g = t.to_pandas().sort_values(
            ["user_id", "value", "event_id"],
            ascending=[True, False, True], kind="stable")
        grp = g.groupby("user_id", sort=False)
        g["rk"] = grp["value"].rank(method="min",
                                    ascending=False).astype("int64")
        g["drk"] = grp["value"].rank(method="dense",
                                     ascending=False).astype("int64")
        # NTILE(K): first (n % K) tiles get ceil(n/K) rows (SQL semantics)
        pos = grp.cumcount().to_numpy()
        n = grp["value"].transform("size").to_numpy()
        k, r = n // NTILE_K, n % NTILE_K
        big = r * (k + 1)
        in_big = pos < big
        g["nt"] = np.where(
            in_big, pos // np.maximum(k + 1, 1),
            r + (pos - big) // np.maximum(k, 1)).astype("int64") + 1
        g["lead_value"] = grp["value"].shift(-1)
        return _pa_from_pandas(
            g[["event_id", "user_id", "rk", "drk", "nt", "lead_value"]],
            preserve_index=False)

    return wave_group_reduce(
        ds.map_batches(add_bucket, batch_format="pyarrow"),
        "_bucket", nb, ranks_bucket)


def gapfill_daily_counts(sf_dir: str):
    """Time-series gap fill: daily event counts per event_type with
    zero-filled missing (type, day) cells over the table's full date span.
    Partials count per (type, day) per block (bounded: types x days); the
    single bounded final owns the grid densification — the generate_series
    never touches the distributed scan."""
    ds = _read(sf_dir, "events", columns=["event_type", "ts"])

    def partial(t: pa.Table) -> pa.Table:
        day = pc.strftime(t["ts"], "%Y-%m-%d")
        df = pa.table({"event_type": t["event_type"],
                       "day": day}).to_pandas()
        g = df.groupby(["event_type", "day"], sort=False).size() \
            .rename("n").reset_index()
        return _pa_from_pandas(g, preserve_index=False)

    def final(t: pa.Table) -> pa.Table:
        df = t.to_pandas().groupby(["event_type", "day"], sort=False) \
            .sum().reset_index()
        days = pd.date_range(df["day"].min(), df["day"].max(), freq="D") \
            .strftime("%Y-%m-%d")
        grid = pd.MultiIndex.from_product(
            [sorted(df["event_type"].unique()), days],
            names=["event_type", "day"])
        out = df.set_index(["event_type", "day"]).reindex(grid, fill_value=0) \
            .reset_index()
        out["n"] = out["n"].astype("int64")
        return _pa_from_pandas(out, preserve_index=False)

    return _tree_agg(ds, partial, final)


EXTRACT_MIN_LEN = 8


def regexp_extract_all_tokens(sf_dir: str):
    """Regex extract-ALL with ordinality (1 row -> k match rows): every
    maximal lowercase run of >= 8 chars in each document, with its index
    among the document's matches. Pure Arrow kernels — split_pattern_regex
    + list_parent_indices + a cumcount re-derived after the length filter;
    no per-row Python, rows expand inside the batch (flat-map shape)."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def explode(t: pa.Table) -> pa.Table:
        runs = pc.split_pattern_regex(t["text"], "[^a-z]+")
        parent = pc.list_parent_indices(runs)
        flat = pc.list_flatten(runs)
        keep = pc.greater_equal(pc.utf8_length(flat), EXTRACT_MIN_LEN)
        tok = flat.filter(keep)
        par = parent.filter(keep).to_numpy(zero_copy_only=False)
        # index among the KEPT matches of each parent (parents nondecreasing)
        if len(par):
            new = np.r_[True, par[1:] != par[:-1]]
            starts = np.flatnonzero(new)
            idx = np.arange(len(par)) - np.repeat(
                starts, np.diff(np.r_[starts, len(par)]))
        else:
            idx = np.empty(0, np.int64)
        doc_ids = t["doc_id"].to_numpy(zero_copy_only=False)[par]
        return pa.table({"doc_id": pa.array(doc_ids, pa.int64()),
                         "match_idx": pa.array(idx, pa.int64()),
                         "token": tok})

    return ds.map_batches(explode, batch_format="pyarrow", batch_size=8192)


def fuzzy_pairs_edit1(sf_dir: str):
    """Fuzzy self-join: all customer pairs whose names are within
    Levenshtein distance 1 — symmetric-delete neighborhood keys, one keyed
    exchange, vectorized exact verify inside each key run (see
    functions/fuzzy.py for the exactly-once argument). The SQL oracle is
    the O(n^2) cross-join levenshtein; the engine's cost is the
    neighborhood exchange + per-run candidate verify."""
    from .functions.fuzzy import edit1_pairs
    ds = _read(sf_dir, "customer", columns=["c_custkey", "c_name"])
    return edit1_pairs(ds, "c_custkey", "c_name",
                       n_buckets=_row_sized_buckets(sf_dir, "customer"))


def set_ops_keys(sf_dir: str):
    """Set operations (INTERSECT / EXCEPT, set semantics) over two large
    key sets, as one operator: each key tagged 'both' / 'left_only' /
    'right_only'. Per-block distinct collapses each side before the wire;
    one int-only keyed exchange; per-bucket OR of side bits decides
    membership — dedup is global because a key never spans buckets."""
    from .functions.joins import _int_bucket
    from .stages.waves import wave_group_reduce

    e = _read(sf_dir, "events", columns=["user_id"])
    c = _read(sf_dir, "customer", columns=["c_custkey"])
    nb = _agg_buckets()

    def part(col: str, bit: int):
        def f(t: pa.Table) -> pa.Table:
            k = pc.unique(t[col])
            return pa.table({
                "k": pc.cast(k, pa.int64()),
                "bits": pa.array(np.full(len(k), bit, np.int8)),
                "_bucket": pa.array(_int_bucket(
                    k.to_numpy(zero_copy_only=False), nb)),
            })
        return f

    both = (e.map_batches(part("user_id", 1), batch_format="pyarrow")
            .union(c.map_batches(part("c_custkey", 2),
                                 batch_format="pyarrow")))

    def reduce(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"k": pa.array([], pa.int64()),
                             "membership": pa.array([], pa.string())})
        df = t.to_pandas().drop_duplicates(["k", "bits"])
        # bits are {1, 2}: after the dedup, sum == bitwise OR (vectorized)
        g = df.groupby("k", sort=False)["bits"].sum()
        names = np.array(["", "left_only", "right_only", "both"])
        return pa.table({
            "k": pa.array(g.index.to_numpy(), pa.int64()),
            "membership": pa.array(names[g.to_numpy()], pa.string())})

    return wave_group_reduce(both, "_bucket", nb, reduce)


def redact_numbers(sf_dir: str):
    """Regexp-replace scalar transform (the data-cleaning redaction shape):
    every digit run of >= 2 chars in the event envelope masked. One Arrow
    kernel per batch, zero-copy in."""
    ds = _read(sf_dir, "events", columns=["event_id", "props"])

    def redact(t: pa.Table) -> pa.Table:
        return pa.table({
            "event_id": t["event_id"],
            "props_redacted": pc.replace_substring_regex(
                t["props"], "[0-9]{2,}", "#")})

    return ds.map_batches(redact, batch_format="pyarrow", batch_size=65536)


def type_token_ratio(sf_dir: str):
    """Lexical-diversity corpus stat: words and distinct words per document
    (type/token counts). Doc-local, so entirely block-local: Arrow split +
    one pandas nunique over (parent, word) per batch — no exchange at all."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def ttr(t: pa.Table) -> pa.Table:
        words = pc.split_pattern(t["text"], " ")
        n_words = pc.cast(pc.list_value_length(words), pa.int64())
        par = pc.list_parent_indices(words).to_numpy(zero_copy_only=False)
        flat = pc.list_flatten(words)
        df = pd.DataFrame({"p": par, "w": flat.to_pandas()})
        # split always yields >= 1 element, so every doc has a parent row
        nun = df.groupby("p", sort=False)["w"].nunique().to_numpy()
        return pa.table({"doc_id": t["doc_id"], "n_words": n_words,
                         "n_distinct": pa.array(nun, pa.int64())})

    return ds.map_batches(ttr, batch_format="pyarrow", batch_size=8192)


def funnel_signup_purchase(sf_dir: str):
    """Ordered event-pattern match (funnel): per user, the first 'signup'
    and the first 'purchase' strictly AFTER it, with the conversion gap —
    the MATCH_RECOGNIZE-lite shape. The scan ships only (user_id, type, ts)
    for the two event types (row filter pushed to parquet); one keyed
    exchange; per bucket a vectorized min/merge/min chain (no per-row or
    per-group Python)."""
    from .functions.joins import _int_bucket
    from .stages.waves import wave_group_reduce

    ds = _read(sf_dir, "events", columns=["user_id", "event_type", "ts"],
               filter=pc.field("event_type").isin(["signup", "purchase"]))
    nb = _agg_buckets()

    def add_bucket(t: pa.Table) -> pa.Table:
        b = _int_bucket(t["user_id"].to_numpy(zero_copy_only=False), nb)
        return t.append_column("_bucket", pa.array(b))

    def funnel(t: pa.Table) -> pa.Table:
        out_empty = pa.table({
            "user_id": pa.array([], pa.int64()),
            "signup_ts": pa.array([], pa.timestamp("us")),
            "purchase_ts": pa.array([], pa.timestamp("us")),
            "gap_us": pa.array([], pa.int64())})
        if t.num_rows == 0:
            return out_empty
        df = t.to_pandas()
        s = df[df["event_type"] == "signup"] \
            .groupby("user_id", sort=False)["ts"].min().rename("signup_ts")
        p = df[df["event_type"] == "purchase"].merge(
            s, left_on="user_id", right_index=True)
        p = p[p["ts"] > p["signup_ts"]]
        if not len(p):
            return out_empty
        first = p.sort_values("ts", kind="stable") \
            .groupby("user_id", sort=False).head(1)
        gap = (first["ts"].astype("datetime64[us]").astype("int64")
               - first["signup_ts"].astype("datetime64[us]").astype("int64"))
        return pa.table({
            "user_id": pa.array(first["user_id"].to_numpy(), pa.int64()),
            "signup_ts": pa.array(first["signup_ts"]
                                  .astype("datetime64[us]")),
            "purchase_ts": pa.array(first["ts"].astype("datetime64[us]")),
            "gap_us": pa.array(gap.to_numpy(), pa.int64())})

    return wave_group_reduce(
        ds.map_batches(add_bucket, batch_format="pyarrow"),
        "_bucket", nb, funnel)


def window_distribution_functions(sf_dir: str):
    """Distribution window functions per key: PERCENT_RANK and CUME_DIST
    over value within each user. Each is ONE double division from exact
    integer ranks — (rank_min-1)/(n-1) and rank_max/n, the SQL definitions
    — so results are bit-equal to the oracle. Same bucketed one-pass shape
    as the other window families."""
    from .functions.joins import _int_bucket
    from .stages.waves import wave_group_reduce

    ds = _read(sf_dir, "events", columns=["event_id", "user_id", "value"])
    nb = _row_sized_buckets(sf_dir, "events")

    def add_bucket(t: pa.Table) -> pa.Table:
        b = _int_bucket(t["user_id"].to_numpy(zero_copy_only=False), nb)
        return t.append_column("_bucket", pa.array(b))

    def dist_bucket(t: pa.Table) -> pa.Table:
        g = t.to_pandas()
        grp = g.groupby("user_id", sort=False)
        rk_min = grp["value"].rank(method="min").to_numpy()
        rk_max = grp["value"].rank(method="max").to_numpy()
        n = grp["value"].transform("size").to_numpy().astype(np.float64)
        pr = np.where(n > 1, (rk_min - 1) / np.maximum(n - 1, 1), 0.0)
        cd = rk_max / n
        return pa.table({"event_id": t["event_id"],
                         "user_id": t["user_id"],
                         "pr": pa.array(pr, pa.float64()),
                         "cd": pa.array(cd, pa.float64())})

    return wave_group_reduce(
        ds.map_batches(add_bucket, batch_format="pyarrow"),
        "_bucket", nb, dist_bucket)


def embedding_dim_stats(sf_dir: str):
    """Per-dimension statistics over the embedding list column (the vector
    column's health check: count + exact integer-micro sum per dimension).
    List columns flatten zero-copy; per-block bincount over within-list
    positions pre-reduces to dim rows before the wire; bounded final.
    Sums are exact int64 micro-units (floor(x * 1e6)) so float summation
    order cannot break the oracle hash."""
    ds = _read(sf_dir, "embeddings", columns=["embedding"])

    def partial(t: pa.Table) -> pa.Table:
        emb = t["embedding"]
        if isinstance(emb, pa.ChunkedArray):
            emb = emb.combine_chunks()
        flat = pc.list_flatten(emb).to_numpy(zero_copy_only=False)
        par = pc.list_parent_indices(emb).to_numpy(zero_copy_only=False)
        if len(par) == 0:
            return pa.table({"idx": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64()),
                             "s": pa.array([], pa.int64())})
        new = np.r_[True, par[1:] != par[:-1]]
        starts = np.flatnonzero(new)
        pos = np.arange(len(par)) - np.repeat(
            starts, np.diff(np.r_[starts, len(par)]))
        micro = np.floor(flat.astype(np.float64) * 1e6).astype(np.int64)
        s = np.bincount(pos, weights=micro).astype(np.int64)
        n = np.bincount(pos).astype(np.int64)
        return pa.table({"idx": pa.array(np.arange(len(s)), pa.int64()),
                         "n": pa.array(n), "s": pa.array(s)})

    def final(t: pa.Table) -> pa.Table:
        df = t.to_pandas().groupby("idx", sort=True).sum().reset_index()
        return _pa_from_pandas(df.astype("int64"), preserve_index=False)

    return _tree_agg(ds, partial, final)


def fuzzy_pairs_edit2(sf_dir: str):
    """Fuzzy self-join at edit distance <= 2: SymSpell 2-deletion
    neighborhood keys -> per-run candidates -> vectorized banded-Levenshtein
    exact verify -> one int-only pair-bucket dedup wave (see
    functions/fuzzy.edit2_pairs). The SQL oracle is the O(n^2) cross-join
    levenshtein <= 2."""
    from .functions.fuzzy import edit2_pairs
    ds = _read(sf_dir, "customer", columns=["c_custkey", "c_name"])
    return edit2_pairs(ds, "c_custkey", "c_name",
                       n_buckets=_row_sized_buckets(sf_dir, "customer"))


def fuzzy_name_clusters(sf_dir: str):
    """Entity-resolution clusters: connected components over the
    edit-distance-1 name graph — the fuzzy pairs feed straight into the
    same distributed min-label pointer-jumping CC every dedup pipeline
    uses (operator composition; nothing frontier-sized touches the
    driver). Oracle: recursive-CTE transitive closure over the
    levenshtein<=1 edges."""
    from .functions.dedup import connected_components

    pairs = fuzzy_pairs_edit1(sf_dir).map_batches(
        lambda t: t.rename_columns(["doc_a", "doc_b"]),
        batch_format="pyarrow")
    cc = connected_components(pairs)
    return cc.map_batches(
        lambda t: t.rename_columns(["cust_id", "cluster_id"]),
        batch_format="pyarrow")


DECON_N = 5           # shingle width (words) for overlap decontamination
DECON_BENCH_MAX = 20  # doc_id < this = the "benchmark" set


def _word_shingles(t: pa.Table, n: int):
    """Vectorized word n-gram shingles for a block of documents: returns
    (parent_row_index, shingle_string) numpy arrays. Consecutive-word
    windows never cross documents (parent equality over the window)."""
    words = pc.split_pattern(t["text"], " ")
    flat = pc.list_flatten(words).to_numpy(zero_copy_only=False)
    par = pc.list_parent_indices(words).to_numpy(zero_copy_only=False)
    if len(flat) < n:
        e = np.empty(0, np.int64)
        return e, np.empty(0, object)
    valid = par[: len(par) - n + 1] == par[n - 1:]
    sh = flat[: len(flat) - n + 1].copy()
    for k in range(1, n):
        sh = sh + " "
        sh = sh + flat[k: len(flat) - n + 1 + k]
    return par[: len(par) - n + 1][valid], sh[valid]


def decontaminate_against_benchmark(sf_dir: str):
    """Benchmark decontamination (the eval-overlap gate every LLM corpus
    pipeline needs): flag every corpus document sharing ANY 5-word shingle
    with the benchmark set (here: doc_id < 20). The benchmark's shingle
    set is built once and broadcast via ``ray.put`` (benchmark sets are
    small by definition); each block then flags its docs with one
    vectorized isin — corpus shingles never shuffle, never leave their
    block. Exact string shingles here for oracle parity; at 100 TB swap
    the set for 64-bit shingle hashes (same plumbing, ~1e-7 collision
    odds)."""
    import pyarrow.parquet as pq
    docs = pq.read_table(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"],
                         filters=[("doc_id", "<", DECON_BENCH_MAX)])
    _p, bench_sh = _word_shingles(docs, DECON_N)
    bench_ref = ray.put(frozenset(bench_sh.tolist()))

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"],
               filter=pc.field("doc_id") >= DECON_BENCH_MAX)

    def flag(t: pa.Table) -> pa.Table:
        bench = ray.get(bench_ref)
        par, sh = _word_shingles(t, DECON_N)
        contam = np.zeros(t.num_rows, bool)
        if len(sh):
            hit = pd.Series(sh).isin(bench).to_numpy()
            np.logical_or.at(contam, par[hit], True)
        return pa.table({"doc_id": t["doc_id"],
                         "contaminated": pa.array(contam)})

    return ds.map_batches(flag, batch_format="pyarrow", batch_size=4096)


def dup_ngram_fraction(sf_dir: str):
    """Repetition quality gate (the Gopher-style duplicate-3-gram rule):
    per document, total vs distinct word trigrams and the duplicate
    fraction. Document-local, so entirely block-local; the fraction is a
    single double division from exact integer counts."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def stats(t: pa.Table) -> pa.Table:
        par, sh = _word_shingles(t, 3)
        n = np.zeros(t.num_rows, np.int64)
        d = np.zeros(t.num_rows, np.int64)
        if len(sh):
            df = pd.DataFrame({"p": par, "g": sh})
            g = df.groupby("p", sort=False)["g"].agg(["size", "nunique"])
            n[g.index.to_numpy()] = g["size"].to_numpy()
            d[g.index.to_numpy()] = g["nunique"].to_numpy()
        frac = np.where(n > 0, (n - d) / np.maximum(n, 1), 0.0)
        return pa.table({"doc_id": t["doc_id"],
                         "n_grams": pa.array(n), "n_distinct": pa.array(d),
                         "dup_frac": pa.array(frac, pa.float64())})

    return ds.map_batches(stats, batch_format="pyarrow", batch_size=4096)


def weighted_sample_by_length(sf_dir: str):
    """Deterministic WEIGHTED Bernoulli sampling (keep probability
    proportional to a continuous per-record weight, here document length):
    keep iff md5(text) mod 1000 < n_chars — a pure function of the record,
    so the sample is independent of row order, partitioning, and cluster
    size, and any shard can be re-drawn independently (the property
    training-data sampling needs at 100 TB). Extends the sampling family
    beyond per-stratum rates (stratified_sample) to continuous weights."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "n_chars", "text"])

    def sample(t: pa.Table) -> pa.Table:
        from .functions.text import md5_prefix_mod
        h = md5_prefix_mod(t["text"], 1000)
        w = t["n_chars"].to_numpy(zero_copy_only=False)
        return t.select(["doc_id", "n_chars"]).filter(pa.array(h < w))

    return ds.map_batches(sample, batch_format="pyarrow", batch_size=4096)


def grouped_quantiles_price(sf_dir: str):
    """PER-GROUP exact order statistics without a sort: p50/p90/p99 of
    order totalprice per priority, by (group, rank)-keyed histogram
    refinement (functions/stats.exact_grouped_quantiles) — each round is
    one counting scan whose shuffle payload is (state, bin, n) int rows,
    and the selected values are actual column elements (PERCENTILE_DISC
    semantics), so the doubles hash-match quantile_disc exactly."""
    from .functions.stats import exact_grouped_quantiles
    ds = _read(sf_dir, "orders", columns=["o_orderpriority", "o_totalprice"])
    t = exact_grouped_quantiles(ds, "o_orderpriority", "o_totalprice",
                                (0.5, 0.9, 0.99))
    return t.rename_columns(["o_orderpriority", "p50", "p90", "p99"])


CONTAIN_MIN_WORDS = 20


def subset_containment_pairs(sf_dir: str):
    """Directional containment dedup (quote/extraction detection): all
    ordered pairs where doc_a's word set is a SUBSET of doc_b's
    (containment |A∩B|/|A| = 1.0, |A| >= 20). Jaccard/MinHash miss this
    relation by construction — a paragraph quoted inside a long page has
    tiny Jaccard but containment 1.0 — so the scale path is the exact
    prefix-filter join (functions/dedup.containment_pairs): inverted-index
    postings -> rarest-token prefix -> candidate pairs -> bitset verify.
    Oracle is the O(n^2) list-intersect cross join."""
    from .functions.dedup import containment_pairs
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return containment_pairs(ds, threshold=1.0,
                             min_words=CONTAIN_MIN_WORDS)


def argminmax_user_events(sf_dir: str):
    """First/last-event attribution per user — the ARG_MIN / ARG_MAX
    (min_by/max_by) aggregate family: for every user, the event_type of the
    FIRST event and the event_type + value of the LAST event under the
    deterministic total order (ts, event_id). Arg-extremes are a
    semilattice over rows: each block keeps only its per-user first and
    last rows (<= 2 rows per user per block enter the exchange, never the
    table), and the keyed final re-reduces the same way — the same
    partial-winner shape as the CDC LWW fold (stages/merge.py), surfaced as
    an analytic aggregate."""
    ds = _read(sf_dir, "events",
               columns=["user_id", "ts", "event_id", "event_type", "value"])

    def extremes(t: pa.Table) -> pa.Table:
        df = t.to_pandas().sort_values(["user_id", "ts", "event_id"],
                                       kind="stable")
        grp = df.groupby("user_id", sort=False)
        keep = pd.concat([grp.head(1), grp.tail(1)]).drop_duplicates()
        return _pa_from_pandas(keep, preserve_index=False)

    def final(t: pa.Table) -> pa.Table:
        df = t.to_pandas().sort_values(["user_id", "ts", "event_id"],
                                       kind="stable")
        grp = df.groupby("user_id", sort=False)
        first, last = grp.head(1), grp.tail(1)
        return pa.table({
            "user_id": pa.array(first["user_id"].to_numpy(np.int64,
                                                          copy=False),
                                pa.int64()),
            "first_type": pa.array(first["event_type"].astype(str)
                                   if len(first) else [], pa.string()),
            "last_type": pa.array(last["event_type"].astype(str)
                                  if len(last) else [], pa.string()),
            "last_value": pa.array(last["value"].to_numpy(np.float64,
                                                          copy=False),
                                   pa.float64())})

    return _tree_agg(ds, extremes, final, bucket_on="user_id")


PCTL_PS = (0.25, 0.5, 0.75)


def percentile_cont_by_group(sf_dir: str):
    """Interpolated percentiles (PERCENTILE_CONT / quantile_cont) per group
    over a BOUNDED integral domain by counting, never sorting — the
    median_mode_by_group shape extended to linear interpolation: each block
    emits at most |domain| x |groups| count rows, counts add under any
    merge tree, and the bounded final walks cumulative counts. With
    pos = p*(n-1), frac in {0, .25, .5, .75} (exact dyadic doubles) and
    integral bracket values <= 50, every IEEE multiply/add is exact on both
    sides — lo + frac*(hi-lo) and lo*(1-frac) + hi*frac are the same
    number — so the doubles hash-match the oracle with no rounding fudge."""
    ds = _read(sf_dir, "lineitem", columns=["l_returnflag", "l_quantity"])

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "l_returnflag": t["l_returnflag"].to_pandas(),
            "q": t["l_quantity"].to_numpy(zero_copy_only=False)
            .astype(np.int64)})
        g = df.groupby(["l_returnflag", "q"], sort=False).size() \
            .rename("n").reset_index()
        return _pa_from_pandas(g, preserve_index=False)

    def final(t: pa.Table) -> pa.Table:
        g = t.to_pandas().groupby(["l_returnflag", "q"], sort=True)["n"] \
            .sum().reset_index()
        rows: dict[str, list] = {"l_returnflag": [], "p25": [], "p50": [],
                                 "p75": []}
        for flag, sub in g.groupby("l_returnflag", sort=True):
            vals = sub["q"].to_numpy()
            cum = np.cumsum(sub["n"].to_numpy())
            n = int(cum[-1])
            rows["l_returnflag"].append(flag)
            for p, col in zip(PCTL_PS, ("p25", "p50", "p75")):
                pos = p * (n - 1)
                fl = np.floor(pos)
                lo = float(vals[np.searchsorted(cum, fl, side="right")])
                hi = float(vals[np.searchsorted(cum, np.ceil(pos),
                                                side="right")])
                rows[col].append(lo + (pos - fl) * (hi - lo))
        return pa.table({
            "l_returnflag": pa.array(rows["l_returnflag"], pa.string()),
            "p25": pa.array(rows["p25"], pa.float64()),
            "p50": pa.array(rows["p50"], pa.float64()),
            "p75": pa.array(rows["p75"], pa.float64())})

    return _tree_agg(ds, partial, final)


def hopping_distinct_users(sf_dir: str):
    """Exact COUNT(DISTINCT user) per hopping window (60-minute windows
    every 30 minutes): explode each event into its two windows,
    pre-distinct (window, user) per block, exchange keyed by USER — each
    bucket then holds a disjoint user set, so per-window distinct counts
    become ADDITIVE int partials (one row per window per bucket) and a tiny
    single final sums them. Distinct-count is not mergeable over raw rows,
    but partitioned by the distinct KEY it is — the standard two-level
    exact distinct; the wire carries distinct (window, user) int pairs
    once, then O(windows x buckets) count rows."""
    ds = _read(sf_dir, "events", columns=["user_id", "ts"])
    hop_us = 30 * 60 * 1_000_000  # window length = 2 hops

    def explode_distinct(t: pa.Table) -> pa.Table:
        ts = t["ts"].to_numpy(zero_copy_only=False).view(np.int64)
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        win = np.concatenate([((ts // hop_us) - k) * hop_us for k in (0, 1)])
        pair = pd.DataFrame({"w": win, "user_id": np.tile(uid, 2)}) \
            .drop_duplicates()
        return pa.table({"w": pa.array(pair["w"].to_numpy(), pa.int64()),
                         "user_id": pa.array(pair["user_id"].to_numpy(),
                                             pa.int64())})

    def bucket_counts(t: pa.Table) -> pa.Table:
        df = t.to_pandas().drop_duplicates()
        g = df.groupby("w", sort=False).size().rename("n_users") \
            .reset_index()
        return pa.table({"w": pa.array(g["w"].to_numpy(), pa.int64()),
                         "n_users": pa.array(g["n_users"].to_numpy(),
                                             pa.int64())})

    def final(t: pa.Table) -> pa.Table:
        g = t.to_pandas().groupby("w", sort=True)["n_users"].sum() \
            .reset_index()
        return pa.table({
            "window_start": pa.array(g["w"].to_numpy()
                                     .astype("datetime64[us]")),
            "n_users": pa.array(g["n_users"].to_numpy(), pa.int64())})

    per_bucket = _tree_agg(ds, explode_distinct, bucket_counts,
                           bucket_on="user_id")
    return per_bucket.repartition(1).map_batches(
        final, batch_format="pyarrow", batch_size=None)


def window_frame_functions(sf_dir: str):
    """Sliding-FRAME window functions per key: LAG(value) and MIN/MAX over
    ROWS BETWEEN 6 PRECEDING AND CURRENT ROW in the deterministic
    (ts, event_id) order — completes the analytic-window family
    (``window_running_agg`` = running aggregates, ``window_rank_functions``
    = rank family, this = bounded frames). Comparison/copy-only kernels
    (grouped shift + rolling min/max), so values are bit-exact vs the SQL
    frame oracle with no float-summation-order concerns. One keyed
    exchange into data-sized buckets, then one vectorized sort + grouped
    rolling pass per bucket (pandas' C rolling kernels)."""
    from .functions.joins import _int_bucket
    from .stages.waves import wave_group_reduce

    ds = _read(sf_dir, "events", columns=["event_id", "user_id", "ts",
                                          "value"])
    nb = _row_sized_buckets(sf_dir, "events")

    def add_bucket(t: pa.Table) -> pa.Table:
        b = _int_bucket(t["user_id"].to_numpy(zero_copy_only=False), nb)
        return t.append_column("_bucket", pa.array(b))

    def frames_bucket(t: pa.Table) -> pa.Table:
        g = t.to_pandas().sort_values(["user_id", "ts", "event_id"],
                                      kind="stable")
        grp = g.groupby("user_id", sort=False)
        g["lag_value"] = grp["value"].shift(1)
        roll = grp["value"].rolling(window=7, min_periods=1)
        g["roll_max"] = roll.max().reset_index(level=0, drop=True)
        g["roll_min"] = roll.min().reset_index(level=0, drop=True)
        return _pa_from_pandas(
            g[["event_id", "user_id", "lag_value", "roll_max", "roll_min"]],
            preserve_index=False)

    return wave_group_reduce(
        ds.map_batches(add_bucket, batch_format="pyarrow"),
        "_bucket", nb, frames_bucket)


def retention_cohorts(sf_dir: str):
    """Weekly cohort retention: users grouped by first-activity week
    (Monday-anchored, = SQL date_trunc('week')); for each
    (cohort week, week offset), the count of DISTINCT users active that
    week — the standard product-analytics retention triangle. Per-block
    partials pre-distinct (user, week) int pairs, ONE user-keyed exchange
    co-locates each user's weeks (distinct-count partitioned by the
    distinct key is additive — same two-level shape as
    ``hopping_distinct_users``), each bucket derives cohort = min(week)
    and emits bounded (cohort, offset, n) rows, and a single tiny final
    sums them (domain = weeks^2). All-integer arithmetic throughout."""
    ds = _read(sf_dir, "events", columns=["user_id", "ts"])

    def distinct_user_weeks(t: pa.Table) -> pa.Table:
        days = t["ts"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[D]").astype(np.int64)
        week = days - (days + 3) % 7  # 1970-01-01 = Thursday; Monday anchor
        pair = pd.DataFrame({
            "user_id": t["user_id"].to_numpy(zero_copy_only=False),
            "week": week}).drop_duplicates()
        return pa.table({"user_id": pa.array(pair["user_id"].to_numpy(),
                                             pa.int64()),
                         "week": pa.array(pair["week"].to_numpy(),
                                          pa.int64())})

    def bucket_counts(t: pa.Table) -> pa.Table:
        df = t.to_pandas().drop_duplicates()
        cohort = df.groupby("user_id", sort=False)["week"].transform("min")
        off = (df["week"].to_numpy() - cohort.to_numpy()) // 7
        g = pd.DataFrame({"cohort": cohort.to_numpy(), "off": off}) \
            .groupby(["cohort", "off"], sort=False).size().rename("n") \
            .reset_index()
        return _pa_from_pandas(g, preserve_index=False)

    def final(t: pa.Table) -> pa.Table:
        g = t.to_pandas().groupby(["cohort", "off"], sort=True)["n"].sum() \
            .reset_index()
        week_str = (g["cohort"].to_numpy().astype("datetime64[D]")
                    .astype("datetime64[us]"))
        return pa.table({
            "cohort_week": pc.strftime(pa.array(week_str), "%Y-%m-%d"),
            "week_offset": pa.array(g["off"].to_numpy(), pa.int64()),
            "n_users": pa.array(g["n"].to_numpy(), pa.int64())})

    per_bucket = _tree_agg(ds, distinct_user_weeks, bucket_counts,
                           bucket_on="user_id")
    return per_bucket.repartition(1).map_batches(
        final, batch_format="pyarrow", batch_size=None)


ANOMALY_Z = 2.0


def daily_count_anomalies(sf_dir: str):
    """Time-series anomaly flagging: days whose event count deviates from
    the corpus mean by more than ``ANOMALY_Z`` population standard
    deviations. Per-block integer day-count partials -> one bounded final
    (domain = #days); the final derives mean/std from INTEGER sums
    (sum, sum-of-squares — order-independent and exact), so every double
    op (div, sub, sqrt) is an IEEE-deterministic function of exact
    integers and the z scores hash-match the SQL oracle computing the
    same explicit formula (no transcendental beyond correctly-rounded
    sqrt)."""
    ds = _read(sf_dir, "events", columns=["ts"])

    def day_counts(t: pa.Table) -> pa.Table:
        day = pc.strftime(t["ts"], "%Y-%m-%d")
        g = pa.table({"day": day}).to_pandas() \
            .groupby("day", sort=False).size().rename("n").reset_index()
        return _pa_from_pandas(g, preserve_index=False)

    def final(t: pa.Table) -> pa.Table:
        df = t.to_pandas().groupby("day", sort=True)["n"].sum().reset_index()
        cnt = df["n"].to_numpy(np.int64)
        nd = float(len(cnt))
        s = float(cnt.sum())
        s2 = float((cnt * cnt).sum())
        mean = s / nd
        std = np.sqrt((s2 - s * s / nd) / nd)
        with np.errstate(divide="ignore", invalid="ignore"):
            z = (cnt - mean) / std
        # std == 0 -> z is NaN; NaN > thresh is False in numpy AND SQL
        keep = np.abs(z) > ANOMALY_Z
        return pa.table({
            "day": pa.array(df["day"].to_numpy()[keep]),
            "n": pa.array(cnt[keep], pa.int64()),
            "z": pa.array(z[keep], pa.float64())})

    return _tree_agg(ds, day_counts, final)


def doc_repetition_signals(sf_dir: str):
    """Per-document repetition signals for corpus quality gating (the
    Gopher-style repetition filters): word-2gram count, the most-repeated
    2gram's count, and its share of all 2grams. Entirely block-local (a
    document is one row, so no exchange at any scale); 2grams are built
    with Arrow kernels (split -> flatten -> slice-shift ->
    binary_join_element_wise) and counted in one vectorized pandas pass.
    The share is ONE double division on exact ints -> hash-exact vs SQL."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def signals(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        words = pc.split_pattern(t["text"], " ")
        par = pc.list_parent_indices(words).to_numpy(zero_copy_only=False)
        flat = pc.list_flatten(words).combine_chunks()
        n = len(flat)
        if n < 2:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "n_2grams": pa.array([], pa.int64()),
                             "top2_count": pa.array([], pa.int64()),
                             "top2_share": pa.array([], pa.float64())})
        g2 = pc.binary_join_element_wise(flat.slice(0, n - 1),
                                         flat.slice(1), " ")
        same = par[1:] == par[:-1]  # pair stays inside one document
        df = pd.DataFrame({"doc_id": ids[par[:-1][same]],
                           "g": g2.to_pandas()[same]})
        cnt = df.groupby(["doc_id", "g"], sort=False).size() \
            .rename("c").reset_index()
        agg = cnt.groupby("doc_id", sort=False)["c"].agg(["max", "sum"]) \
            .reset_index()
        top = agg["max"].to_numpy(np.int64)
        n2 = agg["sum"].to_numpy(np.int64)
        return pa.table({
            "doc_id": pa.array(agg["doc_id"].to_numpy(np.int64)),
            "n_2grams": pa.array(n2),
            "top2_count": pa.array(top),
            "top2_share": pa.array(top / n2, pa.float64())})

    return ds.map_batches(signals, batch_format="pyarrow", batch_size=4096)


def unigram_commonness(sf_dir: str):
    """Corpus-statistics quality score: per document, the mean corpus
    frequency of its tokens (common-token documents score high, rare-token
    ones low) — the shape of every corpus-LM scoring pass: ONE token-keyed
    exchange of per-block (token, count) partials builds the global
    frequency table (Zipf-bounded, the classic small side), broadcast once
    via ``ray.put``; scoring is then block-local. sum_freq / n_tokens are
    exact ints; mean_freq is one IEEE division -> hash-exact vs SQL."""
    from .functions.dedup import default_n_buckets
    from .stages.partition import hash_strings
    from .stages.waves import wave_group_reduce

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    nb = default_n_buckets()

    def tf_partial(t: pa.Table) -> pa.Table:
        flat = pc.list_flatten(pc.split_pattern(t["text"], " "))
        c = flat.to_pandas().value_counts()
        out = pa.table({"term": pa.array(c.index.to_numpy(), pa.string()),
                        "c": pa.array(c.to_numpy(), pa.int64())})
        bucket = (hash_strings(out["term"]) % np.uint64(nb)).astype(np.int64)
        return out.append_column("_bucket", pa.array(bucket))

    def tf_bucket_sum(t: pa.Table) -> pa.Table:
        g = t.to_pandas().groupby("term", sort=False)["c"].sum().reset_index()
        return pa.table({"term": pa.array(g["term"].tolist(), pa.string()),
                         "c": pa.array(g["c"].to_numpy(np.int64))})

    tf_rows = wave_group_reduce(
        ds.map_batches(tf_partial, batch_format="pyarrow", batch_size=4096),
        "_bucket", nb, tf_bucket_sum)
    parts = [t for t in ray.get(tf_rows.to_arrow_refs()) if t.num_rows]
    freq = (pa.concat_tables(parts).to_pandas() if parts
            else pd.DataFrame({"term": pd.Series([], dtype="object"),
                               "c": pd.Series([], dtype="int64")}))
    fref = ray.put(freq)

    def score_block(t: pa.Table) -> pa.Table:
        fm = ray.get(fref)
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        words = pc.split_pattern(t["text"], " ")
        par = pc.list_parent_indices(words).to_numpy(zero_copy_only=False)
        flat = pc.list_flatten(words)
        m = pd.DataFrame({"doc_id": ids[par],
                          "term": flat.to_pandas()}) \
            .merge(fm, on="term", how="left")
        g = m.groupby("doc_id", sort=False)["c"].agg(["sum", "size"]) \
            .reset_index()
        s = g["sum"].to_numpy(np.int64)
        n = g["size"].to_numpy(np.int64)
        return pa.table({
            "doc_id": pa.array(g["doc_id"].to_numpy(np.int64)),
            "n_tokens": pa.array(n),
            "sum_freq": pa.array(s),
            "mean_freq": pa.array(s / n, pa.float64())})

    return ds.map_batches(score_block, batch_format="pyarrow",
                          batch_size=4096)


KEYWORD_QUERY_AND = ["dup", "join"]  # one rare + one common token


def keyword_search_indexed(sf_dir: str):
    """Indexed keyword AND-search over the documents corpus: build the
    token-sharded inverted index once (cached per sf under /tmp, the same
    discipline as the replay workload cache), then answer from the index —
    the search reads ONLY the shard files the query tokens hash to, never
    the corpus (see pipelines/text_index.py for the scale argument; the
    reference's analogous surface is its Elasticsearch index build). The
    oracle scans the raw table with list_contains — same answer, linear
    cost; the index path's value is the lookup-cost shape."""
    import hashlib
    import os

    from .pipelines.text_index import build_text_index, search_text_index
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:10]
    idx = f"/tmp/cwds_jobs_ray_cache/text_index_{tag}"
    if not os.path.isfile(f"{idx}/meta.json"):
        build_text_index(_read(sf_dir, "documents",
                               columns=["doc_id", "text"]), idx)
    return search_text_index(idx, KEYWORD_QUERY_AND, mode="and")


CHUNK_WORDS = 8
CHUNK_STRIDE = 6


def chunk_documents(sf_dir: str):
    """Training-data chunker: split each document into overlapping
    fixed-word windows (CHUNK_WORDS words every CHUNK_STRIDE — the
    standard pre-training context-window slicer), one output row per
    chunk (1 -> k flat map, entirely block-local: a document is one row,
    so chunking shuffles nothing at any scale). Chunk construction is the
    exploded (chunk, word) frame + one grouped join — the same bounded
    per-GROUP join discipline as ``string_agg_order_lines`` (<= 8 words
    per chunk), never per-row Python over the table."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def chunks(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        words = pc.split_pattern(t["text"], " ")
        lens = pc.list_value_length(words).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        flat = pc.list_flatten(words).to_pandas().to_numpy()
        doc_word0 = np.r_[0, np.cumsum(lens)][:-1]  # first word, per doc
        n_chunks = (np.maximum(lens, 1) - 1) // CHUNK_STRIDE + 1
        total = int(n_chunks.sum())
        if total == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "chunk_idx": pa.array([], pa.int64()),
                             "chunk_text": pa.array([], pa.string()),
                             "n_words": pa.array([], pa.int64())})
        doc_of_chunk = np.repeat(np.arange(len(ids)), n_chunks)
        chunk0 = np.r_[0, np.cumsum(n_chunks)][:-1]
        chunk_idx = np.arange(total) - chunk0[doc_of_chunk]
        start = chunk_idx * CHUNK_STRIDE
        cw = np.minimum(CHUNK_WORDS, lens[doc_of_chunk] - start)
        # explode to (chunk, word-position) pairs
        pair_chunk = np.repeat(np.arange(total), cw)
        pair0 = np.r_[0, np.cumsum(cw)][:-1]
        within = np.arange(int(cw.sum())) - pair0[pair_chunk]
        word_pos = (doc_word0[doc_of_chunk] + start)[pair_chunk] + within
        joined = pd.Series(flat[word_pos]) \
            .groupby(pair_chunk, sort=True).agg(" ".join)
        return pa.table({
            "doc_id": pa.array(ids[doc_of_chunk], pa.int64()),
            "chunk_idx": pa.array(chunk_idx, pa.int64()),
            "chunk_text": pa.array(joined.to_numpy(), pa.string()),
            "n_words": pa.array(cw, pa.int64())})

    return ds.map_batches(chunks, batch_format="pyarrow", batch_size=4096)


PACK_BUDGET = 256  # words per training bin


def pack_documents_offsets(sf_dir: str):
    """Sequence packing (concat-then-slice): documents are laid out in one
    deterministic stream (doc_id order) and every document is assigned the
    training bin its starting word offset falls into (bin = offset //
    PACK_BUDGET) — the packing scheme that concatenates a corpus and cuts
    fixed context windows. Needs ONE global ordered prefix sum: per-block
    word totals are O(#blocks) driver metadata (never rows), exclusive-
    cumsum'd into per-block offsets, broadcast, and each block stamps its
    rows locally — the same zipWithIndex shape as ``deterministic_shuffle``.
    All-integer arithmetic -> hash-exact vs the SQL window oracle."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def count(t: pa.Table) -> pa.Table:
        n = pc.list_value_length(pc.split_pattern(t["text"], " "))
        return pa.table({"doc_id": t["doc_id"],
                         "n_words": n.cast(pa.int64())})

    counted = ds.map_batches(count, batch_format="pyarrow",
                             batch_size=4096).sort("doc_id").materialize()
    def block_bounds(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:  # a range-partitioned sort can emit empty blocks
            return pa.table({"first": pa.array([], pa.int64()),
                             "w": pa.array([], pa.int64())})
        return pa.table({
            "first": pa.array([b["doc_id"][0].as_py()], pa.int64()),
            "w": pa.array([int(pc.sum(b["n_words"]).as_py() or 0)],
                          pa.int64())})

    bounds = counted.map_batches(block_bounds, batch_format="pyarrow",
                                 batch_size=None).to_pandas()
    bounds = bounds.sort_values("first").reset_index(drop=True)
    offsets = np.concatenate([[0], bounds["w"].to_numpy().cumsum()[:-1]])
    bref = ray.put((bounds["first"].to_numpy(), offsets))

    def stamp(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "n_words": pa.array([], pa.int64()),
                             "stream_offset": pa.array([], pa.int64()),
                             "bin_id": pa.array([], pa.int64())})
        firsts, offs = ray.get(bref)
        start = offs[np.searchsorted(firsts, b["doc_id"][0].as_py())]
        n = b["n_words"].to_numpy(zero_copy_only=False)
        off = start + np.r_[0, np.cumsum(n)[:-1]]
        return pa.table({
            "doc_id": b["doc_id"],
            "n_words": b["n_words"],
            "stream_offset": pa.array(off, pa.int64()),
            "bin_id": pa.array(off // PACK_BUDGET, pa.int64())})

    return counted.map_batches(stamp, batch_format="pyarrow",
                               batch_size=None)


PR_SCALE = 10**12   # fixed-point rank unit
PR_ITERS = 3
PR_ALPHA_NUM, PR_ALPHA_DEN = 85, 100


def pagerank_user_graph(sf_dir: str):
    """Iterative PageRank over the "who acted next" user graph (edge
    u -> v when v performed the next event after u within an event_type,
    LEAD order) — the iterative-numeric distributed pattern (k-means and
    pointer-jumping CC are the catalog's other iterative ops) made
    HASH-EXACT: ranks live in integer fixed-point (PR_SCALE units), every
    update is floor division / integer sums (order-independent), so
    PR_ITERS unrolled iterations match the SQL oracle bit-for-bit —
    dangling mass is dropped (documented variant, both sides identical).

    Scale shape: edges are extracted per type-bucket (one keyed exchange +
    per-bucket vectorized LEAD; at real scale the per-type order would be
    range-salted with boundary stitching — the type cardinality here is
    the synthetic corpus's 5); each iteration broadcasts the O(nodes)
    rank/degree arrays via ``ray.put``, computes per-edge contributions
    block-locally, and reduces per-destination partials through the same
    bucketed wave as every keyed final — the classic map-reduce PageRank
    with the big side (edges) never leaving the workers."""
    from .stages.partition import hash_strings
    from .stages.waves import wave_group_reduce

    ds = _read(sf_dir, "events",
               columns=["event_id", "user_id", "event_type"])
    nb = _agg_buckets()

    def type_bucket(t: pa.Table) -> pa.Table:
        b = (hash_strings(t["event_type"]) % np.uint64(nb)).astype(np.int64)
        return t.append_column("_bucket", pa.array(b))

    def lead_edges(t: pa.Table) -> pa.Table:
        g = t.to_pandas().sort_values(["event_type", "event_id"],
                                      kind="stable")
        nxt = g.groupby("event_type", sort=False)["user_id"].shift(-1)
        keep = nxt.notna() & (nxt != g["user_id"])
        e = pd.DataFrame({"src": g["user_id"][keep].to_numpy(np.int64),
                          "dst": nxt[keep].to_numpy(np.int64)}) \
            .drop_duplicates()
        return pa.table({"src": pa.array(e["src"].to_numpy(np.int64)),
                         "dst": pa.array(e["dst"].to_numpy(np.int64))})

    per_type = wave_group_reduce(
        ds.map_batches(type_bucket, batch_format="pyarrow"),
        "_bucket", nb, lead_edges)

    # global edge dedup: the same (src, dst) pair can arise under two
    # event_types — re-key by src (a src never spans buckets, so
    # per-bucket drop_duplicates IS the global dedup) and count degrees
    # in the same pass
    def src_bucket(t: pa.Table) -> pa.Table:
        b = (t["src"].to_numpy(zero_copy_only=False)
             % np.int64(nb)).astype(np.int64)
        return t.append_column("_bucket", pa.array(b))

    def dedup_bucket(t: pa.Table) -> pa.Table:
        e = t.to_pandas().drop_duplicates()
        return pa.table({"src": pa.array(e["src"].to_numpy(np.int64)),
                         "dst": pa.array(e["dst"].to_numpy(np.int64))})

    edges = wave_group_reduce(
        per_type.map_batches(src_bucket, batch_format="pyarrow"),
        "_bucket", nb, dedup_bucket).materialize()

    # node universe + out-degrees: O(nodes) driver state, broadcast once
    # per iteration (the small side of map-reduce PageRank)
    nodes = np.unique(_read(sf_dir, "events", columns=["user_id"])
                      .to_pandas()["user_id"].to_numpy(np.int64))

    def deg_partial(t: pa.Table) -> pa.Table:
        g = t.to_pandas().groupby("src", sort=False).size().rename("d") \
            .reset_index()
        return pa.table({"src": pa.array(g["src"].to_numpy(np.int64)),
                         "d": pa.array(g["d"].to_numpy(np.int64))})

    deg_rows = _tree_agg(
        edges, deg_partial,
        lambda t: (lambda g: pa.table(
            {"src": pa.array(g["src"].to_numpy(np.int64)),
             "d": pa.array(g["d"].to_numpy(np.int64))}))(
            t.to_pandas().groupby("src", sort=False)["d"].sum()
            .reset_index()),
        bucket_on="src").to_pandas()
    deg = np.zeros(len(nodes), np.int64)
    if len(deg_rows):
        di0 = np.searchsorted(nodes, deg_rows["src"].to_numpy(np.int64))
        deg[di0] = deg_rows["d"].to_numpy(np.int64)
    n = len(nodes)
    base = (15 * PR_SCALE) // (100 * n)
    rank = np.full(n, PR_SCALE // n, np.int64)

    def partial_contrib(t: pa.Table, rref) -> pa.Table:
        rk, dg, ix_keys, ix_vals = ray.get(rref)
        src = t["src"].to_numpy(zero_copy_only=False)
        dst = t["dst"].to_numpy(zero_copy_only=False)
        si = ix_vals[np.searchsorted(ix_keys, src)]
        c = rk[si] // dg[si]  # deg >= 1 for every edge src
        g = pd.DataFrame({"dst": dst, "c": c}) \
            .groupby("dst", sort=False)["c"].sum().reset_index()
        out = pa.table({"dst": pa.array(g["dst"].to_numpy(np.int64)),
                        "c": pa.array(g["c"].to_numpy(np.int64))})
        b = (out["dst"].to_numpy(zero_copy_only=False)
             % np.int64(nb)).astype(np.int64)
        return out.append_column("_bucket", pa.array(b))

    def sum_bucket(t: pa.Table) -> pa.Table:
        g = t.to_pandas().groupby("dst", sort=False)["c"].sum().reset_index()
        return pa.table({"dst": pa.array(g["dst"].to_numpy(np.int64)),
                         "c": pa.array(g["c"].to_numpy(np.int64))})

    ix_keys = nodes  # sorted by construction (np.unique)
    ix_vals = np.arange(n, dtype=np.int64)
    for _ in range(PR_ITERS):
        rref = ray.put((rank, deg, ix_keys, ix_vals))
        sums = wave_group_reduce(
            edges.map_batches(lambda t, r=rref: partial_contrib(t, r),
                              batch_format="pyarrow"),
            "_bucket", nb, sum_bucket).to_pandas()
        acc = np.zeros(n, np.int64)
        di = ix_vals[np.searchsorted(ix_keys, sums["dst"].to_numpy(np.int64))]
        acc[di] = sums["c"].to_numpy(np.int64)
        rank = base + (PR_ALPHA_NUM * acc) // PR_ALPHA_DEN

    return pa.table({"user_id": pa.array(nodes),
                     "rank": pa.array(rank, pa.int64())})


HH_MEAN_NUM, HH_MEAN_DEN = 5, 4  # hitter: > 5/4 of the group's mean count


def grouped_heavy_hitters(sf_dir: str):
    """Per-group heavy hitters: users contributing strictly more than
    HH_MEAN_NUM/HH_MEAN_DEN of their event_type's MEAN per-user count —
    the per-GROUP variant of the global ``heavy_hitter_users``, with a
    scale-free threshold (a fixed share like 1/20 degenerates to empty as
    the user population grows; the synthetic user distribution is
    near-uniform, so the multiple is modest). Exact two-level counting
    shaped for
    scale: per-block (type, user) partials pre-reduce the stream, ONE
    user-keyed exchange makes per-(type, user) counts additive, group
    totals/user-counts come back as an O(groups) broadcast, and the
    threshold is an integer cross-multiplication
    (n * DEN * distinct_users > NUM * total — no division, no floats). At open
    user cardinality the same exchange carries Misra-Gries summaries
    instead (functions/sketch.py); counts here are exact because the
    partial pre-reduce bounds the wire by distinct (type, user) per
    block."""
    ds = _read(sf_dir, "events", columns=["event_type", "user_id"])

    def partial(t: pa.Table) -> pa.Table:
        g = pa.table({"event_type": t["event_type"],
                      "user_id": t["user_id"]}).to_pandas() \
            .groupby(["event_type", "user_id"], sort=False).size() \
            .rename("n").reset_index()
        return _pa_from_pandas(g, preserve_index=False)

    counts = _tree_agg(
        ds, partial,
        lambda t: _pa_from_pandas(
            t.to_pandas().groupby(["event_type", "user_id"], sort=False)
            ["n"].sum().reset_index(), preserve_index=False),
        bucket_on="user_id").materialize()

    # group totals + distinct-user counts: per-block O(groups) partials ->
    # one bounded final, broadcast once (never a full count-table collect).
    # `counts` rows are UNIQUE per (type, user) after the keyed exchange,
    # so per-block row counts are additive distinct-user partials.
    def tot_partial(t: pa.Table) -> pa.Table:
        g = t.to_pandas().groupby("event_type", sort=False)["n"] \
            .agg(["sum", "size"]).reset_index() \
            .rename(columns={"sum": "tot", "size": "du"})
        return _pa_from_pandas(g, preserve_index=False)

    def tot_final(t: pa.Table) -> pa.Table:
        g = t.to_pandas().groupby("event_type", sort=False)[["tot", "du"]] \
            .sum().reset_index()
        return _pa_from_pandas(g, preserve_index=False)

    tot = _tree_agg(counts, tot_partial, tot_final).to_pandas()
    tref = ray.put({r.event_type: (int(r.tot), int(r.du))
                    for r in tot.itertuples()})

    def hitters(t: pa.Table) -> pa.Table:
        tt = ray.get(tref)
        df = t.to_pandas()
        total = df["event_type"].map(lambda k: tt[k][0]).to_numpy(np.int64)
        du = df["event_type"].map(lambda k: tt[k][1]).to_numpy(np.int64)
        keep = (df["n"].to_numpy(np.int64) * HH_MEAN_DEN * du
                > HH_MEAN_NUM * total)
        out = df[keep]
        return pa.table({
            "event_type": pa.array(out["event_type"].tolist(), pa.string()),
            "user_id": pa.array(out["user_id"].to_numpy(np.int64)),
            "n": pa.array(out["n"].to_numpy(np.int64))})

    return counts.map_batches(hitters, batch_format="pyarrow",
                              batch_size=65536)


BM25_TOKENS = ["dup", "join"]  # one rare + one common query token
BM25_K1, BM25_B = 1.2, 0.75


def bm25_doc_scores(sf_dir: str):
    """BM25 relevance scores for a fixed keyword query over the corpus,
    with the rational Robertson idf ((N - df + 0.5) / (df + 0.5), no log)
    so every float op is an IEEE-deterministic function of exact integer
    corpus statistics — the double score column itself hash-matches the
    SQL oracle, which mirrors the expression tree operation-for-operation
    (same discipline as daily_count_anomalies). Corpus stats (N, sum(dl),
    df per query token) are one bounded tree-aggregate broadcast to a
    block-local scoring pass; zero shuffle of document rows."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def stats_partial(t: pa.Table) -> pa.Table:
        ws = pc.split_pattern(t["text"], " ")
        dl = pc.list_value_length(ws).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        row = {"n": [len(dl)], "sdl": [int(dl.sum())]}
        for j, tok in enumerate(BM25_TOKENS):
            tfs = _token_tf(ws, tok)
            row[f"df{j}"] = [int((tfs > 0).sum())]
        return pa.table({k: pa.array(v, pa.int64())
                         for k, v in row.items()})

    def stats_final(t: pa.Table) -> pa.Table:
        df = t.to_pandas().sum()
        return pa.table({k: pa.array([int(df[k])], pa.int64())
                         for k in df.index})

    g = _tree_agg(ds, stats_partial, stats_final).to_pandas().iloc[0]
    n, sdl = float(g["n"]), float(g["sdl"])
    dfs = [float(g[f"df{j}"]) for j in range(len(BM25_TOKENS))]
    gref = ray.put((n, sdl, dfs))

    def score(t: pa.Table) -> pa.Table:
        nn, sd, dd = ray.get(gref)
        ws = pc.split_pattern(t["text"], " ")
        dl = pc.list_value_length(ws).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False).astype(np.float64)
        total = np.zeros(len(dl), np.float64)
        any_tf = np.zeros(len(dl), bool)
        for j, tok in enumerate(BM25_TOKENS):  # fixed token-order sum
            tf = _token_tf(ws, tok).astype(np.float64)
            any_tf |= tf > 0
            idf = (float(nn - dd[j]) + 0.5) / (dd[j] + 0.5)
            denom = tf + BM25_K1 * ((1.0 - BM25_B)
                                    + BM25_B * (dl / (sd / nn)))
            total = total + (idf * (tf * (BM25_K1 + 1.0))) / denom
        return pa.table({
            "doc_id": pa.array(
                t["doc_id"].to_numpy(zero_copy_only=False)[any_tf],
                pa.int64()),
            "score": pa.array(total[any_tf], pa.float64())})

    return ds.map_batches(score, batch_format="pyarrow", batch_size=4096)


def _token_tf(ws: pa.ChunkedArray | pa.ListArray, tok: str) -> np.ndarray:
    """Per-row occurrence count of ``tok`` in a split-words list column
    (Arrow kernels: flatten + equality + per-parent sum)."""
    if isinstance(ws, pa.ChunkedArray):
        ws = ws.combine_chunks()
    par = pc.list_parent_indices(ws).to_numpy(zero_copy_only=False)
    eq = pc.equal(pc.list_flatten(ws), tok).to_numpy(zero_copy_only=False)
    out = np.zeros(len(ws), np.int64)
    np.add.at(out, par, eq.astype(np.int64))
    return out


def _bm25_sql() -> str:
    """Oracle mirroring ``bm25_doc_scores``'s expression tree op-for-op
    (literals written as the same arithmetic — ``(1.2 + 1.0)`` not 2.2 —
    so both sides perform identical IEEE operations)."""
    tf_cols = ",\n               ".join(
        f"CAST(len(list_filter(ws, x -> x = '{t}')) AS DOUBLE) AS tf{j}"
        for j, t in enumerate(BM25_TOKENS))
    df_cols = ",\n             ".join(
        f"CAST(SUM(CASE WHEN tf{j} > 0 THEN 1 ELSE 0 END) AS BIGINT)"
        f" AS df{j}" for j in range(len(BM25_TOKENS)))
    addends = "\n          + ".join(
        f"(CAST(n - df{j} AS DOUBLE) + 0.5) / (CAST(df{j} AS DOUBLE) + 0.5)"
        f" * (tf{j} * (1.2 + 1.0))"
        f" / (tf{j} + 1.2 * ((1.0 - 0.75) + 0.75 * (dl / (sdl / n))))"
        for j in range(len(BM25_TOKENS)))
    anytf = " OR ".join(f"tf{j} > 0" for j in range(len(BM25_TOKENS)))
    return f"""
        WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws
                   FROM documents),
        st AS (SELECT doc_id, CAST(len(ws) AS DOUBLE) AS dl,
               {tf_cols}
               FROM w),
        g AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(dl AS BIGINT)) AS DOUBLE) AS sdl,
             {df_cols}
              FROM st)
        SELECT doc_id,
          {addends}
          AS score
        FROM st, g
        WHERE {anytf}
    """


def _pagerank_sql() -> str:
    """Unrolled fixed-point PageRank oracle (aggregates are not allowed in
    a recursive CTE term, so the PR_ITERS iterations are unrolled as
    chained CTEs — each one plain integer joins/sums, bit-identical to
    the engine's loop)."""
    init = f"(SELECT {PR_SCALE} // n FROM cnt)"
    basev = f"(SELECT (15 * {PR_SCALE}) // (100 * n) FROM cnt)"
    parts = [f"""
        WITH lead_ev AS (
          SELECT user_id AS src,
                 LEAD(user_id) OVER (PARTITION BY event_type
                                     ORDER BY event_id) AS dst
          FROM events),
        edges AS (SELECT DISTINCT src, dst FROM lead_ev
                  WHERE dst IS NOT NULL AND dst <> src),
        nodes AS (SELECT DISTINCT user_id FROM events),
        cnt AS (SELECT COUNT(*) AS n FROM nodes),
        deg AS (SELECT src, COUNT(*) AS d FROM edges GROUP BY 1),
        r0 AS (SELECT user_id, {init} AS rank FROM nodes)"""]
    for i in range(1, PR_ITERS + 1):
        parts.append(f""",
        s{i} AS (SELECT e.dst AS user_id, SUM(r.rank // g.d) AS c
                 FROM edges e JOIN r{i - 1} r ON r.user_id = e.src
                 JOIN deg g ON g.src = e.src GROUP BY 1),
        r{i} AS (SELECT nd.user_id,
                   {basev} + ({PR_ALPHA_NUM} * COALESCE(s{i}.c, 0))
                     // {PR_ALPHA_DEN} AS rank
                 FROM nodes nd LEFT JOIN s{i} USING (user_id))""")
    parts.append(f"""
        SELECT user_id, CAST(rank AS BIGINT) AS rank FROM r{PR_ITERS}""")
    return "".join(parts)


# --------------------------------------------------------------------------
# registry


QUERIES = {
    "cdc_lww_latest": cdc_lww_latest,
    "cdc_apply_iud": cdc_apply_iud,
    "cdc_watermark": cdc_watermark,
    "cdc_batch_counters": cdc_batch_counters,
    "cdc_dedup_redelivery": cdc_dedup_redelivery,
    "savepoint_next_batch": savepoint_next_batch,
    "filter_project_lineitem": filter_project_lineitem,
    "tombstone_filter": tombstone_filter,
    "inlist_filter": inlist_filter,
    "trim_normalize": trim_normalize,
    "opcode_recode": opcode_recode,
    "join_broadcast_dims": join_broadcast_dims,
    "join_large_rev_by_priority": join_large_rev_by_priority,
    "hydration_lookup": hydration_lookup,
    "merge_upsert_join": merge_upsert_join,
    "agg_pricing_summary": agg_pricing_summary,
    "distinct_keys": distinct_keys,
    "approx_distinct_users": approx_distinct_users,
    "value_histogram": value_histogram,
    "count_consumed": count_consumed,
    "exact_quantiles_price": exact_quantiles_price,
    "window_running_agg": window_running_agg,
    "json_extract_props": json_extract_props,
    "pivot_revenue": pivot_revenue,
    "grouped_topk_events": grouped_topk_events,
    "semi_anti_join_orders": semi_anti_join_orders,
    "rollup_revenue": rollup_revenue,
    "heavy_hitter_users": heavy_hitter_users,
    "distinct_users_by_type": distinct_users_by_type,
    "bloom_semi_join_orders": bloom_semi_join_orders,
    "stats_moments_by_group": stats_moments_by_group,
    "tfidf_top_terms": tfidf_top_terms,
    "median_mode_by_group": median_mode_by_group,
    "embedding_neardup_lsh": embedding_neardup_lsh,
    "events_window_agg": events_window_agg,
    "topk_hot_keys": topk_hot_keys,
    "stable_order_head": stable_order_head,
    "union_change_sources": union_change_sources,
    "asof_join_latest_event": asof_join_latest_event,
    "range_join_followups": range_join_followups,
    "sessionize_events": sessionize_events,
    # training-data operators
    "dedup_exact_text": dedup_exact_text,
    "text_quality": text_quality,
    "token_counts_by_lang": token_counts_by_lang,
    "lang_id_heuristic": lang_id_heuristic,
    "doc_fingerprint": doc_fingerprint,
    "token_counts_bpe": token_counts_bpe,
    "rolling_hash_fingerprints": rolling_hash_fingerprints,
    "simhash_fingerprint": simhash_fingerprint,
    "ngram_jaccard_pairs": ngram_jaccard_pairs,
    "minhash_lsh_dups": minhash_lsh_dups,
    "ann_cosine_topk": ann_cosine_topk,
    "ann_lsh_topk": ann_lsh_topk,
    "ann_ivf_topk": ann_ivf_topk,
    "ann_pq_topk": ann_pq_topk,
    "kmeans_clusters": kmeans_clusters,
    "neardup_clusters": neardup_clusters,
    "embedding_neardup_pairs": embedding_neardup_pairs,
    "multimodal_features": multimodal_features,
    "multimodal_frame_pipeline": multimodal_frame_pipeline,
    "multimodal_real_decode": multimodal_real_decode,
    "paged_source_demo": paged_source_demo,
    "train_val_split": train_val_split,
    "deterministic_shuffle": deterministic_shuffle,
    "events_hopping_window": events_hopping_window,
    "clean_corpus": clean_corpus,
    "sample_by_token_budget": sample_by_token_budget,
    "top_ngrams": top_ngrams,
    "stratified_sample": stratified_sample,
    "simhash_neardup_pairs": simhash_neardup_pairs,
    "cube_revenue": cube_revenue,
    "string_agg_order_lines": string_agg_order_lines,
    "window_rank_functions": window_rank_functions,
    "gapfill_daily_counts": gapfill_daily_counts,
    "regexp_extract_all_tokens": regexp_extract_all_tokens,
    "fuzzy_pairs_edit1": fuzzy_pairs_edit1,
    "set_ops_keys": set_ops_keys,
    "redact_numbers": redact_numbers,
    "type_token_ratio": type_token_ratio,
    "funnel_signup_purchase": funnel_signup_purchase,
    "window_distribution_functions": window_distribution_functions,
    "embedding_dim_stats": embedding_dim_stats,
    "decontaminate_against_benchmark": decontaminate_against_benchmark,
    "dup_ngram_fraction": dup_ngram_fraction,
    "fuzzy_name_clusters": fuzzy_name_clusters,
    "fuzzy_pairs_edit2": fuzzy_pairs_edit2,
    "argminmax_user_events": argminmax_user_events,
    "subset_containment_pairs": subset_containment_pairs,
    "grouped_quantiles_price": grouped_quantiles_price,
    "weighted_sample_by_length": weighted_sample_by_length,
    "percentile_cont_by_group": percentile_cont_by_group,
    "hopping_distinct_users": hopping_distinct_users,
    "window_frame_functions": window_frame_functions,
    "retention_cohorts": retention_cohorts,
    "daily_count_anomalies": daily_count_anomalies,
    "doc_repetition_signals": doc_repetition_signals,
    "unigram_commonness": unigram_commonness,
    "keyword_search_indexed": keyword_search_indexed,
    "chunk_documents": chunk_documents,
    "pack_documents_offsets": pack_documents_offsets,
    "pagerank_user_graph": pagerank_user_graph,
    "bm25_doc_scores": bm25_doc_scores,
    "grouped_heavy_hitters": grouped_heavy_hitters,
}


ORACLE_SQL = {
    "cdc_lww_latest": f"""
        WITH ev AS (
          SELECT user_id, {OP_SQL} AS op, event_type, value, ts,
                 event_id AS lsn
          FROM events),
        w AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                        ORDER BY ts DESC, lsn DESC) AS rn FROM ev)
        SELECT user_id, op, event_type, value, ts, lsn FROM w WHERE rn = 1
    """,
    "cdc_apply_iud": f"""
        WITH ev AS (
          SELECT user_id, {OP_SQL} AS op, event_type, value, ts,
                 event_id AS lsn
          FROM events),
        w AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                        ORDER BY ts DESC, lsn DESC) AS rn FROM ev)
        SELECT user_id, op, event_type, value, ts, lsn FROM w
        WHERE rn = 1 AND op <> 'D'
    """,
    "cdc_watermark": """
        SELECT MAX(event_id) AS max_lsn, MIN(event_id) AS min_lsn,
               MAX(ts) AS max_ts, COUNT(*) AS n_events FROM events
    """,
    "cdc_batch_counters": f"""
        SELECT {OP_SQL} AS op, COUNT(*) AS n FROM events GROUP BY 1
    """,
    "cdc_dedup_redelivery": """
        WITH doubled AS (
          SELECT event_id, user_id, ts FROM events
          UNION ALL SELECT event_id, user_id, ts FROM events)
        SELECT DISTINCT event_id, user_id, ts FROM doubled
    """,
    "savepoint_next_batch": """
        SELECT event_id, ts FROM events
        WHERE ts > TIMESTAMP '2024-01-05 00:00:00'
        ORDER BY ts, event_id LIMIT 1 OFFSET 99
    """,
    "filter_project_lineitem": """
        SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
        WHERE l_returnflag <> 'R' AND l_quantity > 40
    """,
    "tombstone_filter": f"""
        SELECT event_id, user_id, event_type, {OP_SQL} AS op FROM events
        WHERE {OP_SQL} <> 'D'
    """,
    "inlist_filter": """
        SELECT p_partkey, p_size, p_brand FROM part
        WHERE p_size IN (1, 5, 9, 13, 21)
    """,
    "trim_normalize": """
        SELECT c_custkey, TRIM(c_name) AS c_name_trimmed FROM customer
    """,
    "opcode_recode": f"""
        SELECT {OP_SQL} AS op, event_type, COUNT(*) AS n
        FROM events GROUP BY 1, 2
    """,
    "join_broadcast_dims": """
        SELECT r_name, COUNT(*) AS n_customers,
               ROUND(SUM(c_acctbal), 2) AS sum_acctbal
        FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name
    """,
    "join_large_rev_by_priority": """
        WITH r AS (
          SELECT l_orderkey,
                 SUM(l_extendedprice * (1 - l_discount)) AS rev
          FROM lineitem GROUP BY 1)
        SELECT o_orderpriority, COUNT(*) AS n_orders,
               ROUND(SUM(rev), 2) AS sum_rev
        FROM r JOIN orders ON l_orderkey = o_orderkey
        GROUP BY o_orderpriority
    """,
    "hydration_lookup": """
        SELECT o_orderkey, o_totalprice, c_name, c_mktsegment
        FROM orders LEFT JOIN customer ON o_custkey = c_custkey
        WHERE o_totalprice > 400000.0
    """,
    "merge_upsert_join": f"""
        WITH ev AS (
          SELECT user_id, {OP_SQL} AS op, value, ts, event_id FROM events),
        w AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                        ORDER BY ts DESC, event_id DESC) AS rn FROM ev)
        SELECT w.user_id, w.op, w.value, c.c_mktsegment
        FROM w LEFT JOIN customer c ON w.user_id = c.c_custkey
        WHERE w.rn = 1
    """,
    "agg_pricing_summary": """
        SELECT l_returnflag, l_linestatus,
               ROUND(SUM(l_quantity), 2) AS sum_qty,
               ROUND(SUM(l_extendedprice), 2) AS sum_base,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc,
               COUNT(*) AS n
        FROM lineitem GROUP BY l_returnflag, l_linestatus
    """,
    "distinct_keys": "SELECT DISTINCT user_id FROM events",
    "value_histogram": f"""
        SELECT FLOOR(value / {HIST_BIN_WIDTH})::BIGINT AS bin,
               COUNT(*) AS n
        FROM events GROUP BY 1
    """,
    "count_consumed": "SELECT COUNT(*) AS n_rows FROM lineitem",
    "exact_quantiles_price": """
        SELECT quantile_disc(l_extendedprice, 0.25) AS p25,
               quantile_disc(l_extendedprice, 0.50) AS p50,
               quantile_disc(l_extendedprice, 0.90) AS p90,
               quantile_disc(l_extendedprice, 0.99) AS p99
        FROM lineitem
    """,
    "window_running_agg": """
        SELECT event_id, user_id,
               ROW_NUMBER() OVER w AS rn,
               CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT)) OVER w
                    AS BIGINT) AS run_cents,
               COALESCE(epoch_us(ts) - LAG(epoch_us(ts)) OVER w, 0)
                   AS delta_us
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS UNBOUNDED PRECEDING)
    """,
    "json_extract_props": """
        SELECT event_id,
               CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        FROM events
    """,
    "pivot_revenue": """
        SELECT l_linestatus,
               CAST(SUM(CASE WHEN l_returnflag = 'A'
                    THEN CAST(FLOOR(l_extendedprice * 100) AS BIGINT)
                    ELSE 0 END) AS BIGINT) AS a_cents,
               CAST(SUM(CASE WHEN l_returnflag = 'N'
                    THEN CAST(FLOOR(l_extendedprice * 100) AS BIGINT)
                    ELSE 0 END) AS BIGINT) AS n_cents,
               CAST(SUM(CASE WHEN l_returnflag = 'R'
                    THEN CAST(FLOOR(l_extendedprice * 100) AS BIGINT)
                    ELSE 0 END) AS BIGINT) AS r_cents,
               COUNT(*) AS n_rows
        FROM lineitem GROUP BY 1
    """,
    "grouped_topk_events": """
        SELECT event_id, event_type, value,
               CAST(ROW_NUMBER() OVER (PARTITION BY event_type
                    ORDER BY value DESC, event_id) AS BIGINT) AS rk
        FROM events
        QUALIFY rk <= 3
    """,
    "rollup_revenue": """
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(FLOOR(l_extendedprice * 100) AS BIGINT))
                    AS BIGINT) AS cents,
               COUNT(*) AS n
        FROM lineitem
        GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    "cube_revenue": """
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(FLOOR(l_extendedprice * 100) AS BIGINT))
                    AS BIGINT) AS cents,
               COUNT(*) AS n
        FROM lineitem
        GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    "string_agg_order_lines": """
        SELECT l_orderkey,
               string_agg(CAST(l_linenumber AS VARCHAR), ','
                          ORDER BY l_linenumber) AS lines,
               COUNT(*) AS n_lines
        FROM lineitem GROUP BY l_orderkey
    """,
    "window_rank_functions": """
        SELECT event_id, user_id,
               CAST(RANK() OVER (PARTITION BY user_id
                    ORDER BY value DESC) AS BIGINT) AS rk,
               CAST(DENSE_RANK() OVER (PARTITION BY user_id
                    ORDER BY value DESC) AS BIGINT) AS drk,
               CAST(NTILE(4) OVER w AS BIGINT) AS nt,
               LEAD(value) OVER w AS lead_value
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY value DESC, event_id)
    """,
    "gapfill_daily_counts": """
        WITH d AS (SELECT event_type, strftime(ts, '%Y-%m-%d') AS day
                   FROM events),
        c AS (SELECT event_type, day, COUNT(*) AS n FROM d GROUP BY 1, 2),
        days AS (SELECT strftime(unnest(generate_series(
                     CAST((SELECT min(day) FROM d) AS DATE),
                     CAST((SELECT max(day) FROM d) AS DATE),
                     INTERVAL 1 DAY)), '%Y-%m-%d') AS day),
        types AS (SELECT DISTINCT event_type FROM events)
        SELECT t.event_type, dy.day, COALESCE(c.n, 0) AS n
        FROM types t CROSS JOIN days dy
        LEFT JOIN c ON c.event_type = t.event_type AND c.day = dy.day
    """,
    "regexp_extract_all_tokens": """
        WITH m AS (SELECT doc_id,
                          list_filter(regexp_extract_all(text, '[a-z]+'),
                                      x -> length(x) >= 8) AS toks
                   FROM documents)
        SELECT doc_id,
               CAST(generate_subscripts(toks, 1) - 1 AS BIGINT) AS match_idx,
               unnest(toks) AS token
        FROM m
    """,
    "fuzzy_pairs_edit1": """
        SELECT a.c_custkey AS id_a, b.c_custkey AS id_b
        FROM customer a JOIN customer b ON a.c_custkey < b.c_custkey
        WHERE levenshtein(a.c_name, b.c_name) <= 1
    """,
    "fuzzy_pairs_edit2": """
        SELECT a.c_custkey AS id_a, b.c_custkey AS id_b
        FROM customer a JOIN customer b ON a.c_custkey < b.c_custkey
        WHERE levenshtein(a.c_name, b.c_name) <= 2
    """,
    "fuzzy_name_clusters": """
        WITH RECURSIVE p AS (
          SELECT a.c_custkey AS u0, b.c_custkey AS v0
          FROM customer a JOIN customer b ON a.c_custkey < b.c_custkey
          WHERE levenshtein(a.c_name, b.c_name) <= 1),
        e AS (SELECT u0 AS u, v0 AS v FROM p UNION SELECT v0, u0 FROM p),
        walk(u, label) AS (
          SELECT u, u FROM (SELECT DISTINCT u FROM e)
          UNION
          SELECT e.u, walk.label FROM e JOIN walk ON e.v = walk.u)
        SELECT u AS cust_id, MIN(label) AS cluster_id FROM walk GROUP BY u
    """,
    "set_ops_keys": """
        WITH e AS (SELECT DISTINCT user_id AS k FROM events),
             c AS (SELECT DISTINCT c_custkey AS k FROM customer)
        SELECT k, 'both' AS membership
        FROM (SELECT k FROM e INTERSECT SELECT k FROM c)
        UNION ALL
        SELECT k, 'left_only'
        FROM (SELECT k FROM e EXCEPT SELECT k FROM c)
        UNION ALL
        SELECT k, 'right_only'
        FROM (SELECT k FROM c EXCEPT SELECT k FROM e)
    """,
    "redact_numbers": """
        SELECT event_id,
               regexp_replace(props, '[0-9]{2,}', '#', 'g')
                   AS props_redacted
        FROM events
    """,
    "type_token_ratio": """
        SELECT doc_id,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
               CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT)
                   AS n_distinct
        FROM documents
    """,
    "funnel_signup_purchase": """
        WITH s AS (SELECT user_id, min(ts) AS signup_ts FROM events
                   WHERE event_type = 'signup' GROUP BY 1),
        p AS (SELECT e.user_id, min(e.ts) AS purchase_ts
              FROM events e JOIN s ON e.user_id = s.user_id
              WHERE e.event_type = 'purchase' AND e.ts > s.signup_ts
              GROUP BY 1)
        SELECT s.user_id, s.signup_ts, p.purchase_ts,
               epoch_us(p.purchase_ts) - epoch_us(s.signup_ts) AS gap_us
        FROM s JOIN p ON s.user_id = p.user_id
    """,
    "window_distribution_functions": """
        SELECT event_id, user_id,
               percent_rank() OVER w AS pr,
               cume_dist() OVER w AS cd
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY value)
    """,
    "embedding_dim_stats": """
        SELECT idx, COUNT(*) AS n,
               CAST(SUM(CAST(FLOOR(CAST(v AS DOUBLE) * 1000000) AS BIGINT))
                    AS BIGINT) AS s
        FROM (SELECT unnest(embedding) AS v,
                     CAST(generate_subscripts(embedding, 1) - 1 AS BIGINT)
                         AS idx
              FROM embeddings)
        GROUP BY idx
    """,
    "decontaminate_against_benchmark": f"""
        WITH words AS (SELECT doc_id, string_split(text, ' ') AS w
                       FROM documents),
        sh AS (SELECT doc_id, array_to_string(w[i:i+{DECON_N - 1}], ' ') AS g
               FROM words,
                    UNNEST(generate_series(1,
                        greatest(len(w) - {DECON_N - 1}, 0))) t(i)),
        bench AS (SELECT DISTINCT g FROM sh
                  WHERE doc_id < {DECON_BENCH_MAX}),
        flags AS (SELECT s.doc_id, COUNT(b.g) > 0 AS contaminated
                  FROM sh s LEFT JOIN bench b USING (g)
                  WHERE s.doc_id >= {DECON_BENCH_MAX} GROUP BY s.doc_id)
        SELECT d.doc_id, COALESCE(f.contaminated, FALSE) AS contaminated
        FROM documents d LEFT JOIN flags f USING (doc_id)
        WHERE d.doc_id >= {DECON_BENCH_MAX}
    """,
    "dup_ngram_fraction": """
        WITH words AS (SELECT doc_id, string_split(text, ' ') AS w
                       FROM documents),
        sh AS (SELECT doc_id, array_to_string(w[i:i+2], ' ') AS g
               FROM words,
                    UNNEST(generate_series(1, greatest(len(w) - 2, 0))) t(i)),
        agg AS (SELECT doc_id, COUNT(*) AS n_grams,
                       COUNT(DISTINCT g) AS n_distinct
                FROM sh GROUP BY 1)
        SELECT d.doc_id,
               COALESCE(a.n_grams, 0) AS n_grams,
               COALESCE(a.n_distinct, 0) AS n_distinct,
               CASE WHEN COALESCE(a.n_grams, 0) = 0 THEN 0.0
                    ELSE CAST(a.n_grams - a.n_distinct AS DOUBLE)
                         / a.n_grams END AS dup_frac
        FROM documents d LEFT JOIN agg a USING (doc_id)
    """,
    "heavy_hitter_users": f"""
        SELECT user_id, COUNT(*) AS n_events
        FROM events
        GROUP BY user_id
        HAVING COUNT(*) * {HH_PHI_DEN} > (SELECT COUNT(*) FROM events)
    """,
    "distinct_users_by_type": """
        SELECT event_type, COUNT(DISTINCT user_id) AS n_users
        FROM events
        GROUP BY event_type
    """,
    "bloom_semi_join_orders": """
        SELECT o_orderkey, o_totalprice
        FROM orders
        WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                             WHERE l_returnflag = 'R')
    """,
    "embedding_neardup_lsh": f"""
        WITH all_vecs AS (
            SELECT vec_id, embedding FROM embeddings
            UNION ALL
            SELECT vec_id + {MIRROR_OFFSET}, embedding FROM embeddings),
        p AS (SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
                     LIST_COSINE_SIMILARITY(
                         CAST(a.embedding AS DOUBLE[]),
                         CAST(b.embedding AS DOUBLE[])) AS s
              FROM all_vecs a JOIN all_vecs b ON a.vec_id < b.vec_id)
        SELECT vec_a, vec_b FROM p WHERE s >= {LSH_NDP_THRESHOLD}
    """,
    "median_mode_by_group": """
        WITH c AS (SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS q,
                          COUNT(*) AS cnt
                   FROM lineitem GROUP BY l_returnflag, q),
        tot AS (SELECT l_returnflag, CAST(SUM(cnt) AS BIGINT) AS n
                FROM c GROUP BY l_returnflag),
        cum AS (SELECT c.l_returnflag, q, cnt, n,
                       SUM(cnt) OVER (PARTITION BY c.l_returnflag
                                      ORDER BY q) AS cumc
                FROM c JOIN tot USING (l_returnflag)),
        med AS (SELECT l_returnflag, MIN(q) AS median_qty FROM cum
                WHERE cumc >= (n + 1) // 2 GROUP BY l_returnflag),
        mode AS (SELECT l_returnflag, q AS mode_qty FROM c
                 QUALIFY ROW_NUMBER() OVER (PARTITION BY l_returnflag
                                            ORDER BY cnt DESC, q ASC) = 1)
        SELECT med.l_returnflag, median_qty, mode_qty, n
        FROM med JOIN mode USING (l_returnflag) JOIN tot USING (l_returnflag)
    """,
    "tfidf_top_terms": f"""
        WITH w AS (SELECT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS term
                   FROM documents),
        tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM w
               GROUP BY doc_id, term),
        df AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM w
               GROUP BY term),
        s AS (SELECT tf.doc_id, tf.term,
                     CAST(tf.tf AS DOUBLE) / CAST(df.df AS DOUBLE) AS score
              FROM tf JOIN df USING (term)),
        r AS (SELECT doc_id, term, score,
                     ROW_NUMBER() OVER (PARTITION BY doc_id
                                        ORDER BY score DESC, term ASC)
                         AS rank
              FROM s)
        SELECT doc_id, term, rank, score FROM r WHERE rank <= {TFIDF_TOP_K}
    """,
    "stats_moments_by_group": """
        WITH s AS (
            SELECT l_returnflag,
                   COUNT(*) AS n,
                   SUM(CAST(l_quantity AS BIGINT)) AS sq,
                   SUM(CAST(l_quantity AS BIGINT)
                       * CAST(l_quantity AS BIGINT)) AS sqq,
                   SUM(CAST(ROUND(l_discount * 100) AS BIGINT)) AS sd,
                   SUM(CAST(ROUND(l_discount * 100) AS BIGINT)
                       * CAST(ROUND(l_discount * 100) AS BIGINT)) AS sdd,
                   SUM(CAST(l_quantity AS BIGINT)
                       * CAST(ROUND(l_discount * 100) AS BIGINT)) AS sqd
            FROM lineitem GROUP BY l_returnflag)
        SELECT l_returnflag, n,
               CAST(sq AS DOUBLE) / CAST(n AS DOUBLE) AS mean_qty,
               SQRT(CAST(n * sqq - sq * sq AS DOUBLE)
                    / CAST(n * (n - 1) AS DOUBLE)) AS stddev_qty,
               CAST(n * sqd - sq * sd AS DOUBLE)
                   / SQRT(CAST((n * sqq - sq * sq)
                               * (n * sdd - sd * sd) AS DOUBLE))
                   AS corr_qty_disc
        FROM s
    """,
    "semi_anti_join_orders": """
        SELECT o_orderkey, o_orderpriority,
               o_orderkey IN (SELECT l_orderkey FROM lineitem
                              WHERE l_returnflag = 'R') AS has_return
        FROM orders
    """,
    "events_window_agg": """
        SELECT user_id, DATE_TRUNC('day', ts) AS day, COUNT(*) AS n,
               ROUND(SUM(value), 2) AS sum_value
        FROM events GROUP BY 1, 2
    """,
    "topk_hot_keys": """
        SELECT user_id, COUNT(*) AS n FROM events
        GROUP BY user_id ORDER BY n DESC, user_id LIMIT 10
    """,
    "stable_order_head": """
        SELECT event_id, ts, user_id FROM events
        ORDER BY ts, event_id LIMIT 200
    """,
    "union_change_sources": """
        SELECT event_id, user_id, event_type FROM events
        WHERE event_type = 'click'
        UNION ALL
        SELECT event_id, user_id, event_type FROM events
        WHERE event_type = 'error'
    """,
}

_MARKERS_SQL = ", ".join(f"'{w}'" for w in
                         ("the", "a", "of", "and", "to", "in", "is"))
_NW_SQL = "LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) + 1"
_NSTOP_SQL = (f"LEN(LIST_FILTER(STRING_SPLIT(text, ' '), "
              f"x -> x IN ({_MARKERS_SQL})))")

ORACLE_SQL.update({
    "dedup_exact_text": """
        SELECT MIN(doc_id) AS doc_id, COUNT(*) AS n_copies
        FROM documents GROUP BY text
    """,
    "text_quality": f"""
        SELECT doc_id,
               LENGTH(text) AS n_chars_calc,
               {_NW_SQL} AS n_words,
               {_NSTOP_SQL} AS n_stopwords,
               ROUND({_NSTOP_SQL}::DOUBLE / ({_NW_SQL}), 4) AS stopword_ratio
        FROM documents
    """,
    "token_counts_by_lang": f"""
        SELECT lang, SUM({_NW_SQL})::BIGINT AS n_tokens,
               COUNT(*) AS n_docs
        FROM documents GROUP BY lang
    """,
    "lang_id_heuristic": f"""
        SELECT doc_id, lang,
               CASE WHEN {_NSTOP_SQL} >= 3 THEN 'en' ELSE 'other' END
                   AS lang_pred
        FROM documents
    """,
    "doc_fingerprint": "SELECT doc_id, MD5(text) AS fp FROM documents",
    "neardup_clusters": f"""
        WITH RECURSIVE d AS (
          SELECT doc_id, LIST_DISTINCT(STRING_SPLIT(text, ' ')) AS w
          FROM documents),
        p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
              FROM d a JOIN d b ON a.doc_id < b.doc_id
              WHERE LEN(LIST_INTERSECT(a.w, b.w))::DOUBLE
                    / (LEN(a.w) + LEN(b.w) - LEN(LIST_INTERSECT(a.w, b.w)))
                    >= {JACCARD_THRESHOLD}),
        e AS (SELECT doc_a AS u, doc_b AS v FROM p
              UNION SELECT doc_b, doc_a FROM p),
        walk(u, label) AS (
          SELECT u, u FROM (SELECT DISTINCT u FROM e)
          UNION
          SELECT e.u, walk.label FROM e JOIN walk ON e.v = walk.u)
        SELECT u AS doc_id, MIN(label) AS cluster_id FROM walk GROUP BY u
    """,
    "ngram_jaccard_pairs": f"""
        WITH d AS (SELECT doc_id,
                          LIST_DISTINCT(STRING_SPLIT(text, ' ')) AS w
                   FROM documents),
        p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                     LEN(LIST_INTERSECT(a.w, b.w))::DOUBLE
                     / (LEN(a.w) + LEN(b.w) - LEN(LIST_INTERSECT(a.w, b.w)))
                         AS jaccard
              FROM d a JOIN d b ON a.doc_id < b.doc_id)
        SELECT doc_a, doc_b, jaccard FROM p
        WHERE jaccard >= {JACCARD_THRESHOLD}
    """,
    "minhash_lsh_dups": f"""
        WITH d AS (SELECT doc_id, text, STRING_SPLIT(text, ' ') AS w
                   FROM documents),
        s AS (SELECT doc_id,
                     CASE WHEN LEN(w) >= 3 THEN LIST_DISTINCT(
                            [CONCAT_WS(' ', w[i], w[i+1], w[i+2])
                             FOR i IN RANGE(1, LEN(w) - 1)])
                          ELSE [text] END AS sh
              FROM d),
        p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                     LEN(LIST_INTERSECT(a.sh, b.sh))::DOUBLE
                     / (LEN(a.sh) + LEN(b.sh) - LEN(LIST_INTERSECT(a.sh, b.sh)))
                         AS jaccard
              FROM s a JOIN s b ON a.doc_id < b.doc_id)
        SELECT doc_a, doc_b, jaccard FROM p
        WHERE jaccard >= {JACCARD_THRESHOLD}
    """,
    "ann_cosine_topk": f"""
        WITH q AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qe
                   FROM embeddings WHERE vec_id < {ANN_N_QUERIES}),
        s AS (SELECT q.qid, e.vec_id,
                     LIST_COSINE_SIMILARITY(CAST(e.embedding AS DOUBLE[]),
                                            q.qe) AS sim
              FROM embeddings e CROSS JOIN q),
        r AS (SELECT qid, vec_id,
                     ROW_NUMBER() OVER (PARTITION BY qid
                                        ORDER BY sim DESC, vec_id) AS rank
              FROM s)
        SELECT qid AS query_id, vec_id, rank FROM r WHERE rank <= {ANN_K}
    """,
    "paged_source_demo": "SELECT c_custkey, c_name FROM customer",
    "asof_join_latest_event": """
        WITH j AS (
          SELECT e.event_id AS lsn, e.user_id, o.o_orderkey, o.o_orderdate,
                 ROW_NUMBER() OVER (PARTITION BY e.event_id
                                    ORDER BY o.o_orderdate DESC,
                                             o.o_orderkey DESC) AS rn
          FROM events e JOIN orders o
            ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts)
        SELECT lsn, user_id, o_orderkey, o_orderdate FROM j WHERE rn = 1
    """,
    "range_join_followups": """
        SELECT l.event_id AS a_event, r.event_id AS b_event,
               l.user_id AS user_id
        FROM events l JOIN events r
          ON r.user_id = l.user_id
         AND r.ts > l.ts AND r.ts <= l.ts + INTERVAL 1 HOUR
    """,
    "sessionize_events": """
        WITH x AS (
          SELECT user_id, ts, event_id,
                 CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id
                                              ORDER BY ts, event_id)
                          > INTERVAL 30 MINUTE
                      THEN 1 ELSE 0 END AS brk
          FROM events),
        s AS (SELECT *, SUM(brk) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id
                                       ROWS UNBOUNDED PRECEDING) AS session_id
              FROM x)
        SELECT user_id, session_id::BIGINT AS session_id, COUNT(*) AS n,
               MIN(ts) AS session_start, MAX(ts) AS session_end
        FROM s GROUP BY 1, 2
    """,
    "clean_corpus": f"""
        WITH RECURSIVE g AS (
          SELECT doc_id, text, {_NW_SQL} AS n_words FROM documents
          WHERE {_NW_SQL} >= {CLEAN_MIN_WORDS}
            AND {_NSTOP_SQL} >= {CLEAN_MIN_STOPWORDS}),
        e AS (SELECT MIN(doc_id) AS doc_id FROM g GROUP BY text),
        s AS (SELECT g.doc_id, g.text, g.n_words
              FROM g JOIN e ON g.doc_id = e.doc_id),
        d0 AS (SELECT doc_id, text, STRING_SPLIT(text, ' ') AS w FROM s),
        d AS (SELECT doc_id,
                     CASE WHEN LEN(w) >= 3 THEN LIST_DISTINCT(
                            [CONCAT_WS(' ', w[i], w[i+1], w[i+2])
                             FOR i IN RANGE(1, LEN(w) - 1)])
                          ELSE [text] END AS w
              FROM d0),
        p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
              FROM d a JOIN d b ON a.doc_id < b.doc_id
              WHERE LEN(LIST_INTERSECT(a.w, b.w))::DOUBLE
                    / (LEN(a.w) + LEN(b.w) - LEN(LIST_INTERSECT(a.w, b.w)))
                    >= {JACCARD_THRESHOLD}),
        ed AS (SELECT doc_a AS u, doc_b AS v FROM p
               UNION SELECT doc_b, doc_a FROM p),
        walk(u, label) AS (
          SELECT u, u FROM (SELECT DISTINCT u FROM ed)
          UNION
          SELECT ed.u, walk.label FROM ed JOIN walk ON ed.v = walk.u),
        cl AS (SELECT u AS doc_id, MIN(label) AS cluster_id
               FROM walk GROUP BY u)
        SELECT s.doc_id, s.n_words FROM s
        LEFT JOIN cl ON s.doc_id = cl.doc_id
        WHERE cl.cluster_id IS NULL OR cl.cluster_id = s.doc_id
    """,
    "sample_by_token_budget": f"""
        WITH x AS (
          SELECT doc_id, lang, {_NW_SQL} AS n_words,
                 SUM({_NW_SQL}) OVER (
                   PARTITION BY lang
                   ORDER BY {_NW_SQL} DESC, doc_id
                   ROWS UNBOUNDED PRECEDING) AS cum
          FROM documents)
        SELECT doc_id, lang, n_words FROM x
        WHERE cum <= {TOKEN_BUDGET_PER_LANG}
    """,
    "train_val_split": """
        SELECT doc_id,
               CASE WHEN ('0x' || SUBSTR(MD5(text), 1, 8))::UBIGINT % 20 = 0
                    THEN 'val' ELSE 'train' END AS split
        FROM documents
    """,
    "deterministic_shuffle": """
        SELECT doc_id,
               ROW_NUMBER() OVER (ORDER BY MD5(doc_id || '|' || text)) - 1
                   AS rank
        FROM documents
    """,
    "events_hopping_window": """
        WITH w AS (
          SELECT user_id, value,
                 TIME_BUCKET(INTERVAL '30 minutes', ts) AS window_start
          FROM events
          UNION ALL
          SELECT user_id, value,
                 TIME_BUCKET(INTERVAL '30 minutes', ts)
                   - INTERVAL '30 minutes'
          FROM events)
        SELECT user_id, window_start, COUNT(*) AS n,
               ROUND(SUM(value), 2) AS sum_value
        FROM w GROUP BY 1, 2
    """,
    "top_ngrams": f"""
        WITH d AS (SELECT STRING_SPLIT(text, ' ') AS ws FROM documents),
        g AS (SELECT UNNEST([CONCAT_WS(' ', ws[i], ws[i+1])
                             FOR i IN RANGE(1, LEN(ws))]) AS ngram FROM d)
        SELECT ngram, COUNT(*) AS n FROM g
        GROUP BY ngram ORDER BY n DESC, ngram LIMIT {TOP_NGRAMS_K}
    """,
    "stratified_sample": f"""
        SELECT doc_id, lang FROM documents
        WHERE ('0x' || SUBSTR(MD5(text), 1, 8))::UBIGINT % 100 <
              CASE WHEN lang = 'en' THEN {STRAT_RATE["en"]}
                   ELSE {STRAT_DEFAULT_RATE} END
    """,
    "embedding_neardup_pairs": f"""
        WITH p AS (SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
                          LIST_COSINE_SIMILARITY(
                              CAST(a.embedding AS DOUBLE[]),
                              CAST(b.embedding AS DOUBLE[])) AS s
                   FROM embeddings a JOIN embeddings b
                     ON a.vec_id < b.vec_id)
        SELECT vec_a, vec_b FROM p WHERE s >= {COSINE_NEARDUP_THRESHOLD}
    """,
    "weighted_sample_by_length": """
        SELECT doc_id, n_chars FROM documents
        WHERE ('0x' || SUBSTR(MD5(text), 1, 8))::UBIGINT % 1000 < n_chars
    """,
    "grouped_quantiles_price": """
        SELECT o_orderpriority,
               QUANTILE_DISC(o_totalprice, 0.50) AS p50,
               QUANTILE_DISC(o_totalprice, 0.90) AS p90,
               QUANTILE_DISC(o_totalprice, 0.99) AS p99
        FROM orders GROUP BY o_orderpriority
    """,
    "subset_containment_pairs": f"""
        WITH d AS (SELECT doc_id,
                          LIST_DISTINCT(STRING_SPLIT(text, ' ')) AS w
                   FROM documents),
        f AS (SELECT * FROM d WHERE LEN(w) >= {CONTAIN_MIN_WORDS})
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               LEN(a.w)::BIGINT AS n_words_a,
               LEN(LIST_INTERSECT(a.w, b.w))::DOUBLE / LEN(a.w)
                   AS containment
        FROM f a JOIN d b ON a.doc_id <> b.doc_id
        WHERE LEN(LIST_INTERSECT(a.w, b.w)) >= 1.0 * LEN(a.w)
    """,
    "argminmax_user_events": """
        WITH w AS (
          SELECT user_id, event_type, value,
                 ROW_NUMBER() OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS rn_a,
                 ROW_NUMBER() OVER (PARTITION BY user_id
                                    ORDER BY ts DESC, event_id DESC) AS rn_d
          FROM events)
        SELECT user_id,
               MAX(CASE WHEN rn_a = 1 THEN event_type END) AS first_type,
               MAX(CASE WHEN rn_d = 1 THEN event_type END) AS last_type,
               MAX(CASE WHEN rn_d = 1 THEN value END) AS last_value
        FROM w GROUP BY user_id
    """,
    "percentile_cont_by_group": """
        SELECT l_returnflag,
               QUANTILE_CONT(l_quantity, 0.25) AS p25,
               QUANTILE_CONT(l_quantity, 0.50) AS p50,
               QUANTILE_CONT(l_quantity, 0.75) AS p75
        FROM lineitem GROUP BY l_returnflag
    """,
    "hopping_distinct_users": """
        WITH w AS (
          SELECT user_id,
                 TIME_BUCKET(INTERVAL '30 minutes', ts) AS window_start
          FROM events
          UNION ALL
          SELECT user_id,
                 TIME_BUCKET(INTERVAL '30 minutes', ts)
                   - INTERVAL '30 minutes'
          FROM events)
        SELECT window_start, COUNT(DISTINCT user_id) AS n_users
        FROM w GROUP BY 1
    """,
    "window_frame_functions": """
        SELECT event_id, user_id,
               LAG(value) OVER w AS lag_value,
               MAX(value) OVER (w ROWS BETWEEN 6 PRECEDING
                                AND CURRENT ROW) AS roll_max,
               MIN(value) OVER (w ROWS BETWEEN 6 PRECEDING
                                AND CURRENT ROW) AS roll_min
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    "retention_cohorts": """
        WITH uw AS (SELECT DISTINCT user_id,
                           CAST(date_trunc('week', ts) AS DATE) AS week
                    FROM events),
        coh AS (SELECT user_id, min(week) AS cohort FROM uw GROUP BY 1)
        SELECT strftime(coh.cohort, '%Y-%m-%d') AS cohort_week,
               CAST((uw.week - coh.cohort) // 7 AS BIGINT) AS week_offset,
               COUNT(*) AS n_users
        FROM uw JOIN coh USING (user_id)
        GROUP BY 1, 2
    """,
    "daily_count_anomalies": """
        WITH c AS (SELECT strftime(ts, '%Y-%m-%d') AS day, COUNT(*) AS n
                   FROM events GROUP BY 1),
        s AS (SELECT COUNT(*) AS nd, SUM(n) AS sn, SUM(n * n) AS sn2
              FROM c),
        zz AS (SELECT c.day, c.n,
                      (c.n - CAST(sn AS DOUBLE) / nd)
                        / sqrt((sn2 - CAST(sn AS DOUBLE) * sn / nd) / nd)
                          AS z
               FROM c, s)
        SELECT day, n, z FROM zz WHERE abs(z) > 2.0
    """,
    "doc_repetition_signals": """
        WITH words AS (SELECT doc_id, string_split(text, ' ') AS w
                       FROM documents),
        g AS (SELECT doc_id, array_to_string(w[i:i+1], ' ') AS g2
              FROM words,
                   UNNEST(generate_series(1, greatest(len(w) - 1, 0))) t(i)),
        c AS (SELECT doc_id, g2, COUNT(*) AS c FROM g GROUP BY 1, 2),
        m AS (SELECT doc_id, MAX(c) AS mx, SUM(c) AS n2 FROM c GROUP BY 1)
        SELECT doc_id, CAST(n2 AS BIGINT) AS n_2grams,
               CAST(mx AS BIGINT) AS top2_count,
               CAST(mx AS DOUBLE) / n2 AS top2_share
        FROM m
    """,
    "unigram_commonness": """
        WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
                   FROM documents),
        f AS (SELECT term, COUNT(*) AS c FROM w GROUP BY 1),
        s AS (SELECT w.doc_id, SUM(f.c) AS sc, COUNT(*) AS n
              FROM w JOIN f USING (term) GROUP BY 1)
        SELECT doc_id, CAST(n AS BIGINT) AS n_tokens,
               CAST(sc AS BIGINT) AS sum_freq,
               CAST(sc AS DOUBLE) / n AS mean_freq
        FROM s
    """,
    "keyword_search_indexed": """
        SELECT doc_id FROM documents
        WHERE list_contains(string_split(text, ' '), 'dup')
          AND list_contains(string_split(text, ' '), 'join')
    """,
    "chunk_documents": """
        WITH w AS (SELECT doc_id, string_split(text, ' ') AS w
                   FROM documents)
        SELECT doc_id,
               CAST((i - 1) // 6 AS BIGINT) AS chunk_idx,
               array_to_string(w[i:i+7], ' ') AS chunk_text,
               CAST(least(len(w) - i + 1, 8) AS BIGINT) AS n_words
        FROM w, UNNEST(generate_series(1, greatest(len(w), 1), 6)) t(i)
    """,
    "pack_documents_offsets": """
        WITH w AS (SELECT doc_id,
                     CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words
                   FROM documents),
        o AS (SELECT doc_id, n_words,
                CAST(COALESCE(SUM(n_words) OVER (ORDER BY doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  AS BIGINT) AS off
              FROM w)
        SELECT doc_id, n_words, off AS stream_offset,
               CAST(off // 256 AS BIGINT) AS bin_id
        FROM o
    """,
    "pagerank_user_graph": _pagerank_sql(),
    "bm25_doc_scores": _bm25_sql(),
    "grouped_heavy_hitters": f"""
        WITH c AS (SELECT event_type, user_id, COUNT(*) AS n
                   FROM events GROUP BY 1, 2),
        t AS (SELECT event_type, SUM(n) AS tot, COUNT(*) AS du
              FROM c GROUP BY 1)
        SELECT c.event_type, c.user_id, CAST(c.n AS BIGINT) AS n
        FROM c JOIN t USING (event_type)
        WHERE c.n * {HH_MEAN_DEN} * t.du > {HH_MEAN_NUM} * t.tot
    """,
})
