"""Schema evolution beyond the built-in v1/v2 (`tool`) case: brand-new
columns appearing mid-stream and widened integer types, with
``schema_version`` bumping exactly once per change (the reference evolves by
index replacement between runs, ElasticsearchService.java:74-91; we evolve by
Arrow unification + null backfill inside the merges)."""

import os

import pyarrow as pa
import pyarrow.parquet as pq

from cwds_jobs_ray.pipelines.cdc import CDCJob
from cwds_jobs_ray.schema import CHANGE_SCHEMA_V2
from cwds_jobs_ray.state.manifest import Manifest
from cwds_jobs_ray.synth import WalSpec, make_base, make_wal, write_wal_segments

TS = 1_700_000_000_000_000


def _setup(workdir, wal_tables):
    base = make_base(WalSpec(seed=2, n_convs=4, turns_per_conv=3))
    base_path = os.path.join(workdir, "base.parquet")
    pq.write_table(base, base_path)
    wal_dir = os.path.join(workdir, "wal")
    os.makedirs(wal_dir)
    for i, t in enumerate(wal_tables):
        pq.write_table(t, os.path.join(wal_dir, f"segment-{i:05d}.parquet"))
    job = CDCJob(os.path.join(workdir, "table"), wal_dir, num_partitions=4,
                 events_per_batch=1)  # one batch per segment
    return job, base_path


def _v3_table(lsn, text, meta):
    schema = CHANGE_SCHEMA_V2.append(pa.field("meta", pa.string()))
    return pa.table({
        "lsn": pa.array([lsn], pa.int64()),
        "op": ["U"],
        "conv_id": ["c000000"],
        "turn_idx": pa.array([0], pa.int32()),
        "role": ["user"],
        "text": [text],
        "tool": [None],
        "ts": pa.array([TS + lsn * 10**9], pa.timestamp("us")),
        "meta": [meta],
    }, schema=schema)


def test_new_column_appears_midstream(workdir):
    v2 = make_wal(WalSpec(seed=3, n_convs=4, turns_per_conv=3, n_events=5,
                          n_segments=1, frac_delete=0, dup_redelivery_frac=0))
    job, base_path = _setup(workdir, [
        v2, _v3_table(6, "with-meta", "m1"), _v3_table(7, "with-meta-2", "m2")])
    m = job.run(base_path=base_path)

    # v1 schema (no meta) -> bump to v2 when meta arrives -> stays at v2
    assert m.schema_version == 2
    assert "meta" in m.table_columns

    got = job.read_table_arrow()
    assert "meta" in got.column_names
    df = got.to_pandas().set_index(["conv_id", "turn_idx"])
    assert df.loc[("c000000", 0), "text"] == "with-meta-2"
    assert df.loc[("c000000", 0), "meta"] == "m2"
    # rows from before the evolution are null-backfilled
    assert df["meta"].isna().sum() == len(df) - 1


def test_widened_int_type(workdir):
    wide = pa.table({
        "lsn": pa.array([1], pa.int64()),
        "op": ["U"],
        "conv_id": ["c000000"],
        "turn_idx": pa.array([0], pa.int64()),  # widened from int32
        "role": ["user"],
        "text": ["widened"],
        "tool": [None],
        "ts": pa.array([TS + 10**9], pa.timestamp("us")),
    })
    job, base_path = _setup(workdir, [wide])
    m = job.run(base_path=base_path)
    got = job.read_table_arrow()
    df = got.to_pandas().set_index(["conv_id", "turn_idx"])
    assert df.loc[("c000000", 0), "text"] == "widened"
    assert got.num_rows == 12  # 4 convs x 3 turns, one row replaced


def test_schema_version_stable_without_evolution(workdir):
    v2a = make_wal(WalSpec(seed=4, n_convs=4, turns_per_conv=3, n_events=4,
                           n_segments=1, frac_delete=0))
    import pyarrow.compute as pc
    v2b = v2a.set_column(0, "lsn", pc.add(v2a["lsn"], 10))
    job, base_path = _setup(workdir, [v2a, v2b])
    m = job.run(base_path=base_path)
    assert m.schema_version == 1  # two batches, same schema, no bump


def test_added_column_survives_later_batches_without_it(workdir):
    # column added by batch N must survive batch N+1 that lacks it (the
    # committed-schema unification, not static-schema unification)
    v3 = _v3_table(1, "has-meta", "m1")
    v2 = make_wal(WalSpec(seed=5, n_convs=4, turns_per_conv=3, n_events=5,
                          n_segments=1, frac_delete=0, dup_redelivery_frac=0))
    import pyarrow.compute as pc
    v2 = v2.set_column(v2.schema.get_field_index("lsn"), "lsn",
                       pc.add(v2["lsn"], 1))  # lsns 2..6 after the v3 event
    job, base_path = _setup(workdir, [v3, v2])
    m = job.run(base_path=base_path)

    got = job.read_table_arrow()
    assert "meta" in got.column_names
    df = got.to_pandas().set_index(["conv_id", "turn_idx"])
    # the v3 row's meta value survived the later meta-less batch
    if df.loc[("c000000", 0), "text"] == "has-meta":
        assert df.loc[("c000000", 0), "meta"] == "m1"
    else:
        # a v2 event overwrote the row wholesale -> meta is null there,
        # but the COLUMN itself must still exist with correct schema
        assert df["meta"].notna().sum() == 0
    assert m.schema_version == 2  # bumped once, not per batch


def test_read_table_dataset_after_evolution_backfills_untouched_partitions(workdir):
    """A column added by a batch that touched only SOME partitions: the
    Dataset read path must null-backfill the new column for partitions whose
    committed files predate the evolution (they route through merge_on_read
    rather than the plain parquet scan)."""
    v3 = _v3_table(1, "evolved row", "m1")
    job, base_path = _setup(workdir, [v3])
    job.run(base_path=base_path)

    df = (job.read_table(columns=["conv_id", "turn_idx", "text", "meta"])
          .to_pandas()
          .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True))
    assert "meta" in df.columns
    assert len(df) == 12  # 4 convs x 3 turns
    touched = df[(df["conv_id"] == "c000000") & (df["turn_idx"] == 0)]
    assert touched["meta"].tolist() == ["m1"]
    assert df[df["conv_id"] != "c000000"]["meta"].isna().all()
