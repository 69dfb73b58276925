"""Driver contract for the graft builder (Ray Data target).

The driver calls ``ray.init`` itself before importing this module:
nothing here (or in the library) calls ``ray.init`` / ``ray.shutdown``.

- ``entry()``: flagship CDC pipeline (WAL replay -> committed lake table) on a
  deterministic transcript workload scaled to sf0.001, returns the final
  table as a Dataset.
- ``queries()``: one callable per implemented operator from SURVEY.md §2
  (plus the training-data operators); each takes sf_dir.
- ``oracle_sql()``: DuckDB-equivalent SQL for every SQL-expressible query.
"""

from __future__ import annotations

import hashlib
import os
import shutil
import sys
from collections.abc import Callable
from typing import Any

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


# ------------------------------------------------------------------ flagship

def _transcript_replay(sf_dir: str):
    """Run the full CDC engine (synth base+WAL -> CDCJob -> committed table)
    at a scale derived from the sf directory. Deterministic; cached per
    scale under /tmp so repeated driver calls don't resynthesize."""
    import pyarrow.parquet as pq

    from cwds_jobs_ray.pipelines.cdc import CDCJob
    from cwds_jobs_ray.synth import WalSpec, synthesize

    n_events = pq.ParquetFile(f"{sf_dir}/events.parquet").metadata.num_rows
    spec = WalSpec(
        seed=42,
        n_convs=max(20, n_events // 50),
        turns_per_conv=6,
        n_events=n_events,
        n_segments=8,
        dup_redelivery_frac=0.05,
        out_of_order_frac=0.10,
        hot_key_frac=0.05,
        schema_v1_segments=2,
    )
    tag = hashlib.md5(repr(spec).encode()).hexdigest()[:10]
    work = f"/tmp/cwds_jobs_ray_cache/replay_{tag}"
    table_dir, wal_dir = f"{work}/table", f"{work}/wal"
    if not os.path.isdir(wal_dir):
        # atomic cache population (interrupted synth must not poison cache)
        tmp = work + ".tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        os.makedirs(tmp, exist_ok=True)
        synthesize(spec, tmp)
        try:
            os.rename(tmp, work)
        except OSError:
            shutil.rmtree(tmp, ignore_errors=True)
    shutil.rmtree(table_dir, ignore_errors=True)
    job = CDCJob(table_dir, wal_dir, num_partitions=16,
                 events_per_batch=2_000_000)
    job.run(base_path=f"{work}/base/base.parquet")
    return job.read_table()


def entry() -> Any:
    """Flagship pipeline at sf0.001 scale; driver checks rows >= 0."""
    return _transcript_replay("/root/testdata/sf0.001")


# ------------------------------------------------------------------ catalog

def queries() -> dict[str, Callable[[str], Any]]:
    from cwds_jobs_ray.queries import QUERIES

    out = dict(QUERIES)
    out["transcript_cdc_replay"] = _transcript_replay
    return out


def oracle_sql() -> dict[str, str]:
    from cwds_jobs_ray.queries import ORACLE_SQL

    return dict(ORACLE_SQL)
