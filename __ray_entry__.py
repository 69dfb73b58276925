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

def _replay_workload(sf_dir: str) -> str:
    """Synthesize (once, cached under /tmp) the deterministic transcript
    base+WAL workload scaled from ``sf_dir``; return its directory. Shared
    by the Ray replay AND its DuckDB oracle so both sides read the exact
    same parquet bytes."""
    import pyarrow.parquet as pq

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
    if not os.path.isdir(f"{work}/wal"):
        # atomic cache population (interrupted synth must not poison cache)
        tmp = work + ".tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        os.makedirs(tmp, exist_ok=True)
        synthesize(spec, tmp)
        try:
            os.rename(tmp, work)
        except OSError:
            shutil.rmtree(tmp, ignore_errors=True)
    return work


def _transcript_replay(sf_dir: str):
    """Run the full CDC engine (synth base+WAL -> CDCJob -> committed table)
    at a scale derived from the sf directory."""
    from cwds_jobs_ray.pipelines.cdc import CDCJob

    work = _replay_workload(sf_dir)
    table_dir = f"{work}/table"
    shutil.rmtree(table_dir, ignore_errors=True)
    job = CDCJob(table_dir, f"{work}/wal", num_partitions=16,
                 events_per_batch=2_000_000)
    job.run(base_path=f"{work}/base/base.parquet")
    return job.read_table()


# The sf the driver verifies oracle SQL against (its DuckDB gate runs at
# sf=0.01); tools/check_queries.py overrides this to check other scales.
ORACLE_SF_DIR = os.environ.get("CWDS_ORACLE_SF_DIR", "/root/testdata/sf0.01")


def _transcript_replay_oracle_sql() -> str:
    """ANSI-SQL replay of the flagship pipeline over the SAME synthesized
    parquet the engine consumes: dedup verbatim redeliveries by lsn keeping
    the FIRST delivered copy (file order = delivery order), LWW on
    (ts, lsn) per (conv_id, turn_idx), drop tombstone winners — the golden
    end-state assertion pattern of the reference
    (/root/reference/jobs-facilities-cws/src/test/java/gov/ca/cwds/jobs/cals/facility/cws/CwsFacilityJobTest.java:60-134)."""
    work = _replay_workload(ORACLE_SF_DIR)
    return f"""
        WITH wal AS (
          SELECT *, ROW_NUMBER() OVER (
                   PARTITION BY lsn ORDER BY filename, file_row_number
                 ) AS copy_rn
          FROM read_parquet('{work}/wal/*.parquet', union_by_name=true,
                            filename=true, file_row_number=true)),
        ev AS (SELECT conv_id, turn_idx, role, text, tool, ts, lsn, op
               FROM wal WHERE copy_rn = 1),
        base AS (SELECT conv_id, turn_idx, role, text, tool, ts, lsn,
                        'B' AS op
                 FROM read_parquet('{work}/base/base.parquet')),
        allr AS (SELECT * FROM base UNION ALL SELECT * FROM ev),
        w AS (SELECT *, ROW_NUMBER() OVER (
                       PARTITION BY conv_id, turn_idx
                       ORDER BY ts DESC, lsn DESC) AS rn
              FROM allr)
        SELECT conv_id, turn_idx, role, text, tool, ts FROM w
        WHERE rn = 1 AND op <> 'D'
    """


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

    out = dict(ORACLE_SQL)
    out["transcript_cdc_replay"] = _transcript_replay_oracle_sql()
    return out
