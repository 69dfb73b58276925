"""cwds_jobs_ray — a from-scratch, Ray-Data-native CDC / incremental-ingest engine.

Re-expresses the capabilities of the reference CDC batch-job engine
(LeonidMarushevskyi/cwds-jobs: savepoint-driven change-data-capture from a
replication shadow table into a keyed, idempotent sink — see
/root/reference/jobs-common/src/main/java/gov/ca/cwds/jobs/common/batch/BatchProcessor.java:43-67
for the reference's batch/savepoint loop) as idiomatic ``ray.data.Dataset``
pipelines over zero-copy Arrow batches:

- WAL/binlog tail (Parquet change segments) -> ``read_parquet``
- per-block combine (local LWW pre-reduce)  -> ``map_batches`` (pyarrow)
- key co-location                           -> ``groupby(part)`` hash shuffle
- keyed upsert/delete merge (LWW on ts,lsn) -> per-partition merge vs base Parquet
- exactly-once publish                      -> versioned files + atomic manifest swap

Nothing is ported: the reference is Java/Hibernate/Elasticsearch; this engine
derives only the *semantics* (watermarks, I/U/D application, initial-vs-
incremental modes, crash resume, atomic publish) from it.
"""

__version__ = "0.3.0"

# lazy public API (keeps bare import Ray-free)
_API = {
    "CDCJob": ("pipelines.cdc", "CDCJob"),
    "promote_to_incremental": ("pipelines.cdc", "promote_to_incremental"),
    "make_export_finalizer": ("pipelines.cdc", "make_export_finalizer"),
    "Manifest": ("state.manifest", "Manifest"),
    "load_config": ("config", "load_config"),
    "wave_group_reduce": ("stages.waves", "wave_group_reduce"),
    "read_paged": ("sources.paged", "read_paged"),
    "read_paged_http": ("sources.paged", "read_paged_http"),
    "HttpPagedSource": ("sources.paged", "HttpPagedSource"),
    "basic_auth": ("sources.paged", "basic_auth"),
}


def __getattr__(name):
    if name in _API:
        import importlib

        mod, attr = _API[name]
        return getattr(importlib.import_module(f".{mod}", __name__), attr)
    raise AttributeError(name)

# Ray provides the parallelism (one task per core); nested thread pools
# inside workers only thrash. Polars reads this at import time — set it
# before any worker imports polars. (Ray already pins OMP/MKL for numpy.)
import os as _os

_os.environ.setdefault("POLARS_MAX_THREADS", "1")

# Retain freed Arrow pages instead of returning them to the OS: this
# sandbox's kernel serializes page faults across processes (see
# BASELINE.md "Scaling analysis"), so re-faulting purged pages is the
# dominant cost under full-node concurrency. Harmless elsewhere.
try:
    import pyarrow as _pa

    _pa.jemalloc_set_decay_ms(-1)
except (ImportError, NotImplementedError):  # pragma: no cover
    pass
