"""Checkpoint manifest: the engine's savepoint + atomic publish, in one file.

Descends from two reference mechanisms:
- the savepoint container ``{jobMode, savePoint, indexName}`` persisted as a
  JSON file after every successful batch
  (/root/reference/jobs-common/src/main/java/gov/ca/cwds/jobs/common/savepoint/SavePointContainer.java:12-43,
  written at .../SavePointContainerServiceImpl.java:61-87, advanced only after
  the sink flush at .../batch/BatchProcessor.java:56-67), and
- the atomic Elasticsearch alias swap that publishes a fully-built index in a
  single request (.../elastic/ElasticsearchService.java:123-147).

Here both collapse into ONE primitive: data files are immutable and versioned
(``p={i}/v{version}.parquet``, never overwritten); the manifest JSON names the
exact committed file per partition plus per-partition LSN watermarks and
counters; commit = write ``manifest.json.tmp`` + ``os.replace`` (atomic on
POSIX). A crash can only ever leave orphaned *uncommitted* version files,
which startup GC removes (the reference's redundant-index cleanup,
.../elastic/ElasticsearchService.java:168-179).
"""

from __future__ import annotations

import json
import os
import re
from dataclasses import asdict, dataclass, field


@dataclass
class PartitionState:
    lsn_watermark: int = 0
    rows_applied: int = 0      # live rows in the committed partition state
    dedup_count: int = 0       # cumulative exact duplicate redeliveries dropped
    conflict_count: int = 0    # cumulative LWW losers (older event superseded)
    replay_skipped: int = 0    # cumulative rows skipped as lsn <= watermark
    file: str | None = None    # committed BASE parquet path relative to table_dir
    # multi-source CDC: per-source EFFECTIVE lsn watermark for this partition
    # (replay filtering must be per source — a younger source's effective
    # lsns are numerically below an older source's namespace)
    source_watermarks: dict[str, int] = field(default_factory=dict)
    # merge-on-read delta files (ordered by version). A batch whose winner set
    # is small relative to the base writes one of these instead of rewriting
    # the whole base — bounding per-batch write amplification to O(delta).
    delta_files: list[str] = field(default_factory=list)
    delta_rows: int = 0        # total rows across delta_files
    base_file_rows: int = 0    # total rows in `file` (incl. tombstones)
    # zone maps: rel path -> {"min_ts": us, "max_ts": us, "min_lsn": int,
    # "max_lsn": int, "rows": int} recorded by the task that WROTE the file
    # (the rows were in memory — zero extra I/O). read_table's planner
    # prunes non-overlapping files/partitions driver-side from these; a
    # missing entry (pre-feature manifests) just means "never prune it".
    zones: dict[str, dict] = field(default_factory=dict)


# Job modes — the reference's mode state machine
# (/root/reference/jobs-common/.../mode/AbstractJobModeService.java:29-50):
# no manifest -> INITIAL_LOAD; manifest with mode INITIAL_* -> INITIAL_RESUME;
# committed manifest -> INCREMENTAL_LOAD.
INITIAL_LOAD = "INITIAL_LOAD"
INITIAL_RESUME = "INITIAL_RESUME"
INCREMENTAL_LOAD = "INCREMENTAL_LOAD"


@dataclass
class Manifest:
    job_mode: str = INITIAL_LOAD
    table_version: int = 0
    schema_version: int = 1
    num_partitions: int = 16
    applied_through_lsn: int = 0  # global: every event with lsn <= this is committed
    # source snapshot for INITIAL_RESUME — the reference's savepoint file
    # carries `indexName` back for resume the same way
    # (.../inject/ElasticSearchModule.java:38-51)
    base_path: str | None = None
    # committed lake-table columns; schema_version bumps when these change
    # (evolution by unification + null backfill)
    table_columns: list[str] = field(default_factory=list)
    # full committed Arrow schema (serialized) — authoritative for evolution
    table_schema_b64: str | None = None
    # key->partition routing algorithm id: committed base files encode this
    # routing, so a mismatch (library upgrade, algo change) must fail fast
    # instead of silently mis-routing keys (stale/duplicate rows)
    hash_algo: str = "fnv1a64-fmix-v1"
    # conflict-resolution policy the table was built with ("lww"/"fww") —
    # delta files are only meaningful under the policy that wrote them, so
    # readers take it from HERE and a job configured differently fails fast
    merge_policy: str = "lww"
    # cumulative counters from BEFORE a reshard (per-partition counters
    # cannot be attributed to new partitions, so totals carry here) — also
    # holds replay_skipped rows of whole segments skipped by footer planning
    # (never read, so never attributable to a partition)
    retired_counters: dict[str, int] = field(default_factory=dict)
    # highest WAL segment filename already accounted for (applied or
    # skip-counted) — segments are produced in filename order, so anything
    # at-or-below this has been either applied or counted as replay
    last_segment_seen: str = ""
    # multi-source CDC: per-source composite savepoint (the reference
    # snapshots one watermark per source, CapUsersSavePointService.java:40-47)
    # {source: {"applied_through_lsn": effective int, "last_segment_seen": str}}
    # — single-source tables keep using the flat legacy fields above.
    sources: dict[str, dict] = field(default_factory=dict)
    # multi-source CDC: PINNED source->lsn_namespace assignment. Namespaces
    # derive from job config on FIRST use only and are persisted here;
    # afterwards the pinned map is authoritative, so adding/renaming/
    # reordering sources can never silently shift an existing source's
    # namespace (which would invalidate every per-source savepoint and
    # corrupt lsn lineage). Validated in CDCJob.apply_wal.
    source_namespaces: dict[str, int] = field(default_factory=dict)
    # rolling per-batch metrics (most recent BATCH_HISTORY_CAP entries):
    # the reference's progress/ETA surface (TimeLeftEstimationProvider),
    # persisted so `status` can show throughput without scraping logs
    batch_history: list = field(default_factory=list)

    BATCH_HISTORY_CAP = 50
    partitions: dict[str, PartitionState] = field(default_factory=dict)

    FILENAME = "manifest.json"

    # -- construction -----------------------------------------------------
    @classmethod
    def new(cls, num_partitions: int) -> "Manifest":
        return cls(
            num_partitions=num_partitions,
            partitions={str(i): PartitionState() for i in range(num_partitions)},
        )

    @classmethod
    def load(cls, table_dir: str) -> "Manifest | None":
        path = os.path.join(table_dir, cls.FILENAME)
        if not os.path.exists(path):
            return None
        with open(path) as f:
            raw = json.load(f)
        return cls._parse(raw, table_dir)

    @classmethod
    def _parse(cls, raw: dict, table_dir: str) -> "Manifest":
        if "hash_algo" not in raw:
            # a manifest written before partition-hash versioning: its base
            # files were routed by an UNKNOWN algorithm, so filling in the
            # current id would let the guard below pass vacuously and then
            # silently split keys across partitions. Refuse instead.
            raise RuntimeError(
                f"manifest at {table_dir} predates partition-hash "
                "versioning (no hash_algo field) — its base files' routing "
                "is unknown; refusing to apply changes against it. "
                "Re-create the table (initial load) to adopt the current "
                "hash.")
        parts = {k: PartitionState(**v) for k, v in raw.pop("partitions").items()}
        m = cls(partitions=parts, **raw)
        from ..stages.partition import HASH_ALGO
        if m.hash_algo != HASH_ALGO:
            raise RuntimeError(
                f"table at {table_dir} was committed with partition hash "
                f"{m.hash_algo!r} but this build routes with {HASH_ALGO!r} — "
                "refusing to mis-route keys against existing base files")
        return m

    # -- commit -----------------------------------------------------------
    def commit(self, table_dir: str) -> None:
        """Atomic publish: temp write + fsync + rename + fsync(dir). The
        single commit point — the directory fsync makes the renamed entry
        itself durable, so a power loss can never surface a committed-looking
        state whose manifest entry vanished.

        After the swap, the committed state is also RETAINED as an immutable
        snapshot ``manifest.v{N}.json`` (time travel: data files are already
        immutable and versioned, so a retained manifest pins a complete
        readable table state; see ``load_version`` / ``vacuum``). Snapshot
        write happens strictly after the current-pointer swap — a crash
        between the two loses only that version's snapshot, never current
        readability."""
        os.makedirs(table_dir, exist_ok=True)
        path = os.path.join(table_dir, self.FILENAME)
        blob = json.dumps(asdict(self), indent=1)
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            f.write(blob)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, path)
        from ..stages.merge import fsync_dir
        fsync_dir(table_dir)
        snap = os.path.join(table_dir, self.snapshot_name(self.table_version))
        with open(snap + ".tmp", "w") as f:
            f.write(blob)
            f.flush()
            os.fsync(f.fileno())
        os.replace(snap + ".tmp", snap)
        fsync_dir(table_dir)

    # -- retained snapshots (time travel) ----------------------------------
    _SNAP_RE = re.compile(r"^manifest\.v(\d+)\.json$")

    @staticmethod
    def snapshot_name(version: int) -> str:
        return f"manifest.v{version}.json"

    @classmethod
    def retained_versions(cls, table_dir: str) -> list[int]:
        """Versions with a retained snapshot, ascending."""
        if not os.path.isdir(table_dir):
            return []
        out = [int(m.group(1)) for fn in os.listdir(table_dir)
               if (m := cls._SNAP_RE.match(fn))]
        return sorted(out)

    @classmethod
    def load_version(cls, table_dir: str, version: int) -> "Manifest":
        """Load a retained snapshot (same integrity guards as ``load``)."""
        path = os.path.join(table_dir, cls.snapshot_name(version))
        if not os.path.exists(path):
            have = cls.retained_versions(table_dir)
            raise RuntimeError(
                f"no retained snapshot for version {version} at {table_dir} "
                f"(retained: {have}) — it was never committed or has been "
                "vacuumed")
        with open(path) as f:
            raw = json.load(f)
        return cls._parse(raw, table_dir)

    @classmethod
    def _snapshot_files(cls, table_dir: str) -> set[str]:
        """Union of data files referenced by ANY retained snapshot —
        the GC keep-set extension that makes old versions readable.
        Tolerant raw-JSON parse: GC must not fail on a snapshot written by
        an older build."""
        keep: set[str] = set()
        for v in cls.retained_versions(table_dir):
            try:
                with open(os.path.join(table_dir,
                                       cls.snapshot_name(v))) as f:
                    raw = json.load(f)
                for p in raw.get("partitions", {}).values():
                    if p.get("file"):
                        keep.add(p["file"])
                    keep.update(p.get("delta_files", []))
            except Exception:  # noqa: BLE001 — unreadable snapshot pins nothing
                continue
        return keep

    def vacuum(self, table_dir: str, keep_last: int = 2):
        """Retention: drop all but the newest ``keep_last`` snapshots (the
        CURRENT manifest is never touched), then GC data files no longer
        referenced by the current manifest or any surviving snapshot — the
        point where compaction/reshard space is actually reclaimed.
        Returns (removed_snapshot_versions, removed_data_files)."""
        versions = self.retained_versions(table_dir)
        drop = versions[:-keep_last] if keep_last > 0 else versions
        for v in drop:
            os.remove(os.path.join(table_dir, self.snapshot_name(v)))
        from ..stages.merge import fsync_dir
        if drop:
            fsync_dir(table_dir)
        return drop, self.gc_uncommitted(table_dir)

    # -- derived ----------------------------------------------------------
    def part(self, i: int) -> PartitionState:
        return self.partitions[str(i)]

    def committed_files(self) -> set[str]:
        out = {p.file for p in self.partitions.values() if p.file}
        for p in self.partitions.values():
            out.update(p.delta_files)
        return out

    def total(self, field_name: str) -> int:
        return (sum(getattr(p, field_name) for p in self.partitions.values())
                + self.retired_counters.get(field_name, 0))

    def gc_uncommitted(self, table_dir: str) -> list[str]:
        """Delete data files not referenced by this manifest (crash leftovers).

        Reference analogue: orphan-index cleanup on startup
        (ElasticsearchService.java:168-179). Files referenced by RETAINED
        version snapshots are kept too — uncommitted crash leftovers are
        never in a snapshot (snapshots are written only at commit), so this
        widens the keep-set without ever protecting garbage.
        """
        keep = self.committed_files() | self._snapshot_files(table_dir)
        removed = []
        pat = re.compile(r"^p=\d+$")
        if not os.path.isdir(table_dir):
            return removed
        for d in os.listdir(table_dir):
            if not pat.match(d):
                continue
            for fn in os.listdir(os.path.join(table_dir, d)):
                rel = f"{d}/{fn}"
                if rel not in keep:
                    os.remove(os.path.join(table_dir, d, fn))
                    removed.append(rel)
        return removed


class TableLock:
    """Advisory per-table writer lock (flock on ``table_dir/.lock``).

    The reference relies on cron never overlapping job runs; here overlap is
    guarded explicitly because a second instance's startup GC could remove
    the first's not-yet-committed version files. Readers never take the
    lock (committed state is immutable); only mutating entry points do.
    """

    def __init__(self, table_dir: str):
        self.path = os.path.join(table_dir, ".lock")
        self._fd: int | None = None

    def __enter__(self) -> "TableLock":
        import fcntl

        os.makedirs(os.path.dirname(self.path), exist_ok=True)
        self._fd = os.open(self.path, os.O_CREAT | os.O_RDWR, 0o644)
        try:
            fcntl.flock(self._fd, fcntl.LOCK_EX | fcntl.LOCK_NB)
        except OSError as e:
            os.close(self._fd)
            self._fd = None
            raise RuntimeError(
                f"another job instance holds the writer lock on "
                f"{os.path.dirname(self.path)} — overlapping runs are not "
                "allowed (the reference schedules jobs non-overlapping via "
                "cron)") from e
        os.write(self._fd, f"{os.getpid()}\n".encode())
        return self

    def __exit__(self, *exc) -> None:
        import fcntl

        if self._fd is not None:
            fcntl.flock(self._fd, fcntl.LOCK_UN)
            os.close(self._fd)
            self._fd = None


def resolve_job_mode(manifest: Manifest | None) -> str:
    """Mode resolution per the reference state machine
    (AbstractJobModeService.java:29-50)."""
    if manifest is None:
        return INITIAL_LOAD
    if manifest.job_mode in (INITIAL_LOAD, INITIAL_RESUME):
        return INITIAL_RESUME
    return INCREMENTAL_LOAD
