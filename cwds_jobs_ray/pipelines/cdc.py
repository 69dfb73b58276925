"""CDCJob — the Ray-Data-native descendant of the reference's batch/savepoint
job loop (/root/reference/jobs-common/src/main/java/gov/ca/cwds/jobs/common/batch/BatchProcessor.java:43-67
+ mode machine .../mode/AbstractJobModeService.java:29-50 + runner
.../core/JobRunner.java:18-30).

Lifecycle per run:
  resolve mode from manifest ->
  INITIAL_LOAD / INITIAL_RESUME: hash-partition the base snapshot into v0
    partition files, commit manifest (idempotent redo on resume) ->
  INCREMENTAL: plan LSN batches from WAL footer metadata ->
  per batch: combine tasks (read segments -> block LWW -> grouped
    per-partition slices) -> merge tasks (one per partition; partition-local
    base read) -> collect P stats rows ->
    advance manifest (atomic swap)  [the savepoint advance of
    BatchProcessor.handleBatchSavepoint — data files first, manifest last]

Exactly-once: data files are immutable & versioned; the manifest swap is the
only commit point; a crash at ANY point leaves either the old manifest (batch
fully re-applied on resume — per-partition LSN watermarks make re-application
a no-op) or the new one (batch skipped via segment planning). Startup GC
removes uncommitted files.
"""

from __future__ import annotations

import logging
import os
from typing import Callable

import pandas as pd
import pyarrow as pa
import ray.data

from ..schema import (
    PUBLIC_COLS,
    TRANSCRIPT_SCHEMA,
    conform_to_schema,
    unify_change_schemas,
)
from ..sources.wal import SegmentInfo, batch_schema, list_segments, plan_batches
from ..stages.merge import (
    STATS_COLUMNS,
    combine_and_split,
    make_partition_merger,
    merge_partition_slices,
    snapshot_split,
    snapshot_write_partition,
)
from ..state.manifest import (
    INCREMENTAL_LOAD,
    INITIAL_LOAD,
    INITIAL_RESUME,
    Manifest,
    resolve_job_mode,
)

logger = logging.getLogger(__name__)


def _with_writer_lock(fn):
    """Serialize mutating entry points per table (reentrant within one job
    instance): a second instance's startup GC must never race another's
    uncommitted writes. See state.manifest.TableLock."""
    import functools

    @functools.wraps(fn)
    def wrapper(self, *args, **kwargs):
        if self._locked:
            return fn(self, *args, **kwargs)
        from ..state.manifest import TableLock

        with TableLock(self.table_dir):
            self._locked = True
            try:
                return fn(self, *args, **kwargs)
            finally:
                self._locked = False

    return wrapper


def promote_to_incremental(job: "CDCJob", manifest: Manifest) -> Manifest:
    """Primary job-mode finalizer: next scheduled run is incremental — the
    reference's initial-mode savepoint promotion
    (/root/reference/jobs-facilities-cws/src/main/java/gov/ca/cwds/jobs/cals/facility/cws/CwsInitialJobModeFinalizer.java:34-45)."""
    if manifest.job_mode != INCREMENTAL_LOAD:
        manifest.job_mode = INCREMENTAL_LOAD
        manifest.commit(job.table_dir)
    return manifest


def make_export_finalizer(out_dir: str):
    """Secondary publish finalizer: write the committed live table as
    parquet under ``out_dir`` — the reference's secondary alias-swap
    finalizer composed AFTER the savepoint promotion
    (/root/reference/jobs-common/src/main/java/gov/ca/cwds/jobs/common/elastic/ElasticsearchAliasFinalizer.java:19-24)."""

    def export(job: "CDCJob", manifest: Manifest) -> Manifest:
        job.read_table().write_parquet(out_dir)
        return manifest

    return export


class CDCJob:
    """One logical lake table maintained from a WAL of change events.

    ``finalizers``: ordered end-of-run hooks ``(job, manifest) -> Manifest |
    None``, the reference's composable JobModeFinalizer chain (primary
    savepoint promotion + secondary publish,
    ElasticsearchAliasFinalizer.java:19-24). They run in order after the WAL
    drains; a failing finalizer propagates WITHOUT undoing earlier
    finalizers' committed effects (each owns its own commit) and without
    running later ones — exactly-once holds because every applied batch was
    already committed before finalization starts. Default: mode promotion
    only.
    """

    def __init__(
        self,
        table_dir: str,
        wal_dir: str | list | dict,
        num_partitions: int = 16,
        events_per_batch: int = 500_000,
        combine_batch_size: int = 65_536,
        slice_group_size: int = 8,
        merge_policy: str = "lww",
        delta_threshold: float = 0.25,
        max_delta_files: int = 8,
        finalizers: list | None = None,
    ):
        self.table_dir = table_dir
        # multi-source CDC (the reference's composite-savepoint job shape,
        # CapUsersSavePointService.java:40-47): wal_dir may be one dir, a
        # list, or {source_name: dir}. With >1 source each source's raw lsns
        # are namespaced into a disjoint effective range ((idx+1) << 48) so
        # lsns stay globally unique; savepoints/watermarks are per source.
        if isinstance(wal_dir, dict):
            names = sorted(wal_dir)
            dirs = [wal_dir[n] for n in names]
        elif isinstance(wal_dir, (list, tuple)):
            names = [f"src{i}" for i in range(len(wal_dir))]
            dirs = list(wal_dir)
        else:
            names, dirs = ["default"], [wal_dir]
        multi = len(names) > 1
        self.wal_sources = {
            n: (d, (i + 1) << 48 if multi else 0)
            for i, (n, d) in enumerate(zip(names, dirs))
        }
        self.wal_dir = dirs[0]  # legacy single-source attribute
        self.num_partitions = num_partitions
        self.events_per_batch = events_per_batch
        self.combine_batch_size = combine_batch_size
        self.slice_group_size = slice_group_size
        self.merge_policy = merge_policy
        # delta-file merge knobs: a batch whose winner rows (plus accumulated
        # deltas) stay under delta_threshold * base rows writes a delta file
        # instead of rewriting the partition base (merge-on-read)
        self.delta_threshold = delta_threshold
        self.max_delta_files = max_delta_files
        self.finalizers = (list(finalizers) if finalizers is not None
                           else [promote_to_incremental])
        self._locked = False  # writer-lock reentrancy flag

    # ------------------------------------------------------------------ run
    @_with_writer_lock
    def run(
        self,
        base_path: str | None = None,
        on_before_commit: Callable[[Manifest], None] | None = None,
    ) -> Manifest:
        """Full scheduled run: mode resolution, initial load if needed, then
        drain the WAL batch-by-batch. ``on_before_commit`` is a test hook for
        crash injection (reference: BrokenTestEntityService,
        /root/reference/jobs-common/src/test/java/.../JobMainTest.java:168-207).
        """
        manifest = Manifest.load(self.table_dir)
        mode = resolve_job_mode(manifest)
        if mode in (INITIAL_LOAD, INITIAL_RESUME):
            snapshot_done = manifest is not None and (
                any(p.file for p in manifest.partitions.values())
                or manifest.base_path is None)
            if not snapshot_done:
                # (re)do the snapshot partitioning; resume remembers its
                # snapshot source in the manifest
                if base_path is None and manifest is not None:
                    base_path = manifest.base_path
                manifest = self.initial_load(base_path, manifest)
            # else: snapshot (and possibly some WAL batches) already
            # committed — INITIAL_RESUME continues from the committed
            # watermarks (reference: .../JobMainTest.java:168-207 semantics)
        manifest.gc_uncommitted(self.table_dir)
        return self.apply_wal(manifest, on_before_commit=on_before_commit)

    # --------------------------------------------------------- initial load
    @_with_writer_lock
    def initial_load(self, base_path: str | None, manifest: Manifest | None) -> Manifest:
        """Hash-partition the base snapshot into immutable v0 files.

        Idempotent: resume redoes the partitioning (writes land on the same
        deterministic paths); the manifest commit is the publish point. A
        resume keeps the prior attempt's partition count — P is fixed for
        the table's lifetime.
        """
        prior_P = manifest.num_partitions if manifest is not None \
            else self.num_partitions
        manifest = Manifest.new(prior_P)
        manifest.job_mode = INITIAL_RESUME
        manifest.base_path = base_path
        manifest.merge_policy = self.merge_policy
        manifest.commit(self.table_dir)  # records that an initial load started

        if base_path is not None:
            import glob as _glob
            import os as _os

            import pyarrow.parquet as pq_

            # base snapshot may be a single file or a directory of files
            if _os.path.isdir(base_path):
                files = sorted(_glob.glob(_os.path.join(base_path, "*.parquet")))
            else:
                files = [base_path]
            from ..schema import schema_to_b64

            target = _target_schema(pq_.ParquetFile(files[0]).schema_arrow)
            manifest.table_columns = [f_.name for f_ in target]
            manifest.table_schema_b64 = schema_to_b64(target)

            # direct shuffle, same shape as apply_batch: row-group-ranged
            # read/split tasks (per file) -> grouped slices -> one writer
            # per partition
            P, G = manifest.num_partitions, self.slice_group_size
            n_groups = -(-P // G)
            ranges: list[tuple[str, int, int]] = []
            for fp in files:
                fmeta = pq_.ParquetFile(fp).metadata
                n_rg = fmeta.num_row_groups
                rows_per_rg = max(1, fmeta.num_rows // max(1, n_rg))
                rgs_per_task = max(1, self.combine_batch_size // rows_per_rg)
                ranges.extend((fp, i, min(i + rgs_per_task, n_rg))
                              for i in range(0, n_rg, rgs_per_task))
            split_task = ray.remote(num_returns=n_groups)(snapshot_split)
            write_task = ray.remote(snapshot_write_partition)
            slice_refs = [split_task.remote(fp, a, b, target, P, G)
                          for fp, a, b in ranges]
            if n_groups == 1:
                slice_refs = [[r] for r in slice_refs]
            stats_refs = [
                write_task.remote(p, self.table_dir, 0, target,
                                  *[refs[p // G] for refs in slice_refs])
                for p in range(P)
            ]
            stats_df = pd.concat(ray.get(stats_refs), ignore_index=True)
            if stats_df.empty:  # empty base snapshot
                stats_df = pd.DataFrame(columns=STATS_COLUMNS)
        else:
            stats_df = pd.DataFrame(columns=STATS_COLUMNS)

        for i in range(manifest.num_partitions):
            p = manifest.part(i)
            row = stats_df[stats_df["part"] == i]
            if len(row):
                r = row.iloc[0]
                p.rows_applied = int(r["rows_applied"])
                p.lsn_watermark = int(r["lsn_watermark"])
                p.file = r["file"]
                p.base_file_rows = int(r["base_file_rows"])
                if isinstance(r.get("zone"), dict):
                    p.zones = {r["file"]: r["zone"]}
        manifest.job_mode = INITIAL_RESUME
        manifest.table_version = 0
        manifest.commit(self.table_dir)
        return manifest

    # ------------------------------------------------------------ wal drain
    @_with_writer_lock
    def apply_wal(
        self,
        manifest: Manifest | None = None,
        on_before_commit: Callable[[Manifest], None] | None = None,
    ) -> Manifest:
        manifest = manifest or Manifest.load(self.table_dir)
        if manifest is None:
            raise RuntimeError("no manifest: run initial_load first")
        if manifest.merge_policy != self.merge_policy:
            raise RuntimeError(
                f"table was built with merge_policy={manifest.merge_policy!r} "
                f"but this job is configured {self.merge_policy!r} — delta "
                "files are only meaningful under the policy that wrote them")
        multi = len(self.wal_sources) > 1
        manifest = self._pin_source_namespaces(manifest, multi)
        for name in sorted(self.wal_sources):
            wdir, ns = self.wal_sources[name]
            manifest = self._apply_source(manifest, name, wdir, ns, multi,
                                          on_before_commit)
        # finalize: the composable finalizer chain (primary mode promotion +
        # any secondary publish steps) — reference composition at
        # ElasticsearchAliasFinalizer.java:19-24
        for fin in self.finalizers:
            res = fin(self, manifest)
            manifest = res if res is not None else manifest
        return manifest

    def _pin_source_namespaces(self, manifest: Manifest,
                               multi: bool) -> Manifest:
        """Pin (first use) or validate the source->lsn_namespace assignment.

        Namespaces derived from job config (sorted names / list position)
        would silently SHIFT when a source is added, renamed or reordered —
        invalidating every per-source savepoint and corrupting lsn lineage.
        The manifest's pinned map is therefore authoritative: configured
        sources take their pinned namespace; genuinely new sources get the
        next free one (appended, never renumbering existing ones);
        converting a table between single- and multi-source is refused.
        """
        pinned = dict(manifest.source_namespaces)
        if not multi:
            if pinned:
                raise RuntimeError(
                    "table is pinned to multi-source namespaces "
                    f"{sorted(pinned)} but this job is configured "
                    "single-source — effective lsns would not line up with "
                    "the committed savepoints")
            return manifest
        if not pinned:
            if manifest.applied_through_lsn > 0:
                raise RuntimeError(
                    "converting a single-source table to multi-source would "
                    "re-namespace every lsn against the committed "
                    "watermarks — not allowed; re-create the table")
            manifest.source_namespaces = {
                n: ns for n, (_d, ns) in self.wal_sources.items()}
            manifest.commit(self.table_dir)
            return manifest
        changed = False
        for n in sorted(self.wal_sources):
            d, ns = self.wal_sources[n]
            if n in pinned:
                if pinned[n] != ns:
                    # config-order-derived namespace disagrees (sources were
                    # added/reordered): the PINNED one is authoritative
                    self.wal_sources[n] = (d, pinned[n])
            else:
                nxt = (max(v >> 48 for v in pinned.values()) + 1) << 48
                pinned[n] = nxt
                self.wal_sources[n] = (d, nxt)
                changed = True
        if changed:
            manifest.source_namespaces = pinned
            manifest.commit(self.table_dir)
        return manifest

    def _source_state(self, manifest: Manifest, source: str,
                      multi: bool) -> tuple[int, str]:
        """(applied_through_effective_lsn, last_segment_seen) for a source.
        Single-source tables keep the flat legacy manifest fields."""
        if not multi:
            return manifest.applied_through_lsn, manifest.last_segment_seen
        st = manifest.sources.get(source) or {}
        return (int(st.get("applied_through_lsn", 0)),
                str(st.get("last_segment_seen", "")))

    def _apply_source(self, manifest: Manifest, source: str, wal_dir: str,
                      lsn_namespace: int, multi: bool,
                      on_before_commit) -> Manifest:
        """Drain one change source's WAL (its own savepoint + watermarks —
        the composite-savepoint model)."""
        segments = list_segments(wal_dir, source, lsn_namespace, multi=multi)
        applied, last_seen = self._source_state(manifest, source, multi)
        batches = plan_batches(segments, applied, self.events_per_batch)
        # whole segments below the watermark are skipped by footer planning
        # (skipping IS the dedup) — but their rows must still be COUNTED as
        # replay, from footer metadata alone. The filename high-water mark
        # makes the accounting exactly-once across runs/crashes.
        new_skipped = [
            s for s in segments
            if os.path.basename(s.path) > last_seen and s.max_lsn <= applied]
        skip_rows = sum(s.rows for s in new_skipped)
        skip_seen = max((os.path.basename(s.path) for s in new_skipped),
                        default="")
        if skip_rows and not batches:
            # no batch commit will carry the accounting: commit it directly
            manifest.retired_counters["replay_skipped"] = \
                manifest.retired_counters.get("replay_skipped", 0) + skip_rows
            if multi:
                st = dict(manifest.sources.get(source) or {})
                st["applied_through_lsn"] = applied
                st["last_segment_seen"] = max(last_seen, skip_seen)
                manifest.sources[source] = st
            else:
                manifest.last_segment_seen = max(last_seen, skip_seen)
            manifest.commit(self.table_dir)
            skip_rows, skip_seen = 0, ""
        import time as _time

        from ..stages.progress import TimeLeftEstimator

        # progress / ETA (reference A5: TimeLeftEstimationProvider.java:
        # items-left x rolling average time per item)
        est = TimeLeftEstimator(sum(s.rows for b in batches for s in b))
        for i, batch in enumerate(batches):
            bt0 = _time.perf_counter()
            manifest = self.apply_batch(batch, manifest,
                                        on_before_commit=on_before_commit,
                                        extra_replay_skipped=skip_rows,
                                        extra_segment_seen=skip_seen)
            skip_rows, skip_seen = 0, ""  # folded into the first commit
            est.record(sum(s.rows for s in batch),
                       _time.perf_counter() - bt0)
            logger.info(
                "source %s batch %d/%d: %d/%d events, %.0f events/s, "
                "est %.1fs left", source, i + 1, len(batches),
                est.done_items, est.total_items, est.rate, est.eta_s)
        return manifest

    def apply_batch(
        self,
        batch: list[SegmentInfo],
        manifest: Manifest,
        on_before_commit: Callable[[Manifest], None] | None = None,
        extra_replay_skipped: int = 0,
        extra_segment_seen: str = "",
    ) -> Manifest:
        """Apply one batch of whole WAL segments; advance manifest atomically."""
        import time as _time
        batch_t0 = _time.perf_counter()
        version = manifest.table_version + 1
        change_schema = batch_schema(batch)
        target = _evolve_schema(manifest, change_schema, self.table_dir)

        # the COMMITTED partition count governs everything — the manifest
        # records P precisely so a job instance configured differently can
        # never mis-route keys against existing base files
        P = manifest.num_partitions
        source = batch[0].source
        lsn_namespace = batch[0].lsn_namespace
        multi = len(self.wal_sources) > 1
        # replay filtering is PER SOURCE: a younger source's effective lsns
        # sit numerically below an older source's namespace
        watermarks = {
            i: (manifest.part(i).source_watermarks.get(source, 0) if multi
                else manifest.part(i).lsn_watermark)
            for i in range(P)
        }
        part_meta = {
            i: {"file": manifest.part(i).file,
                "delta_files": list(manifest.part(i).delta_files),
                "delta_rows": manifest.part(i).delta_rows,
                "base_file_rows": manifest.part(i).base_file_rows}
            for i in range(P)
        }

        # direct two-stage shuffle (see stages/merge.py rationale): combine
        # tasks emit per-partition slices via num_returns=P; merge tasks
        # reduce exactly one partition each, reading the base partition
        # locally — base rows never cross the wire. Small segments group into
        # one chunk; a FAT segment splits by row-group ranges so no single
        # combine task has to hold it whole (chunk boundaries don't affect
        # semantics — only batch boundaries respect whole segments).
        chunks: list[list] = []
        cur: list = []
        cur_rows = 0
        for s in batch:
            if (s.rows > 2 * self.combine_batch_size
                    and s.num_row_groups > 1):
                if cur:
                    chunks.append(cur)
                    cur, cur_rows = [], 0
                rows_per_rg = max(1, s.rows // s.num_row_groups)
                rgs = max(1, self.combine_batch_size // rows_per_rg)
                chunks.extend(
                    [(s.path, a, min(a + rgs, s.num_row_groups))]
                    for a in range(0, s.num_row_groups, rgs))
            else:
                cur.append(s.path)
                cur_rows += s.rows
                if cur_rows >= self.combine_batch_size:
                    chunks.append(cur)
                    cur, cur_rows = [], 0
        if cur:
            chunks.append(cur)

        G = self.slice_group_size
        n_groups = -(-P // G)
        combine_task = ray.remote(num_returns=n_groups)(combine_and_split)
        merge_task = ray.remote(merge_partition_slices)
        slice_refs = [
            combine_task.remote(paths, change_schema, P, watermarks, G,
                                self.merge_policy, lsn_namespace)
            for paths in chunks
        ]
        if n_groups == 1:  # num_returns=1 returns a bare ref, normalize
            slice_refs = [[r] for r in slice_refs]
        merger = make_partition_merger(self.table_dir, version, target,
                                       watermarks, part_meta,
                                       policy=self.merge_policy,
                                       delta_threshold=self.delta_threshold,
                                       max_delta_files=self.max_delta_files)
        stats_refs = [
            merge_task.remote(p, merger, *[refs[p // G] for refs in slice_refs])
            for p in range(P)
        ]
        stats_df = pd.concat(ray.get(stats_refs), ignore_index=True)

        from ..schema import schema_to_b64

        target_cols = [f.name for f in target]
        prev_cols = manifest.table_columns or [f.name for f in TRANSCRIPT_SCHEMA]
        retired = dict(manifest.retired_counters)
        if extra_replay_skipped:
            retired["replay_skipped"] = (retired.get("replay_skipped", 0)
                                         + extra_replay_skipped)
        new_m = Manifest(
            job_mode=manifest.job_mode,
            table_version=version,
            schema_version=manifest.schema_version
            + (0 if target_cols == prev_cols else 1),
            num_partitions=manifest.num_partitions,
            base_path=manifest.base_path,
            table_columns=target_cols,
            table_schema_b64=schema_to_b64(target),
            applied_through_lsn=max(manifest.applied_through_lsn,
                                    max(s.max_lsn for s in batch)),
            merge_policy=manifest.merge_policy,
            retired_counters=retired,
            last_segment_seen=manifest.last_segment_seen if multi else max(
                [manifest.last_segment_seen, extra_segment_seen]
                + [os.path.basename(s.path) for s in batch]),
            sources={k: dict(v) for k, v in manifest.sources.items()},
            source_namespaces=dict(manifest.source_namespaces),
            partitions={k: _copy_part(v) for k, v in manifest.partitions.items()},
        )
        if multi:
            applied, last_seen = self._source_state(manifest, source, multi)
            new_m.sources[source] = {
                "applied_through_lsn": max(applied,
                                           max(s.max_lsn for s in batch)),
                "last_segment_seen": max(
                    [last_seen, extra_segment_seen]
                    + [os.path.basename(s.path) for s in batch]),
            }
        touched = set()
        for _, r in stats_df.iterrows():
            i = int(r["part"])
            touched.add(i)
            p = new_m.part(i)
            p.rows_applied = int(r["rows_applied"])
            p.dedup_count += int(r["dedup_count"])
            p.conflict_count += int(r["conflict_count"])
            p.replay_skipped += int(r["replay_skipped"])
            p.lsn_watermark = max(p.lsn_watermark, int(r["lsn_watermark"]))
            if multi:
                p.source_watermarks = {
                    **p.source_watermarks,
                    source: max(p.source_watermarks.get(source, 0),
                                int(r["lsn_watermark"])),
                }
            if pd.isna(r["delta_file"]) or r["delta_file"] is None:
                if r["file"] != p.file:  # base rewritten: deltas folded in
                    p.file = r["file"]
                    p.delta_files = []
                    p.delta_rows = 0
                    if isinstance(r.get("zone"), dict):
                        p.zones = {r["file"]: r["zone"]}
                p.base_file_rows = int(r["base_file_rows"])
            else:
                p.delta_files = p.delta_files + [r["delta_file"]]
                p.delta_rows += int(r["delta_rows_new"])
                if isinstance(r.get("zone"), dict):
                    p.zones = {**p.zones, r["delta_file"]: r["zone"]}
        # untouched partitions carry their committed file forward unchanged
        # per-task skew stats: the block-level LWW pre-combine bounds each
        # merge task's input to distinct-keys-per-chunk, so even a viral key
        # keeps max/mean near 1 (see SURVEY §4.2 measurement)
        rows_in = stats_df["rows_in"] if len(stats_df) else pd.Series([0])
        wall = _time.perf_counter() - batch_t0
        events = int(sum(s.rows for s in batch))
        new_m.batch_history = (manifest.batch_history + [{
            "version": version,
            "segments": len(batch),
            "events": events,
            "wall_s": round(wall, 3),
            "events_per_s": round(events / wall, 1) if wall > 0 else 0.0,
            "dedup": int(stats_df["dedup_count"].sum() or 0),
            "conflicts": int(stats_df["conflict_count"].sum() or 0),
            "replay_skipped": int(stats_df["replay_skipped"].sum() or 0),
            "skew_max_over_mean": round(
                float(rows_in.max()) / max(1.0, float(rows_in.mean())), 2),
        }])[-Manifest.BATCH_HISTORY_CAP:]
        if on_before_commit is not None:
            on_before_commit(new_m)
        new_m.commit(self.table_dir)
        logger.info(
            "committed v%d: %d partitions touched; merge-input skew "
            "max/mean=%.2f (max=%d rows)", version, len(touched),
            float(rows_in.max()) / max(1.0, float(rows_in.mean())),
            int(rows_in.max() or 0))
        return new_m

    # ----------------------------------------------------------- tail mode
    def follow(
        self,
        base_path: str | None = None,
        poll_interval_s: float = 2.0,
        idle_polls_to_stop: int | None = None,
        max_polls: int | None = None,
    ) -> Manifest:
        """Continuous WAL tail: apply new segments as they land.

        The reference achieves "streaming" by cron-scheduling the batch job
        (README.md:3); this folds the schedule into the process. Each poll is
        a normal exactly-once batch cycle, so killing the loop at any moment
        leaves a committed manifest a plain ``run()`` resumes from.

        ``idle_polls_to_stop``: stop after this many consecutive empty polls
        (None = run until ``max_polls``).
        """
        import time as _time

        manifest = self.run(base_path=base_path)
        idle = 0
        polls = 0
        while True:
            _time.sleep(poll_interval_s)
            before = manifest.applied_through_lsn
            manifest = self.apply_wal(manifest)
            polls += 1
            if manifest.applied_through_lsn == before:
                idle += 1
                if idle_polls_to_stop is not None and idle >= idle_polls_to_stop:
                    return manifest
            else:
                idle = 0
            if max_polls is not None and polls >= max_polls:
                return manifest

    # ----------------------------------------------------------- compaction
    @_with_writer_lock
    def compact(self, tombstone_horizon_lsn: int) -> Manifest:
        """Fold every partition's delta files into its base and drop
        tombstones with lsn <= horizon.

        Tombstones are persisted so late out-of-order events lose LWW against
        deletes (see stages/merge.py). Once the WAL's disorder horizon has
        passed an LSN, its tombstones can never matter again and are
        compacted away. New immutable version files + one manifest swap, so
        compaction has the same exactly-once guarantees as a batch apply.
        """
        import pyarrow.compute as pc

        manifest = Manifest.load(self.table_dir)
        if manifest is None:
            raise RuntimeError("nothing to compact: no manifest")
        version = manifest.table_version + 1
        disk = self._disk_schema(manifest)
        policy = manifest.merge_policy

        def compact_one(part: int, base_rel: str | None, delta_rels: list[str],
                        table_dir: str) -> tuple[int, str, int, int, dict]:
            import os as _os

            import pyarrow.parquet as pq_

            from ..schema import conform_to_schema as _conform
            from ..stages.merge import (_key_arrays, _key_sort_indices,
                                        _lww_winner_indices, file_zone,
                                        write_atomic)
            parts = []
            for rel in ([base_rel] if base_rel else []) + list(delta_rels):
                t = _conform(pq_.read_table(_os.path.join(table_dir, rel)),
                             disk)
                if t.num_rows and t["op"].null_count == t.num_rows:
                    t = t.set_column(
                        t.schema.get_field_index("op"), "op",
                        pa.array(["B"] * t.num_rows, pa.string()))
                parts.append(t)
            t = pa.concat_tables(parts) if parts else disk.empty_table()
            if t.num_rows:
                codes, _u, turn, ts, lsn = _key_arrays(t)
                t = t.take(pa.array(
                    _lww_winner_indices(codes, turn, ts, lsn, policy)))
                drop = pc.and_(pc.equal(t["op"], "D"),
                               pc.less_equal(t["lsn"], tombstone_horizon_lsn))
                t = t.filter(pc.invert(drop))
                t = t.take(_key_sort_indices(t))
            new_rel = f"p={part}/v{version}.parquet"
            write_atomic(t, _os.path.join(table_dir, new_rel))
            live = t.filter(pc.not_equal(t["op"], "D")).num_rows
            return part, new_rel, live, t.num_rows, file_zone(t)

        task = ray.remote(compact_one)
        refs = [task.remote(i, manifest.part(i).file,
                            list(manifest.part(i).delta_files), self.table_dir)
                for i in range(manifest.num_partitions)
                if manifest.part(i).file or manifest.part(i).delta_files]
        new_m = Manifest(
            job_mode=manifest.job_mode,
            table_version=version,
            schema_version=manifest.schema_version,
            num_partitions=manifest.num_partitions,
            base_path=manifest.base_path,
            table_columns=manifest.table_columns,
            table_schema_b64=manifest.table_schema_b64,
            applied_through_lsn=manifest.applied_through_lsn,
            merge_policy=manifest.merge_policy,
            retired_counters=dict(manifest.retired_counters),
            last_segment_seen=manifest.last_segment_seen,
            sources={k: dict(v) for k, v in manifest.sources.items()},
            source_namespaces=dict(manifest.source_namespaces),
            batch_history=list(manifest.batch_history),
            partitions={k: _copy_part(v) for k, v in manifest.partitions.items()},
        )
        for part, rel, live, total, zone in ray.get(refs):
            p = new_m.part(part)
            p.file = rel
            p.delta_files = []
            p.delta_rows = 0
            p.base_file_rows = total
            p.rows_applied = live
            p.zones = {rel: zone}
        new_m.commit(self.table_dir)
        new_m.gc_uncommitted(self.table_dir)
        return new_m

    # ------------------------------------------------------------ resharding
    @_with_writer_lock
    def reshard(self, new_num_partitions: int) -> Manifest:
        """Change the table's partition count (P is otherwise fixed at
        creation): every old partition's committed state — tombstones and lsn
        lineage included — re-routes through the direct shuffle into new
        hash buckets, and one atomic manifest swap publishes the new layout.
        Subsequent batches route with the new P automatically (the manifest
        is authoritative).

        New per-partition watermarks are set to the committed global
        ``applied_through_lsn`` (>= every old per-partition watermark), which
        preserves the replay rule: anything at-or-below it was already
        applied or skipped, so a redelivery is replay-skipped, never
        re-applied. Cumulative dedup/conflict/replay counters cannot be
        attributed to new partitions, so their totals move to
        ``manifest.retired_counters`` (``Manifest.total`` keeps including
        them).
        """
        from ..stages.merge import reshard_split, reshard_write_partition
        from ..state.manifest import PartitionState

        manifest = self._load_manifest_or_raise()
        if new_num_partitions < 1:
            raise ValueError("new_num_partitions must be >= 1")
        version = manifest.table_version + 1
        disk = self._disk_schema(manifest)
        G = self.slice_group_size
        n_groups = -(-new_num_partitions // G)
        split_task = ray.remote(num_returns=n_groups)(reshard_split)
        write_task = ray.remote(reshard_write_partition)
        slice_refs = []
        for i in range(manifest.num_partitions):
            p = manifest.part(i)
            if p.file or p.delta_files:
                slice_refs.append(split_task.remote(
                    self.table_dir, p.file, list(p.delta_files), disk,
                    new_num_partitions, G, manifest.merge_policy))
        if n_groups == 1:
            slice_refs = [[r] for r in slice_refs]
        stats_refs = [
            write_task.remote(np_, self.table_dir, version, disk,
                              *[refs[np_ // G] for refs in slice_refs])
            for np_ in range(new_num_partitions)
        ]
        stats_df = pd.concat(ray.get(stats_refs), ignore_index=True) \
            if stats_refs else pd.DataFrame(columns=STATS_COLUMNS)

        wm = max([manifest.applied_through_lsn]
                 + [manifest.part(i).lsn_watermark
                    for i in range(manifest.num_partitions)]
                 + [int(st.get("applied_through_lsn", 0))
                    for st in manifest.sources.values()])
        retired = {
            f: manifest.total(f)
            for f in ("dedup_count", "conflict_count", "replay_skipped")
        }
        new_m = Manifest(
            job_mode=manifest.job_mode,
            table_version=version,
            schema_version=manifest.schema_version,
            num_partitions=new_num_partitions,
            base_path=manifest.base_path,
            table_columns=manifest.table_columns,
            table_schema_b64=manifest.table_schema_b64,
            applied_through_lsn=manifest.applied_through_lsn,
            merge_policy=manifest.merge_policy,
            retired_counters=retired,
            last_segment_seen=manifest.last_segment_seen,
            sources={k: dict(v) for k, v in manifest.sources.items()},
            source_namespaces=dict(manifest.source_namespaces),
            batch_history=list(manifest.batch_history),
            partitions={str(i): PartitionState(
                            lsn_watermark=wm,
                            source_watermarks={
                                sn: int(st.get("applied_through_lsn", 0))
                                for sn, st in manifest.sources.items()})
                        for i in range(new_num_partitions)},
        )
        for _, r in stats_df.iterrows():
            p = new_m.part(int(r["part"]))
            p.rows_applied = int(r["rows_applied"])
            p.file = r["file"]
            p.base_file_rows = int(r["base_file_rows"])
            if isinstance(r.get("zone"), dict):
                p.zones = {r["file"]: r["zone"]}
        new_m.commit(self.table_dir)
        new_m.gc_uncommitted(self.table_dir)
        logger.info("resharded %d -> %d partitions at v%d",
                    manifest.num_partitions, new_num_partitions, version)
        return new_m

    # -------------------------------------------------------------- reading
    def _load_manifest_or_raise(self) -> Manifest:
        manifest = Manifest.load(self.table_dir)
        if manifest is None:
            raise RuntimeError(
                f"no manifest at {self.table_dir}: run initial_load first")
        return manifest

    def _disk_schema(self, manifest: Manifest) -> pa.Schema:
        from ..schema import schema_from_b64, stored_schema
        base = (schema_from_b64(manifest.table_schema_b64)
                if manifest.table_schema_b64 else TRANSCRIPT_SCHEMA)
        return stored_schema(base)

    def verify_committed_files(self, manifest: Manifest | None = None,
                               only_rels: set[str] | None = None) -> Manifest:
        """Verify-on-open sentinel (reference: a new index must prove it
        carries its mapping before being trusted, CUSTOM_CHECK at
        /root/reference/jobs-common/src/main/java/gov/ca/cwds/jobs/common/elastic/ElasticsearchService.java:93-108):
        every committed file must have a readable parquet footer whose schema
        carries the key/order columns with the committed types and no foreign
        columns — a truncated or alien file fails HERE, not as a late read
        error deep in a query."""
        import pyarrow.parquet as pq

        manifest = manifest or self._load_manifest_or_raise()
        expected = self._disk_schema(manifest)
        known = set(expected.names)
        rels = (manifest.committed_files() if only_rels is None
                else only_rels)  # delta-proportional callers verify what
        # they will actually read (read_changes)
        for rel in sorted(rels):
            path = os.path.join(self.table_dir, rel)
            try:
                got = pq.ParquetFile(path).schema_arrow
            except Exception as e:  # noqa: BLE001 — any footer failure
                raise RuntimeError(
                    f"committed file {rel} is unreadable or corrupt: {e}"
                ) from e
            for c in ("conv_id", "turn_idx", "ts", "lsn"):
                if c not in got.names:
                    raise RuntimeError(
                        f"committed file {rel} lacks key column {c!r} — "
                        "foreign or corrupt file behind the manifest")
                gt, et = got.field(c).type, expected.field(c).type
                # files written before a type widening carry the narrower
                # type; legal iff it promotes cleanly to the committed type
                if not gt.equals(et) and not pa.unify_schemas(
                        [pa.schema([got.field(c)]),
                         pa.schema([expected.field(c)])],
                        promote_options="permissive").field(0).type.equals(et):
                    raise RuntimeError(
                        f"committed file {rel} key column {c!r} has type "
                        f"{gt}, incompatible with committed {et}")
            extra = [c for c in got.names if c not in known]
            if extra:
                raise RuntimeError(
                    f"committed file {rel} carries columns {extra} unknown to "
                    "the committed schema")
        return manifest

    def plan_read(self, columns: list[str] | None = None,
                  version: int | None = None,
                  ts_range: tuple | None = None) -> dict:
        """EXPLAIN + planner for ``read_table``: decides per partition, from
        the manifest's zone maps alone (driver-side, no data I/O), which
        files are scanned plain, which go through merge-on-read, and which
        are PRUNED for a ``ts_range`` read. Pruning rules and why they are
        sound against LWW semantics (the predicate applies to the WINNING
        row's ts, so naive pre-merge row filtering would be wrong):

        - **partition skip** (any policy): if every file of the partition
          has a recorded zone and none overlaps [lo, hi], no row of the
          partition has ts in range — no winner can either.
        - **file prune inside a merged partition** (lww): a file whose
          ``max_ts < lo`` can only contribute winners with ts < lo. For any
          key it wins, every other copy is <= that winner, so the post-merge
          filter drops the key with or without the file — including the
          tombstone case (the resurrected runner-up is also < lo). Under
          fww the mirror rule prunes files with ``min_ts > hi``.
        - a file with no zone entry (pre-feature manifest) never prunes.

        Returns ``{"plain": [abs paths], "merged": [(base, deltas)],
        "pruned_partitions": [i], "pruned_files": [rel], "ts_range":
        (lo_us, hi_us) | None}``.
        """
        import pyarrow.parquet as pq

        manifest = self.verify_committed_files(
            Manifest.load_version(self.table_dir, version)
            if version is not None else None)
        cols = columns or PUBLIC_COLS
        rng = _normalize_ts_range(ts_range)
        lo, hi = rng if rng else (None, None)
        lww = manifest.merge_policy == "lww"

        def overlaps(zone: dict | None) -> bool:
            if not isinstance(zone, dict):
                return True  # unknown: never prune
            if zone.get("rows", 1) == 0:
                return False
            zmin, zmax = zone.get("min_ts"), zone.get("max_ts")
            if zmin is None or zmax is None:
                return True  # null ts in file: unknown
            return not ((lo is not None and zmax < lo)
                        or (hi is not None and zmin > hi))

        def winner_prunable(zone: dict | None) -> bool:
            if not isinstance(zone, dict):
                return False
            if zone.get("rows", 1) == 0:
                return True
            zmin, zmax = zone.get("min_ts"), zone.get("max_ts")
            if zmin is None or zmax is None:
                return False
            return (zmax < lo if lww and lo is not None else
                    zmin > hi if not lww and hi is not None else False)

        plain: list[str] = []
        merged: list[tuple[str | None, list[str]]] = []
        pruned_partitions: list[int] = []
        pruned_files: list[str] = []
        for i in range(manifest.num_partitions):
            p = manifest.part(i)
            rels = ([p.file] if p.file else []) + list(p.delta_files)
            if not rels:
                continue
            if rng and not any(overlaps(p.zones.get(r)) for r in rels):
                pruned_partitions.append(i)
                continue
            base, deltas = p.file, list(p.delta_files)
            if rng:
                drop = [r for r in deltas if winner_prunable(p.zones.get(r))]
                if base and winner_prunable(p.zones.get(base)):
                    pruned_files.append(base)
                    base = None
                pruned_files.extend(drop)
                deltas = [r for r in deltas if r not in drop]
                if base is None and not deltas:
                    continue  # everything winner-prunable: nothing to read
            if deltas or base is None:
                merged.append((base, deltas))
                continue
            names = pq.ParquetFile(
                os.path.join(self.table_dir, base)).schema_arrow.names
            if all(c in names for c in cols):
                plain.append(f"{self.table_dir}/{base}")
            else:  # pre-evolution base: needs null back-fill
                merged.append((base, []))
        return {"plain": plain, "merged": merged,
                "pruned_partitions": pruned_partitions,
                "pruned_files": pruned_files, "ts_range": rng,
                "manifest": manifest, "columns": cols}

    def read_table(self, columns: list[str] | None = None,
                   version: int | None = None,
                   ts_range: tuple | None = None) -> ray.data.Dataset:
        """Dataset over the committed live table.

        Partitions without delta files are plain column-pruned parquet scans
        with the tombstone filter pushed down; partitions with deltas (or
        whose base predates a schema evolution) go through one
        ``merge_on_read`` task each — partition-local LWW, nothing shuffled.

        ``ts_range=(lo, hi)`` (timestamps / None for open ends) returns only
        live rows whose winning ts falls in the CLOSED interval. The zone
        maps the writers record in the manifest prune non-overlapping files
        and partitions on the driver with zero I/O (see ``plan_read`` for
        the soundness argument); surviving plain scans push the predicate
        into parquet row-group pruning, surviving merge-on-read tasks filter
        post-merge.

        ``version`` time-travels: data files are immutable and versioned,
        and every commit retains its manifest as ``manifest.v{N}.json``, so
        a past committed state stays fully readable (snapshot isolation for
        free) until ``vacuum`` drops its snapshot. Works across compactions
        and reshards — GC keeps any file a retained snapshot references.
        """
        import pyarrow.compute as pc

        from ..stages.merge import merge_on_read

        plan = self.plan_read(columns, version, ts_range)
        manifest, cols = plan["manifest"], plan["columns"]
        rng = plan["ts_range"]
        full = self._disk_schema(manifest)
        parts: list[ray.data.Dataset] = []
        if plan["plain"]:
            flt = pc.field("op") != "D"
            if rng:
                lo, hi = rng
                if lo is not None:
                    flt = flt & (pc.field("ts")
                                 >= pa.scalar(lo, pa.timestamp("us")))
                if hi is not None:
                    flt = flt & (pc.field("ts")
                                 <= pa.scalar(hi, pa.timestamp("us")))
            parts.append(ray.data.read_parquet(plan["plain"], columns=cols,
                                               filter=flt))
        if plan["merged"]:
            task = ray.remote(merge_on_read)
            refs = [task.remote(self.table_dir, f, d, full, cols,
                                manifest.merge_policy, rng)
                    for f, d in plan["merged"]]
            parts.append(ray.data.from_arrow_refs(refs))
        if not parts:
            return ray.data.from_arrow(
                pa.schema([full.field(c) for c in cols]).empty_table())
        ds = parts[0]
        for q in parts[1:]:
            ds = ds.union(q)
        return ds

    # ----------------------------------------------------------- change feed
    def read_changes(self, from_version: int,
                     to_version: int | None = None) -> ray.data.Dataset:
        """Change data feed: the row-level diff of the committed LIVE state
        between two retained versions, as a Dataset of
        ``(conv_id, turn_idx, change_type, <payload>, lsn)`` rows —
        ``change_type`` 'I' (post-image), 'U' (post-image, a different lsn
        won), 'D' (pre-image). This is the subscription surface the
        reference's downstream consumers poll an index for, derived here
        entirely from retained immutable snapshots — no extra write-path
        work, no change log to maintain.

        Scale shape: the manifest compare finds CHANGED partitions on the
        driver (O(P) string compares, no I/O); one Ray task per changed
        partition merges both versions' files partition-locally and diffs
        vectorized (``stages.merge.partition_diff``) — cost tracks the
        delta between the versions, not table size, and nothing shuffles.
        Across a reshard the key->partition map differs, so both sides'
        live states re-bucket by the pinned key hash (one keyed exchange)
        and per-bucket tasks diff — the general path, same wave shape as
        every keyed final."""
        from ..stages.merge import live_state_diff, merge_on_read, partition_diff

        ma = Manifest.load_version(self.table_dir, from_version)
        mb = (Manifest.load_version(self.table_dir, to_version)
              if to_version is not None else self._load_manifest_or_raise())
        if mb.table_version < ma.table_version:
            raise ValueError(
                f"read_changes: to_version v{mb.table_version} predates "
                f"from_version v{ma.table_version}")
        # verify-on-open restricted to files the feed will actually read,
        # keeping the whole operation delta-proportional
        if ma.num_partitions == mb.num_partitions:
            touched: set[str] = set()
            for i in range(ma.num_partitions):
                a, b = ma.part(i), mb.part(i)
                if a.file == b.file and a.delta_files == b.delta_files:
                    continue
                for p in (a, b):
                    touched |= ({p.file} if p.file else set()) \
                        | set(p.delta_files)
            self.verify_committed_files(ma, only_rels=touched
                                        & set(ma.committed_files()))
            self.verify_committed_files(mb, only_rels=touched
                                        & set(mb.committed_files()))
        else:  # reshard crossed: the re-bucket path reads everything
            self.verify_committed_files(ma)
            self.verify_committed_files(mb)
        uni = unify_change_schemas([self._disk_schema(ma),
                                    self._disk_schema(mb)])
        cols = [f.name for f in uni if f.name != "op"]
        pay = [c for c in cols if c not in ("conv_id", "turn_idx")]
        out_schema = pa.schema(
            [pa.field("conv_id", pa.string()),
             pa.field("turn_idx", pa.int64()),
             pa.field("change_type", pa.string())]
            + [uni.field(c) for c in pay]
            + [pa.field("prev_" + c, uni.field(c).type) for c in pay])

        if ma.num_partitions == mb.num_partitions:
            diff_t = ray.remote(partition_diff)
            refs = []
            for i in range(ma.num_partitions):
                a, b = ma.part(i), mb.part(i)
                if a.file == b.file and a.delta_files == b.delta_files:
                    continue  # untouched partition: provably no changes
                refs.append(diff_t.remote(
                    self.table_dir, a.file, list(a.delta_files),
                    b.file, list(b.delta_files), uni, cols,
                    ma.merge_policy, out_schema))
            if not refs:
                return ray.data.from_arrow(out_schema.empty_table())
            return ray.data.from_arrow_refs(refs)

        # reshard crossed between the versions: re-bucket both live states
        # by the pinned key hash into one shared bucket space and diff
        # per bucket (whole conversations share a bucket on both sides).
        from ..stages.partition import partition_ids
        from ..stages.waves import wave_group_reduce

        nb = max(ma.num_partitions, mb.num_partitions)
        mor = ray.remote(merge_on_read)

        def side_ds(m: Manifest, side: int) -> ray.data.Dataset:
            refs = [mor.remote(self.table_dir, p.file, list(p.delta_files),
                               uni, cols, m.merge_policy)
                    for p in (m.part(i) for i in range(m.num_partitions))
                    if p.file or p.delta_files]
            ds = (ray.data.from_arrow_refs(refs) if refs else
                  ray.data.from_arrow(
                      pa.schema([uni.field(c) for c in cols]).empty_table()))

            def tag(t: pa.Table) -> pa.Table:
                import numpy as np
                b = partition_ids(t["conv_id"], nb).astype(np.int64)
                return (t.append_column("_side",
                                        pa.array(np.full(t.num_rows, side,
                                                         np.int8)))
                        .append_column("_bucket", pa.array(b)))

            return ds.map_batches(tag, batch_format="pyarrow")

        def diff_bucket(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc
            if t.num_columns == 0 or t.num_rows == 0:
                return out_schema.empty_table()
            side = t["_side"]
            body = t.drop_columns(["_side"])
            return conform_to_schema(
                live_state_diff(body.filter(pc.equal(side, 0)),
                                body.filter(pc.equal(side, 1))), out_schema)

        both = side_ds(ma, 0).union(side_ds(mb, 1))
        return wave_group_reduce(both, "_bucket", nb, diff_bucket)

    # ---------------------------------------------------------- point lookup
    def lookup(self, conv_id: str, columns: list[str] | None = None,
               version: int | None = None) -> pa.Table:
        """Point query: the live turns of ONE conversation, in turn order —
        the reference's per-id hydration read (ChangedEntityService), served
        from the lake. The pinned key hash routes straight to the owning
        partition, so cost is one partition's merge-on-read regardless of
        table size or cluster — no scan, no shuffle, O(1/P) of the data
        touched. Runs driver-side (one partition is small by construction);
        wrap in ``ray.remote`` to serve many lookups concurrently."""
        import pyarrow.compute as pc

        from ..stages.merge import merge_on_read
        from ..stages.partition import partition_ids

        manifest = (Manifest.load_version(self.table_dir, version)
                    if version is not None
                    else self._load_manifest_or_raise())
        full = self._disk_schema(manifest)
        cols = columns or [f.name for f in full if f.name != "op"]
        # the final key filter needs conv_id in the read set; read it even
        # when the caller's projection omits it, then drop it on return
        read_cols = cols if "conv_id" in cols else ["conv_id", *cols]
        part = int(partition_ids(pa.array([conv_id]),
                                 manifest.num_partitions)[0])
        p = manifest.part(part)
        if not p.file and not p.delta_files:
            return pa.schema([full.field(c) for c in cols]).empty_table()
        # key_eq pushes the equality into parquet row-group pruning (files
        # are key-sorted), so a point read touches ~one row group per file
        t = merge_on_read(self.table_dir, p.file, list(p.delta_files),
                          full, read_cols, manifest.merge_policy,
                          key_eq=conv_id)
        return t.filter(pc.equal(t["conv_id"], conv_id)).select(cols)

    def vacuum(self, keep_last: int = 2):
        """Drop all but the newest ``keep_last`` retained version snapshots
        and reclaim data files nothing references any more (see
        Manifest.vacuum). Returns (removed_snapshot_versions,
        removed_data_files)."""
        return self._load_manifest_or_raise().vacuum(self.table_dir,
                                                     keep_last)

    def read_table_arrow(self, version: int | None = None) -> pa.Table:
        """Driver-side materialization for tests/small tables only.
        ``version`` reads a retained snapshot (see ``read_table``)."""
        from ..stages.merge import merge_on_read

        manifest = self.verify_committed_files(
            Manifest.load_version(self.table_dir, version)
            if version is not None else None)
        full = self._disk_schema(manifest)
        cols = [f.name for f in full if f.name != "op"]
        tables = []
        for i in range(manifest.num_partitions):
            p = manifest.part(i)
            if p.file or p.delta_files:
                tables.append(merge_on_read(self.table_dir, p.file,
                                            list(p.delta_files), full, cols,
                                            manifest.merge_policy))
        if not tables:
            return TRANSCRIPT_SCHEMA.empty_table()
        out = pa.concat_tables(tables)
        return out.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])


# ---------------------------------------------------------------- helpers
def _normalize_ts_range(ts_range) -> tuple[int | None, int | None] | None:
    """(lo, hi) with ends as None / int epoch-microseconds / datetime /
    pandas Timestamp / ISO string -> (lo_us, hi_us); None when both open."""
    if ts_range is None:
        return None
    import numpy as np
    lo, hi = ts_range

    def us(v):
        if v is None:
            return None
        if isinstance(v, (int, np.integer)) and not isinstance(v, bool):
            return int(v)
        return int(pd.Timestamp(v).value // 1000)

    lo, hi = us(lo), us(hi)
    return None if lo is None and hi is None else (lo, hi)


def _copy_part(p):
    from ..state.manifest import PartitionState
    d = dict(vars(p))
    d["delta_files"] = list(d["delta_files"])
    d["source_watermarks"] = dict(d["source_watermarks"])
    d["zones"] = dict(d["zones"])
    return PartitionState(**d)


def _target_schema(base_schema: pa.Schema) -> pa.Schema:
    """Base lake schema incl. the lsn lineage column."""
    fields = list(base_schema)
    if "lsn" not in [f.name for f in fields]:
        fields.append(pa.field("lsn", pa.int64()))
    return pa.schema(fields)


def _evolve_schema(manifest: Manifest, change_schema: pa.Schema,
                   table_dir: str) -> pa.Schema:
    """Unify the COMMITTED lake schema with the batch's payload columns —
    added nullable columns and widened types are allowed (schema evolution by
    unification + null back-fill, replacing the reference's
    index-mapping-replacement model).

    The committed schema is carried in the manifest (full Arrow schema,
    types included), so a column added by an earlier batch survives later
    batches that don't carry it — even when that batch touches partitions
    the earlier one did not."""
    from ..schema import schema_from_b64

    payload = pa.schema([f for f in change_schema if f.name not in ("op", "part")])
    base = TRANSCRIPT_SCHEMA
    if manifest.table_schema_b64:
        base = schema_from_b64(manifest.table_schema_b64)
    uni = unify_change_schemas([base, payload])
    # keep committed column order first, new columns appended
    names = [f.name for f in base] + [f.name for f in uni if f.name not in
                                      [g.name for g in base]]
    return pa.schema([uni.field(n) for n in names])



